"""Pallas TPU kernel: fused Xception middle flow (eval mode).

Why this exists: the DeepLab-xception hot path spends most of its time in
the 16 identical middle-flow residual blocks (``nets/xception.py:33-73``,
blocks 4-19: three 728->728 separable convs + identity skip at 32^2
spatial for a 512^2 os16 input).  On the target platform EVERY dependent
op at that 32^2 x 728 shape costs ~0.8 ms regardless of content — a
per-op latency floor, not compute (scripts/bench_conv_chain.py,
docs/PLATFORM.md "Round-2 probes") — and the XLA lowering of the middle
flow is ~10 sequential kernels per block.  This module collapses the
ENTIRE middle flow into ONE pallas kernel: a (batch, block) grid where
each grid step applies one full residual block in VMEM — 9-tap shifted
depthwise taps on the VPU, the two 728x728 pointwise matmuls on the MXU,
folded BatchNorm affines — with the activation carried in the revisited
output block and the next block's weights prefetched by the pipeline.

Eval-mode only: BatchNorm folds into per-channel affines
(``s = gamma / sqrt(var + eps)``, ``c = beta - mean * s``; the pointwise
BN scale folds into the pointwise weight matrix).  Training-mode BN needs
cross-batch statistics between the fused ops and is served by the flax
path.  Used by the predictor / eval forwards via
``XceptionBackbone(fused_middle=True)``.

Semantics note (docs/PARITY.md): identity-skip blocks add ``relu(x)``,
not ``x`` — the torch reference's in-place ReLU mutates the aliased skip
tensor (xception.py:12,21-22,55,66-72).  The middle flow is exactly 16
such blocks, so the kernel computes ``skip = relu(x)`` which is also the
first separable conv's pre-activation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# BatchNorm folding (tiny XLA prelude, traced per apply — negligible)
# ---------------------------------------------------------------------------

def fold_middle_flow(variables, first: int = 4, count: int = 16,
                     eps: float = 1e-5, compute_dtype=jnp.bfloat16):
    """Stacked, BN-folded middle-flow weights from backbone-scope variables.

    ``variables``: the :class:`XceptionBackbone` scope's variable dict
    (``{"params": {...}, "batch_stats": {...}}``).  Returns a dict:

    * ``wdw``  (count, 27, C) ``compute_dtype`` — depthwise taps, laid out
      ``[sepconv*9 + dy*3 + dx]``;
    * ``s1/c1`` (count, 3, C) f32 — folded bn1 affine after the depthwise;
    * ``wpw``  (count, 3, C, C) ``compute_dtype`` — pointwise weights with
      bn2's scale folded in;
    * ``c2``  (count, 3, C) f32 — folded bn2 shift.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    wdw, s1, c1, wpw, c2 = [], [], [], [], []
    for b in range(first, first + count):
        bp, bs = params[f"block{b}"], stats[f"block{b}"]
        bwdw, bs1, bc1, bwpw, bc2 = [], [], [], [], []
        for i in (1, 2, 3):
            sp, ss = bp[f"sepconv{i}"], bs[f"sepconv{i}"]
            inv1 = jax.lax.rsqrt(ss["bn1"]["var"].astype(jnp.float32) + eps)
            sc1 = sp["bn1"]["scale"].astype(jnp.float32) * inv1
            sh1 = (sp["bn1"]["bias"].astype(jnp.float32)
                   - ss["bn1"]["mean"].astype(jnp.float32) * sc1)
            inv2 = jax.lax.rsqrt(ss["bn2"]["var"].astype(jnp.float32) + eps)
            sc2 = sp["bn2"]["scale"].astype(jnp.float32) * inv2
            sh2 = (sp["bn2"]["bias"].astype(jnp.float32)
                   - ss["bn2"]["mean"].astype(jnp.float32) * sc2)
            k = sp["depthwise"]["kernel"].astype(jnp.float32)  # (3,3,1,C)
            bwdw.append(k[:, :, 0, :].reshape(9, -1))
            bs1.append(sc1)
            bc1.append(sh1)
            w = sp["pointwise"]["kernel"].astype(jnp.float32)[0, 0]  # (C,C)
            bwpw.append(w * sc2[None, :])
            bc2.append(sh2)
        wdw.append(jnp.concatenate(bwdw, axis=0))
        s1.append(jnp.stack(bs1))
        c1.append(jnp.stack(bc1))
        wpw.append(jnp.stack(bwpw))
        c2.append(jnp.stack(bc2))
    return {
        "wdw": jnp.stack(wdw).astype(compute_dtype),
        "s1": jnp.stack(s1),
        "c1": jnp.stack(c1),
        "wpw": jnp.stack(wpw).astype(compute_dtype),
        "c2": jnp.stack(c2),
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _shift2d(x, sy: int, sx: int):
    """``y[h, w] = x[h + sy, w + sx]`` with static shifts and zero fill —
    the zero-padded 3x3 tap reads, as concats on the untiled/sublane axes
    (no gathers; shifts are compile-time constants)."""
    h, w, c = x.shape
    if sy > 0:
        x = jnp.concatenate(
            [x[sy:], jnp.zeros((sy, w, c), x.dtype)], axis=0)
    elif sy < 0:
        x = jnp.concatenate(
            [jnp.zeros((-sy, w, c), x.dtype), x[:sy]], axis=0)
    if sx > 0:
        x = jnp.concatenate(
            [x[:, sx:], jnp.zeros((h, sx, c), x.dtype)], axis=1)
    elif sx < 0:
        x = jnp.concatenate(
            [jnp.zeros((h, -sx, c), x.dtype), x[:, :sx]], axis=1)
    return x


def _block_kernel(x_ref, wdw_ref, s1_ref, c1_ref, wpw_ref, c2_ref, out_ref,
                  *, dilation: int):
    """One residual middle-flow block per grid step.

    Grid is (batch, block); the output block is revisited across the block
    axis, so it doubles as the activation carry (seeded from the input at
    block 0, flushed to HBM once per image).
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _seed():
        out_ref[0] = x_ref[0]

    y = out_ref[0]                      # (H, W, C) compute dtype
    h, w, c = y.shape
    skip = jnp.maximum(y, 0).astype(jnp.float32)
    z = skip
    d = dilation
    for i in range(3):
        if i > 0:
            z = jnp.maximum(z, 0)
        # depthwise 3x3 (zero pad, stride 1, dilation d): 9 shifted taps
        acc = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                tap = _shift2d(z, dy * d, dx * d) if (dy or dx) else z
                wvec = wdw_ref[0, i * 9 + (dy + 1) * 3 + (dx + 1)] \
                    .astype(jnp.float32)
                term = tap * wvec
                acc = term if acc is None else acc + term
        # folded bn1 affine, then the pointwise matmul on the MXU with
        # bn2's scale pre-folded into the weights
        zb = (acc * s1_ref[0, i] + c1_ref[0, i]).astype(out_ref.dtype)
        zf = jnp.dot(zb.reshape(h * w, c), wpw_ref[0, i],
                     preferred_element_type=jnp.float32)
        z = (zf + c2_ref[0, i]).reshape(h, w, c)
    out_ref[0] = (z + skip).astype(out_ref.dtype)


def middle_flow_eval(x, folded, dilation: int = 1, interpret: bool = False,
                     blocks_per_call: Optional[int] = None):
    """Fused eval-mode middle flow: (B, H, W, C) -> (B, H, W, C).

    ``folded`` comes from :func:`fold_middle_flow`.  ``blocks_per_call``
    optionally splits the block axis over several pallas calls (re-probe
    knob; the single mega-call is the default and the measured winner —
    one kernel launch for all 16 blocks, weights double-buffered across
    grid steps).
    """
    b, h, w, c = x.shape
    nblk = folded["wdw"].shape[0]
    # Mosaic is TPU-only; on the CPU backend (tests, virtual-device meshes)
    # fall through to the interpreter automatically
    interpret = interpret or jax.default_backend() == "cpu"
    if blocks_per_call is not None and blocks_per_call < nblk:
        bpc = blocks_per_call
        for k0 in range(0, nblk, bpc):
            part = {n: v[k0:k0 + bpc] for n, v in folded.items()}
            x = middle_flow_eval(x, part, dilation, interpret)
        return x

    kernel = functools.partial(_block_kernel, dilation=dilation)
    grid = (b, nblk)
    spec_img = pl.BlockSpec((1, h, w, c), lambda i, k: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape[1:],
                            lambda i, k, nd=nd: (k,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_img, wspec(folded["wdw"].shape),
                  wspec(folded["s1"].shape), wspec(folded["c1"].shape),
                  wspec(folded["wpw"].shape), wspec(folded["c2"].shape)],
        out_specs=spec_img,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        # live set: img in/out blocks + double-buffered (3,C,C) pointwise
        # weights + f32 depthwise accumulator/taps; 32^2 x 728 bf16 fits
        # comfortably, 64^2 (os8) needs the raised budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, folded["wdw"], folded["s1"], folded["c1"], folded["wpw"],
      folded["c2"])


def middle_flow_reference(x, folded, dilation: int = 1):
    """Pure-jnp oracle of the exact folded-math the kernel computes (same
    dtypes and op order) — the kernel's correctness test target; also the
    cross-check against the flax :class:`XceptionBackbone` blocks."""
    nblk = folded["wdw"].shape[0]
    d = dilation
    for k in range(nblk):
        skip = jnp.maximum(x, 0).astype(jnp.float32)
        z = skip
        for i in range(3):
            if i > 0:
                z = jnp.maximum(z, 0)
            acc = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    tap = jnp.pad(z, ((0, 0), (d, d), (d, d), (0, 0)))[
                        :, d + dy * d: d + dy * d + z.shape[1],
                        d + dx * d: d + dx * d + z.shape[2]]
                    wvec = folded["wdw"][k, i * 9 + (dy + 1) * 3 + (dx + 1)] \
                        .astype(jnp.float32)
                    term = tap * wvec
                    acc = term if acc is None else acc + term
            zb = (acc * folded["s1"][k, i] + folded["c1"][k, i]).astype(x.dtype)
            zf = jnp.einsum("bhwc,cd->bhwd", zb, folded["wpw"][k, i],
                            preferred_element_type=jnp.float32)
            z = zf + folded["c2"][k, i]
        x = (z + skip).astype(x.dtype)
    return x
