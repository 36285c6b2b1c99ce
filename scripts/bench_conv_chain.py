"""Per-geometry in-program conv efficiency via dependent chains.

The fused xception 512^2 b8 train step runs ~6 TFLOP/s overall while pure
dependent matmul chains sustain ~140 TFLOP/s on this platform
(scripts/bench_matmul_control.py).  Dispatch is already amortized inside
the 181 ms step program, so the open question is per-geometry: do XLA
convs *in-program* run near the matmul roofline (=> the step is
bandwidth/structure bound — document and stop) or far below it (=> a
pallas conv kernel has headroom)?

Each variant chains CHAIN dependent same-shape ops inside one jit (shape-
preserving, constant epilogue rescale, bf16 carry) and reports achieved
TFLOP/s and activation GB/s.  Geometries mirror the DeepLab-xception
512^2 b8 step's hot groups (nets/xception.py, deeplabv3_plus.py):

  pw728   1x1 728->728 @ 32^2   (os16 middle-flow pointwise, x48)
  dw728   3x3 depthwise 728 @ 32^2 (middle-flow spatial, shift vs lax)
  e3x3    3x3 256->256 @ 128^2  (entry-flow / decoder class)
  entry   3x3 128->128 @ 256^2  (high-res entry flow class)

Note: the dw728 chain's values drift large over CHAIN steps (random
per-channel DC gains compound; bf16's fp32 exponent range keeps them
finite) — harmless for timing, so the epilogue stays a near-1 constant.

Measured 2026-08-17 (docs/PLATFORM.md "Round-2 probes"): e3x3 84 and
entry 72 TFLOP/s (XLA convs in-program are FAST at big geometries), but
EVERY op at the 32^2 x 728 middle-flow shape — pointwise, depthwise
(either backend), even a bare elementwise multiply-add, fori_loop or
unrolled — costs ~0.8 ms: a per-dependent-op latency floor (~28 GB/s
effective), not compute.  The xception step's ~170 sequential kernels x
this floor explains its 181 ms.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_conv_chain.py [variant ...]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CHAIN = 32


def chain(op, x0, flops_per_op, bytes_per_op, iters=4, label="",
          unroll=False):
    carry = x0.dtype  # int8 variants carry int8 (op requantizes + clips)

    if unroll:
        @jax.jit
        def fn(x, s):
            for _ in range(CHAIN):
                x = (op(x) * s).astype(carry)
            return x
    else:
        @jax.jit
        def fn(x, s):
            def body(_, c):
                c = op(c)
                return (c * s).astype(carry)
            return lax.fori_loop(0, CHAIN, body, x)

    scales = [jnp.bfloat16(1.0 + 1e-3 * i) for i in range(iters + 1)]
    t0 = time.perf_counter()
    float(fn(x0, scales[0]).astype(jnp.float32).sum())
    compile_s = time.perf_counter() - t0
    outs = []
    t0 = time.perf_counter()
    for s in scales[1:]:  # unique scale per program run (result-cache rule)
        outs.append(fn(x0, s))
    tot = sum(float(o.astype(jnp.float32).sum()) for o in outs)
    per_op = (time.perf_counter() - t0) / (iters * CHAIN)
    return {"variant": label, "ms_per_op": round(per_op * 1e3, 3),
            "tflops": round(flops_per_op / per_op / 1e12, 1),
            "act_gbps": round(bytes_per_op / per_op / 1e9, 1),
            "compile_s": round(compile_s, 1), "check": round(tot, 2)}


def build(variant, batch=8):
    rng = np.random.default_rng(0)

    def act(b, h, w, c):
        return jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)

    if variant == "pw728":
        b, h, c = batch, 32, 728
        x = act(b, h, h, c)
        k = jnp.asarray(rng.standard_normal((1, 1, c, c)) / c ** 0.5,
                        jnp.bfloat16)
        op = lambda v: lax.conv_general_dilated(
            v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        flops = 2 * b * h * h * c * c
    elif variant == "pw728mm":
        # the same contraction as a collapsed (B*H*W, C) @ (C, C) matmul
        b, h, c = batch, 32, 728
        x = act(b, h, h, c)
        k = jnp.asarray(rng.standard_normal((c, c)) / c ** 0.5, jnp.bfloat16)
        op = lambda v: jnp.einsum("bhwc,cd->bhwd", v, k,
                                  preferred_element_type=jnp.float32)
        flops = 2 * b * h * h * c * c
    elif variant in ("dw728", "dw728lax"):
        from cervical_tpu.ops import depthwise as DW
        b, h, c = batch, 32, 728
        x = act(b, h, h, c)
        k = jnp.asarray(rng.standard_normal((3, 3, 1, c)) / 3.0, jnp.bfloat16)
        if variant == "dw728":
            op = lambda v: DW.depthwise_conv3x3(v, k)
        else:
            op = lambda v: DW.depthwise_conv3x3_reference(v, k)
        flops = 2 * b * h * h * c * 9
    elif variant == "e3x3":
        b, h, c = batch, 128, 256
        x = act(b, h, h, c)
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)) / (3 * c ** 0.5),
                        jnp.bfloat16)
        op = lambda v: lax.conv_general_dilated(
            v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        flops = 2 * b * h * h * c * c * 9
    elif variant == "entry":
        b, h, c = batch, 256, 128
        x = act(b, h, h, c)
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)) / (3 * c ** 0.5),
                        jnp.bfloat16)
        op = lambda v: lax.conv_general_dilated(
            v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        flops = 2 * b * h * h * c * c * 9
    elif variant in ("e3x3T", "e3x3W", "e3x3F"):
        # the backward pass's two conv geometries at the e3x3 shape —
        # T = input-grad (transposed conv via vjp), W = weight-grad,
        # F = fwd via the same vjp harness (control).  A per-FLOP gap
        # vs plain e3x3 would finger XLA's conv-backward lowering as the
        # train step's cost center (fixable: custom_vjp einsum backward)
        b, h, c = batch, 128, 256
        x = act(b, h, h, c)
        k = jnp.asarray(rng.standard_normal((3, 3, c, c)) / (3 * c ** 0.5),
                        jnp.bfloat16)

        def conv(v, kk):
            return lax.conv_general_dilated(
                v, kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        if variant == "e3x3T":
            def op(v):
                _, vjp = jax.vjp(lambda u: conv(u, k), v)
                (dv,) = vjp(v)
                return dv
        elif variant == "e3x3W":
            def op(v):
                _, vjp = jax.vjp(lambda kk: conv(v, kk), k)
                (dk,) = vjp(v)
                return v * (1.0 + 1e-12 * dk.sum().astype(jnp.float32))
        else:
            op = lambda v: conv(v, k)
        flops = 2 * b * h * h * c * c * 9
    elif variant.startswith("ew"):
        # trivial elementwise op at the middle-flow activation shape —
        # if this also costs ~0.9 ms/op in-chain, the per-op cost is a
        # serialization/latency floor, not compute ("ew" = fori_loop,
        # "ewunroll" = straight-line python unroll like a real model)
        b, h, c = batch, 32, 728
        x = act(b, h, h, c)
        op = lambda v: v * jnp.bfloat16(1.0009765625) + jnp.bfloat16(1e-3)
        flops = 2 * b * h * h * c
    elif variant in ("pw728i8", "e3x3i8", "entryi8"):
        # int8 x int8 -> int32 convs (PTQ-serving candidates): do they hit
        # the int8 MXU (2x bf16 peak) at the geometries where bf16 convs
        # are compute-bound?  Requant back to int8 in-chain (shift+clip),
        # mirroring a quantized inference graph's inter-layer carry.
        geom = {"pw728i8": (8, 32, 728, 1),
                "e3x3i8": (8, 128, 256, 3),
                "entryi8": (8, 256, 128, 3)}
        b, h, c, kk = geom[variant]
        x = jnp.asarray(rng.integers(-127, 128, (b, h, h, c)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 128, (kk, kk, c, c)), jnp.int8)
        shift = int(np.log2(c * kk * kk * 42)) + 1  # keep requant in range

        def op(v):
            y = lax.conv_general_dilated(
                v, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return jnp.clip(y >> shift, -127, 127).astype(jnp.int8)

        flops = 2 * b * h * h * c * c * kk * kk
    else:
        raise SystemExit(f"unknown variant {variant!r}")
    # activation read + write at the carry dtype
    bytes_per_op = 2 * x.dtype.itemsize * x.size
    return x, op, flops, bytes_per_op


def main():
    variants = sys.argv[1:] or ["pw728", "pw728mm", "dw728", "dw728lax",
                                "e3x3", "entry"]
    global CHAIN
    for v in variants:
        # "ew@32" = variant at batch 32; "ew@32x128" = chain length 128
        # (sweeping the length separates per-op cost from fixed
        # per-program overhead: ms_per_op that shrinks with length is
        # program overhead, constant ms_per_op is a real per-op floor)
        name, _, bs = v.partition("@")
        bs, _, cl = bs.partition("x")
        batch = int(bs) if bs else 8
        CHAIN = int(cl) if cl else 32
        unroll = name.endswith("unroll")
        x, op, flops, nbytes = build(name[:-6] if unroll else name, batch)
        print(json.dumps(chain(op, x, flops, nbytes, label=v,
                               unroll=unroll)), flush=True)


if __name__ == "__main__":
    main()
