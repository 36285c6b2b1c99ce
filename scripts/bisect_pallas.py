"""Bisect the Mosaic compile failure in the production pallas kernels.

Round-2 driver bench: ``warp_labels`` compiles on the live platform but
``warp_images`` and ``photometric`` kill the remote AOT compile helper
(HTTP 500, subprocess exit 1).  This script compiles a ladder of
feature-stripped kernel variants — from the passing label kernel up to the
full production image kernel — so the offending construct is identified
from one run's output instead of rediscovered each round.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo \
        python scripts/bisect_pallas.py [variant ...]

With no args, runs every variant in order.  Each prints PASS/FAIL plus the
exception tail.  Variants compile at batch 4 / size 512 (the failure
reproduces at batch 8 per the round-2 verdict; small batch keeps compile
time down).
"""

import functools
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cervical_tpu.ops import pallas_warp as PW

B, S = 4, 512


def _grid_spec(c, s):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, c, s, s), lambda i, p: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, s, s), lambda i, p: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )


def _run_image_kernel(kernel, out_dtype=jnp.bfloat16, nparams=PW.NPARAMS):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, 3, S, S)), jnp.uint8)
    params = jnp.asarray(rng.normal(size=(B, nparams)), jnp.float32)
    # realistic magnitudes: identity-ish resample + small rotation
    params = params.at[:, PW.P_AY].set(1.0).at[:, PW.P_AX].set(1.0)
    params = params.at[:, PW.P_BY].set(0.0).at[:, PW.P_BX].set(0.0)
    params = params.at[:, PW.P_TANH].set(0.05).at[:, PW.P_SINT].set(0.1)
    params = params.at[:, PW.P_ANGLE].set(5.0).at[:, PW.P_FILL].set(128.0)
    out = pl.pallas_call(
        kernel, grid_spec=_grid_spec(3, S),
        out_shape=jax.ShapeDtypeStruct((B, 3, S, S), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
    )(params, imgs)
    return float(out.astype(jnp.float32).sum())


# --- kernel variants, ordered from known-good toward production ------------

def k_resample_only(params_ref, img_ref, out_ref):
    """Bilinear matmul resample + fill, NO rotation at all."""
    b = pl.program_id(0)
    ay, by = params_ref[b, PW.P_AY], params_ref[b, PW.P_BY]
    ax, bx = params_ref[b, PW.P_AX], params_ref[b, PW.P_BX]
    fill = params_ref[b, PW.P_FILL]
    wy, inb_y = PW._interp_weights(ay, by, S, S, nearest=False)
    wxt, inb_x = PW._interp_weights(ax, bx, S, S, nearest=False,
                                    transposed=True)
    fill_y = (1.0 - inb_y) * fill
    fill_x = (1.0 - inb_x) * fill
    for ch in range(3):
        src = img_ref[0, ch].astype(jnp.int32).astype(jnp.float32) \
            .astype(jnp.bfloat16)
        v = jnp.dot(wy, src, preferred_element_type=jnp.float32) + fill_y
        h = jnp.dot(v.astype(jnp.bfloat16), wxt,
                    preferred_element_type=jnp.float32) + fill_x
        out_ref[0, ch] = h.astype(out_ref.dtype)


def k_resample_nearest(params_ref, img_ref, out_ref):
    """Nearest resample (the label kernel's weights) on 3 channels."""
    b = pl.program_id(0)
    ay, by = params_ref[b, PW.P_AY], params_ref[b, PW.P_BY]
    ax, bx = params_ref[b, PW.P_AX], params_ref[b, PW.P_BX]
    wy, _ = PW._interp_weights(ay, by, S, S, nearest=True)
    wxt, _ = PW._interp_weights(ax, bx, S, S, nearest=True, transposed=True)
    for ch in range(3):
        src = img_ref[0, ch].astype(jnp.int32).astype(jnp.float32) \
            .astype(jnp.bfloat16)
        v = jnp.dot(wy, src, preferred_element_type=jnp.float32)
        h = jnp.dot(v.astype(jnp.bfloat16), wxt,
                    preferred_element_type=jnp.float32)
        out_ref[0, ch] = h.astype(out_ref.dtype)


def k_rotate_nocond(params_ref, img_ref, out_ref):
    """Bilinear resample + UNCONDITIONAL 3-shear rotation (no lax.cond)."""
    b = pl.program_id(0)
    ay, by = params_ref[b, PW.P_AY], params_ref[b, PW.P_BY]
    ax, bx = params_ref[b, PW.P_AX], params_ref[b, PW.P_BX]
    fill = params_ref[b, PW.P_FILL]
    tanh, sint = params_ref[b, PW.P_TANH], params_ref[b, PW.P_SINT]
    wy, inb_y = PW._interp_weights(ay, by, S, S, nearest=False)
    wxt, inb_x = PW._interp_weights(ax, bx, S, S, nearest=False,
                                    transposed=True)
    fill_y = (1.0 - inb_y) * fill
    fill_x = (1.0 - inb_x) * fill
    for ch in range(3):
        src = img_ref[0, ch].astype(jnp.int32).astype(jnp.float32) \
            .astype(jnp.bfloat16)
        v = jnp.dot(wy, src, preferred_element_type=jnp.float32) + fill_y
        h = (jnp.dot(v.astype(jnp.bfloat16), wxt,
                     preferred_element_type=jnp.float32) + fill_x) \
            .astype(jnp.bfloat16)
        out_ref[0, ch] = PW._rotate_plane(h, tanh, sint, fill,
                                          nearest=False, size=S)


def k_rotate_nearest_cond(params_ref, img_ref, out_ref):
    """Bilinear resample + lax.cond NEAREST rotation (label-kernel shears
    on image planes)."""
    b = pl.program_id(0)
    ay, by = params_ref[b, PW.P_AY], params_ref[b, PW.P_BY]
    ax, bx = params_ref[b, PW.P_AX], params_ref[b, PW.P_BX]
    fill = params_ref[b, PW.P_FILL]
    angle = params_ref[b, PW.P_ANGLE]
    tanh, sint = params_ref[b, PW.P_TANH], params_ref[b, PW.P_SINT]
    wy, inb_y = PW._interp_weights(ay, by, S, S, nearest=False)
    wxt, inb_x = PW._interp_weights(ax, bx, S, S, nearest=False,
                                    transposed=True)
    fill_y = (1.0 - inb_y) * fill
    fill_x = (1.0 - inb_x) * fill
    for ch in range(3):
        src = img_ref[0, ch].astype(jnp.int32).astype(jnp.float32) \
            .astype(jnp.bfloat16)
        v = jnp.dot(wy, src, preferred_element_type=jnp.float32) + fill_y
        h = (jnp.dot(v.astype(jnp.bfloat16), wxt,
                     preferred_element_type=jnp.float32) + fill_x) \
            .astype(jnp.bfloat16)
        out_ref[0, ch] = jax.lax.cond(
            angle != 0.0,
            lambda t: PW._rotate_plane(t, tanh, sint, fill, nearest=True,
                                       size=S),
            lambda t: t, h)


def k_production_image(params_ref, img_ref, out_ref):
    PW._warp_image_kernel(params_ref, img_ref, out_ref, size=S,
                          src_hw=(S, S))


def _run_photometric(blur_mode):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (B, 3, S, S)), jnp.bfloat16)
    gains = jnp.asarray(rng.uniform(0.7, 1.3, (B, 3)), jnp.float32)
    flags = jnp.asarray(rng.integers(0, 2, (B,)), bool)
    out = PW.photometric(imgs, gains, flags, blur_mode=blur_mode)
    return float(out.astype(jnp.float32).sum())


def _run_hsv_only():
    """HSV jitter alone (no blur machinery at all)."""
    def kern(p_ref, img_ref, out_ref):
        b = pl.program_id(0)
        gh, gs, gv = p_ref[b, 0], p_ref[b, 1], p_ref[b, 2]
        r = img_ref[0, 0].astype(jnp.float32)
        g = img_ref[0, 1].astype(jnp.float32)
        bl = img_ref[0, 2].astype(jnp.float32)
        ro, go, bo = PW._hsv_jitter_planes(r, g, bl, gh, gs, gv)
        out_ref[0, 0] = (ro / 255.0).astype(out_ref.dtype)
        out_ref[0, 1] = (go / 255.0).astype(out_ref.dtype)
        out_ref[0, 2] = (bo / 255.0).astype(out_ref.dtype)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (B, 3, S, S)), jnp.bfloat16)
    params = jnp.asarray(rng.uniform(0.7, 1.3, (B, 4)), jnp.float32)
    out = pl.pallas_call(
        kern, grid_spec=_grid_spec(3, S),
        out_shape=jax.ShapeDtypeStruct((B, 3, S, S), jnp.bfloat16),
    )(params, imgs)
    return float(out.astype(jnp.float32).sum())


def _run_blur_only():
    """Unconditional separable 5x5 blur alone."""
    def kern(p_ref, img_ref, out_ref):
        for ch in range(3):
            x = img_ref[0, ch].astype(jnp.float32)
            out_ref[0, ch] = PW._blur2d(x, S).astype(out_ref.dtype)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (B, 3, S, S)), jnp.bfloat16)
    params = jnp.zeros((B, 1), jnp.float32)
    out = pl.pallas_call(
        kern, grid_spec=_grid_spec(3, S),
        out_shape=jax.ShapeDtypeStruct((B, 3, S, S), jnp.bfloat16),
    )(params, imgs)
    return float(out.astype(jnp.float32).sum())


def _run_labels():
    rng = np.random.default_rng(0)
    lbls = jnp.asarray(rng.integers(0, 5, (B, S, S)), jnp.uint8)
    params = jnp.zeros((B, PW.NPARAMS), jnp.float32)
    params = params.at[:, PW.P_AY].set(1.0).at[:, PW.P_AX].set(1.0)
    params = params.at[:, PW.P_ANGLE].set(5.0)
    params = params.at[:, PW.P_TANH].set(0.05).at[:, PW.P_SINT].set(0.1)
    out = PW.warp_labels(lbls, params)
    return float(out.astype(jnp.int32).sum())


VARIANTS = {
    "labels": _run_labels,                                   # control: PASS
    "resample_nearest": lambda: _run_image_kernel(k_resample_nearest),
    "resample_bilinear": lambda: _run_image_kernel(k_resample_only),
    "resample_bilinear_f32out": lambda: _run_image_kernel(
        k_resample_only, out_dtype=jnp.float32),
    "rotate_nearest_cond": lambda: _run_image_kernel(k_rotate_nearest_cond),
    "rotate_bilinear_nocond": lambda: _run_image_kernel(k_rotate_nocond),
    "production_image": lambda: _run_image_kernel(k_production_image),
    "hsv_only": _run_hsv_only,
    "blur_only": _run_blur_only,
    "photometric_none": lambda: _run_photometric("none"),
    "photometric_all": lambda: _run_photometric("all"),
    "photometric_select": lambda: _run_photometric("select"),
}


def main(argv):
    names = argv or list(VARIANTS)
    for name in names:
        fn = VARIANTS[name]
        t0 = time.perf_counter()
        try:
            val = fn()
            dt = time.perf_counter() - t0
            print(f"PASS {name:28s} {dt:7.1f}s  sum={val:.3e}", flush=True)
        except Exception as e:
            dt = time.perf_counter() - t0
            tail = str(e).strip().splitlines()
            tail = " | ".join(tail[-3:]) if tail else type(e).__name__
            print(f"FAIL {name:28s} {dt:7.1f}s  {type(e).__name__}: "
                  f"{tail[:500]}", flush=True)
            if "-v" in sys.argv:
                traceback.print_exc()


if __name__ == "__main__":
    main([a for a in sys.argv[1:] if not a.startswith("-")])
