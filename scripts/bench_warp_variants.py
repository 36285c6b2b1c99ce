"""Profile augmentation-pipeline variants on the real TPU.

Usage: python scripts/bench_warp_variants.py [variant ...]
Variants: base, two_shear, b2048, int8, int8_b2048, int8_radix4,
pallas, pallas_fused,
pallas_planar, pallas_u8,
pallas256, pallas1280, pallas1536, pallas_scan2, pallas_scan3,
pallas_bsplit, pallas_bsplit_scan2,
pallas_bsplit_scan3, rot_old, rot_packed, rot_two, blur_conv, blur_einsum
(default: base two_shear).  Repeat variants for ABAB, e.g.
``pallas pallas_fused pallas pallas_fused``.

Prints one JSON line per variant.  Follows the platform rules in
CLAUDE.md: vary an input per timed iteration, force completion with a
dependent scalar fetch, pipeline several dispatches.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _force(out):
    """Force completion via a dependent scalar fetch (CLAUDE.md rule 2)."""
    return sum(float(l[(0,) * l.ndim]) for l in jax.tree_util.tree_leaves(out))


def timed(fn, args_fn, iters=10, warmup=2):
    out = fn(*args_fn(0))
    _force(out)
    for i in range(warmup):
        out = fn(*args_fn(i + 1))
    _force(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_fn(100 + i))
    tot = sum(float(l.sum()) for l in jax.tree_util.tree_leaves(out))
    dt = time.perf_counter() - t0
    return dt / iters, tot


def full_pipeline(batch, size, two_shear, int8_resample=False,
                  radix4=False):
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import warp_xla as WX
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (batch, size, size)), jnp.uint8)
    cap = batch // 4

    @jax.jit
    def pipe(images, labels, key):
        params = A.sample_augment_params(key, batch, rotate_prefix=cap,
                                         blur_suffix=cap)
        return WX.augment_batch_einsum(images, labels, params, (size, size),
                                       rotate_capacity=cap, blur_capacity=cap,
                                       two_shear=two_shear,
                                       int8_resample=int8_resample,
                                       radix4=radix4)

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    dt, _ = timed(pipe, lambda i: (images, labels, keys[i % 256]))
    return batch / dt


def full_pipeline_pallas(batch, size, fused=False, blur_dtype=None,
                         planar=False, carry_u8=False):
    # same sampling protocol as ``full_pipeline`` (capacity prefix/suffix),
    # but through the Mosaic kernels (ops/pallas_warp.py) — re-opened by
    # scripts/probe_pallas.py showing in-kernel dot at XLA parity (round 1
    # measured it ~40x slow, which had parked these backends)
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import pallas_warp as PW
    rng = np.random.default_rng(0)
    shape = (batch, 3, size, size) if planar else (batch, size, size, 3)
    images = jnp.asarray(rng.integers(0, 256, shape), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (batch, size, size)), jnp.uint8)
    cap = batch // 4

    kw = {} if blur_dtype is None else {"blur_dtype": blur_dtype}

    @jax.jit
    def pipe(images, labels, key):
        params = A.sample_augment_params(key, batch, rotate_prefix=cap,
                                         blur_suffix=cap)
        return PW.augment_batch_pallas(images, labels, params, (size, size),
                                       fused=fused, planar=planar,
                                       carry_u8=carry_u8, **kw)

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    dt, _ = timed(pipe, lambda i: (images, labels, keys[i % 256]))
    return batch / dt


def full_pipeline_pallas_scan(batch, size, k, blur_capacity=None):
    """K sub-batches per program via ``lax.scan`` — amortizes the fixed
    per-program-execution cost (docs/PLATFORM.md round-2 probes: ~26-29 ms
    serialized per execution in the chain probe, ~16 ms residual in the
    warp-stage attribution).  Mirrors the training-side
    ``steps_per_call`` design (make_train_step_scan).  The input batch is
    reused across scan iterations (as the per-dispatch bench already reuses
    it across dispatches); params vary per iteration via key folding, and
    all K output batches materialize to HBM."""
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import pallas_warp as PW
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (batch, size, size)), jnp.uint8)
    cap = batch // 4

    @jax.jit
    def pipe(images, labels, key):
        def body(key, _):
            key, sub = jax.random.split(key)
            params = A.sample_augment_params(sub, batch, rotate_prefix=cap,
                                             blur_suffix=cap)
            out = PW.augment_batch_pallas(images, labels, params,
                                          (size, size),
                                          blur_capacity=blur_capacity)
            return key, out
        _, outs = jax.lax.scan(body, key, None, length=k)
        return outs

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    dt, _ = timed(pipe, lambda i: (images, labels, keys[i % 256]))
    return k * batch / dt


def full_pipeline_pallas_bsplit(batch, size):
    """Blur on the fixed suffix via two specialized photometric calls
    (no wasted 5x5 on the 75% non-blurring images, no flag select)."""
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import pallas_warp as PW
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (batch, size, size)), jnp.uint8)
    cap = batch // 4

    @jax.jit
    def pipe(images, labels, key):
        params = A.sample_augment_params(key, batch, rotate_prefix=cap,
                                         blur_suffix=cap)
        return PW.augment_batch_pallas(images, labels, params, (size, size),
                                       blur_capacity=cap)

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    dt, _ = timed(pipe, lambda i: (images, labels, keys[i % 256]))
    return batch / dt


def rotation_only(batch, size, mode):
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import warp_xla as WX
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, 256, (batch, size, size, 4)), jnp.uint8)
    fill = np.array([128, 128, 128, 0], np.uint8)

    @jax.jit
    def rot(planes, key):
        p = A.sample_augment_params(key, batch, rotate_prefix=batch)
        wp = WX.make_warp_params(p, (size, size), (size, size))
        if mode == "old":
            return WX._rotate_u8(planes, wp, nearest=False, fill_u8=fill,
                                 nearest_tail=1)
        return WX._rotate_packed(planes, wp, fill, two_shear=(mode == "two"))

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    dt, _ = timed(rot, lambda i: (planes, keys[i % 256]))
    return batch / dt


def blur_only(batch, size, mode):
    from cervical_tpu.ops import augment as A
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)),
                    jnp.bfloat16)
    fn = A.gaussian_blur if mode == "conv" else A.gaussian_blur_einsum
    jfn = jax.jit(lambda x, s: fn(x + s))
    dt, _ = timed(jfn, lambda i: (x, jnp.bfloat16(i % 7)))
    return batch / dt


def main():
    variants = sys.argv[1:] or ["base", "two_shear"]
    for v in variants:
        t0 = time.perf_counter()
        if v == "base":
            ips = full_pipeline(1024, 512, False)
        elif v == "two_shear":
            ips = full_pipeline(1024, 512, True)
        elif v == "b2048":
            ips = full_pipeline(2048, 512, True)
        elif v == "int8":
            ips = full_pipeline(1024, 512, True, int8_resample=True)
        elif v == "int8_b2048":
            ips = full_pipeline(2048, 512, True, int8_resample=True)
        elif v == "int8_radix4":
            ips = full_pipeline(1024, 512, True, int8_resample=True,
                                radix4=True)
        elif v == "pallas":
            ips = full_pipeline_pallas(1024, 512, fused=False)
        elif v == "pallas_fused":
            ips = full_pipeline_pallas(1024, 512, fused=True)
        elif v == "pallas_planar":
            ips = full_pipeline_pallas(1024, 512, fused=False, planar=True)
        elif v == "pallas_u8":
            ips = full_pipeline_pallas(1024, 512, carry_u8=True)
        elif v == "pallas256":
            ips = full_pipeline_pallas(256, 512, fused=False)
        elif v == "pallas1280":
            ips = full_pipeline_pallas(1280, 512, fused=False)
        elif v == "pallas1536":
            ips = full_pipeline_pallas(1536, 512, fused=False)
        elif v == "pallas_scan2":
            ips = full_pipeline_pallas_scan(1024, 512, 2)
        elif v == "pallas_scan3":
            ips = full_pipeline_pallas_scan(1024, 512, 3)
        elif v == "pallas_bsplit":
            ips = full_pipeline_pallas_bsplit(1024, 512)
        elif v == "pallas_bsplit_scan2":
            ips = full_pipeline_pallas_scan(1024, 512, 2, blur_capacity=256)
        elif v == "pallas_bsplit_scan3":
            ips = full_pipeline_pallas_scan(1024, 512, 3, blur_capacity=256)
        elif v == "rot_old":
            ips = rotation_only(256, 512, "old")
        elif v == "rot_packed":
            ips = rotation_only(256, 512, "packed")
        elif v == "rot_two":
            ips = rotation_only(256, 512, "two")
        elif v == "blur_conv":
            ips = blur_only(256, 512, "conv")
        elif v == "blur_einsum":
            ips = blur_only(256, 512, "einsum")
        else:
            print(json.dumps({"variant": v, "error": "unknown"}))
            continue
        print(json.dumps({"variant": v, "images_per_sec": round(ips, 1),
                          "wall_incl_compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
