"""Stage-delta breakdown of the einsum/barrel fallback pipeline on chip.

The einsum backend (ops/warp_xla.py) is the bench.py fallback when Mosaic
regresses (round-2 VERDICT weak #3: its 10.6k img/s margin over the 10k
baseline is thin).  Standalone per-op programs are worthless on this
platform (CLAUDE.md rule 10), so stage costs are measured as DELTAS of the
full jitted pipeline with stages removed:

  full    — resample + rotation barrels + blur tail + HSV  (the fallback)
  norot   — rotate=False: removes the two uint32-packed shear ladders
  blur8   — blur_capacity=8: removes (almost all of) the 5x5 blur tail
  lbox    — letterbox=True: resample + /255 only (no rotation/HSV/blur)

Each variant compiles once and times 3 windows of 10 pipelined dispatches
(median), interleaved ABAB-style across rounds so drift and the fresh-
process penalty (CLAUDE.md rule 9) don't bias one variant.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/bench_einsum_stages.py [rounds]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

B, S = 1024, 512


def _hsv_identity(x, gains):
    return x.astype(jnp.float32)


def _hsv_bf16_stack(rgb, gains):
    """hsv_jitter_batched with each output channel clipped + cast to bf16
    BEFORE the 3-channel stack — if XLA materializes the f32 stack unfused,
    this halves that traffic."""
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(v == r, 60.0 * (g - b) / safe,
                  jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                            240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) * 0.5
    s = jnp.where(v > 0, 255.0 * delta / jnp.where(v > 0, v, 1.0), 0.0)
    g0 = gains[:, 0][:, None, None]
    g1 = gains[:, 1][:, None, None]
    g2 = gains[:, 2][:, None, None]
    h = jnp.floor(jnp.mod(jnp.round(h) * g0, 180.0))
    s = jnp.floor(jnp.clip(jnp.round(s) * g1, 0.0, 255.0))
    v = jnp.floor(jnp.clip(jnp.round(v) * g2, 0.0, 255.0))
    hd = h * 2.0
    sf = s / 255.0
    c = v * sf
    hp = hd / 60.0
    xx = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    i = jnp.floor(hp).astype(jnp.int32) % 6

    def sel(a0, a1, a2, a3, a4, a5):
        return jnp.where(i == 0, a0, jnp.where(i == 1, a1, jnp.where(
            i == 2, a2, jnp.where(i == 3, a3, jnp.where(i == 4, a4, a5)))))

    def ch(y):
        return jnp.clip(y + m, 0.0, 255.0).astype(jnp.bfloat16)

    return jnp.stack([ch(sel(c, xx, z, z, xx, c)),
                      ch(sel(xx, c, c, xx, z, z)),
                      ch(sel(z, z, xx, c, c, xx))], axis=-1)


def _hsv_recip(rgb, gains):
    """closed-form + HOISTED RECIPROCALS: 2 divides/pixel instead of 4."""
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    rd = 60.0 / jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(v == r, (g - b) * rd,
                  jnp.where(v == g, 120.0 + (b - r) * rd,
                            240.0 + (r - g) * rd))
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) * 0.5
    s = 255.0 * delta / jnp.where(v > 0, v, 1.0)
    g0 = gains[:, 0][:, None, None]
    g1 = gains[:, 1][:, None, None]
    g2 = gains[:, 2][:, None, None]
    h = jnp.floor(jnp.mod(jnp.round(h) * g0, 180.0))
    s = jnp.floor(jnp.clip(jnp.round(s) * g1, 0.0, 255.0))
    v = jnp.floor(jnp.clip(jnp.round(v) * g2, 0.0, 255.0))
    hp = h * (1.0 / 30.0)
    c = v * (s * (1.0 / 255.0))

    def ch(n):
        k = jnp.mod(n + hp, 6.0)
        t = jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
        return jnp.clip(v - c * t, 0.0, 255.0).astype(jnp.bfloat16)

    return jnp.stack([ch(5.0), ch(3.0), ch(1.0)], axis=-1)


def _hsv_planar(rgb, gains):
    """closed-form on PLANAR channel views (transpose in, stack out) —
    probes whether the NHWC stride-3 channel reads are the cost."""
    xp = jnp.transpose(rgb, (0, 3, 1, 2)).astype(jnp.float32)
    r, g, b = xp[:, 0], xp[:, 1], xp[:, 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    rd = 60.0 / jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(v == r, (g - b) * rd,
                  jnp.where(v == g, 120.0 + (b - r) * rd,
                            240.0 + (r - g) * rd))
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) * 0.5
    s = 255.0 * delta / jnp.where(v > 0, v, 1.0)
    g0 = gains[:, 0][:, None, None]
    g1 = gains[:, 1][:, None, None]
    g2 = gains[:, 2][:, None, None]
    h = jnp.floor(jnp.mod(jnp.round(h) * g0, 180.0))
    s = jnp.floor(jnp.clip(jnp.round(s) * g1, 0.0, 255.0))
    v = jnp.floor(jnp.clip(jnp.round(v) * g2, 0.0, 255.0))
    hp = h * (1.0 / 30.0)
    c = v * (s * (1.0 / 255.0))

    def ch(n):
        k = jnp.mod(n + hp, 6.0)
        t = jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
        return jnp.clip(v - c * t, 0.0, 255.0).astype(jnp.bfloat16)

    return jnp.stack([ch(5.0), ch(3.0), ch(1.0)], axis=-1)


def make_pipe(variant: str, int8: bool = True):
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import warp_xla as WX
    cap = B // 4
    bcap = 8 if variant == "blur8" else cap
    def _fast(x, gains):
        return A.hsv_jitter_batched_fast(x, gains)
    hsv = {"nohsv": _hsv_identity, "hsvbf16": _hsv_bf16_stack,
           "fasthsv": _fast, "fast_radix4": _fast,
           "fasthsv2": _hsv_recip, "fasthsv_planar": _hsv_planar}.get(variant)
    radix4 = variant in ("radix4", "fast_radix4")
    # bypass augment_batch_einsum's own jit cache: monkeypatched variants
    # share its static-arg key, so the cached trace of a prior variant
    # would silently shadow the patch
    abe = WX.augment_batch_einsum.__wrapped__

    @jax.jit
    def pipe(images, labels, key):
        params = A.sample_augment_params(key, B, rotate_prefix=cap,
                                         blur_suffix=bcap)
        if variant == "lbox":
            return abe(images, labels, params, (S, S),
                       letterbox=True, int8_resample=int8)
        if hsv is not None:
            saved = A.hsv_jitter_batched
            A.hsv_jitter_batched = hsv
            try:
                return abe(images, labels, params, (S, S),
                           rotate_capacity=cap, blur_capacity=bcap,
                           two_shear=True, int8_resample=int8,
                           radix4=radix4)
            finally:
                A.hsv_jitter_batched = saved
        return abe(images, labels, params, (S, S),
                   rotate=(variant != "norot"),
                   rotate_capacity=cap, blur_capacity=bcap,
                   two_shear=True, int8_resample=int8, radix4=radix4)

    return pipe


def time_pipe(pipe, images, labels, keys, iters=10, windows=3, k0=0):
    out = pipe(images, labels, keys[k0])
    _ = float(out[0][(0,) * out[0].ndim])
    times = []
    k = k0 + 1
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipe(images, labels, keys[k])
            k += 1
        _ = float(out[0].sum()) + float(out[1].sum())
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (B, S, S)), jnp.uint8)
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)

    variants = sys.argv[2:] or ["full", "norot", "blur8", "lbox"]
    pipes = {v: make_pipe(v) for v in variants}
    results = {v: [] for v in variants}
    k0 = 0
    for r in range(rounds):
        for v in variants:
            ms = time_pipe(pipes[v], images, labels, keys, k0=k0) * 1e3
            k0 += 40
            results[v].append(round(ms, 2))
            print(json.dumps({"round": r, "variant": v, "ms_per_batch": round(ms, 2),
                              "images_per_sec": round(B / ms * 1e3, 1)}),
                  flush=True)
    # deltas from the LAST round (first round carries compile/warm-up skew)
    summary = {"all_ms": {v: results[v] for v in variants}}
    if {"full", "norot", "blur8", "lbox"} <= set(variants):
        f, nr, b8, lb = (results[v][-1]
                         for v in ("full", "norot", "blur8", "lbox"))
        summary.update({
            "rotation_ladders_ms": round(f - nr, 2),
            "blur_tail_ms": round(f - b8, 2),
            # upper bound: lbox also skips the blur + concat machinery
            "hsv_plus_norm_ms": round(nr - lb, 2),
            "resample_plus_floor_ms": round(lb, 2),
        })
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
