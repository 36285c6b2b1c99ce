"""Per-stage timing of the pallas augmentation pipeline on the real TPU.

Usage: python scripts/bench_pallas_stages.py [stage ...]
Stages: full, warpimg, warplbl, photo, trans_in, trans_out
(default: all, ABAB-interleaved across repeats per CLAUDE.md item 9)

Each stage is timed as its own jitted program at B=1024 512^2 with
never-repeated inputs and dependent-fetch forcing; subtract the fixed
~26-29 ms per-program cost (CLAUDE.md item 7) before interpreting.
Purpose: locate the headroom in the 17k img/s headline (rotation runs on
every image though only 25% rotate; photometric is a separate kernel with
an extra HBM round trip; NHWC<->planar transposes bracket the kernels).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from scripts._bench_util import timed  # noqa: E402

BATCH, SIZE = 1024, 512


def _inputs():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (BATCH, SIZE, SIZE, 3)),
                         jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (BATCH, SIZE, SIZE)), jnp.uint8)
    return images, labels


def _params_fn():
    from cervical_tpu.ops import augment as A
    cap = BATCH // 4

    def sample(key):
        return A.sample_augment_params(key, BATCH, rotate_prefix=cap,
                                       blur_suffix=cap)
    return sample


def make_stage(name):
    from cervical_tpu.ops import augment as A  # noqa: F401
    from cervical_tpu.ops import pallas_warp as PW
    images, labels = _inputs()
    sample = _params_fn()
    keys = jax.random.split(jax.random.PRNGKey(0), 512)

    if name in ("full", "full_fused"):
        fused = name == "full_fused"

        @jax.jit
        def fn(images, labels, key):
            p = sample(key)
            return PW.augment_batch_pallas(images, labels, p, (SIZE, SIZE),
                                           fused=fused)
        return fn, lambda i: (images, labels, keys[i])

    if name == "warpimg":
        @jax.jit
        def fn(images, key):
            p = sample(key)
            wp = PW.make_warp_params(p, (SIZE, SIZE), (SIZE, SIZE))
            planar = jnp.transpose(images, (0, 3, 1, 2))
            return PW.warp_images(planar, wp, out_size=SIZE)
        return fn, lambda i: (images, keys[i])

    if name == "warplbl":
        @jax.jit
        def fn(labels, key):
            p = sample(key)
            wp = PW.make_warp_params(p, (SIZE, SIZE), (SIZE, SIZE))
            return PW.warp_labels(labels, wp, out_size=SIZE)
        return fn, lambda i: (labels, keys[i])

    if name == "photo":
        planar = jnp.asarray(
            np.random.default_rng(1).integers(0, 256, (BATCH, 3, SIZE, SIZE)),
            jnp.bfloat16)

        @jax.jit
        def fn(planar, key):
            p = sample(key)
            return PW.photometric(planar, p["gains"], p["blur"])
        return fn, lambda i: (planar, keys[i])

    if name == "trans_in":
        @jax.jit
        def fn(images, s):
            return jnp.transpose(images + s, (0, 3, 1, 2))
        return fn, lambda i: (images, jnp.uint8(i))

    if name == "trans_out":
        planar = jnp.asarray(
            np.random.default_rng(1).integers(0, 256, (BATCH, 3, SIZE, SIZE)),
            jnp.bfloat16)

        @jax.jit
        def fn(planar, s):
            return jnp.transpose(planar + s, (0, 2, 3, 1))
        return fn, lambda i: (planar, jnp.bfloat16(i))

    raise SystemExit(f"unknown stage {name}")


def main():
    stages = sys.argv[1:] or ["full", "warpimg", "warplbl", "photo",
                              "trans_in", "trans_out"]
    reps = 2  # ABAB: every stage timed twice, interleaved
    built = {s: make_stage(s) for s in stages}
    results = {s: [] for s in stages}
    for r in range(reps):
        for s in stages:
            fn, args_fn = built[s]
            # never repeat an input across reps (tunnel result-caches
            # identical (fn, args) executions — CLAUDE.md item 2)
            off = r * 64
            dt, _ = timed(fn, lambda i: args_fn(off + i), iters=8, warmup=3)
            results[s].append(dt)
            print(json.dumps({"stage": s, "rep": r,
                              "ms_per_batch": round(dt * 1e3, 2),
                              "img_per_sec": round(BATCH / dt, 1)}),
                  flush=True)
    summary = {s: round(min(v) * 1e3, 2) for s, v in results.items()}
    print(json.dumps({"best_ms_per_batch": summary}), flush=True)


if __name__ == "__main__":
    main()
