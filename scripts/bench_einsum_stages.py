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


def make_pipe(variant: str, int8: bool = True):
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import warp_xla as WX
    cap = B // 4
    bcap = 8 if variant == "blur8" else cap

    @jax.jit
    def pipe(images, labels, key):
        params = A.sample_augment_params(key, B, rotate_prefix=cap,
                                         blur_suffix=bcap)
        if variant == "lbox":
            return WX.augment_batch_einsum(images, labels, params, (S, S),
                                           letterbox=True,
                                           int8_resample=int8)
        return WX.augment_batch_einsum(
            images, labels, params, (S, S),
            rotate=(variant != "norot"),
            rotate_capacity=cap, blur_capacity=bcap,
            two_shear=True, int8_resample=int8)

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

    variants = ["full", "norot", "blur8", "lbox"]
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
    f, nr, b8, lb = (results[v][-1] for v in variants)
    print(json.dumps({
        "rotation_ladders_ms": round(f - nr, 2),
        "blur_tail_ms": round(f - b8, 2),
        "hsv_plus_norm_ms": round(nr - lb, 2),  # upper bound: lbox also skips blur
        "resample_plus_floor_ms": round(lb, 2),
        "all_ms": {v: results[v] for v in variants},
    }))


if __name__ == "__main__":
    main()
