"""Probe: can the epoch-shuffle of a device-resident train set run at
memory bandwidth on this platform?

The round-5 design (VERDICT r4 task #1) keeps the full train set in HBM
(6,720 x 512^2 x 3 uint8 = 5.3 GB fits the 16 GB chip) and reshuffles it
on-device once per epoch.  This platform scalarizes 2-D *spatial* gathers
(docs/PLATFORM.md item 5) and round 4 found the same pathology in
class-axis gathers — batch-axis gathers are explicitly untested.  Three
candidate formulations, each ONE program (compile budget rule), forced via
a dependent checksum fetch, inputs varied per timed iteration via the PRNG
key (tunnel result-cache rule):

  A. ``take(data, permutation(key, n), axis=0)`` on the flat (N,...) set —
     the full-shuffle candidate (one program per epoch).
  B. a K-step ``lax.scan`` reading (B,...) chunks out of a resident
     (C,B,...) layout via ``dynamic_index_in_dim`` — the per-step read
     path of the scan trainer (should be pure bandwidth: no gather at
     all).
  C. a plain elementwise pass over the same bytes — the platform's
     memory floor for comparison.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/probe_resident_shuffle.py [n_images]   (default 768)
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, args, key, iters=6):
    """Compile+warm, then time `iters` calls with per-call folded keys,
    forcing each via the dependent scalar the program returns."""
    out = fn(*args, key)
    first = float(out[-1] if isinstance(out, tuple) else out)
    times = []
    for i in range(iters):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        out = fn(*args, k)
        _ = float(out[-1] if isinstance(out, tuple) else out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], times[0], first


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    b = 8
    c = n // b
    size = 512
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (n, size, size, 3)), jnp.uint8)
    lbls = jnp.asarray(rng.integers(0, 5, (n, size, size)), jnp.uint8)
    gb = (imgs.nbytes + lbls.nbytes) / 1e9
    imgs_c = imgs.reshape(c, b, size, size, 3)
    lbls_c = lbls.reshape(c, b, size, size)

    @jax.jit
    def full_permute(im, lb, key):
        perm = jax.random.permutation(key, im.shape[0])
        im_p = jnp.take(im, perm, axis=0)
        lb_p = jnp.take(lb, perm, axis=0)
        # dependent checksum over a thin slice of BOTH outputs: forces the
        # permuted arrays to materialize (they are program outputs) and
        # completion to be observable host-side
        chk = (im_p[:, 0, 0, 0].astype(jnp.int32).sum()
               + lb_p[:, 0, 0].astype(jnp.int32).sum())
        return im_p, lb_p, chk

    @jax.jit
    def chunk_reads(im_c, lb_c, key):
        idx = jax.random.permutation(key, im_c.shape[0])

        def body(acc, i):
            a = jax.lax.dynamic_index_in_dim(im_c, i, 0, keepdims=False)
            l = jax.lax.dynamic_index_in_dim(lb_c, i, 0, keepdims=False)
            return acc + a.astype(jnp.int32).sum() + l.astype(jnp.int32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), idx)
        return acc

    @jax.jit
    def floor_pass(im, lb, key):
        s = jax.random.randint(key, (), 0, 7).astype(jnp.uint8)
        return (im + s).astype(jnp.int32).sum() + (lb + s).astype(jnp.int32).sum()

    results = []
    for name, fn, args, traffic in [
        # A reads+writes both arrays; B and C read once
        ("A_full_permute", full_permute, (imgs, lbls), 2 * gb),
        ("B_chunk_scan_reads", chunk_reads, (imgs_c, lbls_c), gb),
        ("C_elementwise_floor", floor_pass, (imgs, lbls), gb),
    ]:
        t0 = time.perf_counter()
        med, best, _ = bench(fn, args, jax.random.PRNGKey(42))
        compile_s = time.perf_counter() - t0
        row = {"probe": name, "n": n, "gb_resident": round(gb, 3),
               "median_ms": round(med * 1e3, 1),
               "best_ms": round(best * 1e3, 1),
               "eff_gbps": round(traffic / med, 1),
               "compile_plus_s": round(compile_s, 1)}
        print(json.dumps(row), flush=True)
        results.append(row)


if __name__ == "__main__":
    main()
