"""One-shot Mosaic health probe (ROADMAP item: revisit pallas if fixed).

Round 1 measured in-kernel `jnp.dot` 512^3 bf16 at ~16 ms on this tunnel
(~1000x below the MXU roofline; healthy v5e ~0.1 ms), which parked the
pallas warp backends (`ops/pallas_warp.py`) in favor of the XLA einsum
path.  This probe re-times that same kernel plus the XLA equivalent so a
platform fix is noticed in one cheap run — if `pallas_ms` ever lands
within ~3x of `xla_ms`, re-evaluate the pallas backends.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_pallas.py
"""

import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _matmul_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                         preferred_element_type=jnp.float32)


def _pallas_dot(a, b):
    return pl.pallas_call(
        _matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]), jnp.float32),
    )(a, b)


def _xla_dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


CHAIN = 64  # dependent matmuls per program — amortizes the ~25-70 ms
# per-dispatch floor (a single 512^3 call is dispatch-bound and tells
# nothing about compute; cf. scripts/bench_matmul_control.py)


def chained(dot):
    @jax.jit
    def fn(a, b):
        def body(_, c):
            # constant rescale (fusable epilogue) keeps E[|c|]~1 for random
            # normal inputs without a serializing reduction; bf16's fp32
            # exponent range absorbs the drift over CHAIN steps
            c = dot(c, b)
            return (c * (1.0 / jnp.sqrt(jnp.float32(c.shape[0])))).astype(
                jnp.bfloat16)
        return jax.lax.fori_loop(0, CHAIN, body, a)
    return fn


def timed(fn, n=512, iters=4):
    key = jax.random.PRNGKey(0)
    # unique inputs per iteration (tunnel result-cache rule, CLAUDE.md)
    mats = []
    for i in range(iters + 1):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        mats.append((jax.random.normal(k1, (n, n), jnp.bfloat16),
                     jax.random.normal(k2, (n, n), jnp.bfloat16)))
    float(fn(*mats[0]).sum())  # compile + warm
    t0 = time.perf_counter()
    outs = [fn(a, b) for a, b in mats[1:]]
    tot = sum(float(o.sum()) for o in outs)  # dependent fetch forces all
    per_dot_s = (time.perf_counter() - t0) / (iters * CHAIN)
    tflops = 2 * n ** 3 / per_dot_s / 1e12
    return per_dot_s, tflops, tot


def main():
    p_ms, p_tf, _ = timed(chained(_pallas_dot))
    x_ms, x_tf, _ = timed(chained(_xla_dot))
    print(json.dumps({
        "pallas_ms_per_dot": round(p_ms * 1e3, 3),
        "pallas_tflops": round(p_tf, 1),
        "xla_ms_per_dot": round(x_ms * 1e3, 3),
        "xla_tflops": round(x_tf, 1),
        "ratio": round(p_ms / max(x_ms, 1e-9), 1),
        "verdict": "REEVALUATE pallas backends" if p_ms < 3 * x_ms
        else "mosaic still slow on this platform - keep warp_xla",
    }))


if __name__ == "__main__":
    main()
