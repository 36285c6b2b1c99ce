"""Probe conv formulations on the real TPU (seg step is conv-bound here).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/bench_conv_variants.py [variant ...]
Variants: pw_conv, pw_einsum, d3_conv, d3_im2col (default: all)

pw_*  — pointwise 1x1 (mobilenet expand/project, xception separable tails):
        lax 1x1 conv vs a direct channel einsum.
d3_*  — dense 3x3 (stems, ASPP 3x3 branches, decoder): lax conv vs
        im2col by 9 static shifted slices + one einsum.

Platform rules (CLAUDE.md): vary an input per timed call, force with a
dependent scalar fetch, report per-call time over pipelined dispatches.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import input_stream, timed as _timed  # noqa: E402


def timed(fn, args_fn, iters=10, warmup=4):
    dt, _ = _timed(fn, args_fn, iters=iters, warmup=warmup)
    return dt


def _inputs(shape, seed=0, n=15):  # 1 compile + 4 warmup + 10 timed
    xs = input_stream(shape, jnp.bfloat16, n, seed)
    return lambda i: (xs(i),)


# pointwise: mobilenet expand at os8 with batch 64
PW_X = (64, 64, 64, 96)
PW_CO = 576
# dense 3x3: stem-like at 256^2
D3_X = (64, 256, 256, 32)
D3_CO = 32


def pw_conv():
    w = jax.random.normal(jax.random.PRNGKey(1), (1, 1, PW_X[-1], PW_CO),
                          jnp.bfloat16)

    @jax.jit
    def f(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = timed(f, _inputs(PW_X))
    flops = 2 * np.prod(PW_X) * PW_CO
    return dt, flops


def pw_einsum():
    w = jax.random.normal(jax.random.PRNGKey(1), (PW_X[-1], PW_CO),
                          jnp.bfloat16)

    @jax.jit
    def f(x):
        return jnp.einsum("bhwc,cd->bhwd", x, w)

    dt = timed(f, _inputs(PW_X))
    flops = 2 * np.prod(PW_X) * PW_CO
    return dt, flops


def d3_conv():
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, D3_X[-1], D3_CO),
                          jnp.bfloat16)

    @jax.jit
    def f(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = timed(f, _inputs(D3_X))
    flops = 2 * np.prod(D3_X) * D3_CO * 9
    return dt, flops


def d3_im2col():
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, D3_X[-1], D3_CO),
                          jnp.bfloat16).reshape(9 * D3_X[-1], D3_CO)

    @jax.jit
    def f(x):
        b, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + h, dx:dx + wd, :]
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, axis=-1)
        return jnp.einsum("bhwk,kd->bhwd", patches, w)

    dt = timed(f, _inputs(D3_X))
    flops = 2 * np.prod(D3_X) * D3_CO * 9
    return dt, flops


def main():
    variants = sys.argv[1:] or ["pw_conv", "pw_einsum", "d3_conv",
                                "d3_im2col"]
    for v in variants:
        t0 = time.perf_counter()
        dt, flops = globals()[v]()
        print(json.dumps({
            "variant": v, "ms": round(dt * 1e3, 2),
            "tflops": round(flops / dt / 1e12, 2),
            "wall_incl_compile_s": round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
