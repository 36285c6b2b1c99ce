"""Same-FLOPs pure-matmul control for the seg train step (ROADMAP item 2).

The fused 512x512 DeepLab train step reaches ~6 TFLOP/s on this platform
while isolated big square matmuls reach ~35 TFLOP/s (docs/PLATFORM.md).  Is
the gap conv lowering or platform ceiling?  This control runs a DEPENDENT
CHAIN of bf16 matmuls shaped like the model's convs (im2col geometry:
M = batch*spatial, K = kh*kw*cin, N = cout) with the same total FLOP count
as the measured step, with zero convs.  If the chain also lands well below
roofline at these shapes, the step is at the platform ceiling for its
geometry and further conv-lowering work is pointless; if the chain is much
faster, lowering is on the hook.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_matmul_control.py [tflops_per_step] [preset ...]
presets: decoder (8192x2304x256), backbone (2048x6552x728),
         square (4096x4096x4096)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

PRESETS = {
    # im2col geometry of the decoder's dense 3x3 convs at 512^2/os16:
    # M = 8*32*32, K = 3*3*256, N = 256
    "decoder": (8192, 2304, 256),
    # xception middle-flow sepconv pointwise-ish geometry: M = 8*16*16,
    # K = 3*3*728, N = 728
    "backbone": (2048, 6552, 728),
    # the shape class the platform is known to run fast
    "square": (4096, 4096, 4096),
}


def bench_chain(m, k, n, total_flops, iters=6, warmup=3, seed=0):
    """Dependent chain of (m,k)@(k,n) matmuls totalling ~total_flops.

    The chain is a ``lax.scan`` over (w1, w2) pairs so the remote AOT
    helper compiles ONE body regardless of depth (an unrolled 400-matmul
    chain never finishes compiling on this tunnel)."""
    per = 2.0 * m * k * n
    pairs = max(1, int(round(total_flops / (2 * per))))
    key = jax.random.PRNGKey(seed)
    kx, kw1, kw2 = jax.random.split(key, 3)
    # alternating weights: (k,n) then (n,k) so the carry keeps shape (m,k)
    w1 = jax.random.normal(kw1, (k, n), jnp.bfloat16)
    w2 = jax.random.normal(kw2, (n, k), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(c, _):
            return (c @ w1) @ w2, ()
        out, _ = jax.lax.scan(body, x, None, length=pairs)
        return out

    depth = 2 * pairs
    flops = per * depth

    def inputs(i):
        return jax.random.normal(jax.random.fold_in(kx, i), (m, k),
                                 jnp.bfloat16)

    out = chain(inputs(0))
    _ = float(out.sum())  # force compile+run (dependent fetch)
    for i in range(warmup):
        out = chain(inputs(1 + i))
    _ = float(out.sum())
    t0 = time.perf_counter()
    for i in range(iters):
        out = chain(inputs(100 + i))
    _ = float(out.sum())
    dt = (time.perf_counter() - t0) / iters
    return flops / dt / 1e12, depth, dt


def main():
    args = sys.argv[1:]
    tflops = float(args[0]) if args and args[0][0].isdigit() else 2.6
    presets = [a for a in args if not a[0].isdigit()] or ["decoder",
                                                          "backbone",
                                                          "square"]
    total = tflops * 1e12
    for name in presets:
        m, k, n = PRESETS[name]
        tf, depth, dt = bench_chain(m, k, n, total, seed=hash(name) % 997)
        print(json.dumps({"preset": name, "mkn": [m, k, n], "depth": depth,
                          "sec_per_chain": round(dt, 4),
                          "tflops_per_sec": round(tf, 2)}), flush=True)


if __name__ == "__main__":
    main()
