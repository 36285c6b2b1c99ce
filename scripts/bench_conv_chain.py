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


def chain(op, x0, flops_per_op, bytes_per_op, iters=4, label=""):
    @jax.jit
    def fn(x, s):
        def body(_, c):
            c = op(c)
            return (c * s).astype(jnp.bfloat16)
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
    else:
        raise SystemExit(f"unknown variant {variant!r}")
    bytes_per_op = 2 * 2 * x.size  # bf16 read + write of the activation
    return x, op, flops, bytes_per_op


def main():
    variants = sys.argv[1:] or ["pw728", "pw728mm", "dw728", "dw728lax",
                                "e3x3", "entry"]
    for v in variants:
        x, op, flops, nbytes = build(v)
        print(json.dumps(chain(op, x, flops, nbytes, label=v)), flush=True)


if __name__ == "__main__":
    main()
