"""One-shot Mosaic health probe (ROADMAP item: revisit pallas if fixed).

Round 1 measured in-kernel `jnp.dot` 512^3 bf16 at ~16 ms on this tunnel
(~1000x below the MXU roofline; healthy v5e ~0.1 ms), which parked the
pallas warp backends (`ops/pallas_warp.py`) in favor of the XLA einsum
path.  This probe re-times that same kernel plus the XLA equivalent so a
platform fix is noticed in one cheap run — if `pallas_ms` ever lands
within ~3x of `xla_ms`, re-evaluate the pallas backends.

Round-2 lesson: the toy kernel alone gives a FALSE GREEN — it kept
compiling while the production photometric kernel died in the AOT helper
(scoped-vmem OOM after a toolchain update; BENCH_r02 fell back to einsum).
The probe therefore also compiles the three PRODUCTION kernels at small
batch and reports each failure's actual error tail.  For a construct-level
bisect of a new failure, run scripts/bisect_pallas.py.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_pallas.py
"""

import json
import time

import numpy as np
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


def probe_production_kernels(batch=4, size=512):
    """Compile+run the actual bench.py kernels at small batch; returns
    {kernel: "ok" | "FAIL: <error tail>"}."""
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import pallas_warp as PW

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, 3, size, size)),
                       jnp.uint8)
    lbls = jnp.asarray(rng.integers(0, 5, (batch, size, size)), jnp.uint8)
    params = A.sample_augment_params(jax.random.PRNGKey(0), batch,
                                     rotate_prefix=batch // 2,
                                     blur_suffix=batch // 2)
    wp = PW.make_warp_params(params, (size, size), (size, size))

    def attempt(name, fn):
        try:
            out = fn()
            float(jnp.asarray(out).astype(jnp.float32).sum())
            return name, "ok"
        except Exception as e:
            lines = [ln for ln in str(e).splitlines()
                     if "Error" in ln or "error" in ln or "vmem" in ln
                     or "emory" in ln] or str(e).splitlines()[-2:]
            return name, "FAIL: " + " | ".join(lines)[-400:]

    results = dict([
        attempt("warp_labels", lambda: PW.warp_labels(lbls, wp)),
        attempt("warp_images", lambda: PW.warp_images(imgs, wp)),
        attempt("photometric",
                lambda: PW.photometric(
                    jnp.asarray(rng.uniform(0, 255, (batch, 3, size, size)),
                                jnp.bfloat16),
                    params["gains"], params["blur"])),
    ])
    return results


def main():
    p_ms, p_tf, _ = timed(chained(_pallas_dot))
    x_ms, x_tf, _ = timed(chained(_xla_dot))
    prod = probe_production_kernels()
    prod_ok = all(v == "ok" for v in prod.values())
    if p_ms >= 3 * x_ms:
        verdict = "mosaic toy kernel SLOW - keep warp_xla"
    elif not prod_ok:
        verdict = ("mosaic toy OK / production warp kernels FAIL - "
                   "bisect with scripts/bisect_pallas.py")
    else:
        verdict = "mosaic healthy: toy at XLA parity, production kernels compile"
    print(json.dumps({
        "pallas_ms_per_dot": round(p_ms * 1e3, 3),
        "pallas_tflops": round(p_tf, 1),
        "xla_ms_per_dot": round(x_ms * 1e3, 3),
        "xla_tflops": round(x_tf, 1),
        "ratio": round(p_ms / max(x_ms, 1e-9), 1),
        "production": prod,
        "verdict": verdict,
    }))


if __name__ == "__main__":
    main()
