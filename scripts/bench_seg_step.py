"""Time the full DeepLab train step on the real TPU: einsum vs lax convs.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/bench_seg_step.py [einsum|lax ...]
Default: einsum lax (back-to-back in one session for a fair comparison).

Reference shape: 512x512, batch 8, mobilenet backbone, unfrozen
(train.py:94,133,107).  One JSON line per backend.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(backend: str, backbone="mobilenet", batch=8, size=512, iters=8, warmup=4,
          frozen=False, seed=0, scan_k=0):
    from cervical_tpu.ops import conv as C
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train import seg_trainer as T

    from cervical_tpu.ops import depthwise as DW

    # "mixed" = lax backbone + im2col ASPP/decoder head (ROADMAP item 2:
    # the decoder's dense 3x3 convs are the candidates for the einsum
    # lowering; the backbone stays on the measured-good lax path).
    # "dwlax"/"dwshift" = force the depthwise backend (XLA grouped conv,
    # now the default, vs the 9-tap shift ladder — ops/depthwise.py; the
    # round-2 full-step ABAB made lax the default at 112 vs 181 ms).
    head = ""
    aug_backend = "einsum"
    DW.set_default_backend("shift" if backend == "dwshift" else "lax")
    if backend == "mixed":
        C.set_default_backend("lax")
        head = "einsum"
    elif backend in ("dwlax", "dwshift"):
        C.set_default_backend("lax")
    elif backend == "augpallas":
        # lax convs + the flagship pallas aug kernels on the train path
        # (SegDataConfig.aug_backend; ABAB against "lax" = einsum aug)
        C.set_default_backend("lax")
        aug_backend = "pallas"
    elif backend == "rbgdrop":
        # lax convs + rbg dropout-mask PRNG (SegTrainConfig.
        # dropout_rng_impl; ABAB against "lax" = threefry dropout)
        C.set_default_backend("lax")
    elif backend == "rematentry":
        # production defaults + rematerialized entry flow
        # (SegTrainConfig.remat_entry): trades entry:bwd's activation
        # traffic — the one memory-bound segment of the round-4
        # decomposition — for ~4% recompute FLOPs.  ABAB against
        # "rbgdrop" (identical otherwise); VERDICT r4 task #6.
        C.set_default_backend("lax")
    elif backend in ("augpallasr", "prebatch"):
        # production-default rbg dropout + pallas aug; "prebatch"
        # additionally augments all K sub-batches as one (K*B) batch
        # before the scan (SegDataConfig.aug_pre_batch — bit-identical
        # per-image results, amortized kernel launches)
        C.set_default_backend("lax")
        aug_backend = "pallas"
    else:
        C.set_default_backend(backend)
    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=5,
                                            aug_backend=aug_backend,
                                            aug_pre_batch=(backend ==
                                                           "prebatch")),
                         backbone=backbone, unfreeze_batch_size=batch,
                         head_conv_backend=head,
                         remat_entry=(backend == "rematentry"),
                         dropout_rng_impl=(
                             "rbg" if backend in ("rbgdrop", "augpallasr",
                                                  "prebatch", "rematentry")
                             else "threefry"))
    state = T.create_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    if scan_k:
        # the production epoch path (SegTrainConfig.steps_per_call): K
        # optimizer steps scanned into ONE program, amortizing the fixed
        # ~28 ms dispatch cost (docs/PLATFORM.md) to ~28/K ms per step
        step = T.make_train_step_scan(cfg, T.build_model(cfg),
                                      T.make_optimizer(cfg), frozen=frozen,
                                      k=scan_k)
        images = jnp.asarray(
            rng.integers(0, 256, (scan_k, batch, size, size, 3)), jnp.uint8)
        labels = jnp.asarray(
            rng.integers(0, 5, (scan_k, batch, size, size)), jnp.uint8)

        def run(i):
            key = jax.random.PRNGKey(seed * 1000 + i)
            return step(state, images, labels, jnp.float32(1e-4), key)

        def flops_of():
            return step_flops(step, state, images, labels, scan=True)
    else:
        step = T.make_train_step(cfg, T.build_model(cfg),
                                 T.make_optimizer(cfg), frozen=frozen)
        images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)),
                             jnp.uint8)
        labels = jnp.asarray(rng.integers(0, 5, (batch, size, size)),
                             jnp.uint8)

        def run(i):
            # aug_params=None: the production path (sampling inside the jit)
            key = jax.random.PRNGKey(seed * 1000 + i)
            return step(state, images, labels, None, jnp.float32(1e-4), key)

        def flops_of():
            return step_flops(step, state, images, labels)

    t0 = time.perf_counter()
    out_state, metrics = run(0)
    _ = float(metrics["loss"].sum())
    compile_s = time.perf_counter() - t0
    flops = flops_of()
    for i in range(warmup):
        _, metrics = run(i + 1)
    _ = float(metrics["loss"].sum())
    t0 = time.perf_counter()
    for i in range(iters):
        _, metrics = run(100 + i)
    _ = float(metrics["loss"].sum())
    dt = (time.perf_counter() - t0) / iters
    if scan_k:
        # report per-optimizer-step figures.  dt divides by K; flops does
        # NOT — XLA cost analysis counts the scan body ONCE (verified on
        # chip: scan-4 program reports 3.783 TFLOP == the single-step
        # program), so the reported flops already are per-step.
        dt /= scan_k
    return dt, compile_s, flops


# v5e peak: 197 TFLOP/s bf16 (394 int8) — the MXU-bound ceiling the MFU
# figure is normalized against.
V5E_PEAK_BF16_TFLOPS = 197.0


def step_flops(step, state, images, labels, scan=False):
    """XLA cost-analysis FLOPs for one compiled train step (or None if the
    platform's compiled-executable analysis is unavailable)."""
    try:
        args = ((state, images, labels) if scan
                else (state, images, labels, None))
        compiled = step.lower(*args, jnp.float32(1e-4),
                              jax.random.PRNGKey(0)).compile()
        costs = compiled.cost_analysis()
        if isinstance(costs, (list, tuple)):  # older jax: one dict/device
            costs = costs[0]
        return float(costs["flops"])
    except Exception:
        return None


def main():
    # args: backend[:backbone[:frozen[:batch]]], e.g. "lax:xception::32"
    for run_i, arg in enumerate(sys.argv[1:] or ["einsum", "lax"]):
        parts = arg.split(":")
        backend = parts[0]
        backbone = (parts[1] if len(parts) > 1 else "") or "mobilenet"
        variant = parts[2] if len(parts) > 2 else ""
        frozen = variant == "frozen"
        scan_k = int(variant[4:]) if variant.startswith("scan") else 0
        if variant and not (frozen or scan_k):
            sys.exit(f"unknown step variant {variant!r} "
                     "(use 'frozen' or 'scanK', e.g. scan4)")
        if len(parts) > 4:
            sys.exit(f"too many ':' segments in {arg!r}")
        batch = int(parts[3]) if len(parts) > 3 and parts[3] else 8
        # distinct seed per run so repeated variants never replay inputs
        # (tunnel result-cache rule, scripts/_bench_util.py)
        dt, compile_s, flops = bench(backend, backbone, batch=batch,
                                     frozen=frozen, seed=run_i + 1,
                                     scan_k=scan_k)
        rec = {"backend": backend, "backbone": backbone,
               "frozen": frozen, "scan_k": scan_k, "batch": batch,
               "step_ms": round(dt * 1e3, 1),
               "images_per_sec": round(batch / dt, 1),
               "compile_s": round(compile_s, 1)}
        if flops:
            tflops = flops / dt / 1e12
            rec["step_tflop"] = round(flops / 1e12, 3)
            rec["tflops_per_sec"] = round(tflops, 1)
            # MFU vs the v5e bf16 peak; the fixed ~28 ms per-program
            # dispatch cost (docs/PLATFORM.md) is included — this is
            # delivered utilization, not in-program utilization
            rec["mfu_pct"] = round(100 * tflops / V5E_PEAK_BF16_TFLOPS, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
