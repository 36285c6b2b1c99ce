"""MXU-fill characterization of the vmapped CV engine vs group width
(round-4 VERDICT task #4): how many (seed, fold) pairs per device program
does it take to fill the chip, and where should ``vmap_group`` default?

For each width w, runs ``_cross_validate_vmapped(group=w)`` on the
reference-scale synthetic cohort (1758 patients, 1024-d, 4-modal, kfold 5)
with ``repeat_num = ceil(w/5)`` seeds so one group is exactly w pairs
wide, and reports:

* wall seconds and pair-epochs/s (pairs x epochs / wall);
* estimated sustained TFLOP/s and MFU: FLOPs from XLA cost analysis of
  the jitted per-batch train step (batch 8) and per-eval-set eval step,
  scaled by the protocol's counts (train: pairs x epochs x batches;
  eval: pairs x epochs x 2 sets with per-epoch val+test).  The estimate
  ignores host work between chunks — it is the MXU-fill figure, not an
  accounting identity.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_fusion_groupwidth.py [--epochs=40] \
        [--patients=1758] [w ...]    (default widths: 1 8 25 50)
"""

import json
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

V5E_PEAK_BF16_TFLOPS = 197.0


def flops_of(jitted, *args):
    try:
        costs = jitted.lower(*args).compile().cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
        return float(costs.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    patients, epochs, chunk = 1758, 40, 20
    widths = []
    for a in sys.argv[1:]:
        if a.startswith("--patients="):
            patients = int(a.split("=", 1)[1])
        elif a.startswith("--epochs="):
            epochs = int(a.split("=", 1)[1])
        elif a.startswith("--chunk="):
            # smaller epoch chunks = smaller scanned programs; today's
            # remote AOT helper can hang on very large program compiles
            # (platform drift) — thin the chunk to stay under its limit
            chunk = int(a.split("=", 1)[1])
        else:
            widths.append(int(a))
    widths = widths or [1, 8, 25, 50]

    from cervical_tpu.config import FusionTrainConfig
    from cervical_tpu.data.fusion_data import make_synthetic_fusion
    from cervical_tpu.data.masks import generate_modal_masks
    from cervical_tpu.train.fusion_trainer import FusionTrainer

    ds = make_synthetic_fusion(num_patients=patients, feature_dim=1024,
                               seed=0)
    labels = np.asarray(ds["labels"])

    # per-batch/per-eval FLOPs from the jitted steps (one-time compiles)
    cfg0 = FusionTrainConfig(in_features=1024, epochs=epochs,
                             repeat_num=1).arity_defaults()
    tr0 = FusionTrainer(cfg0)
    bs = cfg0.batch_size
    feats_b = {m: jnp.asarray(np.asarray(v)[:bs]) for m, v in
               ds["feats"].items()}
    state0 = tr0.init_state(feats_b, jax.random.PRNGKey(0))
    mask_b = generate_modal_masks(jax.random.PRNGKey(1), bs, 4)
    step_flops = flops_of(
        tr0.train_step_fn(), state0, feats_b,
        jnp.asarray(labels[:bs]), mask_b, jnp.float32(1e-4),
        jnp.asarray(True), jax.random.PRNGKey(2),
        jnp.ones((bs,), jnp.float32))
    # eval on the inner-val (~17% of 4/5) and test (1/5) sets; use the val
    # size for both as the order-of-magnitude eval flops
    n_val = int(patients * 0.8 * cfg0.inner_test_size)
    n_test = patients - int(patients * 0.8)
    feats_e = {m: jnp.asarray(np.asarray(v)[:n_val]) for m, v in
               ds["feats"].items()}
    pres_e = jnp.ones((n_val, 4), bool)
    mask_e = jnp.zeros((n_val, 4), bool)
    eval_flops_val = flops_of(tr0.eval_step_fn(), state0["params"],
                              feats_e, pres_e, mask_e)
    eval_flops = eval_flops_val * (1.0 + n_test / max(n_val, 1))
    print(f"# step_flops={step_flops / 1e9:.2f} GF (batch {bs}), "
          f"eval_flops(val+test)={eval_flops / 1e9:.2f} GF", flush=True)

    n_train = int(patients * 0.8 * (1 - cfg0.inner_test_size))
    nb = (n_train + bs - 1) // bs

    for w in widths:
        seeds = max(1, math.ceil(w / 5))
        # two runs per width: run 0 is cold (compile-polluted wall — the
        # remote AOT cost varies 10x between sessions); run 1 reuses every
        # in-process compiled program but trains from a DIFFERENT base rng
        # (start_seed bump) so no (fn, args) pair repeats — the tunnel
        # result-caches identical executions (docs/PLATFORM.md).  The warm
        # run is the MXU-fill figure.
        for run, s0 in ((0, 0), (1, 100)):
            cfg = FusionTrainConfig(in_features=1024, epochs=epochs,
                                    start_seed=s0,
                                    repeat_num=seeds).arity_defaults()
            trainer = FusionTrainer(cfg)
            t0 = time.perf_counter()
            out = trainer._cross_validate_vmapped(
                ds, epochs, labels,
                lambda msg: print(f"# w={w} {msg}", flush=True), None,
                epoch_chunk=chunk, group=w)
            wall = time.perf_counter() - t0
            pairs = len(out["folds"])
            tf = (pairs * epochs * (nb * step_flops + eval_flops)) / wall / 1e12
            print(json.dumps({
                "width": w, "run": "cold" if run == 0 else "warm",
                "pairs": pairs, "epochs": epochs, "chunk": chunk,
                "patients": patients, "wall_s": round(wall, 1),
                "pair_epochs_per_s": round(pairs * epochs / wall, 2),
                "est_tflops_per_sec": round(tf, 1),
                "est_mfu_pct": round(100 * tf / V5E_PEAK_BF16_TFLOPS, 1),
                "mean_test_acc": round(out["mean_test_acc"], 4),
            }), flush=True)


if __name__ == "__main__":
    main()
