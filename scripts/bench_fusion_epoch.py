"""Reference-scale fusion training epoch throughput on the real TPU.

Reproduces the README "0.33 s / 1,792-patient 4-modal epoch" figure:
whole epochs run as one lax.scan dispatch over a device-resident cohort
(train/fusion_trainer.py::epoch_scan_fn; the reference trains per-patient
batch-of-one, my_train(full).py:228).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/bench_fusion_epoch.py [--patients=1792]
"""

import json
import sys
import time

import numpy as np
import jax


def main():
    patients = 1792
    for a in sys.argv[1:]:
        if a.startswith("--patients="):
            patients = int(a.split("=", 1)[1])

    from cervical_tpu.config import FusionTrainConfig
    from cervical_tpu.data.fusion_data import make_synthetic_fusion
    from cervical_tpu.train.fusion_trainer import FusionTrainer

    import jax.numpy as jnp

    cfg = FusionTrainConfig(modalities=("imgN", "imgA", "imgL", "cli"),
                            in_features=1024, epoch0_no_step=False
                            ).arity_defaults()
    trainer = FusionTrainer(cfg)
    ds = make_synthetic_fusion(num_patients=patients, feature_dim=1024,
                               seed=0)
    # device-resident cohort, as run_cv does: per-epoch batching becomes
    # on-device gathers instead of a ~470 MB host slice + re-upload per
    # epoch (measured 26x on the target chip)
    ds = dict(ds)
    ds["feats"] = {m: jnp.asarray(v) for m, v in ds["feats"].items()}
    state = trainer.init_state(
        {m: v[:1] for m, v in ds["feats"].items()}, jax.random.PRNGKey(1))

    # epoch 0 compiles the scan; epochs then vary by shuffled order, fresh
    # PRNG keys and updated params, so no (fn, args) repeats (CLAUDE.md
    # rule 2)
    t0 = time.perf_counter()
    state = trainer.train_epoch(state, ds, epoch=0, lr=cfg.lr)[0]
    compile_s = time.perf_counter() - t0

    times = []
    for ep in range(1, 6):
        t0 = time.perf_counter()
        out = trainer.train_epoch(state, ds, epoch=ep, lr=cfg.lr)
        state = out[0]
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "patients": patients,
        "epoch_seconds_best": round(best, 3),
        "epoch_seconds_all": [round(t, 3) for t in times],
        "patients_per_sec": round(patients / best, 1),
        "compile_plus_first_epoch_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
