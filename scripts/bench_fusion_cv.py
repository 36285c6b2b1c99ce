"""Reference-scale fusion CV protocol wall time: sequential vs vmap_folds.

The recorded sequential figure (docs/ROADMAP.md round-2): the COMPLETE
4-modal protocol — 1,758 patients, 1024-d features, kfold x 180 epochs
with per-epoch val+test evals — in 20m45s wall on one chip.  vmap_folds
trains all folds of a seed simultaneously (fold-stacked params under
jax.vmap, the whole seed one scan program), reproducing the sequential
fold trajectories exactly (tests/test_fusion_training.py).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_fusion_cv.py [seq|vmap ...] [--patients=1758] \
        [--epochs=180] [--seeds=1]

Prints one JSON line per mode.
"""

import json
import sys
import time


def main():
    patients, epochs, seeds = 1758, 180, 1
    modes = []
    for a in sys.argv[1:]:
        if a.startswith("--patients="):
            patients = int(a.split("=", 1)[1])
        elif a.startswith("--epochs="):
            epochs = int(a.split("=", 1)[1])
        elif a.startswith("--seeds="):
            seeds = int(a.split("=", 1)[1])
        else:
            modes.append(a)
    modes = modes or ["vmap"]

    from cervical_tpu.config import FusionTrainConfig
    from cervical_tpu.data.fusion_data import make_synthetic_fusion
    from cervical_tpu.train.fusion_trainer import FusionTrainer

    ds = make_synthetic_fusion(num_patients=patients, feature_dim=1024,
                               seed=0)
    for mode in modes:
        cfg = FusionTrainConfig(modalities=("imgN", "imgA", "imgL", "cli"),
                                in_features=1024, epochs=epochs,
                                repeat_num=seeds).arity_defaults()
        trainer = FusionTrainer(cfg)
        t0 = time.perf_counter()
        out = trainer.cross_validate(ds, log=lambda *a: None,
                                     vmap_folds=(mode == "vmap"))
        wall = time.perf_counter() - t0
        print(json.dumps({
            "mode": mode, "patients": patients, "epochs": epochs,
            "kfold": cfg.kfold, "seeds": seeds,
            "folds": len(out["folds"]),
            "mean_test_acc": round(out["mean_test_acc"], 4),
            "wall_s": round(wall, 1),
            "s_per_fold": round(wall / max(len(out["folds"]), 1), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
