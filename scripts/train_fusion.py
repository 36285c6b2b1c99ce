#!/usr/bin/env python
"""Train the multimodal fusion classifier with stratified-K-fold CV.

Replaces the 11 reference drivers (Four_Modal/my_train(full).py,
Three_Modal/train(NAL|NAC|NLC|ALC).py, Two_Modal/train(..).py): the modality
subset is a flag.

Usage:
    python scripts/train_fusion.py --cohort cohort.npz \
        --modalities '["imgN","imgA","imgL","cli"]' [--epochs 180] \
        [--vmap_folds true] [--vmap_group 25] ...

``--vmap_folds``: train (seed, fold) pairs simultaneously (fold-stacked
params under jax.vmap, pairs packed cross-seed into chunked scan
programs) — same per-fold results, several times faster on chip;
fold-level resume still applies.  ``--vmap_group`` bounds pairs per
device program (~4 param-sized f32 copies each).
"""

import sys

sys.path.insert(0, ".")


def build_config(argv):
    """Parse CLI args into (cfg, cohort_path, log_dir).

    Per-arity hyperparameter deltas (FusionTrainConfig.arity_defaults)
    apply AFTER file/CLI values are merged but never override a key the
    user set explicitly.
    """
    from cervical_tpu.config import (FusionTrainConfig, load_config,
                                     parse_cli_overrides)
    overrides = parse_cli_overrides(argv)
    cohort_path = overrides.pop("cohort", None)
    cfg_path = overrides.pop("config", None)
    log_dir = overrides.pop("log_dir", None)
    vmap_folds = bool(overrides.pop("vmap_folds", False))
    vmap_group = int(overrides.pop("vmap_group", 25))
    explicit = set()
    cfg = load_config(FusionTrainConfig, cfg_path, overrides,
                      explicit_out=explicit)
    cfg.arity_defaults(explicit=explicit)
    return cfg, cohort_path, log_dir, vmap_folds, vmap_group


def main(argv):
    from cervical_tpu.parallel import initialize_from_cli
    argv = initialize_from_cli(argv)  # multihost flags, before backend use
    from cervical_tpu.data.fusion_data import align_to_modalities, load_npz
    from cervical_tpu.train.fusion_trainer import FusionTrainer
    from cervical_tpu.utils import show_config

    cfg, cohort_path, log_dir, vmap_folds, vmap_group = build_config(argv)
    if log_dir:  # tee stdout to log/<timestamp>.log (util.py:50-67)
        import sys as _sys
        from cervical_tpu.utils import Logger
        _sys.stdout = Logger(log_dir, stream=_sys.stdout)
    show_config(**{k: getattr(cfg, k) for k in
                   ("modalities", "epochs", "lr", "batch_size", "kfold",
                    "inner_test_size", "weight_decay", "lr_step", "mix",
                    "add_mse_loss_of_mae")})
    if cohort_path is None:
        raise SystemExit("--cohort path/to/cohort.npz is required "
                         "(build one with scripts/build_graphs.py)")
    ds = load_npz(cohort_path)
    if ds["labels"] is None:
        raise SystemExit(f"{cohort_path} carries no 'labels' array — "
                         "training needs diagnosis labels")
    ds = align_to_modalities(ds, cfg.modalities)

    trainer = FusionTrainer(cfg)
    result = trainer.cross_validate(ds, save_dir=cfg.save_dir,
                                    vmap_folds=vmap_folds,
                                    vmap_group=vmap_group)
    print(f"mean test accuracy over folds: {result['mean_test_acc']:.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
