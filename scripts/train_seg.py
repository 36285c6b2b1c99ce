#!/usr/bin/env python
"""Train DeepLabV3+ segmentation (replaces Segmentation/deeplabv3+/train.py).

Usage:
    python scripts/train_seg.py [--config cfg.yaml] [--key value ...]
e.g.
    python scripts/train_seg.py --backbone mobilenet --unfreeze_epoch 50 \
        --data.dataset_path VOCdevkit --save_dir logs
"""

import sys

sys.path.insert(0, ".")


def main(argv):
    from cervical_tpu.parallel import initialize_from_cli
    # multihost launch flags (--multihost true | --coordinator host:port
    # --num_processes N --process_id I) must initialize jax.distributed
    # BEFORE any backend use (train.py:288-294)
    argv = initialize_from_cli(argv)
    from cervical_tpu.config import (SegTrainConfig, load_config,
                                     parse_cli_overrides)
    from cervical_tpu.data.voc import VOCSegDataset, read_split
    from cervical_tpu.train.seg_trainer import SegTrainer
    from cervical_tpu.utils import seed_everything, show_config

    cfg_path = None
    if "--config" in argv:
        i = argv.index("--config")
        cfg_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    cfg = load_config(SegTrainConfig, cfg_path, parse_cli_overrides(argv))
    show_config(**{k: getattr(cfg, k) for k in
                   ("backbone", "pretrained", "downsample_factor", "init_lr",
                    "lr_decay_type", "freeze_train", "unfreeze_epoch",
                    "cls_weights", "dtype", "save_dir")})
    seed_everything(cfg.seed)

    train_ids = read_split(cfg.data.dataset_path, "train")
    val_ids = read_split(cfg.data.dataset_path, "val")
    train_ds = VOCSegDataset(cfg.data.dataset_path, train_ids,
                             stage_hw=tuple(cfg.data.input_shape))
    val_ds = VOCSegDataset(cfg.data.dataset_path, val_ids,
                           stage_hw=tuple(cfg.data.input_shape))
    print(f"num_train {len(train_ds)} / num_val {len(val_ds)}")

    trainer = SegTrainer(cfg)
    trainer.fit(train_ds, val_ds)


if __name__ == "__main__":
    main(sys.argv[1:])
