#!/usr/bin/env python
"""Standalone mIoU/Recall/Precision evaluation (replaces get_miou.py).

Modes:
  1. end-to-end: load a checkpoint, predict the test split, accumulate the
     confusion matrix on device, report per-class IoU/Recall/Precision.
  2. dirs: compare two folders of predicted/GT class-index PNGs
     (compute_mIoU semantics, utils_metrics.py:120-193).

Usage:
    python scripts/eval_miou.py --dataset VOCdevkit --ckpt logs/best_epoch_weights
    python scripts/eval_miou.py --gt_dir gt/ --pred_dir pred/ --ids test.txt
"""

import sys

sys.path.insert(0, ".")


def main(argv):
    from cervical_tpu.config import (SegTrainConfig, load_config,
                                     parse_cli_overrides)
    args = parse_cli_overrides(argv)

    if "gt_dir" in args:
        from cervical_tpu.inference.predictor import evaluate_miou_dir
        with open(args["ids"]) as f:
            ids = [line.strip() for line in f if line.strip()]
        s = evaluate_miou_dir(args["gt_dir"], args["pred_dir"], ids,
                              int(args.get("num_classes", 5)),
                              miou_out_path=args.get("miou_out", "miou_out"))
    else:
        from cervical_tpu.data.voc import VOCSegDataset, BatchLoader, read_split
        from cervical_tpu.train.seg_trainer import SegTrainer
        from cervical_tpu.train.checkpoints import CheckpointManager
        import os

        if "dataset" in args:  # docstring alias for --data.dataset_path
            # an explicit --data.dataset_path wins over the alias
            args.setdefault("data", {}).setdefault("dataset_path",
                                                   args.pop("dataset"))
        cfg = load_config(SegTrainConfig, args.pop("config", None),
                          {k: v for k, v in args.items()
                           if k not in ("ckpt", "split")})
        trainer = SegTrainer(cfg)
        ckpt_path = args.get("ckpt", os.path.join(cfg.save_dir,
                                                  "best_epoch_weights"))
        mgr = CheckpointManager(os.path.dirname(ckpt_path) or ".", 10)
        trainer.state, _ = mgr.restore(os.path.basename(ckpt_path),
                                       trainer.state)
        ids = read_split(cfg.data.dataset_path, args.get("split", "test"))
        ds = VOCSegDataset(cfg.data.dataset_path, ids,
                           stage_hw=tuple(cfg.data.input_shape))
        loader = BatchLoader(ds, cfg.eval_batch_size, shuffle=False,
                             drop_last=False)
        s = trainer.evaluate_miou(loader)

    names = s["names"]
    for i in range(len(names)):
        print(f"===> {names[i]}:\tIou-{s['iou'][i] * 100:.2f}; "
              f"Recall (equal to the PA)-{s['recall'][i] * 100:.2f}; "
              f"Precision-{s['precision'][i] * 100:.2f}")
    print(f"===> mIoU: {s['miou'] * 100:.2f}; mPA: {s['mpa'] * 100:.2f}; "
          f"Accuracy: {s['accuracy'] * 100:.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
