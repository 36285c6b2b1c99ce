#!/usr/bin/env python
"""Single-image prediction / FPS benchmark / export (replaces predict.py +
the DeeplabV3 predictor modes of deeplab.py).

Usage:
    python scripts/predict.py --ckpt logs/best_epoch_weights --image x.jpg \
        [--mix_type 0] [--out out.png] [--fps 100] [--export model.stablehlo] \
        [--fused_middle true] [--tiled true]

``--fused_middle``: xception-only eval fast path — run backbone blocks 4-19
as one fused pallas kernel (ops/pallas_xception.py).  Exports always use
the portable pure-XLA model regardless.
``--tiled``: native-resolution sliding-window inference (Hann-blended
overlapping input_shape tiles) instead of the reference's letterbox-downscale.
"""

import sys

sys.path.insert(0, ".")


def main(argv):
    import numpy as np
    from PIL import Image
    from cervical_tpu.config import SegTrainConfig, load_config, parse_cli_overrides
    from cervical_tpu.inference.predictor import SegPredictor
    from cervical_tpu.train.seg_trainer import SegTrainer
    from cervical_tpu.train.checkpoints import CheckpointManager
    import os

    args = parse_cli_overrides(argv)
    cfg = load_config(SegTrainConfig, args.pop("config", None),
                      {k: v for k, v in args.items()
                       if k not in ("ckpt", "image", "mix_type", "out",
                                    "fps", "export", "count",
                                    "fused_middle", "tiled")})
    trainer = SegTrainer(cfg)
    ckpt = args.get("ckpt")
    if ckpt:
        mgr = CheckpointManager(os.path.dirname(ckpt) or ".", 10)
        trainer.state, _ = mgr.restore(os.path.basename(ckpt), trainer.state)
    predictor = SegPredictor(cfg, trainer.state,
                             fused_middle=bool(args.get("fused_middle",
                                                        False)))

    if "export" in args:
        path = predictor.export_stablehlo(args["export"])
        print(f"exported StableHLO to {path}")
        return

    image = np.asarray(Image.open(args["image"]).convert("RGB"))
    if "fps" in args:
        sec = predictor.get_fps(image, int(args["fps"]))
        print(f"{sec:.4f} seconds/image, {1 / sec:.2f} FPS (batch-1)")
        print(f"batched throughput: {predictor.get_throughput():.1f} images/s")
        return

    rendered = predictor.detect_image(image, mix_type=int(args.get("mix_type", 0)),
                                      count=bool(args.get("count", False)),
                                      tiled=bool(args.get("tiled", False)))
    out = args.get("out", "prediction.png")
    Image.fromarray(rendered).save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
