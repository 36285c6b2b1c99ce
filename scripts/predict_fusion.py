#!/usr/bin/env python
"""Batched inference with a trained fusion classifier.

The reference has no standalone inference script for
``fusion_model_mae_2`` — prediction only happens inside the training
drivers (``Four_Modal/my_train(full).py:47-171``).  This CLI serves a
trained fold's ``best_seed{S}_fold{F}.npz`` artifact over a cohort npz:

    python scripts/predict_fusion.py --cohort cohort.npz \
        --params logs_fusion/best_seed0_fold0.npz \
        [--modalities '["imgN","imgA","imgL","cli"]'] [--in_features 1024] \
        [--out preds.json] [--export fusion.stablehlo] [--throughput 512]

Writes per-patient fused + per-modality classes and probabilities (and
accuracy when the cohort carries labels).  ``--export`` serializes the
forward as a portable StableHLO blob; ``--throughput N`` measures
steady-state patients/sec at batch N on the attached device.
"""

import json
import sys

sys.path.insert(0, ".")


def main(argv):
    from cervical_tpu.config import (FusionTrainConfig, load_config,
                                     parse_cli_overrides)
    from cervical_tpu.data.fusion_data import align_to_modalities, load_npz
    from cervical_tpu.inference.fusion_predictor import FusionPredictor

    args = parse_cli_overrides(argv)
    params_path = args.pop("params", None)
    cohort_path = args.pop("cohort", None)
    out_path = args.pop("out", None)
    export_path = args.pop("export", None)
    throughput_bs = args.pop("throughput", None)
    cfg = load_config(FusionTrainConfig, args.pop("config", None), args)
    if params_path is None:
        raise SystemExit("--params path/to/best_seed0_fold0.npz is required")
    predictor = FusionPredictor.from_npz(cfg, params_path)

    if export_path:
        print(f"exported {predictor.export_stablehlo(export_path)}")
    if throughput_bs is not None:
        tput = predictor.get_throughput(batch_size=int(throughput_bs))
        print(f"throughput: {tput:.1f} patients/sec at batch "
              f"{int(throughput_bs)}")
    if cohort_path is None:
        if not (export_path or throughput_bs):
            raise SystemExit("--cohort path/to/cohort.npz is required "
                             "(or use --export / --throughput)")
        return

    # align feats AND the present columns to the model's modality subset
    # (a 2-modal model can serve a 4-modal cohort npz)
    ds = align_to_modalities(load_npz(cohort_path), cfg.modalities)
    probs = predictor.predict_proba(ds["feats"], ds["present"])
    classes = probs["all"].argmax(-1)
    report = {
        "ids": [str(i) for i in ds.get("ids", range(len(classes)))],
        "classes": classes.tolist(),
        "confidence": probs["all"].max(-1).round(4).tolist(),
        "probs": probs["all"].round(4).tolist(),
    }
    for m in cfg.modalities:
        report[f"classes_{m}"] = probs[m].argmax(-1).tolist()
    if "labels" in ds and ds["labels"] is not None:
        import numpy as np
        labels = np.asarray(ds["labels"])
        report["accuracy"] = float((classes == labels).mean())
        print(f"fused-head accuracy: {report['accuracy']:.4f} "
              f"({len(labels)} patients)")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    else:
        for i in range(min(10, len(classes))):
            print(f"{report['ids'][i]}: class {report['classes'][i]} "
                  f"(p={report['confidence'][i]:.3f})")


if __name__ == "__main__":
    main(sys.argv[1:])
