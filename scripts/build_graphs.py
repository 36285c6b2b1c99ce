#!/usr/bin/env python
"""Offline multimodal feature extraction: images + ages -> cohort.npz
(replaces MultiModal Prediction/Graph_Structure(data_augmentation).py).

Expects per-modality image folders with files named ``<patient_id>*.{png,jpg,
tif}`` and a CSV/XLSX table with columns (id, age, diagnosis).

Usage:
    python scripts/build_graphs.py --table patients.xlsx \
        --imgN path/N --imgA path/A --imgL path/L \
        --out cohort.npz [--resnet_ckpt resnet101.pth]
"""

import os
import sys

sys.path.insert(0, ".")


def read_table(path):
    import pandas as pd
    df = pd.read_excel(path) if path.endswith((".xlsx", ".xls")) else __import__("pandas").read_csv(path)
    cols = list(df.columns)
    id_col, age_col, diag_col = cols[0], cols[1], cols[2]
    from cervical_tpu.data.graphs import DIAGNOSIS_MAPPING
    ids = df[id_col].tolist()
    ages = dict(zip(ids, df[age_col].tolist()))
    import math
    diagnosis = {}
    for i, d in zip(ids, df[diag_col].tolist()):
        if d in DIAGNOSIS_MAPPING:
            d = DIAGNOSIS_MAPPING[d]
        elif (not isinstance(d, (int, float)) or isinstance(d, bool)
              or not math.isfinite(d) or int(d) != d):
            raise SystemExit(
                f"patient {i!r}: diagnosis {d!r} is neither a class index "
                f"nor one of {sorted(DIAGNOSIS_MAPPING)} "
                "(Graph_Structure:42-47)")
        diagnosis[i] = int(d)
    return ids, ages, diagnosis


def main(argv):
    import numpy as np
    from PIL import Image
    from cervical_tpu.config import parse_cli_overrides
    from cervical_tpu.data.graphs import (PatchFeaturizer, build_cli_features,
                                          assemble_cohort)
    from cervical_tpu.data.fusion_data import save_npz

    args = parse_cli_overrides(argv)
    ids, ages, diagnosis = read_table(args["table"])

    feat = PatchFeaturizer(depth=int(args.get("resnet_depth", 101)))
    if "resnet_ckpt" in args:
        from cervical_tpu.train.torch_import import (load_state_dict,
                                                     convert_resnet, merge_into)
        sd = load_state_dict(args["resnet_ckpt"])
        p, s, _ = convert_resnet(sd, depth=int(args.get("resnet_depth", 101)),
                                 strict=False, with_fc=False)
        variables = {"params": feat.params, "batch_stats": feat.batch_stats}
        variables, loaded, _ = merge_into(variables, p, s)
        feat.params = variables["params"]
        feat.batch_stats = variables["batch_stats"]
        print(f"loaded {len(loaded)} tensors from {args['resnet_ckpt']}")

    image_feats = {}
    for mod in ("imgN", "imgA", "imgL"):
        if mod not in args:
            continue
        folder = args[mod]
        per_patient = {}
        for pid in ids:
            matches = [f for f in os.listdir(folder)
                       if f.startswith(str(pid)) and
                       f.lower().endswith((".png", ".jpg", ".tif", ".tiff"))]
            if not matches:
                continue
            img = np.asarray(Image.open(
                os.path.join(folder, matches[0])).convert("RGB"))
            per_patient[pid] = feat.featurize_image(img)
            print(f"{mod} {pid}: {per_patient[pid].shape}")
        image_feats[mod] = per_patient

    cli = build_cli_features(ages)
    ds = assemble_cohort(image_feats, cli, diagnosis)
    save_npz(args.get("out", "cohort.npz"), ds)
    print(f"wrote {args.get('out', 'cohort.npz')}: "
          f"{len(ds['ids'])} patients, modalities {list(ds['feats'])}")


if __name__ == "__main__":
    main(sys.argv[1:])
