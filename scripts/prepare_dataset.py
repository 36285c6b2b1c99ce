#!/usr/bin/env python
"""Dataset preparation driver: labelbox masks -> gray ids, splits, offline 8x
augmentation (replaces the labelbox(aug).py / voc_annotation.py notebooks).

Stages (pick any subset):
  --ndjson export.ndjson --masks_dir masks/          parse + report
  --colors_dir masks/ --gray_dir SegmentationClass/  color -> class ids
  --split_root VOCdevkit [--ratios 8,1,1]            write split txts
  --augment_root VOCdevkit --augment_out VOCdevkit_aug   8x offline aug
  --audit VOCdevkit                                  label format audit
"""

import os
import sys

sys.path.insert(0, ".")


def main(argv):
    from cervical_tpu.config import parse_cli_overrides
    from cervical_tpu.tools import labelbox as LB
    from cervical_tpu.tools import voc_annotation as VA
    from cervical_tpu.tools import offline_aug as OA
    from cervical_tpu.data import splits as S
    from cervical_tpu.data.voc import read_split

    args = parse_cli_overrides(argv)

    if "ndjson" in args:
        class_urls, comp_urls, ids, counts = LB.parse_ndjson(args["ndjson"])
        print(f"{len(ids)} images, {len(class_urls)} annotation masks")
        if "api_key" in args and "masks_dir" in args:
            LB.build_color_masks(class_urls,
                                 LB.default_fetch_fn(args["api_key"]),
                                 args["masks_dir"])
            print(f"wrote color masks to {args['masks_dir']}")

    if "colors_dir" in args:
        out = LB.colors_to_gray(args["colors_dir"], args["gray_dir"])
        print(f"converted {len(out)} masks to class ids")

    if "split_root" in args:
        ratios = [float(x) for x in str(args.get("ratios", "8,1,1")).split(",")]
        total = sum(ratios)
        seg = os.path.join(args["split_root"], "VOC2007", "SegmentationClass")
        ids = [f[:-4] for f in sorted(os.listdir(seg)) if f.endswith(".png")]
        train, val, test = S.ratio_split(
            ids, tuple(r / total for r in ratios), seed=int(args.get("seed", 0)))
        sets = os.path.join(args["split_root"], "VOC2007", "ImageSets",
                            "Segmentation")
        for name, id_list in (("train", train), ("val", val), ("test", test)):
            OA.write_split_ids(sorted(id_list), os.path.join(sets, name + ".txt"))
        print(f"splits: train {len(train)} / val {len(val)} / test {len(test)}")

    if "augment_root" in args:
        root, out = args["augment_root"], args["augment_out"]
        ids = (read_split(root, "train") + read_split(root, "val"))
        new_ids = OA.write_seg_augmented(root, out, ids,
                                         seed=int(args.get("seed", 0)))
        # 8x-expanded train/val splits in the new layout
        n_train = len(read_split(root, "train")) * 8
        sets = os.path.join(out, "VOC2007", "ImageSets", "Segmentation")
        OA.write_split_ids(new_ids[:n_train], os.path.join(sets, "train.txt"))
        OA.write_split_ids(new_ids[n_train:], os.path.join(sets, "val.txt"))
        print(f"augmented {len(ids)} -> {len(new_ids)} images in {out}")

    if "audit" in args:
        counts, warnings = VA.audit_labels(args["audit"])
        occupied = {int(i): int(c) for i, c in enumerate(counts) if c}
        print(f"label histogram: {occupied}")
        for w in warnings:
            print("WARNING:", w)


if __name__ == "__main__":
    main(sys.argv[1:])
