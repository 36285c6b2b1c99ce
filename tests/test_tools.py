"""Dataset ETL tool tests (reference: labelbox(aug).py, json_to_dataset.py,
voc_annotation.py)."""

import json
import os

import numpy as np
from PIL import Image

from cervical_tpu.tools import labelbox as LB
from cervical_tpu.tools import labelme as LM
from cervical_tpu.tools import voc_annotation as VA
from cervical_tpu.tools import offline_aug as OA


def test_parse_ndjson(tmp_path):
    rec = {
        "data_row": {"external_id": "0002A0.jpg"},
        "projects": {"p1": {"labels": [{"annotations": {"objects": [
            {"name": "AWE", "mask": {"url": "http://x/mask1"}},
            {"name": "Mosaic", "mask": {"url": "http://x/mask2"},
             "composite_mask": {"url": "http://x/comp"}},
        ]}}]}},
    }
    p = tmp_path / "export.ndjson"
    p.write_text(json.dumps(rec) + "\n")
    class_urls, comp_urls, ids, counts = LB.parse_ndjson(str(p))
    assert ids == ["0002A0"]
    assert counts == [("0002A0", 2)]
    assert len(class_urls) == 2 and class_urls[0]["name"] == "AWE"
    assert len(comp_urls) == 1


def test_recolor_merge_and_gray_roundtrip(tmp_path):
    # white blob on black, RGBA
    m1 = np.zeros((8, 8, 4), np.uint8)
    m1[..., 3] = 255
    m1[2:4, 2:4, :3] = 255
    m2 = np.zeros_like(m1)
    m2[..., 3] = 255
    m2[5:7, 5:7, :3] = 255
    r1 = LB.recolor_mask(m1, "AWE")
    r2 = LB.recolor_mask(m2, "Atypical")
    assert tuple(r1[2, 2, :3]) == LB.COLOR_MAP["AWE"]
    merged = LB.merge_masks([r1[..., :3].astype(np.int64),
                             r2[..., :3].astype(np.int64)])
    color_dir = tmp_path / "color"
    gray_dir = tmp_path / "gray"
    color_dir.mkdir()
    merged.save(color_dir / "0002A0.png")
    LB.colors_to_gray(str(color_dir), str(gray_dir))
    gray = np.array(Image.open(gray_dir / "0002A0.png"))
    assert gray[2, 2] == 1  # AWE
    assert gray[5, 5] == 4  # Atypical
    assert gray[0, 0] == 0


def test_labelme_conversion(tmp_path):
    img = np.full((16, 16, 3), 200, np.uint8)
    Image.fromarray(img).save(tmp_path / "case1_src.png")
    rec = {
        "imagePath": "case1_src.png",
        "shapes": [{"label": "person", "shape_type": "polygon",
                    "points": [[2, 2], [10, 2], [10, 10], [2, 10]]}],
    }
    (tmp_path / "case1.json").write_text(json.dumps(rec))
    out_j = tmp_path / "jpgs"
    out_p = tmp_path / "pngs"
    converted = LM.convert_folder(str(tmp_path), str(out_j), str(out_p))
    assert converted == ["case1"]
    mask = np.array(Image.open(out_p / "case1.png"))
    assert mask[5, 5] == LM.VOC_CLASSES.index("person")
    assert mask[0, 0] == 0


def _mini_voc(tmp_path, n=10):
    seg = tmp_path / "VOC2007" / "SegmentationClass"
    jpg = tmp_path / "VOC2007" / "JPEGImages"
    seg.mkdir(parents=True)
    jpg.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        m = rng.integers(0, 5, (16, 16)).astype(np.uint8)
        Image.fromarray(m).save(seg / f"{i:03d}.png")
        Image.fromarray(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
                        ).save(jpg / f"{i:03d}.jpg")
    return tmp_path


def test_generate_splits_and_audit(tmp_path):
    root = _mini_voc(tmp_path)
    files = VA.generate_splits(str(root), trainval_percent=1.0,
                               train_percent=0.8)
    assert len(files["train"]) == 8 and len(files["val"]) == 2
    assert not files["test"]
    counts, warnings = VA.audit_labels(str(root), num_classes=5)
    assert counts[:5].sum() == 10 * 16 * 16
    assert not any("binary mask" in w for w in warnings)


def test_audit_flags_binary_masks(tmp_path):
    seg = tmp_path / "VOC2007" / "SegmentationClass"
    seg.mkdir(parents=True)
    m = np.zeros((8, 8), np.uint8)
    m[2:4] = 255
    Image.fromarray(m).save(seg / "000.png")
    _, warnings = VA.audit_labels(str(tmp_path))
    assert any("binary mask" in w for w in warnings)


def test_seg_8x_offline_augmentation(tmp_path):
    root = _mini_voc(tmp_path, n=3)
    out = tmp_path / "aug"
    new_ids = OA.write_seg_augmented(str(root), str(out),
                                     ["000", "001", "002"], seed=0,
                                     size=(16, 16))
    assert len(new_ids) == 24  # 3 x 8
    assert new_ids[0] == "00001" and new_ids[-1] == "00024"
    # paired mask geometric alignment: rotated slots share the transform
    img1 = np.array(Image.open(out / "VOC2007" / "JPEGImages" / "00002.jpg"))
    msk1 = np.array(Image.open(out / "VOC2007" / "SegmentationClass" / "00002.png"))
    assert img1.shape[:2] == msk1.shape
    # photometric slots (4,5,6 = blur/brighten/darken) keep the original mask
    orig = np.array(Image.open(out / "VOC2007" / "SegmentationClass" / "00001.png"))
    for k in (4, 5, 6):
        m = np.array(Image.open(
            out / "VOC2007" / "SegmentationClass" / f"{k:05d}.png"))
        np.testing.assert_array_equal(m, orig)


def test_multimodal_5x(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                        ).save(src / f"p{i}.png")
    out = tmp_path / "out"
    written = OA.write_multimodal_augmented(str(src), str(out), batch=2)
    assert len(written) == 10  # 2 images x 5 variants
    assert (out / "p0_aug0.png").exists()
