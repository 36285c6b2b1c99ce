"""CLI entry-point smoke tests (scripts/)."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_eval_miou_dirs_mode(tmp_path, capsys):
    from scripts.eval_miou import main
    gt = tmp_path / "gt"
    pred = tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    rng = np.random.default_rng(0)
    ids = []
    for i in range(3):
        m = rng.integers(0, 5, (16, 16)).astype(np.uint8)
        Image.fromarray(m).save(gt / f"{i}.png")
        Image.fromarray(m).save(pred / f"{i}.png")  # perfect predictions
        ids.append(str(i))
    idfile = tmp_path / "ids.txt"
    idfile.write_text("\n".join(ids))
    main(["--gt_dir", str(gt), "--pred_dir", str(pred),
          "--ids", str(idfile), "--miou_out", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "mIoU: 100.00" in out
    assert (tmp_path / "out" / "confusion_matrix.csv").exists()


def test_prepare_dataset_split_and_audit(tmp_path, capsys):
    from scripts.prepare_dataset import main
    seg = tmp_path / "VOC2007" / "SegmentationClass"
    seg.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(10):
        Image.fromarray(rng.integers(0, 5, (8, 8)).astype(np.uint8)
                        ).save(seg / f"{i:03d}.png")
    main(["--split_root", str(tmp_path), "--ratios", "8,1,1"])
    main(["--audit", str(tmp_path)])
    out = capsys.readouterr().out
    assert "splits: train 8 / val 1 / test 1" in out
    assert "label histogram" in out
    sets = tmp_path / "VOC2007" / "ImageSets" / "Segmentation"
    assert (sets / "train.txt").exists()


@pytest.mark.slow
def test_train_fusion_cli_on_synthetic(tmp_path, capsys):
    from scripts.train_fusion import main
    from cervical_tpu.data.fusion_data import make_synthetic_fusion, save_npz
    # >= 2 members per class per inner split (stratified splitter raises
    # on singleton classes, like sklearn)
    ds = make_synthetic_fusion(num_patients=40, modalities=("imgN", "cli"),
                               feature_dim=32)
    p = tmp_path / "cohort.npz"
    save_npz(str(p), ds)
    main(["--cohort", str(p), "--modalities", '["imgN","cli"]',
          "--in_features", "32", "--epochs", "1", "--kfold", "2",
          "--epoch0_no_step", "false"])
    out = capsys.readouterr().out
    assert "mean test accuracy over folds" in out
