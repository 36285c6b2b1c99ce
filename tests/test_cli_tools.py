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


def test_build_graphs_table_diagnosis_validation(tmp_path):
    """Unmapped diagnosis strings raise a message naming the valid labels
    (regression: they used to fall through to a cryptic int() ValueError)."""
    import pandas as pd
    from scripts.build_graphs import read_table
    p = tmp_path / "patients.csv"
    pd.DataFrame({"id": [1, 2], "age": [30, 40],
                  "diagnosis": ["CIS", "Mild dysplasia"]}).to_csv(
        p, index=False)
    ids, ages, diagnosis = read_table(str(p))
    assert diagnosis == {1: 0, 2: 1}

    pd.DataFrame({"id": [1], "age": [30],
                  "diagnosis": ["Carcinoma in situ"]}).to_csv(p, index=False)
    with pytest.raises(SystemExit, match="Mild dysplasia"):
        read_table(str(p))

    pd.DataFrame({"id": [1], "age": [30], "diagnosis": [3]}).to_csv(
        p, index=False)
    assert read_table(str(p))[2] == {1: 3}


def test_eval_miou_dataset_alias(tmp_path, capsys):
    """--dataset (the docstring's usage) maps to data.dataset_path."""
    from scripts.eval_miou import main
    from cervical_tpu.data.voc import make_synthetic_voc
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train.seg_trainer import SegTrainer
    from cervical_tpu.train.checkpoints import CheckpointManager

    root = make_synthetic_voc(str(tmp_path / "voc"), num_images=8, size=32)
    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(32, 32)),
                         backbone="mobilenet", dtype="float32",
                         save_dir=str(tmp_path / "logs"))
    trainer = SegTrainer(cfg)
    mgr = CheckpointManager(cfg.save_dir, 10)
    mgr._save("best_epoch_weights", trainer.state)
    main(["--dataset", root, "--ckpt",
          os.path.join(cfg.save_dir, "best_epoch_weights"),
          "--backbone", "mobilenet", "--data.input_shape", "[32,32]",
          "--dtype", "float32", "--eval_batch_size", "4"])
    out = capsys.readouterr().out
    assert "mIoU" in out
