"""Config system tests (SURVEY.md §5.6 rebuild)."""

import json

import pytest

from cervical_tpu.config import (FusionTrainConfig, SegTrainConfig,
                                 load_config, parse_cli_overrides)


def test_defaults_match_reference_literals():
    cfg = SegTrainConfig()
    assert cfg.backbone == "xception"          # train.py:94
    assert cfg.data.num_classes == 5           # train.py:87
    assert cfg.cls_weights == (1.0, 1.0, 5.0, 3.0, 4.0)  # train.py:274
    assert cfg.freeze_epoch == 20 and cfg.unfreeze_epoch == 200
    assert cfg.focal_loss and cfg.dice_loss    # train.py:259-265
    assert cfg.seed == 11                      # train.py:283

    f = FusionTrainConfig()
    assert f.epochs == 180 and f.batch_size == 8 and f.lr == 1e-4
    assert f.kfold == 5 and f.lr_step == 40 and f.weight_decay == 5e-4
    assert f.mse_loss_of_mae_factor == 5.0 and f.mix


def test_arity_defaults():
    f3 = FusionTrainConfig(modalities=("imgN", "imgA", "cli")).arity_defaults()
    assert f3.kfold == 10 and f3.inner_test_size == 0.11
    assert f3.weight_decay == 1e-3 and f3.lr_step == 30
    f2 = FusionTrainConfig(modalities=("imgN", "cli")).arity_defaults()
    assert f2.kfold == 5 and f2.lr_step == 20 and f2.weight_decay == 1e-3


def test_json_config_and_overrides(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"backbone": "mobilenet",
                             "data": {"num_classes": 3}}))
    cfg = load_config(SegTrainConfig, str(p), {"init_lr": 5e-4})
    assert cfg.backbone == "mobilenet"
    assert cfg.data.num_classes == 3
    assert cfg.init_lr == 5e-4


def test_yaml_config(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("backbone: mobilenet\ndata:\n  input_shape: [256, 256]\n")
    cfg = load_config(SegTrainConfig, str(p))
    assert cfg.data.input_shape == (256, 256)


def test_unknown_key_rejected(tmp_path):
    with pytest.raises(KeyError):
        load_config(SegTrainConfig, None, {"not_a_knob": 1})


def test_parse_cli_overrides():
    o = parse_cli_overrides(["--backbone", "mobilenet",
                             "--data.num_classes", "3",
                             "--init_lr=0.001",
                             "--modalities", '["imgN","cli"]'])
    assert o["backbone"] == "mobilenet"
    assert o["data"]["num_classes"] == 3
    assert o["init_lr"] == 0.001
    assert o["modalities"] == ["imgN", "cli"]


def test_arity_defaults_match_reference_deltas():
    """Hyperparameter deltas table (SURVEY.md §2.1):
    4-modal: KFold 5, inner .25, wd 5e-4, lr_step 40 (my_train(full).py:486,516,502,534)
    3-modal: KFold 10, inner .11, wd 1e-3, lr_step 30 (Three_Modal/train(NAL).py:494,524,510,542)
    2-modal: KFold 5, inner .25, wd 1e-3, lr_step 20 (Two_Modal/train(NC).py:418,448,434,466)
    Common: lr 1e-4, epochs 180, batch 8, hidden 512, dropout .3, mix=True,
    gamma .8, mse factor 5 (my_train(full).py:648-671)."""
    from cervical_tpu.config import FusionTrainConfig

    four = FusionTrainConfig(modalities=("imgN", "imgA", "imgL", "cli")
                             ).arity_defaults()
    assert (four.kfold, four.inner_test_size) == (5, 0.25)
    assert (four.weight_decay, four.lr_step) == (5e-4, 40)

    three = FusionTrainConfig(modalities=("imgN", "imgA", "imgL")
                              ).arity_defaults()
    assert (three.kfold, three.inner_test_size) == (10, 0.11)
    assert (three.weight_decay, three.lr_step) == (1e-3, 30)

    two = FusionTrainConfig(modalities=("imgN", "cli")).arity_defaults()
    assert (two.kfold, two.inner_test_size) == (5, 0.25)
    assert (two.weight_decay, two.lr_step) == (1e-3, 20)

    for cfg in (four, three, two):
        assert cfg.lr == 1e-4 and cfg.epochs == 180 and cfg.batch_size == 8
        assert cfg.hidden == 512 and cfg.dropout == 0.3 and cfg.mix
        assert cfg.lr_gamma == 0.8 and cfg.mse_loss_of_mae_factor == 5
        assert cfg.head_weight_all == 1.0 and cfg.head_weight_img == 0.3
        assert cfg.head_weight_cli == 0.2


@pytest.mark.parametrize("modalities, expect", [
    (["imgN", "imgA", "imgL", "cli"], (5, 0.25, 5e-4, 40)),
    (["imgN", "imgA", "imgL"], (10, 0.11, 1e-3, 30)),
    (["imgN", "cli"], (5, 0.25, 1e-3, 20)),
])
def test_train_fusion_cli_applies_arity_defaults(modalities, expect):
    """The actual CLI path (scripts/train_fusion.py::build_config) must
    land the per-arity hyperparameters — round-2 VERDICT weak #5."""
    import sys
    sys.path.insert(0, "scripts")
    try:
        from train_fusion import build_config
    finally:
        sys.path.pop(0)
    cfg, cohort, _, _, _ = build_config(
        ["--cohort", "/tmp/x.npz", "--modalities", json.dumps(modalities)])
    assert cohort == "/tmp/x.npz"
    assert tuple(cfg.modalities) == tuple(modalities)
    assert (cfg.kfold, cfg.inner_test_size,
            cfg.weight_decay, cfg.lr_step) == expect


def test_train_fusion_cli_explicit_beats_arity_default(tmp_path):
    """A user-set key (CLI or config file) must survive arity_defaults."""
    import sys
    sys.path.insert(0, "scripts")
    try:
        from train_fusion import build_config
    finally:
        sys.path.pop(0)
    cfg, _, _, _, _ = build_config(["--modalities", '["imgN","imgA","cli"]',
                              "--kfold", "7"])
    assert cfg.kfold == 7                 # explicit CLI wins
    assert cfg.lr_step == 30              # untouched keys still get deltas
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"modalities": ["imgN", "cli"],
                             "weight_decay": 0.005}))
    cfg2, _, _, _, _ = build_config(["--config", str(p)])
    assert cfg2.weight_decay == 0.005     # explicit file value wins
    assert cfg2.lr_step == 20
