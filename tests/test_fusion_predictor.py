"""FusionPredictor: npz param round-trip, batched probabilistic inference
with missing-modality imputation, agreement with the trainer's eval step,
StableHLO export round-trip, and the CLI.  (The reference's only inference
path is the in-driver ``prediction`` loop, my_train(full).py:47-171.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cervical_tpu.config import FusionTrainConfig
from cervical_tpu.data.fusion_data import make_synthetic_fusion, save_npz
from cervical_tpu.inference.fusion_predictor import (
    FusionPredictor, flatten_params, load_params_npz, save_params_npz)
from cervical_tpu.train.fusion_trainer import FusionTrainer


@pytest.fixture(scope="module")
def setup():
    # hidden must be >= 64: the tower widths are hidden//4 // 16 // 64
    cfg = FusionTrainConfig(in_features=32, hidden=64, batch_size=8)
    trainer = FusionTrainer(cfg)
    ds = make_synthetic_fusion(num_patients=13, feature_dim=32, seed=0)
    state = trainer.init_state(
        {m: v[:1] for m, v in ds["feats"].items()}, jax.random.PRNGKey(0))
    return cfg, trainer, ds, state["params"]


def test_npz_param_round_trip(setup, tmp_path):
    cfg, _, _, params = setup
    path = save_params_npz(str(tmp_path / "p.npz"), params)
    restored = load_params_npz(path)
    flat0, flat1 = flatten_params(params), flatten_params(restored)
    assert set(flat0) == set(flat1)
    for k in flat0:
        np.testing.assert_array_equal(flat0[k], flat1[k])


def test_predict_proba_shapes_and_sums(setup):
    cfg, _, ds, params = setup
    # batch_size 8 over n=13 forces a padded ragged tail
    pred = FusionPredictor(cfg, params, batch_size=8)
    probs = pred.predict_proba(ds["feats"], ds.get("present"))
    n = len(ds["labels"])
    assert set(probs) == {"all", *cfg.modalities}
    for v in probs.values():
        assert v.shape == (n, cfg.num_classes)
        np.testing.assert_allclose(v.sum(-1), 1.0, atol=1e-5)
    out = pred.predict(ds["feats"])
    assert out["classes"].shape == (n,)
    assert (out["confidence"] > 0).all() and (out["confidence"] <= 1).all()


def test_matches_trainer_eval_step(setup):
    """The predictor forward must agree with the trainer's eval step (same
    params, full-present cohort) — the parity between training-time eval
    and the serving surface."""
    from cervical_tpu.data.masks import imputation_masks

    cfg, trainer, ds, params = setup
    n = len(ds["labels"])
    pred = FusionPredictor(cfg, params, batch_size=n)
    probs = pred.predict_proba(ds["feats"])
    feats = {m: jnp.asarray(v) for m, v in ds["feats"].items()}
    present = jnp.ones((n, len(cfg.modalities)), bool)
    logits, _ = trainer.eval_step_fn()(params, feats, present,
                                       imputation_masks(present))
    ref = np.asarray(jax.nn.softmax(logits["all"].astype(jnp.float32), -1))
    np.testing.assert_allclose(probs["all"], ref, atol=1e-5)


def test_missing_modality_imputation_changes_output(setup):
    """Marking a modality absent must route it through the MAE imputation
    path (different fused probs than the all-present forward) while staying
    a valid distribution — my_mae_model.py:608-622 semantics."""
    cfg, _, ds, params = setup
    n = len(ds["labels"])
    pred = FusionPredictor(cfg, params, batch_size=n)
    full = pred.predict_proba(ds["feats"])["all"]
    present = np.ones((n, len(cfg.modalities)), bool)
    present[:, 1] = False  # imgA absent for everyone
    feats = dict(ds["feats"])
    feats["imgA"] = np.zeros_like(feats["imgA"])
    imputed = pred.predict_proba(feats, present)["all"]
    np.testing.assert_allclose(imputed.sum(-1), 1.0, atol=1e-5)
    assert np.abs(full - imputed).max() > 1e-6


def test_absent_slot_filler_cannot_poison_outputs(setup):
    """Absent-modality features are zeroed before the encoders: NaN (or any
    garbage) filler in a present=False slot must not reach the fused head —
    the reference imputes from a zero-padded tmp_x (my_mae_model.py:608-613)."""
    cfg, _, ds, params = setup
    n = len(ds["labels"])
    pred = FusionPredictor(cfg, params, batch_size=n)
    present = np.ones((n, len(cfg.modalities)), bool)
    present[:, 1] = False
    nan_feats = dict(ds["feats"])
    nan_feats["imgA"] = np.full_like(nan_feats["imgA"], np.nan)
    probs = pred.predict_proba(nan_feats, present)
    for v in probs.values():
        assert np.isfinite(v).all()
    # and the result equals the zero-filled call (filler is irrelevant)
    zero_feats = dict(ds["feats"])
    zero_feats["imgA"] = np.zeros_like(zero_feats["imgA"])
    ref = pred.predict_proba(zero_feats, present)
    for k in probs:
        np.testing.assert_allclose(probs[k], ref[k], atol=1e-6)


def test_one_compiled_shape_and_empty_cohort(setup):
    """Every cohort size runs through ONE compiled forward (pad-to-batch);
    n=0 returns empty per-head arrays instead of crashing."""
    cfg, _, ds, params = setup
    pred = FusionPredictor(cfg, params, batch_size=8)
    for n in (1, 3, 13):
        sub = {m: v[:n] for m, v in ds["feats"].items()}
        out = pred.predict_proba(sub)
        assert out["all"].shape == (n, cfg.num_classes)
    assert pred._jit_forward._cache_size() == 1
    empty = pred.predict_proba({m: v[:0] for m, v in ds["feats"].items()})
    assert set(empty) == {"all", *cfg.modalities}
    for v in empty.values():
        assert v.shape == (0, cfg.num_classes)


def test_export_stablehlo_round_trip(setup, tmp_path):
    from jax import export as jax_export
    from cervical_tpu.data.fusion_data import node_count

    cfg, _, ds, params = setup
    pred = FusionPredictor(cfg, params)
    path = pred.export_stablehlo(str(tmp_path / "fusion.stablehlo"),
                                 batch_size=2)
    exported = jax_export.deserialize(bytearray(open(path, "rb").read()))
    feats = {m: jnp.asarray(ds["feats"][m][:2]) for m in cfg.modalities}
    out = exported.call(feats, jnp.ones((2, len(cfg.modalities)), bool))
    assert out["all"].shape == (2, cfg.num_classes)
    np.testing.assert_allclose(np.asarray(out["all"]).sum(-1), 1.0,
                               atol=1e-5)


def test_predict_fusion_cli(setup, tmp_path):
    import json
    import sys

    cfg, _, ds, params = setup
    save_npz(str(tmp_path / "cohort.npz"), ds)
    save_params_npz(str(tmp_path / "p.npz"), params)
    sys.path.insert(0, "scripts")
    try:
        import predict_fusion
    finally:
        sys.path.pop(0)
    predict_fusion.main([
        "--cohort", str(tmp_path / "cohort.npz"),
        "--params", str(tmp_path / "p.npz"),
        "--in_features", "32", "--hidden", "64",
        "--out", str(tmp_path / "preds.json")])
    with open(tmp_path / "preds.json") as f:
        report = json.load(f)
    n = len(ds["labels"])
    assert len(report["classes"]) == n
    assert "accuracy" in report and 0.0 <= report["accuracy"] <= 1.0
    assert len(report["probs"][0]) == cfg.num_classes
    for m in cfg.modalities:
        assert len(report[f"classes_{m}"]) == n


def test_predict_fusion_cli_unlabeled_and_subset(setup, tmp_path):
    """Serving-shaped inputs: a label-free cohort npz must predict without
    crashing (no ground truth at inference time), and a 2-modal model must
    serve a 4-modal cohort with present columns aligned by name."""
    import json
    import sys

    cfg4, trainer4, ds, _ = setup
    unlabeled = dict(ds)
    unlabeled["labels"] = None
    save_npz(str(tmp_path / "unlabeled.npz"), unlabeled)

    cfg2 = FusionTrainConfig(in_features=32, hidden=64, batch_size=8,
                             modalities=("imgN", "cli"))
    trainer2 = FusionTrainer(cfg2)
    state2 = trainer2.init_state(
        {m: ds["feats"][m][:1] for m in cfg2.modalities},
        jax.random.PRNGKey(1))
    save_params_npz(str(tmp_path / "p2.npz"), state2["params"])

    sys.path.insert(0, "scripts")
    try:
        import predict_fusion
    finally:
        sys.path.pop(0)
    predict_fusion.main([
        "--cohort", str(tmp_path / "unlabeled.npz"),
        "--params", str(tmp_path / "p2.npz"),
        "--in_features", "32", "--hidden", "64",
        "--modalities", '["imgN","cli"]',
        "--out", str(tmp_path / "preds2.json")])
    with open(tmp_path / "preds2.json") as f:
        report = json.load(f)
    n = len(ds["ids"])
    assert len(report["classes"]) == n
    assert "accuracy" not in report  # no labels -> no accuracy
    assert f"classes_cli" in report and "classes_imgA" not in report
