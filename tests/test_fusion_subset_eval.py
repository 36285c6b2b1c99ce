"""Missing-modality evaluation (the reference's use_type != train_use_type
imputation path, my_mae_model.py:608-622 / prediction with graph.data_type)."""

import numpy as np
import jax
import pytest

from cervical_tpu.config import FusionTrainConfig
from cervical_tpu.data.fusion_data import make_synthetic_fusion
from cervical_tpu.train.fusion_trainer import FusionTrainer


@pytest.fixture(scope="module")
def trained():
    cfg = FusionTrainConfig(epochs=5, lr=5e-4, batch_size=16,
                            epoch0_no_step=False, in_features=128)
    ds = make_synthetic_fusion(num_patients=48, feature_dim=128, noise=0.25)
    tr = FusionTrainer(cfg)
    state = tr.init_state({m: ds["feats"][m][:1] for m in cfg.modalities},
                          jax.random.PRNGKey(0))
    for epoch in range(cfg.epochs):
        state, _ = tr.train_epoch(state, ds, epoch, cfg.lr)
    return tr, state, ds


def test_subset_eval_above_chance(trained):
    tr, state, ds = trained
    full = tr.predict(state["params"], ds)
    three = tr.predict(state["params"], ds, use_type=("imgN", "imgA", "imgL"))
    assert full["acc_all"] > 0.6
    # imputation path still classifies well above chance (0.25)
    assert three["acc_all"] > 0.4
    # using fewer modalities should not beat the full set by much
    assert three["acc_all"] <= full["acc_all"] + 0.15


def test_subset_eval_two_modal(trained):
    tr, state, ds = trained
    two = tr.predict(state["params"], ds, use_type=("imgN", "cli"))
    assert 0.0 <= two["acc_all"] <= 1.0
    assert two["confusion"].sum() == len(ds["labels"])


def test_per_patient_present_mask(trained):
    tr, state, ds = trained
    # knock out imgL for half the cohort via the dataset's present mask
    ds2 = {k: (v.copy() if hasattr(v, "copy") else v) for k, v in ds.items()}
    ds2["present"] = ds["present"].copy()
    ds2["present"][::2, 2] = False
    ds2["feats"] = dict(ds["feats"])
    feats_imgL = ds["feats"]["imgL"].copy()
    feats_imgL[::2] = 0
    ds2["feats"]["imgL"] = feats_imgL
    out = tr.predict(state["params"], ds2)
    assert np.isfinite(out["loss"])
    assert out["acc_all"] > 0.4
