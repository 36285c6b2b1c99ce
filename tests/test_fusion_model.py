"""FusionMAE model tests: shapes, jit-compile, modality subsets, masking
semantics (reference: my_mae_model.py:399-793)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cervical_tpu.models.fusion import FusionMAE, default_adjacency
from cervical_tpu.data.masks import generate_modal_masks, imputation_masks

B = 3


def _feats(mods, b=B, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for m in mods:
        n = 4 if m == "cli" else 16
        out[m] = jnp.asarray(rng.normal(size=(b, n, 1024)).astype(np.float32))
    return out


@pytest.mark.parametrize("mods", [
    ("imgN", "imgA", "imgL", "cli"),
    ("imgN", "imgA", "imgL"),
    ("imgN", "cli"),
    ("imgN", "imgL"),
])
def test_forward_shapes(mods):
    model = FusionMAE(modalities=mods)
    feats = _feats(mods)
    vars_ = model.init(jax.random.PRNGKey(0), feats)
    out = model.apply(vars_, feats)
    assert out["logits"]["all"].shape == (B, 4)
    for m in mods:
        assert out["logits"][m].shape == (B, 4)
    assert out["multi_x"].shape == (B, len(mods), 8)
    assert out["mae_labels"].shape == (B, len(mods), 512)
    if len(mods) > 1:
        assert out["mae_out"].shape == (B, len(mods), 512)
    assert np.isfinite(np.asarray(out["logits"]["all"])).all()


def test_single_modality_skips_mae():
    model = FusionMAE(modalities=("imgN",))
    feats = _feats(("imgN",))
    vars_ = model.init(jax.random.PRNGKey(0), feats)
    out = model.apply(vars_, feats)
    assert out["mae_out"] is None
    assert out["logits"]["all"].shape == (B, 4)


def test_jit_compile_and_cache():
    model = FusionMAE()
    feats = _feats(FusionMAE.modalities)
    vars_ = model.init(jax.random.PRNGKey(0), feats)

    @jax.jit
    def fwd(v, f, mask):
        return model.apply(v, f, mae_mask=mask)["logits"]["all"]

    mask = generate_modal_masks(jax.random.PRNGKey(1), B, 4)
    y1 = fwd(vars_, feats, mask)
    y2 = fwd(vars_, feats, jnp.zeros_like(mask))
    assert y1.shape == y2.shape == (B, 4)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # mask matters


def test_training_mode_uses_dropout():
    model = FusionMAE()
    feats = _feats(FusionMAE.modalities)
    vars_ = model.init(jax.random.PRNGKey(0), feats)
    mask = generate_modal_masks(jax.random.PRNGKey(1), B, 4)
    y1 = model.apply(vars_, feats, mae_mask=mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = model.apply(vars_, feats, mae_mask=mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y1["logits"]["all"]),
                           np.asarray(y2["logits"]["all"]))


def test_missing_modality_imputation_path():
    """Zeroed absent tokens + imputation mask == reference tmp_x path
    (my_mae_model.py:608-622); fused head must not collapse."""
    model = FusionMAE()
    feats = _feats(FusionMAE.modalities)
    vars_ = model.init(jax.random.PRNGKey(0), feats)
    present = jnp.array([[True, True, False, True]] * B)
    # zero the absent modality's features as the pipeline would
    feats = dict(feats)
    feats["imgL"] = jnp.zeros_like(feats["imgL"])
    out = model.apply(vars_, feats, present=present,
                      mae_mask=imputation_masks(present))
    assert np.isfinite(np.asarray(out["logits"]["all"])).all()
    # one_x is a mean over present towers only
    manual = np.asarray(out["multi_x"])[:, [0, 1, 3]].mean(axis=1)
    # recompute fused logits from manual mean via the classifier params
    w = np.asarray(vars_["params"]["classifier"]["kernel"])
    b = np.asarray(vars_["params"]["classifier"]["bias"])
    np.testing.assert_allclose(np.asarray(out["logits"]["all"]),
                               manual @ w + b, rtol=1e-3, atol=1e-4)


def test_mae_labels_are_stage1_pools():
    model = FusionMAE(modalities=("imgN", "cli"))
    feats = _feats(("imgN", "cli"))
    vars_ = model.init(jax.random.PRNGKey(0), feats)
    out = model.apply(vars_, feats)
    assert out["mae_labels"].shape == (B, 2, 512)


def test_default_adjacency_shapes():
    adj = default_adjacency(("imgN", "imgA", "cli"))
    assert adj["imgN"].shape == (16, 16)
    assert adj["cli"].shape == (4, 4)
    np.testing.assert_allclose(adj["cli"].sum(1), np.ones(4), rtol=1e-6)


def test_batch_independence():
    """Batched forward must equal per-sample forwards (the reference runs
    batch-of-one; our batching must not mix samples)."""
    model = FusionMAE(modalities=("imgN", "cli"))
    feats = _feats(("imgN", "cli"))
    vars_ = model.init(jax.random.PRNGKey(0), feats)
    full = model.apply(vars_, feats)["logits"]["all"]
    for i in range(B):
        single = model.apply(
            vars_, {m: v[i:i + 1] for m, v in feats.items()})["logits"]["all"]
        np.testing.assert_allclose(np.asarray(full[i]), np.asarray(single[0]),
                                   rtol=2e-3, atol=2e-4)
