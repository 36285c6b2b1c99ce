"""Loss goldens against actual torch implementations (reference formulas:
nets/deeplabv3_training.py:9-56, my_train(full).py:202,253)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cervical_tpu import losses


def _data(seed=0, b=2, h=6, w=6, c=5, with_ignore=True):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    hi = c + 1 if with_ignore else c
    labels = rng.integers(0, hi, size=(b, h, w))
    return logits, labels


def test_weighted_ce_matches_torch():
    logits, labels = _data()
    w = np.array([1, 1, 5, 3, 4], np.float32)
    got = float(losses.cross_entropy_loss(jnp.asarray(logits),
                                          jnp.asarray(labels),
                                          class_weights=w, num_classes=5))
    t_in = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    t_in = t_in.permute(0, 2, 3, 1).reshape(-1, 5)
    t_tgt = torch.from_numpy(labels.reshape(-1))
    ref = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w),
                                    ignore_index=5)(t_in, t_tgt)
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)


def test_focal_matches_torch_formula():
    """Reproduce Focal_Loss (deeplabv3_training.py:21-36) in torch and
    compare — including the weighted-pt and mean-over-ignored quirks."""
    logits, labels = _data(1)
    w = np.array([1, 1, 5, 3, 4], np.float32)
    got = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  class_weights=w, num_classes=5,
                                  alpha=0.5, gamma=2))
    t_in = torch.from_numpy(logits.reshape(-1, 5))
    t_tgt = torch.from_numpy(labels.reshape(-1))
    logpt = -torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w),
                                       ignore_index=5,
                                       reduction="none")(t_in, t_tgt)
    pt = torch.exp(logpt)
    logpt = logpt * 0.5
    ref = (-((1 - pt) ** 2) * logpt).mean()
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)


def test_dice_matches_torch_formula():
    """Soft dice (deeplabv3_training.py:38-56) in torch."""
    logits, labels = _data(2)
    from cervical_tpu.ops.image import one_hot_with_ignore
    one_hot = np.asarray(one_hot_with_ignore(jnp.asarray(labels), 5))
    got = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(one_hot)))

    n = logits.shape[0]
    t_in = torch.softmax(torch.from_numpy(logits.reshape(n, -1, 5)), -1)
    t_tgt = torch.from_numpy(one_hot.reshape(n, -1, 6))
    tp = torch.sum(t_tgt[..., :-1] * t_in, dim=[0, 1])
    fp = torch.sum(t_in, dim=[0, 1]) - tp
    fn = torch.sum(t_tgt[..., :-1], dim=[0, 1]) - tp
    score = (2 * tp + 1e-5) / (2 * tp + fn + fp + 1e-5)
    ref = 1 - torch.mean(score)
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)


def test_fusion_ce_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 8)
    got = float(losses.softmax_cross_entropy(jnp.asarray(logits),
                                             jnp.asarray(labels)))
    ref = torch.nn.CrossEntropyLoss()(torch.from_numpy(logits),
                                      torch.from_numpy(labels))
    np.testing.assert_allclose(got, float(ref), rtol=1e-6)


def test_masked_mae_mse_matches_torch():
    rng = np.random.default_rng(4)
    out = rng.normal(size=(4, 512)).astype(np.float32)
    lbl = rng.normal(size=(4, 512)).astype(np.float32)
    mask = np.array([True, False, True, True])
    got = float(losses.masked_mae_mse(jnp.asarray(out)[None],
                                      jnp.asarray(lbl)[None],
                                      jnp.asarray(mask)[None]))
    ref = torch.nn.MSELoss()(torch.from_numpy(out[mask]),
                             torch.from_numpy(lbl[mask]))
    np.testing.assert_allclose(got, float(ref), rtol=1e-6)


def test_adam_coupled_l2_matches_torch_adam():
    """make_optimizer('adam') must replicate torch Adam's COUPLED L2 weight
    decay (wd*theta added to the gradient BEFORE the moment updates) — not
    AdamW's decoupled decay, which diverges materially at wd=5e-4.  Three
    steps with a constant raw gradient discriminate the two: the effective
    gradient changes each step through the decay term."""
    import dataclasses

    import jax
    import optax

    from cervical_tpu.config import SegTrainConfig
    from cervical_tpu.train.seg_trainer import make_optimizer

    rng = np.random.default_rng(11)
    w0 = rng.normal(size=17).astype(np.float32)
    g = rng.normal(size=17).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-3, betas=(0.9, 0.999),
                            weight_decay=5e-4)
    for _ in range(3):
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    cfg = dataclasses.replace(SegTrainConfig(), optimizer_type="adam",
                              weight_decay=5e-4)
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    state.hyperparams["learning_rate"] = 1e-3
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-7)

    # control: AdamW (decoupled) measurably deviates from the torch run
    txw = optax.adamw(1e-3, weight_decay=5e-4)
    pw = {"w": jnp.asarray(w0)}
    sw = txw.init(pw)
    for _ in range(3):
        up, sw = txw.update({"w": jnp.asarray(g)}, sw, pw)
        pw = optax.apply_updates(pw, up)
    assert np.abs(np.asarray(pw["w"]) - tw.detach().numpy()).max() > 1e-7
