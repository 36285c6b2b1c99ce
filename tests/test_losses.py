"""Golden-value tests for segmentation/fusion losses against hand-computed and
torch-derived formulas (reference: nets/deeplabv3_training.py:9-56,
utils_metrics.py:13-35, my_train(full).py:317-341)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cervical_tpu import losses
from cervical_tpu.ops.image import one_hot_with_ignore


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_cross_entropy_matches_manual():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 6, size=(2, 4, 4))  # includes ignore label 5
    w = np.array([1, 1, 5, 3, 4], np.float32)

    p = _np_softmax(logits)
    nll = -np.log(p.reshape(-1, 5)[np.arange(32), np.minimum(labels.reshape(-1), 4)])
    valid = labels.reshape(-1) < 5
    wy = np.where(valid, w[np.minimum(labels.reshape(-1), 4)], 0)
    expected = np.sum(nll * wy) / np.sum(wy)

    got = losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                    class_weights=w, num_classes=5)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cross_entropy_ignores_border():
    logits = jnp.zeros((1, 2, 2, 3))
    labels = jnp.array([[[0, 3], [3, 3]]])  # 3 == ignore
    # uniform softmax -> nll = log(3) on the single valid pixel
    np.testing.assert_allclose(
        losses.cross_entropy_loss(logits, labels, num_classes=3),
        np.log(3.0), rtol=1e-6)


def test_focal_loss_reduces_easy_examples():
    # very confident correct prediction -> focal << ce
    logits = jnp.array([[[[10.0, 0, 0]]]])
    labels = jnp.zeros((1, 1, 1), jnp.int32)
    ce = losses.cross_entropy_loss(logits, labels, num_classes=3)
    fl = losses.focal_loss(logits, labels, num_classes=3)
    assert fl < ce * 0.01


def test_focal_loss_manual_value():
    logits = np.array([[[[1.0, 2.0, 0.5], [0.2, 0.1, 3.0]]]], np.float32)
    labels = np.array([[[1, 0]]])
    p = _np_softmax(logits).reshape(-1, 3)
    nll = -np.log(p[np.arange(2), [1, 0]])
    pt = np.exp(-nll)
    expected = np.mean((1 - pt) ** 2 * 0.5 * nll)
    got = losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels), num_classes=3)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_dice_loss_perfect_prediction_small():
    labels = np.array([[[0, 1], [2, 1]]])
    one_hot = one_hot_with_ignore(jnp.asarray(labels), 3)
    logits = 50.0 * np.eye(3)[labels].astype(np.float32)
    loss = losses.dice_loss(jnp.asarray(logits), one_hot)
    assert float(loss) < 1e-3


def test_dice_loss_manual():
    # one pixel, 2 classes + ignore channel
    logits = np.zeros((1, 1, 1, 2), np.float32)  # softmax = [.5,.5]
    target = np.zeros((1, 1, 1, 3), np.float32)
    target[0, 0, 0, 0] = 1  # class 0
    tp = np.array([0.5, 0.0])
    fp = np.array([0.0, 0.5])
    fn = np.array([0.5, 0.0])
    s = 1e-5
    score = (2 * tp + s) / (2 * tp + fn + fp + s)
    expected = 1 - score.mean()
    got = losses.dice_loss(jnp.asarray(logits), jnp.asarray(target))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_f_score_thresholded():
    labels = np.array([[[0, 1], [1, 1]]])
    one_hot = one_hot_with_ignore(jnp.asarray(labels), 2)
    logits = 50.0 * np.eye(2)[labels].astype(np.float32)
    score = losses.f_score(jnp.asarray(logits), one_hot)
    np.testing.assert_allclose(score, 1.0, atol=1e-4)


def test_masked_mae_mse():
    out = jnp.ones((2, 4, 8))
    lbl = jnp.zeros((2, 4, 8))
    mask = jnp.array([[True, False, False, False],
                      [True, True, False, False]])
    # mean over masked elements: all diffs are 1 -> 1.0
    np.testing.assert_allclose(losses.masked_mae_mse(out, lbl, mask), 1.0)


def test_fusion_multihead_loss_weights():
    b = 3
    labels = jnp.array([0, 1, 2])
    perfect = 50.0 * jax.nn.one_hot(labels, 4)
    uniform = jnp.zeros((b, 4))
    logits = {"all": perfect, "imgN": uniform, "cli": perfect}
    total, parts = losses.fusion_multihead_loss(logits, labels)
    # all & cli CE ~ 0; imgN CE = log(4) weighted 0.3
    np.testing.assert_allclose(total, 0.3 * np.log(4.0), rtol=1e-4)
    np.testing.assert_allclose(parts["imgN"], np.log(4.0), rtol=1e-5)


def test_fusion_multihead_loss_mae_normalization():
    labels = jnp.array([0])
    logits = {"all": 50.0 * jax.nn.one_hot(labels, 4)}
    total, parts = losses.fusion_multihead_loss(
        logits, labels, mae_mse=jnp.asarray(10.0), num_micro_batches=4)
    # aux = 10 / 4 / 5 = 0.5
    np.testing.assert_allclose(parts["mae_mse"], 0.5, rtol=1e-6)
    np.testing.assert_allclose(total, 0.5, atol=1e-5)


def test_seg_losses_weight0_rows_exact():
    """Weight-0 rows (multihost eval padding, data/pipeline.py) must leave
    every seg loss exactly equal to the computation without those rows."""
    from cervical_tpu.ops.image import one_hot_with_ignore
    rng = np.random.default_rng(0)
    nc = 5
    logits = jnp.asarray(rng.normal(size=(5, 6, 6, nc)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, nc + 1, (5, 6, 6)).astype(np.int32))
    cls_w = jnp.asarray([1.0, 1.0, 5.0, 3.0, 4.0])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    # padded rows become all-ignore before one-hot, like the eval step does
    labels_m = jnp.where(w[:, None, None] > 0, labels, nc)
    oh_m = one_hot_with_ignore(labels_m, nc)
    oh3 = one_hot_with_ignore(labels[:3], nc)
    pairs = [
        (losses.cross_entropy_loss(logits, labels_m, cls_w, nc,
                                   sample_weights=w),
         losses.cross_entropy_loss(logits[:3], labels[:3], cls_w, nc)),
        (losses.focal_loss(logits, labels_m, cls_w, nc, sample_weights=w),
         losses.focal_loss(logits[:3], labels[:3], cls_w, nc)),
        (losses.dice_loss(logits, oh_m, sample_weights=w),
         losses.dice_loss(logits[:3], oh3)),
        (losses.f_score(logits, oh_m, sample_weights=w),
         losses.f_score(logits[:3], oh3)),
    ]
    for got, want in pairs:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
