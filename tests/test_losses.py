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


@pytest.mark.parametrize("focal", [True, False])
@pytest.mark.parametrize("dice", [True, False])
@pytest.mark.parametrize("weighted", ["none", "cls", "cls+rows"])
def test_seg_loss_bundle_matches_composition(focal, dice, weighted):
    """The fused class-major bundle must equal the reference-shaped
    composition (focal/CE [+ dice] and f_score) to float tolerance,
    including ignore pixels, class weights, and weight-0 padding rows."""
    rng = np.random.default_rng(7)
    nc = 5
    logits = jnp.asarray(rng.normal(size=(4, 6, 7, nc)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, nc + 1, (4, 6, 7)).astype(np.int32))
    cls_w = None if weighted == "none" else jnp.asarray(
        [1.0, 1.0, 5.0, 3.0, 4.0])
    rows = jnp.asarray([1.0, 1.0, 0.0, 1.0]) if weighted == "cls+rows" \
        else None
    one_hot = one_hot_with_ignore(labels, nc)
    if focal:
        main_ref = losses.focal_loss(logits, labels, cls_w, nc,
                                     sample_weights=rows)
    else:
        main_ref = losses.cross_entropy_loss(logits, labels, cls_w, nc,
                                             sample_weights=rows)
    total_ref = main_ref
    if dice:
        total_ref = total_ref + losses.dice_loss(logits, one_hot,
                                                 sample_weights=rows)
    fs_ref = losses.f_score(logits, one_hot, sample_weights=rows)

    total, main, fs = losses.seg_loss_bundle(
        logits, labels, cls_w, nc, focal=focal, dice=dice,
        sample_weights=rows)
    np.testing.assert_allclose(np.asarray(main), np.asarray(main_ref),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(total), np.asarray(total_ref),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fs_ref),
                               rtol=2e-5, atol=1e-7)


def test_seg_loss_bundle_grad_matches_composition():
    """Gradients through the bundle (the train path) must match gradients
    through the separate-function composition."""
    rng = np.random.default_rng(3)
    nc = 4
    logits = jnp.asarray(rng.normal(size=(2, 5, 5, nc)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, nc + 1, (2, 5, 5)).astype(np.int32))
    cls_w = jnp.asarray([1.0, 2.0, 0.5, 1.5])

    def ref_total(lg):
        oh = one_hot_with_ignore(labels, nc)
        return (losses.focal_loss(lg, labels, cls_w, nc) +
                losses.dice_loss(lg, oh))

    def bundle_total(lg):
        return losses.seg_loss_bundle(lg, labels, cls_w, nc)[0]

    g_ref = jax.grad(ref_total)(logits)
    g_new = jax.grad(bundle_total)(logits)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_seg_loss_bundle_resize_matches_model_resize():
    """apply(resize_logits=False) + bundle(resize_to=HW) must equal the
    default full-res logits fed through the separate-loss composition —
    the class-major in-bundle upsample is the model's own x4 bilinear."""
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train import seg_trainer as T
    cfg = SegTrainConfig(
        data=SegDataConfig(input_shape=(64, 64), num_classes=5),
        backbone="mobilenet", dtype="float32")
    state = T.create_state(cfg, jax.random.PRNGKey(0))
    model = T.build_model(cfg)
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 6, (2, 64, 64)).astype(np.int32))
    vars_ = {"params": state.params, "batch_stats": state.batch_stats}

    full = model.apply(vars_, images, train=False)
    assert full.shape == (2, 64, 64, 5)
    one_hot = one_hot_with_ignore(labels, 5)
    total_ref, main_ref = T.seg_loss_fn(cfg, full, labels, one_hot)
    fs_ref = losses.f_score(full, one_hot)

    quarter = model.apply(vars_, images, train=False, resize_logits=False)
    assert quarter.shape[1] < 64 and quarter.dtype == jnp.float32
    total, main, fs = T.seg_loss_bundle_fn(cfg, quarter, labels,
                                           resize_to=(64, 64))
    np.testing.assert_allclose(np.asarray(total), np.asarray(total_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(main), np.asarray(main_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fs_ref),
                               rtol=2e-5, atol=1e-6)

    # eval path: class-major argmax preds == argmax of the full-res logits
    t2, _, f2, preds = losses.seg_loss_bundle(
        quarter, labels, jnp.asarray(cfg.cls_weights, jnp.float32), 5,
        resize_to=(64, 64), return_preds=True)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(total_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(preds),
                                  np.argmax(np.asarray(full), axis=-1))


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
