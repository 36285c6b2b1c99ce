"""SegPredictor: render modes, un-letterboxing, export (reference:
deeplab.py:108-302)."""

import numpy as np
import jax
import pytest

from cervical_tpu.config import SegTrainConfig, SegDataConfig
from cervical_tpu.inference.predictor import SegPredictor
from cervical_tpu.train.seg_trainer import SegTrainer


@pytest.fixture(scope="module")
def predictor():
    cfg = SegTrainConfig(
        data=SegDataConfig(input_shape=(32, 32), num_classes=5),
        backbone="mobilenet", dtype="float32", save_dir="/tmp/pred_logs")
    trainer = SegTrainer(cfg)
    return SegPredictor(cfg, trainer.state)


def test_predict_mask_original_resolution(predictor):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 56, 3)).astype(np.uint8)
    mask = predictor.predict_mask(img)
    assert mask.shape == (40, 56)
    assert mask.max() < 5


def test_detect_image_modes(predictor):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    blend = predictor.detect_image(img, mix_type=0)
    mask_only = predictor.detect_image(img, mix_type=1)
    fg = predictor.detect_image(img, mix_type=2)
    assert blend.shape == img.shape and blend.dtype == np.uint8
    assert mask_only.shape == img.shape
    assert fg.shape == img.shape
    with pytest.raises(ValueError):
        predictor.detect_image(img, mix_type=9)


def test_probs_sum_to_one(predictor):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    probs = predictor.predict_probs(img)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=2e-2)


def test_export_stablehlo(predictor, tmp_path):
    path = predictor.export_stablehlo(str(tmp_path / "seg.stablehlo"))
    data = open(path, "rb").read()
    assert len(data) > 1000
    # round-trip: deserialize and run
    from jax import export as jax_export
    import jax.numpy as jnp
    exported = jax_export.deserialize(bytearray(data))
    out = exported.call(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert out.shape == (1, 32, 32, 5)


@pytest.mark.slow
def test_export_savedmodel(predictor, tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = predictor.export_savedmodel(str(tmp_path / "sm"))
    m = tf.saved_model.load(path)
    out = m.f(tf.zeros((1, 32, 32, 3)))
    assert tuple(out.shape) == (1, 32, 32, 5)


def test_update_state_no_stale_weights(predictor):
    """update_state must actually change predictions (state is a jit
    argument, not a traced-in constant)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    p1 = predictor.predict_probs(img)
    state2 = predictor.state.replace(
        params=jax.tree_util.tree_map(
            lambda x: x + 0.05 * (x != 0), predictor.state.params))
    old_state = predictor.state
    predictor.update_state(state2)
    p2 = predictor.predict_probs(img)
    predictor.update_state(old_state)
    assert np.abs(p1 - p2).max() > 1e-6


def test_predict_masks_batched_matches_per_image(predictor):
    """The batched miou pipeline (one jitted program per batch: letterbox
    -> forward -> unletterbox -> argmax) must reproduce the per-image
    get_miou_png masks — including the ragged final batch."""
    rng = np.random.default_rng(7)
    for shape in ((40, 56), (32, 32)):
        imgs = rng.integers(0, 255, (11,) + shape + (3,)).astype(np.uint8)
        masks = predictor.predict_masks(imgs, batch_size=4)
        assert masks.shape == (11,) + shape and masks.dtype == np.uint8
        for i in range(len(imgs)):
            np.testing.assert_array_equal(
                masks[i], predictor.get_miou_png(imgs[i]),
                err_msg=f"shape={shape} image={i}")


def test_predictor_miou_callback_batched_matches_loop(tmp_path):
    """batched=True (shape-bucketed jitted batch programs) and the
    reference-shaped per-image loop must report the same mIoU."""
    from cervical_tpu.data.voc import (VOCSegDataset, make_synthetic_voc,
                                       read_split)
    from cervical_tpu.train.callbacks import PredictorMiouCallback

    root = make_synthetic_voc(str(tmp_path / "voc"), num_images=7, size=32)
    cfg = SegTrainConfig(
        data=SegDataConfig(input_shape=(32, 32), num_classes=5),
        backbone="mobilenet", dtype="float32",
        save_dir=str(tmp_path / "logs"), predictor_eval=True)
    trainer = SegTrainer(cfg)
    ds = VOCSegDataset(root, read_split(root, "val"), stage_hw=(32, 32))
    cb_loop = PredictorMiouCallback(cfg.save_dir, ds, period=1,
                                    batched=False)
    cb_batch = PredictorMiouCallback(cfg.save_dir, ds, period=1,
                                     batched=True, batch_size=4)
    m_loop = cb_loop.run(cfg, trainer.state, 0, log=lambda *a: None)
    m_batch = cb_batch.run(cfg, trainer.state, 0, log=lambda *a: None)
    assert m_batch == pytest.approx(m_loop, abs=1e-12)


def test_predictor_miou_callback(tmp_path):
    """EvalCallback equivalent: full inference path at original resolution
    every period epochs (utils/callbacks.py:105-200)."""
    import os
    from cervical_tpu.data.voc import VOCSegDataset, make_synthetic_voc, read_split
    from cervical_tpu.train.callbacks import PredictorMiouCallback

    root = make_synthetic_voc(str(tmp_path / "voc"), num_images=6, size=32)
    cfg = SegTrainConfig(
        data=SegDataConfig(input_shape=(32, 32), num_classes=5),
        backbone="mobilenet", dtype="float32",
        save_dir=str(tmp_path / "logs"), predictor_eval=True, eval_period=2)
    trainer = SegTrainer(cfg)
    ds = VOCSegDataset(root, read_split(root, "val"), stage_hw=(32, 32))
    cb = PredictorMiouCallback(cfg.save_dir, ds, period=2)
    assert not cb.should_eval(0) and cb.should_eval(1)
    miou = cb.run(cfg, trainer.state, 1, log=lambda *a: None)
    assert 0.0 <= miou <= 1.0
    assert os.path.exists(os.path.join(cfg.save_dir,
                                       "epoch_miou_predictor.txt"))
    # second run reuses the cached predictor with refreshed weights
    miou2 = cb.run(cfg, trainer.state, 3, log=lambda *a: None)
    assert 0.0 <= miou2 <= 1.0


# -- tiled (native-resolution) inference -------------------------------------

def _pixelwise_probs(x):
    """Deterministic per-pixel 'probs' — pixel-local, so any correct tile
    stitching must reproduce the whole-image map exactly."""
    import jax.numpy as jnp
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    ch = jnp.stack([r + 0.1, g + 0.2, b + 0.3, r * g + 0.05, (r + b) / 2], -1)
    return ch / ch.sum(-1, keepdims=True)


@pytest.mark.parametrize("shape", [(100, 75), (32, 32), (20, 45), (64, 64)])
def test_tiled_stitching_reproduces_pixelwise_map(predictor, shape):
    """Overlap blending is a convex combination of per-tile predictions;
    with a pixel-local model every tile agrees, so the tiled output must
    equal the whole-image map for ANY size (larger, equal, smaller than
    the 32x32 tile; odd strides; edge-aligned final tiles)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (*shape, 3)).astype(np.uint8)
    orig = predictor._run
    predictor._run = lambda x: _pixelwise_probs(x)
    try:
        out = predictor.predict_probs_tiled(img, overlap=0.25, batch_size=3)
    finally:
        predictor._run = orig
    expect = np.asarray(_pixelwise_probs(img.astype(np.float32) / 255.0),
                        np.float32)
    assert out.shape == expect.shape
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_tiled_single_tile_matches_direct(predictor):
    """An exactly-tile-sized image: the window normalizes out and the
    tiled path must agree with predict_probs (identity letterbox)."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    np.testing.assert_allclose(predictor.predict_probs_tiled(img),
                               predictor.predict_probs(img), atol=1e-5)


def test_tiled_mask_and_detect(predictor):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (70, 90, 3)).astype(np.uint8)
    mask = predictor.predict_mask_tiled(img)
    assert mask.shape == (70, 90) and mask.max() < 5
    rendered = predictor.detect_image(img, mix_type=1, tiled=True)
    assert rendered.shape == (70, 90, 3) and rendered.dtype == np.uint8
    with pytest.raises(ValueError):
        predictor.predict_probs_tiled(img, overlap=1.0)
