"""Histogram-equalization / multimodal offline-augmentation tests, golden
against cv2 (reference: MultiModal Prediction/data_augmentation.py)."""

import numpy as np
import cv2
import jax.numpy as jnp

from cervical_tpu.ops import histeq as H


def test_ycrcb_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    ours = np.asarray(H.rgb_to_ycrcb(jnp.asarray(img, jnp.float32)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2YCrCb).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_ycrcb_roundtrip():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 256, size=(8, 8, 3)), jnp.float32)
    back = H.ycrcb_to_rgb(H.rgb_to_ycrcb(img))
    assert np.abs(np.asarray(back) - np.asarray(img)).max() <= 1.5


def test_equalize_hist_matches_cv2():
    rng = np.random.default_rng(2)
    # low-contrast channel to make equalization meaningful
    ch = (rng.normal(120, 15, size=(64, 64))).clip(0, 255).astype(np.uint8)
    ref = cv2.equalizeHist(ch).astype(np.float32)
    ours = np.asarray(H.equalize_hist_channel(jnp.asarray(ch, jnp.float32)))
    assert np.abs(ours - ref).max() <= 1.0


def test_equalize_histogram_batch_changes_contrast():
    rng = np.random.default_rng(3)
    imgs = (rng.normal(100, 10, size=(2, 32, 32, 3))).clip(0, 255).astype(np.float32)
    out = np.asarray(H.equalize_histogram_batch(jnp.asarray(imgs)))
    assert out.shape == imgs.shape
    # equalization should stretch the luminance range
    y_in = 0.299 * imgs[..., 0] + 0.587 * imgs[..., 1] + 0.114 * imgs[..., 2]
    y_out = 0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
    assert y_out.std() > 1.5 * y_in.std()


def test_flips():
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.normal(size=(2, 4, 6, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(H.flip_horizontal(imgs)),
                                  np.asarray(imgs)[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(H.flip_vertical(imgs)),
                                  np.asarray(imgs)[:, ::-1])


def test_rotate_batch_matches_cv2():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(33, 33, 3)).astype(np.uint8)
    m = cv2.getRotationMatrix2D((16, 16), 30.0, 1.0)
    ref = cv2.warpAffine(img.astype(np.float32), m, (33, 33))
    ours = np.asarray(H.rotate_batch(jnp.asarray(img, jnp.float32)[None],
                                     jnp.array([30.0]))[0])
    # interior agrees; borders differ by interpolation edge handling
    diff = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4])
    assert np.median(diff) < 2.0


def test_rotate_expand_keeps_content():
    img = np.zeros((40, 40, 3), np.float32)
    img[18:22, :, :] = 255.0  # horizontal bar
    out = np.asarray(H.rotate_expand_batch(jnp.asarray(img)[None],
                                           jnp.array([90.0]), (40, 40))[0])
    # bar becomes vertical, still fully inside the canvas
    col_mass = out[..., 0].sum(axis=0)
    row_mass = out[..., 0].sum(axis=1)
    assert col_mass.max() > 3 * row_mass.max() / 40 * 4  # concentrated in columns
    assert out.sum() > 0.5 * img.sum()


def test_fivefold_augment_shapes():
    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.integers(0, 256, size=(2, 24, 24, 3)), jnp.float32)
    out = H.fivefold_augment(imgs)
    assert out.shape == (5, 2, 24, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_equalize_constant_channel_matches_cv2_identity():
    """cv2.equalizeHist special-cases a single occupied bin (constant
    channel) and returns the input unchanged; the LUT must not collapse a
    uniform frame to black (equalize_hist_channel's cdf_min==total guard)."""
    const = np.full((8, 8), 137, np.uint8)
    ref = cv2.equalizeHist(const)
    np.testing.assert_array_equal(ref, const)  # cv2 oracle
    ours = np.asarray(H.equalize_hist_channel(jnp.asarray(const, jnp.float32)))
    np.testing.assert_allclose(ours, 137.0, atol=0.5)
    gray = np.full((1, 8, 8, 3), 137.0, np.float32)
    out = np.asarray(H.equalize_histogram_batch(jnp.asarray(gray)))
    np.testing.assert_allclose(out, 137.0, atol=1.0)
