"""Augmentation kernel tests, golden-checked against OpenCV where the
reference used it (dataloader.py:55-154)."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from cervical_tpu.ops import augment as A


def _rand_img(rng, h=32, w=32):
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_rgb_hsv_matches_cv2():
    rng = np.random.default_rng(0)
    img = _rand_img(rng)
    ours = np.asarray(A.rgb_to_hsv_cv2(jnp.asarray(img, jnp.float32)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    # hue wraps at 180; compare circularly
    dh = np.abs(ours[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert dh.max() <= 1.0 + 1e-3
    assert np.abs(ours[..., 1] - ref[..., 1]).max() <= 1.0 + 1e-3
    np.testing.assert_allclose(ours[..., 2], ref[..., 2], atol=1e-3)


def test_hsv_roundtrip_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(_rand_img(rng), jnp.float32)
    back = A.hsv_to_rgb_cv2(A.rgb_to_hsv_cv2(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=0.5)


def test_hsv_jitter_unit_gains_near_identity():
    rng = np.random.default_rng(2)
    img = jnp.asarray(_rand_img(rng), jnp.float32)
    out = A.hsv_jitter(img, jnp.ones(3))
    # the reference also routes through quantized uint8 HSV, so identity gains
    # still cost a few counts (hue is stored at 2-degree resolution)
    assert np.abs(np.asarray(out) - np.asarray(img)).max() <= 8.0
    assert np.abs(np.asarray(out) - np.asarray(img)).mean() <= 1.0


def test_hsv_jitter_matches_cv2_lut():
    rng = np.random.default_rng(3)
    img = _rand_img(rng, 24, 24)
    r = np.array([1.05, 0.8, 1.2], np.float64)

    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    hch, sch, vch = cv2.split(hsv)
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(img.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
    ref = cv2.merge((cv2.LUT(hch, lut_hue), cv2.LUT(sch, lut_sat),
                     cv2.LUT(vch, lut_val)))
    ref = cv2.cvtColor(ref, cv2.COLOR_HSV2RGB).astype(np.float32)

    ours = np.asarray(A.hsv_jitter(jnp.asarray(img, jnp.float32), jnp.asarray(r)))
    # int rounding in HSV conversion differs by a few counts per channel
    assert np.abs(ours - ref).mean() < 2.0
    assert np.median(np.abs(ours - ref)) <= 2.0


def test_gaussian_blur_matches_cv2():
    rng = np.random.default_rng(4)
    img = _rand_img(rng, 40, 40).astype(np.float32)
    ref = cv2.GaussianBlur(img, (5, 5), 0)
    ours = np.asarray(A.gaussian_blur(jnp.asarray(img)[None])[0])
    np.testing.assert_allclose(ours, ref, atol=0.51)


def test_letterbox_warp_matches_letterbox_image():
    """The deterministic warp path must reproduce the eval letterbox."""
    from cervical_tpu.ops.image import letterbox_image
    rng = np.random.default_rng(5)
    img = _rand_img(rng, 40, 60)
    lbl = rng.integers(0, 5, size=(40, 60)).astype(np.uint8)
    params = A.letterbox_params_like(1, (40, 60), (32, 32))
    out_img, out_lbl = A.augment_batch(
        jnp.asarray(img)[None], jnp.asarray(lbl)[None], params, (32, 32),
        letterbox=True)
    ref = np.asarray(letterbox_image(jnp.asarray(img), (32, 32)))
    got = np.asarray(out_img[0])
    # top/bottom gray bars in the same place
    assert np.all(got[0] == 128.0) and np.all(ref[0] == 128.0)
    # content region correlates strongly (bilinear half-pixel details differ)
    mid = slice(8, 24)
    c = np.corrcoef(got[mid].ravel(), ref[mid].ravel())[0, 1]
    assert c > 0.98
    assert set(np.unique(np.asarray(out_lbl))) <= set(range(5))


def test_flip_only():
    rng = np.random.default_rng(6)
    img = _rand_img(rng, 16, 16)
    lbl = rng.integers(0, 5, size=(16, 16)).astype(np.uint8)
    params = A.letterbox_params_like(1, (16, 16), (16, 16))
    params = dict(params, flip=jnp.array([True]))
    out_img, out_lbl = A.augment_batch(
        jnp.asarray(img)[None], jnp.asarray(lbl)[None], params, (16, 16),
        letterbox=True)
    np.testing.assert_allclose(np.asarray(out_img[0]), img[:, ::-1].astype(np.float32),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_lbl[0]), lbl[:, ::-1])


def test_identity_warp_exact():
    rng = np.random.default_rng(7)
    img = _rand_img(rng, 16, 16)
    lbl = rng.integers(0, 5, size=(16, 16)).astype(np.uint8)
    params = A.letterbox_params_like(1, (16, 16), (16, 16))
    out_img, out_lbl = A.augment_batch(
        jnp.asarray(img)[None], jnp.asarray(lbl)[None], params, (16, 16),
        letterbox=True)
    np.testing.assert_allclose(np.asarray(out_img[0]), img.astype(np.float32), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_lbl[0]), lbl)


def test_rotation_keeps_center_fills_corners():
    img = np.full((33, 33, 3), 255, np.uint8)
    lbl = np.ones((33, 33), np.uint8)
    params = A.letterbox_params_like(1, (33, 33), (33, 33))
    params = dict(params, angle=jnp.array([45.0]))
    out_img, out_lbl = A.augment_batch(
        jnp.asarray(img)[None], jnp.asarray(lbl)[None], params, (33, 33),
        letterbox=True)
    got = np.asarray(out_img[0])
    assert np.allclose(got[16, 16], 255.0, atol=1e-2)  # center preserved
    assert np.allclose(got[0, 0], 128.0)               # corner -> gray fill
    assert np.asarray(out_lbl[0])[0, 0] == 0           # label fill 0


def test_random_augment_batch_shapes_and_determinism():
    rng = np.random.default_rng(8)
    imgs = jnp.asarray(rng.integers(0, 256, size=(4, 48, 48, 3)), jnp.uint8)
    lbls = jnp.asarray(rng.integers(0, 5, size=(4, 48, 48)), jnp.uint8)
    params = A.sample_augment_params(jax.random.PRNGKey(0), 4)
    o1 = A.augment_batch(imgs, lbls, params, (32, 32))
    o2 = A.augment_batch(imgs, lbls, params, (32, 32))
    assert o1[0].shape == (4, 32, 32, 3)
    assert o1[1].shape == (4, 32, 32)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
    assert np.asarray(o1[0]).min() >= 0 and np.asarray(o1[0]).max() <= 255
    # different key -> different augmentation
    p2 = A.sample_augment_params(jax.random.PRNGKey(1), 4)
    o3 = A.augment_batch(imgs, lbls, p2, (32, 32))
    assert not np.allclose(np.asarray(o1[0]), np.asarray(o3[0]))


def test_scale_range_covers_reference():
    params = A.sample_augment_params(jax.random.PRNGKey(0), 512)
    s = np.asarray(params["scale"])
    assert s.min() >= 0.25 and s.max() <= 2.0
    ang = np.asarray(params["angle"])
    assert ang.min() >= -10 and ang.max() <= 10
    g = np.asarray(params["gains"])
    assert g[:, 0].min() >= 0.9 and g[:, 0].max() <= 1.1


def test_gaussian_blur_einsum_matches_conv():
    import jax.numpy as jnp
    from cervical_tpu.ops import augment as A
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, 256, (3, 40, 40, 3)), jnp.float32)
    conv = np.asarray(A.gaussian_blur(x))
    eins = np.asarray(A.gaussian_blur_einsum(x))
    np.testing.assert_allclose(eins, conv, atol=5e-3, rtol=0)
    # bf16 path (the production dtype): within 1 uint8 count
    xb = x.astype(jnp.bfloat16)
    eb = np.asarray(A.gaussian_blur_einsum(xb), np.float32)
    np.testing.assert_allclose(eb, conv, atol=1.0, rtol=0)


def test_hsv_jitter_batched_fast_matches_ladder():
    """The closed-form reconstruction (``v - c*clip(min(k,4-k),0,1)``) must
    match the reference-shaped 6-sector select ladder to within the bf16
    output rounding (0.5 counts) — including identity gains and the
    degenerate gray/black pixels the ladder special-cases."""
    import jax
    import jax.numpy as jnp
    from cervical_tpu.ops import augment as A
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.integers(0, 256, (12, 48, 48, 3)), jnp.float32)
    # force degenerate pixels: gray (delta == 0) and black (v == 0)
    x = x.at[:, 0, :4].set(77.0).at[:, 1, :4].set(0.0)
    for gains in (jnp.ones((12, 3), jnp.float32),
                  jnp.asarray(1.0 + rng.uniform(-0.5, 0.5, (12, 3)),
                              jnp.float32)):
        ref = np.asarray(A.hsv_jitter_batched(x, gains))
        fast = np.asarray(A.hsv_jitter_batched_fast(x, gains), np.float32)
        assert np.abs(ref - fast).max() <= 0.51
    # the scale fold: scale=1/255 equals scaling afterwards (1 bf16 ulp)
    g = jnp.ones((12, 3), jnp.float32)
    a = np.asarray(A.hsv_jitter_batched_fast(x, g, scale=1.0 / 255.0),
                   np.float32)
    b = np.asarray(A.hsv_jitter_batched_fast(x, g), np.float32) / 255.0
    np.testing.assert_allclose(a, b, atol=4e-3, rtol=0)
