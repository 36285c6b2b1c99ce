"""Einsum/barrel warp backend vs. the gather oracle (ops/warp_xla.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from cervical_tpu.ops import augment as A
from cervical_tpu.ops import warp_xla as WX

B, S = 4, 64


def _data(seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.uint8),
            jnp.asarray(rng.integers(0, 5, (B, S, S)), jnp.uint8))


def test_identity_letterbox_exact():
    images, labels = _data()
    p = A.letterbox_params_like(B, (S, S), (S, S))
    oi, ol = WX.augment_batch_einsum(images, labels, p, (S, S),
                                     letterbox=True, normalized=False)
    ri, rl = A.augment_batch(images, labels, p, (S, S), letterbox=True)
    assert np.abs(np.asarray(oi, np.float32) - np.asarray(ri)).max() == 0
    np.testing.assert_array_equal(np.asarray(ol), np.asarray(rl))


def test_scale_flip_paste_close():
    images, labels = _data(1)
    p = dict(A.sample_augment_params(jax.random.PRNGKey(1), B))
    p["angle"] = jnp.zeros(B)
    p["blur"] = jnp.zeros(B, bool)
    oi, ol = WX.augment_batch_einsum(images, labels, p, (S, S),
                                     normalized=False)
    ri, rl = A.augment_batch(images, labels, p, (S, S))
    d = np.abs(np.asarray(oi, np.float32) - np.asarray(ri))
    assert d.mean() < 1.0
    assert (np.asarray(ol) != np.asarray(rl)).mean() < 0.01


def test_rotation_geometry_on_ramp():
    yy, xx = np.mgrid[:S, :S]
    ramp = np.stack([xx, yy, (xx + yy) / 2], -1).astype(np.float32) * 2
    images = jnp.asarray(np.tile(ramp[None], (B, 1, 1, 1)))
    labels = jnp.asarray((xx[None].repeat(B, 0) // 8).astype(np.uint8))
    p = dict(A.letterbox_params_like(B, (S, S), (S, S)))
    p["angle"] = jnp.array([3.0, -7.0, 10.0, 0.0])
    p["blur"] = jnp.zeros(B, bool)
    p["gains"] = jnp.ones((B, 3))
    oi, ol = WX.augment_batch_einsum(images, labels, p, (S, S),
                                     normalized=False)
    ri, rl = A.augment_batch(images, labels, p, (S, S), letterbox=True)
    m = slice(12, 52)
    d = np.abs(np.asarray(oi, np.float32)[:, m, m] - np.asarray(ri)[:, m, m])
    assert d.max() < 4.0  # uint8 quantization between shears + hsv round
    mism = (np.asarray(ol)[:, m, m] != np.asarray(rl)[:, m, m]).mean()
    assert mism < 0.08


def test_rotate_capacity_prefix_matches_full():
    images, labels = _data(2)
    p = dict(A.sample_augment_params(jax.random.PRNGKey(3), B,
                                     rotate_prefix=2))
    # neutral photometrics: the full-batch path quantizes zero-angle images
    # to uint8 before the (identity) shears, and HSV hue is chaotically
    # sensitive on near-gray pixels, so only compare the geometric pipeline
    p["gains"] = jnp.ones((B, 3))
    p["blur"] = jnp.zeros(B, bool)
    full = WX.augment_batch_einsum(images, labels, p, (S, S),
                                   normalized=False)
    pref = WX.augment_batch_einsum(images, labels, p, (S, S),
                                   normalized=False, rotate_capacity=2)
    d = np.abs(np.asarray(full[0], np.float32) -
               np.asarray(pref[0], np.float32))
    assert np.median(d) <= 1.0 and d.mean() < 2.0
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(pref[1]))
    # the rotating prefix itself must be identical
    np.testing.assert_allclose(np.asarray(full[0][:2], np.float32),
                               np.asarray(pref[0][:2], np.float32), atol=0.75)


def test_rotate_prefix_sampling():
    p = A.sample_augment_params(jax.random.PRNGKey(0), 16, rotate_prefix=4)
    ang = np.asarray(p["angle"])
    assert np.all(ang[4:] == 0)
    assert np.any(ang[:4] != 0)


def test_normalized_output_range():
    images, labels = _data(3)
    p = A.sample_augment_params(jax.random.PRNGKey(4), B)
    oi, _ = WX.augment_batch_einsum(images, labels, p, (S, S),
                                    normalized=True)
    arr = np.asarray(oi, np.float32)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert oi.dtype == jnp.bfloat16


def test_packed_rotation_bit_exact_with_u8_ladder():
    rng = np.random.default_rng(7)
    planes = jnp.asarray(rng.integers(0, 256, (B, S, S, 4)), jnp.uint8)
    p = A.sample_augment_params(jax.random.PRNGKey(7), B, rotate_prefix=B)
    wp = WX.make_warp_params(p, (S, S), (S, S))
    fill = np.array([128, 128, 128, 0], np.uint8)
    old = WX._rotate_u8(planes, wp, nearest=False, fill_u8=fill,
                        nearest_tail=1)
    new = WX._rotate_packed(planes, wp, fill)
    np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


def test_two_shear_close_on_smooth_content():
    # two-shear is a geometric approximation (~0.5px at 10 deg); on smooth
    # content it must stay within a couple of uint8 counts of the 3-shear
    yy, xx = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    smooth = np.stack([xx * 255 / S, yy * 255 / S,
                       (xx + yy) * 255 / (2 * S)], -1).astype(np.uint8)
    planes = jnp.asarray(np.concatenate(
        [np.broadcast_to(smooth[None], (B, S, S, 3)),
         np.zeros((B, S, S, 1), np.uint8)], -1))
    p = A.sample_augment_params(jax.random.PRNGKey(3), B, rotate_prefix=B)
    wp = WX.make_warp_params(p, (S, S), (S, S))
    fill = np.array([128, 128, 128, 0], np.uint8)
    three = np.asarray(WX._rotate_packed(planes, wp, fill))
    two = np.asarray(WX._rotate_packed(planes, wp, fill, two_shear=True))
    m = slice(S // 4, -S // 4)  # interior, away from fill borders
    d = np.abs(three[:, m, m, :3].astype(int) - two[:, m, m, :3].astype(int))
    assert d.max() <= 3 and d.mean() < 1.0


def test_blur_capacity_matches_masked_full():
    images, labels = _data(5)
    p = dict(A.sample_augment_params(jax.random.PRNGKey(6), B,
                                     rotate_prefix=1, blur_suffix=2))
    full = WX.augment_batch_einsum(images, labels, p, (S, S),
                                   normalized=False, rotate_capacity=1)
    cap = WX.augment_batch_einsum(images, labels, p, (S, S),
                                  normalized=False, rotate_capacity=1,
                                  blur_capacity=2)
    # 1-ulp bf16 slack: XLA fuses the HSV chain differently when its
    # consumer set changes (blur-everything vs blur-the-tail programs)
    np.testing.assert_allclose(np.asarray(full[0], np.float32),
                               np.asarray(cap[0], np.float32), atol=1.0)
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(cap[1]))


def test_piecewise_no_middle_piece():
    """rotate_capacity + blur_capacity == B: the piecewise fast path has no
    middle slice — rotated head and blur tail must still tile the batch."""
    images, labels = _data(7)
    p = dict(A.sample_augment_params(jax.random.PRNGKey(8), B,
                                     rotate_prefix=2, blur_suffix=2))
    full = WX.augment_batch_einsum(images, labels, p, (S, S),
                                   normalized=False, rotate_capacity=2)
    cap = WX.augment_batch_einsum(images, labels, p, (S, S),
                                  normalized=False, rotate_capacity=2,
                                  blur_capacity=2)
    np.testing.assert_allclose(np.asarray(full[0], np.float32),
                               np.asarray(cap[0], np.float32), atol=1.0)
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(cap[1]))


def test_int8_resample_close_to_float():
    """MXU-int8 resample (``int8_resample=True``): labels bit-exact, images
    within the 2-count tap-rounding budget (1/127 tap quantization + one
    extra uint8 midpoint round between the passes)."""
    images, labels = _data(9)
    from cervical_tpu.ops.pallas_warp import make_warp_params, P_FILL
    p = A.sample_augment_params(jax.random.PRNGKey(11), B,
                                rotate_prefix=1, blur_suffix=1)
    wp = make_warp_params(p, (S, S), (S, S))
    fill = wp[:, P_FILL]
    rf = np.asarray(WX._resample(images, wp, S, nearest=False, fill=fill),
                    np.float32)
    rq = np.asarray(WX._resample_int8(images, wp, S, fill=fill), np.float32)
    d = np.abs(rf - rq)
    assert d.max() <= 2.5 and d.mean() < 0.5
    lf = np.round(np.asarray(
        WX._resample(labels[..., None], wp, S, nearest=True,
                     fill=jnp.zeros_like(fill)), np.float32)).astype(np.uint8)
    lq = np.asarray(WX._resample_labels_int8(labels[..., None], wp, S))
    np.testing.assert_array_equal(lf, lq)


def test_int8_resample_full_pipeline():
    """End-to-end ``int8_resample=True`` vs the bf16 path: labels identical,
    image error tiny in the mean (hue-sector flips on near-tie pixels give
    rare large per-pixel deviations, same as the documented bf16-HSV
    effect, so only the mean is budgeted)."""
    images, labels = _data(10)
    p = A.sample_augment_params(jax.random.PRNGKey(12), B,
                                rotate_prefix=1, blur_suffix=1)
    kw = dict(rotate_capacity=1, blur_capacity=1, two_shear=True)
    f = WX.augment_batch_einsum(images, labels, p, (S, S), **kw)
    q = WX.augment_batch_einsum(images, labels, p, (S, S),
                                int8_resample=True, **kw)
    di = np.abs(np.asarray(f[0], np.float32)
                - np.asarray(q[0], np.float32)) * 255.0
    assert di.mean() < 1.0
    np.testing.assert_array_equal(np.asarray(f[1]), np.asarray(q[1]))
