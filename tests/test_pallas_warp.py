"""Pallas warp kernels vs. the gather reference implementation (interpret
mode on CPU).  The gather path (ops/augment.py) is the semantics oracle; the
pallas path must agree up to bf16 quantization and resampling-path
differences at sharp edges."""

import numpy as np
import jax
import jax.numpy as jnp

from cervical_tpu.ops import augment as A
from cervical_tpu.ops import pallas_warp as PW

B, S = 4, 64


def _data(seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (B, S, S)), jnp.uint8)
    return images, labels


def test_identity_exact():
    images, labels = _data()
    p = A.letterbox_params_like(B, (S, S), (S, S))
    out_i, out_l = PW.augment_batch_pallas(images, labels, p, (S, S),
                                           letterbox=True, interpret=True,
                                           normalized=False)
    ref_i, ref_l = A.augment_batch(images, labels, p, (S, S), letterbox=True)
    assert np.abs(np.asarray(out_i, np.float32) - np.asarray(ref_i)).max() == 0
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(ref_l))


def test_scale_flip_paste_close():
    images, labels = _data(1)
    p = dict(A.sample_augment_params(jax.random.PRNGKey(1), B))
    p["angle"] = jnp.zeros(B)
    p["blur"] = jnp.zeros(B, bool)
    out_i, out_l = PW.augment_batch_pallas(images, labels, p, (S, S),
                                           interpret=True, normalized=False)
    ref_i, ref_l = A.augment_batch(images, labels, p, (S, S))
    d = np.abs(np.asarray(out_i, np.float32) - np.asarray(ref_i))
    assert d.mean() < 1.0
    assert (np.asarray(out_l) != np.asarray(ref_l)).mean() < 0.01


def test_rotation_geometry_on_ramp():
    """Bilinear is exact on linear images, so interior agreement on a ramp
    proves the shear pipeline implements the same rotation map."""
    yy, xx = np.mgrid[:S, :S]
    ramp = np.stack([xx, yy, (xx + yy) / 2], -1).astype(np.float32) * 2
    images = jnp.asarray(np.tile(ramp[None], (B, 1, 1, 1)))
    labels = jnp.asarray((xx[None].repeat(B, 0) // 8).astype(np.uint8))
    p = dict(A.letterbox_params_like(B, (S, S), (S, S)))
    p["angle"] = jnp.array([3.0, -7.0, 10.0, 0.0])
    out_i, out_l = PW.augment_batch_pallas(images, labels, p, (S, S),
                                           letterbox=True, interpret=True,
                                           normalized=False)
    ref_i, ref_l = A.augment_batch(images, labels, p, (S, S), letterbox=True)
    m = slice(12, 52)
    d = np.abs(np.asarray(out_i, np.float32)[:, m, m] -
               np.asarray(ref_i)[:, m, m])
    assert d.max() < 1.0  # bf16 quantization only
    mism = (np.asarray(out_l)[:, m, m] != np.asarray(ref_l)[:, m, m]).mean()
    assert mism < 0.08  # nearest ties on band boundaries


def test_rotation_fills_corners():
    images = jnp.full((1, S, S, 3), 255, jnp.uint8)
    labels = jnp.ones((1, S, S), jnp.uint8)
    p = dict(A.letterbox_params_like(1, (S, S), (S, S)))
    p["angle"] = jnp.array([10.0])
    out_i, out_l = PW.augment_batch_pallas(images, labels, p, (S, S),
                                           letterbox=True, interpret=True,
                                           normalized=False)
    got = np.asarray(out_i[0], np.float32)
    assert np.allclose(got[S // 2, S // 2], 255.0, atol=2.0)
    assert np.allclose(got[0, 0], 128.0, atol=1.0)
    assert int(out_l[0, 0, 0]) == 0


def test_photometric_matches_xla_path():
    images, _ = _data(2)
    planar = jnp.transpose(images, (0, 3, 1, 2)).astype(jnp.float32)
    gains = jnp.asarray(np.random.default_rng(3).uniform(
        0.8, 1.2, (B, 3)).astype(np.float32))
    blur = jnp.array([True, False, True, False])
    out = PW.photometric(planar, gains, blur, interpret=True,
                         out_dtype=jnp.float32)
    out = np.transpose(np.asarray(out), (0, 2, 3, 1)) * 255.0

    # reference order: blur (dataloader.py:118) BEFORE the HSV jitter (:137)
    src = images.astype(jnp.float32)
    src_blur = np.asarray(A.gaussian_blur(src))
    src = np.where(np.asarray(blur)[:, None, None, None], src_blur,
                   np.asarray(src))
    ref = np.asarray(jax.vmap(A.hsv_jitter)(jnp.asarray(src), gains))
    # interiors agree; borders differ by the reflect approximation
    m = slice(3, S - 3)
    d = np.abs(out[:, m, m] - ref[:, m, m])
    assert np.median(d) < 2.0
    assert d.mean() < 3.0


def test_nonsquare_source_letterbox():
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.integers(0, 256, (B, 40, 64, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (B, 40, 64)), jnp.uint8)
    p = A.letterbox_params_like(B, (40, 64), (S, S))
    out_i, out_l = PW.augment_batch_pallas(images, labels, p, (S, S),
                                           letterbox=True, interpret=True,
                                           normalized=False)
    ref_i, ref_l = A.augment_batch(images, labels, p, (S, S), letterbox=True)
    got, ref = np.asarray(out_i, np.float32), np.asarray(ref_i)
    # gray bars in the same rows
    bar = np.all(ref == 128.0, axis=-1)
    assert np.abs(got[bar] - 128.0).max() < 1.0
    d = np.abs(got - ref)
    assert d.mean() < 2.0


def test_fused_matches_two_kernel_path():
    """The fused warp+photometric kernel (one pallas_call, predicated
    rotation/blur) must track the two-kernel formulation; residuals are
    only the bf16 staging the two-kernel path does between kernels."""
    images, labels = _data(7)
    params = A.sample_augment_params(jax.random.PRNGKey(9), B,
                                     rotate_prefix=B // 2, blur_suffix=B // 2)
    fi, fl = PW.augment_batch_pallas(images, labels, params, (S, S),
                                     interpret=True, normalized=False,
                                     fused=True)
    ui, ul = PW.augment_batch_pallas(images, labels, params, (S, S),
                                     interpret=True, normalized=False,
                                     fused=False)
    d = np.abs(np.asarray(fi, np.float32) - np.asarray(ui, np.float32))
    assert d.mean() < 1.0
    assert (d > 4.0).mean() < 0.01
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(ul))


def test_full_params_matches_einsum_backend():
    """Full stochastic params (scale+flip+paste+rotation+HSV+blur) — the
    pallas path must track the production einsum backend (itself golden-
    tested against the oracle) tightly: both implement the exact Paeth
    3-shear, so residuals are bf16/interp-path noise at region edges.
    This is the bench.py headline configuration (round-2 promotion)."""
    from cervical_tpu.ops import warp_xla as WX
    images, labels = _data(5)
    params = A.sample_augment_params(jax.random.PRNGKey(3), B,
                                     rotate_prefix=B, blur_suffix=B)
    ei, el = WX.augment_batch_einsum(images, labels, params, (S, S),
                                     rotate_capacity=0, blur_capacity=0,
                                     two_shear=False, normalized=False)
    pi, pl = PW.augment_batch_pallas(images, labels, params, (S, S),
                                     interpret=True, normalized=False)
    d = np.abs(np.asarray(ei, np.float32) - np.asarray(pi, np.float32))
    assert d.mean() < 1.0
    assert (d > 4.0).mean() < 0.01
    assert (np.asarray(el) != np.asarray(pl)).mean() < 0.01


def test_blur_capacity_split_matches_select():
    """blur_capacity=K (blur on the fixed batch suffix via specialized
    "none"/"all" photometric calls) must be bit-identical to the
    flag-select formulation when the flags are exactly the suffix."""
    images, labels = _data(17)
    cap = B // 2
    params = A.sample_augment_params(jax.random.PRNGKey(21), B,
                                     rotate_prefix=B // 2, blur_suffix=cap)
    si, sl = PW.augment_batch_pallas(images, labels, params, (S, S),
                                     interpret=True)
    ci, cl = PW.augment_batch_pallas(images, labels, params, (S, S),
                                     interpret=True, blur_capacity=cap)
    np.testing.assert_array_equal(np.asarray(si, np.float32),
                                  np.asarray(ci, np.float32))
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(cl))
    # degenerate capacities collapse to single specialized calls
    p_all = dict(params)
    p_all["blur"] = jnp.ones(B, bool)
    ai, _ = PW.augment_batch_pallas(images, labels, p_all, (S, S),
                                    interpret=True, blur_capacity=B)
    ri, _ = PW.augment_batch_pallas(images, labels, p_all, (S, S),
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(ai, np.float32),
                                  np.asarray(ri, np.float32))
    p_none = dict(params)
    p_none["blur"] = jnp.zeros(B, bool)
    zi, _ = PW.augment_batch_pallas(images, labels, p_none, (S, S),
                                    interpret=True, blur_capacity=0)
    wi, _ = PW.augment_batch_pallas(images, labels, p_none, (S, S),
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(zi, np.float32),
                                  np.asarray(wi, np.float32))


def test_planar_input_matches_nhwc():
    """planar=True consumes the native loader's (B, 3, H, W) layout and
    must produce bit-identical output to the NHWC path."""
    images, labels = _data(11)
    params = A.sample_augment_params(jax.random.PRNGKey(13), B,
                                     rotate_prefix=B // 2, blur_suffix=B // 2)
    ni, nl = PW.augment_batch_pallas(images, labels, params, (S, S),
                                     interpret=True)
    pi, pl_ = PW.augment_batch_pallas(jnp.transpose(images, (0, 3, 1, 2)),
                                      labels, params, (S, S),
                                      interpret=True, planar=True)
    np.testing.assert_array_equal(np.asarray(ni, np.float32),
                                  np.asarray(pi, np.float32))
    np.testing.assert_array_equal(np.asarray(nl), np.asarray(pl_))


def test_vmem_budget_env_scale(monkeypatch):
    """CERVICAL_PALLAS_VMEM_SCALE multiplies the declared scoped-vmem
    budgets (bench.py's drift-recovery retry knob)."""
    monkeypatch.delenv("CERVICAL_PALLAS_VMEM_SCALE", raising=False)
    assert PW._vmem_budget(32) == 32 * 2**20
    monkeypatch.setenv("CERVICAL_PALLAS_VMEM_SCALE", "2")
    assert PW._vmem_budget(32) == 64 * 2**20
    monkeypatch.setenv("CERVICAL_PALLAS_VMEM_SCALE", "1.5")
    assert PW._vmem_budget(32) == 48 * 2**20


def test_warp_images_u8_output_is_rounded_bf16():
    """out_dtype=uint8 must equal clip(round(.), 0, 255) of the bf16
    output — the rounding happens at the store, nothing else changes."""
    images, _ = _data(17)
    params = A.sample_augment_params(jax.random.PRNGKey(21), B,
                                     rotate_prefix=B // 2)
    wp = PW.make_warp_params(params, (S, S), (S, S))
    planar = jnp.transpose(images, (0, 3, 1, 2))
    bf = PW.warp_images(planar, wp, out_size=S, interpret=True)
    u8 = PW.warp_images(planar, wp, out_size=S, interpret=True,
                        out_dtype=jnp.uint8)
    expect = np.clip(np.round(np.asarray(bf, np.float32)), 0, 255) \
        .astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(u8), expect)


def test_photometric_u8_input_matches_rounded_float():
    """The photometric kernel on uint8 planes must equal the float path
    fed the same integer values."""
    images, _ = _data(18)
    planar_u8 = jnp.transpose(images, (0, 3, 1, 2))
    planar_f = planar_u8.astype(jnp.float32)
    gains = jnp.asarray(np.random.default_rng(19).uniform(
        0.8, 1.2, (B, 3)).astype(np.float32))
    blur = jnp.array([True, False, True, False])
    out_u8 = PW.photometric(planar_u8, gains, blur, interpret=True,
                            out_dtype=jnp.float32)
    out_f = PW.photometric(planar_f, gains, blur, interpret=True,
                           out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out_u8), np.asarray(out_f))


def test_carry_u8_end_to_end():
    """carry_u8=True: labels identical, images within one uint8 rounding
    step of the bf16-carry pipeline away from hue-sector boundaries (the
    rounding can flip argmax(R,G,B) for near-equal channels)."""
    images, labels = _data(19)
    params = A.sample_augment_params(jax.random.PRNGKey(23), B,
                                     rotate_prefix=B // 2, blur_suffix=B // 2)
    fi, fl = PW.augment_batch_pallas(images, labels, params, (S, S),
                                     interpret=True, normalized=False)
    ui, ul = PW.augment_batch_pallas(images, labels, params, (S, S),
                                     interpret=True, normalized=False,
                                     carry_u8=True)
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(ul))
    d = np.abs(np.asarray(ui, np.float32) - np.asarray(fi, np.float32))
    assert np.median(d) <= 1.0
    assert (d > 16.0).mean() < 0.02  # rare hue-sector flips only
