"""Einsum conv (ops/conv.py) vs flax nn.Conv — exact drop-in checks.

Covers every (kernel, stride, dilation, padding, bias) combination the
model zoo instantiates (grep `nn.Conv(` before the swap): 1x1 SAME s1/s2,
3x3 pad1 s1/s2, dilated 3x3 (ASPP rates), 7x7 pad3 s2 (ResNet stem)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from cervical_tpu.ops import conv as C


CASES = [
    # (kernel, stride, dilation, padding, use_bias)
    (1, 1, 1, "SAME", False),
    (1, 2, 1, "SAME", False),   # xception skip / resnet downsample
    (1, 1, 1, "SAME", True),    # deeplab cls_conv
    (3, 1, 1, 1, False),
    (3, 2, 1, 1, False),        # stems
    (3, 1, 6, 6, False),        # ASPP rate-6 branch
    (3, 1, 2, 2, False),        # os8 dilation
    (7, 2, 1, 3, False),        # resnet conv1
]


@pytest.mark.parametrize("k,s,d,p,bias", CASES)
def test_matches_nn_conv(k, s, d, p, bias):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 23, 5))
    ref = nn.Conv(7, (k, k), strides=s, padding=p, kernel_dilation=d,
                  use_bias=bias)
    mine = C.Conv(7, (k, k), strides=s, padding=p, kernel_dilation=d,
                  use_bias=bias, backend="einsum")
    params = ref.init(jax.random.PRNGKey(1), x)
    out_ref = ref.apply(params, x)
    out_mine = mine.apply(params, x)  # identical param tree by construction
    assert out_mine.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out_mine), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def test_param_tree_matches_nn_conv():
    x = jnp.zeros((1, 8, 8, 3))
    ref = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype),
        nn.Conv(4, (3, 3), padding=1).init(jax.random.PRNGKey(0), x))
    mine = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype),
        C.Conv(4, (3, 3), padding=1).init(jax.random.PRNGKey(0), x))
    assert ref == mine


def test_init_matches_nn_conv_exactly():
    """Same initializers + same param shapes -> bit-identical init."""
    x = jnp.zeros((1, 8, 8, 3))
    ref = nn.Conv(4, (3, 3), padding=1).init(jax.random.PRNGKey(7), x)
    mine = C.Conv(4, (3, 3), padding=1).init(jax.random.PRNGKey(7), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), ref, mine)


def test_gradients_match_nn_conv():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 9, 4))
    ref = nn.Conv(6, (3, 3), strides=2, padding=1, use_bias=True)
    mine = C.Conv(6, (3, 3), strides=2, padding=1, use_bias=True,
                  backend="einsum")
    params = ref.init(jax.random.PRNGKey(3), x)

    g_ref = jax.grad(lambda p, x: ref.apply(p, x).sum(), argnums=(0, 1))(
        params, x)
    g_mine = jax.grad(lambda p, x: mine.apply(p, x).sum(), argnums=(0, 1))(
        params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_ref, g_mine)


def test_backend_switch():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 12, 12, 3))
    lax_conv = C.Conv(5, (3, 3), padding=1, backend="lax")
    einsum_conv = C.Conv(5, (3, 3), padding=1, backend="einsum")
    params = lax_conv.init(jax.random.PRNGKey(5), x)
    np.testing.assert_allclose(np.asarray(einsum_conv.apply(params, x)),
                               np.asarray(lax_conv.apply(params, x)),
                               atol=1e-5, rtol=1e-5)
    assert C.get_default_backend() == "lax"
    try:
        C.set_default_backend("einsum")
        assert C.get_default_backend() == "einsum"
    finally:
        C.set_default_backend("lax")
    with pytest.raises(ValueError):
        C.set_default_backend("cudnn")


def test_bf16_compute_fp32_params():
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 3))
    mine = C.Conv(4, (1, 1), dtype=jnp.bfloat16)
    params = mine.init(jax.random.PRNGKey(7), x)
    assert params["params"]["kernel"].dtype == jnp.float32
    assert mine.apply(params, x).dtype == jnp.bfloat16


def test_backend_scope_restores():
    assert C.get_default_backend() == "lax"
    with C.backend_scope("einsum"):
        assert C.get_default_backend() == "einsum"
    assert C.get_default_backend() == "lax"
    try:
        with C.backend_scope("einsum"):
            raise RuntimeError
    except RuntimeError:
        pass
    assert C.get_default_backend() == "lax"
    with pytest.raises(ValueError):
        with C.backend_scope("tensorrt"):
            pass


@pytest.mark.parametrize("pad", [(1, 2), ((0, 1), (2, 0))])
def test_sequence_padding_matches_nn_conv(pad):
    """Per-dim int and (lo, hi)-pair padding forms (nn.Conv semantics)."""
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 11, 13, 3))
    ref = nn.Conv(4, (3, 3), padding=pad)
    params = ref.init(jax.random.PRNGKey(10), x)
    for backend in ("lax", "einsum"):
        mine = C.Conv(4, (3, 3), padding=pad, backend=backend)
        out = mine.apply(params, x)
        ref_out = ref.apply(params, x)
        assert out.shape == ref_out.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-5, rtol=1e-5)
