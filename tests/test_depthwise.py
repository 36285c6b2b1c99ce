"""Shift-based depthwise conv vs XLA grouped-conv reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cervical_tpu.ops.depthwise import (depthwise_conv3x3,
                                        depthwise_conv3x3_reference)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_matches_grouped_conv(stride, dilation):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 8)).astype(np.float32))
    a = depthwise_conv3x3(x, k, stride, dilation)
    b = depthwise_conv3x3_reference(x, k, stride, dilation)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 4)).astype(np.float32))
    ga = jax.grad(lambda a, b: depthwise_conv3x3(a, b).sum(), (0, 1))(x, k)
    gb = jax.grad(lambda a, b: depthwise_conv3x3_reference(a, b).sum(),
                  (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=1e-5)


def test_backbone_param_layout_unchanged():
    """Torch import depends on the (3,3,1,C) kernel under .../depthwise."""
    from cervical_tpu.models.backbones.xception import XceptionBlock
    blk = XceptionBlock(16)
    v = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))
    k = v["params"]["sepconv1"]["depthwise"]["kernel"]
    assert k.shape == (3, 3, 1, 8)
