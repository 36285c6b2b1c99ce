"""DeepLabV3+ model tests: shapes, jit, backbones, output strides
(reference: nets/deeplabv3_plus.py, nets/xception.py, nets/mobilenetv2.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cervical_tpu.models.deeplab import DeepLab
from cervical_tpu.models.backbones import MobileNetV2Backbone, XceptionBackbone


@pytest.mark.slow
def test_mobilenet_backbone_feature_shapes():
    bb = MobileNetV2Backbone(downsample_factor=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    low, high = bb.apply(vars_, x)
    assert low.shape == (1, 16, 16, 24)   # os4, 24 channels
    assert high.shape == (1, 4, 4, 320)   # os16, 320 channels


def test_mobilenet_backbone_os8():
    bb = MobileNetV2Backbone(downsample_factor=8)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    low, high = bb.apply(vars_, x)
    assert low.shape == (1, 16, 16, 24)
    assert high.shape == (1, 8, 8, 320)   # os8 via dilation


@pytest.mark.slow
def test_xception_backbone_feature_shapes():
    bb = XceptionBackbone(downsample_factor=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    low, high = bb.apply(vars_, x)
    assert low.shape == (1, 16, 16, 256)  # os4, 256 channels
    assert high.shape == (1, 4, 4, 2048)


@pytest.mark.parametrize("backbone", ["mobilenet"])
def test_deeplab_logits_shape(backbone):
    model = DeepLab(num_classes=5, backbone=backbone)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (2, 64, 64, 5)
    assert y.dtype == jnp.float32


@pytest.mark.slow
def test_deeplab_train_mode_updates_batch_stats():
    model = DeepLab(num_classes=5, backbone="mobilenet")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y, updates = model.apply(vars_, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in updates
    # some running mean must have moved off zero
    leaf = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert np.abs(np.asarray(leaf)).sum() > 0


@pytest.mark.slow
def test_deeplab_jit_forward():
    model = DeepLab(num_classes=5, backbone="mobilenet")
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = jax.jit(lambda v, a: model.apply(v, a))(vars_, x)
    assert y.shape == (1, 32, 32, 5)


@pytest.mark.slow
def test_deeplab_bf16_compute():
    model = DeepLab(num_classes=5, backbone="mobilenet", dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.dtype == jnp.float32  # logits promoted for the loss
    assert np.isfinite(np.asarray(y)).all()
