"""Torch->flax weight conversion tests: synthetic state dicts with the
reference's key names must land on every matching flax leaf."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cervical_tpu.train import torch_import as TI
from cervical_tpu.models.backbones.mobilenetv2 import (MobileNetV2Backbone,
                                                       INVERTED_RESIDUAL_SETTING)


def _synthetic_mobilenet_sd(variables):
    """Build a torch-style state dict from the flax tree (reverse mapping)."""
    rng = np.random.default_rng(0)
    sd = {}
    p = variables["params"]
    s = variables["batch_stats"]

    def conv_t(kernel):
        return np.transpose(rng.normal(size=np.shape(kernel)).astype(np.float32),
                            (3, 2, 0, 1))

    def add_bn(torch_name, flax_p, flax_s):
        sd[torch_name + ".weight"] = rng.normal(size=flax_p["scale"].shape).astype(np.float32)
        sd[torch_name + ".bias"] = rng.normal(size=flax_p["bias"].shape).astype(np.float32)
        sd[torch_name + ".running_mean"] = rng.normal(size=flax_s["mean"].shape).astype(np.float32)
        sd[torch_name + ".running_var"] = np.abs(rng.normal(size=flax_s["var"].shape)).astype(np.float32) + 1

    sd["features.0.0.weight"] = conv_t(p["stem"]["conv"]["kernel"])
    add_bn("features.0.1", p["stem"]["bn"], s["stem"]["bn"])
    idx = 1
    for t, c, n, _ in INVERTED_RESIDUAL_SETTING:
        for _i in range(n):
            fp = p[f"block{idx}"]
            fs = s[f"block{idx}"]
            tp = f"features.{idx}.conv"
            if t == 1:
                sd[tp + ".0.weight"] = conv_t(fp["depthwise"]["conv"]["kernel"])
                add_bn(tp + ".1", fp["depthwise"]["bn"], fs["depthwise"]["bn"])
                sd[tp + ".3.weight"] = conv_t(fp["project"]["kernel"])
                add_bn(tp + ".4", fp["project_bn"], fs["project_bn"])
            else:
                sd[tp + ".0.weight"] = conv_t(fp["expand"]["conv"]["kernel"])
                add_bn(tp + ".1", fp["expand"]["bn"], fs["expand"]["bn"])
                sd[tp + ".3.weight"] = conv_t(fp["depthwise"]["conv"]["kernel"])
                add_bn(tp + ".4", fp["depthwise"]["bn"], fs["depthwise"]["bn"])
                sd[tp + ".6.weight"] = conv_t(fp["project"]["kernel"])
                add_bn(tp + ".7", fp["project_bn"], fs["project_bn"])
            idx += 1
    return sd


def test_mobilenet_conversion_covers_all_params():
    bb = MobileNetV2Backbone(downsample_factor=16)
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = _synthetic_mobilenet_sd(variables)
    params, stats, missing = TI.convert_mobilenetv2(sd, strict=True)
    assert not missing
    merged, loaded, skipped = TI.merge_into(variables, params, stats)
    assert not skipped
    # every original param leaf that the converter names must now hold the
    # transposed torch value
    k = merged["params"]["stem"]["conv"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(k), np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)))
    # converted model still runs
    low, high = bb.apply(merged, jnp.zeros((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(high)).all()
    # count: conversion touched most leaves
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert len(loaded) >= n_leaves - 2


def test_conv_transpose_rule():
    w = np.arange(24).reshape(2, 3, 2, 2).astype(np.float32)  # OIHW
    f = TI._conv(w)
    assert f.shape == (2, 2, 3, 2)  # HWIO
    np.testing.assert_array_equal(f[0, 1, 2, 1], w[1, 2, 0, 1])


def test_linear_transpose_rule():
    w = np.arange(6).reshape(2, 3).astype(np.float32)
    np.testing.assert_array_equal(TI._linear(w), w.T)


def test_resnet_conversion_partial():
    from cervical_tpu.models.backbones.resnet import ResNetFeaturizer
    model = ResNetFeaturizer(depth=50, out_features=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # minimal synthetic sd: only conv1/bn1/fc, strict=False
    p = variables["params"]
    rng = np.random.default_rng(1)
    sd = {
        "conv1.weight": np.transpose(
            rng.normal(size=p["conv1"]["kernel"].shape).astype(np.float32),
            (3, 2, 0, 1)),
        "bn1.weight": np.ones(64, np.float32),
        "bn1.bias": np.zeros(64, np.float32),
        "bn1.running_mean": np.zeros(64, np.float32),
        "bn1.running_var": np.ones(64, np.float32),
        "fc.weight": rng.normal(size=(8, 2048)).astype(np.float32),
        "fc.bias": np.zeros(8, np.float32),
    }
    params, stats, missing = TI.convert_resnet(sd, depth=50, strict=False)
    merged, loaded, skipped = TI.merge_into(variables, params, stats)
    assert "conv1/kernel" in loaded
    assert "fc/kernel" in loaded
    out = model.apply(merged, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 8)
