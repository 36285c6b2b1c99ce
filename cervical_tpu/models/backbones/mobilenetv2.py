"""MobileNetV2 backbone with output-stride surgery (NHWC, flax).

Reference: ``Segmentation/deeplabv3+/nets/mobilenetv2.py`` (inverted-residual
stack) plus the ``_nostride_dilate`` stride->dilation rewrite in
``nets/deeplabv3_plus.py:7-49`` that turns the os-32 classifier trunk into an
os-8/os-16 dense-prediction backbone.

The torch version mutates conv attributes after construction; here the
(stride, dilation) of every block is computed statically from
``downsample_factor`` before the modules are built — same network, no
surgery.  Returns (low_level_features [os4, 24ch], high_features [os{8,16},
320ch]) like ``MobileNetV2.forward`` (deeplabv3_plus.py:46-49).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from cervical_tpu.ops.conv import Conv

# t (expand), c (channels), n (repeats), s (stride) — mobilenetv2.py:80-89
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# feature indices: 0 = stem conv, 1..17 = inverted-residual blocks
DOWN_IDX = (2, 4, 7, 14)  # deeplabv3_plus.py:16
TOTAL_IDX = 18


def _bn(torch_momentum=0.1):
    return dict(momentum=1.0 - torch_momentum, epsilon=1e-5)


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.groups > 1 and self.groups == x.shape[-1] and self.kernel == 3:
            # shift-based depthwise (ops/depthwise.py): XLA grouped convs run
            # far below bandwidth on the target platform.  Module named
            # "conv" keeps the torch-import param path unchanged.
            from cervical_tpu.models.backbones.xception import DepthwiseConv3x3
            x = DepthwiseConv3x3(self.stride, self.dilation, dtype=self.dtype,
                                 name="conv")(x)
        else:
            pad = self.dilation * (self.kernel // 2)
            x = Conv(self.features, (self.kernel, self.kernel),
                        strides=self.stride, padding=pad,
                        kernel_dilation=self.dilation,
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, **_bn(),
                         dtype=self.dtype, name="bn")(x)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    """mobilenetv2.py:24-72 with static (stride, dilation)."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = round(inp * self.expand_ratio)
        use_res = self.stride == 1 and inp == self.features

        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU6(hidden, kernel=1, dtype=self.dtype, name="expand")(y, train)
        y = ConvBNReLU6(hidden, kernel=3, stride=self.stride,
                        dilation=self.dilation, groups=hidden,
                        dtype=self.dtype, name="depthwise")(y, train)
        y = Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = nn.BatchNorm(use_running_average=not train, **_bn(),
                         dtype=self.dtype, name="project_bn")(y)
        return x + y if use_res else y


def _block_plan(downsample_factor: int):
    """Static (stride, dilation) per feature index, replicating
    ``_nostride_dilate`` (deeplabv3_plus.py:18-44).

    For a block whose original stride is 2 inside a dilated stage, stride
    becomes 1 and its 3x3 conv gets dilation ``dilate//2``; stride-1 blocks in
    the stage get dilation ``dilate``.
    """
    plan = []  # (stride, dilation) for indices 1..17
    for t, c, n, s in INVERTED_RESIDUAL_SETTING:
        for i in range(n):
            plan.append([s if i == 0 else 1, 1, t, c])
    # plan index j corresponds to feature index j+1
    def apply(start, end, dilate):
        for j in range(start - 1, end - 1):
            stride, _, t, c = plan[j]
            if stride == 2:
                plan[j][0] = 1
                plan[j][1] = dilate // 2
            else:
                plan[j][1] = dilate

    if downsample_factor == 8:
        apply(DOWN_IDX[-2], DOWN_IDX[-1], 2)
        apply(DOWN_IDX[-1], TOTAL_IDX, 4)
    elif downsample_factor == 16:
        apply(DOWN_IDX[-1], TOTAL_IDX, 2)
    elif downsample_factor != 32:
        raise ValueError(f"unsupported downsample_factor {downsample_factor}")
    return plan


class MobileNetV2Backbone(nn.Module):
    """Low/high feature extractor (deeplabv3_plus.py:7-49)."""

    downsample_factor: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        plan = _block_plan(self.downsample_factor)
        x = ConvBNReLU6(32, kernel=3, stride=2, dtype=self.dtype, name="stem")(x, train)
        low = None
        for j, (stride, dilation, t, c) in enumerate(plan):
            x = InvertedResidual(c, stride=stride, expand_ratio=t,
                                 dilation=dilation, dtype=self.dtype,
                                 name=f"block{j + 1}")(x, train)
            if j + 1 == 3:  # features[:4] -> low-level (os4, 24 channels)
                low = x
        return low, x
