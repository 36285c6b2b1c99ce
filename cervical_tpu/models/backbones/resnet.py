"""ResNet-50/101 image featurizer (NHWC, flax).

Reference: the multimodal pipeline featurizes each 256x256 patch with a
torchvision ``resnet101(pretrained=True)`` whose final fc is replaced by a
1024-d projection (``MultiModal Prediction/Graph_Structure(data_augmentation)
.py:131-142``).  This is the TPU-native equivalent; ImageNet weights can be
imported from a torch checkpoint with
:func:`cervical_tpu.train.torch_import.convert_resnet` or the model used
randomly initialized / re-trained.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from cervical_tpu.ops.conv import Conv

_BN = dict(momentum=0.9, epsilon=1e-5)

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}

# torchvision ImageNet preprocessing (Graph_Structure:144-148)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_proj = x.shape[-1] != self.features * 4 or self.stride != 1
        residual = x
        y = Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn3")(y)
        if needs_proj:
            residual = Conv(self.features * 4, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, **_BN,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetFeaturizer(nn.Module):
    """ResNet trunk + global average pool + fc projection.

    ``depth``: 50 or 101.  Output: (B, out_features) patch embeddings.
    """

    depth: int = 101
    out_features: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = STAGE_BLOCKS[self.depth]
        y = Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for stage, (w, n) in enumerate(zip(widths, blocks)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                y = Bottleneck(w, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(y, train)
        y = jnp.mean(y, axis=(1, 2))
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc")(y)


def preprocess_imagenet(images_u8):
    """uint8 RGB -> torchvision-normalized float (NHWC)."""
    x = images_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std
