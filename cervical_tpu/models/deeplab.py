"""DeepLabV3+ semantic segmentation model (NHWC, flax).

Reference: ``Segmentation/deeplabv3+/nets/deeplabv3_plus.py`` — ASPP over the
backbone's high-level feature, 48-channel low-level shortcut, concat decoder,
1x1 classifier, x4 bilinear upsample to input resolution.

TPU notes: all convs NHWC (XLA's preferred TPU layout); bilinear resizes are
matmul-based with exact ``align_corners=True`` semantics
(:func:`cervical_tpu.ops.image.resize_bilinear`); ``dtype=bfloat16`` puts the
whole conv stack on the MXU in bf16 with fp32 BatchNorm statistics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from cervical_tpu.ops.conv import Conv

from cervical_tpu.models.backbones import MobileNetV2Backbone, XceptionBackbone
from cervical_tpu.ops.image import resize_bilinear

_BN = dict(momentum=0.9, epsilon=1e-5)  # torch momentum 0.1


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    backend: Optional[str] = None  # conv lowering override (ops/conv.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel // 2)
        x = Conv(self.features, (self.kernel, self.kernel), padding=pad,
                    kernel_dilation=self.dilation, use_bias=self.use_bias,
                    dtype=self.dtype, backend=self.backend, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (deeplabv3_plus.py:56-114).

    Five branches — 1x1, three 3x3 with dilation (6, 12, 18) * rate, and
    image-level pooling — concatenated and fused by a 1x1 conv.  The global
    branch's bilinear broadcast of a 1x1 map is an exact broadcast.
    """

    features: int = 256
    rate: int = 1
    dtype: Optional[jnp.dtype] = None
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        be = self.backend
        b1 = _ConvBNReLU(self.features, 1, dtype=self.dtype, backend=be,
                         name="branch1")(x, train)
        b2 = _ConvBNReLU(self.features, 3, 6 * self.rate, dtype=self.dtype,
                         backend=be, name="branch2")(x, train)
        b3 = _ConvBNReLU(self.features, 3, 12 * self.rate, dtype=self.dtype,
                         backend=be, name="branch3")(x, train)
        b4 = _ConvBNReLU(self.features, 3, 18 * self.rate, dtype=self.dtype,
                         backend=be, name="branch4")(x, train)

        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = _ConvBNReLU(self.features, 1, dtype=self.dtype, backend=be,
                        name="branch5")(g, train)
        g = jnp.broadcast_to(g, b1.shape)

        y = jnp.concatenate([b1, b2, b3, b4, g], axis=-1)
        return _ConvBNReLU(self.features, 1, dtype=self.dtype, backend=be,
                           name="fuse")(y, train)


class DeepLab(nn.Module):
    """DeepLabV3+ (deeplabv3_plus.py:116-188).

    ``apply(..., train=True, mutable=['batch_stats'], rngs={'dropout': k})``
    for training; returns NHWC logits at input resolution.
    """

    num_classes: int = 5
    backbone: str = "xception"  # or "mobilenet"
    downsample_factor: int = 16
    dtype: Optional[jnp.dtype] = None
    # conv-lowering override for the ASPP/decoder head only (backbone keeps
    # the process default) — the im2col-vs-lax experiment of ROADMAP item 2
    head_conv_backend: Optional[str] = None
    # eval-mode fused pallas middle flow (xception only; see
    # XceptionBackbone.fused_middle / ops/pallas_xception.py)
    fused_middle: bool = False
    # rematerialized entry flow (xception only; see
    # XceptionBackbone.remat_entry — the memory-bound entry:bwd experiment)
    remat_entry: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, freeze_backbone: bool = False,
                 resize_logits: bool = True):
        if self.downsample_factor not in (8, 16):
            # ds=32 would give ASPP rate 16//32 = 0 -> dilation-0 convs that
            # fail deep inside XLA; the reference supports os 8/16 only
            raise ValueError(
                f"downsample_factor must be 8 or 16, got {self.downsample_factor}")
        h, w = x.shape[1], x.shape[2]
        if self.backbone == "xception":
            low, deep = XceptionBackbone(self.downsample_factor,
                                         dtype=self.dtype,
                                         fused_middle=self.fused_middle,
                                         remat_entry=self.remat_entry,
                                         name="backbone")(x, train)
        elif self.backbone == "mobilenet":
            if self.fused_middle:
                raise ValueError(
                    "fused_middle is an xception-only fast path")
            if self.remat_entry:
                raise ValueError(
                    "remat_entry is an xception-only knob")
            low, deep = MobileNetV2Backbone(self.downsample_factor,
                                            dtype=self.dtype, name="backbone")(x, train)
        else:
            raise ValueError(
                f"Unsupported backbone - `{self.backbone}`, use mobilenet, xception.")
        if freeze_backbone:
            # the reference's freeze phase sets requires_grad=False on the
            # backbone (train.py:447-452), which prunes its backward pass
            # entirely; stop_gradient is the XLA equivalent (the grad mask in
            # seg_trainer only zeroes already-computed grads).  Backbone BN
            # running stats still update, replicating train.py:448-449 where
            # only requires_grad is toggled.
            low = jax.lax.stop_gradient(low)
            deep = jax.lax.stop_gradient(deep)

        be = self.head_conv_backend
        deep = ASPP(256, rate=16 // self.downsample_factor, dtype=self.dtype,
                    backend=be, name="aspp")(deep, train)
        low = _ConvBNReLU(48, 1, dtype=self.dtype, backend=be,
                          name="shortcut")(low, train)

        deep = resize_bilinear(deep, (low.shape[1], low.shape[2]),
                               align_corners=True)
        y = jnp.concatenate([deep, low], axis=-1)
        y = _ConvBNReLU(256, 3, dtype=self.dtype, backend=be,
                        name="cat_conv1")(y, train)
        y = nn.Dropout(0.5)(y, deterministic=not train)
        y = _ConvBNReLU(256, 3, dtype=self.dtype, backend=be,
                        name="cat_conv2")(y, train)
        y = nn.Dropout(0.1)(y, deterministic=not train)
        y = Conv(self.num_classes, (1, 1), dtype=self.dtype, backend=be,
                    name="cls_conv")(y)
        if not resize_logits:
            # quarter-resolution fp32 logits for the fused loss bundle,
            # which performs the identical x4 bilinear resize in
            # class-major layout (losses.seg_loss_bundle resize_to=...) —
            # the (B, H, W, C) lane-padded full-res tensor never reaches
            # HBM.  The f32 cast here matches the cast-before-resize of
            # the default path, so both paths interpolate the same values.
            return y.astype(jnp.float32)
        y = resize_bilinear(y.astype(jnp.float32), (h, w), align_corners=True)
        return y
