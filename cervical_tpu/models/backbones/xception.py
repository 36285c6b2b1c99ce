"""Modified Aligned Xception backbone (NHWC, flax).

Reference: ``Segmentation/deeplabv3+/nets/xception.py`` — entry convs, 20
residual separable-conv blocks with an output-stride-dependent stride list,
atrous middle flow, and the ``block2.hook_layer`` side channel that exposes
the 256-channel low-level feature.  Here the low-level feature is returned
explicitly instead of captured by a forward hook.

BatchNorm uses the reference's ``bn_mom = 0.0003`` (torch convention), i.e.
flax momentum 0.9997.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from cervical_tpu.ops.conv import Conv

from cervical_tpu.ops.depthwise import depthwise_conv3x3

_BN = dict(momentum=1.0 - 0.0003, epsilon=1e-5)


class DepthwiseConv3x3(nn.Module):
    """Depthwise 3x3 via ops/depthwise.py (XLA grouped conv by default —
    the round-2 full-step ABAB reversed round 1's standalone-program
    verdict; see that module's docstring).  Parameter layout matches an
    HWIO grouped-conv kernel so torch weight import is unchanged."""

    stride: int = 1
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, c))
        dtype = self.dtype or x.dtype
        return depthwise_conv3x3(x.astype(dtype), kernel.astype(dtype),
                                 self.stride, self.dilation)


class SeparableConv(nn.Module):
    """``SeparableConv2d`` (xception.py:9-31): optional pre-ReLU, depthwise
    conv + BN (+ ReLU), pointwise conv + BN (+ ReLU).  ``activate_first``
    selects pre-activation (ReLU before depthwise, none after) versus
    post-activation ordering."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    activate_first: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        if self.activate_first:
            x = nn.relu(x)
        if self.kernel == 3:
            x = DepthwiseConv3x3(self.stride, self.dilation, dtype=self.dtype,
                                 name="depthwise")(x)
        else:
            pad = self.dilation * (self.kernel // 2)
            x = Conv(inp, (self.kernel, self.kernel), strides=self.stride,
                        padding=pad, kernel_dilation=self.dilation,
                        feature_group_count=inp, use_bias=False,
                        dtype=self.dtype, name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn1")(x)
        if not self.activate_first:
            x = nn.relu(x)
        x = Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn2")(x)
        if not self.activate_first:
            x = nn.relu(x)
        return x


class XceptionBlock(nn.Module):
    """Residual block of three separable convs (xception.py:33-73).

    Returns (out, hook) where ``hook`` is the output of the second separable
    conv — the reference's ``self.hook_layer`` used to tap block2's 256-ch
    low-level feature (xception.py:69,157).
    """

    features: int
    stride: int = 1
    atrous: Sequence[int] = (1, 1, 1)
    grow_first: bool = True
    activate_first: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        if self.features != inp or self.stride != 1:
            skip = Conv(self.features, (1, 1), strides=self.stride,
                           use_bias=False, dtype=self.dtype, name="skip")(x)
            skip = nn.BatchNorm(use_running_average=not train, **_BN,
                                dtype=self.dtype, name="skip_bn")(skip)
        else:
            # identity-skip blocks add relu(x), NOT x: the torch reference
            # aliases ``skip = inp`` and then sepconv1's inplace ReLU mutates
            # ``inp`` before ``x += skip`` (xception.py:12,21-22,55,66-72) —
            # verified empirically against the torch Block in
            # tests/test_torch_forward_parity.py (docs/PARITY.md)
            skip = nn.relu(x)

        filters = self.features if self.grow_first else inp
        a = self.atrous
        y = SeparableConv(filters, 3, 1, a[0], self.activate_first,
                          dtype=self.dtype, name="sepconv1")(x, train)
        y = SeparableConv(self.features, 3, 1, a[1], self.activate_first,
                          dtype=self.dtype, name="sepconv2")(y, train)
        hook = y
        y = SeparableConv(self.features, 3, self.stride, a[2],
                          self.activate_first, dtype=self.dtype,
                          name="sepconv3")(y, train)
        return y + skip, hook


class XceptionBackbone(nn.Module):
    """Full backbone (xception.py:76-182). Returns (low_level [os4, 256ch],
    high [os{8,16}, 2048ch])."""

    downsample_factor: int = 16
    dtype: Optional[jnp.dtype] = None
    # eval-mode only: run blocks 4-19 as ONE fused pallas kernel
    # (ops/pallas_xception.py) instead of ~160 XLA ops — the middle flow is
    # per-op-latency-bound at 32^2 x 728 on the target platform
    # (docs/PLATFORM.md).  Ignored during training/init (training BN needs
    # cross-batch stats between the fused ops).
    fused_middle: bool = False
    # rematerialize the entry flow (blocks 1-3) in the backward pass:
    # entry:bwd is the one memory-bound segment of the train step
    # (17.5 GB/step, vs_floor 0.58 — docs/PERF.md round-4 decomposition);
    # remat trades its large-spatial activation traffic for recompute
    # FLOPs (the entry is only ~4% of the step's FLOPs).  Bit-identical
    # gradients; ABAB'd inside the full step via scripts/bench_seg_step.py
    # (VERDICT r4 task #6's traffic-halved-entry experiment).
    remat_entry: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.downsample_factor == 8:
            stride_list = (2, 1, 1)
        elif self.downsample_factor == 16:
            stride_list = (2, 2, 1)
        else:
            raise ValueError(
                f"output stride {self.downsample_factor} is not supported")
        rate = 16 // self.downsample_factor

        x = Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN,
                         dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)

        Blk = (nn.remat(XceptionBlock, static_argnums=(2,))
               if self.remat_entry else XceptionBlock)
        x, _ = Blk(128, 2, dtype=self.dtype, name="block1")(x, train)
        x, low = Blk(256, stride_list[0], dtype=self.dtype,
                     name="block2")(x, train)
        x, _ = Blk(728, stride_list[1], dtype=self.dtype,
                   name="block3")(x, train)
        if self.fused_middle and not train and not self.is_initializing():
            from cervical_tpu.ops.pallas_xception import (fold_middle_flow,
                                                          middle_flow_eval)
            folded = fold_middle_flow(self.variables, first=4, count=16,
                                      compute_dtype=self.dtype or x.dtype)
            x = middle_flow_eval(x, folded, dilation=rate)
        else:
            for i in range(4, 20):
                x, _ = XceptionBlock(728, 1, atrous=(rate, rate, rate),
                                     dtype=self.dtype,
                                     name=f"block{i}")(x, train)
        x, _ = XceptionBlock(1024, stride_list[2], atrous=(rate, rate, rate),
                             grow_first=False, dtype=self.dtype,
                             name="block20")(x, train)

        x = SeparableConv(1536, 3, 1, rate, activate_first=False,
                          dtype=self.dtype, name="conv3")(x, train)
        x = SeparableConv(1536, 3, 1, rate, activate_first=False,
                          dtype=self.dtype, name="conv4")(x, train)
        x = SeparableConv(2048, 3, 1, rate, activate_first=False,
                          dtype=self.dtype, name="conv5")(x, train)
        return low, x
