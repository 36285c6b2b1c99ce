"""Shift-based depthwise 3x3 convolution.

On the target platform, XLA's ``conv_general_dilated`` with
``feature_group_count=C`` executes ~10x below HBM bandwidth (measured
57 GB/s for a bandwidth-bound op; see CLAUDE.md).  A depthwise 3x3 is just a
weighted sum of 9 shifted copies of the input, which XLA fuses into fast
sliced elementwise work:

    y[b, i, j, c] = sum_{dy,dx} w[dy, dx, c] * x[b, i*s + dy*d - p, j*s + dx*d - p, c]

Supports stride 1/2, dilation, SAME/VALID-style padding via explicit pad, and
is fully differentiable (autodiff turns shifts into shifts).  Used by the
Xception / MobileNetV2 backbones in place of grouped convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# trace-time backend switch (mirrors ops/conv.py): "shift" = the 9-tap
# slice ladder below; "lax" = XLA grouped conv (full-program A/B probes —
# standalone-op measurements mislead on the target platform, docs/PLATFORM.md)
_DEFAULT_BACKEND = "shift"


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    if name not in ("shift", "lax"):
        raise ValueError(f"unknown depthwise backend {name!r}")
    _DEFAULT_BACKEND = name


def depthwise_conv3x3(x, kernel, stride: int = 1, dilation: int = 1,
                      padding: int | None = None):
    """Depthwise 3x3 conv, NHWC.

    ``kernel``: (3, 3, 1, C) — same layout as an HWIO grouped-conv kernel
    (keeps torch-import compatibility).  ``padding`` defaults to the
    torch-style ``dilation`` (SAME for stride 1).
    """
    kh, kw, one, c = kernel.shape
    assert (kh, kw, one) == (3, 3, 1), kernel.shape
    if _DEFAULT_BACKEND == "lax":
        return depthwise_conv3x3_reference(x, kernel, stride, dilation,
                                           padding)
    if padding is None:
        padding = dilation
    b, h, w, cx = x.shape
    assert cx == c, (cx, c)

    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    out_h = (h + 2 * padding - 2 * dilation - 1) // stride + 1
    out_w = (w + 2 * padding - 2 * dilation - 1) // stride + 1

    y = None
    for i in range(3):
        for j in range(3):
            oy = i * dilation
            ox = j * dilation
            tap = jax.lax.slice(
                xp,
                (0, oy, ox, 0),
                (b, oy + (out_h - 1) * stride + 1,
                 ox + (out_w - 1) * stride + 1, c),
                (1, stride, stride, 1))
            term = tap * kernel[i, j, 0]
            y = term if y is None else y + term
    return y


def depthwise_conv3x3_reference(x, kernel, stride: int = 1,
                                dilation: int = 1, padding: int | None = None):
    """XLA grouped-conv reference implementation (for tests)."""
    if padding is None:
        padding = dilation
    c = kernel.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation), dimension_numbers=dn,
        feature_group_count=c,
        preferred_element_type=x.dtype)
