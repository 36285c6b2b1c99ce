"""Depthwise 3x3 convolution: XLA grouped conv (default) or 9-tap shift ladder.

Round-1 standalone measurements showed XLA's ``conv_general_dilated`` with
``feature_group_count=C`` ~10x slower than a 9-tap shifted-slice ladder —
but that was the dispatch-bound standalone-program artifact
(docs/PLATFORM.md: every program execution carries a fixed ~28 ms
serialized cost).  The round-2 FULL-STEP ABAB
(`scripts/bench_seg_step.py lax:xception vs dwlax:xception`) reversed it:
grouped-lax depthwise runs the whole xception 512² b8 train step in
**112 ms vs 181 ms** with the shift ladder (1.62x) — the ladder's 9
slice+multiply passes (and their backward) were the step's largest single
cost.  Default is now "lax"; the shift formulation stays switchable for
toolchains where grouped convs genuinely lower badly.

    y[b, i, j, c] = sum_{dy,dx} w[dy, dx, c] * x[b, i*s + dy*d - p, j*s + dx*d - p, c]

Both support stride 1/2, dilation, SAME/VALID-style padding via explicit
pad, and full autodiff.  Used by the Xception / MobileNetV2 backbones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# trace-time backend switch (mirrors ops/conv.py): "lax" = XLA grouped
# conv (default; wins the full-program ABAB by 1.62x — see module
# docstring); "shift" = the 9-tap slice ladder below
_DEFAULT_BACKEND = "lax"


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
    """XLA grouped-conv formulation (the default backend; also the
    semantics oracle the shift ladder is tested against)."""
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
