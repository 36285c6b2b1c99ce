"""Image ops: resizes, letterboxing, normalization, one-hot labels.

TPU-native equivalents of the reference's PIL/cv2 image plumbing
(``Segmentation/deeplabv3+/utils/utils.py:11-65``, ``utils/dataloader.py:41-48,
64-77``) plus the bilinear-resize flavors the torch models rely on
(``F.interpolate(..., align_corners=True)``).

Resizes are expressed as separable 1-D interpolation matrices applied with
matmuls — they run on the MXU, batch over leading dims, and are exact for both
``align_corners`` conventions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) bilinear interpolation weight matrix."""
    w = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        # torch align_corners=True with a single output sample takes index 0.
        w[0, 0] = 1.0
        return w
    if align_corners:
        coords = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        coords = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        coords = np.clip(coords, 0, in_size - 1)
    lo = np.floor(coords).astype(int)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = coords - lo
    w[np.arange(out_size), lo] += 1 - frac
    w[np.arange(out_size), hi] += frac
    return w


def resize_bilinear(x, out_hw, align_corners: bool = True):
    """Bilinear resize of NHWC (or HWC) arrays via two MXU matmuls.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=...)`` exactly (used throughout nets/deeplabv3_plus.py:106,
    184,187 with align_corners=True).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x[0] if squeeze else x
    wh = jnp.asarray(_interp_matrix(h, oh, align_corners), x.dtype)
    ww = jnp.asarray(_interp_matrix(w, ow, align_corners), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh, x)
    y = jnp.einsum("pw,bowc->bopc", ww, y)
    return y[0] if squeeze else y


def preprocess_input(x):
    """Pixel scaling: /255 only (utils/utils.py:63-65)."""
    return x / 255.0


def letterbox_params(src_hw, dst_hw):
    """Aspect-preserving resize-and-center geometry (utils/utils.py:21-33).

    Returns (new_h, new_w, pad_top, pad_left).
    """
    ih, iw = src_hw
    h, w = dst_hw
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    return nh, nw, (h - nh) // 2, (w - nw) // 2


def letterbox_image(image, dst_hw, fill=128, align_corners: bool = False):
    """Resize with unchanged aspect ratio, pad with gray (``resize_image``,
    utils/utils.py:21-33; eval path of dataloader.py:64-77).

    ``image``: (H, W, C) float or uint8 array.  Uses bilinear resampling (the
    reference uses PIL BICUBIC; documented deviation, see docs/PARITY.md).
    """
    ih, iw = image.shape[:2]
    h, w = dst_hw
    nh, nw, top, left = letterbox_params((ih, iw), (h, w))
    resized = resize_bilinear(image.astype(jnp.float32), (nh, nw),
                              align_corners=align_corners)
    canvas = jnp.full((h, w, image.shape[2]), float(fill), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (top, left, 0))
    return canvas


def letterbox_label(label, dst_hw, fill=0):
    """Nearest-neighbor letterbox for integer masks (dataloader.py:74-77)."""
    ih, iw = label.shape[:2]
    h, w = dst_hw
    nh, nw, top, left = letterbox_params((ih, iw), (h, w))
    rows = jnp.clip((jnp.arange(nh) + 0.5) * ih / nh, 0, ih - 1).astype(jnp.int32)
    cols = jnp.clip((jnp.arange(nw) + 0.5) * iw / nw, 0, iw - 1).astype(jnp.int32)
    resized = label[rows][:, cols]
    canvas = jnp.full((h, w), fill, label.dtype)
    return jax.lax.dynamic_update_slice(canvas, resized, (top, left))


def unletterbox_logits(logits_hwc, src_hw, dst_hw):
    """Crop letterbox padding and resize per-class scores back to the original
    image size (``DeeplabV3.detect_image`` / ``get_miou_png``,
    deeplab.py:137-150,322-334)."""
    nh, nw, top, left = letterbox_params(src_hw, dst_hw)
    cropped = logits_hwc[top:top + nh, left:left + nw]
    return resize_bilinear(cropped, src_hw, align_corners=False)


def one_hot_with_ignore(labels, num_classes):
    """Labels -> one-hot with an extra trailing ignore channel.

    Pixels with value >= num_classes are clamped into the extra channel
    (dataloader.py:41-48: ``png[png >= num_classes] = num_classes`` then
    ``eye(num_classes + 1)[png]``).
    """
    clamped = jnp.minimum(labels, num_classes)
    return jax.nn.one_hot(clamped, num_classes + 1, dtype=jnp.float32)
