"""Batched luminance histogram equalization + the 5x multimodal offline
augmentation family.

Reference: ``MultiModal Prediction/data_augmentation.py`` — per-image cv2
calls: YCrCb Y-channel ``equalizeHist`` (:11-57), horizontal/vertical flips
(:65-101), rotation (:110-144, with optional expanded canvas), 5x5 Gaussian
blur, resize (:206-279).  Here the whole family is batched, jitted, and
HBM-resident: the histogram/CDF/LUT pipeline is built from one
``segment-sum`` style scatter-add per image and a gather — no host round
trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cervical_tpu.ops.augment import gaussian_blur  # 5x5, cv2 semantics


def rgb_to_ycrcb(rgb):
    """cv2 YCrCb (uint8-range floats): Y=0.299R+0.587G+0.114B,
    Cr=(R-Y)*0.713+128, Cb=(B-Y)*0.564+128."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 128.0
    cb = (b - y) * 0.564 + 128.0
    return jnp.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb(ycrcb):
    y, cr, cb = ycrcb[..., 0], ycrcb[..., 1], ycrcb[..., 2]
    r = y + 1.403 * (cr - 128.0)
    g = y - 0.714 * (cr - 128.0) - 0.344 * (cb - 128.0)
    b = y + 1.773 * (cb - 128.0)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def equalize_hist_channel(channel):
    """cv2.equalizeHist on one (H, W) uint8-range channel.

    lut[i] = round((cdf(i) - cdf_min) / (total - cdf_min) * 255), where
    cdf_min is the cdf at the first occupied bin — cv2's exact construction.
    """
    flat = jnp.clip(jnp.round(channel.reshape(-1)), 0, 255).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.int32).at[flat].add(1)
    cdf = jnp.cumsum(hist)
    total = flat.shape[0]
    # cdf value at the first non-empty bin == min over occupied bins
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, total + 1))
    denom = jnp.maximum(total - cdf_min, 1)
    lut = jnp.round((cdf - cdf_min).astype(jnp.float32) / denom * 255.0)
    lut = jnp.clip(lut, 0.0, 255.0)
    # cv2 special-cases a single occupied bin (constant channel): the image
    # is returned unchanged, not mapped to 0 (OpenCV histogram.cpp's early
    # "hist[i] == total" exit) — detectable as cdf_min == total
    lut = jnp.where(cdf_min >= total, jnp.arange(256, dtype=jnp.float32), lut)
    return lut[flat].reshape(channel.shape)


@jax.jit
def equalize_histogram_batch(images):
    """Y-channel histogram equalization in YCrCb for a batch (B, H, W, 3).

    Reference: ``equalize_histogram_image`` (data_augmentation.py:11-57).
    Input/output are RGB float arrays in [0, 255].
    """
    ycrcb = rgb_to_ycrcb(images.astype(jnp.float32))
    y_eq = jax.vmap(equalize_hist_channel)(ycrcb[..., 0])
    out = jnp.concatenate([y_eq[..., None], ycrcb[..., 1:]], axis=-1)
    return ycrcb_to_rgb(out)


def flip_horizontal(images):
    """cv2.flip(img, 1) batched (data_augmentation.py:78)."""
    return images[..., :, ::-1, :]


def flip_vertical(images):
    """cv2.flip(img, 0) batched (data_augmentation.py:81)."""
    return images[..., ::-1, :, :]


def _rotate_coords(h, w, angle_deg):
    """Output->source coords for rotation about center
    (data_augmentation.py:117-130; the expanded-bounding-box variant lives
    in :func:`rotate_expand_batch`, which inlines its own mapping)."""
    theta = jnp.deg2rad(angle_deg)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h // 2), (w // 2)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # cv2.getRotationMatrix2D(center, angle) rotates CCW by angle; the
    # inverse map rotates output pixels CW by angle.
    xs = cos_t * (xx - cx) - sin_t * (yy - cy) + cx
    ys = sin_t * (xx - cx) + cos_t * (yy - cy) + cy
    return ys, xs


@functools.partial(jax.jit, static_argnames=())
def rotate_batch(images, angles_deg):
    """Rotate each image about its center, same canvas, black border —
    ``cv2.warpAffine(img, getRotationMatrix2D(center, angle, 1.0), (w, h))``
    (data_augmentation.py:236-240).  ``images``: (B, H, W, C) float."""
    b, h, w, _ = images.shape

    def one(img, ang):
        ys, xs = _rotate_coords(h, w, ang)
        from cervical_tpu.ops.augment import _gather_bilinear
        return _gather_bilinear(img.astype(jnp.float32), ys, xs, 0.0)

    return jax.vmap(one)(images, angles_deg)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def rotate_expand_batch(images, angles_deg, out_hw):
    """Expanded-canvas rotation resampled onto a fixed output size.

    The reference's ``rotate_image`` (data_augmentation.py:110-130) grows the
    canvas to ``(nW, nH) = (h sin + w cos, h cos + w sin)`` — a
    dynamic, angle-dependent shape.  Since every multimodal image is resized
    to a fixed square immediately afterwards (Graph_Structure:151-161), we
    fuse the two: rotate-with-expand *and* resize to ``out_hw`` in a single
    warp, keeping shapes static.
    """
    b, h, w, _ = images.shape
    oh, ow = out_hw

    def one(img, ang):
        theta = jnp.deg2rad(ang)
        cos_t, sin_t = jnp.abs(jnp.cos(theta)), jnp.abs(jnp.sin(theta))
        nw = h * sin_t + w * cos_t
        nh = h * cos_t + w * sin_t
        yy, xx = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                              jnp.arange(ow, dtype=jnp.float32), indexing="ij")
        # map output pixel -> expanded-canvas pixel
        ex = (xx + 0.5) * (nw / ow) - 0.5
        ey = (yy + 0.5) * (nh / oh) - 0.5
        # expanded-canvas -> source (inverse rotation about source center
        # after the expand translation)
        c, s = jnp.cos(theta), jnp.sin(theta)
        cx_e, cy_e = nw / 2.0, nh / 2.0
        cx, cy = w // 2, h // 2
        xs = c * (ex - cx_e) - s * (ey - cy_e) + cx
        ys = s * (ex - cx_e) + c * (ey - cy_e) + cy
        from cervical_tpu.ops.augment import _gather_bilinear
        return _gather_bilinear(img.astype(jnp.float32), ys, xs, 0.0)

    return jax.vmap(one)(images, angles_deg)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_batch(images, out_hw):
    """Batched bilinear resize (cv2.resize default INTER_LINEAR,
    half-pixel convention)."""
    from cervical_tpu.ops.image import resize_bilinear
    return resize_bilinear(images.astype(jnp.float32), out_hw,
                           align_corners=False)


def fivefold_augment(images, angles_deg=None):
    """The 5x multimodal augmentation set: [equalized original, h-flip,
    v-flip, blur, rotate] (data_augmentation.py:206-279; 5x factor per
    README.md:10).

    ``images``: (B, H, W, 3) RGB in [0, 255].  Returns (5, B, H, W, 3).
    """
    eq = equalize_histogram_batch(images)
    if angles_deg is None:
        angles_deg = jnp.full((images.shape[0],), 45.0)
    return jnp.stack([
        eq,
        flip_horizontal(eq),
        flip_vertical(eq),
        gaussian_blur(eq),
        rotate_batch(eq, angles_deg),
    ])
