r"""Fused, batched train-time augmentation (the preprocessing north star).

Rebuilds the reference's per-image PIL/cv2 augmentation chain
(``Segmentation/deeplabv3+/utils/dataloader.py:55-154``) as one jitted,
vmapped TPU program:

reference chain (host, per image):          TPU formulation (batched):
  aspect-jitter resize (BICUBIC)   \
  horizontal flip                   \   one inverse-affine gather warp
  random paste on gray canvas       /   (bilinear image / nearest label)
  rotation +-10 deg (warpAffine)   /
  Gaussian blur 5x5 (p=.25)        ->   masked depthwise conv
  HSV gain jitter via uint8 LUTs   ->   vectorized cv2-uint8-HSV transform

Composing the four geometric steps into a single warp samples each output
pixel once — no intermediate canvases, no dynamic shapes, and the whole batch
stays HBM-resident.  The eval path (letterbox only, dataloader.py:64-77) is
the same warp with deterministic parameters.

Documented deviations from the reference (see docs/PARITY.md): bilinear
instead of BICUBIC source sampling, and blur applied after the fused warp
(an isotropic Gaussian commutes with rotation up to border effects; in the
reference blur precedes rotation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

GRAY_FILL = 128.0  # reference canvas/border fill (dataloader.py:106,130)


# ---------------------------------------------------------------------------
# Parameter sampling
# ---------------------------------------------------------------------------

def sample_augment_params(rng, batch_size: int, jitter=0.3, scale_range=(0.25, 2.0),
                          hue=0.1, sat=0.7, val=0.3, flip_p=0.5, blur_p=0.25,
                          rotate_p=0.25, max_rotation=10,
                          rotate_prefix: int | None = None,
                          blur_suffix: int | None = None):
    """Per-image augmentation parameters, mirroring the RNG draws of
    ``get_random_data`` (dataloader.py:82-137).

    ``rotate_prefix``: if set, exactly the first K samples rotate instead of
    a per-sample Bernoulli(rotate_p) draw.  Because the loader shuffles batch
    contents every epoch, each *image's* marginal rotation probability stays
    K/B; pair with ``augment_batch_einsum(rotate_capacity=K)`` so the
    3-shear rotation only runs on that prefix.

    ``blur_suffix``: same trick for the Gaussian blur — exactly the *last* K
    samples blur (disjoint from the rotation prefix; see docs/PARITY.md for
    the co-occurrence caveat).  Pair with
    ``augment_batch_einsum(blur_capacity=K)``.

    Returns a dict of (B,)-shaped arrays; pass to :func:`augment_batch`.
    """
    ks = jax.random.split(rng, 10)
    u = lambda k, lo, hi: jax.random.uniform(k, (batch_size,), minval=lo, maxval=hi)
    ar_jitter = u(ks[0], 1 - jitter, 1 + jitter) / u(ks[1], 1 - jitter, 1 + jitter)
    scale = u(ks[2], *scale_range)
    flip = jax.random.bernoulli(ks[3], flip_p, (batch_size,))
    # paste offsets are sampled as fractions; turned into pixels in the warp
    # because nw/nh depend on scale: dx = frac * (w - nw)
    dx_frac = u(ks[4], 0.0, 1.0)
    dy_frac = u(ks[8], 0.0, 1.0)
    if blur_suffix is None:
        blur = jax.random.bernoulli(ks[5], blur_p, (batch_size,))
    else:
        blur = jnp.arange(batch_size) >= batch_size - blur_suffix
    if rotate_prefix is None:
        rot_draw = jax.random.bernoulli(ks[6], rotate_p, (batch_size,))
    else:
        rot_draw = jnp.arange(batch_size) < rotate_prefix
    # a distinct key from the rot_draw Bernoulli — reusing ks[6] would make
    # the angle statistically dependent on the rotate decision
    angle = jax.random.randint(ks[9], (batch_size,), -max_rotation,
                               max_rotation + 1).astype(jnp.float32)
    angle = jnp.where(rot_draw, angle, 0.0)
    gains = jax.random.uniform(ks[7], (batch_size, 3), minval=-1.0, maxval=1.0)
    gains = gains * jnp.array([hue, sat, val]) + 1.0
    return {
        "ar_jitter": ar_jitter, "scale": scale, "flip": flip,
        "dx_frac": dx_frac, "dy_frac": dy_frac, "blur": blur,
        "angle": angle, "gains": gains,
    }


def letterbox_params_like(batch_size: int, src_hw, dst_hw):
    """Deterministic parameters reproducing the eval letterbox path."""
    ih, iw = src_hw
    h, w = dst_hw
    scale = min(w / iw, h / ih)
    zeros = jnp.zeros((batch_size,))
    return {
        "ar_jitter": jnp.full((batch_size,), iw / ih),
        "scale": jnp.full((batch_size,), scale),
        "flip": jnp.zeros((batch_size,), bool),
        "dx_frac": jnp.full((batch_size,), 0.5),
        "dy_frac": jnp.full((batch_size,), 0.5),
        "blur": jnp.zeros((batch_size,), bool),
        "angle": zeros,
        "gains": jnp.ones((batch_size, 3)),
        "letterbox": True,
    }


# ---------------------------------------------------------------------------
# Geometric warp
# ---------------------------------------------------------------------------

def _resized_dims(params, src_hw, dst_hw, letterbox: bool):
    """Resized (nh, nw) following dataloader.py:82-89 (train) / :65-68 (eval)."""
    ih, iw = src_hw
    h, w = dst_hw
    if letterbox:
        scale = jnp.minimum(w / iw, h / ih) * jnp.ones_like(params["scale"])
        nw = jnp.floor(iw * scale)
        nh = jnp.floor(ih * scale)
        return nh, nw
    new_ar = (iw / ih) * params["ar_jitter"]
    scale = params["scale"]
    # if new_ar < 1: nh = scale*h; nw = nh*new_ar  else nw = scale*w; nh = nw/new_ar
    nh_a = jnp.floor(scale * h)
    nw_a = jnp.floor(nh_a * new_ar)
    nw_b = jnp.floor(scale * w)
    nh_b = jnp.floor(nw_b / new_ar)
    nh = jnp.where(new_ar < 1, nh_a, nh_b)
    nw = jnp.where(new_ar < 1, nw_a, nw_b)
    return jnp.maximum(nh, 1.0), jnp.maximum(nw, 1.0)


def _source_coords(params, src_hw, dst_hw, letterbox: bool):
    """Map every output pixel of the (h, w) canvas back to source coordinates.

    Composition (inverse order of the reference chain): undo rotation about
    the canvas center, undo the paste offset, undo the horizontal flip, undo
    the resize.  Returns (ys, xs) float32 (h, w) source-pixel coordinates and
    an in-bounds mask is implied by coordinates outside [0, s-1].
    """
    ih, iw = src_hw
    h, w = dst_hw
    nh, nw = _resized_dims(params, src_hw, dst_hw, letterbox)
    if letterbox:
        dx = jnp.floor((w - nw) / 2.0)
        dy = jnp.floor((h - nh) / 2.0)
    else:
        # reference: dx = int(rand(0, w - nw)) — w-nw may be negative for
        # scale > 1, in which case rand(0, negative) yields a negative offset.
        dx = jnp.floor(params["dx_frac"] * (w - nw))
        dy = jnp.floor(params["dy_frac"] * (h - nh))

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    # undo rotation (cv2.getRotationMatrix2D(center, -rotation) rotates the
    # image by -rotation deg; inverse-map output pixels by +rotation)
    theta = params["angle"] * (np.pi / 180.0)
    cx, cy = (w // 2), (h // 2)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    xr = cos_t * (xx - cx) - sin_t * (yy - cy) + cx
    yr = sin_t * (xx - cx) + cos_t * (yy - cy) + cy

    # undo paste
    xp = xr - dx
    yp = yr - dy

    # undo flip (PIL FLIP_LEFT_RIGHT on the resized image)
    xp = jnp.where(params["flip"], (nw - 1.0) - xp, xp)

    # undo resize: resized pixel centers map linearly to source centers
    xs = (xp + 0.5) * (iw / nw) - 0.5
    ys = (yp + 0.5) * (ih / nh) - 0.5
    return ys, xs


def _gather_bilinear(img, ys, xs, fill):
    """Bilinear sample of (H, W, C) at float coords; out-of-bounds -> fill."""
    ih, iw, _ = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, ih - 1)
        xc = jnp.clip(xi, 0, iw - 1)
        return img[yc, xc]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    inb = ((xs >= -0.5) & (xs <= iw - 0.5) & (ys >= -0.5) & (ys <= ih - 0.5))
    return jnp.where(inb[..., None], out, fill)


def _gather_nearest(label, ys, xs, fill):
    ih, iw = label.shape
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, iw - 1)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, ih - 1)
    out = label[yi, xi]
    inb = ((xs >= -0.5) & (xs <= iw - 0.5) & (ys >= -0.5) & (ys <= ih - 0.5))
    return jnp.where(inb, out, fill)


# ---------------------------------------------------------------------------
# Photometric ops
# ---------------------------------------------------------------------------

def rgb_to_hsv_cv2(rgb):
    """RGB [0,255] float -> cv2 uint8-range HSV (H in [0,180), S,V in [0,255])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2 packs H/2 into uint8
    s = jnp.where(v > 0, 255.0 * delta / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb_cv2(hsv):
    """Inverse of :func:`rgb_to_hsv_cv2` (cv2 uint8-range conventions).

    Sextant selection uses nested ``where`` chains, not gathers — XLA:TPU
    scalarizes per-pixel gathers (see ops/pallas_warp.py module docstring).
    """
    h = hsv[..., 0] * 2.0  # degrees
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    i = jnp.floor(hp).astype(jnp.int32) % 6

    def sel(a0, a1, a2, a3, a4, a5):
        return jnp.where(i == 0, a0, jnp.where(i == 1, a1, jnp.where(
            i == 2, a2, jnp.where(i == 3, a3, jnp.where(i == 4, a4, a5)))))

    r = sel(c, x, z, z, x, c) + m
    g = sel(x, c, c, x, z, z) + m
    b = sel(z, z, x, c, c, x) + m
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(rgb, gains):
    """cv2-LUT hue/sat/val gain jitter (dataloader.py:137-152).

    ``lut_hue = (x * r0) % 180``; sat/val scaled and clipped.  The reference
    applies the LUT to integer channel values; we round to integers first so
    the scalar maps agree.
    """
    hsv = rgb_to_hsv_cv2(rgb)
    h = jnp.round(hsv[..., 0])
    s = jnp.round(hsv[..., 1])
    v = jnp.round(hsv[..., 2])
    h = jnp.mod(h * gains[0], 180.0)
    s = jnp.clip(s * gains[1], 0.0, 255.0)
    v = jnp.clip(v * gains[2], 0.0, 255.0)
    # uint8 LUT storage truncates toward zero
    out = hsv_to_rgb_cv2(jnp.stack([jnp.floor(h), jnp.floor(s), jnp.floor(v)], -1))
    return jnp.clip(out, 0.0, 255.0)


# cv2.getGaussianKernel uses fixed binomial kernels for ksize<=7 with sigma<=0
_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
                 0.03125], np.float32),
}


def hsv_jitter_batched(rgb, gains):
    """Batched cv2-LUT HSV jitter: (B, H, W, 3) x (B, 3) without vmap.

    Same math as :func:`hsv_jitter` but written directly over the batch with
    broadcasting so XLA fuses the whole chain into one pass (measured 31 ms
    -> ~8 ms for a 1024 x 512^2 batch on the target chip).
    """
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(v == r, 60.0 * (g - b) / safe,
                  jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                            240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) * 0.5
    s = jnp.where(v > 0, 255.0 * delta / jnp.where(v > 0, v, 1.0), 0.0)

    g0 = gains[:, 0][:, None, None]
    g1 = gains[:, 1][:, None, None]
    g2 = gains[:, 2][:, None, None]
    h = jnp.floor(jnp.mod(jnp.round(h) * g0, 180.0))
    s = jnp.floor(jnp.clip(jnp.round(s) * g1, 0.0, 255.0))
    v = jnp.floor(jnp.clip(jnp.round(v) * g2, 0.0, 255.0))

    hd = h * 2.0
    sf = s / 255.0
    c = v * sf
    hp = hd / 60.0
    xx = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    i = jnp.floor(hp).astype(jnp.int32) % 6

    def sel(a0, a1, a2, a3, a4, a5):
        return jnp.where(i == 0, a0, jnp.where(i == 1, a1, jnp.where(
            i == 2, a2, jnp.where(i == 3, a3, jnp.where(i == 4, a4, a5)))))

    out = jnp.stack([sel(c, xx, z, z, xx, c) + m,
                     sel(xx, c, c, xx, z, z) + m,
                     sel(z, z, xx, c, c, xx) + m], axis=-1)
    return jnp.clip(out, 0.0, 255.0)


def hsv_jitter_batched_fast(rgb, gains, scale: float = 1.0):
    """Closed-form variant of :func:`hsv_jitter_batched` for the einsum
    fast path (ops/warp_xla.py).

    Three changes, all measured on the target chip with
    ``scripts/bench_einsum_stages.py`` (the f32 select-ladder form costs
    ~29 ms in-context for a 1024x512^2 batch — far above its memory-bound
    ideal; this form ~24 ms, the einsum pipeline 94.7 -> 88.9 ms):

    * the 6-sector select ladder of the RGB reconstruction is replaced by
      the continuous piecewise-linear identity
      ``ch(n) = v' - c * clip(min(k, 4 - k), 0, 1)`` with
      ``k = (n + h'/30) mod 6`` and n = 5/3/1 for R/G/B — fewer ops, no
      int sector plane, and no equality ties (the function is continuous
      at sector boundaries);
    * each output channel is scaled by ``scale`` and cast to bfloat16
      BEFORE the 3-channel stack, halving the stack's HBM traffic
      (a planar-compute variant measured 4.8 ms WORSE — the transposes
      cost more than the NHWC stride-3 channel reads they avoid).

    Same quantized-LUT semantics as :func:`hsv_jitter` up to fp
    association (<= 0.5 counts on the [0,255] scale, CPU-verified).
    Returns bf16 in ``[0, 255*scale]``.
    """
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    # NOTE: keep the ladder's exact division ordering 60*(x)/safe — a
    # hoisted reciprocal (60/delta) * (x) rounds differently in f32 and
    # the integer hue quantization below amplifies half-count flips into
    # full 2-degree hue steps (measured 6-count RGB deviations).  Perf was
    # noise-level anyway (XLA CSEs the divides).
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(v == r, 60.0 * (g - b) / safe,
                  jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                            240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) * 0.5
    s = jnp.where(v > 0, 255.0 * delta / jnp.where(v > 0, v, 1.0), 0.0)

    g0 = gains[:, 0][:, None, None]
    g1 = gains[:, 1][:, None, None]
    g2 = gains[:, 2][:, None, None]
    h = jnp.floor(jnp.mod(jnp.round(h) * g0, 180.0))
    s = jnp.floor(jnp.clip(jnp.round(s) * g1, 0.0, 255.0))
    v = jnp.floor(jnp.clip(jnp.round(v) * g2, 0.0, 255.0))

    hp = h * (1.0 / 30.0)          # == (2h)/60, the sector coordinate
    c = v * (s * (1.0 / 255.0))

    def ch(n):
        k = jnp.mod(n + hp, 6.0)
        t = jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
        out = jnp.clip(v - c * t, 0.0, 255.0)
        return (out * scale).astype(jnp.bfloat16)

    return jnp.stack([ch(5.0), ch(3.0), ch(1.0)], axis=-1)


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_1d(ksize: int = 5, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics incl. the fixed small-kernel table."""
    if sigma <= 0:
        if ksize in _SMALL_GAUSSIAN_TAB:
            return _SMALL_GAUSSIAN_TAB[ksize]
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(images, ksize: int = 5, sigma: float = 0.0):
    """Separable 5x5 Gaussian blur, REFLECT_101 borders (cv2.GaussianBlur
    defaults; dataloader.py:118-120).  ``images``: (B, H, W, C)."""
    k = _gaussian_kernel_1d(ksize, sigma)
    kh = jnp.asarray(k, images.dtype).reshape(1, ksize, 1, 1)
    kw = jnp.asarray(k, images.dtype).reshape(ksize, 1, 1, 1)
    c = images.shape[-1]
    pad = ksize // 2
    x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    dn = jax.lax.conv_dimension_numbers(x.shape, (ksize, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c)
    return x


@functools.lru_cache(maxsize=8)
def _blur_matrix(size: int, ksize: int, sigma: float) -> np.ndarray:
    """(size, size) banded matrix applying the 1-D Gaussian with REFLECT_101
    borders — lets the separable blur run as two batched matmuls on the MXU
    (grouped convs execute far below roofline on the target platform,
    docs/PLATFORM.md)."""
    k = _gaussian_kernel_1d(ksize, sigma)
    m = np.zeros((size, size), np.float32)
    for o in range(size):
        for t in range(ksize):
            i = o + t - ksize // 2
            if i < 0:
                i = -i
            if i >= size:
                i = 2 * size - 2 - i
            m[o, i] += k[t]
    return m


def gaussian_blur_einsum(images, ksize: int = 5, sigma: float = 0.0):
    """Separable Gaussian blur as two einsums against constant banded
    matrices (same REFLECT_101 semantics as :func:`gaussian_blur`; bf16
    accumulation of a 5-tap convex combination of [0,255] values keeps the
    error <= 1 count)."""
    h, w = images.shape[1], images.shape[2]
    mh = jnp.asarray(_blur_matrix(h, ksize, sigma), images.dtype)
    mw = jnp.asarray(_blur_matrix(w, ksize, sigma), images.dtype)
    x = jnp.einsum("oi,biwc->bowc", mh, images)
    return jnp.einsum("pw,bhwc->bhpc", mw, x)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def _augment_one(image, label, params, dst_hw, letterbox):
    ys, xs = _source_coords(params, image.shape[:2], dst_hw, letterbox)
    img = _gather_bilinear(image.astype(jnp.float32), ys, xs, GRAY_FILL)
    lbl = _gather_nearest(label, ys, xs, jnp.zeros((), label.dtype))
    return img, lbl


@functools.partial(jax.jit, static_argnames=("dst_hw", "letterbox"))
def augment_batch(images, labels, params, dst_hw: Tuple[int, int],
                  letterbox: bool = False):
    """Apply the full augmentation to a batch.

    Args:
      images: (B, H, W, 3) uint8/float source images (static shape).
      labels: (B, H, W) integer masks.
      params: output of :func:`sample_augment_params` (or the letterbox
        variant).
      dst_hw: output canvas size, e.g. (512, 512).
      letterbox: True = deterministic eval path.

    Returns (images (B, h, w, 3) float32 in [0, 255], labels (B, h, w)).
    """
    per_image = {k: v for k, v in params.items() if k != "letterbox"}
    img, lbl = jax.vmap(
        lambda i, l, p: _augment_one(i, l, p, dst_hw, letterbox)
    )(images, labels, per_image)
    # photometric order follows the reference: blur (dataloader.py:118)
    # BEFORE the HSV gain jitter (:137) — they do not commute (blur is
    # linear in RGB, the HSV map is pixelwise-nonlinear)
    blurred = gaussian_blur(img)
    img = jnp.where(params["blur"][:, None, None, None], blurred, img)
    if not letterbox:  # eval path has no photometric jitter
        img = hsv_jitter_batched(img, params["gains"])
    return img, lbl
