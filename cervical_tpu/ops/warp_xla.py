"""XLA einsum/roll formulation of the fused augmentation warp.

Third backend for the train-time warp (see ``ops/augment.py`` for the gather
oracle and ``ops/pallas_warp.py`` for the Mosaic kernels).  Chosen by
profiling on the target v5e: XLA scalarizes the 2-D gather (~33 img/s) and
this environment executes Mosaic compute ~1000x below roofline, while dense
XLA batched matmuls, elementwise chains, and static rolls run at full speed.
So the warp becomes:

* vertical + horizontal 1-D resample (scale + flip + paste + gray fill) as
  two batched einsums against per-image interpolation matrices built from
  iota/compares — MXU work, ~2 x 512^3 x 3 bf16 FLOPs per image;
* rotation as barrel-shifted shears (Paeth 3-shear, or the 2-shear
  approximation with ``two_shear=True``), the four uint8 planes (RGB +
  label) packed into one uint32 lane per pixel so each ladder stage moves
  4x fewer elements (measured 1.3x; 2-shear a further 1.3x);
* batched fused HSV jitter (one elementwise pass) + conditional separable
  5x5 blur on a fixed batch suffix as two banded-matrix einsums
  (:func:`cervical_tpu.ops.augment.gaussian_blur_einsum` — measured 6.8x
  over the depthwise-conv form on the target chip, whose grouped convs run
  far below roofline).

Semantics match the gather oracle exactly up to bf16 rounding and the
documented multi-pass resampling differences of the shear rotation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cervical_tpu.ops import augment as aug
from cervical_tpu.ops.pallas_warp import make_warp_params, NPARAMS  # noqa: F401
from cervical_tpu.ops.pallas_warp import (P_AY, P_BY, P_AX, P_BX, P_TANH,
                                          P_SINT, P_FILL)

MAX_SHIFT = 64  # covers +-10 deg rotation shears on a 512 canvas


def _interp_matrices(a, b, out_size: int, in_size: int, nearest: bool):
    """Batched (B, out, in) 2-tap interpolation weights + (B, out) in-bounds.

    Same construction as the pallas kernel's ``_interp_weights`` but
    vectorized over the batch; bf16 output feeds the MXU.
    """
    o = jnp.arange(out_size, dtype=jnp.float32)[None, :, None]     # (1,O,1)
    i = jnp.arange(in_size, dtype=jnp.int32)[None, None, :]        # (1,1,I)
    src = a[:, None, None] * o + b[:, None, None]                  # (B,O,1)
    inb = ((src >= -0.5) & (src <= in_size - 0.5)).astype(jnp.float32)
    if nearest:
        idx = jnp.clip(jnp.round(src), 0, in_size - 1).astype(jnp.int32)
        w = (i == idx).astype(jnp.float32)
    else:
        y0 = jnp.floor(src)
        f = src - y0
        i0 = jnp.clip(y0, 0, in_size - 1).astype(jnp.int32)
        i1 = jnp.clip(y0 + 1, 0, in_size - 1).astype(jnp.int32)
        w = ((i == i0).astype(jnp.float32) * (1.0 - f)
             + (i == i1).astype(jnp.float32) * f)
    w = w * inb
    return w.astype(jnp.bfloat16), inb[..., 0]


def _interp_matrices_i8(a, b, out_size: int, in_size: int, nearest: bool):
    """int8-quantized interpolation matrices for the MXU's 2x int8 path.

    Bilinear taps are scaled by 127 with ``w1 = 127 - w0``, so in-bounds row
    sums are EXACTLY 127 (the two taps collide onto one entry at clamped
    edges and still sum to 127) — the uint8 zero-point compensation below
    needs no extra reduction.  Nearest mode keeps scale-1 one-hot rows
    (row sum exactly 1), making the label path exact for any uint8 value.
    Returns (W int8 (B, out, in), inb (B, out) float32).
    """
    o = jnp.arange(out_size, dtype=jnp.float32)[None, :, None]     # (1,O,1)
    i = jnp.arange(in_size, dtype=jnp.int32)[None, None, :]        # (1,1,I)
    src = a[:, None, None] * o + b[:, None, None]                  # (B,O,1)
    inb = (src >= -0.5) & (src <= in_size - 0.5)
    if nearest:
        idx = jnp.clip(jnp.round(src), 0, in_size - 1).astype(jnp.int32)
        w = ((i == idx) & inb).astype(jnp.int8)
    else:
        y0 = jnp.floor(src)
        f = src - y0
        i0 = jnp.clip(y0, 0, in_size - 1).astype(jnp.int32)
        i1 = jnp.clip(y0 + 1, 0, in_size - 1).astype(jnp.int32)
        w1 = jnp.round(f * 127.0).astype(jnp.int32)
        w = (i == i0) * (127 - w1) + (i == i1) * w1
        w = jnp.where(inb, w, 0).astype(jnp.int8)
    return w, inb[..., 0].astype(jnp.float32)


def _to_s8(u8):
    """uint8 -> int8 with a -128 zero-point shift (XOR of the sign bit)."""
    return jax.lax.bitcast_convert_type(u8 ^ jnp.uint8(128), jnp.int8)


def _resample_int8(images, wp, out_size: int, fill):
    """(B, H, W, C) uint8 -> (B, S, S, C) uint8.

    Same separable map as :func:`_resample` but on the MXU's int8 path
    (v5e int8 peak is 2x bf16): inputs are zero-point-shifted to int8,
    taps are 127-scaled int8, and each pass dequantizes with the exact
    ``v/127 + 128*inb`` compensation before re-quantizing to uint8 for the
    next pass.  The intermediate uint8 quantization matches the reference
    chain, which materializes uint8 between every PIL/cv2 step
    (Segmentation/deeplabv3+/utils/dataloader.py:77-112); max deviation vs
    the bf16 einsum path is ~2 counts on the [0,255] scale (tap rounding
    1/127 + one extra midpoint round).
    """
    b, ih, iw, c = images.shape
    wy, inb_y = _interp_matrices_i8(wp[:, P_AY], wp[:, P_BY], out_size, ih,
                                    nearest=False)
    wx, inb_x = _interp_matrices_i8(wp[:, P_AX], wp[:, P_BX], out_size, iw,
                                    nearest=False)
    v32 = jnp.einsum("boi,biwc->bowc", wy, _to_s8(images),
                     preferred_element_type=jnp.int32)
    vf = v32.astype(jnp.float32) * (1.0 / 127.0)
    vf = vf + (128.0 * inb_y
               + fill[:, None] * (1.0 - inb_y))[:, :, None, None]
    v8 = jnp.clip(jnp.round(vf), 0.0, 255.0).astype(jnp.uint8)
    h32 = jnp.einsum("bpw,bhwc->bhpc", wx, _to_s8(v8),
                     preferred_element_type=jnp.int32)
    hf = h32.astype(jnp.float32) * (1.0 / 127.0)
    hf = hf + (128.0 * inb_x
               + fill[:, None] * (1.0 - inb_x))[:, None, :, None]
    # uint8 output: downstream stages (rotation packing, HSV, blur) read
    # half the bytes vs bf16, and the values are integral anyway
    return jnp.clip(jnp.round(hf), 0.0, 255.0).astype(jnp.uint8)


def _resample_labels_int8(labels, wp, out_size: int):
    """(B, H, W, 1) uint8 labels -> (B, S, S, 1) uint8, EXACT nearest pick.

    One-hot int8 rows select ``label - 128``; adding back ``128 * inb``
    restores the value exactly for any uint8 (out-of-bounds rows get the
    0 fill), so this matches the float nearest path bit-for-bit.
    """
    b, ih, iw, _ = labels.shape
    wy, inb_y = _interp_matrices_i8(wp[:, P_AY], wp[:, P_BY], out_size, ih,
                                    nearest=True)
    wx, inb_x = _interp_matrices_i8(wp[:, P_AX], wp[:, P_BX], out_size, iw,
                                    nearest=True)
    v32 = jnp.einsum("boi,biwc->bowc", wy, _to_s8(labels),
                     preferred_element_type=jnp.int32)
    v32 = v32 + (128.0 * inb_y).astype(jnp.int32)[:, :, None, None]
    v8 = v32.astype(jnp.uint8)
    h32 = jnp.einsum("bpw,bhwc->bhpc", wx, _to_s8(v8),
                     preferred_element_type=jnp.int32)
    h32 = h32 + (128.0 * inb_x).astype(jnp.int32)[:, None, :, None]
    return h32.astype(jnp.uint8)


def _resample(images, wp, out_size: int, nearest: bool, fill):
    """(B, H, W, C) -> (B, S, S, C) via two batched einsums with fill."""
    b, ih, iw, c = images.shape
    wy, inb_y = _interp_matrices(wp[:, P_AY], wp[:, P_BY], out_size, ih, nearest)
    wx, inb_x = _interp_matrices(wp[:, P_AX], wp[:, P_BX], out_size, iw, nearest)
    x = images.astype(jnp.bfloat16)
    # bf16 accumulation is exact enough here: each output is a 2-tap convex
    # combination of [0,255] values (the other 510 weights are exact zeros),
    # and it halves the intermediate HBM traffic vs f32 accumulation.
    v = jnp.einsum("boi,biwc->bowc", wy, x,
                   preferred_element_type=jnp.bfloat16)
    v = v + ((fill[:, None] * (1.0 - inb_y))[:, :, None, None]
             ).astype(jnp.bfloat16)
    h = jnp.einsum("bpw,bhwc->bhpc", wx, v,
                   preferred_element_type=jnp.bfloat16)
    h = h + ((fill[:, None] * (1.0 - inb_x))[:, None, :, None]
             ).astype(jnp.bfloat16)
    return h


def _barrel_shift(x, shift, axis: int, fill, nearest: bool,
                  max_shift: int = MAX_SHIFT):
    """out[..] = x[.. - shift ..] along ``axis`` with per-slice shifts.

    ``shift``: (B, S) float32 — per row (axis=2) or per column (axis=1).
    Static-roll barrel ladder (ceil(log2(2*max_shift)) stages) + fractional
    lerp + out-of-range fill mask.  Compute stays in ``x.dtype`` (bf16 on the
    fast path) — each stage is a roll fused with a select, so cost ~=
    stages x 2 passes over the array.
    """
    b = x.shape[0]
    size = x.shape[axis]
    if nearest:
        s_int = jnp.round(shift)
        frac = None
    else:
        s_int = jnp.floor(shift)
        frac = shift - s_int
    u = jnp.clip(s_int, -max_shift, max_shift - 1).astype(jnp.int32) + max_shift
    nbits = max(1, (2 * max_shift - 1).bit_length())
    # shift along W varies per ROW -> mask dims (B,H,1,1); along H varies per
    # COLUMN -> (B,1,W,1)
    mshape = (b, size, 1, 1) if axis == 2 else (b, 1, size, 1)

    y = jnp.roll(x, -max_shift, axis=axis)
    for k in range(nbits):
        bit = ((u >> k) & 1).astype(bool).reshape(mshape)
        y = jnp.where(bit, jnp.roll(y, 1 << k, axis=axis), y)
    if frac is not None:
        f = frac.astype(x.dtype).reshape(mshape)
        one = jnp.asarray(1.0, x.dtype)
        y = y * (one - f) + jnp.roll(y, 1, axis=axis) * f
    # validity: 0 <= coord - shift <= size-1 along the shifted axis
    coord = jnp.arange(size, dtype=jnp.float32)
    if axis == 2:
        cs = coord[None, None, :] - shift[:, :, None]      # (B,H,W)
    else:
        cs = coord[None, :, None] - shift[:, None, :]      # (B,H,W)
    valid = ((cs >= -0.5) & (cs <= size - 0.5))[..., None]
    return jnp.where(valid, y, fill.reshape(b, 1, 1, 1).astype(x.dtype))


def _roll(x, shift: int, axis: int):
    """Static roll as slice+concat (measured ~10% faster than jnp.roll on
    the target v5e for masked barrel stages)."""
    shift = shift % x.shape[axis]
    if shift == 0:
        return x
    lo = jax.lax.slice_in_dim(x, x.shape[axis] - shift, x.shape[axis], axis=axis)
    hi = jax.lax.slice_in_dim(x, 0, x.shape[axis] - shift, axis=axis)
    return jnp.concatenate([lo, hi], axis=axis)


def _barrel_shift_u8(x, shift, axis: int, fill_u8, nearest: bool,
                     max_shift: int, nearest_tail: int = 0):
    """uint8 barrel shifter: integer roll ladder + fixed-point fractional
    lerp + fill mask.  Half the HBM traffic of the bf16 ladder, and faithful
    to the reference chain, which quantizes to uint8 between every PIL/cv2
    step.

    ``nearest_tail``: number of trailing channels that take the
    nearest-neighbor value instead of the fractional lerp (lets class-id
    label planes ride the same ladder as the image planes —
    ``nearest = frac >= 0.5 ? next : current`` == round(shift) given the
    floor-based integer ladder).  ``fill_u8`` may be per-channel.
    """
    b = x.shape[0]
    c = x.shape[-1]
    size = x.shape[axis]
    if nearest:
        s_int = jnp.round(shift)
        w8 = None
    else:
        s_int = jnp.floor(shift)
        w8 = jnp.round((shift - s_int) * 256.0).astype(jnp.int32)
    u = jnp.clip(s_int, -max_shift, max_shift - 1).astype(jnp.int32) + max_shift
    nbits = max(1, (2 * max_shift - 1).bit_length())
    mshape = (b, size, 1, 1) if axis == 2 else (b, 1, size, 1)

    y = _roll(x, -max_shift, axis)
    for k in range(nbits):
        bit = ((u >> k) & 1).astype(bool).reshape(mshape)
        y = jnp.where(bit, _roll(y, 1 << k, axis), y)
    if w8 is not None:
        w = w8.reshape(mshape)
        y_next = _roll(y, 1, axis)
        lerp = ((y.astype(jnp.int32) * (256 - w)
                 + y_next.astype(jnp.int32) * w + 128) >> 8).astype(jnp.uint8)
        if nearest_tail > 0:
            near = jnp.where(w >= 128, y_next, y)
            ch = jnp.arange(c) >= c - nearest_tail
            y = jnp.where(ch[None, None, None, :], near, lerp)
        else:
            y = lerp
    coord = jnp.arange(size, dtype=jnp.float32)
    if axis == 2:
        cs = coord[None, None, :] - shift[:, :, None]
    else:
        cs = coord[None, :, None] - shift[:, None, :]
    valid = ((cs >= -0.5) & (cs <= size - 0.5))[..., None]
    fill = jnp.broadcast_to(jnp.asarray(fill_u8, jnp.uint8), (c,))
    return jnp.where(valid, y, fill[None, None, None, :])


_M_LO = np.uint32(0x00FF00FF)   # bytes 0 and 2 as 16-bit fields
_RND = np.uint32(0x00800080)    # +128 rounding per field


def _pack_u32(planes_u8):
    """(B, H, W, 4) uint8 -> (B, H, W) uint32 (one lane per pixel)."""
    return jax.lax.bitcast_convert_type(planes_u8, jnp.uint32)


def _unpack_u32(packed):
    """(B, H, W) uint32 -> (B, H, W, 4) uint8."""
    return jax.lax.bitcast_convert_type(packed, jnp.uint8)


def _barrel_shift_packed(y, shift, axis: int, fill_u32, max_shift: int,
                         nearest_tail: bool, radix4: bool = False):
    """uint32-packed barrel shifter: 4 uint8 planes ride one 32-bit lane.

    Same ladder + fixed-point fractional lerp as :func:`_barrel_shift_u8`
    (bit-exact per byte), but every roll/select stage moves 4x fewer
    elements.  The lerp is SWAR: even/odd bytes are split into 16-bit
    fields of two uint32 words; per-field products stay < 2^16 because the
    two weights sum to 256, so no cross-field carries.

    ``radix4`` processes TWO shift bits per stage (4-way select over rolls
    by 0/1/2/3 << k): per 2 bits it touches 5 arrays instead of the binary
    ladder's 6 — ~17% less ladder traffic if XLA fuses the select tree.

    ``nearest_tail``: byte 3 (the label plane) takes the nearest-neighbor
    value instead of the lerp.  ``fill_u32``: packed per-byte fill word.
    """
    b = y.shape[0]
    size = y.shape[axis]
    s_int = jnp.floor(shift)
    w8 = jnp.round((shift - s_int) * 256.0).astype(jnp.uint32)
    u = jnp.clip(s_int, -max_shift, max_shift - 1).astype(jnp.int32) + max_shift
    nbits = max(1, (2 * max_shift - 1).bit_length())
    mshape = (b, size, 1) if axis == 2 else (b, 1, size)

    y = _roll(y, -max_shift, axis)
    if radix4:
        for k in range(0, nbits, 2):
            if k + 1 < nbits:
                d = ((u >> k) & 3).reshape(mshape)
                lo = jnp.where(d % 2 == 1, _roll(y, 1 << k, axis), y)
                hi = jnp.where(d % 2 == 1, _roll(y, 3 << k, axis),
                               _roll(y, 2 << k, axis))
                y = jnp.where(d >= 2, hi, lo)
            else:
                bit = ((u >> k) & 1).astype(bool).reshape(mshape)
                y = jnp.where(bit, _roll(y, 1 << k, axis), y)
    else:
        for k in range(nbits):
            bit = ((u >> k) & 1).astype(bool).reshape(mshape)
            y = jnp.where(bit, _roll(y, 1 << k, axis), y)

    w = w8.reshape(mshape)
    y_next = _roll(y, 1, axis)
    lo = (((y & _M_LO) * (256 - w) + (y_next & _M_LO) * w + _RND) >> 8) & _M_LO
    hi = ((((y >> 8) & _M_LO) * (256 - w) + ((y_next >> 8) & _M_LO) * w
           + _RND) >> 8) & _M_LO
    lerp = lo | (hi << 8)
    if nearest_tail:
        near = jnp.where(w >= 128, y_next, y)
        y = (lerp & np.uint32(0x00FFFFFF)) | (near & np.uint32(0xFF000000))
    else:
        y = lerp

    coord = jnp.arange(size, dtype=jnp.float32)
    if axis == 2:
        cs = coord[None, None, :] - shift[:, :, None]
    else:
        cs = coord[None, :, None] - shift[:, None, :]
    valid = (cs >= -0.5) & (cs <= size - 0.5)
    return jnp.where(valid, y, fill_u32)


def _unpack_bytes(packed, lo: int, hi: int, dtype):
    """Extract bytes [lo, hi) of a packed uint32 word as a trailing channel
    dim via shifts (avoids a bitcast whose sliced consumers trigger a
    pathological 64 GB copy allocation in this platform's AOT compiler)."""
    chans = [((packed >> (8 * i)) & np.uint32(0xFF)).astype(dtype)
             for i in range(lo, hi)]
    return jnp.stack(chans, axis=-1)


def _rotate_packed(planes_u8, wp, fill_u8, max_angle_deg: float = 10.0,
                   two_shear: bool = False, unpack: bool = True,
                   radix4: bool = False):
    """uint32-packed shear rotation of 4 uint8 planes (image RGB + label).

    Bit-exact with :func:`_rotate_u8` (``nearest_tail=1``) in 3-shear mode.
    ``two_shear=True`` uses the Paeth 2-shear approximation
    ``X(-tan t) . Y(sin t cos t)`` — determinant-1 but with O(theta^2)
    (~1.5% at 10 deg) shape error, hidden under the reference's +-30%
    aspect-ratio jitter (dataloader.py:84); saves one full barrel ladder.
    ``unpack=False`` returns the packed (B, H, W) uint32 word (extract
    channels with :func:`_unpack_bytes`).
    """
    b, s, _, c4 = planes_u8.shape
    assert c4 == 4
    c = float(s // 2)
    rad = np.deg2rad(max_angle_deg)
    grid = jnp.arange(s, dtype=jnp.float32) - c
    fill_u32 = np.frombuffer(
        np.asarray(fill_u8, np.uint8).tobytes(), np.uint32)[0]
    y = _pack_u32(planes_u8)
    if two_shear:
        sint = wp[:, P_SINT][:, None]
        cost = jnp.sqrt(jnp.maximum(1.0 - sint * sint, 1e-6))
        sh_x = -(sint / cost) * grid[None, :]
        sh_y = (sint * cost) * grid[None, :]
        ms_x = int(np.ceil(np.tan(rad) * (s - c))) + 2
        ms_y = int(np.ceil(np.sin(rad) * np.cos(rad) * (s - c))) + 2
        y = _barrel_shift_packed(y, sh_x, 2, fill_u32, ms_x, True,
                                 radix4=radix4)
        y = _barrel_shift_packed(y, sh_y, 1, fill_u32, ms_y, True,
                                 radix4=radix4)
    else:
        tanh = wp[:, P_TANH][:, None]
        sint = wp[:, P_SINT][:, None]
        sh_x = -tanh * grid[None, :]
        sh_y = sint * grid[None, :]
        ms_x = int(np.ceil(np.tan(rad / 2) * (s - c))) + 2
        ms_y = int(np.ceil(np.sin(rad) * (s - c))) + 2
        y = _barrel_shift_packed(y, sh_x, 2, fill_u32, ms_x, True,
                                 radix4=radix4)
        y = _barrel_shift_packed(y, sh_y, 1, fill_u32, ms_y, True,
                                 radix4=radix4)
        y = _barrel_shift_packed(y, sh_x, 2, fill_u32, ms_x, True,
                                 radix4=radix4)
    return _unpack_u32(y) if unpack else y


def _rotate_u8(images_u8, wp, nearest: bool, fill_u8,
               max_angle_deg: float = 10.0, nearest_tail: int = 0):
    """uint8 Paeth 3-shear rotation (see :func:`_rotate`).

    ``nearest_tail``/per-channel ``fill_u8`` allow label planes to share the
    image ladder (one set of roll stages for all 4 planes).
    """
    b, s, _, _ = images_u8.shape
    c = float(s // 2)
    rad = np.deg2rad(max_angle_deg)
    ms_x = int(np.ceil(np.tan(rad / 2) * (s - c))) + 2
    ms_y = int(np.ceil(np.sin(rad) * (s - c))) + 2
    grid = jnp.arange(s, dtype=jnp.float32) - c
    tanh = wp[:, P_TANH][:, None]
    sint = wp[:, P_SINT][:, None]
    sh_x = -tanh * grid[None, :]
    sh_y = sint * grid[None, :]
    x = _barrel_shift_u8(images_u8, sh_x, 2, fill_u8, nearest, ms_x, nearest_tail)
    x = _barrel_shift_u8(x, sh_y, 1, fill_u8, nearest, ms_y, nearest_tail)
    x = _barrel_shift_u8(x, sh_x, 2, fill_u8, nearest, ms_x, nearest_tail)
    return x


def _rotate(images, wp, nearest: bool, fill, max_angle_deg: float = 10.0):
    """Paeth 3-shear rotation about the canvas center (cv2 semantics via the
    sign convention baked into make_warp_params).

    Barrel widths are sized from the worst-case angle: the x-shears shift by
    at most tan(max/2) * size/2, the y-shear by sin(max) * size/2.
    """
    b, s, _, _ = images.shape
    c = float(s // 2)
    rad = np.deg2rad(max_angle_deg)
    ms_x = int(np.ceil(np.tan(rad / 2) * (s - c))) + 2
    ms_y = int(np.ceil(np.sin(rad) * (s - c))) + 2
    grid = jnp.arange(s, dtype=jnp.float32) - c
    tanh = wp[:, P_TANH][:, None]
    sint = wp[:, P_SINT][:, None]
    sh_x = -tanh * grid[None, :]   # per row (H): shift along W
    sh_y = sint * grid[None, :]    # per column (W): shift along H
    x = _barrel_shift(images, sh_x, 2, fill, nearest, ms_x)
    x = _barrel_shift(x, sh_y, 1, fill, nearest, ms_y)
    x = _barrel_shift(x, sh_x, 2, fill, nearest, ms_x)
    return x


def rotation_first_order(angles: "np.ndarray") -> "np.ndarray":
    """Host-side permutation putting rotating samples first.

    Training batches are order-free, so the loader can apply this permutation
    to (images, labels, params) and pass ``rotate_capacity`` to
    :func:`augment_batch_einsum` — the 3-shear barrels then run on a fixed
    prefix instead of the whole batch (only ~25% of images rotate,
    dataloader.py:125).
    """
    angles = np.asarray(angles)
    return np.argsort(angles == 0, kind="stable")


@functools.partial(jax.jit, static_argnames=("dst_hw", "letterbox",
                                             "normalized", "rotate",
                                             "rotate_capacity",
                                             "blur_capacity", "two_shear",
                                             "int8_resample", "radix4"))
def augment_batch_einsum(images, labels, params, dst_hw: Tuple[int, int],
                         letterbox: bool = False, normalized: bool = True,
                         rotate: bool = True, rotate_capacity: int = 0,
                         blur_capacity: int = 0, two_shear: bool = False,
                         int8_resample: bool = False, radix4: bool = False):
    """Fast-path equivalent of :func:`cervical_tpu.ops.augment.augment_batch`.

    ``rotate_capacity`` > 0 restricts the shear rotation to the first K
    samples (use with ``sample_augment_params(rotate_prefix=K)``); 0 rotates
    the full batch.  ``blur_capacity`` > 0 likewise restricts the 5x5 blur
    to the *last* K samples (``blur_suffix=K``).  ``two_shear`` opts into
    the faster 2-shear rotation approximation (see :func:`_rotate_packed`).
    ``int8_resample`` routes the separable resample through the MXU's int8
    path (:func:`_resample_int8` — labels stay exact, images quantize to
    uint8 between passes like the reference chain does, and the pipeline
    carries uint8 between stages).
    Returns (images (B, S, S, 3) bf16 — [0,1] if normalized else [0,255] —
    labels (B, S, S) uint8 class ids, matching the pallas backend).
    """
    s = dst_hw[0]
    b = images.shape[0]
    wp = make_warp_params(params, images.shape[1:3], dst_hw,
                          letterbox=letterbox)
    fill = wp[:, P_FILL]

    if int8_resample:
        img = _resample_int8(images, wp, s, fill=fill)
        lbl = _resample_labels_int8(labels[..., None], wp, s)
    else:
        img = _resample(images, wp, s, nearest=False, fill=fill)
        lbl = _resample(labels[..., None], wp, s, nearest=True,
                        fill=jnp.zeros_like(fill))
        lbl = jnp.round(lbl.astype(jnp.float32)).astype(jnp.uint8)

    if letterbox:
        out = img
        if normalized:
            out = (out.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        return out.astype(jnp.bfloat16), lbl[..., 0]

    # batched fused HSV with the /255 normalization folded into the same
    # elementwise pass; drop to bf16 right after (the blur is a convex
    # combination, so bf16 keeps error <= 1 count on the [0,255] scale)
    # — blur is linear, so normalizing before it is exact.
    scale = (1.0 / 255.0) if normalized else 1.0

    def _hsv(x, gains):
        # closed-form HSV with the /255 fold + per-channel bf16 stack
        # (in-context 29 -> 24 ms at B=1024 512^2; bench_einsum_stages.py)
        return aug.hsv_jitter_batched_fast(x, gains, scale)

    def _rotate_head(k):
        if img.dtype == jnp.uint8:
            img_u8 = img[:k]
        else:
            img_u8 = jnp.clip(jnp.round(img[:k].astype(jnp.float32)),
                              0, 255).astype(jnp.uint8)
        # the label plane rides the image ladder as a 4th uint8 channel
        # (nearest-neighbor via the tail-channel mode, fill 0), all four
        # packed into one uint32 lane per pixel
        planes = jnp.concatenate([img_u8, lbl[:k]], axis=-1)
        return _rotate_packed(planes, wp[:k],
                              np.array([128, 128, 128, 0], np.uint8),
                              two_shear=two_shear, unpack=False,
                              radix4=radix4)

    k = (rotate_capacity if rotate_capacity > 0 else b) if rotate else 0
    if 0 < k and 0 < blur_capacity and k + blur_capacity <= b:
        # piecewise fast path (measured 1.5x on target, B=1024, k=m=B/4):
        # the rotated prefix, untouched middle and blur suffix stay separate
        # through HSV/blur and meet in ONE final concat — the fallback below
        # pays a full-batch concat after the rotation AND a second
        # slice+concat around the blur tail.
        m = blur_capacity
        rot = _rotate_head(k)
        lbl = jnp.concatenate([_unpack_bytes(rot, 3, 4, jnp.uint8),
                               lbl[k:]], axis=0)
        # reference photometric order: blur (dataloader.py:118) BEFORE the
        # HSV jitter (:137) — linear blur and the nonlinear HSV map do not
        # commute.  The blur runs on the bf16 [0,255] resample output.
        tail_in = img[b - m:]
        if tail_in.dtype == jnp.uint8:
            tail_in = tail_in.astype(jnp.bfloat16)
        tail = jnp.where(params["blur"][b - m:, None, None, None],
                         aug.gaussian_blur_einsum(tail_in), tail_in)
        tail = _hsv(tail, params["gains"][b - m:])
        pieces = [_hsv(_unpack_bytes(rot, 0, 3, jnp.bfloat16),
                       params["gains"][:k])]
        if k < b - m:
            pieces.append(_hsv(img[k:b - m], params["gains"][k:b - m]))
        pieces.append(tail)
        return jnp.concatenate(pieces, axis=0), lbl[..., 0]

    if img.dtype == jnp.uint8:
        # the piecewise fast path above keeps uint8 until HSV; the fallback
        # branches below mix rotated bf16 with the resample output, so
        # unify here (slow path only)
        img = img.astype(jnp.bfloat16)
    if k > 0:
        rot = _rotate_head(k)
        img = jnp.concatenate([_unpack_bytes(rot, 0, 3, jnp.bfloat16),
                               img[k:]], axis=0)
        lbl = jnp.concatenate([_unpack_bytes(rot, 3, 4, jnp.uint8),
                               lbl[k:]], axis=0)

    # blur BEFORE HSV (reference order, dataloader.py:118 vs :137)
    if blur_capacity > 0:
        tail = img[-blur_capacity:]
        tail = jnp.where(params["blur"][-blur_capacity:, None, None, None],
                         aug.gaussian_blur_einsum(tail), tail)
        img = jnp.concatenate([img[:-blur_capacity], tail], axis=0)
    else:
        blurred = aug.gaussian_blur_einsum(img)
        img = jnp.where(params["blur"][:, None, None, None], blurred, img)
    out = _hsv(img, params["gains"])
    return out, lbl[..., 0]
