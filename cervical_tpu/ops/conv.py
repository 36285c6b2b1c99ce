"""Switchable conv formulations: XLA conv vs einsum/im2col.

Rebuilds the reference's cuDNN conv calls (Segmentation/deeplabv3+/nets/
xception.py, mobilenetv2.py, deeplabv3_plus.py; MultiModal Graph_Structure
ResNet) behind one drop-in module with two lowering strategies.

Measured on the target chip (scripts/bench_conv_variants.py,
scripts/bench_seg_step.py):

* **standalone** conv programs run far below the MXU roofline (1x1 conv
  0.58 TFLOP/s vs 5.98 as an einsum — 10.2x; dense 3x3 1.7 vs 5.7 TFLOP/s
  via 9 static shifted slices + one einsum — 3.3x) — an isolated-program
  layout artifact;
* **inside the fused train step** both lowerings reach the same ~6 TFLOP/s
  (mobilenet 136 vs 146 ms/step, xception 192 vs 199 ms/step), while the
  einsum program compiles ~10x slower through the remote AOT helper
  (xception step: 73 s vs 689 s).

* **batch-1 inference** (the get_FPS shape, deeplab.py:211-264): lax 5.1
  vs einsum 7.6 ms/image at steady state (ABAB-ordered runs,
  scripts/bench_predict.py).  Beware: the first benchmarked program in a
  process pays ~+18 ms/call on this tunnel regardless of backend — a
  single A/B run misattributes that warm-up to whichever variant runs
  first (this initially looked like a 61x einsum win; it was not).

Hence the default backend is "lax" everywhere; the einsum lowering stays
switchable (``set_default_backend``/``backend_scope``/``backend=`` per
call site) for toolchains or program shapes where the standalone-conv
pathology applies.  Depthwise convs have their own shift-based path
(ops/depthwise.py).

:class:`Conv` is a drop-in for ``flax.linen.Conv`` for the cases this
framework uses (2-D, groups=1, int/SAME padding, static stride/dilation):
same parameter names/shapes ("kernel" HWIO, "bias"), same initializers,
same dtype promotion — checkpoints and the torch importer are unaffected.
The backend choice is made at trace time.
"""

import contextlib
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

_DEFAULT_BACKEND = "lax"


def set_default_backend(name: str) -> None:
    """Globally select "lax" (default) or "einsum" for :class:`Conv`."""
    global _DEFAULT_BACKEND
    if name not in ("einsum", "lax"):
        raise ValueError(f"unknown conv backend {name!r}")
    _DEFAULT_BACKEND = name


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


@contextlib.contextmanager
def backend_scope(name: str):
    """Temporarily select the conv backend for code traced inside the scope.

    The backend is read at trace time, so wrap the *first traced call* (or
    the function body), not the ``jax.jit`` wrapper.  The predictor traces
    under this scope so its ``conv_backend`` argument stays decoupled from
    the process-global default.
    """
    global _DEFAULT_BACKEND
    if name not in ("einsum", "lax"):
        raise ValueError(f"unknown conv backend {name!r}")
    prev = _DEFAULT_BACKEND
    _DEFAULT_BACKEND = name
    try:
        yield
    finally:
        _DEFAULT_BACKEND = prev


def _resolve_pad(padding, kernel, dilation, stride, size) -> Tuple[int, int]:
    """Per-dimension (lo, hi) padding matching flax/XLA semantics."""
    if padding == "SAME":
        out = -(-size // stride)  # ceil
        total = max((out - 1) * stride + dilation * (kernel - 1) + 1 - size, 0)
        return total // 2, total - total // 2
    return int(padding), int(padding)


def conv2d_im2col(x, w, stride=(1, 1), padding=(0, 0), dilation=(1, 1)):
    """NHWC 2-D conv as static shifted slices + one einsum.

    ``w`` is HWIO.  ``padding`` is ((lo, hi), (lo, hi)) or (int, int) for
    symmetric.  The kh*kw slices are statically strided views of the padded
    input — no gathers (XLA scalarizes gathers on the target platform).
    """
    kh, kw, ci, co = w.shape
    sh, sw = stride
    dh, dw = dilation
    (plo_h, phi_h), (plo_w, phi_w) = [
        p if isinstance(p, tuple) else (p, p) for p in padding]
    b, h, wd, c = x.shape
    ho = (h + plo_h + phi_h - dh * (kh - 1) - 1) // sh + 1
    wo = (wd + plo_w + phi_w - dw * (kw - 1) - 1) // sw + 1
    if kh == kw == 1 and not (plo_h or phi_h or plo_w or phi_w):
        xs = x[:, ::sh, ::sw, :] if (sh, sw) != (1, 1) else x
        return jnp.einsum("bhwc,cd->bhwd", xs[:, :ho, :wo, :], w[0, 0])
    xp = jnp.pad(x, ((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)))
    cols = [xp[:, dy * dh: dy * dh + (ho - 1) * sh + 1: sh,
               dx * dw: dx * dw + (wo - 1) * sw + 1: sw, :]
            for dy in range(kh) for dx in range(kw)]
    patches = jnp.concatenate(cols, axis=-1) if len(cols) > 1 else cols[0]
    return jnp.einsum("bhwk,kd->bhwd", patches, w.reshape(kh * kw * ci, co))


class Conv(nn.Module):
    """Drop-in ``nn.Conv`` computing through :func:`conv2d_im2col`.

    Deliberately named ``Conv`` so flax's automatic submodule naming
    ("Conv_0", ...) matches ``nn.Conv`` where call sites omit ``name=``.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int, Sequence[int]] = "SAME"
    kernel_dilation: Union[int, Sequence[int]] = 1
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        sh, sw = ((self.strides,) * 2 if isinstance(self.strides, int)
                  else tuple(self.strides))
        dh, dw = ((self.kernel_dilation,) * 2
                  if isinstance(self.kernel_dilation, int)
                  else tuple(self.kernel_dilation))
        ci = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, ci, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)

        # canonicalize padding like nn.Conv: "SAME" | int (both dims) |
        # per-dim sequence of ints or (lo, hi) pairs
        pad = self.padding
        if not isinstance(pad, str):
            if isinstance(pad, int):
                pad = (pad, pad)
            pad = tuple((p, p) if isinstance(p, int) else (int(p[0]),
                                                           int(p[1]))
                        for p in pad)
            if len(pad) != 2:
                raise ValueError(f"need 2 spatial pad entries, got {pad}")

        backend = self.backend or _DEFAULT_BACKEND
        if backend == "lax" or self.feature_group_count > 1:
            y = lax.conv_general_dilated(
                x, kernel, (sh, sw), pad, rhs_dilation=(dh, dw),
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            if isinstance(pad, str):
                pad = (_resolve_pad(pad, kh, dh, sh, x.shape[1]),
                       _resolve_pad(pad, kw, dw, sw, x.shape[2]))
            y = conv2d_im2col(x, kernel, (sh, sw), pad, (dh, dw))
        if bias is not None:
            y = y + bias
        return y
