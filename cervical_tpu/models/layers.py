"""Shared neural-net building blocks (flax.linen).

TPU-native re-implementations of the primitives used by the reference's
multimodal model (``MultiModal Prediction/Four_Modal/mae_utils.py`` and
``my_mae_model.py``):

* :class:`GraphNorm` — torch_geometric ``LayerNorm(mode='graph')`` semantics
  (normalize over *all* nodes x channels of one sample, per-channel affine) as
  used by ``GNN_relu_Block`` (my_mae_model.py:385-397) and ``MixerBlock``
  (:345-369).  This differs from standard rowwise LayerNorm — parity requires
  the graph-wide statistics.
* :class:`GatedAttentionPool` — ``my_GlobalAttention`` (my_mae_model.py:35-63).
  The reference's ``batch`` vector is constant zero (:548), so the
  scatter-softmax collapses to a plain softmax over nodes followed by a
  weighted sum: one matmul-friendly, batchable op, no scatter kernels.
* :class:`ViTSelfAttention` / :class:`ViTBlock` / :class:`Mlp` — the timm-style
  blocks from mae_utils.py:38-134, including the ``head_dim = dim //
  num_heads`` truncation quirk (512 dims / 12 heads -> 42*12 = 504 inner dims)
  and the optional layer-scale gammas.
* :class:`MixerBlock` — the token/channel MLP-mixer (my_mae_model.py:338-369).
* :func:`sinusoid_encoding_table` — mae_utils.py:137-147.
* :func:`drop_path` — per-sample stochastic depth (identity at the reference's
  effective rate of 0: ``linspace(0, 0.3, depth=1) == [0.0]``).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid position encodings (mae_utils.py:137-147). Returns (n, d)."""
    position = np.arange(n_position)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = position / np.power(10000, 2 * (hid // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Per-sample stochastic depth (timm ``drop_path``, mae_utils.py:24-35)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# the reference MAE stack xavier-inits every Linear inside the ViT
# encoder/decoder (_init_weights, my_mae_model.py:112-118,182-188); torch
# LayerNorm eps is 1e-5 (flax default is 1e-6)
_XAVIER = nn.initializers.xavier_uniform()


class GraphNorm(nn.Module):
    """torch_geometric ``LayerNorm(in_channels, mode='graph')``.

    Normalizes each sample over all remaining axes jointly (nodes x channels),
    then applies a per-channel affine.  With a single 1-D feature vector this
    coincides with standard LayerNorm, which is how the reference's tower
    norms (my_mae_model.py:471-478) behave on (128,)/(32,) vectors.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        axes = tuple(range(1, x.ndim)) if x.ndim > 1 else (0,)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        # PyG's graph-mode LayerNorm (batch=None path, the reference's call
        # pattern inside nn.Sequential) divides by std(unbiased=False) + eps
        # — eps OUTSIDE the sqrt, unlike torch LayerNorm.  Verified against
        # the PyG-formula shim in tests/test_torch_fusion_parity.py.
        y = (xf - mean) / (jnp.sqrt(var) + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class GatedAttentionPool(nn.Module):
    """Gated attention pooling over graph nodes.

    ``gate = softmax(W2 relu(W1 x))`` over the node axis; ``out = sum(gate*x)``.
    Reference: ``my_GlobalAttention`` with
    ``att_net = Linear(D, D//4) -> ReLU -> Linear(D//4, 1)``
    (my_mae_model.py:35-63,433-450).  The reference's segment softmax runs over
    a constant-zero batch vector, i.e. a single segment — so this is exact.

    Input ``(..., N, D)``; returns ``(pooled (..., D), gate (..., N, 1))``.
    """

    features: int  # D
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.features // 4, dtype=self.dtype, name="gate_fc1")(x)
        h = nn.relu(h)
        gate = nn.Dense(1, dtype=self.dtype, name="gate_fc2")(h)
        gate = jax.nn.softmax(gate.astype(jnp.float32), axis=-2).astype(x.dtype)
        pooled = jnp.sum(gate * x, axis=-2)
        return pooled, gate


class Mlp(nn.Module):
    """Transformer MLP (mae_utils.py:38-55): fc -> GELU -> fc -> dropout."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=_XAVIER, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=_XAVIER, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class ViTSelfAttention(nn.Module):
    """Multi-head self-attention (mae_utils.py:58-102).

    Replicates the reference's ``all_head_dim = (dim // num_heads) *
    num_heads`` truncation and the q/v-only bias trick (k bias fixed at zero)
    when ``qkv_bias`` is set.  Supports a boolean key mask so that restricting
    attention to visible tokens is algebraically identical to running on the
    packed visible subset (used by the MAE encoder).
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic: bool = True):
        head_dim = self.dim // self.num_heads
        all_head_dim = head_dim * self.num_heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(all_head_dim * 3, use_bias=False, dtype=self.dtype,
                       kernel_init=_XAVIER, name="qkv")(x)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (all_head_dim,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (all_head_dim,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(qkv.dtype)

        b, n, _ = x.shape
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        if key_mask is not None:
            neg = jnp.asarray(-1e9, attn.dtype)
            attn = jnp.where(key_mask[:, None, None, :], attn, neg)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, all_head_dim)
        out = nn.Dense(self.dim, dtype=self.dtype, kernel_init=_XAVIER,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class ViTBlock(nn.Module):
    """Pre-norm transformer block with optional layer scale
    (mae_utils.py:105-134)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic: bool = True):
        attn = ViTSelfAttention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            dtype=self.dtype, name="attn",
        )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x), key_mask=key_mask, deterministic=deterministic)
        if self.init_values > 0:
            gamma_1 = self.param("gamma_1",
                                 nn.initializers.constant(self.init_values), (self.dim,))
            attn = gamma_1 * attn

        if not deterministic and self.drop_path_rate > 0:
            attn = drop_path(attn, self.drop_path_rate, deterministic,
                             self.make_rng("dropout"))
        x = x + attn

        mlp_in = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                dtype=self.dtype, name="mlp")(mlp_in, deterministic=deterministic)
        if self.init_values > 0:
            gamma_2 = self.param("gamma_2",
                                 nn.initializers.constant(self.init_values), (self.dim,))
            y = gamma_2 * y
        if not deterministic and self.drop_path_rate > 0:
            y = drop_path(y, self.drop_path_rate, deterministic,
                          self.make_rng("dropout"))
        return x + y


class MixerBlock(nn.Module):
    """Token/channel MLP-mixer over the fused (T, D) modality-token matrix.

    Reference: ``MixerBlock`` (my_mae_model.py:345-369) — GraphNorm (PyG
    LayerNorm), token-mix MLP over the transposed matrix, residual, GraphNorm
    (same parameters — the reference reuses ``self.norm``), channel-mix MLP,
    residual.  Batched input ``(B, T, D)``.
    """

    tokens: int  # T = number of modality slots
    dim: int  # D
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        norm = GraphNorm(self.dim, dtype=self.dtype, name="norm")

        def mix_mlp(h, width, name):
            h = nn.Dense(width, dtype=self.dtype, name=f"{name}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(width, dtype=self.dtype, name=f"{name}_fc2")(h)

        y = norm(x)
        y = jnp.swapaxes(y, -1, -2)          # (B, D, T)
        y = mix_mlp(y, self.tokens, "token_mix")
        y = jnp.swapaxes(y, -1, -2)          # (B, T, D)
        x = x + y
        y = norm(x)                           # same GraphNorm params, as in ref
        x = x + mix_mlp(y, self.dim, "channel_mix")
        return x
