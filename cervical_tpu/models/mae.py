"""Modality-token masked autoencoder (static-shape TPU formulation).

Reference: ``PretrainVisionTransformer{Encoder,Decoder}`` and the combined
``PretrainVisionTransformer`` (MultiModal Prediction/Four_Modal/
my_mae_model.py:69-335).  The reference physically packs the visible tokens
(``x[~mask]``), runs the encoder on the packed subset, concatenates
``[x_vis + pe_vis, mask_token + pe_mask]``, decodes, then *reorders tokens
back to canonical order with a Python loop over mask flags* (:325-334).

That pack/concat/reorder dance is shape-dynamic and hostile to XLA.  The TPU
formulation used here is algebraically identical and fully static:

* encoder: run all ``T`` tokens through the blocks but restrict attention
  *keys* to visible tokens.  Softmax attention over exactly the visible key
  set + per-token MLP/LayerNorm is permutation-equivariant and independent of
  the masked queries, so visible positions compute exactly what the packed
  encoder would.
* decoder input: ``where(mask, mask_token, enc_out) + pos_embed`` in canonical
  order.  Full self-attention over all T tokens matches the reference's
  decoder (which also attends over all tokens); keeping canonical order from
  the start makes the reference's reorder loop a no-op.

Works on batches ``(B, T, D)`` with per-sample boolean masks ``(B, T)``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from cervical_tpu.models.layers import _XAVIER, ViTBlock, sinusoid_encoding_table


class MAEEncoder(nn.Module):
    """Linear token embed + sinusoid PE + masked ViT blocks + norm.

    Reference: ``PretrainVisionTransformerEncoder`` (my_mae_model.py:69-154)
    with ``patch_embed = nn.Linear(D, D)`` and ``num_classes=0`` (identity
    head).
    """

    embed_dim: int = 512
    depth: int = 1
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.3
    drop_path_rate: float = 0.3
    init_values: float = 0.0
    num_tokens: int = 4  # train_type_num
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens, visible, deterministic: bool = True):
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=_XAVIER, name="patch_embed")(tokens)
        pe = sinusoid_encoding_table(self.num_tokens, self.embed_dim)
        x = x + jnp.asarray(pe, x.dtype)
        # stochastic-depth decay rule: linspace(0, rate, depth) — for depth=1
        # this is [0.0], so drop-path is inert exactly as in the reference.
        for i in range(self.depth):
            dpr = 0.0 if self.depth == 1 else self.drop_path_rate * i / (self.depth - 1)
            x = ViTBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                self.drop_rate, self.attn_drop_rate, dpr, self.init_values,
                dtype=self.dtype, name=f"block{i}",
            )(x, key_mask=visible, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class MAEDecoder(nn.Module):
    """ViT blocks + norm + linear head over the full token set.

    Reference: ``PretrainVisionTransformerDecoder`` (my_mae_model.py:156-214),
    called with ``return_token_num=0`` so the head applies to every token.
    """

    embed_dim: int = 512
    num_classes: int = 512
    depth: int = 1
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.3
    drop_path_rate: float = 0.3
    init_values: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            dpr = 0.0 if self.depth == 1 else self.drop_path_rate * i / (self.depth - 1)
            x = ViTBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                self.drop_rate, self.attn_drop_rate, dpr, self.init_values,
                dtype=self.dtype, name=f"block{i}",
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=_XAVIER, name="head")(x)


class TokenMAE(nn.Module):
    """Encoder -> encoder_to_decoder -> mask-token substitution -> decoder.

    Reference: ``PretrainVisionTransformer.forward`` (my_mae_model.py:308-335).
    ``tokens``: (B, T, D) modality tokens; ``mask``: (B, T) bool, True = hidden
    from the encoder and reconstructed from the learnable mask token.  Returns
    (B, T, D) reconstructions in canonical token order.
    """

    embed_dim: int = 512
    decoder_num_classes: int = 512
    encoder_depth: int = 1
    decoder_depth: int = 1
    encoder_num_heads: int = 12
    decoder_num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.3
    drop_path_rate: float = 0.3
    init_values: float = 0.0
    num_tokens: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens, mask, deterministic: bool = True):
        visible = jnp.logical_not(mask)
        enc = MAEEncoder(
            self.embed_dim, self.encoder_depth, self.encoder_num_heads,
            self.mlp_ratio, self.qkv_bias, self.drop_rate, self.attn_drop_rate,
            self.drop_path_rate, self.init_values, self.num_tokens,
            dtype=self.dtype, name="encoder",
        )(tokens, visible, deterministic=deterministic)

        enc = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                       kernel_init=_XAVIER,
                       name="encoder_to_decoder")(enc)

        # trunc_normal_(std=.02, a=-std, b=std): the reference's wrapper
        # truncates at +-1 sigma, not timm/flax's +-2 (my_mae_model.py:66-67,289)
        mask_token = self.param(
            "mask_token",
            nn.initializers.truncated_normal(0.02, lower=-1.0, upper=1.0),
            (self.embed_dim,))
        pe = jnp.asarray(
            sinusoid_encoding_table(self.num_tokens, self.embed_dim), enc.dtype)
        dec_in = jnp.where(mask[..., None], mask_token.astype(enc.dtype), enc) + pe

        return MAEDecoder(
            self.embed_dim, self.decoder_num_classes, self.decoder_depth,
            self.decoder_num_heads, self.mlp_ratio, self.qkv_bias,
            self.drop_rate, self.attn_drop_rate, self.drop_path_rate,
            self.init_values, dtype=self.dtype, name="decoder",
        )(dec_in, deterministic=deterministic)
