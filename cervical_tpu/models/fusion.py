"""FusionMAE — the multimodal graph + masked-autoencoder fusion classifier.

One parameterized, fully batched flax module replacing the reference's eight
near-duplicate model files (``MultiModal Prediction/{Four,Three,Two}_Modal/
my_mae_model*.py``).  The modality subset is a static config tuple — e.g.
``("imgN", "imgA", "imgL", "cli")`` for the four-modal model,
``("imgN", "cli")`` for the NC two-modal variant — which reproduces every one
of the reference's 11 training configurations from a single class.

Architecture (reference: ``fusion_model_mae_2``, my_mae_model.py:399-793):

  per modality: dense SAGE conv (1024->512) -> ReLU -> GraphNorm -> Dropout
                -> gated-attention pool #1                     [stage 1]
  modality tokens (B, T, 512) -> TokenMAE (mask/reconstruct)   [fusion]
                -> MixerBlock (optional)
  residual:     node features += reconstructed modality token
  per modality: gated-attention pool #2 -> L2 normalize        [stage 2]
                -> MLP tower 512->128->32->8 -> head 8->num_classes
  fused:        one_x = masked mean of tower outputs -> head

TPU-first design decisions (vs. the reference):

* graphs are dense: the 16-node grid / 4-node cli topologies are static, so
  SAGEConv is two MXU matmuls against a precomputed row-normalized adjacency
  (see :mod:`cervical_tpu.ops.graph`) — no scatter kernels.
* everything is batched ``(B, ...)``; the reference's per-patient Python loop
  and batch-of-one forward (my_train(full).py:228-248) become one ``jit``.
* missing modalities are a ``present`` boolean mask, not a different code
  path: tokens are zeroed at absent slots (== the reference's ``tmp_x``
  zero-padding, my_mae_model.py:608-622) and absent heads are masked out of
  the fused mean, keeping one compiled shape for all 2^T - 1 presence
  patterns.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from cervical_tpu.models.layers import GatedAttentionPool, GraphNorm, MixerBlock
from cervical_tpu.models.mae import TokenMAE
from cervical_tpu.ops import graph as graph_ops

IMAGE_MODALITIES = ("imgN", "imgA", "imgL")
ALL_MODALITIES = ("imgN", "imgA", "imgL", "cli")


def default_adjacency(modalities: Tuple[str, ...],
                      image_grid=(4, 4), cli_nodes=4) -> Dict[str, np.ndarray]:
    """Row-normalized (mean-aggregation) adjacency per modality.

    Images: 4x4-grid 8-neighborhood (Graph_Structure(data_augmentation).py:
    338-355); cli: fully-connected (``get_edge_index_cli``, :367-376).
    """
    out = {}
    for m in modalities:
        if m == "cli":
            adj = graph_ops.full_adjacency(cli_nodes)
        else:
            adj = graph_ops.grid_adjacency(*image_grid)
        out[m] = graph_ops.mean_agg_matrix(adj)
    return out


class DenseSAGEConv(nn.Module):
    """PyG ``SAGEConv`` with mean aggregation as two dense matmuls.

    ``out = lin_l(mean_neighbors(x)) + lin_r(x)`` with bias only on ``lin_l``,
    matching PyG's parameterization (my_mae_model.py:404-416).
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, agg):
        neigh = jnp.einsum("nm,bmf->bnf", jnp.asarray(agg, x.dtype), x)
        out = nn.Dense(self.features, dtype=self.dtype, name="lin_l")(neigh)
        out = out + nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                             name="lin_r")(x)
        return out


class FusionMAE(nn.Module):
    """The fusion classifier.  See module docstring.

    Call signature::

        out = model.apply(vars, node_feats, present=..., mae_mask=...,
                          deterministic=..., rngs={'dropout': key})

    * ``node_feats``: dict modality -> (B, N_m, in_features) float arrays.
    * ``present``: (B, T) bool — which modality slots actually carry data
      (default: all).  Absent slots reproduce the reference's
      missing-modality imputation path.
    * ``mae_mask``: (B, T) bool — slots hidden from the MAE encoder (training
      uses exactly T-1 True entries per row, see
      :func:`cervical_tpu.data.masks.generate_modal_masks`; eval uses all
      False).  Must never mask a row completely while ``present`` has data.

    Returns a dict: ``logits`` (per-head dict incl. "all"), ``one_x``,
    ``multi_x``, ``fea``, ``mae_out``, ``mae_labels``, ``att1``, ``att2``.
    """

    modalities: Tuple[str, ...] = ALL_MODALITIES
    in_features: int = 1024
    hidden: int = 512  # "out_classes" in the reference's constructor
    num_classes: int = 4
    dropout: float = 0.3
    mix: bool = True
    image_grid: Tuple[int, int] = (4, 4)
    cli_nodes: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_feats, present=None, mae_mask=None,
                 deterministic: bool = True):
        mods = self.modalities
        T = len(mods)
        b = node_feats[mods[0]].shape[0]
        for m in mods:
            if node_feats[m].shape[-1] != self.in_features:
                raise ValueError(
                    f"{m} features have width {node_feats[m].shape[-1]}, "
                    f"expected in_features={self.in_features}")
        adj = default_adjacency(mods, self.image_grid, self.cli_nodes)

        if present is None:
            present = jnp.ones((b, T), bool)
        if mae_mask is None:
            mae_mask = jnp.zeros((b, T), bool)

        # -- stage 1: per-modality GNN + gated-attention pool -------------
        h = {}
        att1 = {}
        pooled1 = []
        for m in mods:
            x = DenseSAGEConv(self.hidden, dtype=self.dtype, name=f"{m}_gnn")(
                node_feats[m], adj[m])
            x = nn.relu(x)
            x = GraphNorm(self.hidden, dtype=self.dtype, name=f"{m}_norm")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            p, g = GatedAttentionPool(self.hidden, dtype=self.dtype,
                                      name=f"mpool_{m}")(x)
            h[m] = x
            att1[m] = g
            pooled1.append(p)
        pool_x = jnp.stack(pooled1, axis=1)  # (B, T, D)
        mae_labels = pool_x

        # -- MAE fusion + mixer + residual re-injection -------------------
        mae_out = None
        if T > 1:
            tokens = pool_x * present[..., None].astype(pool_x.dtype)
            mae_x = TokenMAE(embed_dim=self.hidden,
                             decoder_num_classes=self.hidden,
                             num_tokens=T, dtype=self.dtype, name="mae")(
                tokens, mae_mask, deterministic=deterministic)
            mae_out = mae_x
            if self.mix:
                mae_x = MixerBlock(T, self.hidden, dtype=self.dtype,
                                   name="mixer")(mae_x)
            for i, m in enumerate(mods):
                h[m] = h[m] + mae_x[:, i][:, None, :]

        # -- stage 2: second pool + L2 normalize ---------------------------
        att2 = {}
        pooled2 = []
        for m in mods:
            p, g = GatedAttentionPool(self.hidden, dtype=self.dtype,
                                      name=f"mpool_{m}_2")(h[m])
            att2[m] = g
            pooled2.append(p)
        fea = jnp.stack(pooled2, axis=1)  # (B, T, D)
        fea = fea / jnp.maximum(
            jnp.linalg.norm(fea.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
        ).astype(fea.dtype)

        # -- per-modality MLP towers + heads -------------------------------
        logits = {}
        tower_outs = []
        for i, m in enumerate(mods):
            x = fea[:, i]
            x = nn.Dense(self.hidden // 4, dtype=self.dtype, name=f"lin1_{m}")(x)
            x = nn.relu(x)
            x = GraphNorm(self.hidden // 4, dtype=self.dtype, name=f"norm1_{m}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.Dense(self.hidden // 16, dtype=self.dtype, name=f"lin2_{m}")(x)
            x = nn.relu(x)
            x = GraphNorm(self.hidden // 16, dtype=self.dtype, name=f"norm2_{m}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.Dense(self.hidden // 64, dtype=self.dtype, name=f"lin3_{m}")(x)
            logits[m] = nn.Dense(self.num_classes, dtype=self.dtype,
                                 name=f"classifier_{m}")(x)
            tower_outs.append(x)

        multi_x = jnp.stack(tower_outs, axis=1)  # (B, T, 8)
        pmask = present[..., None].astype(multi_x.dtype)
        one_x = jnp.sum(multi_x * pmask, axis=1) / jnp.maximum(
            jnp.sum(pmask, axis=1), 1.0)
        logits["all"] = nn.Dense(self.num_classes, dtype=self.dtype,
                                 name="classifier")(one_x)

        return {
            "logits": logits,
            "one_x": one_x,
            "multi_x": multi_x,
            "fea": fea,
            "mae_out": mae_out,
            "mae_labels": mae_labels,
            "att1": att1,
            "att2": att2,
        }
