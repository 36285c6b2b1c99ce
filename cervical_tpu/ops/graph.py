"""Dense static-graph operators.

The reference builds torch_geometric sparse graphs with *fixed* topology —
a 16-node 4x4-grid 8-neighborhood for every image modality
(``MultiModal Prediction/Graph_Structure(data_augmentation).py:325-365``) and a
fully-connected 4-node graph for the age ("cli") features (``:367-376``).
Because topology is static and tiny, sparse scatter/gather (PyG's CUDA kernels)
is the wrong tool on TPU: we precompute dense normalized adjacency matrices
once and turn every graph conv into two matmuls that run on the MXU and batch
trivially under ``vmap``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def grid_adjacency(rows=4, cols=4, include_diagonals=True):
    """Dense 8-neighborhood adjacency of a rows x cols patch grid.

    Node index = row-major patch index, matching the reference's
    filename-derived patch order (Graph_Structure:357-364).  Returns a
    float32 ``(rows*cols, rows*cols)`` 0/1 matrix with no self loops — the
    dense equivalent of the hand-written neighbor dict at
    Graph_Structure:338-355.
    """
    n = rows * cols
    adj = np.zeros((n, n), np.float32)
    for r in range(rows):
        for c in range(cols):
            i = r * cols + c
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if dr == 0 and dc == 0:
                        continue
                    if not include_diagonals and abs(dr) + abs(dc) == 2:
                        continue
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < rows and 0 <= cc < cols:
                        adj[i, rr * cols + cc] = 1.0
    return adj


def full_adjacency(n):
    """Fully-connected adjacency (no self loops) — the cli graph
    (``get_edge_index_full``, Four_Modal/util.py:69-77)."""
    adj = np.ones((n, n), np.float32) - np.eye(n, dtype=np.float32)
    return adj


def mean_agg_matrix(adj):
    """Row-normalized adjacency D^-1 A: matmul with it == mean over neighbors.

    This is the dense form of PyG SAGEConv's default mean aggregation
    (my_mae_model.py:404-416 uses ``SAGEConv`` which computes
    ``W_l @ mean_j(x_j) + W_r @ x_i``).
    """
    adj = np.asarray(adj, np.float32)
    deg = np.maximum(adj.sum(axis=1, keepdims=True), 1.0)
    return adj / deg


def edge_index_from_adjacency(adj):
    """(2, E) COO edge index from a dense adjacency — interop/debug helper for
    comparing against the reference's torch_geometric representation."""
    src, dst = np.nonzero(np.asarray(adj))
    return np.stack([src, dst], axis=0)


def sage_conv(x, agg, w_neigh, w_root, bias=None):
    """Dense GraphSAGE-mean convolution.

    ``out = mean_agg(x) @ w_neigh + x @ w_root (+ bias)`` — exactly PyG
    ``SAGEConv(in, out)`` with default mean aggregation, where ``w_neigh`` is
    ``lin_l.weight.T`` (with its bias) and ``w_root`` is ``lin_r.weight.T``.

    Shapes: x ``(..., N, F_in)``, agg ``(N, N)`` row-normalized adjacency.
    Batched over leading dims; the matmuls land on the MXU.
    """
    neigh = jnp.matmul(agg.astype(x.dtype), x)
    out = jnp.matmul(neigh, w_neigh) + jnp.matmul(x, w_root)
    if bias is not None:
        out = out + bias
    return out
