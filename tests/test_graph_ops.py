"""Tests for dense static-graph operators (reference:
Graph_Structure(data_augmentation).py:325-376, util.py:69-77)."""

import numpy as np
import jax.numpy as jnp

from cervical_tpu.ops import graph as g


def test_grid_adjacency_corner_edge_center_degrees():
    adj = g.grid_adjacency(4, 4)
    deg = adj.sum(1)
    # corners have 3 neighbors, edges 5, interior 8 (8-neighborhood)
    assert deg[0] == 3 and deg[3] == 3 and deg[12] == 3 and deg[15] == 3
    assert deg[1] == 5 and deg[4] == 5
    assert deg[5] == 8 and deg[10] == 8
    assert np.all(adj == adj.T)
    assert np.all(np.diag(adj) == 0)


def test_grid_adjacency_matches_reference_neighbor_dict():
    # Reference hand-written dict (Graph_Structure:338-355), node 0 row-major:
    # patch 0 neighbors {1, 4, 5}; patch 5 neighbors {0,1,2,4,6,8,9,10}
    adj = g.grid_adjacency(4, 4)
    np.testing.assert_array_equal(np.nonzero(adj[0])[0], [1, 4, 5])
    np.testing.assert_array_equal(np.nonzero(adj[5])[0], [0, 1, 2, 4, 6, 8, 9, 10])


def test_full_adjacency():
    adj = g.full_adjacency(4)
    assert adj.sum() == 12  # 4*3 directed edges == get_edge_index_full
    assert np.all(np.diag(adj) == 0)


def test_mean_agg_rows_sum_to_one():
    agg = g.mean_agg_matrix(g.grid_adjacency(4, 4))
    np.testing.assert_allclose(agg.sum(1), np.ones(16), rtol=1e-6)


def test_edge_index_roundtrip():
    adj = g.grid_adjacency(2, 2)
    ei = g.edge_index_from_adjacency(adj)
    assert ei.shape[0] == 2
    recon = np.zeros_like(adj)
    recon[ei[0], ei[1]] = 1
    np.testing.assert_array_equal(recon, adj)


def test_sage_conv_mean_aggregation():
    # identity weights -> output = mean(neighbors) + self
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))[None]
    adj = g.full_adjacency(4)
    agg = jnp.asarray(g.mean_agg_matrix(adj))
    w = jnp.eye(2)
    out = g.sage_conv(x, agg, w, w)
    manual = np.asarray(agg) @ np.asarray(x[0]) + np.asarray(x[0])
    np.testing.assert_allclose(np.asarray(out[0]), manual, rtol=1e-5)
