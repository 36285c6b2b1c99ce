"""Tests for shared nn building blocks (reference: mae_utils.py,
my_mae_model.py:35-63,338-397)."""

import numpy as np
import jax
import jax.numpy as jnp

from cervical_tpu.models import layers
from cervical_tpu.data.masks import generate_modal_masks, imputation_masks


def test_sinusoid_encoding_matches_reference_formula():
    t = layers.sinusoid_encoding_table(4, 6)
    # position 0: sin(0)=0 at even dims, cos(0)=1 at odd dims
    np.testing.assert_allclose(t[0], [0, 1, 0, 1, 0, 1], atol=1e-7)
    # position 2, dim 0: sin(2 / 10000^0) = sin(2)
    np.testing.assert_allclose(t[2, 0], np.sin(2.0), rtol=1e-6)
    np.testing.assert_allclose(t[2, 1], np.cos(2.0), rtol=1e-6)
    np.testing.assert_allclose(t[1, 2], np.sin(1 / 10000 ** (2 / 6)), rtol=1e-6)


def test_graphnorm_graph_mode_statistics():
    """GraphNorm must normalize over nodes *and* channels jointly (PyG
    LayerNorm mode='graph'), unlike rowwise LayerNorm."""
    gn = layers.GraphNorm(4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4)).astype(np.float32))
    vars_ = gn.init(jax.random.PRNGKey(0), x)
    y = gn.apply(vars_, x)
    y = np.asarray(y)
    for b in range(2):
        np.testing.assert_allclose(y[b].mean(), 0.0, atol=1e-5)
        np.testing.assert_allclose(y[b].std(), 1.0, atol=1e-4)


def test_graphnorm_vector_equals_layernorm():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 8)).astype(np.float32))
    gn = layers.GraphNorm(8)
    vars_ = gn.init(jax.random.PRNGKey(0), x[0])
    got = jax.vmap(lambda v: gn.apply(vars_, v))(x)
    mean = x.mean(-1, keepdims=True)
    std = jnp.sqrt(x.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray((x - mean) / std),
                               rtol=1e-4, atol=1e-5)


def test_gated_attention_pool_softmax_weighted_sum():
    pool = layers.GatedAttentionPool(8)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 6, 8)).astype(np.float32))
    vars_ = pool.init(jax.random.PRNGKey(0), x)
    out, gate = pool.apply(vars_, x)
    assert out.shape == (2, 8)
    assert gate.shape == (2, 6, 1)
    np.testing.assert_allclose(np.asarray(gate.sum(axis=1)), np.ones((2, 1)),
                               rtol=1e-5)
    manual = np.sum(np.asarray(gate) * np.asarray(x), axis=1)
    np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-5)


def test_vit_attention_key_mask_equals_packed_subset():
    """Restricting attention keys to visible tokens must equal running the
    block on the physically packed visible subset (the reference's
    formulation, my_mae_model.py:143)."""
    dim, heads = 16, 4
    attn = layers.ViTSelfAttention(dim, heads)
    full = jnp.asarray(np.random.default_rng(3).normal(size=(1, 5, dim)).astype(np.float32))
    visible = jnp.array([[True, False, True, True, False]])
    vars_ = attn.init(jax.random.PRNGKey(0), full)

    masked_out = attn.apply(vars_, full, key_mask=visible)
    packed = full[:, np.array([0, 2, 3])]
    packed_out = attn.apply(vars_, packed)

    np.testing.assert_allclose(np.asarray(masked_out[:, np.array([0, 2, 3])]),
                               np.asarray(packed_out), rtol=1e-4, atol=1e-5)


def test_vit_block_shapes_and_determinism():
    blk = layers.ViTBlock(32, num_heads=4, attn_drop=0.3)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 4, 32)).astype(np.float32))
    vars_ = blk.init(jax.random.PRNGKey(0), x)
    y1 = blk.apply(vars_, x, deterministic=True)
    y2 = blk.apply(vars_, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert y1.shape == x.shape


def test_mixer_block_shape():
    mb = layers.MixerBlock(4, 32)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(3, 4, 32)).astype(np.float32))
    vars_ = mb.init(jax.random.PRNGKey(0), x)
    y = mb.apply(vars_, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_generate_modal_masks_invariants():
    masks = generate_modal_masks(jax.random.PRNGKey(0), 64, 4)
    m = np.asarray(masks)
    assert m.shape == (64, 4)
    np.testing.assert_array_equal(m.sum(1), np.full(64, 3))
    # visible slot should vary across the batch
    assert len(np.unique(np.argmin(m, axis=1))) > 1


def test_imputation_masks():
    present = jnp.array([[True, False, True, False],
                         [False, False, False, False]])
    m = np.asarray(imputation_masks(present))
    np.testing.assert_array_equal(m[0], [False, True, False, True])
    np.testing.assert_array_equal(m[1], [False] * 4)  # k==0 fallback
