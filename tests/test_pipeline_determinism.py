"""Determinism (SURVEY.md §5.2) + device-prefetch pipeline tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cervical_tpu.config import SegTrainConfig, SegDataConfig
from cervical_tpu.data.pipeline import device_prefetch
from cervical_tpu.parallel import make_mesh
from cervical_tpu.train.seg_trainer import SegTrainer, create_state
from cervical_tpu.ops import augment as A
from cervical_tpu.parallel import shard_batch


def _cfg():
    return SegTrainConfig(
        data=SegDataConfig(input_shape=(32, 32), num_classes=5),
        backbone="mobilenet", dtype="float32", save_dir="/tmp/det_logs")


@pytest.mark.slow
def test_train_step_bit_deterministic():
    """Same PRNG key + same batch => bit-identical params after a step
    (the reference relies on cudnn.deterministic; JAX gives this for free
    with disciplined key threading)."""
    cfg = _cfg()
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (8, 32, 32, 3)).astype(np.uint8)
    labels = rng.integers(0, 5, (8, 32, 32)).astype(np.uint8)

    results = []
    for _ in range(2):
        trainer = SegTrainer(cfg, rng=jax.random.PRNGKey(7))
        step = trainer._train_step(frozen=False)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        p = A.sample_augment_params(k1, 8)
        b = shard_batch(trainer.mesh, (images, labels))
        state, m = step(trainer.state, b[0], b[1], p, jnp.asarray(1e-3), k2)
        results.append((jax.device_get(state.params), float(m["loss"])))
    (p1, l1), (p2, l2) = results
    assert l1 == l2
    for a, b_ in zip(jax.tree_util.tree_leaves(p1),
                     jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b_)


@pytest.mark.slow
def test_fusion_step_bit_deterministic():
    from cervical_tpu.config import FusionTrainConfig
    from cervical_tpu.data.fusion_data import make_synthetic_fusion
    from cervical_tpu.train.fusion_trainer import FusionTrainer

    cfg = FusionTrainConfig(in_features=64, epoch0_no_step=False)
    ds = make_synthetic_fusion(num_patients=8, feature_dim=64)
    outs = []
    for _ in range(2):
        tr = FusionTrainer(cfg, rng=jax.random.PRNGKey(3))
        state = tr.init_state({m: ds["feats"][m][:1] for m in cfg.modalities},
                              jax.random.PRNGKey(0))
        state, rep = tr.train_epoch(state, ds, epoch=1, lr=1e-3)
        outs.append((jax.device_get(state["params"]), rep["loss"]))
    assert outs[0][1] == outs[1][1]
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_array_equal(a, b)


def test_device_prefetch_order_and_sharding():
    mesh = make_mesh()
    batches = [(np.full((8, 4), i, np.float32), np.full((8,), i, np.int32))
               for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh, depth=2))
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        assert float(x[0, 0]) == i
        assert len(x.sharding.device_set) == 8
