"""Checkpoint-resume continuation: restoring must reproduce the exact
training trajectory (preemption-safety, SURVEY.md §5.3/§5.4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cervical_tpu.config import SegTrainConfig, SegDataConfig
from cervical_tpu.train.seg_trainer import SegTrainer
from cervical_tpu.train.checkpoints import CheckpointManager
from cervical_tpu.ops import augment as A
from cervical_tpu.parallel import shard_batch


@pytest.mark.slow
def test_resume_reproduces_trajectory(tmp_path):
    cfg = SegTrainConfig(
        data=SegDataConfig(input_shape=(32, 32), num_classes=5),
        backbone="mobilenet", dtype="float32",
        save_dir=str(tmp_path / "logs"))
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (8, 32, 32, 3)).astype(np.uint8)
    labels = rng.integers(0, 5, (8, 32, 32)).astype(np.uint8)

    shared_trainer = SegTrainer(cfg, rng=jax.random.PRNGKey(0))
    shared_step = shared_trainer._train_step(frozen=False)

    def run_steps(trainer, state, keys):
        step = shared_step  # share the compiled step (it is pure in `state`)
        losses = []
        for k in keys:
            k1, k2 = jax.random.split(k)
            p = A.sample_augment_params(k1, 8)
            b = shard_batch(trainer.mesh, (images, labels))
            state, m = step(state, b[0], b[1], p, jnp.asarray(1e-3), k2)
            losses.append(float(m["loss"]))
        return state, losses

    keys = jax.random.split(jax.random.PRNGKey(5), 4)

    # continuous run: 4 steps
    t1 = SegTrainer(cfg, rng=jax.random.PRNGKey(0))
    s_full, l_full = run_steps(t1, t1.state, keys)

    # interrupted run: 2 steps, checkpoint, restore into a fresh trainer,
    # 2 more steps with the same keys
    t2 = SegTrainer(cfg, rng=jax.random.PRNGKey(0))
    s_half, l_a = run_steps(t2, t2.state, keys[:2])
    mgr = CheckpointManager(cfg.save_dir, save_period=1)
    mgr.on_epoch_end(0, s_half, 1.0, 1.0)

    t3 = SegTrainer(cfg, rng=jax.random.PRNGKey(9))
    restored, _ = mgr.restore("last_epoch_weights", t3.state)
    s_resumed, l_b = run_steps(t3, restored, keys[2:])

    np.testing.assert_allclose(l_a + l_b, l_full, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_full.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s_resumed.params))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # optimizer state restored too (exact resume includes adam moments)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_full.opt_state)),
                    jax.tree_util.tree_leaves(jax.device_get(s_resumed.opt_state))):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64), rtol=1e-6, atol=1e-7)
