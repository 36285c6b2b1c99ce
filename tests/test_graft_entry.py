"""Driver entry points must keep working (compile-checked by the driver)."""

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles_eval_shape():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    # abstract evaluation only — full xception compile is exercised by the
    # driver on real hardware
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 512, 512, 5)


@pytest.mark.slow
def test_multichip_production_shape_xception_512():
    """GSPMD gate at PRODUCTION shape (round-2 VERDICT item 9): the
    xception 512x512 train + eval steps must compile and execute over the
    8-device mesh, not just the mobilenet 64x64 dryrun — catches sharding
    gaps (like the documented fused-middle limitation) that only surface
    at the real geometry."""
    import jax.numpy as jnp
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.parallel import make_mesh, shard_batch
    from cervical_tpu.train.seg_trainer import SegTrainer

    n = 8
    assert len(jax.devices()) >= n
    mesh = make_mesh(n)
    cfg = SegTrainConfig(
        data=SegDataConfig(input_shape=(512, 512), num_classes=5),
        backbone="xception", dtype="bfloat16", num_devices=n,
        unfreeze_batch_size=n, eval_batch_size=n)
    trainer = SegTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n, 512, 512, 3)).astype(np.uint8)
    labels = rng.integers(0, 5, (n, 512, 512)).astype(np.uint8)
    b = shard_batch(mesh, (images, labels))

    step = trainer._train_step(frozen=False)
    trainer.state, m = step(trainer.state, b[0], b[1], None,
                            jnp.asarray(1e-4), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))

    estep = trainer._eval_step()
    em = estep(trainer.state, b[0], b[1], jnp.ones((n,), jnp.float32))
    assert em["hist"].shape == (5, 5)
    assert int(np.asarray(em["hist"]).sum()) == n * 512 * 512
