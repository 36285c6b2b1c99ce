"""Subprocess worker for the TRUE multi-process SPMD test
(tests/test_multihost.py).  Each worker is one "host": 4 forced CPU
devices, joined into an 8-device global mesh via jax.distributed (the
reference's DDP/NCCL world, train.py:288-294); collectives run over Gloo.

Run: python tests/_multihost_worker.py <pid> <nproc> <port>
"""

import os
import sys


def main(pid: int, nproc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cervical_tpu.parallel import (make_mesh, shard_batch, barrier,
                                       local_batch_slice)
    from cervical_tpu.data.pipeline import host_local_batches

    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4
    mesh = make_mesh()  # all global devices -> ('data', 'model') = (8, 1)

    # --- DDP/SyncBN semantics: statistics over the GLOBAL batch under jit
    # (each process contributes only its local slice; XLA inserts the
    # cross-process collectives) ---
    rng = np.random.default_rng(0)  # same global batch on every process
    gx = rng.normal(size=(8, 16)).astype(np.float32)
    local = gx[local_batch_slice(8, mesh)]
    assert local.shape == (4, 16)
    xs = shard_batch(mesh, local)
    assert xs.shape == (8, 16)  # global array assembled from local slices

    @jax.jit
    def stats(x):
        return x.mean(), (x * x).sum()

    m, ss = stats(xs)
    np.testing.assert_allclose(float(m), gx.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(ss), (gx * gx).sum(), rtol=1e-5)

    # --- exact ragged eval across processes: weight-0 padding, then the
    # weighted reduction sees only the 5 real rows ---
    ys = np.arange(5, dtype=np.float32)
    out = list(host_local_batches([(gx[:5], ys)], mesh, with_weights=True))
    (lx, ly, lw), = out
    # global padded 5 -> 16 (divisible by n_proc * n_data), 8 rows/process
    assert lx.shape[0] == 8 and lw.shape == (8,)
    g = shard_batch(mesh, (lx, ly, lw))

    @jax.jit
    def weighted(x, y, w):
        return w.sum(), (y * w).sum(), (x.sum(axis=1) * w).sum()

    c, ysum, xsum = weighted(*g)
    assert float(c) == 5.0, float(c)
    np.testing.assert_allclose(float(ysum), ys.sum(), rtol=1e-6)
    np.testing.assert_allclose(float(xsum), gx[:5].sum(), rtol=1e-5)

    # --- non-divisible local batches must REFUSE to fake replication
    # (each process holds a different slice; a silent 'replicated' global
    # array would let hosts diverge with no collective) ---
    try:
        shard_batch(mesh, np.ones((3, 2), np.float32))
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("non-divisible multi-process shard_batch "
                             "should raise")

    # --- a REAL train step across the process boundary (DDP parity):
    # each process contributes its local half of the global batch; the
    # gradient all-reduce must leave BOTH processes with identical params
    # (the parent compares the printed checksums) ---
    from cervical_tpu.config import FusionTrainConfig
    from cervical_tpu.train.fusion_trainer import FusionTrainer
    from cervical_tpu.data.fusion_data import make_synthetic_fusion
    from cervical_tpu.data.masks import generate_modal_masks

    fcfg = FusionTrainConfig(in_features=16, hidden=64, epochs=1,
                             epoch0_no_step=False)
    ftrainer = FusionTrainer(fcfg)
    ds = make_synthetic_fusion(num_patients=8, feature_dim=16, seed=1)
    sl = local_batch_slice(8, mesh)
    feats = {mod: shard_batch(mesh, np.asarray(v)[sl])
             for mod, v in ds["feats"].items()}
    labels = shard_batch(mesh, np.asarray(ds["labels"])[sl])
    w = shard_batch(mesh, np.ones(4, np.float32))
    state = ftrainer.init_state(
        {mod: np.asarray(v[:1]) for mod, v in ds["feats"].items()},
        jax.random.PRNGKey(1))
    mask = shard_batch(
        mesh, np.asarray(generate_modal_masks(jax.random.PRNGKey(2), 8, 4))[sl])
    step = ftrainer.train_step_fn()
    state, metrics = step(state, feats, labels, mask, jnp.asarray(1e-3),
                          jnp.asarray(True), jax.random.PRNGKey(3), w)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    leaves = jax.tree_util.tree_leaves(state["params"])
    checksum = float(sum(jnp.asarray(l, jnp.float32).sum() for l in leaves))
    print(f"proc {pid}: step loss {loss:.6f} checksum {checksum:.6f}",
          flush=True)

    # --- the REAL SegTrainer epoch across processes: loader -> per-process
    # slicing -> prefetch -> scanned train steps -> exact ragged eval.
    # Same synthetic dataset content on every process (fixed seed); each
    # process trains on its half of every global batch. ---
    import tempfile
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.data.voc import (VOCSegDataset, BatchLoader,
                                       make_synthetic_voc, read_split)
    from cervical_tpu.train.seg_trainer import SegTrainer

    tmp = tempfile.mkdtemp(prefix=f"mhvoc{pid}_")
    root = make_synthetic_voc(tmp, num_images=32, size=64)
    cfg = SegTrainConfig(
        data=SegDataConfig(input_shape=(64, 64), num_classes=5),
        backbone="mobilenet", dtype="float32", steps_per_call=2,
        pipeline_depth=2, eval_batch_size=16, save_dir=tmp)
    trainer = SegTrainer(cfg, rng=jax.random.PRNGKey(0), mesh=mesh)
    ids = read_split(root, "train") + read_split(root, "val") \
        + read_split(root, "test")
    ds = VOCSegDataset(root, sorted(ids), stage_hw=(64, 64))
    train_loader = BatchLoader(ds, 16, num_workers=1, seed=0)
    # ragged eval: 32 images at eval bs 16 with the last batch truncated
    # to 8 by using only 24 ids
    eval_ds = VOCSegDataset(root, sorted(ids)[:24], stage_hw=(64, 64))
    val_loader = BatchLoader(eval_ds, 16, num_workers=1, seed=0,
                             shuffle=False, drop_last=False)
    res = trainer.run_epoch(train_loader, val_loader, 0, frozen=False,
                            lr=1e-3)
    assert np.isfinite(res.train_loss) and np.isfinite(res.val_loss)
    s = trainer.evaluate_miou(val_loader)
    # every real pixel counted exactly once despite padding + slicing
    assert s["hist"].sum() == 24 * 64 * 64, int(s["hist"].sum())
    sleaves = jax.tree_util.tree_leaves(trainer.state.params)
    seg_sum = float(sum(jnp.asarray(l, jnp.float32).sum() for l in sleaves))
    print(f"proc {pid}: seg epoch loss {res.train_loss:.6f} "
          f"val {res.val_loss:.6f} miou {s['miou']:.6f} "
          f"segsum {seg_sum:.6f}", flush=True)

    barrier("multihost-test")
    print(f"proc {pid}: MULTIHOST OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
