"""Device-resident data path (data/resident.py + the resident trainer
loop): layout, shuffle, rechunk, and — the load-bearing gate — exact
agreement of a resident epoch with the host-loader epoch it replaces
(VERDICT r4 task #1)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cervical_tpu.config import SegTrainConfig, SegDataConfig
from cervical_tpu.data.resident import ResidentSegData
from cervical_tpu.data.voc import (VOCSegDataset, BatchLoader,
                                   make_synthetic_voc, read_split)
from cervical_tpu.train.seg_trainer import SegTrainer


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_res")
    return make_synthetic_voc(str(root), num_images=16, size=48)


def _cfg(tmp_path, **kw):
    base = SegTrainConfig(
        data=SegDataConfig(input_shape=(48, 48), num_classes=5,
                           scale_min=0.8, scale_max=1.2),
        backbone="mobilenet",
        dtype="float32",
        save_dir=str(tmp_path / "logs"),
        unfreeze_batch_size=8,
        eval_batch_size=8,
        init_lr=8e-3,
        steps_per_call=2,
        pipeline_depth=2,
    )
    return dataclasses.replace(base, **kw)


def _arrays(n=12, size=48, nc=5, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n, size, size, 3)).astype(np.uint8)
    lbls = rng.integers(0, nc, (n, size, size)).astype(np.uint8)
    return imgs, lbls


def test_from_arrays_train_drops_tail():
    imgs, lbls = _arrays(n=11)
    from cervical_tpu.parallel import make_mesh
    mesh = make_mesh()
    rs = ResidentSegData.from_arrays(imgs, lbls, 4, mesh, train=True)
    assert rs.images.shape == (8, 48, 48, 3)
    assert rs.labels.shape == (8, 48, 48)
    assert rs.weights is None and rs.n == 8 and len(rs) == 2
    assert rs.batch_size == 4
    np.testing.assert_array_equal(np.asarray(rs.images).reshape(8, -1),
                                  imgs[:8].reshape(8, -1))


def test_from_arrays_eval_pads_with_weights():
    imgs, lbls = _arrays(n=11)
    from cervical_tpu.parallel import make_mesh
    mesh = make_mesh()
    rs = ResidentSegData.from_arrays(imgs, lbls, 4, mesh, train=False)
    assert rs.images.shape == (12, 48, 48, 3) and rs.n == 11 and len(rs) == 3
    w = np.asarray(rs.weights).reshape(-1)
    np.testing.assert_array_equal(w, [1] * 11 + [0])
    # padded row repeats the last real image
    np.testing.assert_array_equal(np.asarray(rs.images).reshape(12, -1)[11],
                                  imgs[10].reshape(-1))


def test_shuffle_preserves_multiset_and_moves_rows():
    imgs, lbls = _arrays(n=16)
    from cervical_tpu.parallel import make_mesh
    rs = ResidentSegData.from_arrays(imgs, lbls, 4, make_mesh(), train=True)
    before_im = np.asarray(rs.images).reshape(16, -1)
    before_lb = np.asarray(rs.labels).reshape(16, -1)
    rs.shuffle_(jax.random.PRNGKey(3))
    after_im = np.asarray(rs.images).reshape(16, -1)
    after_lb = np.asarray(rs.labels).reshape(16, -1)
    # images and labels moved TOGETHER: match rows by content
    order = []
    for row in after_im:
        hits = np.nonzero((before_im == row).all(axis=1))[0]
        assert len(hits) == 1
        order.append(hits[0])
    assert sorted(order) == list(range(16))      # a permutation
    assert order != list(range(16))              # ...that actually moved
    np.testing.assert_array_equal(after_lb, before_lb[order])


def test_rechunk_preserves_order_and_weights():
    imgs, lbls = _arrays(n=10)
    from cervical_tpu.parallel import make_mesh
    rs = ResidentSegData.from_arrays(imgs, lbls, 4, make_mesh(), train=False)
    rs2 = rs.rechunk(2)
    assert rs2.batch_size == 2 and len(rs2) == 6 and rs2.n == 10
    np.testing.assert_array_equal(
        np.asarray(rs2.images).reshape(12, -1)[:10],
        imgs.reshape(10, -1))
    np.testing.assert_array_equal(np.asarray(rs2.weights).reshape(-1),
                                  [1] * 10 + [0] * 2)
    with pytest.raises(ValueError, match="rechunk"):
        rs.rechunk(5)


def test_resident_epoch_matches_host_loader(voc_root, tmp_path):
    """THE equivalence gate: a resident epoch (scan body reading chunks
    via dynamic_index_in_dim from device memory) must reproduce the
    host-loader epoch — same batches, same keys — to float tolerance.

    steps_per_call=3 covers the 3 train batches in ONE scan so both
    paths consume the identical key tree; ragged tails intentionally
    differ (the host path feeds tails to the per-step fn with the raw
    group key, the resident path runs a width-1 scan that splits it —
    both valid dropout/aug streams, not comparable bitwise)."""
    cfg = _cfg(tmp_path, resident_shuffle="none", steps_per_call=3)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))

    # host path: in-order loader, groups of steps_per_call
    t_host = SegTrainer(cfg)
    train_loader = BatchLoader(ds, 4, shuffle=False, seed=0, drop_last=True)
    val_loader = BatchLoader(ds, 8, shuffle=False, seed=0, drop_last=False)
    res_host = t_host.run_epoch(train_loader, val_loader, 0, frozen=False,
                                lr=1e-3)

    # resident path: same data in the same order
    t_res = SegTrainer(cfg)
    mesh = t_res.mesh
    train_rs = ResidentSegData.from_dataset(ds, 4, mesh, train=True)
    val_rs = ResidentSegData.from_dataset(ds, 8, mesh, train=False)
    res_res = t_res.run_epoch(train_rs, val_rs, 0, frozen=False, lr=1e-3)

    assert np.isclose(res_host.train_loss, res_res.train_loss, rtol=1e-4), (
        res_host.train_loss, res_res.train_loss)
    assert np.isclose(res_host.val_loss, res_res.val_loss, rtol=1e-4)
    assert np.isclose(res_host.val_f_score, res_res.val_f_score, rtol=1e-4)
    # the trained states must agree (scan-vs-scan, same math, different
    # read path; tolerance covers compilation reduction-order noise)
    for a, b in zip(jax.tree_util.tree_leaves(t_host.state.params),
                    jax.tree_util.tree_leaves(t_res.state.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)


def test_resident_gather_scan_matches_chunk_scan(voc_root, tmp_path):
    """The gather-mode scan (rows fetched by (K,B) image indices — the
    zero-extra-HBM shuffle) must reproduce the chunk-index scan bitwise
    when the indices spell out the same batches."""
    from cervical_tpu.train import seg_trainer as T

    cfg = _cfg(tmp_path)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    trainer = SegTrainer(cfg)
    rs = ResidentSegData.from_dataset(ds, 4, trainer.mesh, train=True)
    k, b = 2, 4
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(5)

    chunk_fn = trainer._train_step_scan_resident(frozen=False, k=k,
                                                 batch=b)
    s1, m1 = chunk_fn(trainer.state, rs.images, rs.labels,
                      jnp.arange(k, dtype=jnp.int32), lr, key)

    gather_fn = trainer._train_step_scan_resident(frozen=False, k=k,
                                                  batch=b, gather=True)
    rows = jnp.arange(k * b, dtype=jnp.int32).reshape(k, b)
    s2, m2 = gather_fn(trainer.state, rs.images, rs.labels, rows, lr, key)

    np.testing.assert_array_equal(np.asarray(m1["loss"]),
                                  np.asarray(m2["loss"]))
    for a, c in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_resident_gather_epoch_covers_every_image(voc_root, tmp_path):
    """gather-mode run_epoch consumes a PERMUTATION of image indices:
    every image exactly once per epoch, deterministic per (seed, epoch)."""
    cfg = _cfg(tmp_path, resident_shuffle="gather")
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    trainer = SegTrainer(cfg)
    rs = ResidentSegData.from_dataset(ds, 4, trainer.mesh, train=True)
    val_rs = ResidentSegData.from_dataset(ds, 8, trainer.mesh, train=False)
    seen = []
    fn_cache = trainer._train_step_scan_resident

    def spy(frozen, k, batch, gather=False):
        inner = fn_cache(frozen, k, batch, gather=gather)

        def wrapped(state, im, lb, idx, lr, rng):
            if gather:
                seen.append(np.asarray(idx).ravel())
            return inner(state, im, lb, idx, lr, rng)

        return wrapped

    trainer._train_step_scan_resident = spy
    res = trainer.run_epoch_resident(rs, val_rs, epoch=3, frozen=False,
                                     lr=1e-3)
    assert np.isfinite(res.train_loss)
    flat = np.concatenate(seen)
    assert sorted(flat.tolist()) == list(range(rs.n))
    expect = np.random.default_rng(
        cfg.seed * 1_000_003 + 3).permutation(rs.n)
    np.testing.assert_array_equal(flat, expect.astype(np.int32))


def test_resident_evaluate_miou_matches_host(voc_root, tmp_path):
    """Confusion counts are integers: resident vs host eval must agree
    EXACTLY (padded rows carry weight 0 on both paths)."""
    cfg = _cfg(tmp_path)
    ids = read_split(voc_root, "train")[:11]  # ragged: 11 images, batch 8
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    trainer = SegTrainer(cfg)
    host = trainer.evaluate_miou(BatchLoader(ds, 8, shuffle=False, seed=0,
                                             drop_last=False))
    val_rs = ResidentSegData.from_dataset(ds, 8, trainer.mesh, train=False)
    res = trainer.evaluate_miou(val_rs)
    assert host["miou"] == pytest.approx(res["miou"], abs=0)
    np.testing.assert_array_equal(host["hist"], res["hist"])


def test_fit_device_resident_end_to_end(voc_root, tmp_path):
    """2-epoch fit with device_resident=True: covers the freeze->unfreeze
    rechunk transition, the on-device image shuffle, per-epoch val and
    the mIoU callback."""
    cfg = _cfg(tmp_path, device_resident=True, freeze_train=True,
               freeze_epoch=1, freeze_batch_size=8,
               unfreeze_batch_size=4, eval_period=1, save_period=2)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    trainer = SegTrainer(cfg)
    history = trainer.fit(ds, ds, total_epochs=2, log=lambda *a, **k: None)
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])
    assert all(np.isfinite(v) for v in history["val_loss"])
    assert len(history["miou"]) == 2
