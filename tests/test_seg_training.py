"""End-to-end segmentation training smoke tests on synthetic VOC data
(SURVEY.md §4d): loss decreases, sharding works on the forced 8-device CPU
mesh, checkpoints round-trip."""

import numpy as np
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from cervical_tpu.config import SegTrainConfig, SegDataConfig
from cervical_tpu.data.voc import VOCSegDataset, BatchLoader, make_synthetic_voc, read_split
from cervical_tpu.train.seg_trainer import SegTrainer


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    return make_synthetic_voc(str(root), num_images=16, size=48)


def _cfg(tmp_path):
    return SegTrainConfig(
        data=SegDataConfig(input_shape=(48, 48), num_classes=5,
                           scale_min=0.8, scale_max=1.2),
        backbone="mobilenet",
        dtype="float32",
        save_dir=str(tmp_path / "logs"),
        unfreeze_batch_size=8,
        eval_batch_size=8,
        init_lr=8e-3,
        lr_decay_type="cos",
    )


def test_loader_shapes(voc_root):
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    loader = BatchLoader(ds, 4, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(ids) // 4
    imgs, lbls = batches[0]
    assert imgs.shape == (4, 48, 48, 3) and imgs.dtype == np.uint8
    assert lbls.shape == (4, 48, 48) and set(np.unique(lbls)) <= set(range(5))


def test_dataset_warns_on_aspect_mismatch(voc_root):
    """Staging stretches non-native aspects (the reference letterboxes only
    at eval) — the dataset must say so instead of silently distorting."""
    import warnings
    ids = read_split(voc_root, "train")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
        assert not rec
        VOCSegDataset(voc_root, ids, stage_hw=(48, 96))
        assert rec and "aspect" in str(rec[0].message)


@pytest.mark.slow
def test_training_reduces_loss(voc_root, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = SegTrainer(cfg)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    loader = BatchLoader(ds, 8, num_workers=1, seed=0)

    losses = []
    step = trainer._train_step(frozen=False)
    from cervical_tpu.ops import augment as A
    from cervical_tpu.parallel import shard_batch
    for ep in range(6):
        for images, labels in loader:
            k1, k2, trainer.rng = jax.random.split(trainer.rng, 3)
            p = A.sample_augment_params(k1, images.shape[0], jitter=0.1,
                                        scale_range=(0.9, 1.1))
            b = shard_batch(trainer.mesh, (images, labels))
            trainer.state, m = step(trainer.state, b[0], b[1], p,
                                    jnp.asarray(2e-3), k2)
            losses.append(float(m["loss"]))
    # 6 short epochs on synthetic blobs: demand a clear downward trend
    assert np.mean(losses[-2:]) < np.mean(losses[:2]) * 0.85, losses


@pytest.mark.slow
def test_training_reaches_miou_above_chance(tmp_path, tmp_path_factory):
    """Quality gate (round-2 VERDICT weak #2): on a structured synthetic
    task — color-coded class blobs, recoverable per-pixel from the image —
    a short full training run must drive val mIoU WELL above both chance
    and the untrained network, not merely reduce the loss."""
    import dataclasses as dc
    root = make_synthetic_voc(str(tmp_path_factory.mktemp("vocq")),
                              num_images=32, size=48, seed=1)
    cfg = dc.replace(_cfg(tmp_path), freeze_train=False, eval_period=100,
                     save_period=100, predictor_eval=False,
                     unfreeze_batch_size=4)
    trainer = SegTrainer(cfg)
    train_ds = VOCSegDataset(root, read_split(root, "train"),
                             stage_hw=(48, 48))
    val_ids = read_split(root, "val") + read_split(root, "test")
    val_ds = VOCSegDataset(root, val_ids, stage_hw=(48, 48))
    val_loader = BatchLoader(val_ds, len(val_ids), shuffle=False,
                             num_workers=1, drop_last=False)
    miou0 = trainer.evaluate_miou(val_loader)["miou"]
    trainer.fit(train_ds, val_ds, total_epochs=30, log=lambda *_: None)
    miou1 = trainer.evaluate_miou(val_loader)["miou"]
    # untrained nets sit near the ~0.1-0.2 chance band on this task; the
    # color->class map is learnable by a single 1x1 conv, so a trained net
    # must clear it by a wide margin
    assert miou1 > 0.35, (miou0, miou1)
    assert miou1 > 1.5 * miou0, (miou0, miou1)


@pytest.mark.slow
def test_frozen_backbone_params_stay_fixed(voc_root, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = SegTrainer(cfg)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    images, labels = next(iter(BatchLoader(ds, 8, num_workers=1)))

    from cervical_tpu.ops import augment as A
    from cervical_tpu.parallel import shard_batch
    step = trainer._train_step(frozen=True)
    before = jax.device_get(trainer.state.params["backbone"])
    head_before = jax.device_get(trainer.state.params["cls_conv"])
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p = A.sample_augment_params(k1, images.shape[0])
    b = shard_batch(trainer.mesh, (images, labels))
    trainer.state, _ = step(trainer.state, b[0], b[1], p, jnp.asarray(1e-2), k2)
    after = jax.device_get(trainer.state.params["backbone"])
    head_after = jax.device_get(trainer.state.params["cls_conv"])
    # backbone unchanged, head moved
    for a, c in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, c)
    assert any(np.abs(a - c).max() > 0 for a, c in
               zip(jax.tree_util.tree_leaves(head_before),
                   jax.tree_util.tree_leaves(head_after)))


def test_eval_and_miou(voc_root, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = SegTrainer(cfg)
    ids = read_split(voc_root, "val")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    loader = BatchLoader(ds, len(ids), shuffle=False, num_workers=1,
                         drop_last=False)
    summary = trainer.evaluate_miou(loader)
    assert 0.0 <= summary["miou"] <= 1.0
    assert summary["hist"].sum() == len(ids) * 48 * 48


def test_eval_miou_ragged_batches_exact_hist(voc_root, tmp_path):
    """Deliberately ragged eval set on the 8-device mesh: batches of 5 and a
    13-row cohort are padded with weight-0 rows which must not leak into the
    confusion counts — the hist sums to exactly N*H*W and is bit-identical
    to a single-batch evaluation (round-1 VERDICT item 7)."""
    cfg = _cfg(tmp_path)
    trainer = SegTrainer(cfg)
    ids = (read_split(voc_root, "train") + read_split(voc_root, "val"))[:13]
    assert len(ids) % 8 != 0
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    ragged = BatchLoader(ds, 5, shuffle=False, num_workers=1, drop_last=False)
    summary = trainer.evaluate_miou(ragged)
    assert summary["hist"].sum() == len(ids) * 48 * 48
    whole = BatchLoader(ds, len(ids), shuffle=False, num_workers=1,
                        drop_last=False)
    np.testing.assert_array_equal(summary["hist"],
                                  trainer.evaluate_miou(whole)["hist"])


def test_batch_sharded_over_mesh(voc_root, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = SegTrainer(cfg)
    assert trainer.mesh.devices.size == 8  # forced host platform count
    from cervical_tpu.parallel import shard_batch
    imgs = np.zeros((8, 48, 48, 3), np.uint8)
    sharded = shard_batch(trainer.mesh, imgs)
    assert len(sharded.sharding.device_set) == 8


def test_checkpoint_roundtrip(voc_root, tmp_path):
    from cervical_tpu.train.checkpoints import CheckpointManager
    cfg = _cfg(tmp_path)
    trainer = SegTrainer(cfg)
    mgr = CheckpointManager(cfg.save_dir, save_period=1)
    saved = mgr.on_epoch_end(0, trainer.state, 1.0, 2.0)
    assert len(saved) == 3  # periodic + best + last
    restored, extra = mgr.restore("best_epoch_weights", trainer.state)
    assert extra["val_loss"] == 2.0
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best only improves
    mgr.on_epoch_end(1, trainer.state, 1.0, 3.0)
    _, extra2 = mgr.restore("best_epoch_weights", trainer.state)
    assert extra2["val_loss"] == 2.0


@pytest.mark.slow
def test_frozen_step_forward_matches_unfrozen(voc_root, tmp_path):
    """freeze_backbone only prunes the backward pass (stop_gradient at the
    backbone boundary) — the loss from the same state/batch/rng must be
    identical to the unfrozen step's."""
    cfg = _cfg(tmp_path)
    trainer = SegTrainer(cfg)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    images, labels = next(iter(BatchLoader(ds, 8, num_workers=1)))

    from cervical_tpu.ops import augment as A
    from cervical_tpu.parallel import shard_batch
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    p = A.sample_augment_params(k1, images.shape[0])
    b = shard_batch(trainer.mesh, (images, labels))
    state0 = trainer.state
    _, m_frozen = trainer._train_step(frozen=True)(
        state0, b[0], b[1], p, jnp.asarray(1e-3), k2)
    _, m_unfrozen = trainer._train_step(frozen=False)(
        state0, b[0], b[1], p, jnp.asarray(1e-3), k2)
    np.testing.assert_allclose(float(m_frozen["loss"]),
                               float(m_unfrozen["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_frozen["f_score"]),
                               float(m_unfrozen["f_score"]), rtol=1e-5)


@pytest.mark.slow
def test_frozen_backbone_bitfrozen_under_weight_decay(voc_root, tmp_path):
    """Weight decay / momentum must not move frozen params either — the
    reference's requires_grad=False freeze leaves them bit-identical
    (torch optimizers skip grad=None params, train.py:447-452)."""
    cfg = _cfg(tmp_path)
    cfg = dataclasses.replace(cfg, optimizer_type="sgd", weight_decay=1e-2)
    trainer = SegTrainer(cfg)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    images, labels = next(iter(BatchLoader(ds, 8, num_workers=1)))

    from cervical_tpu.ops import augment as A
    from cervical_tpu.parallel import shard_batch
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    p = A.sample_augment_params(k1, images.shape[0])
    b = shard_batch(trainer.mesh, (images, labels))
    before = jax.device_get(trainer.state.params["backbone"])
    trainer.state, _ = trainer._train_step(frozen=True)(
        trainer.state, b[0], b[1], p, jnp.asarray(1e-2), k2)
    after = jax.device_get(trainer.state.params["backbone"])
    for a, c in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, c)


def test_reference_weights_init_statistics(tmp_path):
    """weights_init parity (deeplabv3_training.py:58-76 via train.py:313-316):
    from-scratch conv kernels ~ N(0, .02), BN scales ~ N(1, .02)."""
    from cervical_tpu.train.seg_trainer import create_state
    cfg = _cfg(tmp_path)
    state = create_state(cfg, jax.random.PRNGKey(0))
    kernels = [np.asarray(l) for p, l in
               jax.tree_util.tree_flatten_with_path(state.params)[0]
               if getattr(p[-1], "key", "") == "kernel" and l.ndim == 4]
    big = np.concatenate([k.reshape(-1) for k in kernels if k.size > 500])
    assert abs(big.std() - 0.02) < 0.002 and abs(big.mean()) < 0.002
    scales = [np.asarray(l) for p, l in
              jax.tree_util.tree_flatten_with_path(state.params)[0]
              if getattr(p[-1], "key", "") == "scale"]
    s = np.concatenate([x.reshape(-1) for x in scales])
    assert abs(s.mean() - 1.0) < 0.01 and abs(s.std() - 0.02) < 0.01

    cfg2 = dataclasses.replace(cfg, weights_init="none")
    state2 = create_state(cfg2, jax.random.PRNGKey(0))
    k2 = [np.asarray(l) for p, l in
          jax.tree_util.tree_flatten_with_path(state2.params)[0]
          if getattr(p[-1], "key", "") == "kernel" and l.ndim == 4]
    big2 = np.concatenate([k.reshape(-1) for k in k2 if k.size > 500])
    assert big2.std() > 0.03  # lecun-normal spreads wider than 0.02


def test_scan_prebatch_aug_matches_per_step(tmp_path):
    """aug_pre_batch=True (all K sub-batches augmented as one (K*B) batch
    before the scan) must match the per-step-aug scan exactly: with the
    pallas backend rotation/blur are per-image predicated, so the merged
    batch produces the same augmented images, and the model math is
    identical (same per-step keys)."""
    import dataclasses
    from cervical_tpu.train import seg_trainer as T

    base = _cfg(tmp_path)
    data = dataclasses.replace(base.data, input_shape=(64, 64),
                               aug_backend="pallas")
    cfg_a = dataclasses.replace(base, data=data)
    cfg_b = dataclasses.replace(
        base, data=dataclasses.replace(data, aug_pre_batch=True))
    model = T.build_model(cfg_a)
    tx = T.make_optimizer(cfg_a)
    state0 = T.create_state(cfg_a, jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.integers(0, 256, (2, 4, 64, 64, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (2, 4, 64, 64)), jnp.uint8)
    lr, key = jnp.float32(1e-3), jax.random.PRNGKey(9)

    s_a, m_a = T.make_train_step_scan(cfg_a, model, tx, frozen=False,
                                      k=2)(state0, images, labels, lr, key)
    s_b, m_b = T.make_train_step_scan(cfg_b, model, tx, frozen=False,
                                      k=2)(state0, images, labels, lr, key)
    np.testing.assert_allclose(np.asarray(m_b["loss"]),
                               np.asarray(m_a["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=1e-6, atol=1e-6)

    # einsum capacity slicing cannot represent the merged pattern
    cfg_bad = dataclasses.replace(
        base, data=dataclasses.replace(data, aug_backend="einsum",
                                       aug_pre_batch=True))
    with pytest.raises(ValueError, match="aug_pre_batch"):
        T.make_train_step_scan(cfg_bad, model, tx, frozen=False, k=2)


def test_train_step_scan_matches_sequential(tmp_path):
    """K steps scanned into one program (make_train_step_scan — amortizes
    the platform's fixed per-program cost) must produce the same state as
    K sequential single-step calls with the same per-step keys."""
    from cervical_tpu.train import seg_trainer as T

    # pinned to threefry dropout: the assertion below is a sensitive
    # numeric-agreement gate and each PRNG impl lands different sign-flip
    # populations; pinning keeps the original 0.99 sensitivity instead of
    # loosening the threshold per-impl (ADVICE r4)
    cfg = dataclasses.replace(_cfg(tmp_path), dropout_rng_impl="threefry")
    model = T.build_model(cfg)
    tx = T.make_optimizer(cfg)
    state0 = T.create_state(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (2, 8, 48, 48, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (2, 8, 48, 48)), jnp.uint8)
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(7)

    scan_fn = T.make_train_step_scan(cfg, model, tx, frozen=False, k=2)
    s_scan, m_scan = scan_fn(state0, images, labels, lr, key)

    step_fn = T.make_train_step(cfg, model, tx, frozen=False)
    st = state0
    ms = []
    for i, ky in enumerate(jax.random.split(key, 2)):
        st, m = step_fn(st, images[i], labels[i], None, lr, ky)
        ms.append(m)

    assert int(s_scan.step) == int(st.step) == 2
    # scan-vs-straight-line compilation reorders float accumulations, and
    # Adam's m/sqrt(v) normalization acts like sign(g) at early steps — a
    # near-zero gradient whose sign flips under reordering takes a full
    # +-lr step either way.  So: virtually all elements must agree
    # tightly, and the rare sign-flip outlier stays within ~2 lr steps.
    # sub-step 0 runs from the IDENTICAL state/key in both programs: its
    # loss must match to float32 reduction noise.  Sub-step 1's state has
    # accumulated per-element Adam sign-flip chaos (m/sqrt(v) ~ sign(g)
    # at early steps, so a near-zero grad whose sign flips under
    # scan-vs-straight-line reduction reordering takes a full +-lr step
    # either way) — the loss stays tight, params agree for the vast
    # majority of elements, and no element moves more than ~2 lr steps.
    assert np.isclose(float(m_scan["loss"][0]), float(ms[0]["loss"]),
                      rtol=1e-4)
    assert np.isclose(float(m_scan["loss"][1]), float(ms[1]["loss"]),
                      rtol=1e-2)
    diffs = np.concatenate([
        np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).ravel()
        for a, b in zip(jax.tree_util.tree_leaves(s_scan.params),
                        jax.tree_util.tree_leaves(st.params))])
    assert (diffs < 5e-5).mean() > 0.99, (diffs.max(),
                                          (diffs >= 5e-5).mean())
    assert diffs.max() < 5e-3, diffs.max()


def test_run_epoch_steps_per_call(voc_root, tmp_path):
    """run_epoch with steps_per_call>1 runs every batch exactly once
    (grouped scans + ragged single-step tail) and returns finite metrics."""
    cfg = _cfg(tmp_path)
    cfg = dataclasses.replace(cfg, steps_per_call=2, pipeline_depth=2)
    trainer = SegTrainer(cfg)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    # batch 4 -> an odd batch count: k=2 scan calls plus a ragged
    # single-step tail; val exercises the plain eval path
    train_loader = BatchLoader(ds, 4, num_workers=1, seed=0)
    val_loader = BatchLoader(ds, 4, num_workers=1, seed=0, shuffle=False)
    n_batches = len(ids) // 4
    before = int(trainer.state.step)
    res = trainer.run_epoch(train_loader, val_loader, 0, frozen=False,
                            lr=1e-3)
    assert int(trainer.state.step) - before == n_batches
    assert np.isfinite(res.train_loss) and np.isfinite(res.val_loss)


def test_train_aug_backends_match_oracle(tmp_path):
    """``cfg.data.aug_backend`` selects the fused train-time augmentation
    (einsum or the flagship pallas kernels); both backends — through the
    EXACT closure the train step compiles (``make_train_aug_fn``) — must
    match the gather oracle (``ops/augment.py``) on a rotate+blur batch."""
    from cervical_tpu.ops import augment as A
    from cervical_tpu.train.seg_trainer import make_train_aug_fn

    B, S = 4, 64
    # smooth ramp images + block labels: shear-decomposed rotation and
    # gather-bilinear rotation legitimately differ per pixel on white
    # noise (sub-pixel sampling offsets), so follow the established
    # oracle tests and compare on structured content
    yy, xx = np.mgrid[:S, :S]
    ramp = np.stack([xx, yy, (xx + yy) / 2], -1).astype(np.float32) * 2
    images = jnp.asarray(np.tile(ramp[None], (B, 1, 1, 1)), jnp.uint8)
    labels = jnp.asarray((xx[None].repeat(B, 0) // 8).astype(np.uint8))
    cap = 1
    p = dict(A.sample_augment_params(jax.random.PRNGKey(1), B, jitter=0.2,
                                     scale_range=(0.8, 1.2),
                                     rotate_prefix=cap, blur_suffix=cap))
    # neutral HSV gains: each backend's photometric chain is oracle-pinned
    # in its own test file; this gate checks the geometric wiring + scales
    p["gains"] = jnp.ones((B, 3))
    ref_i, ref_l = A.augment_batch(images, labels, p, (S, S))
    ref_i = np.asarray(ref_i, np.float32)
    m = slice(12, 52)  # interior: borders differ by fill-extension policy
    for backend in ("einsum", "pallas"):
        cfg = SegTrainConfig(
            data=SegDataConfig(input_shape=(S, S), num_classes=5,
                               aug_backend=backend),
            backbone="mobilenet", dtype="float32",
            save_dir=str(tmp_path / backend))
        oi, ol = make_train_aug_fn(cfg)(images, labels, p, cap)
        d = np.abs(np.asarray(oi, np.float32)[:, m, m] * 255.0
                   - ref_i[:, m, m])
        assert d.mean() < 2.0, (backend, d.mean())
        mism = (np.asarray(ol)[:, m, m] != np.asarray(ref_l)[:, m, m]).mean()
        assert mism < 0.08, (backend, mism)

    with pytest.raises(ValueError, match="aug_backend"):
        bad = SegTrainConfig(data=SegDataConfig(aug_backend="opencv"))
        make_train_aug_fn(bad)


@pytest.mark.slow
def test_train_step_runs_with_pallas_aug(voc_root, tmp_path):
    """A full jitted train step with aug_backend='pallas' (interpret mode
    off-TPU) compiles and produces finite, decreasing-capable metrics —
    the production-path knob for VERDICT r3 weak #2."""
    cfg = _cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, input_shape=(64, 64),
                                      aug_backend="pallas"))
    trainer = SegTrainer(cfg)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(64, 64))
    loader = BatchLoader(ds, 8, num_workers=1, seed=0)
    from cervical_tpu.parallel import shard_batch
    step = trainer._train_step(frozen=False)
    images, labels = next(iter(loader))
    b = shard_batch(trainer.mesh, (images, labels))
    k, trainer.rng = jax.random.split(trainer.rng)
    trainer.state, m = step(trainer.state, b[0], b[1], None,
                            jnp.asarray(1e-3), k)
    assert np.isfinite(float(m["loss"]))
    assert int(trainer.state.step) == 1


def test_fit_graceful_stop_checkpoints_and_resumes(voc_root, tmp_path):
    """A preemption request (request_stop / SIGTERM handler) finishes the
    in-flight epoch, saves last_epoch_weights, and exits the loop; the
    checkpoint resumes with the right epoch metadata (SURVEY §5.3)."""
    from cervical_tpu.train.checkpoints import CheckpointManager

    cfg = _cfg(tmp_path)
    trainer = SegTrainer(cfg)
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))

    def stopping_log(msg):
        trainer.request_stop()

    hist = trainer.fit(ds, ds, total_epochs=4, log=stopping_log)
    assert len(hist["train_loss"]) == 1  # stopped after the first epoch
    # add_graph equivalent: the StableHLO model-graph dump is written at
    # callback init (utils/callbacks.py:29-34)
    import os
    graph_path = os.path.join(cfg.save_dir, "model_graph.txt")
    assert os.path.getsize(graph_path) > 1000
    with open(graph_path) as f:
        assert "stablehlo" in f.read(4000) or "module" in open(graph_path).read(200)
    mgr = CheckpointManager(cfg.save_dir, cfg.save_period)
    state, extra = mgr.restore("last_epoch_weights", trainer.state)
    assert extra["epoch"] == 0
    assert int(state.step) == int(trainer.state.step) > 0
