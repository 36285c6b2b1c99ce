"""Fused middle-flow pallas kernel (ops/pallas_xception.py) vs its pure-jnp
oracle (exact) and vs the flax XceptionBackbone blocks (bf16 tolerance),
interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from cervical_tpu.ops import pallas_xception as PX


def _random_folded(key, nblk, c, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    # small magnitudes keep the 16-block chain numerically tame
    return {
        "wdw": (jax.random.normal(ks[0], (nblk, 27, c)) * 0.2).astype(dtype),
        "s1": jax.random.uniform(ks[1], (nblk, 3, c), minval=0.5, maxval=1.5),
        "c1": jax.random.normal(ks[2], (nblk, 3, c)) * 0.1,
        "wpw": (jax.random.normal(ks[3], (nblk, 3, c, c))
                * (1.5 / np.sqrt(c))).astype(dtype),
        "c2": jax.random.normal(ks[4], (nblk, 3, c)) * 0.1,
    }


def test_kernel_matches_oracle_f32():
    nblk, b, h, w, c = 3, 2, 8, 8, 16
    folded = _random_folded(jax.random.PRNGKey(0), nblk, c)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c), jnp.float32)
    out = PX.middle_flow_eval(x, folded, interpret=True)
    ref = PX.middle_flow_reference(x, folded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_matches_oracle_bf16_dilated():
    nblk, b, h, w, c = 2, 2, 10, 10, 16
    folded = _random_folded(jax.random.PRNGKey(2), nblk, c,
                            dtype=jnp.bfloat16)
    x = (jax.random.normal(jax.random.PRNGKey(3), (b, h, w, c))
         .astype(jnp.bfloat16))
    for d in (1, 2):
        out = PX.middle_flow_eval(x, folded, dilation=d, interpret=True)
        ref = PX.middle_flow_reference(x, folded, dilation=d)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=1e-2, atol=1e-2)


def test_blocks_per_call_split_matches_mega():
    nblk, b, h, w, c = 4, 1, 8, 8, 16
    folded = _random_folded(jax.random.PRNGKey(4), nblk, c)
    x = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, c), jnp.float32)
    mega = PX.middle_flow_eval(x, folded, interpret=True)
    split = PX.middle_flow_eval(x, folded, interpret=True, blocks_per_call=2)
    np.testing.assert_allclose(np.asarray(mega), np.asarray(split),
                               rtol=1e-6, atol=1e-6)


def _mini_middle(c, nblk, dtype):
    import flax.linen as nn
    from cervical_tpu.models.backbones.xception import XceptionBlock

    class MiniMiddle(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            for i in range(4, 4 + nblk):
                x, _ = XceptionBlock(c, 1, atrous=(1, 1, 1), dtype=dtype,
                                     name=f"block{i}")(x, train)
            return x

    return MiniMiddle()


def _init_mini(model, x):
    variables = model.init(jax.random.PRNGKey(7), x)
    # randomize the BN stats so the fold is non-trivial
    stats = jax.tree.map(
        lambda v: v + 0.1 * jax.random.normal(jax.random.PRNGKey(8), v.shape)
        if v.ndim else v, variables["batch_stats"])
    stats = jax.tree.map(jnp.abs, stats)  # keep vars positive
    return {"params": variables["params"], "batch_stats": stats}


def test_fold_and_fuse_match_flax_backbone_f32():
    """In f32 the fold + kernel must reproduce the flax blocks tightly —
    the structural check (BN folding, skip semantics, tap layout)."""
    c, b, h, w, nblk = 32, 2, 8, 8, 4
    model = _mini_middle(c, nblk, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (b, h, w, c)) * 2.0
    variables = _init_mini(model, x)
    ref = model.apply(variables, x)
    folded = PX.fold_middle_flow(variables, first=4, count=nblk,
                                 compute_dtype=jnp.float32)
    got = PX.middle_flow_eval(x, folded, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_deeplab_fused_middle_matches_flax():
    """DeepLab(fused_middle=True) eval forward ≈ the flax path (same
    params; bf16-drift tolerance) — the predictor integration surface."""
    from cervical_tpu.models.deeplab import DeepLab

    x = jax.random.normal(jax.random.PRNGKey(9), (1, 64, 64, 3),
                          jnp.float32).astype(jnp.bfloat16)
    base = DeepLab(num_classes=5, backbone="xception", downsample_factor=16,
                   dtype=jnp.bfloat16)
    variables = base.init(jax.random.PRNGKey(10), x)
    ref = base.apply(variables, x, train=False)
    fused = DeepLab(num_classes=5, backbone="xception", downsample_factor=16,
                    dtype=jnp.bfloat16, fused_middle=True)
    got = fused.apply(variables, x, train=False)
    r, g = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    err = np.abs(r - g) / (np.abs(r) + 1e-1)
    assert err.mean() < 0.05, err.mean()
    # the fast path is xception-only; mobilenet must refuse loudly
    import pytest
    with pytest.raises(ValueError):
        DeepLab(backbone="mobilenet", fused_middle=True).init(
            jax.random.PRNGKey(0), x)


def test_trainer_fused_middle_eval_matches_flax_eval():
    """SegTrainer with cfg.fused_middle_eval=True: eval-step metrics must
    agree with the flax eval step on the same state/batch (bf16 drift on
    the loss; the argmax confusion matrix should be near-identical)."""
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train import seg_trainer as T

    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(64, 64),
                                            num_classes=5),
                         backbone="xception", fused_middle_eval=True,
                         num_devices=1)
    trainer = T.SegTrainer(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (2, 64, 64)), jnp.uint8)
    fused = trainer._eval_step()(trainer.state, images, labels)
    ref = T.make_eval_step(cfg, trainer.model)(trainer.state, images, labels)
    assert abs(float(fused["loss"]) - float(ref["loss"])) < 0.05
    agree = (np.asarray(fused["hist"]) == np.asarray(ref["hist"])).all()
    diff = np.abs(np.asarray(fused["hist"]) - np.asarray(ref["hist"])).sum()
    assert agree or diff < 0.02 * labels.size, diff

    import pytest
    bad = SegTrainConfig(data=SegDataConfig(input_shape=(64, 64),
                                            num_classes=5),
                         backbone="mobilenet", fused_middle_eval=True,
                         num_devices=1)
    with pytest.raises(ValueError):
        T.SegTrainer(bad)._eval_step()

    # a >1-device mesh must refuse: the Mosaic custom-call has no GSPMD
    # sharding rule, so the fused eval program cannot be partitioned
    multi = SegTrainConfig(data=SegDataConfig(input_shape=(64, 64),
                                              num_classes=5),
                           backbone="xception", fused_middle_eval=True)
    with pytest.raises(ValueError, match="single-device mesh"):
        T.SegTrainer(multi)._eval_step()


def test_predictor_fused_middle_forward_and_portable_export(tmp_path):
    """SegPredictor(fused_middle=True): probs ≈ the flax predictor on the
    same state, and export_stablehlo still serializes the PURE-XLA model
    (a blob with an embedded Mosaic custom-call would not be portable —
    predictor.py gates exports on _export_model)."""
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.inference.predictor import SegPredictor
    from cervical_tpu.train.seg_trainer import SegTrainer

    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(64, 64),
                                            num_classes=5),
                         backbone="xception", dtype="float32",
                         save_dir="/tmp/pred_fused_logs")
    trainer = SegTrainer(cfg)
    plain = SegPredictor(cfg, trainer.state)
    fused = SegPredictor(cfg, trainer.state, fused_middle=True)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    p0 = np.asarray(plain.predict_probs(img))
    p1 = np.asarray(fused.predict_probs(img))
    np.testing.assert_allclose(p1, p0, atol=5e-3)

    from jax import export as jax_export
    path = fused.export_stablehlo(str(tmp_path / "seg_fused.stablehlo"))
    exported = jax_export.deserialize(bytearray(open(path, "rb").read()))
    out = exported.call(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out.shape == (1, 64, 64, 5)


def test_fold_and_fuse_match_flax_backbone_bf16():
    """bf16 compute: the fused path normalizes/accumulates in f32 where
    flax's BatchNorm rounds to bf16 per op, so outputs agree only to
    bf16-drift level across the block chain."""
    c, b, h, w, nblk = 32, 2, 8, 8, 4
    model = _mini_middle(c, nblk, jnp.bfloat16)
    x = (jax.random.normal(jax.random.PRNGKey(6), (b, h, w, c)) * 2.0
         ).astype(jnp.bfloat16)
    variables = _init_mini(model, x)
    ref = model.apply(variables, x)
    folded = PX.fold_middle_flow(variables, first=4, count=nblk)
    got = PX.middle_flow_eval(x, folded, interpret=True)
    oracle = PX.middle_flow_reference(x, folded)
    # kernel == oracle tightly; both vs flax within bf16 drift
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(oracle, np.float32),
                               rtol=1e-2, atol=1e-2)
    r, g = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    err = np.abs(r - g) / (np.abs(r) + 1e-2)
    assert err.mean() < 0.04, err.mean()
    assert np.median(err) < 0.02
