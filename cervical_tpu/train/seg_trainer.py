"""Segmentation trainer: jitted data-parallel train/eval steps + fit loop.

TPU-native rebuild of the reference's training stack
(``Segmentation/deeplabv3+/train.py`` + ``utils/utils_fit.py``):

* one jitted ``train_step`` fuses on-device augmentation, normalization,
  one-hot encoding, the DeepLab forward/backward, loss (focal-or-CE + dice
  with class weights), and the optimizer update — the reference's
  autocast/GradScaler fp16 path (utils_fit.py:92-121) becomes bf16 compute
  with fp32 master params, no scaler needed on TPU.
* data parallelism: the batch is sharded over the mesh 'data' axis; XLA
  inserts the gradient all-reduce over ICI (replaces DDP+NCCL,
  train.py:288-294,386-390).  BatchNorm statistics are computed on the
  *global* sharded batch under jit, so SyncBN (train.py:375-378) holds by
  construction.
* the freeze/unfreeze two-phase schedule (train.py:176-187,531-570):
  ``stop_gradient`` at the backbone boundary prunes the backbone backward
  pass from the compiled step (the compute equivalent of
  requires_grad=False), and backbone/head carry separate optimizer states
  — a frozen backbone receives no optimizer step at all, so its params AND
  its Adam moments/count stay untouched exactly like torch's lazily-created
  per-param states; BN running stats still update during the freeze phase,
  matching the reference's requires_grad-only freeze (train.py:448-449 —
  see docs/PARITY.md).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from cervical_tpu import losses
from cervical_tpu.config import SegTrainConfig
from cervical_tpu.models.deeplab import DeepLab
from cervical_tpu.ops import augment as aug_ops
from cervical_tpu.metrics import confusion_matrix_jax
from cervical_tpu.parallel import make_mesh, shard_batch
from cervical_tpu.train import schedules


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def _dtype(cfg: SegTrainConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]


def build_model(cfg: SegTrainConfig, fused_middle: bool = False) -> DeepLab:
    return DeepLab(num_classes=cfg.data.num_classes, backbone=cfg.backbone,
                   downsample_factor=cfg.downsample_factor, dtype=_dtype(cfg),
                   head_conv_backend=cfg.head_conv_backend or None,
                   fused_middle=fused_middle,
                   remat_entry=getattr(cfg, "remat_entry", False))


def make_optimizer(cfg: SegTrainConfig):
    """Adam/SGD with injected LR (set per epoch like set_optimizer_lr,
    deeplabv3_training.py:119-122)."""
    if cfg.optimizer_type == "adam":
        # torch Adam's weight_decay is COUPLED L2 (added to the gradient
        # BEFORE the moment updates), not AdamW's decoupled decay.  The
        # reference runs adam with wd=0 (train.py:220) so the default is
        # unaffected, but a nonzero wd must regularize torch-identically.
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_adam(b1=cfg.momentum, b2=0.999),
                optax.scale(-learning_rate)))(learning_rate=0.0)
    else:
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(learning_rate, momentum=cfg.momentum, nesterov=True))
        )(learning_rate=0.0)
    return base


def reference_weights_init(params, rng, init_gain: float = 0.02):
    """``weights_init`` (deeplabv3_training.py:58-76), which the reference
    applies to the WHOLE model when training from scratch
    (train.py:313-316): every conv kernel ~ N(0, 0.02), every BatchNorm
    scale ~ N(1, 0.02), BN biases 0.  Conv biases keep their existing init
    (the reference's init_func only touches ``.weight`` — docs/PARITY.md).
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for (path, leaf), key in zip(leaves, keys):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "kernel" and leaf.ndim == 4:
            out.append(init_gain * jax.random.normal(key, leaf.shape,
                                                     leaf.dtype))
        elif name == "scale":
            out.append(1.0 + init_gain * jax.random.normal(key, leaf.shape,
                                                           leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def load_pretrained(cfg: SegTrainConfig, variables, log=print):
    """Merge converted torch weights into freshly-initialized variables.

    The reference's default bootstrap flow: ImageNet backbone weights
    (``download_weights``, train.py:304-310) and/or the shape-matched
    partial load of a whole-model checkpoint like ``deeplab_xception.pth``
    (train.py:317-339 — mismatching shapes are skipped, not fatal).  The
    checkpoint kind (backbone-only vs whole model) is auto-detected from
    the key scheme.
    """
    from cervical_tpu.train import torch_import as TI

    sd = TI.load_state_dict(cfg.pretrained)
    if TI.is_full_deeplab_sd(sd):
        params, stats, _ = TI.convert_deeplab(sd, cfg.backbone, strict=False)
        scope = None
    else:
        conv = {"xception": TI.convert_xception,
                "mobilenet": TI.convert_mobilenetv2}[cfg.backbone]
        params, stats, _ = conv(sd, strict=False)
        scope = "backbone"
    variables, loaded, skipped = TI.merge_into(variables, params, stats,
                                               scope=scope)
    log(f"pretrained {cfg.pretrained!r}: loaded {len(loaded)} arrays"
        + (f", skipped {len(skipped)} shape mismatches" if skipped else ""))
    return variables


def create_state(cfg: SegTrainConfig, rng) -> TrainState:
    model = build_model(cfg)
    h, w = cfg.data.input_shape
    rng, init_rng = jax.random.split(rng)
    variables = model.init(rng, jnp.zeros((1, h, w, 3), _dtype(cfg)))
    tx = make_optimizer(cfg)
    if cfg.pretrained:
        variables = load_pretrained(cfg, variables)
    params = variables["params"]
    if not cfg.pretrained and cfg.weights_init == "normal":
        params = reference_weights_init(params, init_rng)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        # separate optimizer state per param group: torch optimizers hold
        # per-param state, so the reference's frozen backbone accumulates
        # NO Adam count/moments during the freeze phase and starts cold at
        # unfreeze while the head stays warm (train.py:447-452).  A single
        # global optax count would bias-correct a cold backbone with a warm
        # count (first unfrozen update ~3.2x oversized).
        opt_state={"backbone": tx.init(_split_params(params)[0]),
                   "head": tx.init(_split_params(params)[1])},
    )


def _split_params(params):
    """(backbone subtree, everything else), both as top-level dicts."""
    backbone = {"backbone": params["backbone"]}
    head = {k: v for k, v in params.items() if k != "backbone"}
    return backbone, head


def seg_loss_fn(cfg: SegTrainConfig, logits, labels, one_hot,
                sample_weights=None):
    cls_w = jnp.asarray(cfg.cls_weights, jnp.float32)
    nc = cfg.data.num_classes
    if cfg.focal_loss:
        main = losses.focal_loss(logits, labels, cls_w, nc,
                                 sample_weights=sample_weights)
    else:
        main = losses.cross_entropy_loss(logits, labels, cls_w, nc,
                                         sample_weights=sample_weights)
    total = main
    if cfg.dice_loss:
        total = total + losses.dice_loss(logits, one_hot,
                                         sample_weights=sample_weights)
    return total, main


def seg_loss_bundle_fn(cfg: SegTrainConfig, logits, labels,
                       sample_weights=None, resize_to=None):
    """Fused-layout equivalent of ``seg_loss_fn`` + ``losses.f_score``.

    Returns ``(total, main, f_score)`` via :func:`losses.seg_loss_bundle`
    (class-major layout, shared softmax/one-hot) — the train/eval bodies
    use this; ``seg_loss_fn`` remains the reference-shaped composition
    the bundle is tested against (``tests/test_losses.py``).
    ``resize_to``: pass the input shape when ``logits`` are the
    quarter-resolution output of ``apply(..., resize_logits=False)`` —
    the bundle then performs the model's final x4 bilinear upsample in
    class-major layout (see ``losses.seg_loss_bundle``).
    """
    return losses.seg_loss_bundle(
        logits, labels, jnp.asarray(cfg.cls_weights, jnp.float32),
        cfg.data.num_classes, focal=cfg.focal_loss, dice=cfg.dice_loss,
        sample_weights=sample_weights, resize_to=resize_to)


def make_train_aug_fn(cfg: SegTrainConfig):
    """The fused train-time augmentation closure ``(images_u8, labels_u8,
    params, cap) -> (images bf16 [0,1], labels u8)`` used by the train step
    — selected by ``cfg.data.aug_backend``:

    * ``"einsum"``: :func:`cervical_tpu.ops.warp_xla.augment_batch_einsum`
      with prefix-rotation / suffix-blur capacities and the config's
      ``two_shear`` rotation semantics;
    * ``"pallas"``: :func:`cervical_tpu.ops.pallas_warp.augment_batch_pallas`
      — the flagship kernels (exact 3-shear, per-image ``lax.cond``
      predicated rotation; ``two_shear`` does not apply).  Off-TPU the
      kernels run in interpret mode so the same config works in CPU tests.

    Both backends are pinned to the gather oracle through this exact
    closure in ``tests/test_seg_training.py``.
    """
    h, w = cfg.data.input_shape
    backend = cfg.data.aug_backend
    if backend == "einsum":
        from cervical_tpu.ops.warp_xla import augment_batch_einsum

        def aug(images, labels, params, cap):
            return augment_batch_einsum(
                images, labels, params, (h, w), letterbox=False,
                rotate_capacity=cap, blur_capacity=cap,
                two_shear=cfg.data.two_shear)
    elif backend == "pallas":
        from cervical_tpu.ops.pallas_warp import augment_batch_pallas
        interpret = jax.default_backend() != "tpu"

        def aug(images, labels, params, cap):
            del cap  # rotation is per-image predicated inside the kernel
            return augment_batch_pallas(images, labels, params, (h, w),
                                        letterbox=False, interpret=interpret)
    else:
        raise ValueError(f"unknown aug_backend {backend!r} "
                         "(expected 'einsum' or 'pallas')")
    return aug


def _sample_step_aug_params(cfg: SegTrainConfig, pk, batch):
    cap = max(1, batch // 4)
    return aug_ops.sample_augment_params(
        pk, batch, jitter=cfg.data.jitter,
        scale_range=(cfg.data.scale_min, cfg.data.scale_max),
        hue=cfg.data.hue, sat=cfg.data.sat, val=cfg.data.val,
        rotate_prefix=cap, blur_suffix=cap)


def _make_train_body(cfg: SegTrainConfig, model: DeepLab, tx, frozen: bool,
                     pre_augmented: bool = False):
    """The un-jitted train-step body: (state, images_u8, labels_u8,
    aug_params, lr, rng) -> (state, metrics).  Augmentation runs inside
    the step (fused).

    ``aug_params=None`` (the production path) samples the augmentation
    parameters INSIDE the jit from ``rng``: the eager
    ``sample_augment_params`` chain is ~20 host-dispatched micro-ops, which
    on the target platform costs more than the whole forward pass
    (docs/PLATFORM.md round-2 probes).  Explicit params stay supported for
    oracle/parity tests.

    ``pre_augmented``: the scan pre-batched-aug path
    (``SegDataConfig.aug_pre_batch``) — ``images``/``labels`` arrive
    already augmented (bf16 [0,1] / uint8) and ``rng`` is the
    post-aug-split key, so the body skips augmentation and the split.
    """
    h, w = cfg.data.input_shape
    nc = cfg.data.num_classes

    aug_fn = make_train_aug_fn(cfg)

    def step(state: TrainState, images, labels, aug_params, lr, rng):
        # fused on-device augmentation (backend per cfg.data.aug_backend —
        # make_train_aug_fn); returns normalized bf16 images + uint8 labels.
        # rotation runs on a fixed batch prefix, blur on a fixed suffix
        # (marginals preserved by the loader shuffle — docs/PARITY.md).
        if not pre_augmented:
            cap = max(1, images.shape[0] // 4)
            if aug_params is None:
                rng, pk = jax.random.split(rng)
                aug_params = _sample_step_aug_params(cfg, pk,
                                                     images.shape[0])
            images, labels = aug_fn(images, labels, aug_params, cap)
        images = images.astype(_dtype(cfg))
        labels = jnp.minimum(labels, nc)
        if cfg.dropout_rng_impl == "rbg":
            # rbg keys: fold/split stay threefry-cheap, but the BIG draw —
            # the head's two (B,128,128,256) dropout masks, regenerated in
            # the backward replay — uses the XLA RngBitGenerator instead
            # of threefry (config.dropout_rng_impl; measured ~6.9 ms of
            # the 59 ms step)
            kd = (jax.random.key_data(rng)
                  if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                  else rng)
            # impl-agnostic widening: rbg key_data is (4,) uint32; tile
            # whatever the session's default impl produced (threefry (2,),
            # rbg (4,), ...) up to >=4 words and truncate
            reps = -(-4 // kd.shape[-1])
            kd4 = jnp.tile(kd, reps)[..., :4]
            rng = jax.random.wrap_key_data(kd4.astype(jnp.uint32),
                                           impl="rbg")

        def loss_fn(params):
            # freeze_backbone prunes the backbone backward pass entirely
            # (stop_gradient in the model); the per-group optimizer split
            # below keeps frozen params + their Adam state bit-identical
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, freeze_backbone=frozen,
                resize_logits=False, mutable=["batch_stats"],
                rngs={"dropout": rng})
            total, main, fs = seg_loss_bundle_fn(
                cfg, logits, labels, resize_to=images.shape[1:3])
            return total, (updates["batch_stats"], main, fs)

        (total, (new_bs, main, fs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads_b, grads_h = _split_params(grads)
        params_b, params_h = _split_params(state.params)
        opt_h = state.opt_state["head"]
        opt_h.hyperparams["learning_rate"] = lr
        upd_h, new_h = tx.update(grads_h, opt_h, params_h)
        params = optax.apply_updates(params_h, upd_h)
        if frozen:
            # the reference's requires_grad=False freeze: the backbone gets
            # NO optimizer step at all — params bit-identical, Adam state
            # (moments AND count) untouched (train.py:447-452)
            params["backbone"] = state.params["backbone"]
            new_opt = {"backbone": state.opt_state["backbone"],
                       "head": new_h}
        else:
            opt_b = state.opt_state["backbone"]
            opt_b.hyperparams["learning_rate"] = lr
            upd_b, new_b = tx.update(grads_b, opt_b, params_b)
            params.update(optax.apply_updates(params_b, upd_b))
            new_opt = {"backbone": new_b, "head": new_h}
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=new_opt)
        metrics = {"loss": total, "main_loss": main, "f_score": fs}
        return new_state, metrics

    return step


def _check_aug_cfg(cfg: SegTrainConfig):
    """aug_pre_batch is pallas-only (the einsum backend's prefix-capacity
    rotation cannot represent stacked per-sub-batch params).  Reject the
    combination uniformly — in every step factory, not just the k>1 scan
    where it takes effect — so a misconfiguration fails at build time
    (ADVICE r4)."""
    if cfg.data.aug_pre_batch and cfg.data.aug_backend != "pallas":
        raise ValueError("aug_pre_batch requires aug_backend='pallas'")


def make_train_step(cfg: SegTrainConfig, model: DeepLab, tx, frozen: bool):
    """jit of :func:`_make_train_body` — one optimizer step per call."""
    _check_aug_cfg(cfg)
    return jax.jit(_make_train_body(cfg, model, tx, frozen))


def make_train_step_scan(cfg: SegTrainConfig, model: DeepLab, tx,
                         frozen: bool, k: int):
    """Returns jit(state, images (K,B,H,W,3) u8, labels (K,B,H,W) u8, lr,
    rng) -> (state, metrics) running K optimizer steps in ONE program via
    ``lax.scan`` — each program execution carries a fixed ~28 ms
    serialized cost on the target platform (docs/PLATFORM.md round-2
    chain-length sweep), so batching K dependent steps amortizes it to
    ~28/K ms per step.  Metrics come back stacked per sub-step, shape (K,).
    Sub-step batches stay sharded over the mesh 'data' axis (axis 1).

    ``cfg.data.aug_pre_batch``: augment all K sub-batches as ONE (K*B)
    batch before the scan — at b8 the aug kernels are launch-bound, so
    the merged batch amortizes them (bit-identical to the per-step path
    for the pallas backend; see SegDataConfig.aug_pre_batch)."""
    _check_aug_cfg(cfg)
    if cfg.data.aug_pre_batch and k > 1:
        body = _make_train_body(cfg, model, tx, frozen, pre_augmented=True)
        aug_fn = make_train_aug_fn(cfg)

        @jax.jit
        def scan_step(state: TrainState, images, labels, lr, rng):
            keys = jax.random.split(rng, k)
            # per-step (rng_i, pk_i) exactly as the per-step body derives
            # them: split(keys[i]) -> row 0 = model rng, row 1 = aug key
            k2 = jax.vmap(jax.random.split)(keys)
            rngs_i, pks = k2[:, 0], k2[:, 1]
            b = images.shape[1]
            params = jax.vmap(
                lambda pk: _sample_step_aug_params(cfg, pk, b))(pks)

            def flat(a):
                return a.reshape((k * b,) + a.shape[2:])

            params_flat = jax.tree_util.tree_map(flat, params)
            # cap is ignored by the pallas backend (per-image predication)
            ia, la = aug_fn(flat(images), flat(labels), params_flat,
                            max(1, (k * b) // 4))
            ia = ia.reshape((k, b) + ia.shape[1:])
            la = la.reshape((k, b) + la.shape[1:])

            def f(st, xs):
                im, lb, ky = xs
                return body(st, im, lb, None, lr, ky)

            return jax.lax.scan(f, state, (ia, la, rngs_i))

        return scan_step

    body = _make_train_body(cfg, model, tx, frozen)

    @jax.jit
    def scan_step(state: TrainState, images, labels, lr, rng):
        keys = jax.random.split(rng, k)

        def f(st, xs):
            im, lb, ky = xs
            return body(st, im, lb, None, lr, ky)

        return jax.lax.scan(f, state, (images, labels, keys))

    return scan_step


def _make_eval_body(cfg: SegTrainConfig, model: DeepLab):
    """The un-jitted eval-step body — jitted directly by
    :func:`make_eval_step` (one batch per program) and scanned over
    device-resident chunks by :func:`make_eval_step_scan_resident`."""
    h, w = cfg.data.input_shape
    nc = cfg.data.num_classes

    from cervical_tpu.ops.warp_xla import augment_batch_einsum

    def step(state: TrainState, images, labels, weights=None):
        lp = aug_ops.letterbox_params_like(images.shape[0],
                                           images.shape[1:3], (h, w))
        images, labels = augment_batch_einsum(images, labels, lp, (h, w),
                                              letterbox=True)
        images = images.astype(_dtype(cfg))
        labels = jnp.minimum(labels, nc)
        if weights is not None:
            # weight-0 rows (multihost padding, data/pipeline.py) become
            # all-ignore: excluded from CE and the confusion matrix, and
            # zeroed out of focal/dice/f-score via sample_weights — eval
            # metrics are exact at any eval-set size
            labels = jnp.where(weights[:, None, None] > 0, labels, nc)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False, resize_logits=False)
        total, main, fs, preds = losses.seg_loss_bundle(
            logits, labels, jnp.asarray(cfg.cls_weights, jnp.float32),
            nc, focal=cfg.focal_loss, dice=cfg.dice_loss,
            sample_weights=weights, resize_to=(h, w), return_preds=True)
        hist = confusion_matrix_jax(labels, preds, nc)
        return {"loss": total, "f_score": fs, "hist": hist}

    return step


def make_eval_step(cfg: SegTrainConfig, model: DeepLab):
    """jit of :func:`_make_eval_body` — one eval batch per program."""
    return jax.jit(_make_eval_body(cfg, model))


def make_train_step_scan_resident(cfg: SegTrainConfig, model: DeepLab, tx,
                                  frozen: bool, k: int, batch: int,
                                  gather: bool = False):
    """K train steps per program reading batches FROM DEVICE MEMORY.

    Signature: jit(state, images (N,H,W,3) u8, labels (N,H,W) u8,
    idx, lr, rng) -> (state, metrics(K,)).  Together with
    :class:`cervical_tpu.data.resident.ResidentSegData` (flat layout)
    this removes the per-step host->device upload entirely (VERDICT r4
    task #1: the round-2 epoch row lost ~half the step throughput to
    the host link).

    ``gather=False``: ``idx`` is (K,) batch indices; the body slices
    rows ``[idx[i]*batch, idx[i]*batch + batch)`` with
    ``dynamic_slice_in_dim`` — a pure slice, measured at the platform's
    memory floor (scripts/probe_resident_shuffle.py probe B).

    ``gather=True`` (the ``resident_shuffle="gather"`` epoch mode):
    ``idx`` is (K, B) IMAGE row indices; the body gathers its batch
    rows directly — a batch-axis gather, which this platform vectorizes
    (~134 GB/s, probe A), ~6 MB of reads per step.  This gives
    image-level per-epoch reshuffling with ZERO extra HBM (the
    full-permute "images" mode transiently needs ~2x the image set,
    which at the 7 GB reference scale collided with the eval/predictor
    allocations on the 16 GB chip — the round-5 protocol OOM).  The
    flat storage layout matters: gathering from a (C,B,...) chunked
    layout required an in-program flatten that XLA materialized as a
    whole-set copy per program call (+6.6 s/epoch at reference scale)."""
    _check_aug_cfg(cfg)
    if cfg.data.aug_pre_batch:
        raise ValueError("aug_pre_batch is not supported on the resident "
                         "path (measured a tie anyway — docs/PERF.md)")
    body = _make_train_body(cfg, model, tx, frozen)

    @jax.jit
    def scan_step(state: TrainState, images, labels, idx, lr, rng):
        keys = jax.random.split(rng, k)
        if gather:
            def f(st, xs):
                rows, ky = xs
                im = jnp.take(images, rows, axis=0)
                lb = jnp.take(labels, rows, axis=0)
                return body(st, im, lb, None, lr, ky)
        else:
            def f(st, xs):
                i, ky = xs
                im = jax.lax.dynamic_slice_in_dim(images, i * batch,
                                                  batch, axis=0)
                lb = jax.lax.dynamic_slice_in_dim(labels, i * batch,
                                                  batch, axis=0)
                return body(st, im, lb, None, lr, ky)

        return jax.lax.scan(f, state, (idx, keys))

    return scan_step


def make_eval_step_scan_resident(cfg: SegTrainConfig, model: DeepLab,
                                 k: int, batch: int):
    """K eval batches per program from the flat device-resident set.

    Returns jit(state, images (N,...), labels, weights (N,)|None,
    idx (K,) batch indices) -> {"loss": sum, "f_score": sum,
    "hist": (nc, nc) sum, "count": K}.  Scanning K eval batches into
    one program amortizes the fixed per-program dispatch cost the same
    way the train scan does — the val loop and ``evaluate_miou`` both
    ride it (VERDICT r4 weak #3: the eval loop had never been profiled;
    the resident formulation removes both its upload and its dispatch
    overheads — measured 622 img/s vs 39-41 host-fed, docs/PERF.md)."""
    body = _make_eval_body(cfg, model)

    @jax.jit
    def scan_eval(state: TrainState, images, labels, weights, idx):
        def f(carry, i):
            im = jax.lax.dynamic_slice_in_dim(images, i * batch, batch,
                                              axis=0)
            lb = jax.lax.dynamic_slice_in_dim(labels, i * batch, batch,
                                              axis=0)
            w = (jax.lax.dynamic_slice_in_dim(weights, i * batch, batch,
                                              axis=0)
                 if weights is not None else None)
            m = body(state, im, lb, w)
            loss, fs, hist = carry
            return (loss + m["loss"], fs + m["f_score"],
                    hist + m["hist"]), None

        nc = cfg.data.num_classes
        hist0 = jnp.zeros((nc, nc), jnp.int32)
        (loss, fs, hist), _ = jax.lax.scan(
            f, (jnp.float32(0.0), jnp.float32(0.0), hist0), idx)
        return {"loss": loss, "f_score": fs, "hist": hist,
                "count": idx.shape[0]}

    return scan_eval


@dataclasses.dataclass
class EpochResult:
    train_loss: float
    val_loss: float
    train_f_score: float
    val_f_score: float
    seconds: float


class SegTrainer:
    """fit_one_epoch / fit driver (utils_fit.py:31-198 + train.py:526-581)."""

    def __init__(self, cfg: SegTrainConfig, rng=None, mesh=None):
        self.cfg = cfg
        self.rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.num_devices)
        self.model = build_model(cfg)
        self.tx = make_optimizer(cfg)
        self.rng, init_rng = jax.random.split(self.rng)
        self.state = create_state(cfg, init_rng)
        self._steps = {}

    def _train_step(self, frozen: bool):
        if frozen not in self._steps:
            self._steps[frozen] = make_train_step(self.cfg, self.model,
                                                  self.tx, frozen)
        return self._steps[frozen]

    def _train_step_scan(self, frozen: bool, k: int):
        key = ("scan", frozen, k)
        if key not in self._steps:
            self._steps[key] = make_train_step_scan(self.cfg, self.model,
                                                    self.tx, frozen, k)
        return self._steps[key]

    def _train_step_scan_resident(self, frozen: bool, k: int, batch: int,
                                  gather: bool = False):
        key = ("scanres", frozen, k, batch, gather)
        if key not in self._steps:
            self._steps[key] = make_train_step_scan_resident(
                self.cfg, self.model, self.tx, frozen, k, batch,
                gather=gather)
        return self._steps[key]

    def _eval_step_scan_resident(self, k: int, batch: int):
        key = ("evalres", k, batch)
        if key not in self._steps:
            self._steps[key] = make_eval_step_scan_resident(
                self.cfg, self.model, k, batch)
        return self._steps[key]

    def _eval_step(self):
        if "eval" not in self._steps:
            model = self.model
            if self.cfg.fused_middle_eval:
                if self.cfg.backbone != "xception":
                    raise ValueError(
                        "fused_middle_eval is an xception-only fast path")
                if self.mesh.devices.size > 1:
                    # the Mosaic custom-call inside the eval program has no
                    # GSPMD sharding rule — over a >1-device mesh XLA cannot
                    # partition it over the 'data'-sharded batch
                    raise ValueError(
                        "fused_middle_eval requires a single-device mesh "
                        f"(have {self.mesh.devices.size}); drop the flag or "
                        "set num_devices=1")
                model = build_model(self.cfg, fused_middle=True)
            self._steps["eval"] = make_eval_step(self.cfg, model)
        return self._steps["eval"]

    def lr_schedule(self, batch_size: int, total_epochs: int):
        init_fit, min_fit = schedules.adaptive_seg_lr(
            self.cfg.init_lr, self.cfg.init_lr * self.cfg.min_lr_ratio,
            batch_size, backbone=self.cfg.backbone,
            optimizer_type=self.cfg.optimizer_type)
        return schedules.get_lr_scheduler(self.cfg.lr_decay_type, init_fit,
                                          min_fit, total_epochs)

    def run_epoch_resident(self, train_rs, val_rs, epoch: int, frozen: bool,
                           lr: float) -> EpochResult:
        """One epoch fed entirely from device-resident data (VERDICT r4
        task #1): per-epoch on-device reshuffle (``cfg.resident_shuffle``)
        then scanned K-step programs whose only host inputs are a (K,)
        chunk-index vector, the LR scalar and a PRNG key — the per-step
        host->device image upload is gone.  The val loop scans K eval
        batches per program the same way."""
        from cervical_tpu.data.resident import ResidentSegData

        t0 = time.time()
        cfg = self.cfg
        k = max(1, cfg.steps_per_call)
        c = train_rs.num_chunks
        b = train_rs.batch_size
        mode = cfg.resident_shuffle
        gather = mode == "gather"
        if gather:
            # image-level reshuffle with ZERO extra HBM: the scan body
            # gathers its rows from the resident set by permuted index
            # (batch-axis gathers vectorize on this platform —
            # docs/PLATFORM.md round-5 row).  Host-side deterministic
            # permutation stream, like the reference's sampler.
            rows = np.random.default_rng(
                cfg.seed * 1_000_003 + epoch).permutation(c * b)
            rows = rows.astype(np.int32).reshape(c, b)
            order = np.arange(c)
        elif mode == "images":
            # full on-device permutation: one donated permutation+take
            # program, but the transient peak is ~2x the image set —
            # prefer "gather" unless HBM is plentiful
            self.rng, sk = jax.random.split(self.rng)
            train_rs.shuffle_(sk)
            order = np.arange(c)
        elif mode == "chunks":
            order = np.random.default_rng(
                cfg.seed * 100_003 + epoch).permutation(c)
        elif mode == "none":
            order = np.arange(c)
        else:
            raise ValueError(f"unknown resident_shuffle {mode!r}")

        tl, tf, n = 0.0, 0.0, 0
        depth = max(1, cfg.pipeline_depth)
        pending = []

        def drain(limit):
            nonlocal tl, tf, n
            while len(pending) > limit:
                m = pending.pop(0)
                v = np.asarray(m["loss"])
                tl += float(v.sum())
                tf += float(np.asarray(m["f_score"]).sum())
                n += v.size

        pos = 0
        while pos < c:
            kk = min(k, c - pos)  # ragged tail: a shorter scan program
            fn = self._train_step_scan_resident(frozen, kk, b,
                                                gather=gather)
            if gather:
                idx = jnp.asarray(rows[pos:pos + kk])
            else:
                idx = jnp.asarray(order[pos:pos + kk], jnp.int32)
            self.rng, dk = jax.random.split(self.rng)
            self.state, m = fn(self.state, train_rs.images,
                               train_rs.labels, idx, jnp.asarray(lr), dk)
            pending.append(m)
            drain(depth - 1)
            pos += kk
        drain(0)

        vl, vf, vn = 0.0, 0.0, 0
        epending = []

        def edrain(limit):
            nonlocal vl, vf, vn
            while len(epending) > limit:
                m = epending.pop(0)
                vl += float(m["loss"])
                vf += float(m["f_score"])
                vn += int(m["count"])

        cv = val_rs.num_chunks
        pos = 0
        while pos < cv:
            kk = min(k, cv - pos)
            fn = self._eval_step_scan_resident(kk, val_rs.batch_size)
            idx = jnp.arange(pos, pos + kk, dtype=jnp.int32)
            epending.append(fn(self.state, val_rs.images, val_rs.labels,
                               val_rs.weights, idx))
            edrain(depth - 1)
            pos += kk
        edrain(0)
        return EpochResult(tl / max(n, 1), vl / max(vn, 1), tf / max(n, 1),
                           vf / max(vn, 1), time.time() - t0)

    def run_epoch(self, train_loader, val_loader, epoch: int, frozen: bool,
                  lr: float) -> EpochResult:
        from cervical_tpu.data.pipeline import device_prefetch
        from cervical_tpu.data.resident import ResidentSegData

        if isinstance(train_loader, ResidentSegData):
            if not isinstance(val_loader, ResidentSegData):
                raise ValueError("resident train set needs a resident "
                                 "val set (build both via fit's "
                                 "device_resident loader_factory)")
            return self.run_epoch_resident(train_loader, val_loader, epoch,
                                           frozen, lr)

        t0 = time.time()
        step_fn = self._train_step(frozen)
        k = max(1, self.cfg.steps_per_call)
        scan_fn = self._train_step_scan(frozen, k) if k > 1 else None
        tl, tf, n = 0.0, 0.0, 0
        # Steps are dispatched ahead of their metric fetches: each float()
        # costs a ~30-70 ms host round-trip on the target platform
        # (docs/PLATFORM.md), so a bounded window of un-fetched step metrics
        # keeps the device queue full (the torch loop's per-step .item()
        # sync, utils_fit.py:117-121, is the anti-pattern here).
        depth = max(1, self.cfg.pipeline_depth)
        pending = []  # scalar metrics (single step) or (K,) (scanned)

        def drain(limit):
            nonlocal tl, tf, n
            while len(pending) > limit:
                m = pending.pop(0)
                v = np.asarray(m["loss"])
                tl += float(v.sum())
                tf += float(np.asarray(m["f_score"]).sum())
                n += v.size

        # host->device uploads overlap compute (and each process feeds its
        # slice of the global batch under multihost) — data/pipeline.py.
        # aug params are sampled INSIDE the jitted step (make_train_step):
        # one dispatch per step instead of ~20 eager micro-dispatches.
        # steps_per_call batches are stacked into one scanned program
        # (make_train_step_scan) to amortize the fixed per-program cost;
        # the ragged tail arrives as plain 4-d batches.
        for images, labels in device_prefetch(train_loader, self.mesh,
                                              group=k):
            self.rng, dk = jax.random.split(self.rng)
            if images.ndim == 5:
                self.state, m = scan_fn(self.state, images, labels,
                                        jnp.asarray(lr), dk)
            else:
                self.state, m = step_fn(self.state, images, labels,
                                        None, jnp.asarray(lr), dk)
            pending.append(m)
            drain(depth - 1)
        drain(0)
        vl, vf, vn = 0.0, 0.0, 0
        eval_fn = self._eval_step()
        epending = []

        def edrain(limit):
            nonlocal vl, vf, vn
            while len(epending) > limit:
                m = epending.pop(0)
                vl += float(m["loss"])
                vf += float(m["f_score"])
                vn += 1

        for images, labels, w in device_prefetch(val_loader, self.mesh,
                                                 with_weights=True):
            epending.append(eval_fn(self.state, images, labels, w))
            edrain(depth - 1)
        edrain(0)
        return EpochResult(tl / max(n, 1), vl / max(vn, 1), tf / max(n, 1),
                           vf / max(vn, 1), time.time() - t0)

    def fit(self, train_ds, val_ds, total_epochs: Optional[int] = None,
            loader_factory=None, log=print) -> Dict:
        """Full two-phase training loop (train.py:526-581).

        ``train_ds``/``val_ds``: VOCSegDataset-like objects.  Returns a dict
        with per-epoch history.  ``loader_factory(ds, batch_size, shuffle)``
        defaults to :class:`cervical_tpu.data.voc.BatchLoader`.
        """
        from cervical_tpu.data.voc import BatchLoader
        from cervical_tpu.train.callbacks import (LossHistory, MiouHistory,
                                                  PredictorMiouCallback)
        from cervical_tpu.train.checkpoints import CheckpointManager

        cfg = self.cfg
        total_epochs = total_epochs or cfg.unfreeze_epoch
        if loader_factory is None and cfg.device_resident:
            from cervical_tpu.data.resident import ResidentSegData
            res_cache = {}

            def loader_factory(ds, bs, shuffle):
                # one upload per dataset; the freeze->unfreeze batch-size
                # change is an on-device rechunk, not a re-upload
                cur = res_cache.get(id(ds))
                if cur is None:
                    cur = ResidentSegData.from_dataset(ds, bs, self.mesh,
                                                       train=shuffle,
                                                       log=log)
                elif cur.batch_size != bs:
                    cur = cur.rechunk(bs)
                res_cache[id(ds)] = cur
                return cur
        elif loader_factory is None:
            def loader_factory(ds, bs, shuffle):
                # train drops ragged tails (static shapes); eval keeps them
                return BatchLoader(ds, bs, shuffle=shuffle, seed=cfg.seed,
                                   drop_last=shuffle)

        loss_hist = LossHistory(cfg.save_dir)
        # model-graph dump at callback init (utils/callbacks.py:29-34 feeds
        # a dummy image through add_graph; here: the StableHLO text)
        dummy = jnp.zeros((1, *cfg.data.input_shape, 3), jnp.float32)
        loss_hist.add_model_graph(
            lambda v, x: self.model.apply(v, x, train=False),
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats}, dummy)
        miou_hist = MiouHistory(cfg.save_dir, cfg.eval_period)
        pred_cb = (PredictorMiouCallback(cfg.save_dir, val_ds,
                                         cfg.eval_period)
                   if cfg.predictor_eval else None)
        ckpt = CheckpointManager(cfg.save_dir, cfg.save_period)

        frozen = cfg.freeze_train
        batch_size = cfg.freeze_batch_size if frozen else cfg.unfreeze_batch_size
        schedule = self.lr_schedule(batch_size, total_epochs)
        train_loader = loader_factory(train_ds, batch_size, True)
        val_loader = loader_factory(val_ds, cfg.eval_batch_size, False)
        history = {"train_loss": [], "val_loss": [], "miou": []}

        # Preemption-safe stop (SURVEY §5.3 — the reference has only manual
        # resume, train.py:109-110): SIGTERM/SIGINT request a graceful stop;
        # the loop finishes the in-flight epoch, checkpoints
        # last_epoch_weights as usual, and returns. Resume later with
        # cfg.init_epoch + CheckpointManager.restore. Handlers are only
        # installable from the main thread; otherwise the flag can still be
        # set via request_stop().
        self._stop_requested = False
        prev_handlers = {}

        def _request_stop(signum, frame):  # pragma: no cover - signal path
            self._stop_requested = True
            log(f"signal {signum}: finishing the current epoch, "
                "checkpointing, and stopping")

        import signal
        import threading
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _request_stop)

        try:
            self._fit_loop(cfg, total_epochs, loader_factory, train_ds,
                           val_ds, frozen, batch_size, schedule,
                           train_loader, val_loader, history, loss_hist,
                           miou_hist, pred_cb, ckpt, log)
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
        return history

    def _fit_loop(self, cfg, total_epochs, loader_factory, train_ds, val_ds,
                  frozen, batch_size, schedule, train_loader, val_loader,
                  history, loss_hist, miou_hist, pred_cb, ckpt, log):
        for epoch in range(cfg.init_epoch, total_epochs):
            if frozen and epoch >= cfg.freeze_epoch:
                # unfreeze transition: batch size and scheduler rebuild
                # (train.py:531-570)
                frozen = False
                batch_size = cfg.unfreeze_batch_size
                schedule = self.lr_schedule(batch_size, total_epochs)
                train_loader = loader_factory(train_ds, batch_size, True)
            lr = schedule(epoch)
            res = self.run_epoch(train_loader, val_loader, epoch, frozen, lr)
            history["train_loss"].append(res.train_loss)
            history["val_loss"].append(res.val_loss)
            loss_hist.append_loss(epoch, res.train_loss, res.val_loss)
            if miou_hist.should_eval(epoch):
                miou = self.evaluate_miou(val_loader)["miou"]
                miou_hist.append(epoch, miou)
                history["miou"].append((epoch, miou))
            if pred_cb is not None and pred_cb.should_eval(epoch):
                history.setdefault("predictor_miou", []).append(
                    (epoch, pred_cb.run(cfg, self.state, epoch, log=log)))
            ckpt.on_epoch_end(epoch, self.state, res.train_loss, res.val_loss,
                              total_epochs)
            log(f"Epoch {epoch + 1}/{total_epochs} lr={lr:.2e} "
                f"loss={res.train_loss:.4f} val_loss={res.val_loss:.4f} "
                f"f={res.train_f_score:.3f}/{res.val_f_score:.3f} "
                f"({res.seconds:.1f}s)")
            if self._stop_requested:
                log(f"stopped after epoch {epoch + 1} (preemption); "
                    f"resume with init_epoch={epoch + 1} from "
                    "last_epoch_weights")
                break

    def request_stop(self):
        """Ask ``fit`` to stop gracefully at the next epoch boundary
        (checkpointed as usual) — the programmatic preemption hook."""
        self._stop_requested = True

    def evaluate_miou(self, loader, num_classes: Optional[int] = None) -> Dict:
        """Accumulate an on-device confusion matrix over a loader and
        summarize (EvalCallback equivalent, utils/callbacks.py:153-200).

        Ragged batches are padded with weight-0 rows (data/pipeline.py), so
        the accumulated hist counts each real pixel exactly once."""
        from cervical_tpu.data.pipeline import host_local_batches
        from cervical_tpu.data.resident import ResidentSegData
        from cervical_tpu.metrics import summarize_hist
        nc = num_classes or self.cfg.data.num_classes
        if isinstance(loader, ResidentSegData):
            return self._evaluate_miou_resident(loader, nc)
        hist = np.zeros((nc, nc), np.int64)
        eval_fn = self._eval_step()
        # fetch behind a window so eval batches pipeline (see run_epoch)
        depth = max(1, self.cfg.pipeline_depth)
        pending = []
        for images, labels, w in host_local_batches(loader, self.mesh,
                                                    with_weights=True):
            batch = shard_batch(self.mesh, (images, labels, w))
            pending.append(eval_fn(self.state, batch[0], batch[1], batch[2]))
            while len(pending) >= depth:
                hist += np.asarray(pending.pop(0)["hist"], np.int64)
        for m in pending:
            hist += np.asarray(m["hist"], np.int64)
        return summarize_hist(hist)

    def _evaluate_miou_resident(self, val_rs, nc: int) -> Dict:
        """Resident-path mIoU: the scanned eval programs already
        accumulate the (nc, nc) confusion matrix on device — the host
        only sums one small matrix per K batches."""
        from cervical_tpu.metrics import summarize_hist
        if nc != self.cfg.data.num_classes:
            raise ValueError("resident eval is compiled for "
                             f"{self.cfg.data.num_classes} classes")
        k = max(1, self.cfg.steps_per_call)
        depth = max(1, self.cfg.pipeline_depth)
        hist = np.zeros((nc, nc), np.int64)
        pending = []
        cv = val_rs.num_chunks
        pos = 0
        while pos < cv:
            kk = min(k, cv - pos)
            fn = self._eval_step_scan_resident(kk, val_rs.batch_size)
            idx = jnp.arange(pos, pos + kk, dtype=jnp.int32)
            pending.append(fn(self.state, val_rs.images, val_rs.labels,
                              val_rs.weights, idx))
            while len(pending) >= depth:
                hist += np.asarray(pending.pop(0)["hist"], np.int64)
            pos += kk
        for m in pending:
            hist += np.asarray(m["hist"], np.int64)
        return summarize_hist(hist)
