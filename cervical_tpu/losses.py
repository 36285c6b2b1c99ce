"""Loss functions for segmentation and multimodal fusion training.

TPU-native reimplementations of the reference's loss zoo:

* segmentation losses — ``Segmentation/deeplabv3+/nets/deeplabv3_training.py:9-56``
  (weighted cross-entropy with ignore index, focal loss, soft dice) and the
  f-score monitor ``Segmentation/deeplabv3+/utils/utils_metrics.py:13-35``.
* fusion losses — the weighted multi-head CE sum plus the masked-MAE MSE
  auxiliary term from ``MultiModal Prediction/Four_Modal/my_train(full).py:317-341``.

All functions are pure, jit-safe (static shapes, no data-dependent Python
control flow), and operate on NHWC logits ``(B, H, W, C)`` / integer labels
``(B, H, W)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_ce_terms(logits, labels, class_weights, num_classes):
    """Per-pixel weighted negative-log-likelihood and validity mask.

    Matches ``torch.nn.CrossEntropyLoss(weight=w, ignore_index=num_classes,
    reduction='none')``: each element's loss is ``w[y] * (-log p_y)`` and
    ignored elements (label == num_classes, the VOC white-border channel)
    contribute zero.
    """
    logits = logits.astype(jnp.float32)
    valid = labels < num_classes
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction instead of take_along_axis / weight gathers: XLA
    # scalarizes big 2-D gathers on the target TPU platform (docs/
    # PLATFORM.md item 5) — the gather formulation measured 53.3 ms vs
    # 7.3 ms for this mask-and-sum at (8, 512, 512, 5), and was the single
    # largest segment of the whole train step (round-4 decomposition,
    # scripts/bench_seg_segments.py).  Picking exactly one element and
    # adding zeros is bit-identical to the gather.
    eq = (safe_labels[..., None] ==
          jnp.arange(num_classes)).astype(jnp.float32)
    nll = -jnp.sum(logp * eq, axis=-1)
    if class_weights is None:
        wy = jnp.where(valid, 1.0, 0.0)
    else:
        w = jnp.asarray(class_weights, jnp.float32)
        wy = jnp.where(valid, jnp.sum(w * eq, axis=-1), 0.0)
    return nll * wy, wy, valid


def _row_weights(sample_weights, ndim):
    """(B,) weights broadcast over per-pixel terms of rank ``ndim``."""
    w = jnp.asarray(sample_weights, jnp.float32)
    return w.reshape(w.shape + (1,) * (ndim - 1))


def cross_entropy_loss(logits, labels, class_weights=None, num_classes=None,
                       sample_weights=None):
    """Weighted CE with ignore index == ``num_classes``.

    Reference: ``CE_Loss`` (deeplabv3_training.py:9-19).  torch's weighted mean
    divides by the summed weights of the non-ignored targets.
    ``sample_weights``: optional (B,) row weights — weight-0 rows (padded
    multihost eval rows, data/pipeline.py) are excluded exactly, as if absent.
    """
    if num_classes is None:
        num_classes = logits.shape[-1]
    weighted_nll, wy, _ = _flat_ce_terms(logits, labels, class_weights, num_classes)
    if sample_weights is not None:
        rw = _row_weights(sample_weights, weighted_nll.ndim)
        weighted_nll = weighted_nll * rw
        wy = wy * rw
    return jnp.sum(weighted_nll) / jnp.maximum(jnp.sum(wy), 1e-12)

def focal_loss(logits, labels, class_weights=None, num_classes=None,
               alpha=0.5, gamma=2.0, sample_weights=None):
    """Focal loss, replicating ``Focal_Loss`` (deeplabv3_training.py:21-36).

    Reference quirks preserved deliberately: ``pt`` is computed from the
    *weighted* nll (so ``pt = p**w`` when class weights are used), ``alpha``
    scales the logpt term, and the final mean runs over *all* pixels including
    ignored ones (which contribute zeros).  ``sample_weights``: optional (B,)
    row weights; the mean denominator counts only weighted rows' pixels, so
    weight-0 padding rows are excluded exactly.
    """
    if num_classes is None:
        num_classes = logits.shape[-1]
    weighted_nll, _, _ = _flat_ce_terms(logits, labels, class_weights, num_classes)
    pt = jnp.exp(-weighted_nll)
    focal = (1.0 - pt) ** gamma * alpha * weighted_nll
    if sample_weights is None:
        return jnp.mean(focal)
    rw = _row_weights(sample_weights, focal.ndim)
    per_row = 1.0
    for s in focal.shape[1:]:
        per_row *= s
    denom = jnp.maximum(jnp.sum(rw) * per_row, 1e-12)
    return jnp.sum(focal * rw) / denom


def dice_loss(logits, one_hot_labels, beta=1.0, smooth=1e-5,
              sample_weights=None):
    """Soft dice over one-hot targets with an extra trailing ignore channel.

    Reference: ``Dice_loss`` (deeplabv3_training.py:38-56).  ``one_hot_labels``
    has ``num_classes + 1`` channels; the last (ignore/white-border) channel is
    dropped from tp/fn, matching ``temp_target[..., :-1]``.
    ``sample_weights``: optional (B,) row weights zeroing padded rows out of
    tp/fp/fn exactly.
    """
    b = logits.shape[0]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(b, -1, logits.shape[-1])
    target = one_hot_labels.astype(jnp.float32).reshape(b, -1, one_hot_labels.shape[-1])
    if sample_weights is not None:
        rw = _row_weights(sample_weights, 3)
        probs = probs * rw
        target = target * rw
    tp = jnp.sum(target[..., :-1] * probs, axis=(0, 1))
    fp = jnp.sum(probs, axis=(0, 1)) - tp
    fn = jnp.sum(target[..., :-1], axis=(0, 1)) - tp
    score = ((1 + beta**2) * tp + smooth) / ((1 + beta**2) * tp + beta**2 * fn + fp + smooth)
    return 1.0 - jnp.mean(score)


def f_score(logits, one_hot_labels, beta=1.0, smooth=1e-5, threshold=0.5,
            sample_weights=None):
    """Thresholded dice coefficient monitor (utils_metrics.py:13-35)."""
    b = logits.shape[0]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(b, -1, logits.shape[-1])
    probs = (probs > threshold).astype(jnp.float32)
    target = one_hot_labels.astype(jnp.float32).reshape(b, -1, one_hot_labels.shape[-1])
    if sample_weights is not None:
        rw = _row_weights(sample_weights, 3)
        probs = probs * rw
        target = target * rw
    tp = jnp.sum(target[..., :-1] * probs, axis=(0, 1))
    fp = jnp.sum(probs, axis=(0, 1)) - tp
    fn = jnp.sum(target[..., :-1], axis=(0, 1)) - tp
    score = ((1 + beta**2) * tp + smooth) / ((1 + beta**2) * tp + beta**2 * fn + fp + smooth)
    return jnp.mean(score)


def seg_loss_bundle(logits, labels, class_weights=None, num_classes=None,
                    *, focal=True, alpha=0.5, gamma=2.0,
                    dice=True, beta=1.0, smooth=1e-5, threshold=0.5,
                    sample_weights=None, resize_to=None,
                    align_corners=True, return_preds=False):
    """Fused (focal-or-CE [+ dice], f_score) in class-major layout.

    Semantically equivalent to composing :func:`focal_loss` /
    :func:`cross_entropy_loss`, :func:`dice_loss` (with
    ``one_hot_with_ignore(labels, num_classes)``) and :func:`f_score`
    (same formulas, same masking, same denominators — only the reduction
    layout differs, so results match to float tolerance), but built for
    the TPU memory system: every intermediate lives as ``(C, B, HW)``
    with the huge pixel axis minor.  The separate-function composition
    keeps the class axis minor (``C`` = 5 or 6), which the TPU pads to
    128 lanes in HBM/VMEM tiles — ~25x wasted bandwidth on every
    elementwise pass — and each loss re-derives its own softmax and
    one-hot.  Here ``log_softmax``/``softmax``/one-hot are computed once
    and shared by all three outputs.

    ``resize_to=(H, W)``: the model's final bilinear logits upsample
    (deeplabv3_plus.py:187 ``F.interpolate(..., align_corners=True)``)
    performed HERE, in class-major layout, on quarter-resolution logits
    from ``DeepLab.apply(..., resize_logits=False)`` — the same
    interpolation matrices as :func:`~cervical_tpu.ops.image.
    resize_bilinear` contracted in the same order, so values match the
    resize-then-loss composition to float tolerance while the lane-padded
    ``(B, H, W, C)`` tensor never exists in HBM.

    Returns ``(total, main, f_score)`` where ``total = main [+ dice]``.
    """
    if num_classes is None:
        num_classes = logits.shape[-1]
    nc = num_classes
    b = logits.shape[0]
    if resize_to is not None and tuple(resize_to) != logits.shape[1:3]:
        from cervical_tpu.ops.image import _interp_matrix
        h, w = logits.shape[1], logits.shape[2]
        oh, ow = resize_to
        lt4 = jnp.moveaxis(logits.astype(jnp.float32), -1, 0)  # (C,B,h,w)
        wh = jnp.asarray(_interp_matrix(h, oh, align_corners), jnp.float32)
        ww = jnp.asarray(_interp_matrix(w, ow, align_corners), jnp.float32)
        lt4 = jnp.einsum("oh,cbhw->cbow", wh, lt4)
        lt4 = jnp.einsum("pw,cbow->cbop", ww, lt4)
        lt = lt4.reshape(nc, b, oh * ow)
        n = oh * ow
    else:
        n = 1
        for s in logits.shape[1:-1]:
            n *= s
        # class-major: minor dim HW is lane-aligned; C rides the tile axis
        lt = jnp.moveaxis(logits.astype(jnp.float32).reshape(b, n, nc),
                          -1, 0)
    lab = labels.reshape(b, n)
    valid = lab < nc
    safe = jnp.where(valid, lab, 0)
    eqf = (safe[None, :, :] ==
           jnp.arange(nc, dtype=safe.dtype)[:, None, None]).astype(
               jnp.float32)
    logp = jax.nn.log_softmax(lt, axis=0)
    nll = -jnp.sum(logp * eqf, axis=0)
    if class_weights is None:
        wy = valid.astype(jnp.float32)
    else:
        w = jnp.asarray(class_weights, jnp.float32)
        wy = jnp.where(valid, jnp.sum(w[:, None, None] * eqf, axis=0), 0.0)
    wnll = nll * wy

    rw = None
    if sample_weights is not None:
        rw = jnp.asarray(sample_weights, jnp.float32)[:, None]  # (B, 1)
    if focal:
        pt = jnp.exp(-wnll)
        f = (1.0 - pt) ** gamma * alpha * wnll
        if rw is None:
            main = jnp.mean(f)
        else:
            main = jnp.sum(f * rw) / jnp.maximum(jnp.sum(rw) * n, 1e-12)
    else:
        if rw is None:
            main = jnp.sum(wnll) / jnp.maximum(jnp.sum(wy), 1e-12)
        else:
            main = (jnp.sum(wnll * rw) /
                    jnp.maximum(jnp.sum(wy * rw), 1e-12))

    probs_raw = jax.nn.softmax(lt, axis=0)                # (C, B, HW)
    tgt = eqf * valid[None].astype(jnp.float32)  # == one_hot[..., :nc]
    probs = probs_raw
    if rw is not None:
        probs = probs * rw[None]
        tgt = tgt * rw[None]

    total = main
    if dice:
        tp = jnp.sum(tgt * probs, axis=(1, 2))
        fp = jnp.sum(probs, axis=(1, 2)) - tp
        fn = jnp.sum(tgt, axis=(1, 2)) - tp
        score = (((1 + beta**2) * tp + smooth) /
                 ((1 + beta**2) * tp + beta**2 * fn + fp + smooth))
        total = total + (1.0 - jnp.mean(score))

    # f_score thresholds the raw probabilities, THEN applies row weights
    # (matching :func:`f_score`'s `probs > t` on unweighted softmax)
    pb = (probs_raw > threshold).astype(jnp.float32)
    if rw is not None:
        pb = pb * rw[None]
    tp2 = jnp.sum(tgt * pb, axis=(1, 2))
    fp2 = jnp.sum(pb, axis=(1, 2)) - tp2
    fn2 = jnp.sum(tgt, axis=(1, 2)) - tp2
    fs = jnp.mean(((1 + beta**2) * tp2 + smooth) /
                  ((1 + beta**2) * tp2 + beta**2 * fn2 + fp2 + smooth))
    if return_preds:
        # class-major argmax == argmax over the trailing class axis of the
        # (possibly in-bundle-resized) logits; (B, H, W) int32 for the
        # confusion matrix without ever materializing padded logits
        preds = jnp.argmax(lt, axis=0).astype(jnp.int32)
        if resize_to is not None:
            preds = preds.reshape((b,) + tuple(resize_to))
        else:
            preds = preds.reshape(labels.shape)
        return total, main, fs, preds
    return total, main, fs


def softmax_cross_entropy(logits, labels, weights=None):
    """Plain mean CE over a batch of class logits (fusion heads).

    Reference: ``nn.CrossEntropyLoss()`` in my_train(full).py:202,318-322.
    ``weights``: optional (B,) per-sample weights — a weighted mean over
    nonzero-weight rows, used to pad ragged tail micro-batches to one
    compiled shape (a 0/1 weight vector reproduces the reference's smaller
    final micro-batch exactly).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # mask-and-sum, not take_along_axis (see _flat_ce_terms): gathers
    # scalarize on the target platform
    eq = (labels[..., None] == jnp.arange(logp.shape[-1])).astype(
        jnp.float32)
    nll = -jnp.sum(logp * eq, axis=-1)
    if weights is None:
        return jnp.mean(nll)
    w = weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_mae_mse(mae_out, mae_labels, token_mask):
    """MSE between reconstructed and target modality tokens on masked slots.

    Reference: ``mes_loss_of_mae(input=fea_dict['mae_out'][mask[0]],
    target=fea_dict['mae_labels'][mask[0]])`` (my_train(full).py:253) — a mean
    over the selected ``(num_masked, D)`` elements.  Batched static-shape
    version: ``token_mask`` is ``(B, T)`` bool; mean over masked elements.
    """
    mae_out = mae_out.astype(jnp.float32)
    mae_labels = mae_labels.astype(jnp.float32)
    m = token_mask[..., None].astype(jnp.float32)
    se = jnp.sum((mae_out - mae_labels) ** 2 * m)
    count = jnp.maximum(jnp.sum(m) * mae_out.shape[-1], 1.0)
    return se / count


def fusion_multihead_loss(logits_dict, labels, head_weights=None,
                          mae_mse=None, mse_factor=5.0, num_micro_batches=1,
                          sample_weights=None):
    """Weighted multi-head CE sum + MAE-MSE auxiliary term.

    Reference weighting (my_train(full).py:325-341): fused head 1.0, each image
    head 0.3, cli head 0.2; the accumulated MAE MSE (already scaled by
    ``mse_loss_of_mae_factor``) is divided by the number of per-sample forward
    passes in the micro-batch and by 5.

    Args:
      logits_dict: ``{'all': (B,4), 'imgN': (B,4), ...}`` — only present heads.
      labels: ``(B,)`` int class labels.
      head_weights: optional dict overriding the per-head loss weights.
      mae_mse: optional scalar — the *factor-scaled, per-sample-summed* masked
        MSE (i.e. ``sum_i factor * masked_mse_i``).
      num_micro_batches: the reference's ``iter`` (samples accumulated).
    """
    default_w = {"all": 1.0, "imgN": 0.3, "imgA": 0.3, "imgL": 0.3, "cli": 0.2}
    if head_weights:
        default_w.update(head_weights)
    total = 0.0
    parts = {}
    for name, logits in logits_dict.items():
        ce = softmax_cross_entropy(logits, labels, sample_weights)
        parts[name] = ce
        total = total + default_w[name] * ce
    if mae_mse is not None:
        aux = mae_mse / num_micro_batches / mse_factor
        parts["mae_mse"] = aux
        total = total + aux
    return total, parts
