"""Evaluation metrics.

Rebuilds the reference's two metric stacks:

* segmentation — confusion-matrix ("fast_hist") based mIoU / PA-Recall /
  Precision / overall accuracy (``Segmentation/deeplabv3+/utils/utils_metrics.py:38-193``),
  plus a jit-compiled on-device confusion accumulator so in-training eval never
  leaves the chip.
* classification — accuracy, per-class precision/recall/F1, confusion matrix
  and FP/FN/TP/TN breakdown used by the fusion drivers
  (``MultiModal Prediction/Four_Modal/my_train(full).py:144-171,386-408``) —
  implemented sklearn-free from the confusion matrix.
* multi-label evaluation of segmentation output (subset accuracy, accuracy,
  precision, recall, F1, Hamming loss — the README.md:13 numbers).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Segmentation metrics (confusion-matrix based)
# ---------------------------------------------------------------------------

def fast_hist(label, pred, num_classes):
    """Confusion matrix via bincount (utils_metrics.py:38-47). numpy, host-side."""
    label = np.asarray(label).reshape(-1)
    pred = np.asarray(pred).reshape(-1)
    k = (label >= 0) & (label < num_classes)
    return np.bincount(
        num_classes * label[k].astype(int) + pred[k], minlength=num_classes**2
    ).reshape(num_classes, num_classes)


def confusion_matrix_jax(labels, preds, num_classes):
    """On-device confusion matrix for jitted eval loops.

    Same semantics as :func:`fast_hist` (rows = ground truth, cols = pred;
    labels outside [0, num_classes) are dropped), but runs on TPU so per-batch
    eval never syncs to host.

    Formulated as a ONE-HOT CONTRACTION — ``einsum(one_hot(label),
    one_hot(pred))`` on the MXU — instead of a per-pixel ``.at[idx].add``
    scatter: the target platform scalarizes per-element indexed access
    (docs/PLATFORM.md item 5 — the round-4 loss-gather pathology; scatters
    share the lowering).  Out-of-range labels one-hot to a zero row, which
    drops the pixel exactly like ``fast_hist``'s mask.  Pixels are summed
    in f32 segments of 2^22 (per-cell counts stay < 2^24, the f32 exact-
    integer bound) and accumulated in int32 across segments.
    """
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    n = labels.shape[0]
    seg = min(1 << 22, n)  # tiny inputs: one exact segment, no padding
    pad = (-n) % seg
    if pad:
        # padded pixels get label = num_classes -> zero one-hot row
        labels = jnp.concatenate(
            [labels, jnp.full((pad,), num_classes, jnp.int32)])
        preds = jnp.concatenate([preds, jnp.zeros((pad,), jnp.int32)])
    s = labels.shape[0] // seg
    lab1 = jax.nn.one_hot(labels.reshape(s, seg), num_classes,
                          dtype=jnp.float32)
    prd1 = jax.nn.one_hot(preds.reshape(s, seg), num_classes,
                          dtype=jnp.float32)
    hists = jnp.einsum("spc,spd->scd", lab1, prd1)
    return hists.astype(jnp.int32).sum(axis=0)


def confusion_matrix_scatter(labels, preds, num_classes):
    """The scatter (``.at[idx].add``) formulation of
    :func:`confusion_matrix_jax` — kept for the eval-path A/B bench
    (scripts/bench_predict.py); identical output."""
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    valid = (labels >= 0) & (labels < num_classes)
    idx = jnp.where(valid, num_classes * labels + preds, num_classes * num_classes)
    counts = jnp.zeros((num_classes * num_classes + 1,), jnp.int32).at[idx].add(1)
    return counts[:-1].reshape(num_classes, num_classes)


def per_class_iu(hist):
    """IoU per class = TP / (TP + FP + FN) (utils_metrics.py:62-63)."""
    hist = np.asarray(hist, np.float64)
    return np.diag(hist) / np.maximum(hist.sum(1) + hist.sum(0) - np.diag(hist), 1)


def per_class_pa_recall(hist):
    """Recall (pixel accuracy) per class = TP / (TP + FN) (utils_metrics.py:84-85)."""
    hist = np.asarray(hist, np.float64)
    return np.diag(hist) / np.maximum(hist.sum(1), 1)


def per_class_precision(hist):
    """Precision per class = TP / (TP + FP) (utils_metrics.py:106-107)."""
    hist = np.asarray(hist, np.float64)
    return np.diag(hist) / np.maximum(hist.sum(0), 1)


def per_accuracy(hist):
    """Overall pixel accuracy (utils_metrics.py:115-116)."""
    hist = np.asarray(hist, np.float64)
    return np.sum(np.diag(hist)) / np.maximum(np.sum(hist), 1)


DEFAULT_SEG_CLASS_NAMES = ("Background", "AW", "Puncation", "Mosaic", "Atypical")


def summarize_hist(hist, name_classes=DEFAULT_SEG_CLASS_NAMES):
    """IoU/Recall/Precision summary dict from an accumulated confusion matrix.

    The in-memory equivalent of ``compute_mIoU``'s reporting
    (utils_metrics.py:120-193); file-walking lives in
    :mod:`cervical_tpu.inference.evaluator`.
    """
    ious = per_class_iu(hist)
    recall = per_class_pa_recall(hist)
    precision = per_class_precision(hist)
    return {
        "hist": np.asarray(hist, int),
        "iou": ious,
        "recall": recall,
        "precision": precision,
        "miou": float(np.nanmean(ious)),
        "mpa": float(np.nanmean(recall)),
        "accuracy": float(per_accuracy(hist)),
        "names": tuple(name_classes),
    }


# ---------------------------------------------------------------------------
# Classification metrics (fusion model)
# ---------------------------------------------------------------------------

def classification_report(true_labels, pred_labels, num_classes=4):
    """Accuracy, per-class precision/recall/F1, confusion, FP/FN/TP/TN.

    sklearn-free reimplementation of the metric block in
    my_train(full).py:144-171 (``average=None`` semantics: per-class arrays,
    0 where the denominator is 0).
    """
    true_labels = np.asarray(true_labels, int).reshape(-1)
    pred_labels = np.asarray(pred_labels, int).reshape(-1)
    cm = fast_hist(true_labels, pred_labels, num_classes)
    rep = report_from_confusion(cm)
    rep["accuracy"] = (float(np.mean(true_labels == pred_labels))
                       if len(true_labels) else 0.0)
    return rep


def report_from_confusion(cm):
    """classification_report() metric block derived from a (possibly
    fold-aggregated) confusion matrix; accuracy is the confusion-trace
    ratio."""
    cm = np.asarray(cm)
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    tn = cm.sum() - (fp + fn + tp)
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 0.0)
        recall = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1), 0.0)
        f1_den = precision + recall
        f1 = np.where(f1_den > 0, 2 * precision * recall / np.maximum(f1_den, 1e-12), 0.0)
        sensitivity = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1), 0.0)
        specificity = np.where(tn + fp > 0, tn / np.maximum(tn + fp, 1), 0.0)
    return {
        "accuracy": float(tp.sum() / cm.sum()) if cm.sum() else 0.0,
        "confusion": cm,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "fp": fp,
        "fn": fn,
        "tp": tp,
        "tn": tn,
        "sensitivity": sensitivity,
        "specificity": specificity,
    }


def accuracy(true_labels, pred_labels):
    true_labels = np.asarray(true_labels).reshape(-1)
    pred_labels = np.asarray(pred_labels).reshape(-1)
    if len(true_labels) == 0:
        return 0.0
    return float(np.mean(true_labels == pred_labels))


# ---------------------------------------------------------------------------
# Multi-label evaluation of segmentation output (README.md:13 metric family)
# ---------------------------------------------------------------------------

def multilabel_report(true_sets, pred_sets, num_labels=4):
    """Multi-label metrics over per-image lesion-presence sets.

    ``true_sets`` / ``pred_sets``: (N, num_labels) binary arrays — presence of
    each foreground class in each image (derived from GT masks and predicted
    masks).  Returns subset accuracy, elementwise accuracy, micro precision /
    recall / F1 and Hamming loss, matching the README.md:13 evaluation of the
    segmentation output as a multi-label classifier.
    """
    t = np.asarray(true_sets, bool)
    p = np.asarray(pred_sets, bool)
    assert t.shape == p.shape
    subset_acc = float(np.mean(np.all(t == p, axis=1))) if len(t) else 0.0
    elem_acc = float(np.mean(t == p)) if t.size else 0.0
    tp = float(np.sum(t & p))
    fp = float(np.sum(~t & p))
    fn = float(np.sum(t & ~p))
    precision = tp / max(tp + fp, 1.0)
    recall = tp / max(tp + fn, 1.0)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    hamming = float(np.mean(t != p)) if t.size else 0.0
    return {
        "subset_accuracy": subset_acc,
        "accuracy": elem_acc,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "hamming": hamming,
    }


# ---------------------------------------------------------------------------
# Report artifacts (bar charts + CSV dumps)
# ---------------------------------------------------------------------------

def draw_bar_chart(values, names, title, xlabel, path):
    """One horizontal per-class bar chart (draw_plot_func,
    utils_metrics.py:204-224).  No-op if matplotlib is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return False
    plt.figure()
    plt.barh(range(len(values)), values, color="royalblue")
    plt.title(title)
    plt.xlabel(xlabel)
    plt.yticks(range(len(values)), names)
    for i, val in enumerate(values):
        plt.text(val, i, f" {val:.2f}", va="center", fontweight="bold",
                 color="royalblue")
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
    return True


def write_classification_report(report, out_dir, class_names=None):
    """Classification-side analog of the segmentation ``show_results`` dump
    (utils_metrics.py:226-250): per-class Precision/Recall/F1 bar charts,
    ``confusion_matrix.csv`` and a ``classification_report.csv`` table.
    The reference only ever *prints* these numbers
    (my_train(full).py:386-408); the artifact files close that
    observability gap.

    ``report``: a :func:`classification_report` /
    :func:`report_from_confusion` dict.
    """
    import csv
    import os

    os.makedirs(out_dir, exist_ok=True)
    cm = np.asarray(report["confusion"])
    n = cm.shape[0]
    names = list(class_names or [f"class{i}" for i in range(n)])

    with open(os.path.join(out_dir, "confusion_matrix.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow([" "] + [str(c) for c in names])
        for i in range(n):
            w.writerow([names[i]] + [str(int(x)) for x in cm[i]])

    with open(os.path.join(out_dir, "classification_report.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["class", "precision", "recall", "f1", "sensitivity",
                    "specificity", "tp", "fp", "fn", "tn"])
        for i in range(n):
            w.writerow([names[i]] + [
                f"{report[k][i]:.6f}" for k in
                ("precision", "recall", "f1", "sensitivity", "specificity")]
                + [str(int(report[k][i])) for k in ("tp", "fp", "fn", "tn")])
        w.writerow(["accuracy", f"{report['accuracy']:.6f}"])

    for key, fname, xlabel in (("precision", "Precision.png", "Precision"),
                               ("recall", "Recall.png", "Recall"),
                               ("f1", "F1.png", "F1 score")):
        vals = np.asarray(report[key], np.float64)
        draw_bar_chart(vals, names,
                       f"m{xlabel} = {np.nanmean(vals) * 100:.2f}%",
                       xlabel, os.path.join(out_dir, fname))
