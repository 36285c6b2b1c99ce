"""Golden-value tests for metrics (reference: utils_metrics.py:38-193 and the
docstring examples embedded there; my_train(full).py:144-171)."""

import numpy as np
import jax.numpy as jnp

from cervical_tpu import metrics


def test_fast_hist_counts():
    label = np.array([0, 0, 1, 2, 2, 3])
    pred = np.array([0, 1, 1, 2, 1, 3])
    h = metrics.fast_hist(label, pred, 4)
    expected = np.array([[1, 1, 0, 0],
                         [0, 1, 0, 0],
                         [0, 1, 1, 0],
                         [0, 0, 0, 1]])
    np.testing.assert_array_equal(h, expected)


def test_fast_hist_drops_out_of_range():
    label = np.array([0, 5, -1, 1])
    pred = np.array([0, 0, 0, 1])
    h = metrics.fast_hist(label, pred, 2)
    np.testing.assert_array_equal(h, np.array([[1, 0], [0, 1]]))


def test_confusion_matrix_jax_matches_numpy():
    rng = np.random.default_rng(3)
    label = rng.integers(0, 6, size=500)  # includes out-of-range 5
    pred = rng.integers(0, 5, size=500)
    h_np = metrics.fast_hist(label, pred, 5)
    h_jax = metrics.confusion_matrix_jax(jnp.asarray(label), jnp.asarray(pred), 5)
    np.testing.assert_array_equal(np.asarray(h_jax), h_np)


def test_per_class_iu_docstring_example():
    # utils_metrics.py:50-60 worked example
    hist = np.array([[5, 2, 0, 1],
                     [1, 7, 1, 0],
                     [0, 2, 8, 0],
                     [0, 0, 0, 9]])
    ious = metrics.per_class_iu(hist)
    np.testing.assert_allclose(ious, [5 / 9, 7 / 13, 8 / 11, 9 / 10])


def test_per_class_recall_precision_docstring_examples():
    hist = np.array([[80, 20, 0],
                     [10, 70, 20],
                     [0, 30, 70]])
    np.testing.assert_allclose(metrics.per_class_pa_recall(hist), [0.8, 0.7, 0.7])
    hist2 = np.array([[80, 5, 15],
                      [20, 75, 5],
                      [0, 20, 80]])
    np.testing.assert_allclose(metrics.per_class_precision(hist2), [0.8, 0.75, 0.8])


def test_summarize_hist():
    hist = np.diag([10, 5, 5, 5, 5])
    s = metrics.summarize_hist(hist)
    assert s["miou"] == 1.0
    assert s["accuracy"] == 1.0
    assert len(s["iou"]) == 5


def test_classification_report_basic():
    true = [0, 0, 1, 1, 2, 3]
    pred = [0, 1, 1, 1, 2, 2]
    r = metrics.classification_report(true, pred, 4)
    np.testing.assert_allclose(r["accuracy"], 4 / 6)
    np.testing.assert_array_equal(r["tp"], [1, 2, 1, 0])
    np.testing.assert_array_equal(r["fn"], [1, 0, 0, 1])
    np.testing.assert_array_equal(r["fp"], [0, 1, 1, 0])
    # precision/recall with average=None semantics
    np.testing.assert_allclose(r["precision"], [1.0, 2 / 3, 0.5, 0.0])
    np.testing.assert_allclose(r["recall"], [0.5, 1.0, 1.0, 0.0])


def test_multilabel_report_perfect():
    t = np.array([[1, 0, 1, 0], [0, 1, 0, 0]])
    r = metrics.multilabel_report(t, t)
    assert r["subset_accuracy"] == 1.0
    assert r["hamming"] == 0.0
    assert r["f1"] == 1.0


def test_multilabel_report_mixed():
    t = np.array([[1, 0], [1, 1]])
    p = np.array([[1, 1], [1, 0]])
    r = metrics.multilabel_report(t, p, num_labels=2)
    assert r["subset_accuracy"] == 0.0
    np.testing.assert_allclose(r["accuracy"], 0.5)
    np.testing.assert_allclose(r["precision"], 2 / 3)
    np.testing.assert_allclose(r["recall"], 2 / 3)
    np.testing.assert_allclose(r["hamming"], 0.5)


def test_report_from_confusion_matches_classification_report():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 200)
    p = rng.integers(0, 4, 200)
    full = metrics.classification_report(t, p)
    derived = metrics.report_from_confusion(full["confusion"])
    for k in ("precision", "recall", "f1", "sensitivity", "specificity",
              "tp", "fp", "fn", "tn"):
        np.testing.assert_allclose(derived[k], full[k])
    np.testing.assert_allclose(derived["accuracy"], full["accuracy"])


def test_write_classification_report(tmp_path):
    """The classification-side show_results analog writes CSVs + bar
    charts whose numbers round-trip."""
    import csv
    import os
    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, 100)
    p = np.where(rng.random(100) < 0.7, t, rng.integers(0, 4, 100))
    rep = metrics.classification_report(t, p)
    out = str(tmp_path / "cls_out")
    metrics.write_classification_report(rep, out,
                                        class_names=list("ABCD"))
    with open(os.path.join(out, "confusion_matrix.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == [" ", "A", "B", "C", "D"]
    cm = np.array([[int(x) for x in r[1:]] for r in rows[1:]])
    np.testing.assert_array_equal(cm, rep["confusion"])
    with open(os.path.join(out, "classification_report.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "class" and rows[-1][0] == "accuracy"
    np.testing.assert_allclose(float(rows[1][1]), rep["precision"][0],
                               atol=1e-6)
    for fname in ("Precision.png", "Recall.png", "F1.png"):
        assert os.path.getsize(os.path.join(out, fname)) > 0
