"""SegEvaluator: pixel + multi-label metrics accumulation."""

import numpy as np

from cervical_tpu.inference.evaluator import SegEvaluator, presence_sets


def test_presence_sets():
    mask = np.zeros((8, 8), np.uint8)
    mask[0, 0] = 1
    mask[1, :4] = 3
    np.testing.assert_array_equal(presence_sets(mask, 5),
                                  [True, False, True, False])
    # min_pixels threshold suppresses single-pixel specks
    np.testing.assert_array_equal(presence_sets(mask, 5, min_pixels=2),
                                  [False, False, True, False])


def test_evaluator_perfect_prediction():
    ev = SegEvaluator(num_classes=5)
    rng = np.random.default_rng(0)
    for _ in range(3):
        m = rng.integers(0, 5, (16, 16)).astype(np.uint8)
        ev.add(m, m)
    s = ev.summary()
    assert s["miou"] == 1.0
    assert s["multilabel"]["subset_accuracy"] == 1.0
    assert s["multilabel"]["hamming"] == 0.0


def test_evaluator_partial(capsys):
    ev = SegEvaluator(num_classes=3, name_classes=("bg", "a", "b"))
    gt = np.zeros((4, 4), np.uint8)
    gt[0] = 1
    pred = np.zeros((4, 4), np.uint8)
    pred[0, :2] = 1
    pred[3, 3] = 2  # false positive class
    ev.add(gt, pred)
    s = ev.report()
    assert 0 < s["iou"][1] < 1
    ml = s["multilabel"]
    assert ml["recall"] == 1.0  # class 1 present & predicted
    assert ml["precision"] == 0.5  # class 2 predicted but absent
