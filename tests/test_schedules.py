"""LR schedule tests (reference: nets/deeplabv3_training.py:81-117,
Four_Modal/util.py:79-82, train.py:459-467)."""

import numpy as np

from cervical_tpu.train import schedules


def test_warm_cos_matches_reference_shape():
    s = schedules.warm_cos_schedule(1e-4, 1e-8, 200)
    # warmup_total = min(max(20, 1), 3) = 3; quadratic warmup
    start = max(0.1 * 1e-4, 1e-6)
    np.testing.assert_allclose(s(0), start)
    np.testing.assert_allclose(s(3), 1e-4, rtol=1e-9)
    # plateau: last 15 epochs at min_lr
    assert s(185) == 1e-8
    assert s(199) == 1e-8
    # cosine midpoint between warmup and plateau
    mid = (3 + 185) / 2
    np.testing.assert_allclose(s(mid), 1e-8 + 0.5 * (1e-4 - 1e-8), rtol=1e-6)
    # monotone decreasing after warmup
    vals = [s(i) for i in range(3, 186)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_step_schedule():
    s = schedules.step_schedule(1e-3, 1e-5, 100, step_num=10)
    decay = (1e-5 / 1e-3) ** (1 / 9)
    np.testing.assert_allclose(s(0), 1e-3)
    np.testing.assert_allclose(s(10), 1e-3 * decay)
    np.testing.assert_allclose(s(95), 1e-3 * decay**9, rtol=1e-9)


def test_fusion_step_decay():
    s = schedules.fusion_step_decay(1e-4, gamma=0.8, lr_step=40)
    np.testing.assert_allclose(s(0), 1e-4)
    np.testing.assert_allclose(s(39), 1e-4)
    np.testing.assert_allclose(s(40), 0.8e-4)
    np.testing.assert_allclose(s(80), 0.64e-4)


def test_adaptive_seg_lr_xception_clamps():
    init_fit, min_fit = schedules.adaptive_seg_lr(1e-4, 1e-8, batch_size=8,
                                                  backbone="xception")
    # batch/nbs * lr = 5e-5 clamped up to 1e-4 (xception adam limit)
    np.testing.assert_allclose(init_fit, 1e-4)
    np.testing.assert_allclose(min_fit, 1e-6)  # clamped to min 1e-4*1e-2


def test_get_lr_scheduler_dispatch():
    cos = schedules.get_lr_scheduler("cos", 1e-3, 1e-5, 100)
    step = schedules.get_lr_scheduler("step", 1e-3, 1e-5, 100)
    assert cos(50) != step(50)
