"""Inference: the segmentation predictor, mIoU evaluator, and model export."""

from cervical_tpu.inference.predictor import SegPredictor  # noqa: F401
