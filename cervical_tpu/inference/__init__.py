"""Inference: the segmentation predictor, mIoU evaluator, the fusion
predictor, and model export."""

from cervical_tpu.inference.predictor import SegPredictor  # noqa: F401
from cervical_tpu.inference.fusion_predictor import (  # noqa: F401
    FusionPredictor)
