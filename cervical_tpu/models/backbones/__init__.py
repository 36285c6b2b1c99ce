"""Segmentation backbones (NHWC flax modules)."""

from cervical_tpu.models.backbones.mobilenetv2 import MobileNetV2Backbone  # noqa: F401
from cervical_tpu.models.backbones.xception import XceptionBackbone  # noqa: F401
