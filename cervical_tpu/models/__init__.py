"""Model zoo: multimodal fusion-MAE classifier and DeepLabV3+ segmentation."""

from cervical_tpu.models.fusion import FusionMAE  # noqa: F401
from cervical_tpu.models.deeplab import DeepLab  # noqa: F401
