"""cervical_tpu — TPU-native framework for multimodal cervical-lesion severity
prediction and lesion segmentation.

A ground-up JAX/XLA/Pallas/pjit redesign with the capabilities of the reference
PyTorch research codebase
`alanchou89/Multimodal-Prediction-and-Cervical-Lesion-Slice-Segmentation-Based-on-Deep-Learning`:

* ``cervical_tpu.models.fusion`` — the graph + masked-autoencoder multimodal
  fusion classifier (2/3/4-modality subsets) rebuilt as one batched,
  static-shape, vmappable flax module (reference:
  ``MultiModal Prediction/*/my_mae_model*.py``).
* ``cervical_tpu.models.deeplab`` — DeepLabV3+ with Xception / MobileNetV2
  backbones in NHWC layout for the MXU (reference:
  ``Segmentation/deeplabv3+/nets/``).
* ``cervical_tpu.ops`` — dense static graph math, fused batched augmentation
  (single affine warp + photometric jitter), Pallas kernels for the hot
  per-pixel paths.
* ``cervical_tpu.train`` — jitted data-parallel training loops (grad psum over
  an ICI mesh replaces DDP/NCCL; bf16 replaces AMP+GradScaler), orbax
  checkpointing, LR schedules, callbacks.
* ``cervical_tpu.parallel`` — device-mesh / NamedSharding helpers.
"""

__version__ = "0.1.0"

from cervical_tpu import losses, metrics  # noqa: F401
