"""TPU-native compute ops: dense graph math, fused image augmentation,
histogram equalization, and Pallas kernels for the per-pixel hot paths."""
