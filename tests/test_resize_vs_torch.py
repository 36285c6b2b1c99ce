"""resize_bilinear vs torch.nn.functional.interpolate — the reference's
models rely on ``align_corners=True`` bilinear everywhere
(deeplabv3_plus.py:106,184,187; deeplab.py softmax resize).  torch (cpu) is
available in this image, so check exact agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cervical_tpu.ops.image import resize_bilinear


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape", [((7, 9), (14, 18)), ((16, 16), (5, 11)),
                                   ((4, 4), (16, 16)), ((30, 30), (30, 30))])
def test_matches_torch_interpolate(align, shape):
    (ih, iw), (oh, ow) = shape
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, ih, iw, 3)).astype(np.float32)

    got = np.asarray(resize_bilinear(jnp.asarray(x), (oh, ow),
                                     align_corners=align))

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = torch.nn.functional.interpolate(
        t, size=(oh, ow), mode="bilinear", align_corners=align)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_upsample_x4_exact_deeplab_case():
    # the DeepLab head's x4 upsample (deeplabv3_plus.py:187)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 5)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (32, 32),
                                     align_corners=True))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = torch.nn.functional.interpolate(t, size=(32, 32), mode="bilinear",
                                          align_corners=True)
    np.testing.assert_allclose(got, np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)
