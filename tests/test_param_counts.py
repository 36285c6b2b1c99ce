"""Architecture-drift guards: parameter counts must match the reference
models (DeepLab-xception 54.7M, DeepLab-mobilenet 5.8M; fusion ~12.6M from
the cited layer dims)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _count(params):
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def test_deeplab_mobilenet_param_count():
    from cervical_tpu.models.deeplab import DeepLab
    d = DeepLab(num_classes=5, backbone="mobilenet")
    v = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    n = _count(v["params"])
    assert 5.6e6 < n < 6.0e6, n


@pytest.mark.slow
def test_deeplab_xception_param_count():
    from cervical_tpu.models.deeplab import DeepLab
    d = DeepLab(num_classes=5, backbone="xception")
    v = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    n = _count(v["params"])
    assert 54.0e6 < n < 55.5e6, n


def test_fusion_param_count():
    from cervical_tpu.models.fusion import FusionMAE
    m = FusionMAE()
    feats = {k: jnp.zeros((1, 4 if k == "cli" else 16, 1024))
             for k in m.modalities}
    v = m.init(jax.random.PRNGKey(0), feats)
    n = _count(v["params"])
    # 4x dense SAGE (1024->512, two mats) + depth-1 MAE enc/dec @512 +
    # mixer + 8 attention pools + towers + heads
    assert 11.5e6 < n < 13.5e6, n
