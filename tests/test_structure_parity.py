"""Structural parity checks against reference-specific quirks that shape
the parameter tree (my_mae_model.py / nets layer wiring)."""

import numpy as np
import jax
import jax.numpy as jnp


def _fusion_params():
    from cervical_tpu.models.fusion import FusionMAE
    m = FusionMAE()
    feats = {k: jnp.zeros((1, 4 if k == "cli" else 16, 1024))
             for k in m.modalities}
    return m.init(jax.random.PRNGKey(0), feats)["params"]


def test_mixer_shares_one_graphnorm():
    """The reference MixerBlock applies the SAME LayerNorm instance twice
    (my_mae_model.py:356,361) — the mixer must own exactly one norm."""
    p = _fusion_params()
    mixer = p["mixer"]
    norms = [k for k in mixer if "norm" in k]
    assert norms == ["norm"], sorted(mixer)


def test_two_pool_stages_per_modality():
    """Eight gated-attention pools: 2 stages x 4 modalities
    (my_mae_model.py:433-450)."""
    p = _fusion_params()
    for m in ("imgN", "imgA", "imgL", "cli"):
        assert f"mpool_{m}" in p and f"mpool_{m}_2" in p
        # gate MLP: D -> D//4 -> 1
        assert p[f"mpool_{m}"]["gate_fc1"]["kernel"].shape == (512, 128)
        assert p[f"mpool_{m}"]["gate_fc2"]["kernel"].shape == (128, 1)


def test_sage_bias_only_on_neighbor_branch():
    """PyG SAGEConv parameterization: lin_l (aggregated) has bias, lin_r
    (root) does not (my_mae_model.py:404-416)."""
    p = _fusion_params()
    sage = p["imgN_gnn"]
    assert "bias" in sage["lin_l"]
    assert "bias" not in sage["lin_r"]
    assert sage["lin_l"]["kernel"].shape == (1024, 512)


def test_mae_encoder_decoder_depth_one_and_heads():
    """encoder_depth=1, decoder_depth=1, enc heads 12, dec heads 8 with the
    head-dim truncation (512//12*12 = 504) (my_mae_model.py:453,72-103)."""
    p = _fusion_params()
    mae = p["mae"]
    assert "block0" in mae["encoder"] and "block1" not in mae["encoder"]
    assert "block0" in mae["decoder"] and "block1" not in mae["decoder"]
    # encoder qkv: 512 -> 3 * (512//12)*12 = 1512
    assert mae["encoder"]["block0"]["attn"]["qkv"]["kernel"].shape == (512, 1512)
    # decoder qkv: 512 -> 3 * (512//8)*8 = 1536
    assert mae["decoder"]["block0"]["attn"]["qkv"]["kernel"].shape == (512, 1536)
    # encoder_to_decoder is bias-free (my_mae_model.py:281)
    assert "bias" not in mae["encoder_to_decoder"]
    assert mae["mask_token"].shape == (512,)


def test_tower_dims_512_128_32_8_4():
    """Per-modality towers 512->128->32->8 and 8->4 heads
    (my_mae_model.py:458-489)."""
    p = _fusion_params()
    assert p["lin1_imgN"]["kernel"].shape == (512, 128)
    assert p["lin2_imgN"]["kernel"].shape == (128, 32)
    assert p["lin3_imgN"]["kernel"].shape == (32, 8)
    assert p["classifier_imgN"]["kernel"].shape == (8, 4)
    assert p["classifier"]["kernel"].shape == (8, 4)


def test_deeplab_structure():
    """ASPP five branches + fuse; 48-ch shortcut; 304->256 cat conv
    (deeplabv3_plus.py:56-167)."""
    from cervical_tpu.models.deeplab import DeepLab
    model = DeepLab(num_classes=5, backbone="mobilenet")
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    for b in ("branch1", "branch2", "branch3", "branch4", "branch5", "fuse"):
        assert b in p["aspp"], sorted(p["aspp"])
    assert p["shortcut"]["conv"]["kernel"].shape[-1] == 48
    assert p["cat_conv1"]["conv"]["kernel"].shape == (3, 3, 304, 256)
    assert p["cls_conv"]["kernel"].shape == (1, 1, 256, 5)


def test_xception_low_level_channels():
    """block2's sepconv2 output (the hook feature) must be 256-ch at os4
    (xception.py:69,157)."""
    from cervical_tpu.models.backbones import XceptionBackbone
    bb = XceptionBackbone(downsample_factor=16)
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    low, high = bb.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert low.shape == (1, 16, 16, 256)
    assert high.shape[-1] == 2048
