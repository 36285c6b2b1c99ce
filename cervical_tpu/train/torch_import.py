"""Torch checkpoint -> flax parameter conversion.

The reference bootstraps from ImageNet-pretrained torch weights
(``nets/xception.py:194-198``, ``nets/mobilenetv2.py:148-152``, the whole-
model ``deeplab_xception.pth`` partial load at ``train.py:317-339``, and
torchvision ``resnet101(pretrained=True)`` for the multimodal featurizer,
``Graph_Structure:131-142``).  These converters map torch ``state_dict``s
onto the flax trees of :mod:`cervical_tpu.models`.

Conventions: torch convs are OIHW -> flax HWIO; depthwise convs (C,1,kh,kw)
-> (kh,kw,1,C); linear (out,in) -> (in,out); BatchNorm weight/bias/
running_mean/running_var -> scale/bias/mean/var.  torch is an optional
*dev-side* dependency — only these offline tools touch it.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _conv(w):
    w = np.asarray(w)
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth/.pt state dict into numpy (torch cpu)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


class _Mapper:
    """Collects params/batch_stats assignments keyed by flax paths."""

    def __init__(self, sd: Dict[str, np.ndarray], strict: bool = True):
        self.sd = sd
        self.params: Dict = {}
        self.stats: Dict = {}
        self.missing = []
        self.used = set()  # torch keys consumed (coverage checks in tests)
        self.strict = strict

    def _get(self, key):
        if key not in self.sd:
            self.missing.append(key)
            if self.strict:
                raise KeyError(f"torch key missing: {key}")
            return None
        self.used.add(key)
        return self.sd[key]

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, flax_path, torch_name, bias=False):
        w = self._get(torch_name + ".weight")
        if w is not None:
            self._set(self.params, flax_path + ("kernel",), _conv(w))
        if bias:
            b = self._get(torch_name + ".bias")
            if b is not None:
                self._set(self.params, flax_path + ("bias",), np.asarray(b))

    def bn(self, flax_path, torch_name):
        pairs = [("weight", "scale", self.params), ("bias", "bias", self.params),
                 ("running_mean", "mean", self.stats),
                 ("running_var", "var", self.stats)]
        for tname, fname, tree in pairs:
            v = self._get(f"{torch_name}.{tname}")
            if v is not None:
                self._set(tree, flax_path + (fname,), np.asarray(v))

    def ln(self, flax_path, torch_name):
        """LayerNorm/GraphNorm: weight/bias -> scale/bias (params only)."""
        for tname, fname in (("weight", "scale"), ("bias", "bias")):
            v = self._get(f"{torch_name}.{tname}")
            if v is not None:
                self._set(self.params, flax_path + (fname,), np.asarray(v))

    def raw(self, flax_path, torch_name, transform=None):
        v = self._get(torch_name)
        if v is not None:
            v = np.asarray(v)
            if transform is not None:
                v = transform(v)
            self._set(self.params, flax_path, v)

    def linear(self, flax_path, torch_name, bias=True):
        w = self._get(torch_name + ".weight")
        if w is not None:
            self._set(self.params, flax_path + ("kernel",), _linear(w))
        if bias:
            b = self._get(torch_name + ".bias")
            if b is not None:
                self._set(self.params, flax_path + ("bias",), np.asarray(b))


def convert_xception(sd: Dict[str, np.ndarray], strict: bool = True):
    """bubbliiiing ``xception_pytorch_imagenet.pth`` -> XceptionBackbone
    params/batch_stats (nets/xception.py name scheme)."""
    m = _Mapper(sd, strict)

    def sepconv(flax_prefix, torch_prefix):
        m.conv(flax_prefix + ("depthwise",), torch_prefix + ".depthwise")
        m.bn(flax_prefix + ("bn1",), torch_prefix + ".bn1")
        m.conv(flax_prefix + ("pointwise",), torch_prefix + ".pointwise")
        m.bn(flax_prefix + ("bn2",), torch_prefix + ".bn2")

    m.conv(("conv1",), "conv1")
    m.bn(("bn1",), "bn1")
    m.conv(("conv2",), "conv2")
    m.bn(("bn2",), "bn2")
    for i in range(1, 21):
        fx = (f"block{i}",)
        tp = f"block{i}"
        if f"{tp}.skip.weight" in sd:
            m.conv(fx + ("skip",), tp + ".skip")
            m.bn(fx + ("skip_bn",), tp + ".skipbn")
        for k in (1, 2, 3):
            sepconv(fx + (f"sepconv{k}",), f"{tp}.sepconv{k}")
    for k in (3, 4, 5):
        sepconv((f"conv{k}",), f"conv{k}")
    return m.params, m.stats, m.missing


def convert_mobilenetv2(sd: Dict[str, np.ndarray], strict: bool = True):
    """bubbliiiing ``mobilenet_v2.pth.tar`` -> MobileNetV2Backbone params.

    Torch layout (nets/mobilenetv2.py): ``features.0`` = stem conv_bn;
    ``features.N.conv`` = inverted residual with [expand conv, bn, relu]?,
    depthwise conv, bn, relu, project conv, bn.
    """
    from cervical_tpu.models.backbones.mobilenetv2 import INVERTED_RESIDUAL_SETTING
    m = _Mapper(sd, strict)
    m.conv(("stem", "conv"), "features.0.0")
    m.bn(("stem", "bn"), "features.0.1")
    idx = 1
    for t, c, n, s in INVERTED_RESIDUAL_SETTING:
        for i in range(n):
            fx = (f"block{idx}",)
            tp = f"features.{idx}.conv"
            if t == 1:
                # depthwise at .0/.1, project at .3/.4
                m.conv(fx + ("depthwise", "conv"), tp + ".0")
                m.bn(fx + ("depthwise", "bn"), tp + ".1")
                m.conv(fx + ("project",), tp + ".3")
                m.bn(fx + ("project_bn",), tp + ".4")
            else:
                m.conv(fx + ("expand", "conv"), tp + ".0")
                m.bn(fx + ("expand", "bn"), tp + ".1")
                m.conv(fx + ("depthwise", "conv"), tp + ".3")
                m.bn(fx + ("depthwise", "bn"), tp + ".4")
                m.conv(fx + ("project",), tp + ".6")
                m.bn(fx + ("project_bn",), tp + ".7")
            idx += 1
    return m.params, m.stats, m.missing


def convert_resnet(sd: Dict[str, np.ndarray], depth: int = 101,
                   strict: bool = True, with_fc: bool = True):
    """torchvision resnet50/101 -> ResNetFeaturizer params/batch_stats."""
    from cervical_tpu.models.backbones.resnet import STAGE_BLOCKS
    m = _Mapper(sd, strict)
    m.conv(("conv1",), "conv1")
    m.bn(("bn1",), "bn1")
    for stage, n in enumerate(STAGE_BLOCKS[depth]):
        for i in range(n):
            fx = (f"layer{stage + 1}_{i}",)
            tp = f"layer{stage + 1}.{i}"
            for k in (1, 2, 3):
                m.conv(fx + (f"conv{k}",), f"{tp}.conv{k}")
                m.bn(fx + (f"bn{k}",), f"{tp}.bn{k}")
            if f"{tp}.downsample.0.weight" in sd:
                m.conv(fx + ("downsample_conv",), f"{tp}.downsample.0")
                m.bn(fx + ("downsample_bn",), f"{tp}.downsample.1")
    if with_fc and "fc.weight" in sd:
        m.linear(("fc",), "fc")
    return m.params, m.stats, m.missing


def convert_deeplab(sd: Dict[str, np.ndarray], backbone: str = "xception",
                    strict: bool = True):
    """Whole-model DeepLab state dict (``deeplab_xception.pth``-style,
    train.py:317-339) -> flax params/batch_stats for
    :class:`cervical_tpu.models.deeplab.DeepLab`.

    Torch layout (nets/deeplabv3_plus.py:116-168): ``backbone.*``;
    ``aspp.branch{1..4}.0/.1`` conv/bn, ``aspp.branch5_conv``/``_bn``,
    ``aspp.conv_cat.0/.1``; ``shortcut_conv.0/.1``; ``cat_conv.0/.1`` and
    ``.4/.5``; ``cls_conv``.
    """
    bsd = {k[len("backbone."):]: v for k, v in sd.items()
           if k.startswith("backbone.")}
    if backbone == "xception":
        bp, bs, bmiss = convert_xception(bsd, strict)
    elif backbone == "mobilenet":
        # DeepLab's wrapper holds ``model.features[:-1]`` under
        # ``backbone.features`` (deeplabv3_plus.py:13-14), so the stripped
        # keys line up with the standalone mobilenet scheme
        bp, bs, bmiss = convert_mobilenetv2(bsd, strict)
    else:
        raise ValueError(f"unknown backbone {backbone!r}")

    m = _Mapper(sd, strict)
    m.params["backbone"] = bp
    m.stats["backbone"] = bs
    m.missing.extend("backbone." + k for k in bmiss)

    def cbr(flax_prefix, conv_name, bn_name):
        m.conv(flax_prefix + ("conv",), conv_name, bias=True)
        m.bn(flax_prefix + ("bn",), bn_name)

    for i in (1, 2, 3, 4):
        cbr(("aspp", f"branch{i}"), f"aspp.branch{i}.0", f"aspp.branch{i}.1")
    cbr(("aspp", "branch5"), "aspp.branch5_conv", "aspp.branch5_bn")
    cbr(("aspp", "fuse"), "aspp.conv_cat.0", "aspp.conv_cat.1")
    cbr(("shortcut",), "shortcut_conv.0", "shortcut_conv.1")
    cbr(("cat_conv1",), "cat_conv.0", "cat_conv.1")
    cbr(("cat_conv2",), "cat_conv.4", "cat_conv.5")
    m.conv(("cls_conv",), "cls_conv", bias=True)
    return m.params, m.stats, m.missing


def convert_fusion(sd: Dict[str, np.ndarray],
                   modalities=("imgN", "imgA", "imgL", "cli"),
                   strict: bool = True):
    """``fusion_model_mae_2`` state dict -> :class:`FusionMAE` params.

    Torch layout (my_mae_model.py:399-498): per-modality PyG ``SAGEConv``
    (``lin_l`` w/ bias + ``lin_r`` no-bias), PyG ``LayerNorm`` inside the
    ``GNN_relu_Block`` Sequential (index 1), two gated-attention pools with
    ``gate_nn`` = Linear->ReLU->Linear Sequentials, the
    ``PretrainVisionTransformer`` MAE (mae_utils.py ViT blocks, qkv_bias
    False so no q/v bias params), the shared-norm ``MixerBlock``, per-modality
    MLP towers + LayerNorms, and the fused + per-modality classifiers.

    The dead ``fc_cli_1``/``fc_cli_2`` layers (my_mae_model.py:421-422) are
    intentionally not mapped (no flax counterpart).
    """
    m = _Mapper(sd, strict)

    def gate(flax_prefix, torch_prefix):
        m.linear(flax_prefix + ("gate_fc1",), torch_prefix + ".gate_nn.0")
        m.linear(flax_prefix + ("gate_fc2",), torch_prefix + ".gate_nn.2")

    for mod in modalities:
        m.linear((f"{mod}_gnn", "lin_l"), f"{mod}_gnn_2.lin_l")
        m.linear((f"{mod}_gnn", "lin_r"), f"{mod}_gnn_2.lin_r", bias=False)
        m.ln((f"{mod}_norm",), f"{mod}_relu_2.1")
        gate((f"mpool_{mod}",), f"mpool_{mod}")
        gate((f"mpool_{mod}_2",), f"mpool_{mod}_2")
        m.linear((f"lin1_{mod}",), f"lin1_{mod}")
        m.linear((f"lin2_{mod}",), f"lin2_{mod}")
        m.linear((f"lin3_{mod}",), f"lin3_{mod}")
        m.ln((f"norm1_{mod}",), f"norm1_{mod}")
        m.ln((f"norm2_{mod}",), f"norm2_{mod}")
        m.linear((f"classifier_{mod}",), f"classifier_{mod}")
    m.linear(("classifier",), "classifier")

    if len(modalities) > 1:
        def vit_block(flax_prefix, torch_prefix):
            m.ln(flax_prefix + ("norm1",), torch_prefix + ".norm1")
            m.linear(flax_prefix + ("attn", "qkv"), torch_prefix + ".attn.qkv",
                     bias=False)
            m.linear(flax_prefix + ("attn", "proj"),
                     torch_prefix + ".attn.proj")
            m.ln(flax_prefix + ("norm2",), torch_prefix + ".norm2")
            m.linear(flax_prefix + ("mlp", "fc1"), torch_prefix + ".mlp.fc1")
            m.linear(flax_prefix + ("mlp", "fc2"), torch_prefix + ".mlp.fc2")

        m.linear(("mae", "encoder", "patch_embed"), "mae.encoder.patch_embed")
        vit_block(("mae", "encoder", "block0"), "mae.encoder.blocks.0")
        m.ln(("mae", "encoder", "norm"), "mae.encoder.norm")
        m.linear(("mae", "encoder_to_decoder"), "mae.encoder_to_decoder",
                 bias=False)
        m.raw(("mae", "mask_token"), "mae.mask_token",
              transform=lambda v: v.reshape(-1))
        vit_block(("mae", "decoder", "block0"), "mae.decoder.blocks.0")
        m.ln(("mae", "decoder", "norm"), "mae.decoder.norm")
        m.linear(("mae", "decoder", "head"), "mae.decoder.head")

        m.ln(("mixer", "norm"), "mix.norm")
        m.linear(("mixer", "token_mix_fc1"), "mix.mix_mip_1.0")
        m.linear(("mixer", "token_mix_fc2"), "mix.mix_mip_1.2")
        m.linear(("mixer", "channel_mix_fc1"), "mix.mix_mip_2.0")
        m.linear(("mixer", "channel_mix_fc2"), "mix.mix_mip_2.2")
    return m.params, m.stats, m.missing


def is_full_deeplab_sd(sd: Dict[str, np.ndarray]) -> bool:
    """Whole-model checkpoint vs backbone-only (decides the merge scope)."""
    return any(k.startswith(("aspp.", "cat_conv.", "cls_conv.",
                             "shortcut_conv.")) for k in sd)


def merge_into(variables, params: Dict, stats: Dict, scope: Optional[str] = None):
    """Merge converted arrays into an existing flax ``variables`` dict (a la
    the reference's shape-matched partial load, train.py:328-339).

    ``scope``: sub-tree name (e.g. "backbone") to graft under.  Returns
    (new_variables, loaded_keys, skipped_keys).
    """
    import jax

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

    def graft(dst, src, path, loaded, skipped):
        for k, v in src.items():
            if isinstance(v, dict):
                node = dst.setdefault(k, {})
                graft(node, v, path + (k,), loaded, skipped)
            else:
                cur = dst.get(k)
                if cur is not None and tuple(np.shape(cur)) == tuple(np.shape(v)):
                    dst[k] = np.asarray(v, dtype=np.asarray(cur).dtype)
                    loaded.append("/".join(path + (k,)))
                else:
                    skipped.append("/".join(path + (k,)))

    loaded, skipped = [], []
    p_root = variables["params"][scope] if scope else variables["params"]
    s_root = variables.get("batch_stats", {})
    if scope and s_root:
        s_root = s_root.get(scope, {})
    graft(p_root, params, (), loaded, skipped)
    if stats:
        graft(s_root, stats, (), loaded, skipped)
    return variables, loaded, skipped
