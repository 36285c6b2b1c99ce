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
        self.strict = strict

    def _get(self, key):
        if key not in self.sd:
            self.missing.append(key)
            if self.strict:
                raise KeyError(f"torch key missing: {key}")
            return None
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
