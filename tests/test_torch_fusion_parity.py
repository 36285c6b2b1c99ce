"""Numerical forward parity for FusionMAE against the ACTUAL reference
``fusion_model_mae_2`` (MultiModal Prediction/Four_Modal/my_mae_model.py:399-793).

torch_geometric / torch_scatter / timm are not installed here, so the test
installs minimal shims implementing exactly the documented semantics the
reference uses:

* ``torch_scatter.scatter_add`` / ``torch_geometric.utils.softmax`` — the
  reference's batch vector is constant zero (my_mae_model.py:548), so these
  are a single-segment sum/softmax.
* ``SAGEConv`` — PyG parameterization: ``lin_l(mean_neighbors) + lin_r(x)``,
  bias on lin_l only.
* ``LayerNorm`` — PyG graph-mode, batch=None path: global mean over all
  elements, divide by ``std(unbiased=False) + eps`` (eps OUTSIDE the sqrt).

One compat patch: the reference indexes ``x[~mask]`` with a (1, 1, T) mask
against (1, T, C) tensors (my_mae_model.py:143,325-334), which modern torch
rejects (IndexError; it presumably relied on an older torch's indexing).
``_pvt_forward_compat``/``_encoder_forward_compat`` below reproduce the
reference's pack -> concat -> decode -> reorder-loop algorithm line for line
with the mask reshaped to (1, T) for the indexing — so the *algorithm* under
test is still the reference's, against the flax key-mask formulation.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_torch_forward_parity import randomize_torch_model  # noqa: E402

REF_DIR = "/root/reference/MultiModal Prediction/Four_Modal"
MODS = ("imgN", "imgA", "imgL", "cli")
IN_FEATS, HIDDEN = 32, 64

_SHIM_NAMES = ["torch_scatter", "torch_geometric", "torch_geometric.utils",
               "torch_geometric.data", "torch_geometric.nn", "timm",
               "timm.models", "timm.models.layers", "timm.models.registry"]


def _install_shims():
    ts = types.ModuleType("torch_scatter")

    def scatter_add(src, index, dim=0, dim_size=None):
        n = dim_size if dim_size is not None else int(index.max()) + 1
        size = list(src.shape)
        size[dim] = n
        return torch.zeros(size, dtype=src.dtype).index_add_(dim, index, src)

    ts.scatter_add = scatter_add
    sys.modules["torch_scatter"] = ts

    tg = types.ModuleType("torch_geometric")
    tgu = types.ModuleType("torch_geometric.utils")
    tgu.softmax = lambda src, index, num_nodes=None: torch.softmax(src, dim=0)
    tgd = types.ModuleType("torch_geometric.data")
    tgd.Data = type("Data", (), {})
    tgn = types.ModuleType("torch_geometric.nn")

    class SAGEConv(tnn.Module):
        def __init__(self, in_channels, out_channels):
            super().__init__()
            self.lin_l = tnn.Linear(in_channels, out_channels)
            self.lin_r = tnn.Linear(in_channels, out_channels, bias=False)

        def forward(self, x, edge_index):
            src, dst = edge_index[0], edge_index[1]
            n = x.shape[0]
            agg = torch.zeros_like(x).index_add_(0, dst, x[src])
            deg = torch.zeros(n).index_add_(
                0, dst, torch.ones(src.shape[0])).clamp(min=1)
            return self.lin_l(agg / deg[:, None]) + self.lin_r(x)

    class LayerNorm(tnn.Module):
        def __init__(self, in_channels, eps=1e-5):
            super().__init__()
            self.eps = eps
            self.weight = tnn.Parameter(torch.ones(in_channels))
            self.bias = tnn.Parameter(torch.zeros(in_channels))

        def forward(self, x):
            y = x - x.mean()
            y = y / (y.std(unbiased=False) + self.eps)
            return y * self.weight + self.bias

    tgn.SAGEConv = SAGEConv
    tgn.LayerNorm = LayerNorm
    tgn.GlobalAttention = type("GlobalAttention", (tnn.Module,), {})
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.utils"] = tgu
    sys.modules["torch_geometric.data"] = tgd
    sys.modules["torch_geometric.nn"] = tgn

    timm = types.ModuleType("timm")
    tml = types.ModuleType("timm.models")
    tmll = types.ModuleType("timm.models.layers")
    tmr = types.ModuleType("timm.models.registry")

    def drop_path(x, drop_prob=0.0, training=False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        mask = torch.bernoulli(
            torch.full((x.shape[0],) + (1,) * (x.dim() - 1), keep))
        return x / keep * mask

    tmll.drop_path = drop_path
    tmll.to_2tuple = lambda v: (v, v)
    tmll.trunc_normal_ = tnn.init.trunc_normal_
    tmr.register_model = lambda f: f
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = tml
    sys.modules["timm.models.layers"] = tmll
    sys.modules["timm.models.registry"] = tmr


def _encoder_forward_compat(self, x, mask):
    """forward_features + head (my_mae_model.py:134-153) with the mask
    reshaped (1, T) for modern-torch boolean indexing."""
    m = torch.from_numpy(np.asarray(mask).reshape(1, -1))
    x = self.patch_embed(x)
    x = x + self.pos_embed.type_as(x).to(x.device).clone().detach()
    B, _, C = x.shape
    x_vis = x[~m].reshape(B, -1, C)
    for blk in self.blocks:
        x_vis = blk(x_vis)
    x_vis = self.norm(x_vis)
    return self.head(x_vis)


def _pvt_forward_compat(self, x, mask):
    """PretrainVisionTransformer.forward (my_mae_model.py:308-335)."""
    m = torch.from_numpy(np.asarray(mask).reshape(1, -1))
    x_vis = self.encoder(x, mask)
    x_vis = self.encoder_to_decoder(x_vis)
    B, N, C = x_vis.shape
    expand_pos_embed = self.pos_embed.expand(B, -1, -1).type_as(
        x_vis).clone().detach()
    pos_emd_vis = expand_pos_embed[~m].reshape(B, -1, C)
    pos_emd_mask = expand_pos_embed[m].reshape(B, -1, C)
    x_full = torch.cat(
        [x_vis + pos_emd_vis, self.mask_token + pos_emd_mask], dim=1)
    out = self.decoder(x_full, 0)
    # the reference's reorder-back-to-canonical python loop (:325-334)
    tmp_x = torch.zeros_like(out)
    mask_n = 0
    truth_n = 0
    for i, flag in enumerate(np.asarray(mask).reshape(-1)):
        if flag:
            tmp_x[:, i] = out[:, pos_emd_vis.shape[1] + mask_n]
            mask_n += 1
        else:
            tmp_x[:, i] = out[:, truth_n]
            truth_n += 1
    return tmp_x


@pytest.fixture(scope="module")
def ref_fusion():
    import os
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout unavailable")
    had = {n: sys.modules.get(n) for n in _SHIM_NAMES}
    _install_shims()
    sys.path.insert(0, REF_DIR)
    try:
        import my_mae_model as ref
        ref.PretrainVisionTransformerEncoder.forward = _encoder_forward_compat
        ref.PretrainVisionTransformer.forward = _pvt_forward_compat
        yield ref
    finally:
        sys.path.remove(REF_DIR)
        sys.modules.pop("my_mae_model", None)
        sys.modules.pop("mae_utils", None)
        for n, v in had.items():
            if v is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = v


def _edge_index(adj):
    i, j = np.nonzero(np.asarray(adj) > 0)
    return torch.from_numpy(np.stack([j, i]).astype(np.int64))


def _make_graph(rng):
    from types import SimpleNamespace
    from cervical_tpu.ops import graph as G
    eimg = _edge_index(G.grid_adjacency(4, 4))
    ecli = _edge_index(G.full_adjacency(4))
    feats = {m: rng.normal(size=(16 if m != "cli" else 4, IN_FEATS)
                           ).astype(np.float32) for m in MODS}
    g = SimpleNamespace(
        data_id=0,
        x_imgN=torch.from_numpy(feats["imgN"]),
        x_imgA=torch.from_numpy(feats["imgA"]),
        x_imgL=torch.from_numpy(feats["imgL"]),
        x_cli=torch.from_numpy(feats["cli"]),
        edge_index_imageN=eimg, edge_index_imageA=eimg,
        edge_index_imageL=eimg, edge_index_cli=ecli)
    return g, feats


def _flax_outputs(tm, feats, present, mae_mask):
    import jax
    import jax.numpy as jnp
    from cervical_tpu.models.fusion import FusionMAE
    from cervical_tpu.train import torch_import as TI

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats, missing = TI.convert_fusion(sd, MODS, strict=True)
    assert not missing and not stats
    # coverage: every torch tensor except the dead fc_cli_1/fc_cli_2 layers
    # (my_mae_model.py:421-422) maps onto exactly one flax leaf
    dead = [k for k in sd if k.startswith(("fc_cli_1.", "fc_cli_2."))]
    assert len(jax.tree_util.tree_leaves(params)) == len(sd) - len(dead)

    model = FusionMAE(modalities=MODS, in_features=IN_FEATS, hidden=HIDDEN,
                      num_classes=4, mix=True)
    node_feats = {m: jnp.asarray(v)[None] for m, v in feats.items()}
    if present is not None:
        zero = jnp.asarray(present, jnp.float32)[None, :]
        node_feats = {m: node_feats[m] * zero[0, i]
                      for i, m in enumerate(MODS)}
    out = model.apply(
        {"params": params}, node_feats,
        present=None if present is None else jnp.asarray(present)[None],
        mae_mask=None if mae_mask is None else jnp.asarray(mae_mask)[None],
        deterministic=True)
    return out


def _assert_close(flax_arr, torch_t, atol=2e-4):
    np.testing.assert_allclose(np.asarray(flax_arr, np.float64).squeeze(),
                               torch_t.detach().numpy().squeeze(),
                               atol=atol, rtol=2e-3)


def test_fusion_forward_parity_full_modalities_no_mask(ref_fusion):
    tm = ref_fusion.fusion_model_mae_2(
        in_feats=IN_FEATS, n_hidden=HIDDEN, out_classes=HIDDEN,
        dropout=0.3, train_type_num=4)
    randomize_torch_model(tm, seed=11)
    tm.eval()
    rng = np.random.default_rng(5)
    g, feats = _make_graph(rng)
    with torch.no_grad():
        (one_x, multi_x), _, _, fea_dict, la, lN, lA, lL, lc = tm(
            g, MODS, MODS, [], mix=True)
    out = _flax_outputs(tm, feats, None, None)
    _assert_close(out["mae_out"], fea_dict["mae_out"])
    _assert_close(out["one_x"], one_x)
    _assert_close(out["logits"]["all"], la)
    for key, ref_logits in zip(("imgN", "imgA", "imgL", "cli"),
                               (lN, lA, lL, lc)):
        _assert_close(out["logits"][key], ref_logits)


def test_fusion_forward_parity_training_mask(ref_fusion):
    """Training-style mask: exactly T-1 slots hidden (mae_utils.py:11-21) —
    exercises the packed-encoder vs key-mask equivalence on real torch."""
    tm = ref_fusion.fusion_model_mae_2(
        in_feats=IN_FEATS, n_hidden=HIDDEN, out_classes=HIDDEN,
        dropout=0.3, train_type_num=4)
    randomize_torch_model(tm, seed=23)
    tm.eval()
    rng = np.random.default_rng(9)
    g, feats = _make_graph(rng)
    mask = np.zeros((1, 1, 4), bool)
    mask[0, 0, [0, 2, 3]] = True  # only imgA visible
    with torch.no_grad():
        (one_x, _), _, _, fea_dict, la, lN, lA, lL, lc = tm(
            g, MODS, MODS, mask, mix=True)
    out = _flax_outputs(tm, feats, None, mask.reshape(4))
    _assert_close(out["mae_out"], fea_dict["mae_out"])
    _assert_close(out["one_x"], one_x)
    _assert_close(out["logits"]["all"], la)
    for key, ref_logits in zip(("imgN", "imgA", "imgL", "cli"),
                               (lN, lA, lL, lc)):
        _assert_close(out["logits"][key], ref_logits)


def test_fusion_forward_parity_missing_modalities(ref_fusion):
    """use_type != train_use_type: the reference's imputation path
    (my_mae_model.py:608-622) vs the flax ``present`` mask."""
    tm = ref_fusion.fusion_model_mae_2(
        in_feats=IN_FEATS, n_hidden=HIDDEN, out_classes=HIDDEN,
        dropout=0.3, train_type_num=4)
    randomize_torch_model(tm, seed=37)
    tm.eval()
    rng = np.random.default_rng(13)
    g, feats = _make_graph(rng)
    use_type = ("imgN", "cli")
    with torch.no_grad():
        (one_x, _), _, _, fea_dict, la, lN, lA, lL, lc = tm(
            g, MODS, use_type, [], mix=True)
    present = np.asarray([m in use_type for m in MODS])
    from cervical_tpu.data.masks import imputation_masks
    import jax.numpy as jnp
    mae_mask = np.asarray(imputation_masks(jnp.asarray(present)[None]))[0]
    out = _flax_outputs(tm, feats, present, mae_mask)
    _assert_close(out["one_x"], one_x)
    _assert_close(out["logits"]["all"], la)
    _assert_close(out["logits"]["imgN"], lN)
    _assert_close(out["logits"]["cli"], lc)
    assert lA is None and lL is None
