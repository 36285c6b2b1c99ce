"""Tensor-parallel parameter layouts for the fusion model (SURVEY.md §2.4).

The reference has no tensor parallelism (its models are single-GPU,
my_train(full).py:417-623); this module is the forward-looking TPU-native
layout for scaling the :class:`~cervical_tpu.models.fusion.FusionMAE`
transformer over the mesh's ``model`` axis.  The design is the standard
Megatron split expressed as GSPMD sharding annotations — no hand-written
collectives; XLA inserts the all-reduces over ICI:

* **column-parallel** (kernel sharded on the *output* dim, bias sharded):
  attention ``qkv``, MLP ``fc1``, the per-modality SAGE ``lin_l``/``lin_r``,
  ``patch_embed``/``encoder_to_decoder``, the gate/tower first layers.
* **row-parallel** (kernel sharded on the *input* dim, bias replicated —
  it is added after the partial-sum all-reduce): attention ``proj``, MLP
  ``fc2``, the decoder ``head``, the gate/tower second layers.
* everything else (norms, tiny heads, the 4-wide token-mix) is replicated.

Placement is by parameter *path*, so the same rules cover every modality
arity.  Dims that don't divide the ``model`` axis are padded by GSPMD —
correctness is unconditional; efficiency wants ``hidden % model == 0``.

Numerical equivalence with the replicated layout is asserted in
``tests/test_parallel_layouts.py`` and exercised by ``dryrun_multichip``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module names (the path component that owns kernel/bias) by split type
_COLUMN = ("qkv", "patch_embed", "encoder_to_decoder", "lin_l", "lin_r",
           "gate_fc1", "channel_mix_fc1")
_ROW = ("proj", "head", "gate_fc2", "channel_mix_fc2")


def _split_for(module: str):
    """'column' / 'row' / None for a module name."""
    if module in _COLUMN or module == "fc1" or module.startswith("lin1_"):
        return "column"
    if module in _ROW or module == "fc2" or module.startswith("lin2_"):
        return "row"
    return None


def fusion_param_specs(params, axis: str = "model"):
    """PartitionSpec pytree for a FusionMAE ``params`` tree.

    ``axis``: the mesh axis name to shard over.  Returns a tree matching
    ``params`` with ``P(None, axis)`` on column kernels, ``P(axis, None)``
    on row kernels, ``P(axis)`` on column biases and ``P()`` elsewhere.
    """

    def spec(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "name", k)) for k in path)
        module = keys[-2] if len(keys) >= 2 else ""
        name = keys[-1]
        split = _split_for(module)
        if split == "column":
            if name == "kernel" and leaf.ndim == 2:
                return P(None, axis)
            if name == "bias" and leaf.ndim == 1:
                return P(axis)
        elif split == "row":
            if name == "kernel" and leaf.ndim == 2:
                return P(axis, None)
            # row bias is applied after the reduction: replicate
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def place_params(mesh: Mesh, params, specs=None, axis: str = "model"):
    """Device-put ``params`` onto ``mesh`` with tensor-parallel shardings.

    With ``model=1`` meshes this degenerates to full replication (every
    spec resolves to one shard), so the same call path serves the shipped
    data-parallel configs and larger TP deployments.
    """
    if specs is None:
        specs = fusion_param_specs(params, axis=axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
