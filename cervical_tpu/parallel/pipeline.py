"""GPipe-style pipeline parallelism over identical stages (SURVEY.md §2.4).

The reference has no pipeline parallelism (single-GPU torch); this is the
TPU-native executor for spreading a chain of *identical* blocks — the
natural fit in this model family is Xception's 16-block middle flow
(``models/backbones/xception.py``, reference ``nets/xception.py:100-125``)
— across the mesh's ``model`` axis:

* the stacked per-block parameters are sharded on their leading (block)
  axis, giving each of the ``S`` stages ``count/S`` consecutive blocks;
* the batch is split into ``M`` microbatches and streamed through the
  stages with ``lax.ppermute`` hops over ICI, the classic
  ``M + S - 1``-tick schedule (fill/drain bubbles included);
* everything runs inside one ``shard_map`` + ``lax.scan`` program — one
  compile of ONE block body per stage, regardless of depth.

Composes with data parallelism: the batch axis stays sharded over
``data`` while stages ride ``model``.  Numerical equivalence with the
sequential forward is asserted in ``tests/test_parallel_layouts.py`` and
the xception wiring is exercised by ``dryrun_multichip``.

The executor is TRAINABLE: ``jax.grad`` differentiates through the
ppermute schedule (a ppermute's transpose is the reversed permutation;
the fill/drain masking is linear), with param and input grads matching
the sequential chain (``test_pipeline_grad_matches_sequential``,
``test_pipeline_sgd_training_matches_sequential``).  Limits: every stage
must share one parameter structure (identical blocks), and stages run as
pure functions — BN inside a pipelined block uses running stats, so
training through the pipeline is frozen-BN training (no batch_stats
updates across the stage boundary).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_block_params(variables, names: Sequence[str]):
    """Stack per-block variable trees on a new leading axis.

    ``variables``: a module scope's variable dict (``{"params": {...},
    "batch_stats": {...}, ...}``); ``names``: the block submodule names in
    pipeline order.  All blocks must share one parameter structure (true of
    xception's middle flow: 16x ``XceptionBlock(728, 1)``).
    """
    blocks = [
        {col: variables[col][n] for col in variables if n in variables[col]}
        for n in names
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_apply(stacked, x, mesh: Mesh, block_fn: Callable,
                   microbatches: int = 0, stage_axis: str = "model",
                   data_axis: str = "data"):
    """Run ``block_fn`` chained over the stacked blocks as a pipeline.

    ``stacked``: pytree with leading block axis (from
    :func:`stack_block_params`), sharded ``count/S`` blocks per stage;
    ``x``: ``(B, ...)`` batch (sharded over ``data_axis``; ``B`` per data
    shard must divide ``microbatches``); ``block_fn(block_vars, x) -> x``
    applies ONE block (shape-preserving).  Returns the chained output,
    batch-sharded over ``data_axis`` and replicated over ``stage_axis``.
    """
    S = mesh.shape[stage_axis]
    count = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if count % S:
        raise ValueError(f"{count} blocks not divisible by {S} stages")
    M = microbatches or S

    def run(local_params, xloc):
        # xloc: this data-shard's batch slice, replicated over stage_axis
        b = xloc.shape[0]
        if b % M:
            raise ValueError(f"local batch {b} not divisible by "
                             f"{M} microbatches")
        mbs = xloc.reshape((M, b // M) + xloc.shape[1:])
        s = lax.axis_index(stage_axis)

        def stage(h):
            # count/S blocks scanned: ONE compiled block body per stage
            def body(h, p):
                return block_fn(p, h), None
            h, _ = lax.scan(body, h, local_params)
            return h

        def tick(prev_out, t):
            # stage s>0 consumes stage s-1's previous output; stage 0
            # injects the next microbatch from the stream
            recv = lax.ppermute(prev_out, stage_axis,
                                [(i, i + 1) for i in range(S - 1)])
            inj = lax.dynamic_index_in_dim(
                mbs, jnp.minimum(t, M - 1), 0, keepdims=False)
            out = stage(jnp.where(s == 0, inj, recv))
            return out, out

        _, outs = lax.scan(tick, jnp.zeros_like(mbs[0]),
                           jnp.arange(M + S - 1))
        # microbatch j finishes on the LAST stage at tick (S-1)+j; mask the
        # other stages' in-flight values and broadcast the result everywhere
        res = jnp.where(s == S - 1, outs[S - 1:], 0)
        res = lax.psum(res, stage_axis)
        return res.reshape(xloc.shape)

    in_specs = (jax.tree_util.tree_map(lambda _: P(stage_axis), stacked),
                P(data_axis))
    shard = jax.shard_map(run, mesh=mesh, in_specs=in_specs,
                          out_specs=P(data_axis), check_vma=False)
    return shard(stacked, x)


def middle_flow_pipeline(variables, x, mesh: Mesh, dilation: int = 1,
                         microbatches: int = 0, first: int = 4,
                         count: int = 16):
    """Xception middle flow (blocks ``first..first+count-1``) as a pipeline.

    ``variables``: the :class:`XceptionBackbone` scope's variables (params +
    batch_stats); eval-mode BN (running stats) — the pipelined stages are
    pure functions.  Equivalent to the sequential loop at
    ``models/backbones/xception.py::XceptionBackbone.__call__``.
    """
    from cervical_tpu.models.backbones.xception import XceptionBlock

    names = [f"block{i}" for i in range(first, first + count)]
    stacked = stack_block_params(variables, names)
    blk = XceptionBlock(728, 1, atrous=(dilation,) * 3, dtype=x.dtype)

    def block_fn(bvars, h):
        return blk.apply(bvars, h, train=False)[0]

    return pipeline_apply(stacked, x, mesh, block_fn,
                          microbatches=microbatches)
