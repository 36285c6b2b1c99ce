"""Shared timing harness for the on-target bench scripts.

Encodes the platform measurement rules (CLAUDE.md / docs/PLATFORM.md):
every dispatch — compile, warmup and timed — gets a NEVER-REPEATED input
(the tunnel result-caches identical (fn, args) executions), several
dispatches are pipelined before forcing, and completion is forced through
a dependent scalar fetch (`block_until_ready` does not reliably block).
"""

import time

import jax


def force(out):
    """Force completion via a dependent scalar fetch."""
    return sum(float(l[(0,) * l.ndim])
               for l in jax.tree_util.tree_leaves(out))


def timed(fn, args_fn, iters=10, warmup=4):
    """Per-call seconds for ``fn(*args_fn(i))``.

    ``args_fn(i)`` must return distinct inputs for every ``i`` — indices
    0 .. warmup+iters are used exactly once each.
    """
    out = fn(*args_fn(0))
    force(out)
    for i in range(warmup):
        out = fn(*args_fn(1 + i))
    force(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_fn(1 + warmup + i))
    tot = sum(float(l.sum()) for l in jax.tree_util.tree_leaves(out))
    dt = time.perf_counter() - t0
    return dt / iters, tot


def input_stream(shape, dtype, n, seed=0):
    """``n`` distinct normal arrays; index with a one-arg callable."""
    import jax.numpy as jnp  # noqa: F401  (dtype objects)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    xs = [jax.random.normal(k, shape, dtype) for k in keys]

    def get(i):
        if i >= n:
            raise IndexError(f"input_stream exhausted ({i} >= {n}); "
                             "raise n to keep inputs unique")
        return xs[i]

    return get
