"""Determinism helpers.

JAX computation is functionally pure — same PRNG key => bit-identical result —
so the reference's cudnn-determinism knobs (``utils/utils.py:45-52``,
``my_train(full).py:175-184``) reduce to disciplined key threading plus
seeding the host-side numpy/python RNGs used by data shuffling.
"""

from __future__ import annotations

import os
import random

import numpy as np
import jax


def seed_everything(seed: int = 11):
    """Seed host RNGs and return a root JAX key (``seed_everything``,
    utils/utils.py:45-52)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


class KeyChain:
    """Stateful convenience wrapper: ``chain.next()`` hands out fresh subkeys.

    Keeps explicit key threading out of host-side driver loops while staying
    deterministic for a given seed.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self, n: int | None = None):
        if n is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, n + 1)
        return list(subs)
