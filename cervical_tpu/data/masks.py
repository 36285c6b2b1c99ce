"""Modality-mask generation for MAE training.

Reference: ``generate_mask`` (MultiModal Prediction/Four_Modal/
mae_utils.py:11-21) — hides exactly ``num-1`` of ``num`` modality slots,
uniformly shuffled, leaving one visible token per sample.  Batched,
PRNG-key-threaded version producing the ``(B, T)`` boolean masks consumed by
:class:`cervical_tpu.models.fusion.FusionMAE`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_modal_masks(rng, batch_size: int, num_types: int,
                         mask_num: int | None = None):
    """(B, T) bool masks with exactly ``mask_num`` True entries per row.

    ``mask_num`` defaults to ``num_types - 1`` (the reference's choice), so
    exactly one modality stays visible to the MAE encoder.
    """
    if mask_num is None:
        mask_num = num_types - 1
    if not 0 <= mask_num < num_types:
        raise ValueError(f"mask_num={mask_num} must be in [0, {num_types})")
    base = jnp.arange(num_types) < mask_num  # first mask_num True
    perm_keys = jax.random.split(rng, batch_size)
    return jax.vmap(lambda k: jax.random.permutation(k, base))(perm_keys)


def imputation_masks(present):
    """Masks for the missing-modality imputation path.

    Reference (my_mae_model.py:608-622): mask = the absent slots; if nothing is
    present the mask falls back to all-False.  ``present``: (B, T) bool.
    """
    mask = jnp.logical_not(present)
    any_present = jnp.any(present, axis=-1, keepdims=True)
    return jnp.where(any_present, mask, False)
