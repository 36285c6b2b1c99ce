"""Checkpointing: periodic / best / last, with step metadata (orbax).

Reference semantics (``utils/utils_fit.py:191-198``): every ``save_period``
epochs save ``ep{N}-loss-valloss``; keep a rolling ``best_epoch_weights``
keyed on min validation loss; always refresh ``last_epoch_weights``.  Unlike
the reference (which persists only ``model.state_dict()`` and never optimizer
state — SURVEY.md §5.4), checkpoints here carry params, batch stats,
optimizer state, and the epoch counter, making resume exact and
preemption-safe.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _to_pytree(state, extra):
    return {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "extra": extra or {},
    }


class CheckpointManager:
    """Periodic/best/last checkpoint policy on top of orbax PyTreeCheckpointer."""

    def __init__(self, save_dir: str, save_period: int = 10):
        self.save_dir = os.path.abspath(save_dir)
        self.save_period = save_period
        self.best_val_loss = float("inf")
        os.makedirs(self.save_dir, exist_ok=True)
        if not _HAVE_ORBAX:
            raise RuntimeError("orbax not available")
        self._ckpt = ocp.PyTreeCheckpointer()

    def _save(self, name: str, state, extra=None):
        path = os.path.join(self.save_dir, name)
        # rank-0 guard: params are replicated, so only the primary process
        # writes (the reference's local_rank==0 saves, utils_fit.py:185-198)
        from cervical_tpu.parallel import is_primary
        if is_primary():
            self._ckpt.save(path, _to_pytree(state, extra), force=True)
        return path

    def on_epoch_end(self, epoch: int, state, train_loss: float,
                     val_loss: float, total_epochs: Optional[int] = None):
        """Apply the reference's three-way save policy (utils_fit.py:185-198)."""
        saved = []
        if (epoch + 1) % self.save_period == 0 or (
                total_epochs and epoch + 1 == total_epochs):
            saved.append(self._save(
                f"ep{epoch + 1:03d}-loss{train_loss:.3f}-val_loss{val_loss:.3f}",
                state, {"epoch": epoch, "val_loss": val_loss}))
        if val_loss <= self.best_val_loss:
            self.best_val_loss = val_loss
            saved.append(self._save("best_epoch_weights", state,
                                    {"epoch": epoch, "val_loss": val_loss}))
        saved.append(self._save("last_epoch_weights", state,
                                {"epoch": epoch, "val_loss": val_loss}))
        return saved

    def restore(self, name: str = "last_epoch_weights", state_template=None):
        """Load a checkpoint; with a template TrainState, returns a TrainState
        (resume path — replaces the reference's manual model_path +
        Init_Epoch dance, train.py:109-110,167-170)."""
        path = os.path.join(self.save_dir, name)
        tree = self._ckpt.restore(path)
        if state_template is None:
            return tree
        return state_template.replace(
            step=tree["step"], params=tree["params"],
            batch_stats=tree["batch_stats"], opt_state=_restore_like(
                state_template.opt_state, tree["opt_state"])), tree.get("extra", {})


def _restore_like(template: Any, loaded: Any):
    """Re-shape a loaded (dict-ified) opt_state onto the template structure."""
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    flat_l = jax.tree_util.tree_leaves(loaded)
    if len(flat_t) != len(flat_l):
        raise ValueError("optimizer state structure mismatch on restore")
    return jax.tree_util.tree_unflatten(treedef, flat_l)
