"""Deployment-facing inference for the multimodal fusion classifier.

The reference has no serving surface for ``fusion_model_mae_2`` — its only
inference path is the ``prediction`` function embedded in each training
script (``MultiModal Prediction/Four_Modal/my_train(full).py:47-171``): a
per-patient, no-grad python loop that re-reads the training pickles.  This
module is its production analog: load a trained fold's best params (the
``best_seed{S}_fold{F}.npz`` artifact written by
:meth:`FusionTrainer.cross_validate`), run batched jitted forwards with the
missing-modality imputation path (``my_mae_model.py:608-622``), and export
the whole forward as a portable StableHLO blob for serving.

Inputs follow the cohort container convention (``data/fusion_data.py``):
``feats`` is a dict ``modality -> (N, n_nodes, in_features)`` and
``present`` an optional ``(N, T)`` bool of which modality slots carry data.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cervical_tpu.config import FusionTrainConfig


# ---------------------------------------------------------------------------
# Flat-npz param (de)serialization — the cross_validate artifact format
# ---------------------------------------------------------------------------

def flatten_params(params) -> Dict[str, np.ndarray]:
    """Nested param tree -> flat dict with '/'-joined path keys (the
    ``best_seed*_fold*.npz`` layout written by ``cross_validate``)."""
    from flax import traverse_util
    return {k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(params, sep="/").items()}


def save_params_npz(path: str, params) -> str:
    np.savez(path, **flatten_params(params))
    return path


def load_params_npz(path: str):
    """Rebuild the nested param tree from a flat '/'-keyed npz."""
    from flax import traverse_util
    with np.load(path) as data:
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    return traverse_util.unflatten_dict(flat, sep="/")


# ---------------------------------------------------------------------------
# Predictor
# ---------------------------------------------------------------------------

class FusionPredictor:
    """Batched inference over trained fusion params.

    * ``predict_proba`` — per-head softmax probabilities ("all" + one per
      modality), any cohort size (ragged tails padded to one compiled shape
      and sliced off, like ``FusionTrainer.predict``).
    * ``predict`` — argmax classes + fused-head confidence.
    * ``export_stablehlo`` — serialize the forward (weights embedded) for
      serving; round-trips through ``jax.export.deserialize``.

    Absent modality slots (``present`` False) are hidden from the MAE
    encoder and reconstructed from the mask token — the reference's
    missing-modality imputation (my_mae_model.py:608-622) — so a 4-modal
    model serves 1-3-modal patients without retracing.
    """

    def __init__(self, cfg: FusionTrainConfig, params,
                 batch_size: int = 512):
        from cervical_tpu.train.fusion_trainer import build_model
        self.cfg = cfg
        self.model = build_model(cfg)
        self.params = params
        self.batch_size = batch_size
        self._jit_forward = jax.jit(self._forward)

    @classmethod
    def from_npz(cls, cfg: FusionTrainConfig, path: str,
                 batch_size: int = 512) -> "FusionPredictor":
        return cls(cfg, load_params_npz(path), batch_size=batch_size)

    # -- forward -----------------------------------------------------------

    def _forward(self, params, feats, present):
        from cervical_tpu.data.masks import imputation_masks
        # Zero absent slots' features so caller-supplied filler (NaN,
        # garbage) cannot reach the encoders — the reference imputes from a
        # zero-padded tmp_x (my_mae_model.py:608-613); matches
        # FusionTrainer.predict's use_type zeroing.
        # (indexing by cfg.modalities, not feats.items(): jit rebuilds dicts
        # in sorted-key order, which need not match the modality order)
        feats = {m: jnp.where(present[:, i, None, None], feats[m], 0.0)
                 for i, m in enumerate(self.cfg.modalities)}
        mask = imputation_masks(present)
        out = self.model.apply({"params": params}, feats, present=present,
                               mae_mask=mask, deterministic=True)
        return {k: jax.nn.softmax(v.astype(jnp.float32), axis=-1)
                for k, v in out["logits"].items()}

    def _coerce(self, feats, present):
        t = len(self.cfg.modalities)
        n = len(feats[self.cfg.modalities[0]])
        if present is None:
            present = np.ones((n, t), bool)
        return {m: np.asarray(feats[m]) for m in self.cfg.modalities}, \
            np.asarray(present, bool), n

    def predict_proba(self, feats, present=None) -> Dict[str, np.ndarray]:
        """dict head -> (N, num_classes) float32 softmax probabilities."""
        feats, present, n = self._coerce(feats, present)
        if n == 0:
            empty = np.zeros((0, self.cfg.num_classes), np.float32)
            return {k: empty for k in ("all", *self.cfg.modalities)}
        # always pad to the full batch_size: one compiled shape for every
        # cohort size (each distinct bs would recompile — minutes on the
        # remote-AOT platform; mirrors FusionTrainer.predict)
        bs = self.batch_size
        heads: Dict[str, list] = {}
        for start in range(0, n, bs):
            real = min(start + bs, n) - start
            # pad the ragged tail by repeating the last row: one compiled
            # shape for any cohort size, extras sliced off below
            idx = np.minimum(np.arange(start, start + bs), n - 1)
            probs = self._jit_forward(
                self.params,
                {m: jnp.asarray(v[idx]) for m, v in feats.items()},
                jnp.asarray(present[idx]))
            for k, v in probs.items():
                heads.setdefault(k, []).append(np.asarray(v)[:real])
        return {k: np.concatenate(v) for k, v in heads.items()}

    def predict(self, feats, present=None) -> Dict[str, np.ndarray]:
        """Classes per head + fused-head confidence.

        Returns ``{"classes": (N,), "confidence": (N,),
        "classes_<modality>": (N,), ...}`` — the per-head argmaxes the
        reference's ``prediction`` reports accuracies over
        (my_train(full).py:115-143).
        """
        probs = self.predict_proba(feats, present)
        out = {"classes": probs["all"].argmax(-1),
               "confidence": probs["all"].max(-1)}
        for m in self.cfg.modalities:
            out[f"classes_{m}"] = probs[m].argmax(-1)
        return out

    # -- serving utilities ---------------------------------------------------

    def get_throughput(self, batch_size: int = 512, iters: int = 10):
        """Steady-state patients/sec of the fused forward (the serving
        analog of ``SegPredictor.get_throughput``).  Every iteration gets a
        perturbed input so platform-level result caching cannot shortcut
        the measurement (docs/PLATFORM.md)."""
        import time
        from cervical_tpu.data.fusion_data import node_count

        t = len(self.cfg.modalities)
        key = jax.random.PRNGKey(0)
        present = jnp.ones((batch_size, t), bool)
        # pre-generate every iteration's (distinct) inputs OUTSIDE the timed
        # region — eager perturbation dispatches inside it would each pay
        # the platform's fixed per-program cost (docs/PLATFORM.md item 7)
        streams = []
        for i in range(1 + iters):
            k = jax.random.fold_in(key, i)
            streams.append({m: jax.random.normal(
                jax.random.fold_in(k, mi),
                (batch_size, node_count(m), self.cfg.in_features),
                jnp.float32)
                for mi, m in enumerate(self.cfg.modalities)})
        jax.block_until_ready(streams)

        out = self._jit_forward(self.params, streams[0], present)
        _ = float(out["all"].sum())  # dependent fetch: forces completion
        t0 = time.perf_counter()
        for i in range(iters):
            out = self._jit_forward(self.params, streams[1 + i], present)
        _ = float(out["all"].sum())
        dt = time.perf_counter() - t0
        return batch_size * iters / dt

    def export_stablehlo(self, path: str, batch_size: int = 1) -> str:
        """Serialize the forward (weights embedded as constants) to a
        portable StableHLO blob; inputs are (feats dict, present)."""
        from jax import export as jax_export
        from cervical_tpu.data.fusion_data import node_count

        t = len(self.cfg.modalities)
        feats_spec = {m: jax.ShapeDtypeStruct(
            (batch_size, node_count(m), self.cfg.in_features), jnp.float32)
            for m in self.cfg.modalities}
        present_spec = jax.ShapeDtypeStruct((batch_size, t), jnp.bool_)
        fwd = lambda feats, present: self._forward(self.params, feats,
                                                   present)
        exported = jax_export.export(jax.jit(fwd))(feats_spec, present_spec)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        return path
