"""Fusion-dataset container + synthetic generator.

The reference stores one ``torch_geometric.data.Data`` per patient inside a
joblib pickle (``Graph_Structure(data_augmentation).py:379-399``).  Here a
whole cohort is a plain dict of stacked, static-shape arrays — directly
shardable and vmappable:

    {
      'feats':   {modality: (N, nodes_m, 1024) float32},
      'labels':  (N,) int32 diagnosis class (CIS/mild/moderate/severe),
      'present': (N, T) bool modality availability,
      'ids':     list[str] patient ids,
    }

Saved/loaded as ``.npz`` (replaces the joblib pickles).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from cervical_tpu.models.fusion import ALL_MODALITIES


def node_count(modality: str, image_patches: int = 16, cli_nodes: int = 4):
    return cli_nodes if modality == "cli" else image_patches


def make_dataset(feats: Dict[str, np.ndarray], labels, present=None, ids=None):
    n = len(labels)
    mods = tuple(feats.keys())
    if present is None:
        present = np.ones((n, len(mods)), bool)
    if ids is None:
        ids = [str(i) for i in range(n)]
    return {"feats": {m: np.asarray(v, np.float32) for m, v in feats.items()},
            "labels": np.asarray(labels, np.int32),
            "present": np.asarray(present, bool),
            "ids": list(ids)}


def subset(ds, idx):
    idx = np.asarray(idx)
    return {"feats": {m: v[idx] for m, v in ds["feats"].items()},
            "labels": ds["labels"][idx],
            "present": ds["present"][idx],
            "ids": [ds["ids"][i] for i in idx]}


def save_npz(path: str, ds):
    arrays = {f"feat_{m}": v for m, v in ds["feats"].items()}
    # record the modality order explicitly: 'present' columns follow it, and
    # npz key order is an implementation detail not worth trusting
    arrays["modalities"] = np.asarray(list(ds["feats"].keys()))
    if ds.get("labels") is not None:
        arrays["labels"] = ds["labels"]
    arrays["present"] = ds["present"]
    arrays["ids"] = np.asarray(ds["ids"])
    np.savez_compressed(path, **arrays)


def load_npz(path: str):
    """Load a cohort npz.  ``labels`` is optional (deployment cohorts have
    no ground truth — the serving CLI must accept them); ``present``/``ids``
    default to all-present / positional ids.  ``modalities`` preserves the
    column order of ``present`` (falls back to npz key order for archives
    written before it was recorded)."""
    z = np.load(path, allow_pickle=False)
    mods = ([str(m) for m in z["modalities"]] if "modalities" in z.files
            else [k[len("feat_"):] for k in z.files
                  if k.startswith("feat_")])
    feats = {m: z[f"feat_{m}"] for m in mods}
    n = len(next(iter(feats.values()))) if feats else 0
    return {"feats": feats,
            "modalities": mods,
            "labels": z["labels"] if "labels" in z.files else None,
            "present": (z["present"] if "present" in z.files
                        else np.ones((n, len(mods)), bool)),
            "ids": ([str(s) for s in z["ids"]] if "ids" in z.files
                    else [str(i) for i in range(n)])}


def align_to_modalities(ds, modalities: Sequence[str]):
    """Restrict a cohort to ``modalities``, subsetting BOTH ``feats`` and
    the matching ``present`` columns (by name, using the cohort's recorded
    modality order).  Subsetting feats alone would leave ``present`` at the
    cohort's full width — a shape error at best, silently misassigned
    presence bits at worst."""
    missing = [m for m in modalities if m not in ds["feats"]]
    if missing:
        raise ValueError(
            f"cohort lacks modalities {missing}; has "
            f"{sorted(ds['feats'].keys())}")
    cohort_order = list(ds.get("modalities") or ds["feats"].keys())
    cols = [cohort_order.index(m) for m in modalities]
    out = dict(ds)
    out["feats"] = {m: ds["feats"][m] for m in modalities}
    out["modalities"] = list(modalities)
    out["present"] = np.asarray(ds["present"])[:, cols]
    return out


def make_synthetic_fusion(num_patients: int = 64,
                          modalities: Sequence[str] = ALL_MODALITIES,
                          num_classes: int = 4, feature_dim: int = 1024,
                          seed: int = 0, noise: float = 0.5):
    """Synthetic cohort whose class signal is embedded in every modality's
    node features, so a few epochs of training must lift accuracy above
    chance (test fixture for the CV driver, SURVEY.md §4d)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_patients)
    protos = rng.normal(size=(num_classes, feature_dim)).astype(np.float32)
    feats = {}
    for m in modalities:
        nodes = node_count(m)
        base = protos[labels][:, None, :]  # (N, 1, D)
        feats[m] = (base + noise * rng.normal(
            size=(num_patients, nodes, feature_dim))).astype(np.float32)
    return make_dataset(feats, labels)
