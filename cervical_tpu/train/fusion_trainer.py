"""Multimodal fusion trainer: jitted batched steps + stratified-CV driver.

TPU-native rebuild of the reference's 11 near-identical training scripts
(``MultiModal Prediction/Four_Modal/my_train(full).py`` and the Two/Three
variants): one driver parameterized by the modality subset.

Key redesigns vs. the reference (SURVEY.md §7.1):

* the per-patient batch-of-one loop with manual logit accumulation
  (my_train(full).py:228-355) becomes a *batched* jitted step — the
  reference's "accumulate logits over ``batch_size`` patients, then take CE
  over the stack" is exactly CE over a batched forward, so semantics are
  preserved while the TPU sees one fused program per micro-batch.
* random modality masks are sampled with a threaded PRNG key per batch
  (replaces np.random in ``generate_mask``).
* the reference quirks are kept behind config flags and on by default:
  epoch-0 forward/backward without ``optimizer.step()``
  (my_train(full).py:350-353, ``epoch0_no_step``) and the MAE-MSE
  ``/iter/5`` normalization (:339-340).
* best-model selection by validation accuracy keeps a host-side copy of the
  params (replaces ``copy.deepcopy(model)``, :545-563).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cervical_tpu import losses, metrics
from cervical_tpu.config import FusionTrainConfig
from cervical_tpu.data import splits as split_lib
from cervical_tpu.data.fusion_data import subset
from cervical_tpu.data.masks import generate_modal_masks
from cervical_tpu.models.fusion import FusionMAE
from cervical_tpu.train.schedules import fusion_step_decay


def _to_jsonable(x):
    """Recursively convert numpy containers to plain JSON types."""
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    return x


def _save_group_ckpt(path, gpairs, next_c0, state, best, hists):
    """Mid-group snapshot for the vmapped CV engine (graceful stop between
    epoch chunks, SURVEY §5.3): the fold-stacked train state, best-by-val
    snapshots, and the per-chunk metric histories accumulated so far.
    Atomic single-file write (tmp + rename)."""
    import json
    import os
    from flax import serialization

    meta = {"pairs": [[int(s), int(f)] for s, f, *_ in gpairs],
            "next_c0": int(next_c0)}
    blob = serialization.to_bytes({"state": jax.device_get(state),
                                   "best": jax.device_get(best)})
    harrs = {f"h{i}": np.concatenate([np.asarray(h[i]) for h in hists])
             for i in range(6)}
    tmp = path + ".tmp"
    np.savez(tmp, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
             blob=np.frombuffer(blob, np.uint8), **harrs)
    # np.savez appends .npz to names lacking it; normalize
    src = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(src, path)


def _load_group_ckpt(path, gpairs, state, best):
    """Restore a mid-group snapshot if it matches the pending group's
    (seed, fold) identity; returns (state, best, hists, next_c0) or None.
    The deterministic pair-keyed PRNG streams are rebuilt by the caller,
    so a restored run is bitwise-identical to an uninterrupted one."""
    import json
    from flax import serialization

    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    if meta["pairs"] != [[int(s), int(f)] for s, f, *_ in gpairs]:
        return None
    restored = serialization.from_bytes(
        {"state": jax.device_get(state), "best": jax.device_get(best)},
        bytes(data["blob"]))
    hists = [tuple(data[f"h{i}"] for i in range(6))]
    return restored["state"], restored["best"], hists, int(meta["next_c0"])


def build_model(cfg: FusionTrainConfig) -> FusionMAE:
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    return FusionMAE(modalities=tuple(cfg.modalities),
                     in_features=cfg.in_features, hidden=cfg.hidden,
                     num_classes=cfg.num_classes, dropout=cfg.dropout,
                     mix=cfg.mix, dtype=dtype)


def head_weights(cfg: FusionTrainConfig) -> Dict[str, float]:
    w = {"all": cfg.head_weight_all, "cli": cfg.head_weight_cli}
    for m in ("imgN", "imgA", "imgL"):
        w[m] = cfg.head_weight_img
    return w


class FusionTrainer:
    _stop_requested = False  # set per-run by cross_validate/request_stop

    def __init__(self, cfg: FusionTrainConfig, rng=None, mesh=None):
        """``mesh``: optional ('data', 'model') jax mesh.  When given,
        :meth:`init_state` places the params (and therefore the Adam
        moments) with the Megatron-style tensor-parallel layout of
        :mod:`cervical_tpu.parallel.tp` — with ``model=1`` this is plain
        replication, and the jitted steps run data-parallel over
        'data'-sharded batches (XLA inserts the grad/TP collectives)."""
        self.cfg = cfg
        self.mesh = mesh
        self.model = build_model(cfg)
        self.rng = rng if rng is not None else jax.random.PRNGKey(cfg.start_seed)
        # torch Adam(lr, weight_decay=5e-4) (my_train(full).py:502) applies
        # COUPLED L2 decay — wd*theta is added to the gradient before the
        # Adam moments — which differs materially from AdamW's decoupled
        # update at this wd; replicate the torch trajectory exactly.
        def _adam_l2(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_adam(),
                optax.scale(-learning_rate))

        self.tx = optax.inject_hyperparams(_adam_l2)(learning_rate=cfg.lr)
        self._train_step = None
        self._eval_step = None

    # -- state ------------------------------------------------------------
    def init_state(self, feats_example, rng) -> Dict:
        variables = self.model.init(rng, feats_example)
        params = variables["params"]
        if self.mesh is not None:
            from cervical_tpu.parallel.tp import place_params
            params = place_params(self.mesh, params)
        # tx.init's zeros_like inherits the param shardings, so the Adam
        # moments land TP-sharded too
        return {"params": params, "opt_state": self.tx.init(params)}

    # -- jitted steps ------------------------------------------------------
    def train_step_fn(self):
        if self._train_step is not None:
            return self._train_step
        cfg = self.cfg
        hw = head_weights(cfg)
        mods = tuple(cfg.modalities)

        @jax.jit
        def step(state, feats, labels, mae_mask, lr, do_step, dropout_rng,
                 weights):
            def loss_fn(params):
                out = self.model.apply(
                    {"params": params}, feats, mae_mask=mae_mask,
                    deterministic=False, rngs={"dropout": dropout_rng})
                logits = {k: v for k, v in out["logits"].items()}
                mae_mse = None
                if cfg.add_mse_loss_of_mae and len(mods) > 1:
                    # reference accumulates factor*mse per sample then /iter;
                    # batched: (weighted) mean over samples of per-sample
                    # masked mse — weight 0 marks padding rows
                    per = jax.vmap(losses.masked_mae_mse)(
                        out["mae_out"], out["mae_labels"], mae_mask)
                    wsum = jnp.maximum(jnp.sum(weights), 1.0)
                    mae_mse = (cfg.mse_loss_of_mae_factor
                               * jnp.sum(per * weights) / wsum)
                # the reference divides by the LITERAL 5, not by the factor
                # (my_train(full).py:339 "mse_loss_of_mae / 5"), so the
                # config factor scales the aux term: aux = factor*mean/5.
                # Passing cfg.mse_loss_of_mae_factor here would cancel the
                # multiplication above and dead-end the knob.
                total, parts = losses.fusion_multihead_loss(
                    logits, labels, hw, mae_mse,
                    mse_factor=5.0,
                    num_micro_batches=1, sample_weights=weights)
                return total, (parts, logits)

            (total, (parts, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            opt_state = state["opt_state"]
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = self.tx.update(grads, opt_state, state["params"])
            # epoch-0 warmup quirk: compute everything, skip optimizer.step()
            # ENTIRELY — params untouched AND Adam moments/count untouched
            # (my_train(full).py:350-353 never calls step(), so exp_avg/
            # exp_avg_sq stay zero and the step counter stays 0)
            scale = jnp.where(do_step, 1.0, 0.0)
            updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
            new_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_step, new, old),
                new_opt, opt_state)
            params = optax.apply_updates(state["params"], updates)
            new_state = {"params": params, "opt_state": new_opt}
            preds = {k: jnp.argmax(v, axis=-1) for k, v in logits.items()}
            return new_state, {"loss": total, "ce_all": parts["all"],
                               "preds": preds}

        self._train_step = step
        return step

    def epoch_scan_fn(self):
        """One-dispatch epoch: ``lax.scan`` of the train step over stacked
        micro-batches.

        The per-call overhead of this environment (~30-70 ms, CLAUDE.md) made
        the python-loop epoch dispatch-bound; scanning the whole epoch inside
        one jit removes it (and is the idiomatic TPU formulation of the
        reference's per-batch loop, my_train(full).py:228-355).
        """
        if getattr(self, "_epoch_scan", None) is not None:
            return self._epoch_scan
        step = self.train_step_fn()

        @jax.jit
        def epoch(state, feats_nb, labels_nb, masks_nb, lr, do_step, rngs_nb,
                  weights_nb):
            def body(st, xs):
                feats, labels, mask, rng, w = xs
                st, m = step(st, feats, labels, mask, lr, do_step, rng, w)
                return st, (m["loss"], m["ce_all"], m["preds"])

            state, (loss, ce, preds) = jax.lax.scan(
                body, state, (feats_nb, labels_nb, masks_nb, rngs_nb,
                              weights_nb))
            return state, {"loss": loss, "ce_all": ce, "preds": preds}

        self._epoch_scan = epoch
        return epoch

    def eval_step_fn(self):
        if self._eval_step is not None:
            return self._eval_step

        @jax.jit
        def step(params, feats, present, mae_mask):
            out = self.model.apply({"params": params}, feats, present=present,
                                   mae_mask=mae_mask, deterministic=True)
            logits = out["logits"]
            preds = {k: jnp.argmax(v, axis=-1) for k, v in logits.items()}
            return logits, preds

        self._eval_step = step
        return step

    # -- epoch loops -------------------------------------------------------
    def train_epoch(self, state, ds, epoch: int, lr: float,
                    batch_size: Optional[int] = None, use_scan: bool = True):
        """One epoch over the cohort in shuffled micro-batches
        (train_a_epoch, my_train(full).py:188-410).

        With ``use_scan`` (default) the whole epoch runs as a single
        ``lax.scan`` dispatch; a ragged tail batch is padded with weight-0
        rows, whose weighted CE matches the reference's smaller final
        micro-batch exactly while keeping one compiled shape.
        """
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        n = len(ds["labels"])
        self.rng, shuffle_key = jax.random.split(self.rng)
        order = np.asarray(jax.random.permutation(shuffle_key, n))
        step = self.train_step_fn()
        t = len(cfg.modalities)
        do_step = not (cfg.epoch0_no_step and epoch == 0)

        total_ce, nb = 0.0, 0
        all_preds = {k: [] for k in ["all", *cfg.modalities]}
        all_true = []

        if use_scan:
            # pad the ragged tail to a full micro-batch with weight-0 rows:
            # the weighted CE over the padded batch equals the reference's
            # smaller final micro-batch, and every fold/epoch shares ONE
            # compiled scan shape per (n//bs) value (ragged tails used to
            # pay a fresh slow AOT compile each, docs/ROADMAP.md item 3)
            n_batches = (n + bs - 1) // bs
            pad = n_batches * bs - n
            order_p = np.concatenate([order, np.zeros(pad, order.dtype)])
            w_p = np.concatenate([np.ones(n, np.float32),
                                  np.zeros(pad, np.float32)])
            idx = order_p.reshape(n_batches, bs)
            feats_nb = {m: jnp.asarray(v[idx])
                        for m, v in ds["feats"].items()}
            labels_nb = jnp.asarray(ds["labels"][idx])
            self.rng, mk, dk = jax.random.split(self.rng, 3)
            if t > 1:
                masks_nb = generate_modal_masks(mk, n_batches * bs, t
                                                ).reshape(n_batches, bs, t)
            else:
                masks_nb = jnp.zeros((n_batches, bs, 1), bool)
            rngs_nb = jax.random.split(dk, n_batches)
            state, m = self.epoch_scan_fn()(
                state, feats_nb, labels_nb, masks_nb,
                jnp.asarray(lr), jnp.asarray(do_step), rngs_nb,
                jnp.asarray(w_p.reshape(n_batches, bs)))
            total_ce += float(jnp.sum(m["ce_all"]))
            nb += n_batches
            for k in all_preds:
                all_preds[k].append(
                    np.asarray(m["preds"][k]).reshape(-1)[:n])
            all_true.append(ds["labels"][order])
        else:
            for start in range(0, n, bs):
                idx = order[start:start + bs]
                batch = subset(ds, idx)
                feats = {m: jnp.asarray(v) for m, v in batch["feats"].items()}
                labels = jnp.asarray(batch["labels"])
                self.rng, mk, dk = jax.random.split(self.rng, 3)
                mask = (generate_modal_masks(mk, len(idx), t) if t > 1
                        else jnp.zeros((len(idx), 1), bool))
                state, m = step(state, feats, labels, mask,
                                jnp.asarray(lr), jnp.asarray(do_step), dk,
                                jnp.ones(len(idx), jnp.float32))
                total_ce += float(m["ce_all"])
                nb += 1
                for k in all_preds:
                    all_preds[k].append(np.asarray(m["preds"][k]))
                all_true.append(batch["labels"])

        true = np.concatenate(all_true)
        report = {"loss": total_ce / max(nb, 1)}
        for k, v in all_preds.items():
            report[f"acc_{k}"] = metrics.accuracy(true, np.concatenate(v))
        # the full epoch metric block the reference prints (my_train(full)
        # .py:386-408): confusion + per-class precision/recall/F1 +
        # FP/FN/TP/TN + sensitivity/specificity
        cls = metrics.classification_report(
            true, np.concatenate(all_preds["all"]), self.cfg.num_classes)
        for k in ("confusion", "precision", "recall", "f1", "fp", "fn",
                  "tp", "tn", "sensitivity", "specificity"):
            report[k] = cls[k]
        return state, report

    def predict(self, params, ds, batch_size: int = 512,
                use_present: bool = True, use_type=None):
        """Full-cohort evaluation (``prediction``, my_train(full).py:47-171):
        per-head accuracies, CE loss of the fused head, confusion matrix,
        precision/recall/F1, FP/FN/TP/TN.

        ``use_type``: optional modality subset to evaluate with — absent
        modalities are zeroed and imputed by the MAE, reproducing the
        reference's ``use_type != train_use_type`` path
        (my_mae_model.py:608-622).
        """
        from cervical_tpu.data.masks import imputation_masks
        cfg = self.cfg
        step = self.eval_step_fn()
        t = len(cfg.modalities)
        n = len(ds["labels"])
        heads = ["all", *cfg.modalities]
        preds = {k: [] for k in heads}
        fused_logits = []
        subset_mask = None
        if use_type is not None:
            subset_mask = np.asarray([m in use_type for m in cfg.modalities])
        for start in range(0, n, batch_size):
            real = min(start + batch_size, n) - start
            # pad ragged final batches to the full shape (one compiled eval
            # step regardless of cohort size; extras are sliced off below)
            idx = np.minimum(np.arange(start, start + batch_size), n - 1)
            batch = subset(ds, idx)
            feats = {m: jnp.asarray(v) for m, v in batch["feats"].items()}
            present = (np.asarray(batch["present"]) if use_present
                       else np.ones((len(idx), t), bool))
            if subset_mask is not None:
                present = present & subset_mask[None, :]
                feats = {m: jnp.where(subset_mask[mi], feats[m], 0.0)
                         for mi, m in enumerate(cfg.modalities)}
            present = jnp.asarray(present)
            # absent slots are hidden from the MAE encoder and reconstructed
            # from the mask token (imputation); all-present rows get no mask
            mask = imputation_masks(present)
            logits, p = step(params, feats, present, mask)
            fused_logits.append(np.asarray(logits["all"])[:real])
            for k in heads:
                preds[k].append(np.asarray(p[k])[:real])

        true = np.asarray(ds["labels"])
        fused = np.concatenate(fused_logits)
        # host-side CE: this is a reported metric on an (n, C) array whose n
        # differs per fold — eager jnp here would remote-compile per size
        lse = fused - fused.max(axis=-1, keepdims=True)
        lse = lse - np.log(np.exp(lse).sum(axis=-1, keepdims=True))
        loss = float(-lse[np.arange(len(true)), true].mean())
        out = {"loss": loss}
        for k in heads:
            out[f"acc_{k}"] = metrics.accuracy(true, np.concatenate(preds[k]))
        out.update(metrics.classification_report(
            true, np.concatenate(preds["all"]), cfg.num_classes))
        return out

    # -- cross-validation driver ------------------------------------------
    def cross_validate(self, ds, epochs: Optional[int] = None, log=print,
                       save_dir: Optional[str] = None, resume: bool = True,
                       vmap_folds: bool = False, vmap_group: int = 25):
        """Seed-repeat x stratified-K-fold CV with inner train/val split and
        best-by-val-accuracy selection (main, my_train(full).py:417-623).

        ``save_dir``: when set, per-fold loss/accuracy curves + metric logs
        are written there (the reference's milestone-epoch PNG dumps,
        my_train(full).py:583-612) along with the best params (npz) — the
        reference keeps its best model only in memory, SURVEY.md §5.4.

        Preemption-safe (SURVEY §5.3): SIGTERM/SIGINT (or
        :meth:`request_stop`) stop the epoch loop, finalize the CURRENT
        fold from its best-by-val params, and return the completed folds
        (result carries ``stopped_early``).

        Fold-level resume (``resume``, default on): with ``save_dir`` set,
        every completed fold is persisted to ``cv_progress.json``; a rerun
        loads it and skips completed (seed, fold) pairs.  Each fold's PRNG
        stream is keyed by ``fold_in(rng, seed*1000 + fold)``, so the
        resumed remainder is bitwise-identical to an uninterrupted run
        (loaded folds carry JSON lists where fresh folds carry ndarrays).

        ``vmap_folds``: train (seed, fold) pairs SIMULTANEOUSLY — params,
        Adam moments and best-by-val snapshots stacked on a leading fold
        axis, the (epochs x batches) loop run as chunked ``lax.scan``
        programs with the per-fold train step under ``jax.vmap`` (the
        TPU-native formulation: K tiny sequential models become one
        K-wide batched model that actually fills the MXU; pairs from
        different seeds pack into one group).  Trajectories reproduce the
        sequential path's fold-keyed PRNG streams, so per-fold results
        match the default path (ragged folds ride weight-0 padding) and
        fold-level resume still applies.  Graceful stop loses at most ONE
        epoch chunk: with ``save_dir`` set, a stop between chunks writes a
        mid-group snapshot (``vmap_group_ckpt.npz`` — fold-stacked state +
        best + histories + cursor) that the next run restores
        bitwise-exactly; without a save_dir stop granularity falls back to
        the group.
        ``vmap_group`` bounds the pairs per device program (device memory:
        ~4 param-sized f32 copies per pair — params + Adam m/v + best —
        so the default 25 holds ~5 GB at the reference's 12.5M-param
        4-modal config).  Incompatible with a TP ``mesh``.  Measured 5.5x
        on the reference-scale protocol at seed-width groups; cross-seed
        packing widens the fold batch further (docs/PERF.md).
        """
        import signal
        import threading

        cfg = self.cfg
        epochs = epochs or cfg.epochs
        labels = np.asarray(ds["labels"])
        self._stop_requested = False
        prev_handlers = {}

        def _request_stop(signum, frame):  # pragma: no cover - signal path
            self._stop_requested = True
            log(f"signal {signum}: finalizing the current fold and stopping")

        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _request_stop)
        try:
            if vmap_folds:
                return self._cross_validate_vmapped(ds, epochs, labels, log,
                                                    save_dir, resume,
                                                    group=vmap_group)
            return self._cross_validate(ds, epochs, labels, log, save_dir,
                                        resume)
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)

    def request_stop(self):
        """Ask ``cross_validate`` to stop gracefully (finalize the current
        fold from best-by-val params, return completed results)."""
        self._stop_requested = True

    def _cross_validate(self, ds, epochs, labels, log, save_dir, resume=True):
        import json
        import os

        cfg = self.cfg
        # device-resident cohort: per-epoch batching becomes on-device
        # gathers (measured 26x faster epochs than host-sliced batches on the
        # target chip — 0.33 s for a 1792-patient 4-modal epoch)
        ds = dict(ds)
        ds["feats"] = {m: jnp.asarray(v) for m, v in ds["feats"].items()}
        progress_path = (os.path.join(save_dir, "cv_progress.json")
                         if save_dir else None)
        done = {}
        if resume and progress_path and os.path.exists(progress_path):
            with open(progress_path) as f:
                done = {(r["seed"], r["fold"]): r
                        for r in json.load(f)["folds"]}
            if done:
                log(f"resuming: {len(done)} completed folds loaded from "
                    f"{progress_path}")
        base_rng = self.rng
        results = []
        for seed in range(cfg.start_seed, cfg.start_seed + cfg.repeat_num):
            fold_results = []
            for fold, (train_idx, test_idx) in enumerate(
                    split_lib.stratified_kfold(labels, cfg.kfold, seed=seed)):
                if (seed, fold) in done:
                    fold_results.append(done[(seed, fold)])
                    continue
                tr_idx, val_idx = split_lib.train_test_split(
                    train_idx, cfg.inner_test_size, seed=seed,
                    stratify=labels[train_idx])
                # fold-keyed PRNG stream: each fold's trajectory is
                # independent of execution order, making resume exact
                self.rng = jax.random.fold_in(base_rng, seed * 1000 + fold)
                self.rng, init_key = jax.random.split(self.rng)
                feats0 = {m: jnp.asarray(v[:1])
                          for m, v in ds["feats"].items()}
                state = self.init_state(feats0, init_key)
                schedule = fusion_step_decay(cfg.lr, cfg.lr_gamma, cfg.lr_step)
                history = None
                if save_dir:
                    from cervical_tpu.train.callbacks import FusionHistory
                    history = FusionHistory(save_dir, seed, fold)

                best = {"val_acc": -1.0, "params": None, "epoch": -1}
                train_ds = subset(ds, tr_idx)
                val_ds = subset(ds, val_idx)
                test_ds = subset(ds, test_idx)
                epoch_test = [] if cfg.per_epoch_test else None
                for epoch in range(epochs):
                    if self._stop_requested:
                        break
                    lr = schedule(epoch)
                    state, rep = self.train_epoch(state, train_ds, epoch, lr)
                    # the reference evaluates BOTH test and val every epoch
                    # (my_train(full).py:538-539); selection stays val-based
                    if cfg.per_epoch_test:
                        te = self.predict(state["params"], test_ds)
                        epoch_test.append({"epoch": epoch,
                                           "loss": te["loss"],
                                           "acc_all": te["acc_all"]})
                    val = self.predict(state["params"], val_ds)
                    if history is not None:
                        history.append(epoch, rep["loss"], val["loss"],
                                       rep["acc_all"], val["acc_all"])
                    if val["acc_all"] > best["val_acc"]:
                        best = {"val_acc": val["acc_all"],
                                "params": jax.device_get(state["params"]),
                                "epoch": epoch}
                    if (epoch + 1) % 20 == 0 or epoch == epochs - 1:
                        msg = (f"seed {seed} fold {fold} epoch {epoch + 1}: "
                               f"train acc {rep['acc_all']:.3f} "
                               f"val acc {val['acc_all']:.3f}")
                        if cfg.per_epoch_test:
                            msg += f" test acc {epoch_test[-1]['acc_all']:.3f}"
                        log(msg)
                final = self.predict(best["params"] or state["params"], test_ds)
                if history is not None:
                    history.plot()
                if save_dir:
                    import os
                    from cervical_tpu.inference.fusion_predictor import (
                        save_params_npz)
                    save_params_npz(
                        os.path.join(save_dir,
                                     f"best_seed{seed}_fold{fold}.npz"),
                        best["params"] or state["params"])
                fold_results.append({"seed": seed, "fold": fold,
                                     "best_epoch": best["epoch"],
                                     "val_acc": best["val_acc"],
                                     "test": final,
                                     "epoch_test": epoch_test})
                log(f"seed {seed} fold {fold}: test acc {final['acc_all']:.3f}")
                if progress_path:
                    # durable fold-level progress (atomic rename) — the
                    # resume source after preemption/crash
                    tmp = progress_path + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump(_to_jsonable(
                            {"folds": results + fold_results}), f)
                    os.replace(tmp, progress_path)
                if self._stop_requested:
                    break
            results.extend(fold_results)
            if self._stop_requested:
                log(f"stopped early after seed {seed} fold {fold} "
                    f"({len(results)} folds completed)")
                break
        mean_acc = float(np.mean([r["test"]["acc_all"] for r in results]))
        if save_dir:
            with open(os.path.join(save_dir, "cv_results.json"), "w") as f:
                json.dump(_to_jsonable(
                    {"folds": results,
                     "mean_test_acc": mean_acc,
                     "stopped_early": self._stop_requested,
                     "modalities": list(self.cfg.modalities)}),
                          f, indent=1)
            # fold-aggregated confusion -> bar charts + CSVs, the
            # classification-side analog of the seg show_results dump
            # (the reference prints this block to stdout only,
            # my_train(full).py:386-408)
            if results:
                from cervical_tpu.metrics import (report_from_confusion,
                                                  write_classification_report)
                total_cm = np.sum([np.asarray(r["test"]["confusion"])
                                   for r in results], axis=0)
                write_classification_report(
                    report_from_confusion(total_cm),
                    os.path.join(save_dir, "classification_out"))
        return {"folds": results, "mean_test_acc": mean_acc,
                "stopped_early": self._stop_requested}

    # -- vmapped-folds CV engine -------------------------------------------
    def _prep_fold_streams(self, epochs: int, n: int, bs: int, t: int):
        """Jitted reproduction of one fold's host-side PRNG consumption.

        Replays, inside one ``lax.scan`` program, exactly the key splits the
        sequential path performs per epoch (``train_epoch``: shuffle key ->
        permutation(n); then (mk, dk) -> modal masks and per-batch dropout
        keys), so the vmapped engine sees the SAME shuffles/masks/dropout
        streams as ``_cross_validate`` and per-fold trajectories match.
        Compiled once per distinct fold train-size ``n``.
        """
        nb = (n + bs - 1) // bs
        cache = getattr(self, "_prep_fns", None)
        if cache is None:
            cache = self._prep_fns = {}
        key = (epochs, n, bs, t)
        if key in cache:
            return cache[key]

        def prep(rng_fold):
            rng, init_key = jax.random.split(rng_fold)

            def body(rng, _):
                rng, shuffle_key = jax.random.split(rng)
                order = jax.random.permutation(shuffle_key, n)
                rng, mk, dk = jax.random.split(rng, 3)
                if t > 1:
                    masks = generate_modal_masks(mk, nb * bs, t)
                else:
                    masks = jnp.zeros((nb * bs, 1), bool)
                rngs_nb = jax.random.split(dk, nb)
                return rng, (order, masks, rngs_nb)

            _, (orders, masks, rngs) = jax.lax.scan(body, rng, None,
                                                    length=epochs)
            return init_key, orders, masks, rngs

        cache[key] = jax.jit(prep)
        return cache[key]

    def _cv_seed_program(self, per_epoch_test: bool):
        """One-dispatch CV engine for ONE seed: ``scan`` over epochs of
        (``scan`` over micro-batches of the fold-vmapped train step, then
        fold-vmapped val/test eval + on-device best-by-val tracking)."""
        cache = getattr(self, "_cv_programs", None)
        if cache is None:
            cache = self._cv_programs = {}
        if per_epoch_test in cache:
            return cache[per_epoch_test]
        from cervical_tpu.data.masks import imputation_masks
        step = self.train_step_fn()
        estep = self.eval_step_fn()
        # state/batch/do_step per fold; lr shared
        vstep = jax.vmap(step, in_axes=(0, 0, 0, 0, None, 0, 0, 0))
        vestep = jax.vmap(estep)

        @jax.jit
        def run(state, best, feats_all, labels_all, idx, w, msk, rngs, lrs,
                do_steps, ecnts, vidx, vw, vpres, tidx, tw, tpres):
            F = vidx.shape[0]

            def eval_on(params, eidx, ew, epres):
                feats = {m: v[eidx] for m, v in feats_all.items()}
                lbl = labels_all[eidx]
                logits, preds = vestep(params, feats, epres,
                                       imputation_masks(epres))
                ce = jax.vmap(losses.softmax_cross_entropy)(
                    logits["all"], lbl, ew)
                acc = (jnp.sum((preds["all"] == lbl) * ew, -1)
                       / jnp.maximum(jnp.sum(ew, -1), 1.0))
                return ce, acc

            def epoch_body(carry, xs):
                state, best = carry
                idx_e, w_e, m_e, r_e, lr, do, ecnt = xs

                def batch_body(st, bxs):
                    bi, bw, bm, br = bxs  # (F,bs) (F,bs) (F,bs,t) (F,key)
                    feats = {m: v[bi] for m, v in feats_all.items()}
                    lbl = labels_all[bi]
                    # folds with fewer batches ride all-zero-weight padding
                    # batches: gate the optimizer exactly like the epoch-0
                    # no-step quirk so params AND Adam moments stay put
                    valid = jnp.any(bw > 0, axis=-1)
                    st, m = vstep(st, feats, lbl, bm, lr, do & valid, br, bw)
                    corr = jnp.sum((m["preds"]["all"] == lbl) * bw, -1)
                    return st, (m["ce_all"], corr)

                state, (ce_b, corr_b) = jax.lax.scan(
                    batch_body, state, (idx_e, w_e, m_e, r_e))
                tr_ce = jnp.sum(ce_b, 0)
                tr_corr = jnp.sum(corr_b, 0)
                vce, vacc = eval_on(state["params"], vidx, vw, vpres)
                if per_epoch_test:
                    tce, tacc = eval_on(state["params"], tidx, tw, tpres)
                else:
                    tce, tacc = vce * 0.0, vacc * 0.0
                better = vacc > best["acc"]

                def upd(new, old):
                    b = better.reshape((F,) + (1,) * (new.ndim - 1))
                    return jnp.where(b, new, old)

                best = {"acc": jnp.where(better, vacc, best["acc"]),
                        "epoch": jnp.where(better, ecnt, best["epoch"]),
                        "params": jax.tree_util.tree_map(
                            upd, state["params"], best["params"])}
                return (state, best), (tr_ce, tr_corr, vce, vacc, tce, tacc)

            (state, best), hist = jax.lax.scan(
                epoch_body, (state, best),
                (idx, w, msk, rngs, lrs, do_steps, ecnts))
            return state, best, hist

        cache[per_epoch_test] = run
        return cache[per_epoch_test]

    def _cross_validate_vmapped(self, ds, epochs, labels, log, save_dir,
                                resume=True, epoch_chunk=20, group=25):
        """(seed, fold) pairs trained simultaneously (see cross_validate).

        Pairs already in ``cv_progress.json`` are skipped individually
        (fold-level resume, like the sequential engine); the remaining
        pairs are packed into groups of at most ``group`` and each group
        trains as fold-stacked vmapped programs.  ``group`` bounds device
        memory (4 param-sized f32 copies per pair).  The default 25 is
        measured, not guessed: chip fill climbs monotonically with width
        (pair-epochs/s 0.28 / 0.74 / 1.33-1.57 at widths 1 / 8 / 25,
        `scripts/bench_fusion_groupwidth.py`, docs/PERF.md round-4 rows),
        width 50 failed to compile on the round-4 toolchain, and 25 is
        exactly the full reference protocol (5 seeds x 5 folds) in one
        group.  Graceful stop
        checkpoints the in-flight group between epoch chunks (at most one
        chunk of lost work; ``vmap_group_ckpt.npz``); see
        :meth:`cross_validate`.
        """
        import json
        import os

        cfg = self.cfg
        if self.mesh is not None:
            raise ValueError("vmap_folds is incompatible with a TP mesh — "
                             "fold-stacked params cannot also be "
                             "tensor-sharded")
        ds = dict(ds)
        # host copy for per-fold predict() subsetting: fancy-indexing jnp
        # arrays dispatches 2-D device gathers, which scalarize on the
        # target platform (docs/PLATFORM.md item 5)
        ds_host = dict(ds)
        ds_host["feats"] = {m: np.asarray(v) for m, v in ds["feats"].items()}
        ds_host["present"] = np.asarray(ds["present"])
        ds_host["labels"] = np.asarray(ds["labels"])
        ds["feats"] = {m: jnp.asarray(v) for m, v in ds["feats"].items()}
        labels_dev = jnp.asarray(ds["labels"])
        present_np = np.asarray(ds["present"])
        t = len(cfg.modalities)
        bs = cfg.batch_size
        E = epochs
        progress_path = (os.path.join(save_dir, "cv_progress.json")
                         if save_dir else None)
        group_ckpt_path = (os.path.join(save_dir, "vmap_group_ckpt.npz")
                           if save_dir else None)
        done = {}
        if resume and progress_path and os.path.exists(progress_path):
            with open(progress_path) as f:
                done = {(r["seed"], r["fold"]): r
                        for r in json.load(f)["folds"]}
            if done:
                log(f"resuming: {len(done)} completed folds loaded from "
                    f"{progress_path}")
        base_rng = self.rng
        schedule = fusion_step_decay(cfg.lr, cfg.lr_gamma, cfg.lr_step)
        lrs = jnp.asarray([schedule(e) for e in range(E)], jnp.float32)
        do_steps = jnp.asarray(
            [not (cfg.epoch0_no_step and e == 0) for e in range(E)])
        feats0 = {m: v[:1] for m, v in ds["feats"].items()}
        program = self._cv_seed_program(bool(cfg.per_epoch_test))
        # flat (seed, fold) pair list across ALL seeds: pairs are fully
        # independent (pair-keyed PRNG streams), so the engine is free to
        # pack up to ``group`` of them per device program regardless of
        # seed boundaries — wider fold batches fill the MXU better and
        # resume granularity stays the individual fold, like the
        # sequential engine.  ``group`` bounds device memory
        # (4 param-sized f32 copies per pair: params + Adam m/v + best).
        pairs = []
        for seed in range(cfg.start_seed, cfg.start_seed + cfg.repeat_num):
            for fold, (train_idx, test_idx) in enumerate(
                    split_lib.stratified_kfold(labels, cfg.kfold,
                                               seed=seed)):
                if (seed, fold) in done:
                    continue
                tr, va = split_lib.train_test_split(
                    train_idx, cfg.inner_test_size, seed=seed,
                    stratify=labels[train_idx])
                pairs.append((seed, fold, tr, va, np.asarray(test_idx)))
        results = list(done.values())
        for g0 in range(0, len(pairs), group):
            if self._stop_requested:
                break
            gpairs = pairs[g0:g0 + group]
            F = len(gpairs)
            val_list = [p[3] for p in gpairs]
            test_list = [p[4] for p in gpairs]
            n_fs = [len(p[2]) for p in gpairs]
            nb_fs = [(n + bs - 1) // bs for n in n_fs]
            nb_max = max(nb_fs)
            init_keys = []
            per_fold = []
            for (seed, fold, tr, _va, _te), n, nb in zip(gpairs, n_fs,
                                                         nb_fs):
                prep = self._prep_fold_streams(E, n, bs, t)
                rng_f = jax.random.fold_in(base_rng, seed * 1000 + fold)
                ik, orders, masks, rngs = prep(rng_f)
                init_keys.append(ik)
                orders = np.asarray(orders)                     # (E, n)
                masks = np.asarray(masks).reshape(E, nb, bs, t)
                rngs = np.asarray(rngs).reshape(E, nb, -1)      # key data
                pad = nb * bs - n
                # identical padding to train_epoch: local row 0, weight 0
                order_p = np.concatenate(
                    [orders, np.zeros((E, pad), orders.dtype)], 1)
                w_p = np.concatenate(
                    [np.ones((E, n), np.float32),
                     np.zeros((E, pad), np.float32)], 1)
                gidx = tr[order_p].reshape(E, nb, bs).astype(np.int32)
                w_p = w_p.reshape(E, nb, bs)

                def padb(a):
                    if nb == nb_max:
                        return a
                    fillr = np.zeros((E, nb_max - nb) + a.shape[2:], a.dtype)
                    return np.concatenate([a, fillr], axis=1)

                per_fold.append((padb(gidx), padb(w_p), padb(masks),
                                 padb(rngs)))
            # (E, nb, F, ...) — scan over epochs, inner scan over batches
            idx = np.stack([p[0] for p in per_fold], axis=2)
            w = np.stack([p[1] for p in per_fold], axis=2)
            msk = np.stack([p[2] for p in per_fold], axis=2)
            rngs_arr = np.stack([p[3] for p in per_fold], axis=2)

            def pad_eval(sets):
                vmax = max(len(x) for x in sets)
                ei = np.stack([np.concatenate(
                    [x, np.full(vmax - len(x), x[0], x.dtype)]) for x in sets]
                ).astype(np.int32)
                ew = np.stack([np.concatenate(
                    [np.ones(len(x), np.float32),
                     np.zeros(vmax - len(x), np.float32)]) for x in sets])
                return ei, ew, present_np[ei]

            vidx, vw, vpres = pad_eval(val_list)
            tidx, tw, tpres = pad_eval(test_list)

            # jit the vmapped init: unjitted vmap dispatches every init op
            # eagerly — hundreds of tiny programs, each paying the remote
            # AOT round-trip (~0.5 s/op on a slow-toolchain day)
            state = jax.jit(jax.vmap(lambda k: self.init_state(feats0, k)))(
                jnp.stack(init_keys))
            best = {"acc": jnp.full((F,), -1.0, jnp.float32),
                    "epoch": jnp.full((F,), -1, jnp.int32),
                    "params": state["params"]}
            # mid-group resume (graceful stop between epoch chunks): the
            # deterministic pair-keyed streams above are identical on
            # rebuild, so restoring (state, best, hists, cursor) continues
            # the group bitwise-exactly where the stop left it
            start_c0, restored_hists = 0, []
            if resume and group_ckpt_path and os.path.exists(group_ckpt_path):
                got = _load_group_ckpt(group_ckpt_path, gpairs, state, best)
                if got is None:
                    log("vmap group checkpoint does not match the pending "
                        "group; ignoring it")
                else:
                    state, best, restored_hists, start_c0 = got
                    log(f"resuming group mid-training at epoch "
                        f"{start_c0}/{E}")
            # bounded dispatches: one program execution per epoch CHUNK —
            # a whole 180-epoch seed as ONE execution ran minutes and
            # tripped the tunnel's watchdog ("TPU worker process crashed");
            # chunking keeps executions short while compiling the chunk
            # body once (the ragged tail chunk, if any, compiles once more)
            eidx, ew_d = jnp.asarray(vidx), jnp.asarray(vw)
            epres = jnp.asarray(vpres)
            xidx, xw, xpres = (jnp.asarray(tidx), jnp.asarray(tw),
                               jnp.asarray(tpres))
            idx, w = jnp.asarray(idx), jnp.asarray(w)
            msk, rngs_arr = jnp.asarray(msk), jnp.asarray(rngs_arr)
            hists = list(restored_hists)
            stopped_mid_group = False
            for c0 in range(start_c0, E, epoch_chunk):
                c1 = min(c0 + epoch_chunk, E)
                ecnts = jnp.arange(c0, c1, dtype=jnp.int32)
                state, best, hist = program(
                    state, best, ds["feats"], labels_dev, idx[c0:c1],
                    w[c0:c1], msk[c0:c1], rngs_arr[c0:c1], lrs[c0:c1],
                    do_steps[c0:c1], ecnts, eidx, ew_d, epres,
                    xidx, xw, xpres)
                hists.append(hist)
                log(f"group {g0 // group}: epochs {c1}/{E}")
                if self._stop_requested and c1 < E:
                    # bound lost work to ONE epoch chunk: snapshot the
                    # group between chunks and finish next run (VERDICT r3
                    # weak #5); without a save_dir the stop falls back to
                    # group granularity
                    if group_ckpt_path:
                        _save_group_ckpt(group_ckpt_path, gpairs, c1,
                                         state, best, hists)
                        log(f"stop requested: group checkpointed at epoch "
                            f"{c1}/{E} ({group_ckpt_path})")
                    stopped_mid_group = True
                    break
            if stopped_mid_group:
                log(f"stopped early after {len(results)} folds "
                    "(mid-group snapshot saved)" if group_ckpt_path else
                    f"stopped early after {len(results)} folds")
                break
            tr_ce, tr_corr, vce, vacc, tce, tacc = (
                np.concatenate([np.asarray(h[i]) for h in hists])
                for i in range(6))
            best_epoch = np.asarray(best["epoch"])
            best_acc = np.asarray(best["acc"])
            best_params = jax.device_get(best["params"])
            fold_results = []
            for i, (seed, fold, _tr, _va, test_idx) in enumerate(gpairs):
                bp = jax.tree_util.tree_map(lambda a: a[i], best_params)
                final = self.predict(bp, subset(ds_host, test_idx))
                if save_dir:
                    from cervical_tpu.train.callbacks import FusionHistory
                    from cervical_tpu.inference.fusion_predictor import (
                        save_params_npz)
                    history = FusionHistory(save_dir, seed, fold)
                    for e in range(E):
                        history.append(e, tr_ce[e, i] / nb_fs[i],
                                       vce[e, i],
                                       tr_corr[e, i] / n_fs[i],
                                       vacc[e, i])
                    history.plot()
                    save_params_npz(
                        os.path.join(save_dir,
                                     f"best_seed{seed}_fold{fold}.npz"), bp)
                epoch_test = None
                if cfg.per_epoch_test:
                    epoch_test = [{"epoch": e, "loss": float(tce[e, i]),
                                   "acc_all": float(tacc[e, i])}
                                  for e in range(E)]
                fold_results.append({"seed": seed, "fold": fold,
                                     "best_epoch": int(best_epoch[i]),
                                     "val_acc": float(best_acc[i]),
                                     "test": final,
                                     "epoch_test": epoch_test})
                log(f"seed {seed} fold {fold}: test acc "
                    f"{final['acc_all']:.3f}")
            results.extend(fold_results)
            if progress_path:
                tmp = progress_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(_to_jsonable({"folds": results}), f)
                os.replace(tmp, progress_path)
            if group_ckpt_path and os.path.exists(group_ckpt_path):
                os.remove(group_ckpt_path)  # the group is finalized
            if self._stop_requested:
                log(f"stopped early after {len(results)} folds")
                break
        results.sort(key=lambda r: (r["seed"], r["fold"]))
        mean_acc = float(np.mean([r["test"]["acc_all"] for r in results]))
        if save_dir:
            with open(os.path.join(save_dir, "cv_results.json"), "w") as f:
                json.dump(_to_jsonable(
                    {"folds": results,
                     "mean_test_acc": mean_acc,
                     "stopped_early": self._stop_requested,
                     "modalities": list(self.cfg.modalities)}),
                          f, indent=1)
            if results:
                from cervical_tpu.metrics import (report_from_confusion,
                                                  write_classification_report)
                total_cm = np.sum([np.asarray(r["test"]["confusion"])
                                   for r in results], axis=0)
                write_classification_report(
                    report_from_confusion(total_cm),
                    os.path.join(save_dir, "classification_out"))
        return {"folds": results, "mean_test_acc": mean_acc,
                "stopped_early": self._stop_requested}
