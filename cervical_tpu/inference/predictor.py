"""Segmentation inference: letterboxed prediction, render modes, FPS bench,
and StableHLO export.

Reference: the ``DeeplabV3`` predictor class (``Segmentation/deeplabv3+/
deeplab.py``) — ``detect_image`` with three visualization modes (:108-209),
``get_miou_png`` (:304-350), ``get_FPS`` (:211-264) and ONNX export
(:266-302).  The ONNX export becomes ``jax.export`` StableHLO (the portable
TPU-native serialization).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from cervical_tpu.config import SegTrainConfig
from cervical_tpu.ops.image import preprocess_input, unletterbox_logits

# 21-color VOC palette head (deeplab.py:66-69)
DEFAULT_COLORS = [
    (0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0), (0, 0, 128),
    (128, 0, 128), (0, 128, 128), (128, 128, 128), (64, 0, 0), (192, 0, 0),
    (64, 128, 0), (192, 128, 0), (64, 0, 128), (192, 0, 128), (64, 128, 128),
    (192, 128, 128), (0, 64, 0), (128, 64, 0), (0, 192, 0), (128, 192, 0),
    (0, 64, 128),
]


class SegPredictor:
    """Load a trained DeepLab state and predict single images.

    ``mix_type`` render modes (deeplab.py:149-209):
      0 — blend the color mask with the original image;
      1 — color mask only;
      2 — keep only foreground pixels of the original (black background).
    """

    def __init__(self, cfg: SegTrainConfig, state, colors=None,
                 conv_backend: str = "lax", fused_middle: bool = False):
        from cervical_tpu.train.seg_trainer import build_model
        self.cfg = cfg
        # fused_middle: xception-only eval fast path — blocks 4-19 as one
        # pallas kernel (ops/pallas_xception.py).  Exports always trace the
        # plain flax model: pallas calls do not convert through jax2tf, and
        # a StableHLO blob with an embedded Mosaic custom-call is not
        # portable.
        self.model = build_model(cfg, fused_middle=fused_middle)
        self._export_model = build_model(cfg) if fused_middle else None
        self.state = state
        self.colors = colors or DEFAULT_COLORS
        # XLA convs win in full-model programs at every batch size measured
        # (batch-1 5.1 vs 7.6 ms/image, batch-8 2.2 vs 4.0 — ABAB runs in
        # scripts/bench_predict.py; ops/conv.py module docstring).  The
        # einsum lowering is kept switchable for platforms/programs where
        # the standalone-conv pathology applies.
        self.conv_backend = conv_backend
        # state enters as an ARGUMENT (not a traced-in constant) so
        # update_state() — the in-training EvalCallback path — needs no
        # retrace/recompile between epochs
        self._jit_forward = jax.jit(self._forward)
        # predict_masks programs, keyed by (ih, iw, batch_size)
        self._miou_batched_jits = {}

    def _forward(self, params, batch_stats, images, model=None):
        from cervical_tpu.ops.conv import backend_scope
        with backend_scope(self.conv_backend):
            logits = (model or self.model).apply(
                {"params": params, "batch_stats": batch_stats},
                images, train=False)
        return jax.nn.softmax(logits, axis=-1)

    def _export_forward(self, images):
        """Inference fn for serialization — always the pure-XLA model."""
        return self._forward(self.state.params, self.state.batch_stats,
                             images, model=self._export_model or self.model)

    def _run(self, images):
        return self._jit_forward(self.state.params, self.state.batch_stats,
                                 images)

    def update_state(self, state):
        """Swap in new weights (in-training evaluation) without recompiling."""
        self.state = state

    # -- core ---------------------------------------------------------------
    def predict_probs(self, image: np.ndarray) -> np.ndarray:
        """Letterbox -> forward -> un-letterbox -> per-pixel class probs at
        the original resolution (deeplab.py:108-148 / get_miou_png)."""
        ih, iw = image.shape[:2]
        h, w = self.cfg.data.input_shape
        from cervical_tpu.ops.image import letterbox_image
        staged = letterbox_image(jnp.asarray(image, jnp.float32), (h, w))
        x = preprocess_input(staged)[None].astype(
            jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32)
        probs = np.asarray(self._run(x)[0], np.float32)
        return np.asarray(unletterbox_logits(jnp.asarray(probs),
                                             (ih, iw), (h, w)))

    def predict_mask(self, image: np.ndarray) -> np.ndarray:
        return self.predict_probs(image).argmax(axis=-1).astype(np.uint8)

    # -- tiled (native-resolution) inference ----------------------------------
    def predict_probs_tiled(self, image: np.ndarray, overlap: float = 0.25,
                            batch_size: int = 8) -> np.ndarray:
        """Sliding-window inference at NATIVE resolution for images larger
        than the network input.

        Beyond the reference: ``detect_image`` letterboxes every input down
        to ``input_shape`` (deeplab.py:108-148), so a large acquisition is
        segmented at reduced effective resolution.  Here the image is
        covered by overlapping ``input_shape`` tiles instead — TPU-shaped:
        every tile has the SAME static shape and tiles stream through ONE
        compiled batched forward (fixed ``batch_size``, ragged tail
        padded); per-tile class probabilities are blended with a separable
        Hann weight window so tile seams vanish.

        ``overlap``: fraction of tile extent shared between neighbors
        (0 <= overlap < 1).  Returns (H, W, num_classes) float32 probs.
        """
        if not 0.0 <= overlap < 1.0:
            raise ValueError(f"overlap must be in [0, 1), got {overlap}")
        image = np.asarray(image)
        ih, iw = image.shape[:2]
        th, tw = self.cfg.data.input_shape
        # images smaller than one tile in either dim: edge-pad up to the
        # tile, predict, crop back (no resampling — still native-res)
        ph, pw = max(0, th - ih), max(0, tw - iw)
        if ph or pw:
            image = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
        H, W = image.shape[:2]

        def origins(extent, tile, frac):
            stride = max(1, int(round(tile * (1.0 - frac))))
            os_ = list(range(0, extent - tile + 1, stride))
            if os_[-1] != extent - tile:  # final tile aligned to the edge
                os_.append(extent - tile)
            return os_

        ys, xs = origins(H, th, overlap), origins(W, tw, overlap)
        # separable Hann window, floored so edge pixels (covered by a
        # single tile) keep nonzero weight and normalize to that tile's
        # prediction exactly
        wy = np.hanning(th + 2)[1:-1] if th > 1 else np.ones(1)
        wx = np.hanning(tw + 2)[1:-1] if tw > 1 else np.ones(1)
        window = np.maximum(np.outer(wy, wx), 1e-3).astype(np.float32)

        dt = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        tiles = [(y, x) for y in ys for x in xs]
        nc = self.cfg.data.num_classes
        acc = np.zeros((H, W, nc), np.float32)
        wsum = np.zeros((H, W, 1), np.float32)
        # dispatch every batch before fetching any result: jax dispatch is
        # async, so the per-call host round-trip (~30-70 ms on the tunnel
        # platform, docs/PLATFORM.md) overlaps device compute
        inflight = []
        for i in range(0, len(tiles), batch_size):
            chunk = tiles[i:i + batch_size]
            batch = np.stack([image[y:y + th, x:x + tw] for y, x in chunk])
            if len(chunk) < batch_size:  # pad tail: ONE compiled shape
                batch = np.concatenate(
                    [batch, np.zeros((batch_size - len(chunk), th, tw,
                                      image.shape[2]), batch.dtype)])
            x_dev = jnp.asarray(
                preprocess_input(batch.astype(np.float32)), dt)
            inflight.append((chunk, self._run(x_dev)))
        for chunk, probs_dev in inflight:
            probs = np.asarray(probs_dev, np.float32)
            for (y, x), p in zip(chunk, probs):
                acc[y:y + th, x:x + tw] += p * window[..., None]
                wsum[y:y + th, x:x + tw] += window[..., None]
        out = acc / wsum
        return out[:ih, :iw]

    def predict_mask_tiled(self, image: np.ndarray, overlap: float = 0.25,
                           batch_size: int = 8) -> np.ndarray:
        return (self.predict_probs_tiled(image, overlap, batch_size)
                .argmax(axis=-1).astype(np.uint8))

    # -- render modes ---------------------------------------------------------
    def detect_image(self, image: np.ndarray, mix_type: int = 0,
                     count: bool = False, tiled: bool = False):
        """Returns the rendered uint8 RGB image; optionally prints per-class
        pixel counts (deeplab.py:152-163).  ``tiled=True`` segments at
        native resolution via :meth:`predict_mask_tiled`."""
        mask = self.predict_mask_tiled(image) if tiled \
            else self.predict_mask(image)
        if count:
            classes_nums = np.bincount(mask.reshape(-1),
                                       minlength=self.cfg.data.num_classes)
            print("classes_nums:", classes_nums.tolist())
        colors = np.asarray(self.colors[:self.cfg.data.num_classes], np.uint8)
        color_mask = colors[mask]
        if mix_type == 0:
            # Image.blend(old_img, seg_img, 0.7) = 0.3*original + 0.7*mask
            # (deeplab.py:188)
            return (0.7 * color_mask + 0.3 * image).astype(np.uint8)
        if mix_type == 1:
            return color_mask
        if mix_type == 2:
            fg = (mask > 0)[..., None]
            return (image * fg).astype(np.uint8)
        raise ValueError(f"unknown mix_type {mix_type}")

    def get_miou_png(self, image: np.ndarray) -> np.ndarray:
        """Class-index mask at original resolution (deeplab.py:304-350)."""
        return self.predict_mask(image)

    def predict_masks(self, images: np.ndarray,
                      batch_size: int = 8) -> np.ndarray:
        """Batched ``get_miou_png`` over SAME-resolution images.

        The per-image path (get_miou_png) pays per-image dispatch + an
        eager un-letterbox chain; at in-training-eval scale (840 val
        images every eval_period) that measured ~620 ms/image on the
        round-5 protocol run.  This path runs the whole pipeline —
        letterbox -> forward -> un-letterbox -> argmax — as ONE jitted
        program per batch (one compiled shape; ragged tail padded and
        dropped), with a dispatch window so decode/hist overlap device
        work.  Semantics match get_miou_png (same ops, same dtypes;
        pinned by tests/test_predictor.py::test_predict_masks_batched_*).

        ``images``: (N, ih, iw, 3) uint8, one shared original resolution.
        Returns (N, ih, iw) uint8 class masks.
        """
        images = np.asarray(images)
        n, ih, iw = images.shape[:3]
        key = (ih, iw, batch_size)
        fn = self._miou_batched_jits.get(key)
        if fn is None:
            h, w = self.cfg.data.input_shape
            from cervical_tpu.ops.image import (letterbox_image,
                                                unletterbox_logits)
            dt = (jnp.bfloat16 if self.cfg.dtype == "bfloat16"
                  else jnp.float32)

            def masks_fn(params, batch_stats, batch):
                staged = jax.vmap(
                    lambda im: letterbox_image(im.astype(jnp.float32),
                                               (h, w)))(batch)
                x = preprocess_input(staged).astype(dt)
                probs = self._forward(params, batch_stats,
                                      x).astype(jnp.float32)
                out = jax.vmap(
                    lambda p: unletterbox_logits(p, (ih, iw), (h, w)))(probs)
                return jnp.argmax(out, axis=-1).astype(jnp.uint8)

            fn = self._miou_batched_jits[key] = jax.jit(masks_fn)
        outs, pending = [], []
        for i in range(0, n, batch_size):
            chunk = images[i:i + batch_size]
            k = len(chunk)
            if k < batch_size:  # pad ragged tail: ONE compiled shape
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - k,) + chunk.shape[1:],
                                     chunk.dtype)])
            pending.append((fn(self.state.params, self.state.batch_stats,
                               jnp.asarray(chunk)), k))
            if len(pending) > 4:  # bounded dispatch-ahead window
                dev, kk = pending.pop(0)
                outs.append(np.asarray(dev)[:kk])
        for dev, kk in pending:
            outs.append(np.asarray(dev)[:kk])
        return np.concatenate(outs, 0)

    # -- benchmarking ---------------------------------------------------------
    def get_fps(self, image: np.ndarray, test_interval: int = 100) -> float:
        """Seconds per image over ``test_interval`` runs (deeplab.py:211-264).

        Unlike the reference's loop over one constant image, each iteration
        perturbs a corner pixel: some execution stacks (docs/PLATFORM.md)
        cache results of identical (fn, args) calls, which would make a
        constant-input loop measure nothing.
        """
        self.predict_probs(image)  # warmup/compile
        image = np.array(image)
        t0 = time.time()
        for i in range(test_interval):
            # two-pixel counter: unique for any realistic test_interval
            image[0, 0, 0] = i % 251
            image[0, 1, 0] = (i // 251) % 251
            self.predict_probs(image)
        return (time.time() - t0) / test_interval

    def get_throughput(self, batch_size: int = 8, iters: int = 20) -> float:
        """Batched images/sec — the TPU-meaningful figure the per-image FPS
        loop (deeplab.py:211-264) underestimates.  Inputs vary per call and
        completion is forced by a dependent fetch (docs/PLATFORM.md)."""
        h, w = self.cfg.data.input_shape
        dt = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        xs = [jax.random.normal(k, (batch_size, h, w, 3), dt)
              for k in jax.random.split(jax.random.PRNGKey(0), iters + 1)]
        np.asarray(self._run(xs[-1])[0, 0, 0])  # warmup/compile
        t0 = time.time()
        out = None
        for i in range(iters):
            out = self._run(xs[i])
        np.asarray(out.sum())  # force completion of the pipelined calls
        return batch_size * iters / (time.time() - t0)

    # -- export ---------------------------------------------------------------
    def export_stablehlo(self, path: str, batch_size: int = 1):
        """Serialize the inference function to portable StableHLO bytes via
        ``jax.export`` (replaces convert_to_onnx, deeplab.py:266-302)."""
        from jax import export as jax_export
        h, w = self.cfg.data.input_shape
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), dtype)
        # weights are embedded as constants in the exported blob (serving)
        exported = jax_export.export(jax.jit(self._export_forward))(spec)
        blob = exported.serialize()
        with open(path, "wb") as f:
            f.write(blob)
        return path

    def export_savedmodel(self, path: str, batch_size: int = 1):
        """TF SavedModel export via jax2tf — the interchange-format analogue
        of the reference's ONNX export (deeplab.py:266-302) for serving
        stacks that ingest TF graphs."""
        import tensorflow as tf
        from jax.experimental import jax2tf

        h, w = self.cfg.data.input_shape
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        fwd_tf = jax2tf.convert(self._export_forward, with_gradient=False)
        module = tf.Module()
        module.f = tf.function(
            fwd_tf,
            input_signature=[tf.TensorSpec((batch_size, h, w, 3),
                                           tf.as_dtype(np.dtype(dtype)))],
            autograph=False)
        tf.saved_model.save(module, path)
        return path


def evaluate_miou_dir(gt_dir: str, pred_dir: str, png_name_list,
                      num_classes: int, name_classes=None,
                      miou_out_path: Optional[str] = None):
    """File-walking mIoU evaluation (``compute_mIoU``,
    utils_metrics.py:120-193) + optional csv/plot dump (``show_results``,
    :226-250)."""
    import os
    from PIL import Image
    from cervical_tpu import metrics as M

    hist = np.zeros((num_classes, num_classes), np.int64)
    for name in png_name_list:
        pred = np.array(Image.open(os.path.join(pred_dir, name + ".png")))
        label = np.array(Image.open(os.path.join(gt_dir, name + ".png")))
        if label.size != pred.size:
            continue
        hist += M.fast_hist(label, pred, num_classes)
    summary = M.summarize_hist(
        hist, name_classes or M.DEFAULT_SEG_CLASS_NAMES[:num_classes])
    if miou_out_path:
        import csv
        import os as _os
        _os.makedirs(miou_out_path, exist_ok=True)
        with open(_os.path.join(miou_out_path, "confusion_matrix.csv"), "w",
                  newline="") as f:
            writer = csv.writer(f)
            names = list(summary["names"])
            writer.writerow([" "] + names)
            for i, row in enumerate(summary["hist"]):
                writer.writerow([names[i]] + [str(x) for x in row])
        _write_metric_bars(summary, miou_out_path)
    return summary


def _write_metric_bars(summary, out_dir: str):
    """Per-class horizontal bar charts (``show_results``/``draw_plot_func``,
    utils_metrics.py:204-241): mIoU.png, mPA.png, Recall.png, Precision.png."""
    import os
    from cervical_tpu.metrics import draw_bar_chart
    names = list(summary["names"])
    plots = [
        ("mIoU.png", summary["iou"], f"mIoU = {np.nanmean(summary['iou']) * 100:.2f}%",
         "Intersection over Union"),
        ("mPA.png", summary["recall"], f"mPA = {np.nanmean(summary['recall']) * 100:.2f}%",
         "Pixel Accuracy"),
        ("Recall.png", summary["recall"], f"mRecall = {np.nanmean(summary['recall']) * 100:.2f}%",
         "Recall"),
        ("Precision.png", summary["precision"],
         f"mPrecision = {np.nanmean(summary['precision']) * 100:.2f}%", "Precision"),
    ]
    for fname, values, title, xlabel in plots:
        draw_bar_chart(values, names, title, xlabel,
                       os.path.join(out_dir, fname))
