"""Typed configuration system.

The reference has no CLI and three styles of hard-coded literals (SURVEY.md
§5.6: ``train.py:50-281`` literals, the ``Args`` dict namespace in
``my_train(full).py:648-678``, and ``DeeplabV3._defaults``).  Here every knob
from §2's hyperparameter inventory is a typed dataclass field, loadable from
YAML/JSON and overridable from the command line (``--key value`` dotted
paths).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple

try:
    import yaml
except Exception:  # pragma: no cover
    yaml = None


@dataclass
class SegDataConfig:
    """VOC-layout dataset config (train.py:131-137,396-399)."""

    dataset_path: str = "VOCdevkit"
    input_shape: Tuple[int, int] = (512, 512)
    num_classes: int = 5
    # augmentation knobs (dataloader.py:55)
    jitter: float = 0.3
    hue: float = 0.1
    sat: float = 0.7
    val: float = 0.3
    scale_min: float = 0.25
    scale_max: float = 2.0
    # 2-shear rotation approximation (~0.5 px shape error at 10 deg, under
    # the +-30% aspect jitter of the same pipeline) — ~1.3x faster warp on
    # the target chip.  Default False = the exact Paeth 3-shear map (parity
    # by default); perf configs and bench.py opt in with True
    # (docs/PARITY.md).  einsum backend only: the pallas kernels are always
    # exact 3-shear.
    two_shear: bool = False
    # which fused on-device augmentation backend the TRAIN step uses
    # (dataloader.py:55-154 rebuilt): "einsum" (ops/warp_xla.py, the
    # everywhere-safe path) or "pallas" (ops/pallas_warp.py, the flagship
    # kernels — exact 3-shear, per-image predicated rotation; falls back to
    # interpret mode off-TPU so tests run on CPU).  Both are pinned to the
    # gather oracle (tests/test_seg_training.py::test_train_aug_backends_
    # match_oracle) and ABAB'd inside the full step in docs/PERF.md.
    aug_backend: str = "einsum"
    # scanned train steps only: augment all K sub-batches as ONE (K*B)
    # batch before the scan instead of per step inside it.  At b8 the aug
    # kernels are launch/latency-bound (~0.6 ms/img vs ~0.08 at b1024);
    # batching K=8 sub-batches recovers most of that.  Requires
    # aug_backend="pallas": its per-image predicated rotation/blur makes
    # the merged batch BIT-IDENTICAL to the per-step path (tested); the
    # einsum backend's prefix-capacity slicing cannot represent the
    # strided rotation pattern of stacked per-sub-batch params.
    aug_pre_batch: bool = False


@dataclass
class SegTrainConfig:
    """Segmentation trainer config (reference literals: train.py:50-281)."""

    data: SegDataConfig = field(default_factory=SegDataConfig)
    backbone: str = "xception"  # train.py:94
    pretrained: str = ""  # path to converted backbone weights ('' = random)
    downsample_factor: int = 16  # train.py:129
    init_epoch: int = 0
    freeze_epoch: int = 20  # train.py:176-187
    unfreeze_epoch: int = 200
    freeze_batch_size: int = 16
    unfreeze_batch_size: int = 8
    freeze_train: bool = False  # train.py:192 (reference default False)
    init_lr: float = 1e-4  # train.py:205-229 (adam)
    min_lr_ratio: float = 0.01
    optimizer_type: str = "adam"
    momentum: float = 0.9
    weight_decay: float = 0.0  # reference: 0 for adam
    lr_decay_type: str = "cos"
    focal_loss: bool = True  # train.py:259-265
    dice_loss: bool = True
    cls_weights: Tuple[float, ...] = (1.0, 1.0, 5.0, 3.0, 4.0)  # train.py:274
    save_period: int = 10
    save_dir: str = "logs"
    eval_period: int = 10
    # ALSO evaluate through the full inference path (letterbox -> predictor
    # -> original-resolution mIoU) every eval_period epochs, like the
    # reference's EvalCallback (utils/callbacks.py:105-200).  Off by
    # default: MiouHistory already tracks the metric at staged resolution.
    predictor_eval: bool = False
    seed: int = 11  # train.py:283
    # from-scratch init: "normal" replicates the reference's weights_init
    # (every conv N(0,.02), BN scale N(1,.02) — train.py:313-316); "none"
    # keeps flax defaults.  Ignored when `pretrained` is set.
    weights_init: str = "normal"
    # TPU-native knobs (replace fp16/AMP and DDP/NCCL)
    dtype: str = "bfloat16"
    # conv lowering for the ASPP/decoder head only: "" = process default
    # ("lax"), "einsum" = im2col (ops/conv.py; ROADMAP item 2 experiment)
    head_conv_backend: str = ""
    # run eval/val forwards (trainer eval step + predictor-path callback)
    # with the fused pallas middle flow (ops/pallas_xception.py; xception
    # only, eval-mode BN folded, single-device mesh only — the Mosaic
    # custom-call has no GSPMD sharding rule).  The train step keeps the
    # flax path regardless (training BN needs cross-batch stats between
    # the fused ops).  Measured a TIE vs XLA on the round-2 platform
    # (docs/PLATFORM.md) — an opt-in re-probe hook, not a default win.
    fused_middle_eval: bool = False
    num_devices: Optional[int] = None  # None = all visible
    eval_batch_size: int = 8
    # max in-flight train/eval steps before the oldest step's metrics are
    # fetched: per-step dispatch costs ~30-70 ms host round-trip on the
    # target platform (docs/PLATFORM.md), so the epoch loop keeps a window
    # of un-fetched steps pipelined.  1 = fetch every step (torch-like).
    pipeline_depth: int = 8
    # optimizer steps run per compiled program via lax.scan: every program
    # execution carries a fixed ~28 ms serialized cost on the target
    # platform (docs/PLATFORM.md round-2 chain-length sweep), so K steps
    # per program amortize it to ~28/K ms/step.  1 = one step per program.
    # 8 (round 4, was 4): once the step shrank to ~55 ms the remaining
    # dispatch share mattered — rbg scan8 ABAB'd 53.6/53.6 ms vs scan4
    # 54.8-59.2 (docs/PERF.md); epoch tails shorter than K fall back to
    # single steps, so any dataset size works.
    steps_per_call: int = 8
    # PRNG implementation for the train-time dropout masks: "rbg" (XLA
    # RngBitGenerator, default) or "threefry" (jax default).  The head's
    # two dropout layers generate (B,128,128,256)-sized masks twice per
    # step (forward + backward replay); threefry bit-gen measured ~6.9 ms
    # of the 59 ms xception 512^2 b8 step (scripts/bench_seg_segments.py
    # headd-vs-headnd), and the rbg step ABAB'd 54.8 vs 58.9 ms — 7%
    # (docs/PERF.md round 4).  Determinism holds either way (same key ->
    # same masks on a given backend); the streams differ but both are
    # valid dropout (the reference's stream is torch's RNG — no parity
    # constraint ties dropout to threefry).
    dropout_rng_impl: str = "rbg"
    # rematerialize the xception entry flow in the backward pass
    # (models/backbones/xception.py::XceptionBackbone.remat_entry):
    # entry:bwd is the train step's one memory-bound segment (round-4
    # decomposition) — remat trades its activation traffic for ~4% extra
    # FLOPs.  ABAB'd inside the full step (docs/PERF.md round 5).
    remat_entry: bool = False
    # feed training/eval from a device-resident copy of the dataset
    # (data/resident.py): the reference train set is 6,720 x 512^2 x 3
    # uint8 = 5.3 GB against 16 GB HBM, so it uploads ONCE and the
    # scanned train step reads batches from device memory — on the
    # target platform host uploads serialize with compute, costing the
    # host-fed epoch loop ~half the step throughput (docs/PLATFORM.md
    # round-2 epoch row; VERDICT r4 task #1).  Off by default: the
    # host-loader path remains for datasets that don't fit.
    device_resident: bool = False
    # per-epoch reshuffle of the resident train set:
    # "gather" (default) = image-level reshuffle with ZERO extra HBM:
    #   the scanned train step gathers each batch's rows from the
    #   resident set by a host-permuted (K,B) index — batch-axis gathers
    #   vectorize on the target platform (docs/PLATFORM.md round-5 row;
    #   ~6 MB of extra reads per step);
    # "images" = full on-device permutation (one donated
    #   permutation+take program per epoch) — same statistics, but the
    #   transient peak is ~2x the image set (at the 7 GB reference scale
    #   this OOMed the 16 GB chip once eval/predictor programs were also
    #   resident); use when HBM is plentiful or the flat gather's
    #   reshape is awkward for a sharded layout;
    # "chunks" = host-side chunk-ORDER shuffle only (batch composition
    #   fixed across epochs — coarser than the reference's sampler);
    # "none" = fixed order (debug).
    resident_shuffle: str = "gather"


@dataclass
class FusionTrainConfig:
    """Multimodal fusion trainer config (my_train(full).py:648-678 + the
    per-arity deltas table, SURVEY.md §2.1)."""

    modalities: Tuple[str, ...] = ("imgN", "imgA", "imgL", "cli")
    in_features: int = 1024
    hidden: int = 512
    num_classes: int = 4
    dropout: float = 0.3
    mix: bool = True
    epochs: int = 180
    lr: float = 1e-4
    batch_size: int = 8
    # per-arity deltas (SURVEY §2.1): 4-modal (5, .25, 5e-4, 40);
    # 3-modal (10, .11, 1e-3, 30); 2-modal (5, .25, 1e-3, 20)
    kfold: int = 5
    inner_test_size: float = 0.25
    weight_decay: float = 5e-4
    lr_step: int = 40
    lr_gamma: float = 0.8  # adjust_lr_raito
    add_mse_loss_of_mae: bool = True
    mse_loss_of_mae_factor: float = 5.0
    head_weight_all: float = 1.0
    head_weight_img: float = 0.3
    head_weight_cli: float = 0.2
    epoch0_no_step: bool = True  # my_train(full).py:350-353 warmup quirk
    # evaluate the test fold every epoch like the reference (my_train(full)
    # .py:538-539) — selection stays val-based; this only adds the reported
    # per-epoch test trajectory
    per_epoch_test: bool = True
    start_seed: int = 0
    repeat_num: int = 1
    save_dir: str = "logs_fusion"
    dtype: str = "float32"

    def arity_defaults(self, explicit=()):
        """Apply the reference's per-arity hyperparameter deltas in place.

        ``explicit`` names config keys the user set via file/CLI; those are
        left untouched so e.g. ``--kfold 7`` survives on a 3-modal run.
        Deltas: Three_Modal/train(NAL).py:494,510,542 (kfold 10,
        test_size .11, wd 1e-3, lr_step 30); Two_Modal/train(NC).py:418-466
        (wd 1e-3, lr_step 20); 4-modal keeps the dataclass defaults
        (my_train(full).py:648-678).
        """
        n = len(self.modalities)
        deltas = {
            3: dict(kfold=10, inner_test_size=0.11,
                    weight_decay=1e-3, lr_step=30),
            2: dict(kfold=5, inner_test_size=0.25,
                    weight_decay=1e-3, lr_step=20),
        }.get(n)
        if deltas:
            for k, v in deltas.items():
                if k not in explicit:
                    setattr(self, k, v)
        return self


def _update_dataclass(obj, data: dict):
    for k, v in data.items():
        if not hasattr(obj, k):
            raise KeyError(f"unknown config key: {k!r} for {type(obj).__name__}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _update_dataclass(cur, v)
        else:
            if isinstance(cur, tuple) and isinstance(v, (list, tuple)):
                v = tuple(v)
            setattr(obj, k, v)
    return obj


def load_config(cls, path: Optional[str] = None, overrides: Optional[dict] = None,
                explicit_out: Optional[set] = None):
    """Build ``cls()`` then apply a YAML/JSON file and/or override dict.

    ``explicit_out``: optional set that collects the top-level keys the
    user actually set (file + overrides) — lets callers distinguish
    user-chosen values from dataclass defaults (e.g. for
    :meth:`FusionTrainConfig.arity_defaults`).
    """
    cfg = cls()
    if path:
        with open(path) as f:
            if path.endswith(".json"):
                data = json.load(f)
            else:
                if yaml is None:
                    raise RuntimeError("pyyaml unavailable; use JSON config")
                data = yaml.safe_load(f)
        _update_dataclass(cfg, data or {})
        if explicit_out is not None and data:
            explicit_out.update(data)
    if overrides:
        _update_dataclass(cfg, overrides)
        if explicit_out is not None:
            explicit_out.update(overrides)
    return cfg


def parse_cli_overrides(argv):
    """``--a.b.c value`` pairs -> nested override dict (values JSON-parsed)."""
    out = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise ValueError(f"expected --key, got {arg!r}")
        key = arg[2:]
        if "=" in key:
            key, raw = key.split("=", 1)
            i += 1
        else:
            raw = argv[i + 1]
            i += 2
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out
