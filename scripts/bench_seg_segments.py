"""Per-segment decomposition of the xception 512^2 b8 train step (round-4
VERDICT task #1: the step sustains ~34 TFLOP/s = 17.9% MFU while the
platform's conv geometries measure 72-147 TFLOP/s in-program — attribute
the gap segment by segment, then either lift it or prove each segment is
at its measured ceiling).

Method (docs/PLATFORM.md measurement rules):

* every segment is timed INSIDE one program as a ``lax.scan`` of K
  iterations over K distinct inputs (params closed over, like the real
  step), so the fixed ~28 ms per-program dispatch cost divides by K and
  the reported number is the in-program per-iteration cost;
* ``fwd`` = train-mode forward of the segment (output consumed by a
  reduction); ``bwd`` mode = value+grad wrt (params, input) with every
  grad leaf consumed — no dead code;
* all segment programs run ABAB-interleaved in ONE process, pass 0
  discarded (fresh-process penalty rule);
* FLOPs / bytes from XLA cost analysis of the compiled scan program —
  the scan body is counted ONCE (verified in bench_seg_step.py), so the
  figures are already per-iteration; floors: compute = flops / 80
  TFLOP/s (the platform's measured in-program conv ceiling at these
  geometries), memory = bytes / 420 GB/s (measured elementwise-chain
  bandwidth).  A segment within ~1.2x of max(floors) is AT its platform
  ceiling.

Segments (reference nets/xception.py + nets/deeplabv3_plus.py):
  aug     fused einsum augmentation + one-hot (512^2 uint8 -> bf16)
  entry   conv1/2 + blocks 1-3 (512^2x3 -> 32^2x728, low 128^2x256)
  middle  blocks 4-19 at 32^2x728
  exit    block20 + conv3/4/5 (32^2x728 -> 32^2x2048)
  head    ASPP + shortcut + decoder + cls + x4 resize (-> 512^2x5 logits)
  loss    focal + dice + f_score on 512^2 fp32 logits (separate fns)
  lossb   fused class-major bundle (losses.seg_loss_bundle, no one-hot)
  lossr   bundle + in-bundle x4 class-major resize from 128^2 logits (the
          round-4 production path: apply(resize_logits=False))
  opt     Adam update on the full 54M-param tree (carry-threaded)
  step    the real scanned train step (accounting check)

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_seg_segments.py [K] [iters] [seg ...]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import os

CONV_CEIL_TFLOPS = 80.0   # measured in-program conv ceiling at step geometries
MEM_CEIL_GBS = 420.0      # measured elementwise-chain bandwidth
BATCH = int(os.environ.get("SEG_BENCH_BATCH", 8))
SIZE = int(os.environ.get("SEG_BENCH_SIZE", 512))
NC = 5


def consume(tree):
    return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
               for l in jax.tree_util.tree_leaves(tree))


def build():
    import flax.linen as nn
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train import seg_trainer as T
    from cervical_tpu.models.deeplab import ASPP, _ConvBNReLU
    from cervical_tpu.models.backbones.xception import (XceptionBlock,
                                                        SeparableConv)
    from cervical_tpu.ops.conv import Conv
    from cervical_tpu.ops.warp_xla import augment_batch_einsum
    from cervical_tpu.ops.image import one_hot_with_ignore, resize_bilinear
    from cervical_tpu import losses

    batch, size, nc = BATCH, SIZE, NC
    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=nc),
                         backbone="xception", unfreeze_batch_size=batch)
    state = T.create_state(cfg, jax.random.PRNGKey(0))
    dt = jnp.bfloat16
    p, s = state.params, state.batch_stats
    bp, bs = p["backbone"], s["backbone"]
    _BN = dict(momentum=1.0 - 0.0003, epsilon=1e-5)

    def bn(params, stats, x):
        y, _ = nn.BatchNorm(use_running_average=False, **_BN, dtype=dt).apply(
            {"params": params, "batch_stats": stats}, x,
            mutable=["batch_stats"])
        return y

    def blk(name, feats, stride, params, stats, x, grow_first=True):
        (y, hook), _ = XceptionBlock(feats, stride,
                                     grow_first=grow_first, dtype=dt).apply(
            {"params": params[name], "batch_stats": stats[name]}, x,
            train=True, mutable=["batch_stats"])
        return y, hook

    # -- segment forwards: fn(params, *xs) ---------------------------------
    def entry_fwd(params, x):
        y = Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                 dtype=dt).apply({"params": params["conv1"]}, x)
        y = nn.relu(bn(params["bn1"], bs["bn1"], y))
        y = Conv(64, (3, 3), padding=1, use_bias=False, dtype=dt).apply(
            {"params": params["conv2"]}, y)
        y = nn.relu(bn(params["bn2"], bs["bn2"], y))
        y, _ = blk("block1", 128, 2, params, bs, y)
        y, low = blk("block2", 256, 2, params, bs, y)
        y, _ = blk("block3", 728, 2, params, bs, y)
        return y, low

    def middle_fwd(params, x):
        for i in range(4, 20):
            x, _ = blk(f"block{i}", 728, 1, params, bs, x)
        return x

    def exit_fwd(params, x):
        x, _ = blk("block20", 1024, 1, params, bs, x, grow_first=False)
        for name, feats in (("conv3", 1536), ("conv4", 1536),
                            ("conv5", 2048)):
            x, _ = SeparableConv(feats, 3, 1, 1, activate_first=False,
                                 dtype=dt).apply(
                {"params": params[name], "batch_stats": bs[name]}, x,
                train=True, mutable=["batch_stats"])
        return x

    def head_fwd(params, deep, low, rng):
        deep, _ = ASPP(256, rate=1, dtype=dt).apply(
            {"params": params["aspp"], "batch_stats": s["aspp"]},
            deep, True, mutable=["batch_stats"])
        low, _ = _ConvBNReLU(48, 1, dtype=dt).apply(
            {"params": params["shortcut"], "batch_stats": s["shortcut"]},
            low, True, mutable=["batch_stats"])
        deep = resize_bilinear(deep, (low.shape[1], low.shape[2]),
                               align_corners=True)
        y = jnp.concatenate([deep, low], axis=-1)
        k1, k2 = jax.random.split(rng)
        y, _ = _ConvBNReLU(256, 3, dtype=dt).apply(
            {"params": params["cat_conv1"],
             "batch_stats": s["cat_conv1"]}, y, True,
            mutable=["batch_stats"])
        y = nn.Dropout(0.5).apply({}, y, deterministic=False,
                                  rngs={"dropout": k1})
        y, _ = _ConvBNReLU(256, 3, dtype=dt).apply(
            {"params": params["cat_conv2"],
             "batch_stats": s["cat_conv2"]}, y, True,
            mutable=["batch_stats"])
        y = nn.Dropout(0.1).apply({}, y, deterministic=False,
                                  rngs={"dropout": k2})
        y = Conv(nc, (1, 1), dtype=dt).apply({"params": params["cls_conv"]},
                                             y)
        return resize_bilinear(y.astype(jnp.float32), (size, size),
                               align_corners=True)

    def headnd_fwd(params, deep, low, rng):
        # head without the two dropouts AND without the final x4 resize
        # (the round-4 production head: resize lives in the loss bundle)
        # vs `head`: isolates threefry mask-gen + resize cost on chip
        del rng
        deep, _ = ASPP(256, rate=1, dtype=dt).apply(
            {"params": params["aspp"], "batch_stats": s["aspp"]},
            deep, True, mutable=["batch_stats"])
        low, _ = _ConvBNReLU(48, 1, dtype=dt).apply(
            {"params": params["shortcut"], "batch_stats": s["shortcut"]},
            low, True, mutable=["batch_stats"])
        deep = resize_bilinear(deep, (low.shape[1], low.shape[2]),
                               align_corners=True)
        y = jnp.concatenate([deep, low], axis=-1)
        y, _ = _ConvBNReLU(256, 3, dtype=dt).apply(
            {"params": params["cat_conv1"],
             "batch_stats": s["cat_conv1"]}, y, True,
            mutable=["batch_stats"])
        y, _ = _ConvBNReLU(256, 3, dtype=dt).apply(
            {"params": params["cat_conv2"],
             "batch_stats": s["cat_conv2"]}, y, True,
            mutable=["batch_stats"])
        y = Conv(nc, (1, 1), dtype=dt).apply({"params": params["cls_conv"]},
                                             y)
        return y.astype(jnp.float32)

    def headd_fwd(params, deep, low, rng):
        # the PRODUCTION round-4 head: dropout kept, final x4 resize moved
        # into the loss bundle.  vs `headnd`: the dropout (threefry mask
        # gen) cost; vs `head`: the resize cost
        deep, _ = ASPP(256, rate=1, dtype=dt).apply(
            {"params": params["aspp"], "batch_stats": s["aspp"]},
            deep, True, mutable=["batch_stats"])
        low, _ = _ConvBNReLU(48, 1, dtype=dt).apply(
            {"params": params["shortcut"], "batch_stats": s["shortcut"]},
            low, True, mutable=["batch_stats"])
        deep = resize_bilinear(deep, (low.shape[1], low.shape[2]),
                               align_corners=True)
        y = jnp.concatenate([deep, low], axis=-1)
        k1, k2 = jax.random.split(rng)
        y, _ = _ConvBNReLU(256, 3, dtype=dt).apply(
            {"params": params["cat_conv1"],
             "batch_stats": s["cat_conv1"]}, y, True,
            mutable=["batch_stats"])
        y = nn.Dropout(0.5).apply({}, y, deterministic=False,
                                  rngs={"dropout": k1})
        y, _ = _ConvBNReLU(256, 3, dtype=dt).apply(
            {"params": params["cat_conv2"],
             "batch_stats": s["cat_conv2"]}, y, True,
            mutable=["batch_stats"])
        y = nn.Dropout(0.1).apply({}, y, deterministic=False,
                                  rngs={"dropout": k2})
        y = Conv(nc, (1, 1), dtype=dt).apply({"params": params["cls_conv"]},
                                             y)
        return y.astype(jnp.float32)

    def aug_fwd(params, images, labels, aug_params):
        del params
        cap = max(1, batch // 4)
        images, labels = augment_batch_einsum(
            images, labels, aug_params, (size, size), letterbox=False,
            rotate_capacity=cap, blur_capacity=cap)
        labels = jnp.minimum(labels, nc)
        return (images.astype(dt), labels.astype(jnp.int32),
                one_hot_with_ignore(labels, nc))

    def loss_fwd(params, logits, labels, one_hot):
        del params
        total, _ = T.seg_loss_fn(cfg, logits, labels, one_hot)
        return total + 0.0 * losses.f_score(logits, one_hot)

    def lossb_fwd(params, logits, labels):
        # the round-4 fused class-major bundle (losses.seg_loss_bundle):
        # one-hot derived inside, so the (B,H,W,6) HBM tensor never exists
        del params
        total, _, fs = T.seg_loss_bundle_fn(cfg, logits, labels)
        return total + 0.0 * fs

    def lossr_fwd(params, logits_q, labels):
        # bundle + in-bundle class-major x4 resize from quarter-res logits
        # (the production train path: apply(resize_logits=False)) — replaces
        # head's final resize AND loss; compare vs loss+~4ms of head resize
        del params
        total, _, fs = T.seg_loss_bundle_fn(cfg, logits_q, labels,
                                            resize_to=(size, size))
        return total + 0.0 * fs

    # -- sample inputs -----------------------------------------------------
    rng = np.random.default_rng(0)
    m = size // 16
    imgs_u8 = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)),
                          jnp.uint8)
    lbls_u8 = jnp.asarray(rng.integers(0, nc, (batch, size, size)), jnp.uint8)
    x_entry = jnp.asarray(rng.normal(size=(batch, size, size, 3)), dt)
    x_mid = jnp.asarray(rng.normal(size=(batch, m, m, 728)), dt)
    x_deep = jnp.asarray(rng.normal(size=(batch, m, m, 2048)), dt)
    x_low = jnp.asarray(rng.normal(size=(batch, size // 4, size // 4, 256)),
                        dt)
    logits0 = jnp.asarray(rng.normal(size=(batch, size, size, nc)),
                          jnp.float32)
    logits_q0 = jnp.asarray(rng.normal(size=(batch, size // 4, size // 4,
                                             nc)), jnp.float32)
    labels_i = jnp.asarray(rng.integers(0, nc, (batch, size, size)),
                           jnp.int32)
    one_hot0 = one_hot_with_ignore(labels_i, nc)

    _entryp = {k: bp[k] for k in
               ("conv1", "bn1", "conv2", "bn2", "block1", "block2", "block3")}
    _midp = {f"block{i}": bp[f"block{i}"] for i in range(4, 20)}
    _exitp = {k: bp[k] for k in ("block20", "conv3", "conv4", "conv5")}
    _headp = {k: p[k] for k in ("aspp", "shortcut", "cat_conv1",
                                "cat_conv2", "cls_conv")}

    def stackK(a, K, jitter=True):
        reps = jnp.stack([a] * K)
        if jitter and jnp.issubdtype(reps.dtype, jnp.floating):
            reps = reps + jax.random.normal(jax.random.PRNGKey(7),
                                            reps.shape, reps.dtype) * 0.01
        return reps

    def make_prog(fn, params, grad: bool, grad_input_idx=0):
        """jit((params, *stackedK_xs) -> (K,) scalars): K-scan of fn; in
        grad mode, value_and_grad wrt (params, xs[grad_input_idx]) per
        iteration with all grad leaves consumed."""
        def one(params, xs):
            if not grad:
                return consume(fn(params, *xs))

            def lfn(pp, xi):
                full = list(xs)
                full[grad_input_idx] = xi
                return consume(fn(pp, *full))
            val, grads = jax.value_and_grad(lfn, argnums=(0, 1))(
                params, xs[grad_input_idx])
            return val + consume(grads)

        @jax.jit
        def prog(params, *stacked):
            def body(c, xs):
                return c, one(params, xs)
            _, outs = lax.scan(body, 0.0, stacked)
            return outs
        return prog

    def seg_inputs(K):
        from cervical_tpu.ops import augment as A2
        keys = jax.random.split(jax.random.PRNGKey(3), K)
        augp = jax.vmap(lambda k: A2.sample_augment_params(
            k, batch, rotate_prefix=max(1, batch // 4),
            blur_suffix=max(1, batch // 4)))(keys)
        return {
            "aug": (aug_fwd, {}, False,
                    (stackK(imgs_u8, K, False), stackK(lbls_u8, K, False),
                     augp)),
            "entry": (entry_fwd, _entryp, True,
                      (stackK(x_entry, K),)),
            "middle": (middle_fwd, _midp, True, (stackK(x_mid, K),)),
            "exit": (exit_fwd, _exitp, True, (stackK(x_mid, K),)),
            "head": (head_fwd, _headp, True,
                     (stackK(x_deep, K), stackK(x_low, K),
                      jax.random.split(jax.random.PRNGKey(5), K))),
            "headnd": (headnd_fwd, _headp, True,
                       (stackK(x_deep, K), stackK(x_low, K),
                        jax.random.split(jax.random.PRNGKey(5), K))),
            "headd": (headd_fwd, _headp, True,
                      (stackK(x_deep, K), stackK(x_low, K),
                       jax.random.split(jax.random.PRNGKey(5), K))),
            "loss": (loss_fwd, {}, True,
                     (stackK(logits0, K), stackK(labels_i, K, False),
                      stackK(one_hot0, K))),
            "lossb": (lossb_fwd, {}, True,
                      (stackK(logits0, K), stackK(labels_i, K, False))),
            "lossr": (lossr_fwd, {}, True,
                      (stackK(logits_q0, K), stackK(labels_i, K, False))),
        }

    # optimizer: K carry-threaded Adam updates with fixed grads (carry makes
    # iterations dependent so XLA cannot hoist the body)
    tx = T.make_optimizer(cfg)
    opt_state = {"backbone": tx.init(T._split_params(p)[0]),
                 "head": tx.init(T._split_params(p)[1])}
    grads_fix = jax.tree_util.tree_map(lambda a: a * 1e-3 + 1e-5, p)

    def opt_prog(K):
        import optax

        @jax.jit
        def prog(params, opt, grads):
            def body(carry, _):
                params, opt = carry
                gb, gh = T._split_params(grads)
                pb, ph = T._split_params(params)
                ob, oh = opt["backbone"], opt["head"]
                ob.hyperparams["learning_rate"] = jnp.float32(1e-4)
                oh.hyperparams["learning_rate"] = jnp.float32(1e-4)
                ub, nb = tx.update(gb, ob, pb)
                uh, nh = tx.update(gh, oh, ph)
                newp = optax.apply_updates(ph, uh)
                newp.update(optax.apply_updates(pb, ub))
                return ((newp, {"backbone": nb, "head": nh}),
                        newp["cls_conv"]["bias"][0])
            (_, _), outs = lax.scan(body, (params, opt), None, length=K)
            return outs
        return prog, (p, opt_state, grads_fix)

    # the real production program: K scanned train steps
    def step_prog(K):
        sfn = T.make_train_step_scan(cfg, T.build_model(cfg), tx,
                                     frozen=False, k=K)
        imgs = jnp.asarray(rng.integers(0, 256, (K, batch, size, size, 3)),
                           jnp.uint8)
        lbls = jnp.asarray(rng.integers(0, nc, (K, batch, size, size)),
                           jnp.uint8)

        def prog(state, images, labels):
            st, mtr = sfn(state, images, labels, jnp.float32(1e-4),
                          jax.random.PRNGKey(11))
            return mtr["loss"]
        return prog, (state, imgs, lbls)

    return make_prog, seg_inputs, opt_prog, step_prog


def cost_of(jitted, args, K):
    try:
        compiled = jitted.lower(*args).compile()
        costs = compiled.cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
        del K  # scan body counted once by the analysis (bench_seg_step.py)
        return (float(costs.get("flops", 0.0)),
                float(costs.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    only = set(sys.argv[3:])
    make_prog, seg_inputs, opt_prog, step_prog = build()
    segs = seg_inputs(K)

    jobs = []  # (name, jitted_or_fn, args, has_cost)
    for name, (fn, params, can_grad, xs) in segs.items():
        if only and name not in only:
            continue
        jobs.append((f"{name}:fwd", make_prog(fn, params, False),
                     (params, *xs), True))
        if can_grad:
            jobs.append((f"{name}:bwd", make_prog(fn, params, True),
                         (params, *xs), True))
    if not only or "opt" in only:
        oprog, oargs = opt_prog(K)
        jobs.append(("opt:fwd", oprog, oargs, True))
    if not only or "step" in only:
        sprog, sargs = step_prog(K)
        jobs.append(("step:full", sprog, sargs, False))

    for name, fn, args, _ in jobs:
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out).sum())
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {name: [] for name, *_ in jobs}
    for it in range(iters + 1):
        for name, fn, args, _ in jobs:
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(np.asarray(out).sum())
            if it > 0:
                times[name].append(time.perf_counter() - t0)

    for name, fn, args, has_cost in jobs:
        med = sorted(times[name])[len(times[name]) // 2]
        per_iter_ms = med / K * 1e3
        row = {"segment": name, "K": K,
               "program_ms": round(med * 1e3, 1),
               "per_iter_ms": round(per_iter_ms, 2)}
        if has_cost and hasattr(fn, "lower"):
            flops, abytes = cost_of(fn, args, K)
            if flops:
                gflop = flops / 1e9
                row["gflop"] = round(gflop, 1)
                row["tflops_per_sec"] = round(gflop / per_iter_ms, 1)
                row["compute_floor_ms"] = round(gflop / CONV_CEIL_TFLOPS, 2)
            if abytes:
                gb = abytes / 1e9
                row["gbytes"] = round(gb, 2)
                row["mem_floor_ms"] = round(gb / MEM_CEIL_GBS * 1e3, 2)
            if flops and abytes:
                floor = max(row["compute_floor_ms"], row["mem_floor_ms"])
                row["vs_floor"] = round(per_iter_ms / max(floor, 1e-6), 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
