"""Decompose the seg train step: forward vs backward vs optimizer.

The batch-8 512^2 xception FORWARD runs ~18 ms (scripts/bench_predict.py)
while the full train step runs ~190 ms (scripts/bench_seg_step.py) — ~11x,
where a healthy fwd:step ratio is ~1:3.  This probe times three programs on
identical inputs/state, ABAB-interleaved (scripts/_bench_util.py rules):

  fwd   — aug + train-mode forward + loss (no grad)
  grad  — aug + value_and_grad (all grads consumed via global-norm-like
          reduction so XLA cannot DCE any of the backward)
  step  — the real train step (grad + optimizer update + BN stats)

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/bench_seg_step_parts.py [variant ...]
variants: fwd grad step (default: fwd grad step fwd grad step)
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def build(backbone="xception", batch=8, size=512):
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train import seg_trainer as T
    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops.warp_xla import augment_batch_einsum
    from cervical_tpu.ops.image import one_hot_with_ignore

    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=5),
                         backbone=backbone, unfreeze_batch_size=batch)
    model = T.build_model(cfg)
    state = T.create_state(cfg, jax.random.PRNGKey(0))
    h, w = size, size
    nc = 5

    def prep(images, labels, aug_params):
        cap = max(1, images.shape[0] // 4)
        images, labels = augment_batch_einsum(
            images, labels, aug_params, (h, w), letterbox=False,
            rotate_capacity=cap, blur_capacity=cap,
            two_shear=cfg.data.two_shear)
        images = images.astype(jnp.bfloat16)
        labels = jnp.minimum(labels, nc)
        return images, labels, one_hot_with_ignore(labels, nc)

    def loss_of(params, batch_stats, images, labels, one_hot, rng):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        total, _ = T.seg_loss_fn(cfg, logits, labels, one_hot)
        return total

    @jax.jit
    def fwd(state, images, labels, aug_params, rng):
        images, labels, one_hot = prep(images, labels, aug_params)
        return loss_of(state.params, state.batch_stats, images, labels,
                       one_hot, rng)

    @jax.jit
    def fwdnoaug(state, images, labels, aug_params, rng):
        # skip the warp entirely (normalize only) — isolates the fused
        # augmentation's in-program cost at this batch size
        from cervical_tpu.ops.histeq import preprocess_input
        x = preprocess_input(images.astype(jnp.float32)).astype(jnp.bfloat16)
        lbl = jnp.minimum(labels.astype(jnp.int32), nc)
        one_hot = one_hot_with_ignore(lbl, nc)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        total, _ = T.seg_loss_fn(cfg, logits, lbl, one_hot)
        return total

    @jax.jit
    def fwdeval(state, images, labels, aug_params, rng):
        # identical program minus train-mode BN (running stats, no batch
        # reductions) and dropout — isolates their forward cost
        images, labels, one_hot = prep(images, labels, aug_params)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        total, _ = T.seg_loss_fn(cfg, logits, labels, one_hot)
        return total

    @jax.jit
    def grad(state, images, labels, aug_params, rng):
        images, labels, one_hot = prep(images, labels, aug_params)
        loss, grads = jax.value_and_grad(loss_of)(
            state.params, state.batch_stats, images, labels, one_hot, rng)
        # consume EVERY grad leaf so none of the backward is dead code
        gnorm = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree_util.tree_leaves(grads))
        return loss + 0.0 * gnorm

    step_fn = T.make_train_step(cfg, model, T.make_optimizer(cfg),
                                frozen=False)

    def step(state, images, labels, aug_params, rng):
        _, m = step_fn(state, images, labels, aug_params,
                       jnp.float32(1e-4), rng)
        return m["loss"]

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)),
                         jnp.uint8)
    labels = jnp.asarray(rng.integers(0, nc, (batch, size, size)), jnp.uint8)
    cap = max(1, batch // 4)

    def make_args(i):
        key = jax.random.PRNGKey(i)
        p = A.sample_augment_params(key, batch, rotate_prefix=cap,
                                    blur_suffix=cap)
        return p, key

    def run(fn, i, args=None):
        p, key = args if args is not None else make_args(i)
        return fn(state, images, labels, p, key)

    fns = {"fwd": fwd, "fwdeval": fwdeval, "fwdnoaug": fwdnoaug,
           "grad": grad, "step": step}
    return fns, run, make_args


def main():
    # variant suffix "+pre": pre-materialize each timed iteration's aug
    # params/key OUTSIDE the timed loop (isolates the eager
    # sample_augment_params dispatch chain from the step program itself)
    variants = sys.argv[1:] or ["fwd", "grad", "step", "fwd", "grad", "step"]
    fns, run, make_args = build()
    seed = [1000]

    def bench(name, iters=8, warmup=4):
        pre = name.endswith("+pre")
        fn = fns[name[:-4] if pre else name]
        t0 = time.perf_counter()
        _ = float(run(fn, seed[0])); seed[0] += 1
        compile_s = time.perf_counter() - t0
        for _ in range(warmup):
            out = run(fn, seed[0]); seed[0] += 1
        _ = float(out)
        args = None
        if pre:
            args = [make_args(seed[0] + i) for i in range(iters)]
            for p, k in args:
                jax.block_until_ready(p)
        t0 = time.perf_counter()
        for i in range(iters):
            out = run(fn, seed[0], args[i] if pre else None); seed[0] += 1
        _ = float(out)
        seed[0] += iters
        return (time.perf_counter() - t0) / iters, compile_s

    for name in variants:
        dt, compile_s = bench(name)
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
