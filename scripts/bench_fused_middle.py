"""Fused pallas middle flow vs the flax path: full DeepLab-xception eval
forward on the real TPU, ABAB in one process.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/bench_fused_middle.py [flax|fused ...] \
               [--batch=1] [--size=512] [--os=16]

Repeat variants for ABAB, e.g. ``flax fused flax fused`` — the first
result of a fresh process runs slow on this platform and must be
discarded (docs/PLATFORM.md).  Both variants share one initialized state,
so the comparison is weight-identical.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _bench_util import input_stream, timed  # noqa: E402

_STATE = {}


def _state(cfg):
    from cervical_tpu.train import seg_trainer as T
    key = (cfg.backbone, cfg.downsample_factor, tuple(cfg.data.input_shape))
    if key not in _STATE:
        _STATE[key] = T.create_state(cfg, jax.random.PRNGKey(0))
    return _STATE[key]


def bench(fused: bool, batch=1, size=512, os_=16, iters=20, warmup=5,
          seed=0):
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train import seg_trainer as T

    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=5),
                         backbone="xception", downsample_factor=os_)
    state = _state(cfg)
    model = T.build_model(cfg, fused_middle=fused)

    @jax.jit
    def fwd(x):
        logits = model.apply({"params": state.params,
                              "batch_stats": state.batch_stats},
                             x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    # index 0 is the compile call only; timed() consumes 1..warmup+iters+1
    # (never reuse an input — the tunnel result-caches identical (fn, args))
    xs = input_stream((batch, size, size, 3), jnp.bfloat16,
                      2 + warmup + iters, seed=seed)
    t0 = time.perf_counter()
    out = fwd(xs(0))
    _ = float(out[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0
    dt, _ = timed(fwd, lambda i: (xs(1 + i),), iters=iters, warmup=warmup)
    return dt, compile_s


def bench_interleaved(batch=1, size=512, os_=16, windows=6, iters=10,
                      warmup=3):
    """Compile BOTH variants once, then alternate timed windows — many
    ABAB reps for two compiles instead of one compile per data point
    (each remote AOT compile costs 2-3 min on this platform)."""
    from cervical_tpu.config import SegTrainConfig, SegDataConfig
    from cervical_tpu.train import seg_trainer as T

    cfg = SegTrainConfig(data=SegDataConfig(input_shape=(size, size),
                                            num_classes=5),
                         backbone="xception", downsample_factor=os_)
    state = _state(cfg)
    fns = {}
    for name, fused in (("flax", False), ("fused", True)):
        model = T.build_model(cfg, fused_middle=fused)

        @jax.jit
        def fwd(x, model=model):
            logits = model.apply({"params": state.params,
                                  "batch_stats": state.batch_stats},
                                 x, train=False)
            return jax.nn.softmax(logits, axis=-1)

        fns[name] = fwd
    # timed() consumes warmup+iters+1 distinct indices per window; the
    # 2*(windows+1) windows include the two discarded compile/fresh windows
    xs = input_stream((batch, size, size, 3), jnp.bfloat16,
                      2 * (windows + 1) * (warmup + iters + 1), seed=0)
    off = [0]

    def run(name):
        dt, _ = timed(fns[name], lambda i: (xs(off[0] + i),), iters=iters,
                      warmup=warmup)
        off[0] += warmup + iters + 1
        return dt

    run("flax"), run("fused")  # compile + discard the fresh-process window
    res = {"flax": [], "fused": []}
    for _ in range(windows):
        for name in ("flax", "fused"):
            res[name].append(round(run(name) / batch * 1e3, 3))
    import statistics
    for name in ("flax", "fused"):
        print(json.dumps({"variant": name, "batch": batch,
                          "ms_per_image_windows": res[name],
                          "median": round(statistics.median(res[name]), 3)}),
              flush=True)


def main():
    variants, batch, size, os_, inter = [], 1, 512, 16, False
    for a in sys.argv[1:]:
        if a.startswith("--batch"):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--size"):
            size = int(a.split("=", 1)[1])
        elif a.startswith("--os"):
            os_ = int(a.split("=", 1)[1])
        elif a == "--interleaved":
            inter = True
        else:
            variants.append(a)
    if inter:
        bench_interleaved(batch=batch, size=size, os_=os_)
        return
    variants = variants or ["flax", "fused", "flax", "fused"]
    for i, v in enumerate(variants):
        dt, compile_s = bench(v == "fused", batch=batch, size=size, os_=os_,
                              seed=i)
        print(json.dumps({"variant": v, "batch": batch,
                          "ms_per_image": round(dt / batch * 1e3, 3),
                          "ms_per_call": round(dt * 1e3, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
