"""Benchmark: fused augmentation preprocessing throughput (images/sec/chip).

North-star metric from BASELINE.json: >= 10k augmented 512x512 images/sec/chip
through the full train-time augmentation pipeline — aspect-jitter scale,
h-flip, random paste with gray fill, +-10 deg rotation (p=.25), HSV gain
jitter, conditional 5x5 Gaussian blur, normalization, plus the paired
nearest-neighbor label warp — replacing the reference's per-image PIL/cv2
python loop (Segmentation/deeplabv3+/utils/dataloader.py:55-154).

Implementation under test: the Pallas/Mosaic warp backend
(cervical_tpu/ops/pallas_warp.py) — per-image MXU-matmul resample, exact
in-VMEM Paeth 3-shear rotation (PREDICATED via in-kernel ``lax.cond``:
only the 25% of images the reference rotates pay the shear ladders),
photometric kernel — with device-side parameter sampling.  Exact 3-shear
on every rotating image — no capacity cap, no 2-shear approximation.
Measured: **23.5k img/s median (round 3)**; the einsum path stays as the
fallback (`CERVICAL_BENCH_BACKEND=einsum`, **12.7k** after the round-3
int8-resample + uint8-carry + closed-form-HSV work — was 10.6k).

History: round 1 parked pallas (Mosaic ~40x slow); round 2 revived it
(17.0k, then 22.7-23.2k predicated, ABAB via
scripts/bench_warp_variants.py); BENCH_r02 then silently fell back to
einsum when a toolchain update OOMed the photometric kernel's scoped
vmem — fixed in round 3 with an explicit 32 MB budget.  Diagnose any new
regression with scripts/probe_pallas.py (production-kernel compiles) and
scripts/bisect_pallas.py (construct-level ladder).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_augmentation(batch=1024, size=512, iters=12, windows=3, warmup=6):
    # the first executions after (re)connecting the tunnel run 20-30% slow
    # (device/allocator warm-up — measured by permuting variant order in
    # scripts/bench_warp_variants.py) and throughput drifts between runs
    # (docs/PLATFORM.md measurement caveat), so measure several windows of
    # pipelined dispatches and report the best.  Windows are long (12
    # dispatches) so the one blocking round-trip per window amortizes like
    # the continuously-pipelined training loop it stands in for.
    import os

    from cervical_tpu.ops import augment as A
    from cervical_tpu.ops import warp_xla as WX
    from cervical_tpu.ops import pallas_warp as PW

    backend = os.environ.get("CERVICAL_BENCH_BACKEND", "pallas")

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (batch, size, size)), jnp.uint8)
    capacity = batch // 4  # rotation/blur probability 0.25 (dataloader.py:118,125)

    @jax.jit
    def pipeline(images, labels, key):
        # rotating samples occupy a fixed prefix and blurred samples a fixed
        # suffix (the loader shuffles batch contents, so per-image marginals
        # stay 0.25) — the einsum backend exploits this with capacity
        # slicing; the pallas kernels rotate every image exactly and are
        # still faster
        params = A.sample_augment_params(key, batch, rotate_prefix=capacity,
                                         blur_suffix=capacity)
        if backend == "pallas":
            return PW.augment_batch_pallas(images, labels, params,
                                           (size, size))
        return WX.augment_batch_einsum(images, labels, params, (size, size),
                                       rotate_capacity=capacity,
                                       blur_capacity=capacity,
                                       two_shear=True, int8_resample=True)

    key = jax.random.PRNGKey(0)
    out = pipeline(images, labels, key)
    _ = float(out[0][0, 0, 0, 0])  # block on compile+first run

    keys = jax.random.split(key, warmup + windows * iters)
    for i in range(warmup):
        out = pipeline(images, labels, keys[i])
    _ = float(out[0][0, 0, 0, 0])

    times = []
    k = warmup
    for _w in range(windows):
        t0 = time.perf_counter()
        for _i in range(iters):
            out = pipeline(images, labels, keys[k])
            k += 1
        # force full completion of the window
        _ = float(out[0].sum()) + float(out[1].sum())
        times.append(time.perf_counter() - t0)
    times.sort()
    median = times[len(times) // 2]
    return batch * iters / median, batch * iters / times[0]


def _supervise(argv):
    """Run the real bench in a child process under a hard timeout.

    The round-4 builder session hit repeated TUNNEL WEDGES: every device
    call (even a 128x128 matmul) blocks forever with the client
    epoll-waiting on the axon RPC, then the platform self-recovers
    ~40-60 min later (docs/PLATFORM.md round-4 drift row).  A wedge
    during the driver's bench run would hang it with no artifact, so the
    parent enforces a per-attempt wall cap, retries once after a cool-off
    (wedges are transient), and emits a diagnosable JSON line if both
    attempts die.  Re-runs itself with CERVICAL_BENCH_CHILD=1 to skip
    supervision in the child.
    """
    import os
    import subprocess
    import sys
    import time as _time

    attempt_cap = int(os.environ.get("CERVICAL_BENCH_TIMEOUT", "2700"))
    env = dict(os.environ, CERVICAL_BENCH_CHILD="1")
    last_fail = "?"
    for attempt in range(2):
        try:
            res = subprocess.run([sys.executable, os.path.abspath(__file__),
                                  *argv], env=env, capture_output=True,
                                 text=True, timeout=attempt_cap)
        except subprocess.TimeoutExpired:
            last_fail = f"timeout>{attempt_cap}s (tunnel wedge?)"
            print(f"bench attempt {attempt} hit the {attempt_cap}s wall cap "
                  "— likely a platform tunnel wedge; killed the child",
                  file=sys.stderr)
            if attempt == 0:
                _time.sleep(int(os.environ.get("CERVICAL_BENCH_COOLOFF",
                                               "300")))
            continue
        sys.stderr.write(res.stderr)
        lines = [ln for ln in res.stdout.splitlines()
                 if ln.startswith("{")]
        # diagnostic/progress stdout lines are not the artifact — echo
        # them to stderr so they survive supervision (ADVICE r4)
        for ln in res.stdout.splitlines():
            if not ln.startswith("{"):
                print(ln, file=sys.stderr)
        if res.returncode == 0 and lines:
            print(lines[-1])
            return 0
        last_fail = (f"exit {res.returncode}: "
                     f"{(res.stderr or res.stdout).strip()[-300:]}")
        if attempt == 0:
            _time.sleep(60)
    print(json.dumps({
        "metric": "augmented 512x512 images/sec/chip (fused train-time preprocessing)",
        "value": 0.0, "unit": "images/sec/chip", "backend": "none",
        "vs_baseline": 0.0,
        "error": f"bench could not complete: {last_fail}"}))
    return 1


def main():
    import os
    import sys

    target = 10_000.0
    # value = MEDIAN window (honest against the documented tunnel drift);
    # best window reported alongside (round-1 VERDICT item 8)
    backend = os.environ.get("CERVICAL_BENCH_BACKEND", "pallas")

    def _err_detail(e):
        detail = [ln for ln in str(e).splitlines()
                  if "rror" in ln or "vmem" in ln or "emory" in ln]
        return " | ".join(detail)[-600:] or str(e)[-600:]

    try:
        ips, best = bench_augmentation(windows=5)
    except Exception as e:
        if backend == "einsum":
            raise
        # the pallas path depends on the platform's Mosaic toolchain, which
        # regressed twice before (round 1: ~1000x below roofline; round 2
        # post-builder: scoped-vmem accounting change OOMed the photometric
        # kernel).  Retry ladder: (1) re-trace with doubled scoped-vmem
        # budgets — the exact knob that fixed the round-2 regression —
        # then (2) fall back to the einsum/barrel backend rather than
        # reporting nothing.  Each step logs the error detail so the
        # regression is diagnosable from the driver artifact
        # (scripts/bisect_pallas.py isolates the construct).
        print(f"pallas backend failed ({type(e).__name__}); retrying with "
              f"CERVICAL_PALLAS_VMEM_SCALE=2\n  detail: {_err_detail(e)}",
              file=sys.stderr)
        os.environ["CERVICAL_PALLAS_VMEM_SCALE"] = "2"
        jax.clear_caches()  # the budget is captured at trace time
        try:
            ips, best = bench_augmentation(windows=5)
            backend = "pallas-vmem2x"
        except Exception as e2:
            print(f"pallas retry failed ({type(e2).__name__}); falling back "
                  f"to einsum\n  detail: {_err_detail(e2)}", file=sys.stderr)
            os.environ["CERVICAL_BENCH_BACKEND"] = backend = "einsum"
            ips, best = bench_augmentation(windows=5)
    print(json.dumps({
        "metric": "augmented 512x512 images/sec/chip (fused train-time preprocessing)",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "best": round(best, 1),
        "backend": backend,
        # semantics differ by backend (VERDICT r3 weak #2): the pallas
        # kernels rotate with the exact Paeth 3-shear; the einsum fallback
        # opts into the 2-shear approximation + int8-MXU resample for its
        # margin (bench_augmentation two_shear=True).  Named here so the
        # bench artifact says what it measured.
        "rotation": ("exact-3-shear" if backend.startswith("pallas")
                     else "2-shear-approx+int8"),
        "vs_baseline": round(ips / target, 3),
    }))


if __name__ == "__main__":
    import os as _os
    import sys as _sys
    if _os.environ.get("CERVICAL_BENCH_CHILD"):
        main()
    else:
        _sys.exit(_supervise(_sys.argv[1:]))
