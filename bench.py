"""Benchmark: fused augmentation preprocessing throughput (images/sec/chip).

North-star metric from BASELINE.json: >= 10k augmented 512x512 images/sec/chip
through the full train-time augmentation pipeline (geometric warp + HSV
jitter + conditional blur + normalization), replacing the reference's
per-image PIL/cv2 python loop (dataloader.py:55-154).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_augmentation(batch=256, size=512, iters=20, warmup=3):
    from cervical_tpu.ops import augment as A

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 5, (batch, size, size)), jnp.uint8)

    @jax.jit
    def pipeline(images, labels, params):
        img, lbl = A.augment_batch(images, labels, params, (size, size))
        return img / 255.0, lbl

    key = jax.random.PRNGKey(0)
    params = A.sample_augment_params(key, batch)
    out = pipeline(images, labels, params)
    jax.block_until_ready(out)

    for _ in range(warmup):
        params = A.sample_augment_params(key, batch)
        jax.block_until_ready(pipeline(images, labels, params))

    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        params = A.sample_augment_params(k, batch)
        out = pipeline(images, labels, params)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    target = 10_000.0
    ips = bench_augmentation()
    print(json.dumps({
        "metric": "augmented 512x512 images/sec/chip (fused train-time preprocessing)",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / target, 3),
    }))


if __name__ == "__main__":
    main()
