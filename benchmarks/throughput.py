#!/usr/bin/env python
"""Throughput benchmarks: batched frame pairs and high-resolution frames.

Measures frames/s per chip with data-parallel batching (the production
serving shape — batching amortizes dispatch latency and fills the chip)
and wall time on 4K frames (the resolution the reference cannot touch:
its sparse solver is O((2HW)^2) memory).

    python benchmarks/throughput.py [--batch 8] [--method classic+nl-fast]
    python benchmarks/throughput.py --mode 4k
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np


def batched_bench(method: str, batch: int, reps: int = 3):
    import jax
    import jax.numpy as jnp

    from optical_flow_tpu.io.flo import read_flow_file
    from optical_flow_tpu.parallel.batch import estimate_flow_batched
    from optical_flow_tpu.utils.compat import rgb2gray

    im1, im2, _, _ = read_flow_file("RubberWhale", 10)
    g1 = np.asarray(rgb2gray(jnp.asarray(im1)))
    g2 = np.asarray(rgb2gray(jnp.asarray(im2)))
    pair = np.stack([g1, g2], axis=-1)
    stack = np.broadcast_to(pair, (batch, *pair.shape)).copy()
    # perturb each batch item so nothing is constant-folded
    stack += np.random.default_rng(0).normal(0, 1e-3, stack.shape)

    uv = np.asarray(estimate_flow_batched(stack, method, params={"display": False}))
    t_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        uv = np.asarray(estimate_flow_batched(stack, method, params={"display": False}))
        t_best = min(t_best, time.time() - t0)
    fps = batch / t_best
    print(
        f"batched {method}: batch={batch} {t_best:.2f}s/batch "
        f"-> {fps:.2f} frames/s per chip"
    )
    return fps


def bench_4k(method: str, reps: int = 2):
    import jax.numpy as jnp

    from optical_flow_tpu.config import load_of_method

    rng = np.random.default_rng(0)
    H, W = 2160, 3840
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    im2 = np.roll(base, 2, axis=1)
    ope = load_of_method(method)
    ope.display = False
    ope.images = jnp.stack([jnp.asarray(base), jnp.asarray(im2)], 2)
    uv = np.asarray(ope.compute_flow())
    t_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        uv = np.asarray(ope.compute_flow())
        t_best = min(t_best, time.time() - t0)
    print(f"4K ({W}x{H}) {method}: {t_best:.2f}s/frame  mean|u|={np.abs(uv[...,0]).mean():.3f}")
    return t_best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="classic+nl-fast")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mode", choices=["batched", "4k", "both"], default="batched")
    args = ap.parse_args()

    if args.mode in ("batched", "both"):
        batched_bench(args.method, args.batch)
    if args.mode in ("4k", "both"):
        bench_4k(args.method)


if __name__ == "__main__":
    main()
