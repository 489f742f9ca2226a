#!/usr/bin/env python
"""Full Middlebury 'other' benchmark: all 8 GT sequences.

Reproduces the reference's stripped ``middlebury_benchmark.ipynb``: runs a
method over every sequence with ground truth and reports AAE / AEPE plus
per-frame wall time.

Usage:
    python benchmarks/middlebury.py [method] [--json out.json]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402

SEQUENCES = [
    "RubberWhale",
    "Hydrangea",
    "Grove2",
    "Grove3",
    "Urban2",
    "Urban3",
    "Dimetrodon",
    "Venus",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("method", nargs="?", default="classic+nl-fast")
    ap.add_argument("--json", default=None)
    ap.add_argument("--sequences", nargs="*", default=SEQUENCES)
    args = ap.parse_args()

    from optical_flow_tpu.evaluation.metrics import flow_angular_error
    from optical_flow_tpu.interface import estimate_flow
    from optical_flow_tpu.io.flo import read_flow_file

    results = {}
    params = {"display": False}
    print(f"{'sequence':<14} {'AAE':>7} {'AEPE':>7} {'sec':>7} {'warmup':>8}")
    for seq in args.sequences:
        im1, im2, tu, tv = read_flow_file(seq, 10)
        if tu is None:
            continue
        # first call pays the (shape-keyed) compile; report it separately
        # from the steady-state per-frame time so neither number is polluted
        t0 = time.time()
        uv = np.asarray(estimate_flow(im1, im2, args.method, params))
        warmup = time.time() - t0
        t0 = time.time()
        uv = np.asarray(estimate_flow(im1, im2, args.method, params))
        dt = time.time() - t0
        aae, _, aepe = flow_angular_error(tu, tv, uv[:, :, 0], uv[:, :, 1])
        results[seq] = {
            "aae": round(float(aae), 3),
            "aepe": round(float(aepe), 4),
            "sec": round(dt, 2),
            "warmup_sec": round(warmup, 2),
        }
        print(f"{seq:<14} {aae:7.3f} {aepe:7.4f} {dt:7.2f} {warmup:8.2f}")

    avg_aae = float(np.mean([r["aae"] for r in results.values()]))
    avg_aepe = float(np.mean([r["aepe"] for r in results.values()]))
    print(f"{'MEAN':<14} {avg_aae:7.3f} {avg_aepe:7.4f}")
    results["_mean"] = {"aae": round(avg_aae, 3), "aepe": round(avg_aepe, 4)}
    results["_method"] = args.method

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
