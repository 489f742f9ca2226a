#!/usr/bin/env python
"""Run the NumPy reference on one Middlebury GT sequence and emit oracle numbers.

This anchors the repo's full-Middlebury table against the reference
implementation itself (``/root/reference``): the reference's own
``middlebury_benchmark.ipynb`` is stripped from its snapshot
(``.MISSING_LARGE_BLOBS``), so the per-sequence AAE/AEPE oracle numbers have to
be (re)measured.  Matches the eval protocol of ``benchmarks/middlebury.py``:
``flow_angular_error(tu, tv, u, v)`` with border=0 (identical formula in both
implementations; reference ``evaluation/metrics.py:5-53``).

Usage:
    python benchmarks/ref_oracle.py SEQUENCE [method] [--json out.json]

Designed to run as a single-threaded background job (set OMP_NUM_THREADS=1
etc. in the caller) so several sequences can run in parallel on a small host.
"""
import argparse
import json
import sys
import time

REFERENCE_PATH = "/root/reference"
DATA_ROOT = "/root/repo/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("method", nargs="?", default="classic+nl-fast")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE_PATH)
    import optical_flow as ref  # noqa: E402
    from optical_flow.io.flo_io import read_flow_file  # noqa: E402

    im1, im2, tu, tv = read_flow_file(args.sequence, 10, data_dir=DATA_ROOT)
    t0 = time.time()
    uv = ref.estimate_flow(im1, im2, args.method, {"display": False})
    dt = time.time() - t0
    aae, std_ae, aepe = ref.flow_angular_error(tu, tv, uv[:, :, 0], uv[:, :, 1])
    result = {
        "sequence": args.sequence,
        "method": args.method,
        "aae": float(aae),
        "std_ae": float(std_ae),
        "aepe": float(aepe),
        "sec": round(dt, 1),
    }
    line = json.dumps(result)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
