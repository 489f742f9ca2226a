#!/usr/bin/env python
"""Demo: pipeline-parallel flow over a frame stream (PP across frames).

Partitions the coarse-to-fine (+GNC) level schedule into stage groups,
one device each, and keeps several frames in flight — see
``optical_flow_tpu/parallel/pipeline.py``.  On a single-chip host this
degenerates gracefully to one group; to see multi-device placement
without a pod, run on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/pipeline_demo.py

Compares the pipelined stream against the per-level path frame by frame.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from optical_flow_tpu import estimate_flow, estimate_flow_pipelined
    from optical_flow_tpu.io.flo import read_flow_file

    im1, im2, _, _ = read_flow_file("RubberWhale", 10)
    frames = [(im1, im2)] * 4
    devices = jax.devices()
    print(f"devices: {devices}")

    t0 = time.time()
    flows = [np.asarray(uv) for uv in estimate_flow_pipelined(
        frames, "classic+nl-fast", {"display": False, "fuse": False},
        devices=devices,
    )]
    dt = time.time() - t0
    print(f"pipelined: {len(flows)} frames in {dt:.2f}s "
          f"({len(flows) / dt:.2f} frames/s incl. compile)")

    ref = np.asarray(
        estimate_flow(im1, im2, "classic+nl-fast", {"display": False, "fuse": False})
    )
    diff = max(float(np.abs(f - ref).max()) for f in flows)
    print(f"max abs diff vs per-level path: {diff:.3e}")


if __name__ == "__main__":
    main()
