"""Native (C) host-side components, loaded via ctypes.

Build happens lazily on first use (gcc is assumed present in dev/serving
images); every consumer has a pure-numpy fallback, so the package works
without a toolchain too.
"""
from optical_flow_tpu.native.build import load_floio

__all__ = ["load_floio"]
