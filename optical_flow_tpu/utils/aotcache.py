"""Persistent compiled-executable cache — kills the per-process compile tax.

``JAX_COMPILATION_CACHE_DIR`` is dead on this stack (the axon plugin
compiles through a remote AOT helper that never consults it), so every
process repays the full monolith compile (100–1400 s for classic+nl-fast
@584×388, DESIGN §8).  This module serializes the *compiled executable*
(``jax.experimental.serialize_executable`` — not just StableHLO: tracing,
lowering AND backend compilation are all skipped on rehydration) into a
directory keyed by (jax version, backend+device, program name, static
config, input avals).

Opt-in: ``export OFTPU_AOT_CACHE=/path/to/dir``.  On any
serialization/deserialization failure the call falls back to the normal
jit path (one warning per process) — behavior is identical either way,
only warmup time changes.

Known backend limits (handled by the graceful fallback):
* XLA:CPU cannot serialize 64-bit comparison ops ("`LessThan` is not
  serializable") — x64 programs fall back.
* (obsolete as of r4, kept for history) an earlier jaxlib could not
  serialize the executable returned by ``lower().compile()`` when the
  same program had already executed through plain jit in-process; on the
  current TPU stack this was re-measured and serialization succeeds
  either way, so cached_call persists programs regardless of call order.
"""
from __future__ import annotations

import hashlib
import os
import pickle
import warnings

import jax

_loaded: dict = {}
_warned = False


def cache_dir():
    return os.environ.get("OFTPU_AOT_CACHE") or None


_DEBUG = os.environ.get("OFTPU_AOT_CACHE_DEBUG", "") not in ("", "0")


def _dbg(msg):
    if _DEBUG:
        import sys

        print(f"[aotcache] {msg}", file=sys.stderr, flush=True)


def _warn_once(msg):
    global _warned
    if not _warned:
        warnings.warn(f"OFTPU_AOT_CACHE disabled: {msg}", stacklevel=3)
        _warned = True


_code_fp = None


def _code_fingerprint() -> str:
    """Content hash of the package source: a kernel change must MISS the
    cache (the key would otherwise happily serve an executable compiled
    from old code — same shapes, different program)."""
    global _code_fp
    if _code_fp is None:
        import optical_flow_tpu

        pkg = os.path.dirname(os.path.abspath(optical_flow_tpu.__file__))
        h = hashlib.sha256()
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs.sort()
            for f in sorted(files):
                if f.endswith((".py", ".c")):
                    with open(os.path.join(root, f), "rb") as fh:
                        h.update(f.encode())
                        h.update(fh.read())
        _code_fp = h.hexdigest()[:16]
    return _code_fp


def _key(name: str, static_key, args) -> str:
    dev = jax.devices()[0]
    ident = "|".join(
        [
            jax.__version__,
            jax.default_backend(),
            getattr(dev, "device_kind", str(dev)),
            _code_fingerprint(),
            name,
            repr(static_key),
        ]
        # tree_leaves: args may be pytrees (tuples of pyramid levels, ...)
        + [f"{a.shape}:{a.dtype}" for a in jax.tree_util.tree_leaves(args)]
    )
    return hashlib.sha256(ident.encode()).hexdigest()[:32]


def cached_call(jitfn, name: str, static_key, full_args, dyn):
    """Call ``jitfn(*full_args)`` through the executable cache.

    ``full_args`` is the complete positional call (static + dynamic, in
    signature order); ``dyn`` is the tuple of just the dynamic (array)
    arguments in positional order — the rehydrated executable is called
    with exactly those.  ``static_key`` must determine the traced program
    together with the arg avals (the frozen plan dataclasses qualify:
    their repr pins every constant).
    """
    d = cache_dir()
    if d is None:
        return jitfn(*full_args)
    if len(jax.devices()) != 1:
        # deserialize_and_load binds the executable to every local device
        # of the current backend; on a multi-device client the reloaded
        # single-device program then demands N input shards.  The cache
        # targets the single-chip serving process — skip otherwise.
        _warn_once(f"{len(jax.devices())} local devices; single-device only")
        return jitfn(*full_args)

    import numpy as np

    dyn = tuple(jax.numpy.asarray(a) if isinstance(a, np.ndarray) else a for a in dyn)
    key = _key(name, static_key, dyn)
    comp = _loaded.get(key)
    if comp is None:
        import time as _time

        path = os.path.join(d, key + ".jaxexe")
        if os.path.exists(path):
            try:
                from jax.experimental import serialize_executable

                t0 = _time.time()
                with open(path, "rb") as f:
                    comp = serialize_executable.deserialize_and_load(*pickle.load(f))
                _dbg(f"LOAD {name} {key} {_time.time() - t0:.1f}s")
            except Exception as e:  # stale jaxlib, foreign host, ...
                _warn_once(f"load failed ({e!r}); recompiling")
                _dbg(f"LOAD-FAIL {name} {key} {e!r}")
                comp = None
        else:
            _dbg(f"MISS {name} {key}")
        if comp is None:
            try:
                t0 = _time.time()
                comp = jitfn.lower(*full_args).compile()
                _dbg(f"COMPILE {name} {key} {_time.time() - t0:.1f}s")
            except Exception as e:
                _warn_once(f"AOT compile failed ({e!r}); plain jit path")
                _dbg(f"COMPILE-FAIL {name} {key} {e!r}")
                return jitfn(*full_args)
            try:
                from jax.experimental import serialize_executable

                os.makedirs(d, exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump(serialize_executable.serialize(comp), f)
                os.replace(tmp, path)
                _dbg(f"WRITE {name} {key}")
            except Exception as e:
                # the executable itself is fine — use it for this process,
                # only the on-disk dump failed (e.g. the x64 XLA:CPU case)
                _warn_once(f"serialize failed ({e!r}); executable kept in-process")
                _dbg(f"WRITE-FAIL {name} {key} {e!r}")
        _loaded[key] = comp
    else:
        _dbg(f"HIT-INPROC {name} {key}")
    return comp(*dyn)
