"""Auxiliary subsystems: checkpoint/resume, profiling, batched pipeline glue."""
import os

import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.config import load_of_method
from optical_flow_tpu.utils.checkpoint import FlowCheckpointer
from optical_flow_tpu.utils.profiling import StageTimer


def test_checkpointer_roundtrip(tmp_path, rng):
    ckpt = FlowCheckpointer(str(tmp_path))
    uv = rng.standard_normal((12, 14, 2)).astype(np.float32)
    ckpt.save(1, 3, uv)
    stage, level, back = ckpt.latest()
    assert (stage, level) == (1, 3)
    np.testing.assert_array_equal(back, uv)


def test_checkpoint_during_compute_flow(tmp_path, rng):
    im = rng.uniform(0, 255, (40, 44))
    im2 = np.roll(im, 1, axis=1)
    ope = load_of_method("hs-brightness")
    ope.median_filter_size = None  # no post-loop filtering after the last checkpoint
    ope.checkpoint = FlowCheckpointer(str(tmp_path))
    ope.images = jnp.stack([jnp.asarray(im), jnp.asarray(im2)], 2)
    uv = np.asarray(ope.compute_flow())
    stage, level, saved = ope.checkpoint.latest()
    assert level == 0  # finest level was checkpointed last
    np.testing.assert_allclose(saved, uv, atol=1e-5)


def test_warmup_precompiles_level_programs(rng):
    """warmup_classic_nl pre-compiles every program of a per-level run: a
    subsequent compute_flow (fuse=False path on CPU) reuses the jit caches
    and produces the normal result."""
    from optical_flow_tpu.utils.warmup import warmup_classic_nl

    H, W = 32, 36
    ope = load_of_method("classic+nl-fast")
    ope.display = False
    ope.color_images = None  # grayscale run: plain-median fallback
    warmup_classic_nl(ope, (H, W), color=False, max_workers=4)

    im = rng.uniform(0, 255, (H, W))
    ope.images = jnp.stack([jnp.asarray(im), jnp.asarray(np.roll(im, 1, axis=1))], 2)
    uv = np.asarray(ope.compute_flow())
    assert uv.shape == (H, W, 2)
    assert np.isfinite(uv).all()


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    totals = t.totals()
    assert set(totals) == {"a", "b"}
    assert "a" in t.report()


def test_aot_executable_cache(tmp_path):
    """OFTPU_AOT_CACHE round-trips a compiled monolith through disk.

    Kills the per-process compile tax (DESIGN §8): the serialized
    EXECUTABLE skips tracing, lowering and backend compilation on reload.
    The cache targets the single-chip serving process (it declines
    multi-device backends, e.g. this suite's 8 virtual devices), so the
    cold-write / warm-load runs happen in two single-device subprocesses;
    flows from both must be identical.
    """
    import subprocess
    import sys

    script = r"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys, numpy as np
sys.path.insert(0, "/root/repo")
from optical_flow_tpu.interface import estimate_flow
from optical_flow_tpu.utils import aotcache
rng = np.random.default_rng(0)
im1 = rng.integers(0, 256, (40, 44)).astype(np.float64)
im2 = np.roll(im1, 1, axis=1)
uv = np.asarray(estimate_flow(im1, im2, "hs-brightness", {"display": False, "fuse": True}))
assert aotcache._loaded, "cached_call did not engage"
np.save(sys.argv[1], uv)
"""
    import os

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["OFTPU_AOT_CACHE"] = str(tmp_path)
    env["JAX_PLATFORMS"] = "cpu"

    def run(out):
        subprocess.run(
            [sys.executable, "-c", script, out], env=env, check=True, timeout=300
        )

    run(str(tmp_path / "cold.npy"))
    files = list(tmp_path.glob("*.jaxexe"))
    assert len(files) == 1 and files[0].stat().st_size > 0
    mtime = files[0].stat().st_mtime_ns

    run(str(tmp_path / "warm.npy"))
    assert files[0].stat().st_mtime_ns == mtime  # loaded, not recompiled
    cold = np.load(tmp_path / "cold.npy")
    warm = np.load(tmp_path / "warm.npy")
    np.testing.assert_array_equal(warm, cold)
    assert cold.shape == (40, 44, 2) and np.isfinite(cold).all()


def test_ref_oracle_artifact_consistency():
    """The measured reference-oracle artifact (benchmarks/ref_oracle.py)
    must stay parseable and keep reproducing the independently-measured r2
    RubberWhale baseline (.ref_baseline_timing.txt: 2.46298/0.08025) — the
    sanity anchor that validates the whole 8-sequence oracle harness."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "results_ref_oracle.json",
    )
    with open(path) as f:
        oracle = json.load(f)
    rw = oracle["RubberWhale"]
    assert abs(rw["aae"] - 2.46298) < 1e-4
    assert abs(rw["aepe"] - 0.08025) < 1e-5
    seqs = {
        "RubberWhale", "Hydrangea", "Grove2", "Grove3",
        "Urban2", "Urban3", "Dimetrodon", "Venus",
    }
    assert seqs <= set(oracle)
    assert oracle["_provenance"]["method"] == "classic+nl-fast"


def test_ref_oracle_methods_artifact_consistency():
    """Per-method oracle artifact (hs / classic++ measured on all 8 GT
    sequences by running the reference) stays parseable and complete."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "results_ref_oracle_methods.json",
    )
    with open(path) as f:
        oracle = json.load(f)
    seqs = {
        "RubberWhale", "Hydrangea", "Grove2", "Grove3",
        "Urban2", "Urban3", "Dimetrodon", "Venus",
    }
    for method in ("hs", "classic++"):
        assert seqs <= set(oracle[method])
        assert oracle[method]["_mean"]["aae"] > 0


def test_committed_middlebury_artifacts_pass_oracle_gates():
    """Every committed per-method Middlebury artifact passes the
    per-(method, sequence) oracle gates (benchmarks/middlebury.py) — the
    r5 tightening (hs at the flagship's 0.01 px everywhere but the
    documented Urban2 fixed-point exception) must hold on the canonical
    runs, and stay holding."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "mb", os.path.join(repo, "benchmarks", "middlebury.py")
    )
    mb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mb)
    # per-sequence override table stays minimal: one documented exception
    assert set(mb.SEQ_GATES) == {("hs", "Urban2")}
    for fname, method in (
        ("results_middlebury.json", "classic+nl-fast"),
        ("results_middlebury_hs.json", "hs"),
        ("results_middlebury_ba.json", "ba"),
        ("results_middlebury_cpp.json", "classic++"),
        ("results_middlebury_nl.json", "classic+nl"),
    ):
        with open(os.path.join(repo, "benchmarks", fname)) as f:
            results = json.load(f)
        assert not mb.check_ref_oracle_gates(results, method), (
            f"{fname} fails the {method} oracle gates"
        )
