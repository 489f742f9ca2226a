"""Pallas TPU kernels, verified in interpreter mode against the XLA paths."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _fresh_compile_state():
    """Interpret-mode kernel compiles are large (K2 unrolled slices); with a
    full suite's worth of live executables XLA:CPU's next big compile can
    abort the process (same issue test_parallel.py works around).  Start
    these tests from a clean compilation cache."""
    jax.clear_caches()
    yield

from optical_flow_tpu.ops.pallas.rof_kernel import rof_structure_2d_pallas
from optical_flow_tpu.ops.pallas.wmedian_kernel import wmedian_pallas, wmedian_pallas_ok
from optical_flow_tpu.ops.rof import rof_structure_2d
from optical_flow_tpu.ops.wmedian import denoise_color_weighted_medfilt2


def test_rof_kernel_matches_xla(rng):
    im = jnp.asarray(rng.uniform(-1, 1, (33, 47)), jnp.float32)
    ref = np.asarray(rof_structure_2d(im))
    out = np.asarray(rof_structure_2d_pallas(im, 1.0 / 8, 100, True))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_rof_tiled_kernel_matches_xla(rng):
    """Overlap-and-discard tiled ROF (the 4K 'auto' kernel) is bit-exact.

    Sizes span multiple tiles in both dims with non-divisible remainders,
    so tile-interior, tile-boundary, true-edge, and pad-region paths are
    all exercised (interpret mode; bit-exact on hardware too — measured
    max|diff| 0.0 at 4K on the v5e, 56 ms vs 159 ms per channel).
    """
    from optical_flow_tpu.ops.pallas.rof_kernel import rof_structure_2d_tiled

    im = jnp.asarray(rng.uniform(-1, 1, (300, 600)), jnp.float32)
    ref = np.asarray(jax.jit(lambda x: rof_structure_2d(x, 1.0 / 8, 40))(im))
    out = np.asarray(rof_structure_2d_tiled(im, 1.0 / 8, 40, True))
    np.testing.assert_array_equal(out, ref)

    with pytest.raises(ValueError, match="halo"):
        rof_structure_2d_tiled(im, 1.0 / 8, 200, True)


@pytest.mark.parametrize("shape,hsz,C", [((19, 23), 3, 3), ((40, 300), 7, 3), ((16, 260), 2, 1)])
def test_wmedian_kernel_bit_exact(rng, shape, hsz, C):
    """The bit-bisection selection must match sort+cumsum+searchsorted exactly."""
    H, W = shape
    uv = (3 * rng.standard_normal((H, W, 2))).astype(np.float32)
    color = rng.uniform(0, 255, (H, W, C)).astype(np.float32)
    occ = rng.uniform(0.1, 1.0, (H, W)).astype(np.float32)

    ref = np.asarray(
        denoise_color_weighted_medfilt2(
            jnp.asarray(uv), jnp.asarray(color), jnp.asarray(occ), hsz, [5, 5], 7.0
        )
    )
    u_pad = jnp.pad(uv[:, :, 0], hsz, mode="reflect")
    v_pad = jnp.pad(uv[:, :, 1], hsz, mode="reflect")
    occ_pad = jnp.pad(occ, hsz, mode="reflect")
    cmaj = jnp.transpose(
        jnp.pad(color, ((hsz, hsz), (hsz, hsz), (0, 0)), mode="reflect"), (2, 0, 1)
    )
    out = np.asarray(
        wmedian_pallas(u_pad, v_pad, occ_pad, cmaj, (H, W), hsz, 7.0, True)
    )
    np.testing.assert_array_equal(out, ref)


def test_wmedian_kernel_duplicate_values(rng):
    """Mirror padding creates exact duplicates — selection must still match."""
    H, W, hsz = 12, 140, 4
    uv = np.round(rng.standard_normal((H, W, 2)) * 4) / 4  # many ties
    uv = uv.astype(np.float32)
    color = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    occ = rng.uniform(0.1, 1.0, (H, W)).astype(np.float32)
    ref = np.asarray(
        denoise_color_weighted_medfilt2(
            jnp.asarray(uv), jnp.asarray(color), jnp.asarray(occ), hsz, [5, 5], 7.0
        )
    )
    u_pad = jnp.pad(uv[:, :, 0], hsz, mode="reflect")
    v_pad = jnp.pad(uv[:, :, 1], hsz, mode="reflect")
    occ_pad = jnp.pad(occ, hsz, mode="reflect")
    cmaj = jnp.transpose(
        jnp.pad(color, ((hsz, hsz), (hsz, hsz), (0, 0)), mode="reflect"), (2, 0, 1)
    )
    out = np.asarray(
        wmedian_pallas(u_pad, v_pad, occ_pad, cmaj, (H, W), hsz, 7.0, True)
    )
    np.testing.assert_array_equal(out, ref)


def test_wmedian_guard():
    assert wmedian_pallas_ok(388, 584, 7, 3)
    assert wmedian_pallas_ok(2160, 3840, 7, 3)  # 4K: DMA windows scale to any size
    assert not wmedian_pallas_ok(100, 100, 15, 3)  # window exceeds static config


def _random_system(rng, H, W):
    from optical_flow_tpu.ops.stencil import FlowSystem

    def f32(*s):
        return jnp.asarray(rng.uniform(0.1, 1.0, s), jnp.float32)

    wu_h = f32(H, W).at[:, -1].set(0)
    wu_v = f32(H, W).at[-1, :].set(0)
    wv_h = f32(H, W).at[:, -1].set(0)
    wv_v = f32(H, W).at[-1, :].set(0)
    return FlowSystem(
        f32(H, W) + 1.0, 0.5 * f32(H, W), f32(H, W) + 1.0,
        wu_h, wu_v, wv_h, wv_v, f32(H, W), f32(H, W),
    )


def test_cg_kernel_matches_xla_pcg(rng):
    """The VMEM-resident whole-PCG kernel solves the same system to the
    same tolerance as the XLA while_loop (reduction order may differ, so
    compare solutions, tightly)."""
    from optical_flow_tpu.ops.pallas.cg_kernel import cg_solve_pallas
    from optical_flow_tpu.ops.stencil import system_apply, system_diag, system_rhs
    from optical_flow_tpu.solvers.cg import pcg_solve

    sysm = _random_system(rng, 30, 132)  # non-multiple of (8, 128)
    b = system_rhs(sysm)
    x_ref = np.asarray(
        pcg_solve(lambda y: system_apply(sysm, y), b, system_diag(sysm),
                  1e-7, 1000, a12=sysm.a12)
    )
    x_k = np.asarray(cg_solve_pallas(sysm, 1e-7, 1000, interpret=True))
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(x_k, x_ref, atol=1e-5 * max(scale, 1.0))
    # residual actually below tolerance
    r = np.asarray(system_apply(sysm, jnp.asarray(x_k))) - np.asarray(b)
    assert np.linalg.norm(r) <= 1e-6 * np.linalg.norm(np.asarray(b)) * 10


def test_cg_kernel_vmap_batched(rng):
    """vmap routes through the custom batching rule (leading batch GRID
    axis); each batch element converges independently."""
    import jax

    from optical_flow_tpu.ops.stencil import FlowSystem
    from optical_flow_tpu.ops.pallas.cg_kernel import cg_solve_pallas

    B, H, W = 3, 24, 40
    systems = [_random_system(rng, H, W) for _ in range(B)]
    batched = FlowSystem(*[jnp.stack([getattr(s, f) for s in systems])
                           for f in FlowSystem._fields])
    singles = [np.asarray(cg_solve_pallas(s, 1e-6, 400, interpret=True)) for s in systems]
    out = np.asarray(
        jax.jit(jax.vmap(lambda s: cg_solve_pallas(s, 1e-6, 400, interpret=True)))(batched)
    )
    for b in range(B):
        np.testing.assert_allclose(out[b], singles[b], atol=1e-5)


def test_wmedian_kernel_vmap_batched(rng):
    """vmap of the kernel routes through the custom batching rule (leading
    batch GRID axis — a vmapped ANY-space pallas_call cannot lower on TPU)
    and must equal the per-pair results bit-exactly."""
    import jax

    H, W, hsz, C, B = 40, 56, 7, 3, 3
    Hp, Wp = H + 2 * hsz, W + 2 * hsz
    u = rng.standard_normal((B, Hp, Wp)).astype(np.float32)
    v = rng.standard_normal((B, Hp, Wp)).astype(np.float32)
    occ = rng.uniform(0.1, 1.0, (B, Hp, Wp)).astype(np.float32)
    col = rng.uniform(0, 255, (B, C, Hp, Wp)).astype(np.float32)

    singles = [
        np.asarray(wmedian_pallas(u[b], v[b], occ[b], col[b], (H, W), hsz, 7.0, True))
        for b in range(B)
    ]
    batched = np.asarray(
        jax.jit(
            jax.vmap(lambda a, b_, c, d: wmedian_pallas(a, b_, c, d, (H, W), hsz, 7.0, True))
        )(u, v, occ, col)
    )
    for b in range(B):
        np.testing.assert_array_equal(batched[b], singles[b])
