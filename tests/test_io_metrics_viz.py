"""I/O round-trips, metrics, colorwheel, and compat conversions."""
import os

import numpy as np
import pytest

from optical_flow_tpu.evaluation.metrics import flow_angular_error
from optical_flow_tpu.io.flo import read_flo, write_flo
from optical_flow_tpu.utils.compat import rgb2gray, rgb2lab, scale_image
from optical_flow_tpu.viz.flow_color import compute_color, flow_to_color, make_colorwheel


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((12, 17, 2)).astype(np.float32)
    path = os.path.join(tmp_path, "test.flo")
    write_flo(flow, path)
    back = read_flo(path)
    np.testing.assert_array_equal(back, flow)


def test_flo_invalid_magic(tmp_path):
    path = os.path.join(tmp_path, "bad.flo")
    with open(path, "wb") as f:
        np.array([1.0], dtype=np.float32).tofile(f)
        np.array([4, 4], dtype=np.int32).tofile(f)
        np.zeros(32, dtype=np.float32).tofile(f)
    with pytest.raises(ValueError):
        read_flo(path)


def test_flo_bad_shape(tmp_path):
    with pytest.raises(ValueError):
        write_flo(np.zeros((4, 4, 3)), os.path.join(tmp_path, "x.flo"))


def test_metrics_zero_error():
    u = np.ones((8, 8))
    v = -np.ones((8, 8))
    aae, std, aepe = flow_angular_error(u, v, u, v)
    assert aae == pytest.approx(0.0, abs=1e-6)
    assert aepe == pytest.approx(0.0, abs=1e-12)


def test_metrics_epe_euclidean():
    tu = np.zeros((4, 4))
    tv = np.zeros((4, 4))
    u = np.full((4, 4), 3.0)
    v = np.full((4, 4), 4.0)
    _, _, aepe = flow_angular_error(tu, tv, u, v)
    assert aepe == pytest.approx(5.0)


def test_metrics_unknown_filtering():
    tu = np.zeros((4, 4))
    tv = np.zeros((4, 4))
    tu[0, 0] = 1e10  # unknown marker
    u = np.zeros((4, 4))
    u[0, 0] = 100.0
    aae, _, aepe = flow_angular_error(tu, tv, u, np.zeros((4, 4)))
    assert aepe == pytest.approx(0.0, abs=1e-12)


def test_metrics_parity(reference_pkg, rng):
    from optical_flow.evaluation.metrics import flow_angular_error as ref_metric

    tu, tv = rng.standard_normal((2, 10, 12))
    u, v = tu + 0.1 * rng.standard_normal((10, 12)), tv + 0.1 * rng.standard_normal((10, 12))
    ref = ref_metric(tu, tv, u, v, 2)
    mine = flow_angular_error(tu, tv, u, v, 2)
    np.testing.assert_allclose(mine, ref, rtol=1e-12)


def test_colorwheel_parity(reference_pkg):
    from optical_flow.viz.flow_color import make_colorwheel as ref_wheel

    np.testing.assert_array_equal(make_colorwheel(), ref_wheel())
    assert make_colorwheel().shape == (55, 3)


def test_flow_to_color_parity(reference_pkg, rng):
    from optical_flow.viz.flow_color import flow_to_color as ref_f2c

    flow = 3.0 * rng.standard_normal((16, 16, 2))
    flow[0, 0] = 1e10  # unknown
    np.testing.assert_array_equal(flow_to_color(flow), ref_f2c(flow))
    np.testing.assert_array_equal(
        flow_to_color(flow, max_flow=2.0), ref_f2c(flow, max_flow=2.0)
    )


def test_plot_flow_styles(rng):
    from optical_flow_tpu.viz.plot_flow import plot_flow

    uv = rng.standard_normal((12, 12, 2))
    for style in ("color", "quiver", "magnitude", "hsv"):
        ax = plot_flow(uv, style=style)
        assert ax is not None
    with pytest.raises(ValueError):
        plot_flow(uv, style="bogus")


def test_rgb2gray_parity(reference_pkg, rng):
    from optical_flow.interface import _rgb2gray as ref_g

    im = rng.uniform(0, 255, (10, 11, 3))
    np.testing.assert_allclose(np.asarray(rgb2gray(im)), ref_g(im), atol=1e-10)


def test_rgb2lab_parity(reference_pkg, rng):
    from optical_flow.interface import _rgb2lab as ref_lab

    im = rng.uniform(0, 255, (10, 11, 3))
    np.testing.assert_allclose(np.asarray(rgb2lab(im)), ref_lab(im), rtol=1e-9, atol=1e-9)


def test_scale_image_parity(reference_pkg, rng):
    from optical_flow.utils.image_processing import scale_image as ref_scale

    im = rng.standard_normal((8, 9))
    np.testing.assert_allclose(
        np.asarray(scale_image(im, 0, 255)), ref_scale(im, 0, 255), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(scale_image(im, -1, 1, -5, 5)), ref_scale(im, -1, 1, -5, 5), rtol=1e-12
    )
    const = np.full((4, 4), 3.0)
    np.testing.assert_allclose(np.asarray(scale_image(const, 0, 10)), 5.0)
