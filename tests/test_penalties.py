"""Robust penalty unit tests: known values, derivative consistency, parity."""
import numpy as np
import pytest

from optical_flow_tpu.ops.penalties import PENALTIES, Robust, robust

ALL_SPECS = [
    ("quadratic", (0.5,)),
    ("lorentzian", (0.3,)),
    ("charbonnier", (0.01,)),
    ("generalized_charbonnier", (0.01, 0.45)),
    ("geman_mcclure", (0.7,)),
    ("huber", (0.8,)),
    ("tukey", (1.2,)),
    ("gaussian", (0.9,)),
    ("tdist", (5.0, 0.1)),
    ("tdist_unnorm", (5.0, 0.1)),
]


@pytest.mark.parametrize("name,params", ALL_SPECS)
def test_numerical_vs_analytical_derivative(name, params):
    rf = Robust(name, params)
    x = np.linspace(-2.0, 2.0, 41)
    x = x[np.abs(np.abs(x) - getattr(np, "inf", 0)) > 0]  # keep all
    eps = 1e-6
    num = (np.asarray(rf.evaluate(x + eps)) - np.asarray(rf.evaluate(x - eps))) / (2 * eps)
    ana = np.asarray(rf.deriv(x))
    # huber/tukey have kinks; exclude points near their thresholds
    if name == "huber":
        keep = np.abs(np.abs(x) - params[0] ** 2) > 1e-3
    elif name == "tukey":
        keep = np.abs(np.abs(x) - params[0]) > 1e-3
    else:
        keep = np.ones_like(x, dtype=bool)
    np.testing.assert_allclose(num[keep], ana[keep], rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("name,params", ALL_SPECS)
def test_weight_is_deriv_over_x(name, params):
    rf = Robust(name, params)
    x = np.linspace(0.05, 2.0, 20)
    np.testing.assert_allclose(
        np.asarray(rf.deriv_over_x(x)), np.asarray(rf.deriv(x)) / x, rtol=1e-6
    )


@pytest.mark.parametrize("name,params", ALL_SPECS)
def test_symmetry(name, params):
    rf = Robust(name, params)
    x = np.linspace(0.1, 3.0, 10)
    np.testing.assert_allclose(
        np.asarray(rf.evaluate(x)), np.asarray(rf.evaluate(-x)), rtol=1e-12
    )


def test_tukey_saturation():
    rf = Robust("tukey", (1.0,))
    assert np.allclose(np.asarray(rf.evaluate(np.array([5.0, 100.0]))), 1.0 / 3.0)
    assert np.allclose(np.asarray(rf.deriv(np.array([5.0]))), 0.0)


def test_charbonnier_matlab_sigma2_scaling():
    # type 0 at x=0 must be sigma^2 (not sigma): rho(0) = sig2 * sqrt(1)
    rf = Robust("charbonnier", (0.1,))
    assert np.isclose(float(rf.evaluate(np.array(0.0))), 0.01)


def test_unknown_and_unimplemented():
    with pytest.raises(ValueError):
        Robust("nope", (1.0,))
    with pytest.raises(NotImplementedError):
        Robust("mixture", (1.0,))
    with pytest.raises(NotImplementedError):
        Robust("spline_penalty", (1.0,))


def test_robust_constructor_helper():
    rf = robust("charbonnier", 1e-3)
    assert rf.param == (1e-3,)
    assert robust("quadratic").param == (1.0,)


@pytest.mark.parametrize("name,params", ALL_SPECS)
@pytest.mark.parametrize("d_type", [0, 1, 2])
def test_parity_vs_reference(reference_pkg, name, params, d_type):
    """Machine-precision parity against the NumPy reference penalty table."""
    from optical_flow.robust import penalties as ref_pen

    x = np.linspace(-3.0, 3.0, 61)
    ref = getattr(ref_pen, name)(x, np.asarray(params), d_type)
    mine = np.asarray(PENALTIES[name](x, params, d_type))
    np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-12)
