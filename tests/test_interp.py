"""Interpolation-path tests: knot exactness, derivative consistency,
NaN-filling, and agreement with an independent numpy Hermite oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from gncde_tpu.interp import (
    LinearInterpolation,
    CubicInterpolation,
    linear_interpolation,
    backward_hermite_coefficients,
    fill_nan_linear,
)


def _path(ts, ys, kind):
    if kind == "linear":
        return LinearInterpolation(ts, linear_interpolation(ts, ys))
    return CubicInterpolation(ts, backward_hermite_coefficients(ts, ys))


@pytest.mark.parametrize("kind", ["linear", "cubic"])
def test_knot_exactness(kind):
    ts = jnp.array([0.0, 0.3, 1.1, 1.7, 2.5])
    ys = jnp.sin(ts)[:, None] * jnp.array([[1.0, -2.0, 0.5]])
    path = _path(ts, ys, kind)
    for i, t in enumerate(ts[:-1]):
        np.testing.assert_allclose(path.evaluate(t), ys[i], atol=1e-6)
    np.testing.assert_allclose(path.evaluate(ts[-1]), ys[-1], atol=1e-5)


def test_linear_derivative_is_slope():
    ts = jnp.array([0.0, 1.0, 3.0])
    ys = jnp.array([[0.0], [2.0], [4.0]])
    path = _path(ts, ys, "linear")
    np.testing.assert_allclose(path.derivative(0.5), jnp.array([2.0]), atol=1e-6)
    np.testing.assert_allclose(path.derivative(2.0), jnp.array([1.0]), atol=1e-6)


def test_cubic_linear_function_reproduced_exactly():
    """Hermite interp of a linear function (the time channel!) is exact with
    derivative identically 1 -- the property the vf's t_gradient relies on."""
    ts = jnp.array([0.0, 0.4, 0.9, 2.0, 2.2])
    ys = (3.0 * ts + 1.0)[:, None]
    path = _path(ts, ys, "cubic")
    for t in [0.0, 0.1, 0.65, 1.5, 2.1]:
        np.testing.assert_allclose(path.evaluate(t), 3.0 * t + 1.0, atol=1e-5)
        np.testing.assert_allclose(path.derivative(t), 3.0, atol=1e-5)


def test_cubic_derivative_matches_fd():
    ts = jnp.linspace(0.0, 2.0, 9)
    ys = jnp.cos(2 * ts)[:, None]
    path = _path(ts, ys, "cubic")
    for t in [0.31, 0.77, 1.213, 1.9]:
        eps = 1e-4
        fd = (path.evaluate(t + eps) - path.evaluate(t - eps)) / (2 * eps)
        np.testing.assert_allclose(path.derivative(t), fd, atol=1e-3)


def test_cubic_continuity_at_knots():
    ts = jnp.array([0.0, 0.5, 1.0, 1.8])
    ys = jnp.array([[0.0], [1.0], [-0.5], [2.0]])
    path = _path(ts, ys, "cubic")
    eps = 1e-5
    for t in ts[1:-1]:
        left = path.evaluate(t - eps)
        right = path.evaluate(t + eps)
        np.testing.assert_allclose(left, right, atol=1e-3)


def test_fill_nan_linear():
    ts = jnp.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = jnp.array([1.0, jnp.nan, jnp.nan, 4.0, jnp.nan])[:, None]
    filled = fill_nan_linear(ts, ys)
    np.testing.assert_allclose(
        filled[:, 0], jnp.array([1.0, 2.0, 3.0, 4.0, 4.0]), atol=1e-6
    )


def test_backward_hermite_numpy_oracle():
    """Independent numpy implementation of backward-difference Hermite."""
    rng = np.random.default_rng(0)
    ts = np.sort(rng.uniform(0, 1, 7))
    ts[0] = 0.0
    ys = rng.normal(size=(7, 2))

    d, c, b, a = backward_hermite_coefficients(jnp.array(ts), jnp.array(ys))
    # numpy oracle
    h = np.diff(ts)[:, None]
    slope = np.diff(ys, axis=0) / h
    f = np.concatenate([slope[:1], slope], axis=0)
    f0, f1 = f[:-1], f[1:]
    np.testing.assert_allclose(a, ys[:-1], atol=1e-6)
    np.testing.assert_allclose(b, f0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(c, (3 * slope - 2 * f0 - f1) / h, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(d, (f0 + f1 - 2 * slope) / h**2, rtol=1e-4, atol=1e-2)
