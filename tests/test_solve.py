"""Solver tests: analytic accuracy, dense output, gradients (FD on smooth
constant-step programs), FSAL/controller behaviour, while-vs-scan parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gncde_tpu.solve import (
    ODETerm,
    SaveAt,
    PIDController,
    ConstantStepSize,
    diffeqsolve,
)


def test_exponential_decay_accuracy():
    term = ODETerm(lambda t, y, args: -y)
    ts = jnp.linspace(0.0, 2.0, 21)
    sol = diffeqsolve(
        term, "tsit5", 0.0, 2.0, None, jnp.ones((3,)), saveat=SaveAt(ts=ts),
        stepsize_controller=PIDController(1e-6, 1e-9), max_steps=512,
    )
    assert bool(sol.success)
    np.testing.assert_allclose(sol.ys[:, 0], jnp.exp(-ts), atol=1e-5)


def test_harmonic_oscillator_dopri5():
    def vf(t, y, args):
        return jnp.stack([y[1], -y[0]])

    two_pi = 2 * np.pi
    sol = diffeqsolve(
        ODETerm(vf), "dopri5", 0.0, two_pi, None, jnp.array([1.0, 0.0]),
        stepsize_controller=PIDController(1e-6, 1e-9), max_steps=512,
    )
    np.testing.assert_allclose(sol.ys, jnp.array([1.0, 0.0]), atol=1e-4)


def test_constant_step_count_and_value():
    term = ODETerm(lambda t, y, args: -y)
    sol = diffeqsolve(
        term, "heun", 0.0, 1.0, 0.01, jnp.ones(()),
        stepsize_controller=ConstantStepSize(), max_steps=128,
    )
    assert int(sol.stats["num_accepted_steps"]) in (100, 101)
    np.testing.assert_allclose(sol.ys, jnp.exp(-1.0), atol=1e-4)


def test_nonautonomous_time_dependence():
    term = ODETerm(lambda t, y, args: jnp.cos(t) * jnp.ones_like(y))
    sol = diffeqsolve(
        term, "tsit5", 0.0, 1.5, None, jnp.zeros((2,)),
        stepsize_controller=PIDController(1e-7, 1e-10), max_steps=512,
    )
    np.testing.assert_allclose(sol.ys, jnp.sin(1.5), atol=1e-5)


def test_gradient_exact_on_smooth_problem():
    def loss(a):
        term = ODETerm(lambda t, y, args: -a * y)
        sol = diffeqsolve(
            term, "tsit5", 0.0, 1.0, 0.02, jnp.ones(()),
            stepsize_controller=ConstantStepSize(), max_steps=64,
        )
        return sol.ys

    a = jnp.array(0.7)
    g = jax.grad(loss)(a)
    eps = 1e-3
    fd = (loss(a + eps) - loss(a - eps)) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-3)
    np.testing.assert_allclose(g, -np.exp(-0.7), rtol=1e-3)


def test_adaptive_gradient_matches_constant():
    def make_loss(ctrl, dt0):
        def loss(a):
            term = ODETerm(lambda t, y, args: -a * y + 0.1 * jnp.sin(y))
            sol = diffeqsolve(
                term, "tsit5", 0.0, 1.0, dt0, jnp.ones(()),
                stepsize_controller=ctrl, max_steps=2048,
            )
            return sol.ys

        return loss

    a = jnp.array(0.9)
    g_const = jax.grad(make_loss(ConstantStepSize(), 1 / 1024))(a)
    g_pid = jax.grad(make_loss(PIDController(1e-8, 1e-11), None))(a)
    np.testing.assert_allclose(g_pid, g_const, rtol=1e-4)


def test_while_and_scan_paths_agree():
    term = ODETerm(lambda t, y, args: -y * jnp.cos(t))
    ts = jnp.linspace(0.0, 2.0, 7)
    kw = dict(
        saveat=SaveAt(ts=ts), stepsize_controller=PIDController(1e-5, 1e-8),
        max_steps=256,
    )
    s1 = diffeqsolve(ODETerm(term.vf), "tsit5", 0.0, 2.0, None, jnp.ones((2,)), **kw)
    s2 = diffeqsolve(
        ODETerm(term.vf), "tsit5", 0.0, 2.0, None, jnp.ones((2,)),
        adjoint="none", **kw,
    )
    np.testing.assert_allclose(s1.ys, s2.ys, atol=1e-7)
    assert int(s1.stats["num_accepted_steps"]) == int(s2.stats["num_accepted_steps"])


def test_vmap_over_irregular_times():
    term = ODETerm(lambda t, y, args: -y)
    ts_b = jnp.stack([jnp.linspace(0, 1, 9), jnp.linspace(0, 2, 9) ** 1.3 / 2])
    y0_b = jnp.ones((2, 3))

    def solve_one(ts, y0):
        return diffeqsolve(
            term, "tsit5", ts[0], ts[-1], None, y0, saveat=SaveAt(ts=ts),
            stepsize_controller=PIDController(1e-6, 1e-9), max_steps=256,
        ).ys

    ys = jax.vmap(solve_one)(ts_b, y0_b)
    for b in range(2):
        np.testing.assert_allclose(
            ys[b, :, 0], jnp.exp(-ts_b[b]), atol=1e-4
        )


def test_max_steps_budget_reports_failure():
    term = ODETerm(lambda t, y, args: -1000.0 * y)  # needs tiny steps
    sol = diffeqsolve(
        term, "tsit5", 0.0, 10.0, None, jnp.ones(()),
        stepsize_controller=PIDController(1e-10, 1e-12), max_steps=8,
    )
    assert not bool(sol.success)
