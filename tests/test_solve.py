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


def test_dopri8_convergence_order():
    """Fixed-step Dopri8 on a nonlinear scalar ODE: observed order >= 7
    validates the scipy-sourced DOP853 tableau (tableaus._build_dopri8)."""
    # y' = y * cos(t), y(0)=1 -> y(t) = exp(sin(t)); exercises nonlinear
    # order conditions, not just quadrature. f64: order 8 hits the f32
    # noise floor at any usable h.
    jax.config.update("jax_enable_x64", True)
    try:
        term = ODETerm(lambda t, y, args: y * jnp.cos(t))
        t1 = 2.0
        exact = float(np.exp(np.sin(t1)))
        errs = []
        hs = [0.25, 0.125]
        for h in hs:
            sol = diffeqsolve(
                term, "Dopri8", 0.0, t1, h, jnp.ones((1,), jnp.float64),
                stepsize_controller=ConstantStepSize(),
                max_steps=int(t1 / h) + 1,
            )
            errs.append(abs(float(sol.ys[0]) - exact))
        order = np.log2(errs[0] / max(errs[1], 1e-18))
        assert order > 6.5, (errs, order)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_dopri8_adaptive_matches_tsit5():
    term = ODETerm(lambda t, y, args: -0.7 * y + jnp.sin(3.0 * t))
    ts = jnp.linspace(0.0, 3.0, 7)
    kw = dict(saveat=SaveAt(ts=ts), max_steps=512,
              stepsize_controller=PIDController(1e-7, 1e-9))
    a = diffeqsolve(term, "Dopri8", 0.0, 3.0, None, jnp.ones((2,)), **kw)
    b = diffeqsolve(term, "Tsit5", 0.0, 3.0, None, jnp.ones((2,)), **kw)
    assert bool(a.success) and bool(b.success)
    np.testing.assert_allclose(np.asarray(a.ys), np.asarray(b.ys), atol=2e-4)


def test_kvaerno3_newton_handles_stiff_decay():
    """lambda = -2000 over h*|lambda| >> 1 territory: Picard diverges unless
    steps collapse; the Newton-Krylov stage solver (solve._implicit_stage)
    integrates it accurately."""
    lam = -2000.0
    term = ODETerm(lambda t, y, args: lam * (y - jnp.cos(t)) - jnp.sin(t))
    t1 = 1.0
    ts = jnp.linspace(0.0, t1, 5)
    sol = diffeqsolve(
        term, "Kvaerno3", 0.0, t1, None, jnp.ones((1,)),
        saveat=SaveAt(ts=ts), max_steps=512,
        stepsize_controller=PIDController(1e-5, 1e-8),
    )
    assert bool(sol.success)
    # Solution relaxes to cos(t) within a boundary layer.
    np.testing.assert_allclose(
        np.asarray(sol.ys[1:, 0]), np.cos(np.asarray(ts[1:])), atol=2e-3
    )
    # The stiff regime must not require thousands of micro-steps: Newton
    # takes it in far fewer than the explicit stability bound h < 2/|lam|
    # (~1000 steps) would force.
    assert int(sol.stats["num_accepted_steps"]) < 200


def test_kvaerno3_newton_matches_picard_nonstiff():
    term = ODETerm(lambda t, y, args: -y + jnp.sin(2.0 * t))
    ts = jnp.linspace(0.0, 2.0, 5)
    kw = dict(saveat=SaveAt(ts=ts), max_steps=512,
              stepsize_controller=PIDController(1e-6, 1e-9))
    a = diffeqsolve(term, "Kvaerno3", 0.0, 2.0, None, jnp.ones((2,)), **kw)
    b = diffeqsolve(term, "Kvaerno3Picard", 0.0, 2.0, None, jnp.ones((2,)), **kw)
    np.testing.assert_allclose(np.asarray(a.ys), np.asarray(b.ys), atol=1e-4)


def test_kvaerno3_newton_differentiable():
    lam = -50.0

    def run(scale):
        term = ODETerm(lambda t, y, args: lam * y * scale)
        sol = diffeqsolve(
            term, "Kvaerno3", 0.0, 0.1, 0.01, jnp.ones((1,)),
            stepsize_controller=ConstantStepSize(), max_steps=16,
        )
        return sol.ys[0].sum()

    g = jax.grad(run)(1.0)
    # d/ds exp(lam*s*t) at s=1 = lam*t*exp(lam*t)
    expect = lam * 0.1 * np.exp(lam * 0.1)
    np.testing.assert_allclose(float(g), expect, rtol=5e-2)


def _full_A(tab):
    """Dense stage matrix including the ESDIRK diagonal."""
    s = tab.num_stages
    A = np.zeros((s, s))
    for i in range(s):
        A[i, : len(tab.a[i])] = tab.a[i]
        if tab.implicit and i >= 1:
            A[i, i] = tab.a_diag
    return A


def test_kencarp4_order_conditions():
    """Every Butcher order condition through order 4 for the propagating
    weights, order 3 for the embedded weights, plus row-sum consistency and
    L-stability -- a transcription error in any KENCARP4 coefficient fails
    here."""
    from gncde_tpu.solve.tableaus import KENCARP4 as tab

    A = _full_A(tab)
    b = np.asarray(tab.b)
    c = np.asarray(tab.c)
    np.testing.assert_allclose(A.sum(1), c, atol=1e-14)  # stage consistency
    one = np.ones_like(c)
    # Order 1..4 conditions (Hairer-Norsett-Wanner II, table 3.1).
    np.testing.assert_allclose(b @ one, 1.0, atol=1e-14)
    np.testing.assert_allclose(b @ c, 1 / 2, atol=1e-14)
    np.testing.assert_allclose(b @ c**2, 1 / 3, atol=1e-14)
    np.testing.assert_allclose(b @ (A @ c), 1 / 6, atol=1e-14)
    np.testing.assert_allclose(b @ c**3, 1 / 4, atol=1e-14)
    np.testing.assert_allclose(b @ (c * (A @ c)), 1 / 8, atol=1e-14)
    np.testing.assert_allclose(b @ (A @ c**2), 1 / 12, atol=1e-14)
    np.testing.assert_allclose(b @ (A @ (A @ c)), 1 / 24, atol=1e-14)
    # Stiffly accurate: last row of A equals b.
    np.testing.assert_allclose(A[-1], b, atol=1e-14)
    # Embedded order 3.
    bh = b - np.asarray(tab.b_err)
    np.testing.assert_allclose(bh @ one, 1.0, atol=1e-12)
    np.testing.assert_allclose(bh @ c, 1 / 2, atol=1e-12)
    np.testing.assert_allclose(bh @ c**2, 1 / 3, atol=1e-12)
    np.testing.assert_allclose(bh @ (A @ c), 1 / 6, atol=1e-12)
    # ...and not order 4 (otherwise the error estimate would be useless).
    assert abs(bh @ c**3 - 1 / 4) > 1e-6
    # L-stability: R(z) = 1 + z b (I - zA)^-1 1 -> 0 as z -> -inf.
    for z in (-1e3, -1e6, -1e9):
        R = 1 + z * b @ np.linalg.solve(np.eye(len(c)) - z * A, one)
        assert abs(R) < 10 / abs(z), (z, R)


def test_kencarp4_convergence_order():
    """Fixed-step observed order ~4 on a smooth nonlinear problem (f64).
    (On strongly stiff problems ESDIRK methods of stage order 2 show the
    classical order reduction to ~3; design order is measured nonstiff.)"""
    jax.config.update("jax_enable_x64", True)
    try:
        term = ODETerm(lambda t, y, args: y * jnp.cos(t))
        t1 = 2.0
        exact = float(np.exp(np.sin(t1)))
        errs = []
        for h in (0.1, 0.05):
            sol = diffeqsolve(
                term, "KenCarp4", 0.0, t1, h, jnp.ones((1,), jnp.float64),
                stepsize_controller=ConstantStepSize(),
                max_steps=int(t1 / h) + 1,
            )
            errs.append(abs(float(sol.ys[0]) - exact))
        order = np.log2(errs[0] / max(errs[1], 1e-18))
        assert order > 3.6, (errs, order)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_kencarp4_stiff_decay_accuracy():
    """Adaptive KenCarp4 on the lam=-2000 relaxation problem: accurate in
    few steps (L-stability + Newton stages doing their job)."""
    lam = -2000.0
    term = ODETerm(lambda t, y, args: lam * (y - jnp.cos(t)) - jnp.sin(t))
    ts = jnp.linspace(0.0, 1.0, 5)
    sol = diffeqsolve(
        term, "KenCarp4", 0.0, 1.0, None, jnp.ones((1,)),
        saveat=SaveAt(ts=ts), max_steps=512,
        stepsize_controller=PIDController(1e-5, 1e-8),
    )
    assert bool(sol.success)
    np.testing.assert_allclose(
        np.asarray(sol.ys[1:, 0]), np.cos(np.asarray(ts[1:])), atol=2e-3
    )
    assert int(sol.stats["num_accepted_steps"]) < 200


def _check_tree_conditions(A, b, c, order, atol):
    """All rooted-tree order conditions through ``order`` (HNW II,
    table 3.1 enumeration through order 5)."""
    Ac = A @ c
    conds = [(b @ np.ones_like(c), 1.0)]
    if order >= 2:
        conds.append((b @ c, 1 / 2))
    if order >= 3:
        conds += [(b @ c**2, 1 / 3), (b @ Ac, 1 / 6)]
    if order >= 4:
        conds += [
            (b @ c**3, 1 / 4),
            (b @ (c * Ac), 1 / 8),
            (b @ (A @ c**2), 1 / 12),
            (b @ (A @ Ac), 1 / 24),
        ]
    if order >= 5:
        conds += [
            (b @ c**4, 1 / 5),
            (b @ (c**2 * Ac), 1 / 10),
            (b @ (Ac * Ac), 1 / 20),
            (b @ (c * (A @ c**2)), 1 / 15),
            (b @ (c * (A @ Ac)), 1 / 30),
            (b @ (A @ c**3), 1 / 20),
            (b @ (A @ (c * Ac)), 1 / 40),
            (b @ (A @ (A @ c**2)), 1 / 60),
            (b @ (A @ (A @ Ac)), 1 / 120),
        ]
    for got, want in conds:
        np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("name,order", [("Kvaerno4", 4), ("Kvaerno5", 5)])
def test_kvaerno45_order_conditions(name, order):
    """The derived Kvaerno-class ESDIRKs (tools/derive_esdirk.py) satisfy
    every rooted-tree condition through their design order, the embedded
    weights through order-1 (and provably NOT the design order), stiff
    accuracy, A-stability on the imaginary axis, and exact L-stability."""
    from gncde_tpu.solve.tableaus import get_tableau

    tab = get_tableau(name)
    assert tab.order == order and tab.implicit
    A = _full_A(tab)
    b = np.asarray(tab.b)
    c = np.asarray(tab.c)
    np.testing.assert_allclose(A.sum(1), c, atol=1e-12)
    _check_tree_conditions(A, b, c, order, atol=1e-12)
    # Stiffly accurate; first stage explicit; constant implicit diagonal.
    np.testing.assert_allclose(A[-1], b, atol=1e-14)
    assert A[0, 0] == 0.0
    np.testing.assert_allclose(np.diag(A)[1:], tab.a_diag, atol=1e-14)
    # Embedded = the penultimate stage's own (stiffly-accurate) solution.
    bh = b - np.asarray(tab.b_err)
    np.testing.assert_allclose(bh[: len(c) - 2], A[-2, : len(c) - 2], atol=1e-12)
    _check_tree_conditions(A, bh, c, order - 1, atol=1e-10)
    assert abs(bh @ c ** (order - 1) - 1 / order) > 1e-3  # not design order
    # A-stability (|R(iy)| <= 1) and L-stability (R -> 0 along -inf).
    s = len(c)
    one = np.ones(s)
    for y in np.logspace(-2, 6, 60):
        R = 1 + 1j * y * (b @ np.linalg.solve(np.eye(s) - 1j * y * A, one))
        assert abs(R) <= 1 + 1e-9, (y, abs(R))
    # L-stability, exactly: for a stiffly-accurate ESDIRK with explicit
    # first stage, R(inf) = -(A22^{-1} a1)_s (tools/derive_esdirk.py
    # derivation, validated there against KenCarp4).  Also check the 1/z
    # decay at moderate z where f64 roundoff doesn't floor the solve
    # (at z=-1e9 the resolvent solve itself carries ~1e-7 noise).
    r_inf = -np.linalg.solve(A[1:, 1:], A[1:, 0])[-1]
    assert abs(r_inf) < 1e-12, r_inf
    for z in (-1e3, -1e6):
        R = 1 + z * (b @ np.linalg.solve(np.eye(s) - z * A, one))
        assert abs(R) < 100 / abs(z), (z, R)


@pytest.mark.parametrize("name,order,hs", [("Kvaerno4", 4, (0.1, 0.05)), ("Kvaerno5", 5, (0.2, 0.1))])
def test_kvaerno45_convergence_order(name, order, hs):
    """Fixed-step observed convergence matches the design order (f64)."""
    jax.config.update("jax_enable_x64", True)
    try:
        term = ODETerm(lambda t, y, args: y * jnp.cos(t))
        t1 = 2.0
        exact = float(np.exp(np.sin(t1)))
        errs = []
        for h in hs:
            sol = diffeqsolve(
                term, name, 0.0, t1, h, jnp.ones((1,), jnp.float64),
                stepsize_controller=ConstantStepSize(),
                max_steps=int(t1 / h) + 1,
            )
            errs.append(abs(float(sol.ys[0]) - exact))
        observed = np.log2(errs[0] / max(errs[1], 1e-18))
        assert observed > order - 0.5, (errs, observed)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_kvaerno5_stiff_decay_accuracy():
    """Adaptive Kvaerno5 on the lam=-2000 relaxation problem: L-stability +
    Newton stages solve it accurately in few steps."""
    lam = -2000.0
    term = ODETerm(lambda t, y, args: lam * (y - jnp.cos(t)) - jnp.sin(t))
    ts = jnp.linspace(0.0, 1.0, 5)
    sol = diffeqsolve(
        term, "Kvaerno5", 0.0, 1.0, None, jnp.ones((1,)),
        saveat=SaveAt(ts=ts), max_steps=512,
        stepsize_controller=PIDController(1e-5, 1e-8),
    )
    assert bool(sol.success)
    np.testing.assert_allclose(
        np.asarray(sol.ys[1:, 0]), np.cos(np.asarray(ts[1:])), atol=2e-3
    )
    assert int(sol.stats["num_accepted_steps"]) < 200


def test_full_adjoint_matches_checkpointed():
    """adjoint="full" (store-all, no remat) returns the same solution and
    the same gradients as the sqrt-checkpointed adjoint."""
    ts = jnp.linspace(0.0, 1.0, 5)

    def make_loss(adjoint):
        def loss(a):
            term = ODETerm(lambda t, y, args: -a * y + 0.1 * jnp.sin(y + t))
            sol = diffeqsolve(
                term, "tsit5", 0.0, 1.0, None, jnp.ones((3,)),
                saveat=SaveAt(ts=ts),
                stepsize_controller=PIDController(1e-5, 1e-8),
                max_steps=128, adjoint=adjoint,
            )
            return jnp.sum(sol.ys ** 2)

        return loss

    a = jnp.array(0.8)
    v_ck, g_ck = jax.value_and_grad(make_loss("checkpointed"))(a)
    v_fl, g_fl = jax.value_and_grad(make_loss("full"))(a)
    np.testing.assert_allclose(v_fl, v_ck, rtol=1e-6)
    np.testing.assert_allclose(g_fl, g_ck, rtol=1e-6)
