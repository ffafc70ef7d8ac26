"""Differentiable ODE/CDE integration, TPU-native.

Replaces ``diffrax.diffeqsolve`` as used by every reference model
(src/models/graph_neural_cde.py:94-104, tgb_graph_neural_cde.py:143-162,
pgt_graph_neural_cde.py:110-130, ...). Design:

  * The whole solve is ONE XLA program: a ``lax.scan`` over a static step
    budget with done-masking (differentiable path, used in training), or a
    ``lax.while_loop`` with early exit (inference path). No data-dependent
    Python control flow.
  * Gradients flow by backprop-through-the-solver with sqrt-checkpointing:
    the scan is chunked and each chunk wrapped in ``jax.checkpoint``, giving
    O(sqrt(max_steps)) live residual states -- the scan analogue of diffrax's
    RecursiveCheckpointAdjoint default (reference passes no ``adjoint=``).
  * Step-size control matches diffrax's ``PIDController(rtol, atol)`` default
    coefficients (pcoeff=0, icoeff=1 => classic I-controller), with Hairer's
    initial-step heuristic when ``dt0=None`` (graph_neural_cde.py:86).
  * Dense output: accepted steps are Hermite-interpolated onto the requested
    ``SaveAt(ts=...)`` grid with a masked scatter -- save times never
    constrain step placement.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp

from .tableaus import ButcherTableau, get_tableau


# ---------------------------------------------------------------------------
# Public API dataclasses
# ---------------------------------------------------------------------------


class ODETerm:
    """Wraps a vector field ``vf(t, y, args) -> dy/dt``."""

    def __init__(self, vf):
        self.vf = vf

    def __call__(self, t, y, args):
        return self.vf(t, y, args)


@dataclasses.dataclass(frozen=True)
class SaveAt:
    ts: tp.Optional[jax.Array] = None
    t1: bool = False


@dataclasses.dataclass(frozen=True)
class PIDController:
    """Step-size controller, diffrax-compatible defaults (I-control:
    pcoeff=0, icoeff=1). Positive ``pcoeff`` enables the standard PI rule,
    which damps accept/reject oscillation on rough vector fields."""

    rtol: float = 1e-3
    atol: float = 1e-6
    safety: float = 0.9
    factormin: float = 0.2
    factormax: float = 10.0
    pcoeff: float = 0.0
    icoeff: float = 1.0
    # When solving under shard_map with the state sharded over a mesh axis,
    # the accept/reject decision must be GLOBAL: set ``axis_name`` and the
    # error norm is pmean'd across shards (SURVEY.md section 7.3 item 1).
    axis_name: tp.Optional[str] = None


@dataclasses.dataclass(frozen=True)
class ConstantStepSize:
    pass


@dataclasses.dataclass
class Solution:
    ts: tp.Optional[jax.Array]
    ys: jax.Array
    stats: tp.Dict[str, jax.Array]
    success: jax.Array


# ---------------------------------------------------------------------------
# RK stepping
# ---------------------------------------------------------------------------


def _implicit_stage(tab: ButcherTableau, vf, ti, pred, h, args, k0):
    """Solve the ESDIRK stage equation ``k = f(ti, pred + h*gamma*k)``.

    stage_solver="newton": matrix-free Newton-Krylov (diffrax's Kvaerno
    solvers use Newton too). Each Newton iteration linearises the stage map
    once (``jax.linearize`` -- one vf eval) and solves
    ``(I - h*gamma*J) delta = -g`` with a fixed-iteration GMRES whose
    operator is the JVP: no Jacobian is ever materialised, so the cost is
    O(newton_iters * krylov_iters) vf-JVPs regardless of state size --
    the only formulation that scales on TPU (a dense Jacobian over the
    (n, H) state would be (nH)^2).

    stage_solver="picard": fixed-point iteration; cheaper per step but it
    requires h*gamma*||J|| < 1, i.e. NOT genuinely stiff.
    """
    if tab.stage_solver == "picard":
        k = k0
        for _ in range(tab.picard_iters):
            k = vf(ti, pred + h * tab.a_diag * k, args)
        return k

    from jax.scipy.sparse.linalg import gmres

    hg = h * tab.a_diag
    k = k0
    for _ in range(tab.newton_iters):
        fval, jvp = jax.linearize(lambda kk: vf(ti, pred + hg * kk, args), k)
        g = k - fval

        def lin_op(v, jvp=jvp):
            return v - jvp(v)

        delta, _ = gmres(
            lin_op,
            -g,
            x0=jnp.zeros_like(g),
            restart=tab.krylov_iters,
            maxiter=1,
            solve_method="batched",
        )
        k = k + delta
    return k


def _rk_step(tab: ButcherTableau, vf, t, y, h, args, f0):
    """One RK step (explicit or ESDIRK). Returns (y1, err, f1) with FSAL
    reuse of f0. Implicit stages are solved by :func:`_implicit_stage`.

    Explicit FSAL steps first offer the whole step to the vector field's
    ``fused_rk_step`` hook (one Pallas kernel per step when the megakernel
    serves the vf -- ops/pallas/fused_step.py); a None return falls through
    to the per-stage loop below."""
    if tab.fsal and not tab.implicit:
        inner = getattr(vf, "vf", vf)  # unwrap ODETerm; bare vfs pass through
        hook = getattr(inner, "fused_rk_step", None)
        if hook is not None:
            fused = hook(tab, t, y, h, args, f0)
            if fused is not None:
                return fused
    ks = []
    for i in range(tab.num_stages):
        if i == 0:
            ki = f0
        elif tab.implicit:
            acc = None
            for j, aij in enumerate(tab.a[i]):
                if aij == 0.0:
                    continue
                term = aij * ks[j]
                acc = term if acc is None else acc + term
            pred = y if acc is None else y + h * acc
            ti = t + tab.c[i] * h
            # Warm start from the previous stage.
            ki = _implicit_stage(tab, vf, ti, pred, h, args, ks[-1])
        else:
            acc = None
            for j, aij in enumerate(tab.a[i]):
                if aij == 0.0:
                    continue
                term = aij * ks[j]
                acc = term if acc is None else acc + term
            yi = y if acc is None else y + h * acc
            ki = vf(t + tab.c[i] * h, yi, args)
        ks.append(ki)

    acc = None
    for i, bi in enumerate(tab.b):
        if bi == 0.0:
            continue
        term = bi * ks[i]
        acc = term if acc is None else acc + term
    y1 = y + h * acc

    if tab.b_err:
        eacc = None
        for i, bi in enumerate(tab.b_err):
            if bi == 0.0:
                continue
            term = bi * ks[i]
            eacc = term if eacc is None else eacc + term
        err = h * eacc
    else:
        err = jnp.zeros_like(y)

    if tab.fsal:
        f1 = ks[-1]
    else:
        f1 = vf(t + h, y1, args)
    return y1, err, f1


def _hermite_eval(theta, h, y0, f0, y1, f1):
    """Cubic Hermite dense output on one step; theta in [0,1], broadcastable."""
    t2 = theta * theta
    t3 = t2 * theta
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + theta
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    return h00 * y0 + h10 * h * f0 + h01 * y1 + h11 * h * f1


def _initial_step(vf, t0, y0, args, f0, rtol, atol, error_order, axis_name=None):
    """Hairer-Norsett-Wanner automatic initial step size."""

    def _norm(x):
        m = jnp.mean(x**2)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        return jnp.sqrt(m)

    scale = atol + rtol * jnp.abs(y0)
    d0 = _norm(y0 / scale)
    d1 = _norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = vf(t0 + h0, y1, args)
    d2 = _norm((f1 - f0) / scale) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / dmax) ** (1.0 / error_order),
    )
    return jnp.minimum(100.0 * h0, h1)


# ---------------------------------------------------------------------------
# Main driver
# ---------------------------------------------------------------------------


def _chunk_sizes(max_steps: int) -> tp.Tuple[int, int]:
    inner = max(1, int(math.ceil(math.sqrt(max_steps))))
    outer = int(math.ceil(max_steps / inner))
    return outer, inner


def diffeqsolve(
    terms: ODETerm,
    solver: tp.Union[str, ButcherTableau],
    t0,
    t1,
    dt0,
    y0: jax.Array,
    args=None,
    stepsize_controller=None,
    saveat: tp.Optional[SaveAt] = None,
    max_steps: int = 1024,
    adjoint: str = "checkpointed",
    jump_ts: tp.Optional[jax.Array] = None,
) -> Solution:
    """Integrate ``dy/dt = vf(t, y, args)`` from t0 to t1.

    adjoint: "checkpointed" (differentiable bounded scan with
    sqrt-checkpointing -- O(sqrt(max_steps)) memory, ~1x forward replay in
    the backward), "full" (differentiable, NO rematerialisation: XLA stores
    every step's residuals -- trades O(max_steps * state) HBM for skipping
    the replay; the right choice when the state fits, e.g. the flagship
    dyn config), or "none" (while_loop with early exit; faster for
    inference, not differentiable).

    jump_ts: optional sorted knot times where the vector field loses
    smoothness (e.g. control-path interpolation knots). Steps are clamped to
    end exactly on the next knot, which removes the error-estimate blowups
    (and the resulting reject storms) that otherwise occur when an RK step
    straddles a derivative kink -- the control path's spline knots are the
    dominant rejection source for GNCDE workloads.
    """
    if adjoint not in ("checkpointed", "full", "none"):
        raise ValueError(
            f"adjoint must be 'checkpointed', 'full' or 'none'; got {adjoint!r}"
        )
    tab = get_tableau(solver)
    vf = terms.vf if isinstance(terms, ODETerm) else terms
    if stepsize_controller is None:
        stepsize_controller = PIDController()
    if saveat is None:
        saveat = SaveAt(t1=True)
    adaptive = isinstance(stepsize_controller, PIDController)

    dtype = jnp.result_type(y0.dtype, jnp.float32)
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    y0 = jnp.asarray(y0)

    f0 = vf(t0, y0, args)

    if adaptive:
        ctrl: PIDController = stepsize_controller
        if dt0 is None:
            h_init = jax.lax.stop_gradient(
                _initial_step(
                    vf, t0, y0, args, f0, ctrl.rtol, ctrl.atol,
                    tab.error_order, ctrl.axis_name,
                )
            )
        else:
            h_init = jnp.asarray(dt0, dtype)
    else:
        if dt0 is None:
            raise ValueError("ConstantStepSize requires dt0")
        h_init = jnp.asarray(dt0, dtype)

    if saveat.ts is not None:
        ts_save = jnp.asarray(saveat.ts, dtype)
    else:
        ts_save = t1[None]
    n_save = ts_save.shape[0]

    # Initial save fill: any save time at/before t0 gets y0.
    init_mask = ts_save <= t0
    ys_buf = jnp.where(
        init_mask.reshape((-1,) + (1,) * y0.ndim), y0[None], jnp.zeros((n_save,) + y0.shape, y0.dtype)
    )

    def step_core(core):
        """One attempt; returns (new_core, aux) with aux carrying the
        interval endpoints needed for dense output."""
        t, y, f, h, n_acc, n_rej, just_rejected, prev_inv = core
        done = t >= t1
        h_clip = jnp.minimum(h, t1 - t)
        if jump_ts is not None:
            # Clamp the step to the next knot strictly after t (with a small
            # relative margin so landing on a knot doesn't re-clamp to it).
            margin = 1e-6 * jnp.maximum(jnp.abs(t), 1.0)
            nxt = jnp.searchsorted(jump_ts, t + margin, side="left")
            nxt = jnp.clip(nxt, 0, jump_ts.shape[0] - 1)
            next_knot = jnp.where(
                jump_ts[nxt] > t + margin, jump_ts[nxt], t1
            )
            knot_h = next_knot - t
            knot_clamped = knot_h < h_clip
            h_clip = jnp.minimum(h_clip, knot_h)
        else:
            knot_clamped = jnp.asarray(False)
        h_clip = jnp.maximum(h_clip, jnp.asarray(0.0, dtype))
        # When done, take a dummy tiny step (results discarded by masking).
        h_eff = jnp.where(done, jnp.asarray(1.0, dtype), h_clip)

        y1, err, f1 = _rk_step(tab, vf, t, y, h_eff, args, f)

        if adaptive:
            # Controller decisions are detached: step placement only moves the
            # solution within tolerance, so gradients through accept/reject
            # and dt adaptation are pure noise amplifiers (they otherwise
            # compound multiplicatively across steps).
            scale = ctrl.atol + ctrl.rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            mean_sq = jnp.mean((err / scale) ** 2)
            if ctrl.axis_name is not None:
                mean_sq = jax.lax.pmean(mean_sq, ctrl.axis_name)
            err_ratio = jax.lax.stop_gradient(jnp.sqrt(mean_sq))
            finite = jnp.isfinite(err_ratio)
            accept = (err_ratio <= 1.0) & finite
            inv = jnp.where(err_ratio == 0.0, jnp.inf, 1.0 / err_ratio)
            k_exp = 1.0 / tab.error_order
            raw = ctrl.safety * inv ** (ctrl.icoeff * k_exp)
            if ctrl.pcoeff != 0.0:
                raw = raw * (inv / prev_inv) ** (ctrl.pcoeff * k_exp)
            factor = jnp.clip(raw, ctrl.factormin, ctrl.factormax)
            factor = jnp.where(finite, factor, ctrl.factormin)
            # Hairer anti-thrash rule: no step growth immediately after a
            # rejection (prevents accept/reject oscillation at factormax).
            factor = jnp.where(just_rejected, jnp.minimum(factor, 1.0), factor)
            # When the step was shortened only to land on a knot, the clamp
            # carries no error signal: base the next size on the controller's
            # unclamped h so knots don't collapse the step size.
            h_base = jnp.where(knot_clamped, h, h_eff)
            h_next = h_base * factor
        else:
            accept = jnp.asarray(True)
            h_next = h

        h_next = jax.lax.stop_gradient(h_next)
        accept = accept & ~done
        # Snap the final step onto t1 exactly (avoids 1-ulp float stalls).
        is_last = h >= (t1 - t)
        t_new = jnp.where(accept, jnp.where(is_last, t1, t + h_eff), t)
        y_new = jnp.where(accept, y1, y)
        # FSAL reuse across knots is exact for C^0 vector fields (cubic
        # Hermite control paths are C^1, so A and dA are continuous at knots;
        # only higher derivatives jump -- which is what the clamping fixes).
        f_new = jnp.where(accept, f1, f)
        h_new = jnp.where(done, h, h_next)

        rejected_now = (~accept) & ~done
        n_acc = n_acc + accept.astype(jnp.int32)
        n_rej = n_rej + rejected_now.astype(jnp.int32)
        just_rejected_new = jnp.where(done, just_rejected, rejected_now)
        if adaptive:
            prev_inv_new = jnp.where(
                done, prev_inv, jnp.clip(inv, 1e-10, 1e10)
            )
        else:
            prev_inv_new = prev_inv
        new_core = (t_new, y_new, f_new, h_new, n_acc, n_rej,
                    just_rejected_new, prev_inv_new)
        aux = (t, h_eff, y, f, y1, f1, accept, t_new)
        return new_core, aux

    def buffered_step(carry):
        """While-loop variant: masked-scatter save points into a buffer."""
        core, ys = carry
        new_core, aux = step_core(core)
        t, h_eff, y, f, y1, f1, accept, t_new = aux
        theta = (ts_save - t) / h_eff
        smask = (ts_save > t) & (ts_save <= t_new) & accept
        theta_b = theta.reshape((-1,) + (1,) * y.ndim)
        y_interp = _hermite_eval(theta_b, h_eff, y[None], f[None], y1[None], f1[None])
        ys_new = jnp.where(smask.reshape((-1,) + (1,) * y.ndim), y_interp, ys)
        return (new_core, ys_new)

    core0 = (
        t0,
        y0,
        f0,
        h_init,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(1.0, dtype),
    )

    hist = None
    if adjoint == "none":
        def cond(carry):
            core = carry[0]
            t, n_acc, n_rej = core[0], core[4], core[5]
            return (t < t1) & (n_acc + n_rej < max_steps)

        core, ys = jax.lax.while_loop(cond, buffered_step, (core0, ys_buf))
    else:
        # Differentiable path: record a tiny (t, y, f) step history and
        # interpolate the save grid in ONE post-pass -- per-iteration
        # traffic is O(state) instead of O(n_save * state) (the buffered
        # scatter dominates training cost for dense SaveAt grids).
        outer, inner = _chunk_sizes(max_steps)
        collect = saveat.ts is not None
        maybe_ckpt = jax.checkpoint if adjoint == "checkpointed" else (lambda f: f)

        @maybe_ckpt
        def chunk(core):
            def body(c, _):
                new_c, aux = step_core(c)
                if collect:
                    t_new = aux[7]
                    out = (t_new, new_c[1], new_c[2])  # (t, y, f) after step
                else:
                    out = None
                return new_c, out

            return jax.lax.scan(body, core, None, length=inner)

        def outer_body(c, _):
            return chunk(c)

        core, outs = jax.lax.scan(outer_body, core0, None, length=outer)

        if collect:
            # outs: (outer, inner, ...) -> (S, ...)
            t_hist, y_hist, f_hist = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), outs
            )
            t_hist = jnp.concatenate([t0[None], t_hist], axis=0)
            y_hist = jnp.concatenate([y0[None], y_hist], axis=0)
            f_hist = jnp.concatenate([f0[None], f_hist], axis=0)
            j = jnp.clip(
                jnp.searchsorted(t_hist, ts_save, side="left"),
                1, t_hist.shape[0] - 1,
            )
            t_s, t_e = t_hist[j - 1], t_hist[j]
            seg_h = t_e - t_s
            theta = jnp.where(seg_h > 0, (ts_save - t_s) / jnp.where(seg_h > 0, seg_h, 1.0), 0.0)
            shape_b = (-1,) + (1,) * y0.ndim
            ys = _hermite_eval(
                theta.reshape(shape_b),
                seg_h.reshape(shape_b),
                y_hist[j - 1],
                f_hist[j - 1],
                y_hist[j],
                f_hist[j],
            )
        else:
            ys = core[1][None]

    t_fin, y_fin = core[0], core[1]
    n_acc, n_rej = core[4], core[5]
    success = t_fin >= t1

    if saveat.ts is None:
        ys_out = ys[0]
    else:
        ys_out = ys
    stats = {"num_accepted_steps": n_acc, "num_rejected_steps": n_rej}
    return Solution(ts=saveat.ts, ys=ys_out, stats=stats, success=success)
