"""Benchmark: permutation-equivariant vector-field evaluation throughput.

Measures edges/s/chip of the hot kernel (the equivariant fused message-
passing stack evaluated inside the CDE solver loop, SURVEY.md section 3.5)
at the reference workload scale (n=400, L=3), comparing:

  * tpu_native -- this framework's TPU fast path: slim adjacency control
    (implicit time channel, half the coefficient gathers; see
    gncde_tpu.interp.MatrixControl) in bf16 + XLA-fused dense basis operator
    with bf16 operands / f32 accumulation (~3e-3 relative error, safe at the
    reference's rtol=1e-3 training tolerance).
  * reference  -- a faithful implementation of the reference's algorithm on
    the SAME hardware: full [time, value]-channel control path evaluated for
    both value and derivative each step (perm_equiv_graph_vector_field.py:
    97-102) + the dense 8-term fusion (layers.py:102-160).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` = reference_time / tpu_native_time (>1 => faster). The
``extras`` key carries the secondary metrics from BASELINE.md's list:
adaptive-solver steps/s (Tsit5+PID on the flagship shape, counted from
sol.stats), an end-to-end training-step time, and a scaled-n (n=2048, bf16,
dense-XLA fallback regime) vf-eval point where the MXU rather than HBM is
the story. ``extras.baseline_from_cache`` is true -- and a warning goes to
stderr -- iff the reference-path measurement failed and the ratio uses the
cached same-chip timing.
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: first-run compiles over the TPU tunnel are
# minutes; cached reruns are seconds.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import jax.random as jr

from gncde_tpu import ops as gncde_ops
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.ops.equiv_basis import fusion_matrix_dense
from gncde_tpu.interp import (
    backward_hermite_coefficients,
    CubicInterpolation,
    MatrixControl,
)

N_NODES = 400
BATCH = 16
HIDDEN = 32
LAYERS = 3
T_KNOTS = 12
EVALS_PER_RUN = 50  # vf evals chained per timed run (scan)
RUNS = 20


def build():
    key = jr.PRNGKey(0)
    k_vf, k_A, k_y = jr.split(key, 3)
    vf = PermEquivGraphVectorField(
        input_dim=HIDDEN, hidden_dim=HIDDEN, output_dim=HIDDEN,
        num_layers=LAYERS, data_embed_dim=1, num_nodes=N_NODES, key=k_vf,
    )
    ts = jnp.linspace(0.0, 1.0, T_KNOTS)
    A_path = jr.uniform(k_A, (BATCH, T_KNOTS, N_NODES, N_NODES)) * 0.1
    t_idx = jnp.broadcast_to(
        ts[None, :, None, None], (BATCH, T_KNOTS, N_NODES, N_NODES)
    )
    X = jnp.stack([t_idx, A_path], axis=-1)
    coeffs = jax.vmap(lambda x: backward_hermite_coefficients(ts, x))(X)
    y0 = jr.normal(k_y, (BATCH, N_NODES, HIDDEN)) * 0.1
    return vf, ts, coeffs, y0


def slim_coeffs(coeffs):
    """Value-channel bf16 Hermite stacks -- the layout the data layer hands
    the trainers (interp.MatrixControl; one-time prep, NOT per-eval work, so
    it happens outside the timed runners)."""
    return jax.tree_util.tree_map(
        lambda c: c[..., -1].astype(jnp.bfloat16), coeffs
    )


def reference_vf(vf, t, y, ctrl):
    """Reference-faithful evaluation: both channels of the control evaluated,
    dense fused operator materialised, explicit time-gradient scaling."""
    adj = ctrl.evaluate(t)[..., -1]
    deriv = ctrl.derivative(t)
    dadj = deriv[..., -1]
    feats = y
    for i, layer in enumerate(vf.gnn_layers):
        fused = fusion_matrix_dense(adj, dadj, layer.params)
        feats = layer.conv_layer(feats, fused)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    t_gradient = jnp.mean(deriv[..., 0], axis=0)
    return t_gradient[:, None] * feats


def make_runner(vf, ts, coeffs, mode):
    """``coeffs``: slim bf16 stacks for tpu_native (prepared once by
    :func:`slim_coeffs`, as the data layer does), full 2-channel stacks for
    the reference mode (whose algorithm evaluates both channels)."""
    eval_ts = jnp.linspace(0.01, 0.99, EVALS_PER_RUN)

    def one_traj(coeffs_i, y0_i):
        if mode == "tpu_native":
            ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i))
        else:
            ctrl = CubicInterpolation(ts, coeffs_i)

        def body(y, t):
            if mode == "tpu_native":
                out = vf(t, y, ctrl)
            else:
                out = reference_vf(vf, t, y, ctrl)
            return y + 1e-3 * out, None

        y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
        return y_fin

    @jax.jit
    def run(coeffs_b, y0_b):
        return jax.vmap(one_traj)(coeffs_b, y0_b)

    return run


def time_runner(run, coeffs, y0):
    out = run(coeffs, y0)
    out.block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(RUNS):
        out = run(coeffs, y0)
    out.block_until_ready()
    return (time.perf_counter() - t0) / RUNS


BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")


def solver_steps_per_s(vf, ts, coeffs, y0):
    """Adaptive Tsit5+PID solve on the flagship shape; steps/s from
    sol.stats (actual accepted+rejected step counts, SURVEY.md section 7.3
    item 7)."""
    from gncde_tpu.solve import ODETerm, PIDController, SaveAt, diffeqsolve

    term = ODETerm(vf)

    def solve_one(coeffs_i, y0_i):
        ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i))
        sol = diffeqsolve(
            term, "Tsit5", t0=ts[0], t1=ts[-1], dt0=None, y0=y0_i,
            args=ctrl, stepsize_controller=PIDController(rtol=1e-3, atol=1e-6),
            saveat=SaveAt(t1=True), max_steps=256,
        )
        return sol.ys, sol.stats["num_accepted_steps"] + sol.stats["num_rejected_steps"]

    run = jax.jit(lambda c, y: jax.vmap(solve_one)(c, y))
    ys, steps = run(coeffs, y0)
    ys.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        ys, steps = run(coeffs, y0)
    ys.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    total_steps = float(jnp.sum(steps))
    return total_steps / dt, dt


def train_step_time(vf, ts, coeffs, y0, adjoint="checkpointed",
                    max_steps=256, reds=None, reps=3):
    """One jitted value_and_grad + sgd-update step through the full
    adaptive solve, batch-vmapped. ``adjoint``: "checkpointed" (sqrt
    memory) or "full" (store-all -- skips the backward's forward replay;
    the faster choice when max_steps * state fits HBM, as at the
    flagship shape). ``reds``: per-trajectory PlaneReductions for the
    tiled (n > 640) regime."""
    from gncde_tpu.nn import apply_updates, filter_value_and_grad
    from gncde_tpu.solve import ODETerm, PIDController, SaveAt, diffeqsolve

    def loss_fn(model, coeffs_b, y0_b):
        term = ODETerm(model)

        def solve_one(coeffs_i, y0_i, red_i):
            ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i), red=red_i)
            sol = diffeqsolve(
                term, "Tsit5", t0=ts[0], t1=ts[-1], dt0=None, y0=y0_i,
                args=ctrl,
                stepsize_controller=PIDController(rtol=1e-3, atol=1e-6),
                saveat=SaveAt(t1=True), max_steps=max_steps, adjoint=adjoint,
            )
            return sol.ys

        if reds is None:
            ys = jax.vmap(lambda c, y: solve_one(c, y, None))(coeffs_b, y0_b)
        else:
            ys = jax.vmap(solve_one)(coeffs_b, y0_b, reds)
        return jnp.mean(ys**2)

    @jax.jit
    def step(model, coeffs_b, y0_b):
        loss, grads = filter_value_and_grad(loss_fn)(model, coeffs_b, y0_b)
        updates = jax.tree_util.tree_map(
            lambda g: None if g is None else -1e-3 * g, grads,
            is_leaf=lambda x: x is None,
        )
        return loss, apply_updates(model, updates)

    loss, m = step(vf, coeffs, y0)
    loss.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, m = step(vf, coeffs, y0)
    loss.block_until_ready()
    return (time.perf_counter() - t0) / reps


def scaled_n_edges_per_s(n=2048, B=2, evals=20, directed=False):
    """vf-eval throughput above MEGAKERNEL_MAX_N: exercises the tiled Pallas
    grid kernel (ops/pallas/tiled.py) through the production dispatch, with
    the per-trajectory reduction cache a real solve would carry. n=2048 is
    the scaling stress point; (n=1505, directed) matches the reference's
    largest graph, tgbn-genre (configs/tgb/genre/st_gncde_config.yaml)."""
    from gncde_tpu.models.vector_fields import PermEquivDirGraphVectorField
    from gncde_tpu.ops.pallas import tiled

    key = jr.PRNGKey(1)
    k_vf, k_A, k_y = jr.split(key, 3)
    cls = PermEquivDirGraphVectorField if directed else PermEquivGraphVectorField
    vf = cls(
        input_dim=HIDDEN, hidden_dim=HIDDEN, output_dim=HIDDEN,
        num_layers=LAYERS, data_embed_dim=1, num_nodes=n, idx_dim=4, key=k_vf,
    )
    ts = jnp.linspace(0.0, 1.0, 6)
    A_path = jr.uniform(k_A, (B, 6, n, n)) * 0.1
    coeffs = jax.vmap(
        lambda x: tuple(
            c.astype(jnp.bfloat16) for c in backward_hermite_coefficients(ts, x)
        )
    )(A_path)
    y0 = jr.normal(k_y, (B, n, HIDDEN)) * 0.1
    eval_ts = jnp.linspace(0.01, 0.99, evals)

    def one(coeffs_i, y0_i):
        ctrl = MatrixControl(
            CubicInterpolation(ts, coeffs_i),
            red=tiled.cubic_plane_reductions(coeffs_i),
        )

        def body(y, t):
            return y + 1e-3 * vf(t, y, ctrl), None

        y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
        return y_fin

    run = jax.jit(lambda c, y: jax.vmap(one)(c, y))
    out = run(coeffs, y0)
    out.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = run(coeffs, y0)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return n * n * B * LAYERS * evals / dt, dt / (B * evals)


def tiled_regime_train(n=1505, B=2, directed=True, max_steps=64):
    """TRAINING numbers in the tiled regime (n > MEGAKERNEL_MAX_N): a full
    value_and_grad step through the adaptive solve at the tgbn-genre graph
    size (n=1505, directed 11-term basis, reference
    configs/tgb/genre/st_gncde_config.yaml:30-35) -- the backward here is
    the tiled fused VJP (ops/pallas/tiled.py: ONE merged plane sweep per
    layer producing dM + the c_row/c_col cotangents, _bwd2_call) + XLA for
    norm/linear/rank-1 terms.
    Returns (fwd_solve_s, grad_step_s) so the fwd/bwd split is published.
    """
    from gncde_tpu.models.vector_fields import (
        PermEquivDirGraphVectorField, PermEquivGraphVectorField,
    )
    from gncde_tpu.ops.pallas import tiled
    from gncde_tpu.solve import ODETerm, PIDController, SaveAt, diffeqsolve

    key = jr.PRNGKey(2)
    k_vf, k_A, k_y = jr.split(key, 3)
    cls = PermEquivDirGraphVectorField if directed else PermEquivGraphVectorField
    vf = cls(
        input_dim=HIDDEN, hidden_dim=HIDDEN, output_dim=HIDDEN,
        num_layers=LAYERS, data_embed_dim=1, num_nodes=n, idx_dim=4, key=k_vf,
    )
    ts = jnp.linspace(0.0, 1.0, 6)
    A_path = jr.uniform(k_A, (B, 6, n, n)) * 0.1
    coeffs = jax.vmap(
        lambda x: tuple(
            c.astype(jnp.bfloat16) for c in backward_hermite_coefficients(ts, x)
        )
    )(A_path)
    reds = jax.vmap(tiled.cubic_plane_reductions)(coeffs)
    y0 = jr.normal(k_y, (B, n, HIDDEN)) * 0.1

    # Forward-only solve.
    term = ODETerm(vf)

    def solve_one(coeffs_i, y0_i, red_i):
        ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i), red=red_i)
        sol = diffeqsolve(
            term, "Tsit5", t0=ts[0], t1=ts[-1], dt0=None, y0=y0_i,
            args=ctrl, stepsize_controller=PIDController(rtol=1e-3, atol=1e-6),
            saveat=SaveAt(t1=True), max_steps=max_steps,
        )
        return sol.ys

    fwd = jax.jit(lambda c, y, r: jax.vmap(solve_one)(c, y, r))
    out = fwd(coeffs, y0, reds)
    out.block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = fwd(coeffs, y0, reds)
    out.block_until_ready()
    fwd_s = (time.perf_counter() - t0) / reps

    step_s = train_step_time(vf, ts, coeffs, y0, adjoint="checkpointed",
                             max_steps=max_steps, reds=reds)
    # Full (store-all) adjoint in the tiled regime (VERDICT r4 item 4).
    # Memory: store-all keeps every stage's saved residuals for max_steps
    # steps -- at n=1505 that's ~max_steps * 6 * 9.4 MB of bf16 planes per
    # element, so B=2 x 64 steps blows HBM (measured RESOURCE_EXHAUSTED).
    # Published at B=1, max_steps=32 (the adaptive solve takes < 32 steps
    # at this tolerance); errors are recorded, never clobber step_s.
    try:
        coeffs1 = jax.tree_util.tree_map(lambda c: c[:1], coeffs)
        reds1 = jax.tree_util.tree_map(lambda r: r[:1], reds)
        step_full_s = train_step_time(
            vf, ts, coeffs1, y0[:1], adjoint="full", max_steps=32,
            reds=reds1)
        # Apples-to-apples checkpointed companion at the same (B=1, 32).
        step_ck1_s = train_step_time(
            vf, ts, coeffs1, y0[:1], adjoint="checkpointed", max_steps=32,
            reds=reds1)
    except Exception as exc:  # noqa: BLE001
        step_full_s = exc
        step_ck1_s = None
    return fwd_s, step_s, (step_full_s, step_ck1_s)


# v5e HBM bandwidth (speed-of-light reference for the roofline fractions;
# the vf-eval workload is bandwidth-bound, BASELINE.md).
HBM_BW = 819e9


def roofline_frac(bytes_per_eval: float, secs_per_eval: float) -> float:
    """Fraction of the HBM roofline the measured path sustains."""
    return (bytes_per_eval / secs_per_eval) / HBM_BW


def megakernel_bytes_per_eval(n: int) -> float:
    """Fixed traffic budget for the n<=640 vf eval: 3 passes x 4 bf16
    planes (24 n^2 bytes) -- what the round-2/3 implementation HAD to move
    (XLA dynamic-slice read + copy write + kernel read of the copies).

    Round 4's batch-grid kernel (megakernel._forward_batched) DMAs the
    interval planes in-kernel, so the path now actually moves only ONE
    pass (8 n^2). The metric keeps the 24 n^2 budget so the fraction is
    comparable across rounds: values above the old ceiling reflect the
    eliminated copy traffic, not >100% bandwidth. The honest absolute
    number is ``extras.per_eval_us_n400`` (the kernel is VPU-bound at this
    shape, not HBM-bound: one pass of the planes is ~1.6 us at
    speed-of-light vs ~6.5 us measured compute).
    """
    return 3 * 4 * n * n * 2  # 3 passes x 4 planes x bf16 (round-3 budget)


def tiled_bytes_per_eval(n: int, layers: int = LAYERS) -> float:
    """HBM bytes one tiled-path vf eval moves (n > 640, ops/pallas/tiled.py).

    Per eval: slice-copy the 4 bf16 planes (16n^2 r+w), materialise bf16
    A(t)/dA(t) once (read 8n^2, write 4n^2), then each of L layer kernels
    re-reads the 2 planes (4n^2 each).
    """
    return (16 + 8 + 4 + 4 * layers) * n * n


def main():
    vf, ts, coeffs, y0 = build()
    slim = slim_coeffs(coeffs)

    gncde_ops.set_fusion_precision("bf16")
    native_run = make_runner(vf, ts, slim, "tpu_native")
    native_t = time_runner(native_run, slim, y0)

    # The reference-algorithm baseline compiles for minutes cold; once
    # measured on this chip its time is cached so later (possibly
    # time-boxed) runs still report a true same-hardware ratio.
    baseline_from_cache = False
    try:
        ref_run = make_runner(vf, ts, coeffs, "reference")
        ref_t = time_runner(ref_run, coeffs, y0)
        a = native_run(slim, y0)
        b = ref_run(coeffs, y0)
        rel_dev = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        assert rel_dev < 2e-2, f"native/reference mismatch: {rel_dev}"
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"ref_time_s": ref_t, "device": str(jax.devices()[0])}, f)
    except Exception as exc:  # noqa: BLE001 - fall back to the cached measurement
        import sys

        baseline_from_cache = True
        print(
            f"WARNING: reference baseline measurement failed ({exc!r}); "
            f"vs_baseline uses the cached same-chip timing from "
            f"{BASELINE_CACHE}",
            file=sys.stderr,
        )
        with open(BASELINE_CACHE) as f:
            ref_t = json.load(f)["ref_time_s"]

    extras = {"baseline_from_cache": baseline_from_cache}
    try:
        steps_per_s, solve_t = solver_steps_per_s(vf, ts, slim, y0)
        extras["solver_steps_per_s"] = steps_per_s
        extras["adaptive_solve_s"] = solve_t
    except Exception as exc:  # noqa: BLE001
        extras["solver_steps_per_s_error"] = repr(exc)
    try:
        extras["train_step_s"] = train_step_time(vf, ts, slim, y0)
    except Exception as exc:  # noqa: BLE001
        extras["train_step_s_error"] = repr(exc)
    try:
        extras["train_step_full_adjoint_s"] = train_step_time(
            vf, ts, slim, y0, adjoint="full"
        )
    except Exception as exc:  # noqa: BLE001
        extras["train_step_full_adjoint_error"] = repr(exc)
    try:
        scaled_eps, scaled_secs = scaled_n_edges_per_s()
        extras["scaled_n2048_edges_per_s"] = scaled_eps
        extras["hbm_roofline_frac_n2048"] = roofline_frac(
            tiled_bytes_per_eval(2048), scaled_secs
        )
    except Exception as exc:  # noqa: BLE001
        extras["scaled_n2048_error"] = repr(exc)

    try:
        fwd1505, step1505, (step1505_full, step1505_ck1) = tiled_regime_train(
            n=1505, directed=True)
        extras["tiled_fwd_solve_n1505_s"] = fwd1505
        extras["train_step_n1505_s"] = step1505
        if isinstance(step1505_full, Exception):
            extras["train_step_n1505_full_adjoint_error"] = repr(
                step1505_full)
        else:
            extras["train_step_n1505_full_adjoint_b1_s"] = step1505_full
            extras["train_step_n1505_checkpointed_b1_s"] = step1505_ck1
    except Exception as exc:  # noqa: BLE001
        extras["train_step_n1505_error"] = repr(exc)

    edges = N_NODES * N_NODES * BATCH * LAYERS * EVALS_PER_RUN
    edges_per_s = edges / native_t
    extras["per_eval_us_n400"] = native_t / (BATCH * EVALS_PER_RUN) * 1e6
    extras["hbm_roofline_frac_n400"] = roofline_frac(
        megakernel_bytes_per_eval(N_NODES),
        native_t / (BATCH * EVALS_PER_RUN),
    )
    print(
        json.dumps(
            {
                "metric": "vf_eval_edges_per_s_per_chip",
                "value": edges_per_s,
                "unit": "edges/s",
                "vs_baseline": ref_t / native_t,
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
