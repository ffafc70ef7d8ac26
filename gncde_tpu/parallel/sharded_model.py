"""Node-sharded GNCDE forward: the full adaptive solve under shard_map.

The whole ``diffeqsolve`` runs INSIDE shard_map with state and control-path
coefficients row-sharded over the ``graph`` mesh axis:

  * each device interpolates only its row slab of A(t)/dA(t) (coefficients
    are row-sharded, so the per-step coefficient gathers are local),
  * the vf stack exchanges boundary features per evaluation
    (parallel/sharded_ops.py: all_gather + psum_scatter + psums),
  * the PID accept/reject decision is made GLOBAL by a pmean'd error norm
    (SURVEY.md section 7.3 hard-part 1) -- every shard takes identical
    steps, so the replicated solver control flow stays consistent.

This is the explicit-collectives path for graphs too large for one chip; the
GSPMD path (train/sharded.py) covers the batch-parallel regime.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..interp import CubicInterpolation, LinearInterpolation
from ..interp.sparse_paths import SparseCubicMatrixPath, SparseLinearMatrixPath
from ..solve import ODETerm, SaveAt, PIDController, diffeqsolve
from .sharded_ops import sharded_sparse_vf_stack, sharded_vf_stack


def make_sharded_gncde_solve(
    mesh: Mesh,
    vf,
    interpolation: str = "cubic",
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 512,
    axis_name: str = "graph",
    backend: str = "xla",
    tile: tp.Optional[int] = None,
    plane_dtype=None,
    halo: tp.Optional[int] = None,
):
    """Build a jitted node-sharded CDE solve.

    Returns ``f(ts, coeffs_slim, y0) -> ys`` where coeffs_slim is the slim
    (value-channel) coefficient tuple, each (T-1, n, n), y0 is (n, H), and
    ys is (T, n, H) -- all carried with row-sharded layouts over ``mesh``.

    ``backend="pallas"`` runs each device's slab products through the tiled
    Pallas pair kernel (sharded_ops._pallas_slab_pair) -- the multi-chip
    path that keeps the single-chip kernel surface. ``plane_dtype``
    (e.g. jnp.bfloat16) casts the interpolated A/dA slabs before the kernel:
    the TPU production setting (MXU-native; matches the single-chip tiled
    path's precision policy); leave None for f32 parity testing.
    """

    def local_solve(ts, coeffs_loc, y0_loc):
        if interpolation == "cubic":
            ctrl = CubicInterpolation(ts, coeffs_loc)
        else:
            ctrl = LinearInterpolation(ts, coeffs_loc)

        def vf_sharded(t, y_loc, args):
            A_loc = ctrl.evaluate(t)  # (n_loc, n): local rows only
            dA_loc = ctrl.derivative(t)
            if plane_dtype is not None:
                A_loc = A_loc.astype(plane_dtype)
                dA_loc = dA_loc.astype(plane_dtype)
            return sharded_vf_stack(vf, y_loc, A_loc, dA_loc, axis_name,
                                    backend=backend, tile=tile, halo=halo)

        sol = diffeqsolve(
            ODETerm(vf_sharded),
            "tsit5",
            t0=ts[0],
            t1=ts[-1],
            dt0=None,
            y0=y0_loc,
            stepsize_controller=PIDController(rtol, atol, axis_name=axis_name),
            saveat=SaveAt(ts=ts),
            max_steps=max_steps,
        )
        return sol.ys

    if interpolation == "cubic":
        coeff_specs = tuple(P(None, axis_name, None) for _ in range(4))
    else:
        coeff_specs = P(None, axis_name, None)

    sharded = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(None), coeff_specs, P(axis_name, None)),
        out_specs=P(None, axis_name, None),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_gncde_loss(
    mesh: Mesh,
    vf,
    interpolation: str = "cubic",
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 512,
    axis_name: str = "graph",
    backend: str = "xla",
    tile: tp.Optional[int] = None,
    plane_dtype=None,
    halo: tp.Optional[int] = None,
    stepsize_controller=None,
    dt0: tp.Optional[float] = None,
):
    """Differentiable node-sharded DENSE CDE training loss.

    The dense counterpart of :func:`make_sharded_sparse_gncde_loss`, with a
    ``backend`` knob: ``"pallas"`` keeps every per-shard heavy product on the
    tiled Pallas pair kernel through BOTH the forward solve and the adjoint
    replay (the kernel's custom VJP re-enters the same kernel family), so
    multi-chip training no longer forfeits the single-chip kernel advantage
    (VERDICT r4 item 1). Gradients flow through the
    all_gather/psum_scatter/psum collectives via shard_map's transposes.

    Returns ``(loss_fn, params0)``: ``loss_fn(params, ts, coeffs, y0,
    labels) -> scalar`` (labels: (T, n, H)), to be jitted over ``mesh``.
    """
    from ..nn import combine, is_inexact_array, partition

    if stepsize_controller is None:
        stepsize_controller = PIDController(rtol, atol, axis_name=axis_name)

    params0, static = partition(vf, is_inexact_array)

    def local_loss(params, ts, coeffs_loc, y0_loc, labels_loc):
        vf_p = combine(params, static)
        if interpolation == "cubic":
            ctrl = CubicInterpolation(ts, coeffs_loc)
        else:
            ctrl = LinearInterpolation(ts, coeffs_loc)

        def vf_sharded(t, y_loc, args):
            A_loc = ctrl.evaluate(t)
            dA_loc = ctrl.derivative(t)
            if plane_dtype is not None:
                A_loc = A_loc.astype(plane_dtype)
                dA_loc = dA_loc.astype(plane_dtype)
            return sharded_vf_stack(vf_p, y_loc, A_loc, dA_loc, axis_name,
                                    backend=backend, tile=tile, halo=halo)

        sol = diffeqsolve(
            ODETerm(vf_sharded),
            "tsit5",
            t0=ts[0],
            t1=ts[-1],
            dt0=dt0,
            y0=y0_loc,
            stepsize_controller=stepsize_controller,
            saveat=SaveAt(ts=ts),
            max_steps=max_steps,
        )
        err = (sol.ys - labels_loc) ** 2
        # Equal slabs, so the pmean of per-shard means is the global mean.
        return jax.lax.pmean(jnp.mean(err), axis_name)

    if interpolation == "cubic":
        coeff_specs = tuple(P(None, axis_name, None) for _ in range(4))
    else:
        coeff_specs = P(None, axis_name, None)

    sharded = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(
            P(),
            P(None),
            coeff_specs,
            P(axis_name, None),
            P(None, axis_name, None),
        ),
        out_specs=P(),
        check_vma=False,
    )
    return sharded, params0


def make_sharded_sparse_gncde_solve(
    mesh: Mesh,
    vf,
    n: int,
    interpolation: str = "cubic",
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 512,
    axis_name: str = "graph",
    halo: tp.Optional[int] = None,
):
    """Node-sharded CDE solve over SPARSE (ELL) controls: the scaled-n
    composition -- O(T nnz) coefficient storage (interp/sparse_paths.py) AND
    O(nnz/G * H) per-device message passing (sharded_sparse_fused_apply),
    with the same pmean'd global accept/reject decision as the dense solve.
    No n^2 object exists anywhere: not in HBM (ELL planes), not per step
    (sparse fused apply). This is the only layout that scales past what one
    chip's HBM holds densely.

    Returns ``f(ts, indices, coeffs, y0) -> ys`` where indices is the (n, K)
    global-column ELL pattern (padding == n), coeffs the sparse Hermite
    tuple, each (T-1, n, K) (or linear knots (T, n, K)), y0 (n, H) -- all
    row-sharded over ``mesh``'s ``graph`` axis.

    ``halo`` (compute with ``ell_halo_width(indices, n, G)`` on the host)
    switches each vf eval's feature exchange from all-gather/psum_scatter to
    ppermute neighbour rings -- for banded/clustered graphs each device then
    moves O(halo * n/G * H) bytes per layer instead of O(n * H).
    """

    def local_solve(ts, indices_loc, coeffs_loc, y0_loc):
        if interpolation == "cubic":
            path = SparseCubicMatrixPath(ts, coeffs_loc, indices_loc, n)
        else:
            path = SparseLinearMatrixPath(ts, coeffs_loc, indices_loc, n)

        def vf_sharded(t, y_loc, args):
            ellA = path.evaluate(t)    # local-row ELL slab, global columns
            elldA = path.derivative(t)
            return sharded_sparse_vf_stack(
                vf, y_loc, ellA.indices, ellA.values, elldA.values, n,
                axis_name, halo=halo,
            )

        sol = diffeqsolve(
            ODETerm(vf_sharded),
            "tsit5",
            t0=ts[0],
            t1=ts[-1],
            dt0=None,
            y0=y0_loc,
            stepsize_controller=PIDController(rtol, atol, axis_name=axis_name),
            saveat=SaveAt(ts=ts),
            max_steps=max_steps,
        )
        return sol.ys

    if interpolation == "cubic":
        coeff_specs = tuple(P(None, axis_name, None) for _ in range(4))
    else:
        coeff_specs = P(None, axis_name, None)

    sharded = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(None), P(axis_name, None), coeff_specs, P(axis_name, None)),
        out_specs=P(None, axis_name, None),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_sparse_gncde_loss(
    mesh: Mesh,
    vf,
    n: int,
    interpolation: str = "cubic",
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 512,
    axis_name: str = "graph",
    halo: tp.Optional[int] = None,
    stepsize_controller=None,
    dt0: tp.Optional[float] = None,
):
    """Differentiable node-sharded sparse CDE training loss.

    The TRAINING companion of :func:`make_sharded_sparse_gncde_solve`: the
    vector-field parameters enter the shard_map as explicit replicated
    inputs (the solve factories close over them, which blocks
    differentiation), so gradients flow through the ppermute/psum
    collectives and the solver's checkpointed adjoint, and shard_map's
    transpose psums the replicated-parameter cotangents across shards.

    Returns ``(loss_fn, params0)`` where ``params0`` is the inexact-leaf
    partition of ``vf`` and ``loss_fn(params, ts, indices, coeffs, y0,
    labels) -> scalar`` is the MSE over save points (labels: (T, n, H)).
    Differentiate with ``jax.value_and_grad(loss_fn)`` and jit over the
    mesh; per-shard means are pmean'd so every device returns the global
    loss.

    ``stepsize_controller`` defaults to a PID controller with the pmean'd
    global error norm; pass ``ConstantStepSize()`` + ``dt0`` for the
    fixed-step (TGB/PGT-style) regime. A custom adaptive controller must
    carry ``axis_name`` so its accept/reject decision stays global.
    """
    from ..nn import combine, is_inexact_array, partition

    if stepsize_controller is None:
        stepsize_controller = PIDController(rtol, atol, axis_name=axis_name)

    params0, static = partition(vf, is_inexact_array)

    def local_loss(params, ts, indices_loc, coeffs_loc, y0_loc, labels_loc):
        vf_p = combine(params, static)
        if interpolation == "cubic":
            path = SparseCubicMatrixPath(ts, coeffs_loc, indices_loc, n)
        else:
            path = SparseLinearMatrixPath(ts, coeffs_loc, indices_loc, n)

        def vf_sharded(t, y_loc, args):
            ellA = path.evaluate(t)
            elldA = path.derivative(t)
            return sharded_sparse_vf_stack(
                vf_p, y_loc, ellA.indices, ellA.values, elldA.values, n,
                axis_name, halo=halo,
            )

        sol = diffeqsolve(
            ODETerm(vf_sharded),
            "tsit5",
            t0=ts[0],
            t1=ts[-1],
            dt0=dt0,
            y0=y0_loc,
            stepsize_controller=stepsize_controller,
            saveat=SaveAt(ts=ts),
            max_steps=max_steps,
        )
        err = (sol.ys - labels_loc) ** 2
        # Equal slabs, so the pmean of per-shard means is the global mean.
        return jax.lax.pmean(jnp.mean(err), axis_name)

    if interpolation == "cubic":
        coeff_specs = tuple(P(None, axis_name, None) for _ in range(4))
    else:
        coeff_specs = P(None, axis_name, None)

    sharded = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(
            P(),
            P(None),
            P(axis_name, None),
            coeff_specs,
            P(axis_name, None),
            P(None, axis_name, None),
        ),
        out_specs=P(),
        check_vma=False,
    )
    return sharded, params0
