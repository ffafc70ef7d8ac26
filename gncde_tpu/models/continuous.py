"""Dynamical-systems GNCDE / GNODE model shells.

Reference: src/models/graph_neural_cde.py, graph_neural_ode.py. Forward =
interpolate graph control path -> solve latent ODE/CDE -> per-node decode.
All solver work runs through gncde_tpu.solve (one fused XLA program; see that
module for the TPU design notes).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from ..nn import Module, Linear, static_field
from ..interp import LinearInterpolation, CubicInterpolation, MatrixControl
from ..solve import ODETerm, SaveAt, PIDController, diffeqsolve
from . import vector_fields


def make_control(interpolation: str, ts: jax.Array, coeffs, slim: bool = False):
    """Construct a control path from reference-layout coefficients.

    ``slim=True`` strips the analytic time channel (see
    gncde_tpu.interp.MatrixControl) -- used for adjacency paths whose
    consumers only read the value channel; halves coefficient traffic in the
    solver hot loop.

    A pre-built control (anything exposing ``adj``/``dadj``, e.g.
    interp.SparseMatrixControl prepared host-side by the trainer's
    ``sparse_control`` knob) passes through unchanged.
    """
    if hasattr(coeffs, "adj"):
        return coeffs
    if slim:
        ctrl = MatrixControl.from_stacked(interpolation, ts, coeffs)
        from .. import ops as ops_config

        if ops_config.get_fusion_precision() == "bf16":
            # Store the adjacency coefficient planes in bfloat16: they are
            # the hot loop's only O(n^2) HBM reads, and the fusion backends
            # consume them as bf16 matmul operands anyway (~3e-3 relative
            # error, safe at the reference's rtol=1e-3 tolerance).
            path = ctrl.path
            if isinstance(path, CubicInterpolation):
                ctrl = MatrixControl(
                    CubicInterpolation(
                        path.ts, tuple(c.astype(jnp.bfloat16) for c in path.coeffs)
                    )
                )
            else:
                ctrl = MatrixControl(
                    LinearInterpolation(path.ts, path.ys.astype(jnp.bfloat16))
                )
        if (
            ops_config.get_fusion_backend() == "megakernel"
            and isinstance(ctrl.path, CubicInterpolation)
        ):
            from ..ops.pallas import megakernel as _mk
            from ..ops.pallas import tiled as _tiled

            n = ctrl.path.coeffs[0].shape[-1]
            if _mk.MEGAKERNEL_MAX_N < n <= _tiled.TILED_MAX_N:
                # Large-n tiled-kernel path: precompute the per-plane
                # row/col/diag reduced stacks ONCE per trajectory so each vf
                # eval's rank-structured terms are O(n), not O(n^2) reads.
                ctrl = MatrixControl(
                    ctrl.path,
                    red=_tiled.cubic_plane_reductions(ctrl.path.coeffs),
                )
        return ctrl
    if interpolation == "linear":
        return LinearInterpolation(ts, coeffs)
    elif interpolation == "cubic":
        return CubicInterpolation(ts, coeffs)
    raise ValueError(f"Unknown interpolation {interpolation!r}")


class GraphNeuralCDE(Module):
    """Latent graph-CDE over a dynamic-adjacency control path
    (reference graph_neural_cde.py:12-113)."""

    initial_linear: Linear
    final_linear: Linear
    vector_field: Module
    hidden_dim: int = static_field()
    method: str = static_field()
    interpolation: str = static_field()
    return_sequence: bool = static_field()
    max_steps: int = static_field()
    adjoint: str = static_field()

    def __init__(
        self,
        vector_field: Module,
        hidden_dim: int,
        interpolation: str,
        method: str = "Tsit5",
        return_sequence: bool = True,
        max_steps: int = 1024,
        adjoint: str = "checkpointed",
        *,
        key: jax.Array,
    ):
        if isinstance(vector_field, vector_fields.GNODEFloorVectorField):
            raise ValueError("GNODEFloorVectorField is not supported for GraphNeuralCDE.")
        initial_linear_key, final_linear_key = jr.split(key, 2)
        self.initial_linear = Linear(1, hidden_dim, key=initial_linear_key)
        self.final_linear = Linear(hidden_dim, 1, key=final_linear_key)
        self.vector_field = vector_field
        self.hidden_dim = hidden_dim
        self.method = method
        self.interpolation = interpolation
        self.return_sequence = return_sequence
        self.max_steps = max_steps
        self.adjoint = adjoint

    def __call__(
        self,
        ts: jax.Array,
        coeffs_adj,
        x0: jax.Array,
        evolving_out: bool = True,
        adjoint: tp.Optional[str] = None,
    ) -> jax.Array:
        control_adj = make_control(self.interpolation, ts, coeffs_adj, slim=True)
        term = ODETerm(self.vector_field)
        y0 = jax.vmap(self.initial_linear)(x0)
        saveat = SaveAt(ts=ts) if evolving_out else SaveAt(t1=True)

        sol = diffeqsolve(
            term,
            self.method,
            t0=ts[0],
            t1=ts[-1],
            dt0=None,
            y0=y0,
            args=control_adj,
            stepsize_controller=PIDController(rtol=1e-3, atol=1e-6),
            saveat=saveat,
            max_steps=self.max_steps,
            adjoint=adjoint or self.adjoint,
        )

        if self.return_sequence:
            return jax.vmap(jax.vmap(self.final_linear))(sol.ys)
        return self.final_linear(sol.ys[-1])


class GraphNeuralODE(Module):
    """Latent graph-ODE with piecewise-constant (floored) adjacency
    (reference graph_neural_ode.py:12-120)."""

    initial_linear: Linear
    final_linear: Linear
    vector_field: Module
    hidden_dim: int = static_field()
    method: str = static_field()
    interpolation: str = static_field()
    return_sequence: bool = static_field()
    max_steps: int = static_field()
    adjoint: str = static_field()

    def __init__(
        self,
        vector_field: Module,
        hidden_dim: int,
        interpolation: str,
        method: str = "Tsit5",
        return_sequence: bool = True,
        max_steps: int = 1024,
        adjoint: str = "checkpointed",
        *,
        key: jax.Array,
    ):
        if not isinstance(vector_field, vector_fields.GNODEFloorVectorField):
            raise ValueError(
                "GNODEFloorVectorField is the only supported vector field for GraphNeuralODE."
            )
        initial_linear_key, final_linear_key = jr.split(key, 2)
        self.initial_linear = Linear(1, hidden_dim, key=initial_linear_key)
        self.final_linear = Linear(hidden_dim, 1, key=final_linear_key)
        self.vector_field = vector_field
        self.hidden_dim = hidden_dim
        self.method = method
        self.interpolation = interpolation
        self.return_sequence = return_sequence
        self.max_steps = max_steps
        self.adjoint = adjoint

    def __call__(
        self,
        ts: jax.Array,
        coeffs_adj,
        x0: jax.Array,
        adjacency_list: tp.Optional[jax.Array] = None,
        events_time: tp.Optional[jax.Array] = None,
        evolving_out: bool = True,
        adjoint: tp.Optional[str] = None,
    ) -> jax.Array:
        control_adj = make_control(self.interpolation, ts, coeffs_adj, slim=True)
        args = (control_adj, adjacency_list, events_time)
        term = ODETerm(self.vector_field)
        y0 = jax.vmap(self.initial_linear)(x0)
        saveat = SaveAt(ts=ts) if evolving_out else SaveAt(t1=True)

        sol = diffeqsolve(
            term,
            self.method,
            t0=ts[0],
            t1=ts[-1],
            dt0=None,
            y0=y0,
            args=args,
            stepsize_controller=PIDController(rtol=1e-3, atol=1e-6),
            saveat=saveat,
            max_steps=self.max_steps,
            adjoint=adjoint or self.adjoint,
        )

        if self.return_sequence:
            return jax.vmap(jax.vmap(self.final_linear))(sol.ys)
        return self.final_linear(sol.ys[-1])
