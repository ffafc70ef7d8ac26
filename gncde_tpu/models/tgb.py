"""TGB node-property model shells.

Reference: src/models/tgb_graph_neural_cde.py, tgb_graph_neural_ode.py,
tgb_st_graph_neural_cde.py. Node features are encoded per snapshot, a data
control path is built inside the forward (time channel stacked on encoded
features, tgb_graph_neural_cde.py:118-137), and the latent solve is driven by
a CDE wrapper contracting with the data path derivative.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from ..nn import Module, Linear, MLP, static_field
from ..interp import (
    LinearInterpolation,
    CubicInterpolation,
    linear_interpolation,
    backward_hermite_coefficients,
)
from ..solve import ODETerm, SaveAt, PIDController, ConstantStepSize, diffeqsolve
from .continuous import make_control
from . import vector_fields


def _build_coder(use_mlps: bool, in_size: int, out_size: int, key: jax.Array):
    if use_mlps:
        return MLP(in_size=in_size, out_size=out_size, width_size=16, depth=2, key=key)
    return Linear(in_size, out_size, key=key)


def _interp_coeffs(interpolation: str, ts, xs):
    if interpolation == "linear":
        return linear_interpolation(ts, xs)
    return backward_hermite_coefficients(ts, xs)


class TGBGraphNeuralCDE(Module):
    """Constant-step latent CDE over TGB snapshot windows
    (tgb_graph_neural_cde.py:13-171; dt0=0.01, ConstantStepSize)."""

    encoder: Module
    decoder: Module
    data_encoder: Linear
    vector_field: Module
    wrapped_vector_field: Module
    persistence_alpha: tp.Optional[jax.Array]
    residual_gate: tp.Optional[jax.Array]
    hidden_dim: int = static_field()
    method: str = static_field()
    interpolation: str = static_field()
    return_sequence: bool = static_field()
    dt0: float = static_field()

    adjoint: str = static_field()

    def __init__(
        self,
        vector_field: Module,
        hidden_dim: int,
        interpolation: str,
        method: str = "Tsit5",
        return_sequence: bool = True,
        use_mlps: bool = False,
        dt0: float = 0.01,
        persistence_head: bool = False,
        adjoint: str = "checkpointed",
        *,
        key: jax.Array,
    ):
        encoder_key, decoder_key, data_encoder_key = jr.split(key, 3)
        n = vector_field.num_nodes
        self.encoder = _build_coder(use_mlps, n, hidden_dim, encoder_key)
        self.decoder = _build_coder(use_mlps, hidden_dim, n, decoder_key)
        # Reference quirk: data_encoder reuses encoder_key
        # (tgb_graph_neural_cde.py:86-90).
        self.data_encoder = Linear(n, vector_field.data_embed_dim, key=encoder_key)
        self.vector_field = vector_field
        self.wrapped_vector_field = vector_fields.CDEWrapperVectorField(
            vector_field, hidden_dim
        )
        # Opt-in persistence-residual head (NOT in the reference):
        # scores = beta * decoder(z) + alpha * rownorm(last snapshot). TGB
        # node features ARE the adjacency rows (dataset_configs.py:683), so
        # the alpha term ranks exactly like the copy-last predictor --
        # near-ceiling on persistence-dominated snapshot data (the tgbn
        # leaderboards' persistent-forecast baseline). Two scale choices
        # make it WORK at init (a raw additive head measured chance-level
        # NDCG: the untrained decoder's output, fed ~1e5-scale raw
        # features, swamps the persistence term):
        #   * the snapshot is row-max normalised (rank-preserving per
        #     source, O(1) logit scale),
        #   * the decoder is gated by beta initialised to 0 (ReZero-style),
        #     so epoch 0 IS copy-last and the CDE residual fades in as it
        #     earns CE.
        self.persistence_alpha = (
            jnp.ones(()) if persistence_head else None
        )
        self.residual_gate = (
            jnp.zeros(()) if persistence_head else None
        )
        self.hidden_dim = hidden_dim
        self.method = method
        self.interpolation = interpolation
        self.adjoint = adjoint
        self.return_sequence = return_sequence
        self.dt0 = dt0

    def __call__(
        self,
        ts: jax.Array,
        coeffs_adj,
        x_data: jax.Array,
        x0: jax.Array,
        start_time: tp.Optional[jax.Array] = None,
        evolving_out: bool = False,
        adjoint: tp.Optional[str] = None,
    ) -> jax.Array:
        x_raw = x_data  # (T, n, n): adjacency-row features, kept for the head
        x_data = jax.vmap(jax.vmap(self.data_encoder))(x_data)
        t_index = jnp.broadcast_to(
            ts[:, None, None], (ts.shape[0], x_data.shape[1], x_data.shape[2])
        )
        x_data = jnp.stack([t_index, x_data], axis=-1)
        coeffs_data = _interp_coeffs(self.interpolation, ts, x_data)

        control_adj = make_control(self.interpolation, ts, coeffs_adj, slim=True)
        control_data = make_control(self.interpolation, ts, coeffs_data)

        term = ODETerm(self.wrapped_vector_field)
        y0 = jax.vmap(self.encoder)(x0)
        saveat = SaveAt(ts=ts) if evolving_out else SaveAt(t1=True)

        # Window times are 0..T-1 (dataset_configs.py:777), so the constant-
        # step count is static from the shape: (T-1)/dt0 (+ slack for float
        # accumulation).
        num_steps = int(round((ts.shape[0] - 1) / self.dt0)) + 2

        sol = diffeqsolve(
            term,
            self.method,
            t0=ts[0],
            t1=ts[-1],
            dt0=self.dt0,
            y0=y0,
            args=(control_adj, control_data),
            stepsize_controller=ConstantStepSize(),
            saveat=saveat,
            max_steps=num_steps,
            adjoint=adjoint or self.adjoint,
        )

        def _persist(snapshot):
            rowmax = jnp.max(jnp.abs(snapshot), axis=-1, keepdims=True)
            return self.persistence_alpha * snapshot / (rowmax + 1e-8)

        if self.return_sequence and evolving_out:
            out = jax.vmap(jax.vmap(self.decoder))(sol.ys)
            if self.persistence_alpha is not None:
                out = self.residual_gate * out + _persist(x_raw)
            return out
        ys_last = sol.ys[-1] if evolving_out else sol.ys
        out = jax.vmap(self.decoder)(ys_last)
        if self.persistence_alpha is not None:
            out = self.residual_gate * out + _persist(x_raw[-1])
        return out


class TGBGraphNeuralODE(Module):
    """Adaptive-step latent ODE over TGB windows (tgb_graph_neural_ode.py)."""

    encoder: Module
    decoder: Module
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
        use_mlps: bool = False,
        max_steps: int = 1024,
        adjoint: str = "checkpointed",
        *,
        key: jax.Array,
    ):
        encoder_key, decoder_key, data_encoder_key = jr.split(key, 3)
        n = vector_field.num_nodes
        self.encoder = _build_coder(use_mlps, n, hidden_dim, encoder_key)
        self.decoder = _build_coder(use_mlps, hidden_dim, n, decoder_key)
        self.vector_field = vector_field
        self.hidden_dim = hidden_dim
        self.method = method
        self.interpolation = interpolation
        self.adjoint = adjoint
        self.return_sequence = return_sequence
        self.max_steps = max_steps

    def __call__(
        self,
        ts: jax.Array,
        coeffs_adj,
        x_data: jax.Array,
        x0: jax.Array,
        start_time: tp.Optional[jax.Array] = None,
        evolving_out: bool = False,
        adjoint: tp.Optional[str] = None,
    ) -> jax.Array:
        control_adj = make_control(self.interpolation, ts, coeffs_adj, slim=True)
        term = ODETerm(self.vector_field)
        y0 = jax.vmap(self.encoder)(x0)
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

        if self.return_sequence and evolving_out:
            return jax.vmap(jax.vmap(self.decoder))(sol.ys)
        ys_last = sol.ys[-1] if evolving_out else sol.ys
        return jax.vmap(self.decoder)(ys_last)


class TGBSTGraphNeuralCDE(Module):
    """Dual-latent (h, z) STG-NCDE over TGB windows
    (tgb_st_graph_neural_cde.py:14-186; max_steps=4096 in the reference)."""

    encoder_h: Module
    encoder_z: Module
    decoder: Module
    data_encoder: Linear
    f_func: Module
    g_func: Module
    wrapped_vector_field: Module
    method: str = static_field()
    interpolation: str = static_field()
    return_sequence: bool = static_field()
    data_embed_dim: int = static_field()
    max_steps: int = static_field()

    adjoint: str = static_field()

    def __init__(
        self,
        f_func: Module,
        g_func: Module,
        interpolation: str,
        data_embed_dim: int,
        method: str = "Tsit5",
        return_sequence: bool = True,
        use_mlps: bool = False,
        max_steps: int = 4096,
        adjoint: str = "checkpointed",
        *,
        key: jax.Array,
    ):
        encoder_h_key, encoder_z_key, decoder_key, data_encoder_key = jr.split(key, 4)
        n = g_func.num_nodes
        h_dim = f_func.hidden_dim
        self.encoder_h = _build_coder(use_mlps, n, h_dim, encoder_h_key)
        self.encoder_z = _build_coder(use_mlps, n, h_dim, encoder_z_key)
        self.decoder = _build_coder(use_mlps, h_dim, n, decoder_key)
        self.data_encoder = Linear(n, data_embed_dim, key=data_encoder_key)
        self.f_func = f_func
        self.g_func = g_func
        self.wrapped_vector_field = vector_fields.STCDEWrapperVectorField(
            f_func, g_func, data_embed_dim
        )
        self.method = method
        self.interpolation = interpolation
        self.adjoint = adjoint
        self.return_sequence = return_sequence
        self.data_embed_dim = data_embed_dim
        self.max_steps = max_steps

    def __call__(
        self,
        ts: jax.Array,
        coeffs_adj,
        x_data: jax.Array,
        x0: jax.Array,
        start_time: tp.Optional[jax.Array] = None,
        evolving_out: bool = False,
        adjoint: tp.Optional[str] = None,
    ) -> jax.Array:
        x_data = jax.vmap(jax.vmap(self.data_encoder))(x_data)
        coeffs_data = _interp_coeffs(self.interpolation, ts, x_data)
        control_data = make_control(self.interpolation, ts, coeffs_data)

        term = ODETerm(self.wrapped_vector_field)
        h0 = jax.vmap(self.encoder_h)(x0)
        z0 = jax.vmap(self.encoder_z)(x0)
        y0 = jnp.stack([h0, z0], axis=0)
        saveat = SaveAt(ts=ts) if evolving_out else SaveAt(t1=True)

        sol = diffeqsolve(
            term,
            self.method,
            t0=ts[0],
            t1=ts[-1],
            dt0=None,
            y0=y0,
            args=control_data,
            stepsize_controller=PIDController(rtol=1e-3, atol=1e-6),
            saveat=saveat,
            max_steps=self.max_steps,
            adjoint=adjoint or self.adjoint,
        )

        if self.return_sequence and evolving_out:
            return jax.vmap(jax.vmap(self.decoder))(sol.ys[:, 1])
        ys_last = sol.ys[-1] if evolving_out else sol.ys
        return jax.vmap(self.decoder)(ys_last[1])
