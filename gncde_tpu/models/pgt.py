"""PGT (PyTorch-Geometric-Temporal datasets) model shells.

Reference: src/models/pgt_graph_neural_cde.py, pgt_graph_neural_ode.py,
pgt_st_graph_neural_cde.py. Window data comes with precomputed coefficient
paths for both adjacency and node signals (dataset side); forwards solve the
wrapped CDE with constant dt0=0.1 (CDE) or adaptive PID (ODE/ST).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from ..nn import Module, Linear, MLP, static_field
from ..solve import ODETerm, SaveAt, PIDController, ConstantStepSize, diffeqsolve
from .continuous import make_control
from . import vector_fields


class PGTGraphNeuralCDE(Module):
    """Constant-step CDE with MLP encoder/decoder and optional global node-sum
    readout (pgt_graph_neural_cde.py:13-135; dt0=0.1)."""

    encoder: MLP
    decoder: MLP
    vector_field: Module
    wrapped_vector_field: Module
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
        data_dim: int,
        feature_dim: int,
        interpolation: str,
        method: str = "Tsit5",
        return_sequence: bool = False,
        dt0: float = 0.1,
        adjoint: str = "checkpointed",
        *,
        key: jax.Array,
    ):
        encoder_key, decoder_key, data_encoder_key = jr.split(key, 3)
        self.encoder = MLP(
            in_size=data_dim, out_size=hidden_dim, width_size=16, depth=2,
            key=encoder_key,
        )
        # Reference quirk: decoder reuses encoder_key (pgt_graph_neural_cde.py:57-63).
        self.decoder = MLP(
            in_size=hidden_dim, out_size=feature_dim, width_size=16, depth=2,
            key=encoder_key,
        )
        self.vector_field = vector_field
        self.wrapped_vector_field = vector_fields.CDEWrapperVectorField(
            vector_field, hidden_dim
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
        x_coeffs,
        x0: jax.Array,
        evolving_out: bool = False,
        global_readout: bool = True,
        adjoint: tp.Optional[str] = None,
    ) -> jax.Array:
        control_adj = make_control(self.interpolation, ts, coeffs_adj, slim=True)
        control_data = make_control(self.interpolation, ts, x_coeffs)

        term = ODETerm(self.wrapped_vector_field)
        y0 = jax.vmap(self.encoder)(x0)
        saveat = SaveAt(ts=ts) if evolving_out else SaveAt(t1=True)

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

        ys_last = sol.ys[-1] if evolving_out else sol.ys
        output = jax.vmap(self.decoder)(ys_last)
        if global_readout:
            return jnp.sum(output, axis=0)
        return output


class PGTGraphNeuralODE(Module):
    """Adaptive latent ODE over PGT windows (pgt_graph_neural_ode.py)."""

    encoder: MLP
    decoder: MLP
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
        data_dim: int,
        feature_dim: int,
        interpolation: str,
        method: str = "Tsit5",
        return_sequence: bool = True,
        max_steps: int = 1024,
        adjoint: str = "checkpointed",
        *,
        key: jax.Array,
    ):
        encoder_key, decoder_key, data_encoder_key = jr.split(key, 3)
        self.encoder = MLP(
            in_size=data_dim, out_size=hidden_dim, width_size=16, depth=2,
            key=encoder_key,
        )
        self.decoder = MLP(
            in_size=hidden_dim, out_size=feature_dim, width_size=16, depth=2,
            key=decoder_key,
        )
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
        adj_list: jax.Array,
        x_coeffs,
        x0: jax.Array,
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
            args=(control_adj, adj_list),
            stepsize_controller=PIDController(rtol=1e-3, atol=1e-6),
            saveat=saveat,
            max_steps=self.max_steps,
            adjoint=adjoint or self.adjoint,
        )

        if self.return_sequence and evolving_out:
            return jax.vmap(jax.vmap(self.decoder))(sol.ys)
        ys_last = sol.ys[-1] if evolving_out else sol.ys
        return jax.vmap(self.decoder)(ys_last)


class PGTSTGraphNeuralCDE(Module):
    """Dual-latent (h, z) STG-NCDE over PGT windows
    (pgt_st_graph_neural_cde.py:14-145; max_steps=4096)."""

    encoder_h: MLP
    encoder_z: MLP
    decoder: MLP
    f_func: Module
    g_func: Module
    wrapped_vector_field: Module
    method: str = static_field()
    interpolation: str = static_field()
    data_dim: int = static_field()
    max_steps: int = static_field()

    adjoint: str = static_field()

    def __init__(
        self,
        f_func: Module,
        g_func: Module,
        interpolation: str,
        data_dim: int,
        feature_dim: int,
        method: str = "Tsit5",
        max_steps: int = 4096,
        adjoint: str = "checkpointed",
        *,
        key: jax.Array,
    ):
        decoder_h_key, decoder_z_key, decoder_key, data_encoder_key = jr.split(key, 4)
        self.encoder_h = MLP(
            in_size=data_dim, out_size=f_func.hidden_dim, width_size=16, depth=2,
            key=decoder_h_key,
        )
        self.encoder_z = MLP(
            in_size=data_dim, out_size=g_func.hidden_dim, width_size=16, depth=2,
            key=decoder_z_key,
        )
        self.decoder = MLP(
            in_size=f_func.hidden_dim, out_size=feature_dim, width_size=16, depth=2,
            key=decoder_key,
        )
        self.f_func = f_func
        self.g_func = g_func
        self.wrapped_vector_field = vector_fields.PGTSTCDEWrapperVectorField(
            f_func, g_func, data_dim
        )
        self.method = method
        self.interpolation = interpolation
        self.adjoint = adjoint
        self.data_dim = data_dim
        self.max_steps = max_steps

    def __call__(
        self,
        ts: jax.Array,
        coeffs_adj,
        x_coeffs,
        x0: jax.Array,
        evolving_out: bool = False,
        adjoint: tp.Optional[str] = None,
    ) -> jax.Array:
        control_data = make_control(self.interpolation, ts, x_coeffs)
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

        ys_last = sol.ys[-1] if evolving_out else sol.ys
        return jax.vmap(self.decoder)(ys_last[1])
