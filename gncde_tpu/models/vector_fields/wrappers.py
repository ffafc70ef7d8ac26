"""CDE wrapper vector fields: contract an inner vf's output with the data
control path's derivative, turning a graph ODE field into a genuine CDE.

Reference: src/models/vector_fields/cde_wrapper_vector_field.py,
stcde_wrapper_vector_field.py, pgt_stcde_wrapper_vector_field.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import Module, static_field


class CDEWrapperVectorField(Module):
    """``dy = reshape(vf(t, y, A_path), (n, H, E, 2)) . dX(t)``
    (cde_wrapper_vector_field.py:19-26)."""

    vector_field: Module
    hidden_dim: int = static_field()

    def __init__(self, vector_field, hidden_dim: int):
        self.vector_field = vector_field
        self.hidden_dim = hidden_dim

    def __call__(self, t, y, args):
        control_adj, control_data = args
        out = self.vector_field(t, y, control_adj).reshape(
            -1, self.hidden_dim, self.vector_field.data_embed_dim, 2
        )
        return jnp.einsum("nmlk,nlk->nm", out, control_data.derivative(t))


class STCDEWrapperVectorField(Module):
    """Coupled STG-NCDE system ``dh = f(h).dX ; dz = g(z)f(h).dX``
    (stcde_wrapper_vector_field.py:49-66). State is stacked (2, n, H)."""

    f_func: Module
    g_func: Module
    data_embed_dim: int = static_field()

    def __init__(self, f_func, g_func, data_embed_dim: int):
        self.f_func = f_func
        self.g_func = g_func
        self.data_embed_dim = data_embed_dim

    def __call__(self, t, y, args):
        h, z = y[0], y[1]
        control_data = args

        vf_f = self.f_func(h).reshape(-1, self.f_func.hidden_dim, self.data_embed_dim)
        vf_g = self.g_func(z).reshape(
            -1, self.g_func.hidden_dim, self.f_func.hidden_dim
        )
        vf_fg = jnp.einsum("nml,nlk->nmk", vf_g, vf_f)

        dX = control_data.derivative(t)
        dh = jnp.einsum("nml,nl->nm", vf_f, dX)
        dz = jnp.einsum("nml,nl->nm", vf_fg, dX)
        return jnp.stack([dh, dz], axis=0)


class PGTSTCDEWrapperVectorField(Module):
    """PGT variant contracting with the data channel of the control
    (pgt_stcde_wrapper_vector_field.py:97-102)."""

    f_func: Module
    g_func: Module
    data_dim: int = static_field()

    def __init__(self, f_func, g_func, data_dim: int):
        self.f_func = f_func
        self.g_func = g_func
        self.data_dim = data_dim

    def __call__(self, t, y, args):
        h, z = y[0], y[1]
        control_data = args

        vf_f = self.f_func(h).reshape(-1, self.f_func.hidden_dim, self.data_dim)
        vf_g = self.g_func(z).reshape(
            -1, self.g_func.hidden_dim, self.f_func.hidden_dim
        )
        vf_fg = jnp.einsum("nml,nlk->nmk", vf_g, vf_f)

        dX = control_data.derivative(t)[..., -1]
        dh = jnp.einsum("nml,nl->nm", vf_f, dX)
        dz = jnp.einsum("nml,nl->nm", vf_fg, dX)
        return jnp.stack([dh, dz], axis=0)
