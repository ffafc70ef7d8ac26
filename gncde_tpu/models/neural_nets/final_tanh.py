"""STG-NCDE-style f-function: relu MLP with final tanh.

Reference: src/models/neural_nets/fully_connected_tanh.py:22-60; built by
NeuralNetsCfg with output_dim = hidden_dim * data_embed_dim
(neural_nets_configs.py:33-39).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import Module, Linear, static_field


class FinalTanhF(Module):
    input_dim: int = static_field()
    hidden_dim: int = static_field()
    output_dim: int = static_field()
    num_layers: int = static_field()

    linear_in: Linear
    linears: list
    linear_out: Linear

    def __init__(
        self, input_dim: int, hidden_dim: int, output_dim: int, num_layers: int, *, key
    ):
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        self.output_dim = output_dim
        self.num_layers = num_layers

        key, key_linear_in, key_linears, key_linear_out = jax.random.split(key, 4)
        self.linear_in = Linear(input_dim, hidden_dim, key=key_linear_in)
        keys = jax.random.split(key_linears, num_layers - 1)
        self.linears = [Linear(hidden_dim, hidden_dim, key=k) for k in keys]
        self.linear_out = Linear(hidden_dim, output_dim, key=key_linear_out)

    def __call__(self, z: jax.Array) -> jax.Array:
        z = jax.vmap(self.linear_in)(z)
        z = jax.nn.relu(z)
        for linear in self.linears:
            z = jax.vmap(linear)(z)
            z = jax.nn.relu(z)
        z = jax.vmap(self.linear_out)(z)
        return jnp.tanh(z)
