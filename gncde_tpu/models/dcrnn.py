"""DCRNN discrete baseline (diffusion-convolutional GRU, single-step decode).

Reference: src/models/dcrnn.py. TPU-first deviation: the encoder's Python
loop over time (dcrnn.py:160-170) is a ``lax.scan`` per layer -- one compiled
recurrence instead of T unrolled cells.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from ..nn import Module, Linear, static_field


class DiffusionGCN(Module):
    weight: jax.Array
    bias: jax.Array
    node_num: int = static_field()
    dim_in: int = static_field()
    dim_out: int = static_field()
    order: int = static_field()

    def __init__(self, node_num, dim_in, dim_out, order, *, key):
        self.node_num = node_num
        self.dim_in = dim_in
        self.dim_out = dim_out
        self.order = order
        num_matrices = dim_in * (order + 1)
        k1, _ = jr.split(key)
        self.weight = jr.normal(k1, (num_matrices, dim_out)) * jnp.sqrt(
            2.0 / num_matrices
        )
        self.bias = jnp.zeros((dim_out,))

    def __call__(self, x: jax.Array, adj: jax.Array) -> jax.Array:
        # x: (N, D); adj: (N, N). Chebyshev-style diffusion stack.
        out = [x]
        x0 = x
        x1 = adj @ x0
        out.append(x1)
        for _ in range(2, self.order + 1):
            x2 = 2 * (adj @ x1) - x0
            out.append(x2)
            x0, x1 = x1, x2
        h = jnp.concatenate(out, axis=-1)
        return h @ self.weight + self.bias


class DCGRUCell(Module):
    gate: DiffusionGCN
    update: DiffusionGCN
    hidden_dim: int = static_field()
    num_node: int = static_field()

    def __init__(self, num_node, input_dim, hidden_dim, order, *, key):
        k1, k2 = jr.split(key)
        self.gate = DiffusionGCN(num_node, input_dim + hidden_dim, 2 * hidden_dim, order, key=k1)
        self.update = DiffusionGCN(num_node, input_dim + hidden_dim, hidden_dim, order, key=k2)
        self.hidden_dim = hidden_dim
        self.num_node = num_node

    def __call__(self, x, adj, state):
        inp = jnp.concatenate([x, state], axis=-1)
        z_r = jax.nn.sigmoid(self.gate(inp, adj))
        z, r = jnp.split(z_r, 2, axis=-1)
        candidate = jnp.concatenate([x, z * state], axis=-1)
        hc = jnp.tanh(self.update(candidate, adj))
        return r * state + (1 - r) * hc


class DCRNNModelSingleStep(Module):
    encoder_cells: list
    decoder_cells: list
    projection: Linear
    num_layers: int = static_field()
    num_node: int = static_field()
    input_dim: int = static_field()
    hidden_dim: int = static_field()
    output_dim: int = static_field()

    def __init__(
        self, num_node, input_dim, hidden_dim, output_dim, order, num_layers=1, *, key
    ):
        self.num_layers = num_layers
        self.num_node = num_node
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        self.output_dim = output_dim

        keys = jr.split(key, 2 * num_layers + 1)
        self.encoder_cells = [
            DCGRUCell(
                num_node, input_dim if i == 0 else hidden_dim, hidden_dim, order,
                key=keys[i],
            )
            for i in range(num_layers)
        ]
        self.decoder_cells = [
            DCGRUCell(
                num_node, input_dim if i == 0 else hidden_dim, hidden_dim, order,
                key=keys[num_layers + i],
            )
            for i in range(num_layers)
        ]
        self.projection = Linear(hidden_dim, output_dim, key=keys[-1])

    def encode(self, source, adj):
        """source: (T, N, D); adj: (T, N, N). lax.scan per layer."""
        encoder_states = []
        current = source
        for cell in self.encoder_cells:
            h0 = jnp.zeros((self.num_node, self.hidden_dim), source.dtype)

            def step(h, xa):
                x_t, adj_t = xa
                h_new = cell(x_t, adj_t, h)
                return h_new, h_new

            h_fin, outputs = jax.lax.scan(step, h0, (current, adj))
            encoder_states.append(h_fin)
            current = outputs
        return current, encoder_states

    def __call__(self, source: jax.Array, adj: jax.Array) -> jax.Array:
        _, encoder_hidden = self.encode(source, adj)
        # Single-step decode from the GO symbol (last observation).
        h = source[-1]
        for i, cell in enumerate(self.decoder_cells):
            h = cell(h, adj[-1], encoder_hidden[i])
        out = jax.vmap(self.projection)(h)
        if self.output_dim == 1:
            return out.reshape(1, self.num_node)
        return out.reshape(1, self.num_node, self.output_dim)
