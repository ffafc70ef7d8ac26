"""STG-NCDE adaptive-graph-convolution g-function.

Reference: src/models/vector_fields/st_graph_vector_field.py (agc over
softmax(relu(E E^T)) Chebyshev supports with per-node weights from a pool).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import Module, Linear, static_field


class STGraphVectorField(Module):
    input_dim: int = static_field()
    hidden_dim: int = static_field()
    output_dim: int = static_field()
    num_layers: int = static_field()
    num_nodes: int = static_field()
    cheb_k: int = static_field()
    node_embed_dim: int = static_field()
    g_type: str = static_field()

    linear_in: Linear
    linear_out: Linear
    node_embeddings: jax.Array
    weights_pool: jax.Array
    bias_pool: jax.Array

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        output_dim: int,
        num_layers: int,
        node_embed_dim: int,
        num_nodes: int,
        cheb_k: int,
        *,
        key,
    ):
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        self.output_dim = output_dim
        self.num_layers = num_layers
        self.node_embed_dim = node_embed_dim
        self.num_nodes = num_nodes
        self.cheb_k = cheb_k
        self.g_type = "agc"

        key, key_linear_in, key_linear_out = jax.random.split(key, 3)
        self.linear_in = Linear(input_dim, hidden_dim, key=key_linear_in)
        self.linear_out = Linear(hidden_dim, output_dim, key=key_linear_out)

        key, key_node_emb, key_weights, key_bias = jax.random.split(key, 4)
        self.node_embeddings = jax.random.normal(
            key_node_emb, (num_nodes, node_embed_dim)
        )
        self.weights_pool = jax.random.normal(
            key_weights, (node_embed_dim, cheb_k, hidden_dim, hidden_dim)
        )
        self.bias_pool = jax.random.normal(key_bias, (node_embed_dim, hidden_dim))

    def agc(self, z: jax.Array) -> jax.Array:
        """Adaptive graph convolution over learned supports."""
        sim = self.node_embeddings @ self.node_embeddings.T
        support = jax.nn.softmax(jax.nn.relu(sim), axis=1)

        eye = jnp.eye(self.num_nodes, dtype=z.dtype)
        support_set = [eye, support]
        for _ in range(2, self.cheb_k):
            support_set.append(2.0 * support @ support_set[-1] - support_set[-2])
        supports = jnp.stack(support_set, axis=0)  # (K, n, n)

        weights = jnp.einsum("nd,dkio->nkio", self.node_embeddings, self.weights_pool)
        bias = self.node_embeddings @ self.bias_pool

        x_g = jnp.einsum("knm,mc->knc", supports, z)
        x_g = jnp.transpose(x_g, (1, 0, 2))  # (n, K, c)
        return jnp.einsum("nki,nkio->no", x_g, weights) + bias

    def __call__(self, z: jax.Array) -> jax.Array:
        z = jax.vmap(self.linear_in)(z)
        z = jax.nn.relu(z)
        z = self.agc(z)
        z = jax.vmap(self.linear_out)(z)
        return jnp.tanh(z)
