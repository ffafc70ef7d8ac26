"""Node-index encoder producing all-pairs concatenated embeddings.

Reference: src/models/neural_nets/idx_encoder.py (emb/linear/mlp variants;
output shape (n, n, 2*d)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn import Module, Linear, MLP, Embedding, static_field


class IdxEncoder(Module):
    type: str = static_field()
    num_nodes: int = static_field()
    module: object

    def __init__(self, num_nodes: int, out_channels: int, *, key, type: str = "mlp"):
        self.type = type
        self.num_nodes = num_nodes
        if type == "linear":
            self.module = Linear(1, out_channels, key=key)
        elif type == "mlp":
            self.module = MLP(
                in_size=1, out_size=out_channels, width_size=8, depth=2, key=key
            )
        elif type == "emb":
            self.module = Embedding(num_nodes, out_channels, key=key)
        else:
            raise ValueError(f"Unknown idx encoder type {type!r}")

    def node_embedding(self) -> jax.Array:
        """Per-node embeddings (n, d) -- the factored form consumers use
        (vector_fields._modulate_matrix decomposes the pairwise concat's
        first affine layer, so the (n, n, 2d) product never materialises)."""
        n = self.num_nodes
        if self.type == "emb":
            return jax.vmap(self.module)(jnp.arange(n))
        return jax.vmap(self.module)(jnp.arange(n, dtype=jnp.float32)[:, None])

    def __call__(self) -> jax.Array:
        """Reference-shape output: all-pairs concat (n, n, 2d)
        (idx_encoder.py reference semantics; kept for parity tests --
        O(n^2 d) memory, prefer :meth:`node_embedding`)."""
        emb = self.node_embedding()
        n = self.num_nodes
        emb_i = jnp.repeat(emb[:, None, :], n, axis=1)  # (n, n, d)
        emb_j = jnp.repeat(emb[None, :, :], n, axis=0)  # (n, n, d)
        return jnp.concatenate([emb_i, emb_j], axis=-1)
