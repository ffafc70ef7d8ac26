"""Graph operator normalisations applied to adjacency matrices before they
become the control path.

Reference: src/dataset/misc.py:16-113. Implemented in JAX so the operator map
over a (batch, events, n, n) stack is one vmapped XLA program
(dataset_configs.py:263-271 vmaps these per batch element and event).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zipf_smoothing(A: jax.Array) -> jax.Array:
    """D_out^{-1/2} (A+I) D_in^{-1/2} ("kipf"); misc.py:16-32."""
    A_prime = A + jnp.eye(A.shape[0], dtype=A.dtype)
    out_degree = A_prime.sum(1)
    in_degree = A_prime.sum(0)
    out_inv = jnp.where(out_degree != 0, out_degree**-0.5, 0.0)
    in_inv = jnp.where(in_degree != 0, in_degree**-0.5, 0.0)
    return out_inv[:, None] * A_prime * in_inv[None, :]


def normalized_plus(A: jax.Array) -> jax.Array:
    """Degrees from A but smoothing on A+I; misc.py:35-55."""
    out_degree = A.sum(1)
    in_degree = A.sum(0)
    out_inv = jnp.where(out_degree != 0, out_degree**-0.5, 0.0)
    in_inv = jnp.where(in_degree != 0, in_degree**-0.5, 0.0)
    A_prime = A + jnp.eye(A.shape[0], dtype=A.dtype)
    return out_inv[:, None] * A_prime * in_inv[None, :]


def normalized_laplacian(A: jax.Array) -> jax.Array:
    """I - D^{-1/2} (A+I) D^{-1/2}; misc.py:58-78.

    The reference takes ``power(deg, -0.5)`` without a zero guard here (adding
    self-loops makes degrees positive), so no guard is applied.
    """
    A = A + jnp.eye(A.shape[0], dtype=A.dtype)
    out_degree = A.sum(1)
    in_degree = A.sum(0)
    out_inv = out_degree**-0.5
    in_inv = in_degree**-0.5
    return jnp.eye(A.shape[0], dtype=A.dtype) - out_inv[:, None] * A * in_inv[None, :]


def normalized_adj(A: jax.Array) -> jax.Array:
    """D^{-1/2} (A+I) D^{-1/2} with degrees of A+I; misc.py:81-99."""
    A = A + jnp.eye(A.shape[0], dtype=A.dtype)
    out_degree = A.sum(1)
    in_degree = A.sum(0)
    out_inv = jnp.where(out_degree != 0, out_degree**-0.5, 0.0)
    in_inv = jnp.where(in_degree != 0, in_degree**-0.5, 0.0)
    return out_inv[:, None] * A * in_inv[None, :]


def get_graph_operator(operator_type: str, A: jax.Array, L: jax.Array) -> jax.Array:
    """Dispatcher (misc.py:102-113; default = normalized laplacian)."""
    operator_type = operator_type.lower()
    if operator_type == "lap":
        return L
    if operator_type == "kipf":
        return zipf_smoothing(A)
    if operator_type == "norm_adj":
        return normalized_adj(A)
    return normalized_laplacian(A)
