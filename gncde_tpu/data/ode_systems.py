"""Ground-truth dynamical systems for synthetic data generation -- pure JAX.

The reference implements these as a mix of JAX and torch ``nn.Module``s
evaluated under diffrax (src/dataset/ode_models/*.py); here they are plain
closures over the graph operator so the whole ground-truth solve is one
jit/vmap-able XLA program.

Systems (reference file:line):
  * heat:        dX/dt = -k L X                      (heat_diffusion_model.py:6-33)
  * gene:        dx = -b x^f + A (x^h / (1 + x^h))   (gene_dynamic_model.py:38-57)
  * mutualistic: dx = b + x(1-x/k)(x/c-1)
                 + sum_j A_ij x_i x_j/(d+e x_i+h x_j) (mutualistic_dynamic_model.py:62-127)
  * sir:         networked SIR over channels [S,I,R]  (sir_model.py:133-158)

Note on the reference's gene formula: the code computes
``(A @ x^h) / (x^h + 1)`` (elementwise division AFTER aggregation), which
differs from the docstring's ``sum_j A_ij x_j^h/(1+x_j^h)``. We reproduce the
code's behaviour (that is what generated the reference's data).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp


def heat_diffusion(L: jax.Array, k: float = 1.0):
    def vf(t, x, args=None):
        return -k * (L @ x)

    return vf


def gene_dynamics(A: jax.Array, b: float = 1.0, f: float = 1.0, h: float = 2.0):
    def vf(t, x, args=None):
        xh = x**h
        return -b * (x**f) + (A @ xh) / (xh + 1.0)

    return vf


def mutualistic_dynamics(
    A: jax.Array,
    b: float = 0.1,
    k: float = 5.0,
    c: float = 1.0,
    d: float = 5.0,
    e: float = 0.9,
    h: float = 0.1,
):
    def vf(t, x, args=None):
        # x: (n, 1). Interaction term vectorised over the dense adjacency:
        # sum_j A_ij * x_i x_j / (d + e x_i + h x_j).
        f_local = b + x * (1 - x / k) * (x / c - 1)
        xi = x  # (n, 1)
        xj = x.T  # (1, n)
        pair = (xi * xj) / (d + e * xi + h * xj)  # (n, n)
        interaction = jnp.sum(A * pair, axis=1, keepdims=True)
        return f_local + interaction

    return vf


def sir_dynamics(A: jax.Array, beta: float, gamma: float):
    def vf(t, x, args=None):
        # x: (n, 3) channels [S, I, R].
        S, I = x[:, 0], x[:, 1]
        infection = beta * S * (A @ I)
        dS = -infection
        dI = infection - gamma * I
        dR = gamma * I
        return jnp.stack([dS, dI, dR], axis=1)

    return vf


def make_system(
    name: str, A: jax.Array, L: jax.Array, beta: float = 0.0, gamma: float = 0.0
):
    name = name.lower()
    if name == "heat":
        return heat_diffusion(L, 1.0)
    if name == "gene":
        return gene_dynamics(A, 1.0)
    if name == "mutualistic":
        return mutualistic_dynamics(A)
    if name == "sir":
        return sir_dynamics(A, beta, gamma)
    raise ValueError(f"ODE system {name!r} is not supported")


def state_channels(name: str) -> int:
    return 3 if name.lower() == "sir" else 1
