"""Megakernel (fused vf eval) parity vs the XLA path, interpret mode."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from gncde_tpu import ops as ops_cfg
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.interp import (
    backward_hermite_coefficients,
    CubicInterpolation,
    MatrixControl,
)
from gncde_tpu.nn import filter_value_and_grad


def _setup(n=24, T=6, H=8, L=2):
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(0), (T, n, n)) * 0.1
    coeffs = backward_hermite_coefficients(ts, A_path)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(1),
    )
    Z = jr.normal(jr.PRNGKey(2), (n, H))
    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))
    return vf, ctrl, Z


def test_megakernel_matches_dense_backend():
    vf, ctrl, Z = _setup()
    ref = vf(0.41, Z, ctrl)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            got = vf(0.41, Z, ctrl)
    finally:
        ops_cfg.set_fusion_backend("dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_megakernel_gradients_match():
    vf, ctrl, Z = _setup()

    def loss(v):
        return jnp.sum(v(0.41, Z, ctrl) ** 2)

    _, ref_grads = filter_value_and_grad(loss)(vf)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            _, got_grads = filter_value_and_grad(loss)(vf)
    finally:
        ops_cfg.set_fusion_backend("dense")
    for a, b in zip(
        jax.tree_util.tree_leaves(got_grads), jax.tree_util.tree_leaves(ref_grads)
    ):
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def _setup_batched(n=24, T=6, H=8, L=2, B=3):
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(7), (B, T, n, n)) * 0.1
    coeffs = jax.vmap(lambda x: backward_hermite_coefficients(ts, x))(A_path)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(8),
    )
    Z = jr.normal(jr.PRNGKey(9), (B, n, H))
    return vf, ts, coeffs, Z


def test_batched_megakernel_matches_dense():
    """Under the loss-level batch vmap the forward runs as ONE batch-grid
    pallas_call with scalar-prefetch in-kernel plane DMA
    (megakernel._forward_batched) -- parity vs the vmapped dense backend."""
    vf, ts, coeffs, Z = _setup_batched()

    def f(v, coeffs_i, Z_i):
        ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i))
        return v(0.41, Z_i, ctrl)

    ref = jax.vmap(lambda c, z: f(vf, c, z))(coeffs, Z)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            got = jax.vmap(lambda c, z: f(vf, c, z))(coeffs, Z)
    finally:
        ops_cfg.set_fusion_backend("dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_batched_megakernel_gradients_match():
    """The batched cotangent runs as ONE batch-grid backward pallas_call
    (megakernel_bwd.bwd_call_batched); per-element dZ and the batch-summed
    parameter cotangents must match the vmapped dense backend."""
    vf, ts, coeffs, Z = _setup_batched()

    def loss(v, Z_):
        def f(coeffs_i, Z_i):
            ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i))
            return v(0.41, Z_i, ctrl)

        return jnp.sum(jax.vmap(f)(coeffs, Z_) ** 2)

    ref_val, ref_grads = filter_value_and_grad(loss)(vf, Z)
    ref_dZ = jax.grad(lambda z: loss(vf, z))(Z)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            got_val, got_grads = filter_value_and_grad(loss)(vf, Z)
            got_dZ = jax.grad(lambda z: loss(vf, z))(Z)
    finally:
        ops_cfg.set_fusion_backend("dense")
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dZ), np.asarray(ref_dZ),
                               atol=1e-3, rtol=1e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(got_grads), jax.tree_util.tree_leaves(ref_grads)
    ):
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def _setup_dir(n=24, T=6, H=8, L=2):
    from gncde_tpu.models.vector_fields import PermEquivDirGraphVectorField

    ts = jnp.linspace(0.0, 1.0, T)
    # Directed: non-symmetric path.
    A_path = jr.uniform(jr.PRNGKey(3), (T, n, n)) * 0.1
    coeffs = backward_hermite_coefficients(ts, A_path)
    vf = PermEquivDirGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(4),
    )
    Z = jr.normal(jr.PRNGKey(5), (n, H))
    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))
    return vf, ctrl, Z


def test_directed_megakernel_matches_dense_backend():
    vf, ctrl, Z = _setup_dir()
    ref = vf(0.37, Z, ctrl)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            got = vf(0.37, Z, ctrl)
    finally:
        ops_cfg.set_fusion_backend("dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_directed_megakernel_gradients_match():
    vf, ctrl, Z = _setup_dir()

    def loss(v):
        return jnp.sum(v(0.37, Z, ctrl) ** 2)

    _, ref_grads = filter_value_and_grad(loss)(vf)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            _, got_grads = filter_value_and_grad(loss)(vf)
    finally:
        ops_cfg.set_fusion_backend("dense")
    for a, b in zip(
        jax.tree_util.tree_leaves(got_grads), jax.tree_util.tree_leaves(ref_grads)
    ):
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)
