"""Fused backward megakernel (ops/pallas/megakernel_bwd.py) parity.

The layer-parameter cotangents are already covered by
test_megakernel.py::test_*_gradients_match (which now exercises the fused
backward). These tests pin the remaining cotangents -- dZ, dt -- and the
raw kernel against ``jax.vjp`` of the dense XLA chain with an arbitrary
output cotangent.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from gncde_tpu import ops as ops_cfg
from gncde_tpu.models.vector_fields import (
    PermEquivDirGraphVectorField,
    PermEquivGraphVectorField,
)
from gncde_tpu.interp import (
    backward_hermite_coefficients,
    CubicInterpolation,
    MatrixControl,
)


def _setup(directed=False, n=24, T=6, H=8, L=2):
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(7 if directed else 6), (T, n, n)) * 0.1
    coeffs = backward_hermite_coefficients(ts, A_path)
    cls = PermEquivDirGraphVectorField if directed else PermEquivGraphVectorField
    vf = cls(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(8),
    )
    Z = jr.normal(jr.PRNGKey(9), (n, H))
    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))
    return vf, ctrl, Z, ts, coeffs


def _grad_z_t(vf, ctrl, Z):
    def loss(Z_, t_):
        return jnp.sum(vf(t_, Z_, ctrl) ** 2)

    return jax.grad(loss, argnums=(0, 1))(Z, jnp.float32(0.43))


def test_dZ_dt_cotangents_match_dense():
    vf, ctrl, Z, _, _ = _setup()
    dZ_ref, dt_ref = _grad_z_t(vf, ctrl, Z)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            dZ, dt = _grad_z_t(vf, ctrl, Z)
    finally:
        ops_cfg.set_fusion_backend("dense")
    np.testing.assert_allclose(np.asarray(dZ), np.asarray(dZ_ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(float(dt), float(dt_ref), rtol=2e-3)


def test_directed_dZ_dt_cotangents_match_dense():
    vf, ctrl, Z, _, _ = _setup(directed=True)
    dZ_ref, dt_ref = _grad_z_t(vf, ctrl, Z)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            dZ, dt = _grad_z_t(vf, ctrl, Z)
    finally:
        ops_cfg.set_fusion_backend("dense")
    np.testing.assert_allclose(np.asarray(dZ), np.asarray(dZ_ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(float(dt), float(dt_ref), rtol=2e-3)


def test_raw_kernel_matches_xla_vjp():
    """megakernel_vf_bwd against jax.vjp of the equivalent XLA chain with a
    random (not loss-derived) output cotangent."""
    from gncde_tpu.ops.pallas import megakernel as mk
    from gncde_tpu.ops.pallas import megakernel_bwd as mkb

    vf, ctrl, Z, ts, coeffs = _setup()
    slim = tuple(c for c in coeffs)
    t = jnp.float32(0.57)
    g = jr.normal(jr.PRNGKey(11), Z.shape)

    idx, _ = mk._interval(ts, t)

    def f(t_, Z_, vf_):
        tau_ = t_ - ts[idx]
        return mk._xla_reference(slim, idx, tau_, Z_, vf_)

    _, pull = jax.vjp(f, t, Z, vf)
    dt_ref, dZ_ref, dvf_ref = pull(g)

    with pltpu.force_tpu_interpret_mode():
        dt, dZ, dvf = mkb.megakernel_vf_bwd(slim, ts, t, Z, vf, g)

    np.testing.assert_allclose(float(dt), float(dt_ref), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(dZ), np.asarray(dZ_ref),
                               atol=1e-4, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(dvf),
                    jax.tree_util.tree_leaves(dvf_ref)):
        if a is None or getattr(a, "dtype", None) == jax.dtypes.float0:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_train_step_through_fused_backward():
    """A full value_and_grad + update through the megakernel backend stays
    finite and moves the loss (the production training configuration)."""
    from gncde_tpu.nn import apply_updates, filter_value_and_grad

    vf, ctrl, Z, _, _ = _setup()

    def loss(v):
        return jnp.mean(v(0.31, Z, ctrl) ** 2)

    ops_cfg.set_fusion_backend("megakernel")
    try:
        with pltpu.force_tpu_interpret_mode():
            l0, grads = filter_value_and_grad(loss)(vf)
            updates = jax.tree_util.tree_map(
                lambda g: None if g is None else -1e-2 * g, grads,
                is_leaf=lambda x: x is None,
            )
            vf2 = apply_updates(vf, updates)
            l1 = loss(vf2)
    finally:
        ops_cfg.set_fusion_backend("dense")
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert float(l1) < float(l0)
