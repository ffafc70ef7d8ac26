"""Tiled fused-operator kernel (ops/pallas/tiled.py): parity vs the dense
oracle, gradient parity (custom VJP incl. the dw kernel), vmap batching, and
ragged-n masking -- all in interpret mode on the CPU test platform."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu import ops as ops_cfg
from gncde_tpu.ops import equiv_basis
from gncde_tpu.ops.pallas import tiled
from gncde_tpu.models.vector_fields import (
    PermEquivGraphVectorField,
    PermEquivDirGraphVectorField,
)
from gncde_tpu.interp import (
    backward_hermite_coefficients,
    CubicInterpolation,
    MatrixControl,
)
from gncde_tpu.nn import filter_value_and_grad


def _coeffs(n, T=5, seed=0, scale=0.3):
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(seed), (T, n, n)) * scale
    return ts, backward_hermite_coefficients(ts, A_path)


def _eval_AdA(coeffs, ts, t):
    idx, tau = tiled._interval(ts, t)
    d, c, b, a = [p[idx] for p in coeffs]
    A = ((d * tau + c) * tau + b) * tau + a
    dA = (3.0 * d * tau + 2.0 * c) * tau + b
    return A, dA


def test_abar_apply_matches_two_matmuls():
    n, H, tile = 50, 16, 64
    ts, coeffs = _coeffs(n)
    t = jnp.float32(0.37)
    idx, tau = tiled._interval(ts, t)
    slabs = tuple(p[idx] for p in coeffs)
    wA, wdA = tiled.hermite_weights(tau)
    w_row = 1.2 * wA + 0.8 * wdA
    w_col = 0.1 * wA - 0.4 * wdA
    NP = tiled._cdiv(n, tile) * tile
    M = jr.normal(jr.PRNGKey(1), (n, H))
    Mp = jnp.zeros((NP, H)).at[:n].set(M)

    got = tiled.tiled_abar_apply(slabs, w_row, w_col, Mp, tile)
    A, dA = _eval_AdA(coeffs, ts, t)
    B1 = (1.2 * A + 0.8 * dA).astype(jnp.bfloat16)
    B2 = (0.1 * A - 0.4 * dA).astype(jnp.bfloat16)
    Mb = M.astype(jnp.bfloat16)
    want = (jnp.dot(B1, Mb, preferred_element_type=jnp.float32)
            + jnp.dot(B2.T, Mb, preferred_element_type=jnp.float32))
    np.testing.assert_allclose(np.asarray(got[:n]), np.asarray(want),
                               rtol=0, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(got[n:]), 0.0)


def test_abar_apply_gradients_match_xla():
    """d/dM, d/dw through the custom VJP vs autodiff of the XLA formula."""
    n, H, tile = 40, 8, 64
    ts, coeffs = _coeffs(n, seed=3)
    t = jnp.float32(0.61)
    idx, tau = tiled._interval(ts, t)
    slabs = tuple(p[idx] for p in coeffs)
    NP = tiled._cdiv(n, tile) * tile
    M = jr.normal(jr.PRNGKey(4), (NP, H)) * jnp.concatenate(
        [jnp.ones((n, 1)), jnp.zeros((NP - n, 1))])

    def f_pallas(w_row, w_col, Mp):
        return jnp.sum(tiled.tiled_abar_apply(slabs, w_row, w_col, Mp, tile)
                       ** 2)

    def f_xla(w_row, w_col, Mp):
        stack = jnp.stack([s.astype(jnp.float32) for s in slabs])
        B1 = jnp.einsum("p,pij->ij", w_row, stack).astype(jnp.bfloat16)
        B2 = jnp.einsum("p,pij->ij", w_col, stack).astype(jnp.bfloat16)
        Mb = Mp[:n].astype(jnp.bfloat16)
        out = (jnp.dot(B1, Mb, preferred_element_type=jnp.float32)
               + jnp.dot(B2.T, Mb, preferred_element_type=jnp.float32))
        return jnp.sum(out ** 2)

    wA, wdA = tiled.hermite_weights(tau)
    w_row = 1.1 * wA + 0.5 * wdA
    w_col = -0.2 * wA + 0.3 * wdA
    g_p = jax.grad(f_pallas, argnums=(0, 1, 2))(w_row, w_col, M)
    g_x = jax.grad(f_xla, argnums=(0, 1, 2))(w_row, w_col, M)
    for name, a, b in zip(("dw_row", "dw_col", "dM"), g_p, g_x):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.max(np.abs(b)), 1e-6)
        if name == "dM":
            a = a[:n]
            b = b[:n]
        np.testing.assert_allclose(a / denom, b / denom, atol=3e-2,
                                   err_msg=name)


@pytest.mark.parametrize("n", [64, 70])  # exact and ragged tiling
def test_merged_backward_matches_oracle(n, monkeypatch):
    """The training-path backward (params perturbed, tau/planes not) routes
    through ONE merged plane sweep (_bwd2_call) whose dM / c_row / c_col
    cotangents match the f32 oracle within bf16-matmul tolerance."""
    H, tile = 8, 64
    ts, coeffs = _coeffs(n, seed=11)
    t = jnp.float32(0.5)
    idx, tau = tiled._interval(ts, t)
    slabs = tuple(p[idx] for p in coeffs)
    wA, wdA = tiled.hermite_weights(tau)
    NP = tiled._cdiv(n, tile) * tile
    M = jnp.zeros((NP, H)).at[:n].set(jr.normal(jr.PRNGKey(9), (n, H)))
    Af, dAf = _eval_AdA(coeffs, ts, t)
    A_h = jax.lax.stop_gradient(Af.astype(jnp.bfloat16))
    dA_h = jax.lax.stop_gradient(dAf.astype(jnp.bfloat16))
    c_row = jnp.array([1.3, 0.4])
    c_col = jnp.array([-0.2, 0.7])

    calls = {"merged": 0}
    orig = tiled._bwd2_call

    def counting(*a, **k):
        calls["merged"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(tiled, "_bwd2_call", counting)

    def loss(cr, cc, Mp):
        return jnp.sum(
            tiled.tiled_fused2(A_h, dA_h, slabs, wA, wdA, cr, cc, Mp, tile)
            ** 2)

    g_cr, g_cc, g_M = jax.grad(loss, argnums=(0, 1, 2))(c_row, c_col, M)
    assert calls["merged"] == 1  # the split kernels were NOT used

    out = tiled.tiled_fused2(A_h, dA_h, slabs, wA, wdA, c_row, c_col, M, tile)
    g_out = 2.0 * out
    B1 = c_row[0] * Af + c_row[1] * dAf
    B2 = c_col[0] * Af + c_col[1] * dAf
    o_M = jnp.zeros_like(M).at[:n].set(B1.T @ g_out[:n] + B2 @ g_out[:n])
    o_cr = jnp.stack([jnp.sum(Af * (g_out[:n] @ M[:n].T)),
                      jnp.sum(dAf * (g_out[:n] @ M[:n].T))])
    o_cc = jnp.stack([jnp.sum(Af * (M[:n] @ g_out[:n].T)),
                      jnp.sum(dAf * (M[:n] @ g_out[:n].T))])
    scale = float(jnp.max(jnp.abs(o_M))) + 1e-9
    np.testing.assert_allclose(np.asarray(g_M) / scale,
                               np.asarray(o_M) / scale, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(g_M[n:]), 0.0)
    for got, want in ((g_cr, o_cr), (g_cc, o_cc)):
        denom = float(jnp.max(jnp.abs(want))) + 1e-9
        np.testing.assert_allclose(np.asarray(got) / denom,
                                   np.asarray(want) / denom, atol=2e-2)


def _vf_setup(n, H=8, L=2, directed=False, seed=0):
    ts, coeffs = _coeffs(n, seed=seed)
    cls = PermEquivDirGraphVectorField if directed else PermEquivGraphVectorField
    vf = cls(input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
             data_embed_dim=1, num_nodes=n, idx_dim=4, key=jr.PRNGKey(7))
    Z = jr.normal(jr.PRNGKey(8), (n, H))
    return vf, ts, coeffs, Z


@pytest.mark.parametrize("directed", [False, True])
@pytest.mark.parametrize("n,tile", [(48, 64), (70, 64)])
def test_tiled_vf_eval_matches_dense_path(directed, n, tile):
    vf, ts, coeffs, Z = _vf_setup(n, directed=directed)
    t = jnp.float32(0.44)
    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))
    ops_cfg.set_fusion_backend("dense")
    ref = vf(t, Z, ctrl)
    got = tiled.tiled_vf_eval(coeffs, ts, t, Z, vf, tile=tile)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-2)


def test_tiled_vf_eval_cached_reductions_match():
    vf, ts, coeffs, Z = _vf_setup(64)
    red = tiled.cubic_plane_reductions(coeffs)
    t = jnp.float32(0.18)
    a = tiled.tiled_vf_eval(coeffs, ts, t, Z, vf, tile=64)
    b = tiled.tiled_vf_eval(coeffs, ts, t, Z, vf, red=red, tile=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-4)


def test_tiled_vf_eval_grads_match_dense_path():
    vf, ts, coeffs, Z = _vf_setup(48, L=2)
    t = jnp.float32(0.52)
    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))

    def loss_tiled(v, Z_):
        return jnp.sum(tiled.tiled_vf_eval(coeffs, ts, t, Z_, v, tile=64) ** 2)

    def loss_dense(v, Z_):
        ops_cfg.set_fusion_backend("dense")
        return jnp.sum(v(t, Z_, ctrl) ** 2)

    (_, gZ_t), gv_t = (
        jax.value_and_grad(loss_tiled, argnums=1)(vf, Z),
        filter_value_and_grad(lambda v: loss_tiled(v, Z))(vf)[1],
    )
    (_, gZ_d), gv_d = (
        jax.value_and_grad(loss_dense, argnums=1)(vf, Z),
        filter_value_and_grad(lambda v: loss_dense(v, Z))(vf)[1],
    )
    scale = float(jnp.max(jnp.abs(gZ_d))) + 1e-9
    np.testing.assert_allclose(np.asarray(gZ_t) / scale,
                               np.asarray(gZ_d) / scale, atol=3e-2)
    for a, b in zip(jax.tree_util.tree_leaves(gv_t),
                    jax.tree_util.tree_leaves(gv_d)):
        if a is None or b is None:
            assert a is None and b is None
            continue
        denom = max(float(jnp.max(jnp.abs(b))), 1e-4)
        np.testing.assert_allclose(np.asarray(a) / denom,
                                   np.asarray(b) / denom, atol=5e-2)


def test_tiled_vf_eval_time_gradient_matches_dense():
    """d/dt flows through the O(4) hermite-weight chain (tiled_fused2's wA/wdA
    cotangents), never an (n, n) plane cotangent."""
    vf, ts, coeffs, Z = _vf_setup(48)
    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))

    def f_tiled(t):
        return jnp.sum(tiled.tiled_vf_eval(coeffs, ts, t, Z, vf, tile=64) ** 2)

    def f_dense(t):
        ops_cfg.set_fusion_backend("dense")
        return jnp.sum(vf(t, Z, ctrl) ** 2)

    g_t = float(jax.grad(f_tiled)(jnp.float32(0.52)))
    g_d = float(jax.grad(f_dense)(jnp.float32(0.52)))
    assert abs(g_t - g_d) / (abs(g_d) + 1e-6) < 3e-2


def test_tiled_vf_eval_vmap_batches():
    vf, ts, coeffs, Z = _vf_setup(48)
    B = 3
    coeffs_b = tuple(jnp.stack([c * (1.0 + 0.1 * i) for i in range(B)])
                     for c in coeffs)
    Z_b = jnp.stack([Z * (1.0 - 0.2 * i) for i in range(B)])
    t = jnp.float32(0.3)

    def one(cf, z):
        return tiled.tiled_vf_eval(cf, ts, t, z, vf, tile=64)

    batched = jax.vmap(one)(coeffs_b, Z_b)
    for i in range(B):
        single = one(tuple(c[i] for c in coeffs_b), Z_b[i])
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), rtol=0, atol=1e-5)


def test_fields_dispatch_routes_large_n_to_tiled(monkeypatch):
    """fields.py sends n > MEGAKERNEL_MAX_N through the tiled path when the
    megakernel backend is active (the round-2 gap: silent dense fallback)."""
    from gncde_tpu.ops.pallas import megakernel as mk

    monkeypatch.setattr(mk, "MEGAKERNEL_MAX_N", 32)
    n = 48
    vf, ts, coeffs, Z = _vf_setup(n)
    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))
    ops_cfg.set_fusion_backend("dense")
    ref = vf(0.41, Z, ctrl)
    called = {}
    orig = tiled.tiled_vf_eval

    def spy(*args, **kw):
        called["yes"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(tiled, "tiled_vf_eval", spy)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        got = vf(0.41, Z, ctrl)
    finally:
        ops_cfg.set_fusion_backend("dense")
    assert called.get("yes"), "tiled path was not dispatched"
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-2)


def test_control_reduction_cache_built_for_large_n(monkeypatch):
    """make_control caches PlaneReductions on the control for large graphs."""
    from gncde_tpu.ops.pallas import megakernel as mk
    from gncde_tpu.models.continuous import make_control

    monkeypatch.setattr(mk, "MEGAKERNEL_MAX_N", 16)
    n, T = 24, 5
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(0), (T, n, n))
    t_idx = jnp.broadcast_to(ts[:, None, None], (T, n, n))
    X = jnp.stack([t_idx, A_path], axis=-1)
    coeffs = backward_hermite_coefficients(ts, X)
    ops_cfg.set_fusion_backend("megakernel")
    try:
        ctrl = make_control("cubic", ts, coeffs, slim=True)
    finally:
        ops_cfg.set_fusion_backend("dense")
    assert ctrl.red is not None
    np.testing.assert_allclose(
        np.asarray(ctrl.red.rs[0]),
        np.asarray(jnp.stack(
            [jnp.sum(c[0, ..., -1].astype(jnp.float32), axis=-1)
             for c in coeffs], axis=-1)),
        rtol=2e-2, atol=1e-3,
    )
