"""BCSR model path: control parity vs dense, fused-apply parity vs the
dense oracle, gradients, vf-level dispatch, and a scaled-n train loop
(VERDICT r3 item 4: BCSR gets a production consumer)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gncde_tpu.interp import (
    BCSRMatrixControl,
    MatrixControl,
    CubicInterpolation,
    SparseMatrixControl,
    backward_hermite_coefficients,
)
from gncde_tpu.ops import bcsr as B
from gncde_tpu.ops import equiv_basis


def _banded_path(n, bw, T=5, seed=0):
    rng = np.random.default_rng(seed)
    i, j = np.indices((n, n))
    mask = np.abs(i - j) <= bw
    A = np.where(mask, 0.1 * rng.random((T, n, n)), 0.0).astype(np.float32)
    return jnp.linspace(0.0, 1.0, T), jnp.asarray(A)


def _dense_of(val: B.BCSRVal) -> np.ndarray:
    return np.asarray(
        B.bcsr_to_dense(B.BCSR(val.layout.block_idx, val.blocks, val.layout.n))
    )


def test_bcsr_control_matches_dense_control():
    ts, A_path = _banded_path(50, 5)
    ctrl = BCSRMatrixControl.from_knots(ts, A_path, "cubic", block_size=16)
    coeffs = backward_hermite_coefficients(ts, A_path)
    dense = MatrixControl(CubicInterpolation(ts, coeffs))
    for t in (0.13, 0.5, 0.87):
        np.testing.assert_allclose(
            _dense_of(ctrl.adj(t)), np.asarray(dense.adj(t)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            _dense_of(ctrl.dadj(t)), np.asarray(dense.dadj(t)),
            rtol=1e-4, atol=1e-4,
        )
        # Transposed-layout values represent exactly A(t)^T.
        val = ctrl.adj(t)
        np.testing.assert_allclose(
            np.asarray(B.bcsr_to_dense(
                B.BCSR(val.layout.block_idx_T, val.blocks_T, val.layout.n)
            )),
            np.asarray(dense.adj(t)).T, rtol=1e-5, atol=1e-5,
        )


def _params(key, directed=False):
    count = 11 if directed else 8
    return [
        1 / 15 * jr.uniform(k, (2,), minval=-1.0, maxval=1.0)
        for k in jr.split(key, count)
    ]


def test_bcsr_fused_apply_matches_dense_oracle():
    ts, A_path = _banded_path(60, 7, seed=1)
    ctrl = BCSRMatrixControl.from_knots(ts, A_path, "cubic", block_size=16)
    coeffs = backward_hermite_coefficients(ts, A_path)
    dense = MatrixControl(CubicInterpolation(ts, coeffs))
    M = jr.normal(jr.PRNGKey(2), (60, 8))
    for directed in (False, True):
        params = _params(jr.PRNGKey(3), directed)
        t = 0.41
        got = (
            B.bcsr_fused_apply_directed if directed else B.bcsr_fused_apply
        )(ctrl.adj(t), ctrl.dadj(t), M, params, add_identity=True)
        ref = equiv_basis.fused_apply(
            jnp.asarray(dense.adj(t)), jnp.asarray(dense.dadj(t)), M, params,
            add_identity=True, directed=directed,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_bcsr_fused_apply_gradients_match_dense():
    ts, A_path = _banded_path(40, 5, seed=4)
    ctrl = BCSRMatrixControl.from_knots(ts, A_path, "cubic", block_size=16)
    coeffs = backward_hermite_coefficients(ts, A_path)
    dense = MatrixControl(CubicInterpolation(ts, coeffs))
    M = jr.normal(jr.PRNGKey(5), (40, 8))
    params = _params(jr.PRNGKey(6))
    t = 0.37

    def loss_bcsr(M_, params_):
        out = B.bcsr_fused_apply(
            ctrl.adj(t), ctrl.dadj(t), M_, params_, add_identity=True
        )
        return jnp.sum(out**2)

    def loss_dense(M_, params_):
        out = equiv_basis.fused_apply(
            jnp.asarray(dense.adj(t)), jnp.asarray(dense.dadj(t)), M_,
            params_, add_identity=True,
        )
        return jnp.sum(out**2)

    gM, gp = jax.grad(loss_bcsr, argnums=(0, 1))(M, params)
    gM_r, gp_r = jax.grad(loss_dense, argnums=(0, 1))(M, params)
    np.testing.assert_allclose(np.asarray(gM), np.asarray(gM_r),
                               rtol=1e-3, atol=1e-3)
    for a, b in zip(gp, gp_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_vf_through_bcsr_control_matches_dense():
    """PermEquivGraphVectorField dispatches on BCSRVal; the full layer stack
    (and its gradient) matches the dense control."""
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.nn import filter_value_and_grad

    n, H, L = 48, 8, 2
    ts, A_path = _banded_path(n, 5, seed=7)
    ctrl = BCSRMatrixControl.from_knots(ts, A_path, "cubic", block_size=16)
    coeffs = backward_hermite_coefficients(ts, A_path)
    dense = MatrixControl(CubicInterpolation(ts, coeffs))
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(8),
    )
    Z = jr.normal(jr.PRNGKey(9), (n, H))
    got = vf(0.29, Z, ctrl)
    ref = vf(0.29, Z, dense)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss(v, c):
        return jnp.sum(v(0.29, Z, c) ** 2)

    _, g_b = filter_value_and_grad(loss)(vf, ctrl)
    _, g_d = filter_value_and_grad(loss)(vf, dense)
    for a, b in zip(jax.tree_util.tree_leaves(g_b),
                    jax.tree_util.tree_leaves(g_d)):
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_bcsr_train_loop_scaled_n8192():
    """Gradient-descent training THROUGH the BCSR kernels at n=8192 banded
    (the regime where the block kernels win 13-36x on TPU; CPU runs the XLA
    reference dispatch of the same ops). Memory stays O(stored blocks): no
    dense n^2 object is ever materialised inside the step."""
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.nn import apply_updates, filter_value_and_grad
    from gncde_tpu.solve import ODETerm, SaveAt, ConstantStepSize, diffeqsolve

    n, H, bw = 8192, 4, 2
    T = 3
    rng = np.random.default_rng(10)
    i = np.arange(n)
    offs = [0, 1, 2, -1, -2]
    A = np.zeros((T, n, n), np.float32)
    for t in range(T):
        for o in offs:
            idx = (i, (i + o) % n)
            A[t][idx] = 0.1 * rng.random(n)
    ts = jnp.linspace(0.0, 1.0, T)
    ctrl = BCSRMatrixControl.from_knots(ts, jnp.asarray(A), "cubic",
                                        block_size=128)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(11),
    )
    y0 = jr.normal(jr.PRNGKey(12), (n, H)) * 0.1

    def loss_fn(model):
        sol = diffeqsolve(
            ODETerm(model), "Heun", t0=0.0, t1=1.0, dt0=0.25, y0=y0,
            args=ctrl, stepsize_controller=ConstantStepSize(),
            saveat=SaveAt(t1=True), max_steps=8,
        )
        return jnp.mean(sol.ys**2)

    step = jax.jit(
        lambda m: filter_value_and_grad(loss_fn)(m)
    )
    losses = []
    model = vf
    for _ in range(2):
        loss, grads = step(model)
        losses.append(float(loss))
        updates = jax.tree_util.tree_map(
            lambda g: None if g is None else -1e-2 * g, grads,
            is_leaf=lambda x: x is None,
        )
        model = apply_updates(model, updates)
    assert all(np.isfinite(losses)), losses
    assert losses[1] != losses[0]  # parameters actually moved


def test_bcsr_allclose_vs_ell_through_vf():
    """Same banded problem through the BCSR control and the ELL control:
    the two sparse formats agree through the full vf stack."""
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField

    n, H = 64, 8
    ts, A_path = _banded_path(n, 4, seed=13)
    b_ctrl = BCSRMatrixControl.from_knots(ts, A_path, "cubic", block_size=16)
    e_ctrl = SparseMatrixControl.from_knots(ts, A_path, "cubic")
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(14),
    )
    Z = jr.normal(jr.PRNGKey(15), (n, H))
    got = vf(0.61, Z, b_ctrl)
    ref = vf(0.61, Z, e_ctrl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_blocked_fill_ratio_detection():
    n = 256
    i, j = np.indices((n, n))
    banded = np.abs(i - j) <= 24
    rng = np.random.default_rng(0)
    uniform = rng.random((n, n)) < 0.01
    # bw=24 at bs=64 stores ~3 blocks/row at ~0.25 capacity fill -- well
    # above the 0.1 routing threshold; uniform 1% sits at ~its density.
    assert B.blocked_fill_ratio(banded, 64) > 0.2
    assert B.blocked_fill_ratio(uniform, 64) < 0.05


def test_from_stacked_linear_batched_heterogeneous_patterns():
    """Batched LINEAR controls with different per-element block patterns
    must widen to one shared slot count before tree-stacking (regression:
    the linear branch skipped the widening the cubic branch had)."""
    n, T, batch, bs = 64, 4, 2, 16
    i, j = np.indices((n, n))
    knots = np.zeros((batch, T, n, n), np.float32)
    knots[0][:, np.abs(i - j) <= 2] = 0.5       # narrow band: kb small
    knots[1][:, np.abs(i - j) <= 30] = 0.5      # wide band: kb larger
    ts = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (batch, T))
    t_idx = np.broadcast_to(
        np.arange(T, dtype=np.float32)[:, None, None], (T, n, n)
    )
    stacked = jnp.asarray(np.stack(
        [np.stack([t_idx, knots[b]], axis=-1) for b in range(batch)]
    ))
    ctrl = BCSRMatrixControl.from_stacked("linear", ts, stacked,
                                          block_size=bs)
    # Elements stacked under one widened slot count; the control vmaps and
    # each element's A(0) reproduces its own knot values.
    assert ctrl.path.knots.shape[0] == batch
    blocks0 = jax.vmap(lambda c: c.adj(jnp.float32(0.0)).blocks)(ctrl)
    assert blocks0.shape[0] == batch
    for b in range(batch):
        lay = jax.tree_util.tree_map(lambda x: x[b], ctrl.path.layout)
        dense = B.bcsr_to_dense(B.BCSR(lay.block_idx, blocks0[b], n))
        np.testing.assert_allclose(np.asarray(dense), knots[b, 0],
                                   rtol=1e-5, atol=1e-5)


def test_auto_routing_static_banded_graph():
    """'auto' must route a STATIC banded graph (constant edge weights ->
    zero d/c planes) to BCSR at scaled n (regression: the statistic was
    computed from the d plane only and saw an empty mask)."""
    from gncde_tpu.interp import build_sparse_control
    from gncde_tpu.interp.bcsr_paths import BCSRMatrixControl as BC

    n, T = 2048, 4
    i, j = np.indices((n, n))
    A = np.where(np.abs(i - j) <= 48, 0.5, 0.0).astype(np.float32)
    A_path = np.broadcast_to(A, (T, n, n))  # constant in time
    ts = jnp.linspace(0.0, 1.0, T)
    t_idx = np.broadcast_to(np.asarray(ts)[:, None, None], (T, n, n))
    stacked = jnp.asarray(np.stack([t_idx, A_path], axis=-1))
    coeffs = backward_hermite_coefficients(ts, stacked)
    ctrl = build_sparse_control("cubic", ts, coeffs, sparse_format="auto",
                                block_size=128)
    assert isinstance(ctrl, BC), type(ctrl)


def _random_edges(n, nnz, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, nnz)
    dst = rng.integers(0, n, nnz)
    w = rng.uniform(0.1, 1.0, nnz).astype(np.float32)
    return src, dst, w


def test_bcsr_from_edges_matches_dense_route():
    """O(nnz) edge-list construction (C++ fast path) == bcsr_from_dense of
    the accumulated dense adjacency, both layouts and counts."""
    n, bs = 100, 16
    src, dst, w = _random_edges(n, 400, seed=0)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (src, dst), w)

    got = B.bcsr_from_edges(src, dst, w, n, block_size=bs)
    ref = B.bcsr_from_dense(dense, block_size=bs)
    np.testing.assert_array_equal(np.asarray(got.block_idx),
                                  np.asarray(ref.block_idx))
    np.testing.assert_array_equal(np.asarray(got.nblocks),
                                  np.asarray(ref.nblocks))
    np.testing.assert_allclose(np.asarray(B.bcsr_to_dense(got)), dense,
                               rtol=1e-6, atol=1e-6)


def test_bcsr_from_edges_numpy_fallback_matches_native(monkeypatch):
    """The numpy fallbacks compute exactly what the C++ kernels compute."""
    from gncde_tpu import native

    n, bs = 70, 16
    src, dst, w = _random_edges(n, 300, seed=1)
    got_native = B.bcsr_from_edges(src, dst, w, n, block_size=bs)
    monkeypatch.setattr(native, "bcsr_pattern_native",
                        lambda *a, **k: None)
    monkeypatch.setattr(native, "bcsr_scatter_native",
                        lambda *a, **k: None)
    got_np = B.bcsr_from_edges(src, dst, w, n, block_size=bs)
    np.testing.assert_array_equal(np.asarray(got_native.block_idx),
                                  np.asarray(got_np.block_idx))
    np.testing.assert_allclose(np.asarray(got_native.blocks),
                               np.asarray(got_np.blocks),
                               rtol=1e-6, atol=1e-6)


def test_bcsr_control_from_edge_snapshots_matches_dense_route():
    """The O(nnz) edge-snapshot control == from_knots of the accumulated
    dense knots (cubic AND linear), at every queried t -- including knots
    whose edge sets differ (union pattern)."""
    from gncde_tpu.interp import bcsr_control_from_edge_snapshots

    n, bs, T = 60, 16, 4
    snaps, dense_knots = [], []
    for t in range(T):
        src, dst, w = _random_edges(n, 150 + 40 * t, seed=10 + t)
        snaps.append((src, dst, w))
        d = np.zeros((n, n), np.float32)
        np.add.at(d, (src, dst), w)
        dense_knots.append(d)
    ts = jnp.linspace(0.0, 1.0, T)
    for interp in ("cubic", "linear"):
        got = bcsr_control_from_edge_snapshots(
            ts, snaps, n, block_size=bs, interpolation=interp
        )
        ref = BCSRMatrixControl.from_knots(
            ts, jnp.asarray(np.stack(dense_knots)), interp, block_size=bs
        )
        for t in (0.15, 0.6, 0.95):
            a = B.bcsr_to_dense(
                B.BCSR(got.path.layout.block_idx, got.adj(t).blocks, n)
            )
            b = B.bcsr_to_dense(
                B.BCSR(ref.path.layout.block_idx, ref.adj(t).blocks, n)
            )
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
            aT = B.bcsr_to_dense(
                B.BCSR(got.path.layout.block_idx_T, got.adj(t).blocks_T, n)
            )
            np.testing.assert_allclose(np.asarray(aT), np.asarray(a).T,
                                       rtol=1e-4, atol=1e-5)
