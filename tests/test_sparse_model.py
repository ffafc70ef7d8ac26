"""Sparse (ELL) path end-to-end: SDDMM, directed apply, sparse controls,
layer/model dispatch, and a scaled-n (4096, ~1% density) oracle parity check
where the dense operator would be 64MB/eval. VERDICT item 2."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.random as jr

from gncde_tpu.ops import equiv_basis
from gncde_tpu.ops.sparse import (
    ELL,
    ell_from_dense,
    ell_spmm,
    ell_spmm_t,
    ell_sddmm,
    sparse_fused_apply,
    sparse_fused_apply_directed,
)
from gncde_tpu.interp import MatrixControl, SparseMatrixControl
from gncde_tpu.interp.paths import backward_hermite_coefficients


def _sparse_matrix(key, n, density=0.1):
    vals = jr.uniform(key, (n, n))
    mask = jr.uniform(jr.fold_in(key, 1), (n, n)) < density
    return jnp.where(mask, vals, 0.0)


def _params(key, count):
    return [
        1 / 15 * jr.uniform(k, (2,), minval=-1.0, maxval=1.0)
        for k in jr.split(key, count)
    ]


def test_sddmm_matches_dense():
    n, H = 40, 8
    A = np.array(_sparse_matrix(jr.PRNGKey(0), n, 0.2))
    ell = ell_from_dense(A)
    X = jr.normal(jr.PRNGKey(1), (n, H))
    Y = jr.normal(jr.PRNGKey(2), (n, H))
    got = ell_sddmm(ell.indices, X, Y)
    dense = X @ Y.T
    rows = np.arange(n)[:, None]
    safe = np.minimum(np.array(ell.indices), n - 1)
    want = np.where(np.array(ell.indices) == n, 0.0, np.array(dense)[rows, safe])
    np.testing.assert_allclose(np.array(got), want, rtol=1e-5, atol=1e-6)


def test_spmm_value_grad_is_sddmm():
    """XLA's VJP of ell_spmm w.r.t. values IS the SDDMM at the pattern."""
    n, H = 24, 4
    A = np.array(_sparse_matrix(jr.PRNGKey(3), n, 0.25))
    ell = ell_from_dense(A)
    M = jr.normal(jr.PRNGKey(4), (n, H))
    G = jr.normal(jr.PRNGKey(5), (n, H))  # upstream cotangent

    def f(values):
        return jnp.vdot(ell_spmm(ELL(ell.indices, values, n), M), G)

    dvals = jax.grad(f)(ell.values)
    want = ell_sddmm(ell.indices, G, M)
    np.testing.assert_allclose(np.array(dvals), np.array(want), rtol=1e-5, atol=1e-6)

    def ft(values):
        return jnp.vdot(ell_spmm_t(ELL(ell.indices, values, n), M), G)

    dvals_t = jax.grad(ft)(ell.values)
    want_t = ell_sddmm(ell.indices, M, G)
    np.testing.assert_allclose(np.array(dvals_t), np.array(want_t), rtol=1e-5, atol=1e-6)


def test_sparse_fused_apply_directed_matches_dense():
    n, H = 48, 6
    A = _sparse_matrix(jr.PRNGKey(7), n, 0.15)
    dA = _sparse_matrix(jr.PRNGKey(8), n, 0.15)
    M = jr.normal(jr.PRNGKey(9), (n, H))
    params = _params(jr.PRNGKey(10), 11)
    got = sparse_fused_apply_directed(
        ell_from_dense(np.array(A)), ell_from_dense(np.array(dA)), M, params,
        add_identity=True,
    )
    want = M + equiv_basis.fused_apply(A, dA, M, params, directed=True)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=2e-4, atol=1e-5)


def test_sparse_control_matches_dense_control():
    """from_stacked(ELL) evaluates to exactly the dense control's values."""
    T, n = 7, 20
    ts = jnp.linspace(0.0, 1.0, T)
    key = jr.PRNGKey(11)
    knots = jnp.stack([_sparse_matrix(jr.fold_in(key, i), n, 0.2) for i in range(T)])
    # reference layout: stacked [t, A] channels
    tchan = jnp.broadcast_to(ts[:, None, None], (T, n, n))
    stacked = jnp.stack([tchan, knots], axis=-1)
    coeffs = backward_hermite_coefficients(ts, stacked)

    dense = MatrixControl.from_stacked("cubic", ts, coeffs)
    sparse = SparseMatrixControl.from_stacked("cubic", ts, coeffs)

    for t in (0.05, 0.31, 0.77, 0.999):
        t = jnp.asarray(t)
        d_adj, d_dadj = dense.adj(t), dense.dadj(t)
        s_adj, s_dadj = sparse.adj(t), sparse.dadj(t)
        for d, s in ((d_adj, s_adj), (d_dadj, s_dadj)):
            n_ = s.n
            densified = np.zeros((n_, n_), np.float32)
            idx = np.array(s.indices)
            vals = np.array(s.values)
            rows = np.arange(n_)[:, None]
            m = idx < n_
            densified[rows.repeat(idx.shape[1], 1)[m], idx[m]] = vals[m]
            np.testing.assert_allclose(densified, np.array(d), rtol=1e-5, atol=1e-6)


def test_fusion_layer_sparse_dispatch_matches_dense():
    from gncde_tpu.models.vector_fields.layers import ConvEquivFusionLayer

    n, H = 32, 4
    layer = ConvEquivFusionLayer(H, H, key=jr.PRNGKey(12))
    A = _sparse_matrix(jr.PRNGKey(13), n, 0.2)
    dA = _sparse_matrix(jr.PRNGKey(14), n, 0.2)
    feats = jr.normal(jr.PRNGKey(15), (n, H))
    want = layer(feats, A, dA)
    got = layer(feats, ell_from_dense(np.array(A)), ell_from_dense(np.array(dA)))
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=2e-4, atol=1e-5)


def test_scaled_n_sparse_matches_oracle():
    """n=4096 at ~1% density: the sparse path never builds an n^2 operand
    (dense fused operator would be 64MB per eval) and matches the
    rank-structured oracle."""
    n, H = 4096, 8
    rng = np.random.default_rng(0)
    K = 40  # ~1% density
    indices = np.full((n, K), n, np.int32)
    values = np.zeros((n, K), np.float32)
    for r in range(n):
        cols = rng.choice(n, size=K, replace=False)
        indices[r] = np.sort(cols)
        values[r] = rng.uniform(0.1, 1.0, K)
    ell_A = ELL(jnp.asarray(indices), jnp.asarray(values), n)
    ell_dA = ELL(jnp.asarray(indices), jnp.asarray(values * 0.3 - 0.1), n)
    M = jr.normal(jr.PRNGKey(16), (n, H))
    params = _params(jr.PRNGKey(17), 8)

    got = jax.jit(sparse_fused_apply, static_argnames="add_identity")(
        ell_A, ell_dA, M, params, add_identity=True
    )

    # Oracle: densify once (test-side only) and run the decomposed apply.
    def densify(e):
        out = np.zeros((n, n), np.float32)
        idx, vals = np.array(e.indices), np.array(e.values)
        m = idx < n
        rows = np.broadcast_to(np.arange(n)[:, None], idx.shape)
        out[rows[m], idx[m]] = vals[m]
        return jnp.asarray(out)

    want = M + equiv_basis.fused_apply(densify(ell_A), densify(ell_dA), M, params)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=2e-3, atol=2e-3)


def test_memory_feasibility_n32768():
    """n=32768: ONE dense coefficient plane would be 4.3GB (f32); a cubic
    control stores 4(T-1) of them -- infeasible on a 16GB chip even at T=10.
    The sparse control at K=8 stores ~4MB/plane and the vf eval never touches
    an n^2 object."""
    n, K, H, T = 32768, 8, 4, 4
    rng = np.random.default_rng(1)
    indices = np.sort(
        rng.integers(0, n, size=(n, K), dtype=np.int32), axis=1
    )
    ell_A = ELL(jnp.asarray(indices), jnp.asarray(rng.uniform(0.1, 1.0, (n, K)).astype(np.float32)), n)
    ell_dA = ELL(ell_A.indices, ell_A.values * 0.5, n)
    M = jr.normal(jr.PRNGKey(20), (n, H))
    params = _params(jr.PRNGKey(21), 8)
    out = jax.jit(sparse_fused_apply, static_argnames="add_identity")(
        ell_A, ell_dA, M, params, add_identity=True
    )
    assert out.shape == (n, H)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pallas_spmm_interpret_matches_xla():
    from gncde_tpu.ops.pallas.sparse_spmm import _spmm_kernel
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, K, H = 64, 8, 128
    A = np.array(_sparse_matrix(jr.PRNGKey(18), n, 0.15))
    ell = ell_from_dense(A, max_degree=K)
    M = jr.normal(jr.PRNGKey(19), (n, H))
    M_pad = jnp.concatenate([M, jnp.zeros((1, H))], axis=0)
    tile = 32
    kernel = functools.partial(_spmm_kernel, tile=tile, K=ell.indices.shape[1], H=H)
    got = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, ell.indices.shape[1]), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, ell.indices.shape[1]), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, H), jnp.float32),
        interpret=True,
    )(ell.indices, ell.values, M_pad)
    want = ell_spmm(ell, M)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5, atol=1e-6)


def test_dyn_trainer_sparse_control_e2e(tmp_path):
    """Full dyn training loop with sparse_control=True produces finite loss."""
    from gncde_tpu.train.trainer import Trainer

    cfg = dict(
        model=dict(
            name="graph_neural_cde",
            hidden_dim=4,
            interpolation="cubic",
            method="Tsit5",
            return_sequence=True,
            max_steps=64,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                use_control=False,
            ),
        ),
        dataset=dict(
            name="heat", batch_size=2, num_nodes=9, dynamic_graph=True,
            all_dynamic=True, graph_type="grid", final_time=1.0, time_tick=10,
            sampling_type="irregular", method="Tsit5", dt0=0.05,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-2),
        ),
        loss=dict(name="MSE"),
        epochs=2, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_name="t",
        logger_name="test-dyn-sparse",
        wandb=dict(project="test", mode="disabled"),
        sparse_control=True,
    )
    summary = Trainer(**cfg).run()
    assert np.isfinite(summary["validation_loss"])


def test_dyn_trainer_bcsr_format_e2e(tmp_path):
    """Dyn training with sparse_format=bcsr: the BATCHED (vmapped) BCSR
    controls dispatch to the batch-grid block kernels (one pallas_call per
    SpMM under the loss vmap, ops/bcsr.py custom_vmap) through the full
    loop."""
    from gncde_tpu.train.trainer import Trainer

    cfg = dict(
        model=dict(
            name="graph_neural_cde",
            hidden_dim=4,
            interpolation="cubic",
            method="Tsit5",
            return_sequence=True,
            max_steps=64,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                use_control=False,
            ),
        ),
        dataset=dict(
            name="heat", batch_size=2, num_nodes=9, dynamic_graph=True,
            all_dynamic=True, graph_type="grid", final_time=1.0, time_tick=10,
            sampling_type="irregular", method="Tsit5", dt0=0.05,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-2),
        ),
        loss=dict(name="MSE"),
        epochs=2, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_name="t",
        logger_name="test-dyn-bcsr",
        wandb=dict(project="test", mode="disabled"),
        sparse_control=True, sparse_format="bcsr", sparse_block_size=4,
    )
    summary = Trainer(**cfg).run()
    assert np.isfinite(summary["validation_loss"])
