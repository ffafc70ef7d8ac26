"""Streamed Pallas pipeline kernel (ops/pallas/pipeline.py): parity with the
dense oracle / decomposed path, gradients, vmap, and layer-level dispatch.

Runs in Pallas interpret mode on CPU (auto-selected off-TPU)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu import ops as ops_cfg
from gncde_tpu.ops import equiv_basis
from gncde_tpu.ops.pallas.pipeline import pipeline_fused_apply
from gncde_tpu.models.vector_fields.layers import (
    ConvEquivFusionLayer,
    ConvEquivFusionDirectedLayer,
)


def _params(key, count):
    keys = jr.split(key, count)
    return tuple(1 / 15 * jr.uniform(k, (2,), minval=-1.0, maxval=1.0) for k in keys)


def _setup(n, H, directed, seed=0):
    k = jr.PRNGKey(seed)
    kA, kdA, kM, kp = jr.split(k, 4)
    A = jr.uniform(kA, (n, n)) * 0.3
    dA = jr.normal(kdA, (n, n)) * 0.1
    M = jr.normal(kM, (n, H))
    params = _params(kp, 11 if directed else 8)
    return A, dA, M, params


@pytest.mark.parametrize("n", [13, 64, 200])
@pytest.mark.parametrize("directed", [False, True])
def test_pipeline_matches_oracle(n, directed):
    A, dA, M, params = _setup(n, 8, directed)
    got = pipeline_fused_apply(A, dA, M, params, directed, True)
    mk = (
        equiv_basis.fusion_matrix_dense_directed
        if directed
        else equiv_basis.fusion_matrix_dense
    )
    want = M + mk(A, dA, params) @ M
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("directed", [False, True])
def test_pipeline_gradients_match_oracle(directed):
    A, dA, M, params = _setup(40, 8, directed)
    tgt = jr.normal(jr.PRNGKey(9), M.shape)

    def loss_pipeline(A_, dA_, M_, p_):
        out = pipeline_fused_apply(A_, dA_, M_, p_, directed, True)
        return jnp.sum((out - tgt) ** 2)

    def loss_oracle(A_, dA_, M_, p_):
        out = equiv_basis.fused_apply(
            A_, dA_, M_, p_, directed=directed, add_identity=True
        )
        return jnp.sum((out - tgt) ** 2)

    got = jax.grad(loss_pipeline, argnums=(0, 1, 2, 3))(A, dA, M, params)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(A, dA, M, params)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_pipeline_vmap():
    B, n, H = 3, 24, 8
    A = jr.uniform(jr.PRNGKey(0), (B, n, n)) * 0.3
    dA = jr.normal(jr.PRNGKey(1), (B, n, n)) * 0.1
    M = jr.normal(jr.PRNGKey(2), (B, n, H))
    params = _params(jr.PRNGKey(3), 8)

    got = jax.vmap(lambda a, d, m: pipeline_fused_apply(a, d, m, params, False, True))(
        A, dA, M
    )
    want = jax.vmap(
        lambda a, d, m: equiv_basis.fused_apply(a, d, m, params, add_identity=True)
    )(A, dA, M)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5)


def test_pipeline_bf16_inputs():
    A, dA, M, params = _setup(32, 8, False)
    got = pipeline_fused_apply(
        A.astype(jnp.bfloat16), dA.astype(jnp.bfloat16), M, params, False, True
    )
    want = equiv_basis.fused_apply(A, dA, M, params, add_identity=True)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("directed", [False, True])
def test_layer_pipeline_backend_matches_dense(directed):
    n, H = 20, 8
    cls = ConvEquivFusionDirectedLayer if directed else ConvEquivFusionLayer
    layer = cls(H, H, key=jr.PRNGKey(0))
    feats = jr.normal(jr.PRNGKey(1), (n, H))
    A = jr.uniform(jr.PRNGKey(2), (n, n)) * 0.3
    dA = jr.normal(jr.PRNGKey(3), (n, n)) * 0.1

    want = layer(feats, A, dA)
    ops_cfg.set_fusion_backend("pipeline")
    try:
        got = layer(feats, A, dA)
    finally:
        ops_cfg.set_fusion_backend("dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5)


def test_auto_backend_resolves_dense_on_cpu():
    ops_cfg.set_fusion_backend("auto")
    try:
        assert ops_cfg.get_fusion_backend() == "dense"
    finally:
        ops_cfg.set_fusion_backend("dense")
