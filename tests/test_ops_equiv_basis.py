"""Parity tests: rank-structured fused basis apply vs the dense oracle
(which transcribes reference layers.py:102-160 / 256-345 semantics,
including the term_7 sum(A) quirk)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu.ops.equiv_basis import (
    fusion_matrix_dense,
    fusion_matrix_dense_directed,
    fused_apply,
    fused_coeffs,
    fused_matvec,
)


def _rand_params(key, count):
    return [
        1 / 15 * jr.uniform(k, (2,), minval=-1, maxval=1)
        for k in jr.split(key, count)
    ]


@pytest.mark.parametrize("n,H", [(7, 3), (33, 16), (64, 8)])
def test_undirected_matches_dense(n, H):
    key = jr.PRNGKey(n)
    kA, kdA, kM, kp = jr.split(key, 4)
    A = jr.normal(kA, (n, n))
    dA = jr.normal(kdA, (n, n))
    M = jr.normal(kM, (n, H))
    params = _rand_params(kp, 8)
    ref = fusion_matrix_dense(A, dA, params) @ M
    got = fused_apply(A, dA, M, params)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("n,H", [(7, 3), (33, 16)])
def test_directed_matches_dense(n, H):
    key = jr.PRNGKey(100 + n)
    kA, kdA, kM, kp = jr.split(key, 4)
    A = jr.normal(kA, (n, n))
    dA = jr.normal(kdA, (n, n))
    M = jr.normal(kM, (n, H))
    params = _rand_params(kp, 11)
    ref = fusion_matrix_dense_directed(A, dA, params) @ M
    got = fused_apply(A, dA, M, params, directed=True)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_add_identity_folds_residual():
    key = jr.PRNGKey(0)
    kA, kdA, kM, kp = jr.split(key, 4)
    A = jr.normal(kA, (11, 11))
    dA = jr.normal(kdA, (11, 11))
    M = jr.normal(kM, (11, 5))
    params = _rand_params(kp, 8)
    ref = M + fusion_matrix_dense(A, dA, params) @ M
    got = fused_apply(A, dA, M, params, add_identity=True)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_term7_quirk_uses_sum_A_for_both():
    """The reference's term_7 scales BOTH operands by sum(A) (layers.py:144-148).
    Verify the oracle + decomposition reproduce that, i.e. the result is
    independent of sum(dA) through the c7 channel."""
    n, H = 9, 4
    key = jr.PRNGKey(42)
    kA, kdA, kM = jr.split(key, 3)
    A = jr.normal(kA, (n, n))
    dA = jr.normal(kdA, (n, n))
    M = jr.normal(kM, (n, H))
    params = [jnp.zeros(2)] * 6 + [jnp.array([0.3, 0.5])] + [jnp.zeros(2)]
    coeffs = fused_coeffs(A, dA, params)
    expected_c7 = (0.3 + 0.5) * jnp.sum(A) / n**2
    np.testing.assert_allclose(coeffs.c7, expected_c7, rtol=1e-6)
    ref = fusion_matrix_dense(A, dA, params) @ M
    np.testing.assert_allclose(fused_matvec(coeffs, M), ref, atol=2e-5, rtol=2e-5)


def test_gradients_match_dense():
    n, H = 13, 6
    key = jr.PRNGKey(7)
    kA, kdA, kM, kp = jr.split(key, 4)
    A = jr.normal(kA, (n, n))
    dA = jr.normal(kdA, (n, n))
    M = jr.normal(kM, (n, H))
    params = _rand_params(kp, 8)

    def loss_fused(params):
        return jnp.sum(fused_apply(A, dA, M, params) ** 2)

    def loss_dense(params):
        return jnp.sum((fusion_matrix_dense(A, dA, params) @ M) ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_dense)(params)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=1e-2, rtol=1e-4)
