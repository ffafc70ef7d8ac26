"""Sparse ELL ops: SpMM/SpMM^T/reductions/fused apply allclose vs dense."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu.ops.sparse import (
    ell_from_dense,
    ell_spmm,
    ell_spmm_t,
    ell_row_sums,
    ell_col_sums,
    ell_diag,
    sparse_fused_apply,
)
from gncde_tpu.ops.equiv_basis import fused_apply


def _sparse_matrix(key, n, density=0.1):
    m = jr.uniform(key, (n, n))
    mask = m < density
    return np.asarray(jnp.where(mask, jr.normal(jr.fold_in(key, 1), (n, n)), 0.0))


@pytest.mark.parametrize("n,H", [(30, 8), (100, 16)])
def test_spmm_matches_dense(n, H):
    A = _sparse_matrix(jr.PRNGKey(n), n)
    M = np.asarray(jr.normal(jr.PRNGKey(n + 1), (n, H)))
    ell = ell_from_dense(A)
    np.testing.assert_allclose(ell_spmm(ell, M), A @ M, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(ell_spmm_t(ell, M), A.T @ M, atol=1e-4, rtol=1e-4)


def test_reductions_match_dense():
    A = np.array(_sparse_matrix(jr.PRNGKey(5), 40, density=0.2))
    # put something on the diagonal
    A[3, 3] = 2.5
    ell = ell_from_dense(A)
    np.testing.assert_allclose(ell_row_sums(ell), A.sum(1), atol=1e-5)
    np.testing.assert_allclose(ell_col_sums(ell), A.sum(0), atol=1e-5)
    np.testing.assert_allclose(ell_diag(ell), np.diag(A), atol=1e-6)


def test_sparse_fused_apply_matches_dense():
    n, H = 50, 8
    A = _sparse_matrix(jr.PRNGKey(7), n, 0.15)
    dA = _sparse_matrix(jr.PRNGKey(8), n, 0.15)
    M = np.asarray(jr.normal(jr.PRNGKey(9), (n, H)))
    params = tuple(
        1 / 15 * np.asarray(jr.uniform(k, (2,), minval=-1, maxval=1))
        for k in jr.split(jr.PRNGKey(10), 8)
    )
    got = sparse_fused_apply(
        ell_from_dense(A), ell_from_dense(dA), jnp.asarray(M), params,
        add_identity=True,
    )
    ref = fused_apply(jnp.asarray(A), jnp.asarray(dA), jnp.asarray(M), params,
                      add_identity=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
