"""Native C++ preprocessing library: build, bind, and match numpy/JAX paths."""

import numpy as np
import pytest

from gncde_tpu import native
from gncde_tpu.data.windows import to_dense_adj
from gncde_tpu.interp import backward_hermite_coefficients

HAS_NATIVE = native.get_lib() is not None

pytestmark = pytest.mark.skipif(not HAS_NATIVE, reason="no C++ toolchain")


def test_dense_adj_matches_numpy():
    rng = np.random.default_rng(0)
    n, nnz = 20, 150
    src = rng.integers(0, n, nnz)
    dst = rng.integers(0, n, nnz)
    w = rng.uniform(0.1, 1.0, nnz).astype(np.float32)
    got = native.dense_adj_native(src, dst, w, n)
    ref = to_dense_adj(src, dst, w, n)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_build_ell_matches_python():
    from gncde_tpu.ops.sparse import ell_from_edges, ell_spmm, ELL
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n, nnz = 15, 60
    src = rng.integers(0, n, nnz)
    dst = rng.integers(0, n, nnz)
    w = rng.uniform(0.1, 1.0, nnz).astype(np.float32)
    indices, values = native.build_ell_native(src, dst, w, n)
    ell_py = ell_from_edges(src, dst, w, n)
    assert indices.shape == ell_py.indices.shape
    # Same SpMM result regardless of slot ordering.
    M = rng.normal(size=(n, 4)).astype(np.float32)
    ell_nat = ELL(jnp.asarray(indices), jnp.asarray(values), n)
    np.testing.assert_allclose(
        np.asarray(ell_spmm(ell_nat, jnp.asarray(M))),
        np.asarray(ell_spmm(ell_py, jnp.asarray(M))),
        atol=1e-5,
    )


def test_hermite_coeffs_match_jax():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    ts = np.sort(rng.uniform(0, 1, 9))
    ts[0] = 0.0
    ys = rng.normal(size=(9, 3, 2)).astype(np.float32)
    got = native.hermite_coeffs_native(ts, ys)
    ref = backward_hermite_coefficients(jnp.asarray(ts), jnp.asarray(ys))
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, np.asarray(r), atol=5e-2, rtol=1e-3)
