"""Block-sparse (BCSR) SpMM / SDDMM: layout, kernel parity, gradients.

The Pallas kernels run in interpret mode here (CPU suite); dense oracles
are plain jnp matmuls.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gncde_tpu.ops import bcsr as B


def _banded(n, bw, seed=0):
    """Banded test matrix (the partitioned/halo regime BCSR serves)."""
    rng = np.random.default_rng(seed)
    A = rng.uniform(0.1, 1.0, (n, n)).astype(np.float32)
    i, j = np.indices((n, n))
    A[np.abs(i - j) > bw] = 0.0
    return A


def test_roundtrip_dense():
    A = _banded(100, 9)
    b = B.bcsr_from_dense(A, block_size=16)
    np.testing.assert_allclose(np.asarray(B.bcsr_to_dense(b)), A)


def test_transpose_layout():
    A = _banded(70, 11, seed=1)
    bT = B.bcsr_transpose(B.bcsr_from_dense(A, block_size=16))
    np.testing.assert_allclose(np.asarray(B.bcsr_to_dense(bT)), A.T)


def test_spmm_xla_matches_dense():
    A = _banded(90, 13, seed=2)
    M = np.asarray(jr.normal(jr.PRNGKey(0), (90, 8)))
    b = B.bcsr_from_dense(A, block_size=16)
    np.testing.assert_allclose(
        np.asarray(B.bcsr_spmm_xla(b, jnp.asarray(M))), A @ M,
        rtol=1e-5, atol=1e-5,
    )


def test_spmm_pallas_interpret_matches_dense():
    A = _banded(96, 13, seed=3)
    M = np.asarray(jr.normal(jr.PRNGKey(1), (96, 16)))
    b = B.bcsr_from_dense(A, block_size=16)
    got = B._bcsr_spmm_pallas(b, jnp.asarray(M), interpret=True)
    np.testing.assert_allclose(np.asarray(got), A @ M, rtol=1e-5, atol=1e-5)


def test_spmm_pallas_ragged_n():
    # n not a multiple of the block size: padding rows must not contribute.
    A = _banded(50, 7, seed=4)
    M = np.asarray(jr.normal(jr.PRNGKey(2), (50, 8)))
    b = B.bcsr_from_dense(A, block_size=16)
    got = B._bcsr_spmm_pallas(b, jnp.asarray(M), interpret=True)
    np.testing.assert_allclose(np.asarray(got), A @ M, rtol=1e-5, atol=1e-5)


def test_sddmm_pallas_interpret_matches_dense():
    A = _banded(64, 9, seed=5)
    X = np.asarray(jr.normal(jr.PRNGKey(3), (64, 8)))
    Y = np.asarray(jr.normal(jr.PRNGKey(4), (64, 8)))
    b = B.bcsr_from_dense(A, block_size=16)
    got = B._bcsr_sddmm_pallas(
        b.block_idx, jnp.asarray(X), jnp.asarray(Y), 16, interpret=True
    )
    ref = B.bcsr_sddmm_xla(b.block_idx, jnp.asarray(X), jnp.asarray(Y), 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # And the sampled blocks equal the dense product at the stored pattern.
    full = X @ Y.T
    bs = 16
    nb = b.nb
    for i in range(nb):
        for k in range(b.kb):
            j = int(b.block_idx[i, k])
            np.testing.assert_allclose(
                np.asarray(got[i, k]),
                full[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs],
                rtol=1e-5, atol=1e-5,
            )


def test_sddmm_is_spmm_values_vjp():
    """SDDMM(G, M) at A's pattern == d(spmm)/d(blocks) pulled back by G."""
    A = _banded(48, 9, seed=6)
    M = jr.normal(jr.PRNGKey(5), (48, 8))
    G = jr.normal(jr.PRNGKey(6), (48, 8))
    b = B.bcsr_from_dense(A, block_size=16)

    def f(blocks):
        return B.bcsr_spmm_xla(BCSRlike(blocks), M)

    def BCSRlike(blocks):
        return B.BCSR(b.block_idx, blocks, b.n)

    _, pull = jax.vjp(f, b.blocks)
    (d_blocks_ad,) = pull(G)
    d_blocks_sddmm = B.bcsr_sddmm_xla(b.block_idx, G, M, 16)
    # Duplicate padding slots (block_idx 0) may split mass differently; the
    # stored pattern has no duplicates here, padding blocks are zero in AD
    # too because padded G-rows are zero only at ragged n -- compare directly.
    np.testing.assert_allclose(
        np.asarray(d_blocks_ad), np.asarray(d_blocks_sddmm),
        rtol=1e-5, atol=1e-5,
    )


def test_spmm_grad_custom_vjp():
    A = _banded(48, 9, seed=7)
    b = B.bcsr_from_dense(A, block_size=16)
    bT = B.bcsr_transpose(b)
    M = jr.normal(jr.PRNGKey(7), (48, 8))

    valid = B.slot_mask(b.block_idx, b.nblocks)

    def loss(blocks, M_):
        out = B.bcsr_spmm_grad(blocks, b.block_idx, bT.blocks, bT.block_idx,
                               valid, M_, b.n)
        return jnp.sum(out ** 2)

    def loss_ref(blocks, M_):
        return jnp.sum(B.bcsr_spmm_xla(B.BCSR(b.block_idx, blocks, b.n), M_) ** 2)

    (db, dM) = jax.grad(loss, argnums=(0, 1))(b.blocks, M)
    (db_r, dM_r) = jax.grad(loss_ref, argnums=(0, 1))(b.blocks, M)
    np.testing.assert_allclose(np.asarray(dM), np.asarray(dM_r),
                               rtol=1e-4, atol=1e-4)
    # Valid slots match the AD reference; padded slots are EXACTLY zero
    # (the unmasked AD reference deposits spurious X_i @ Y_0^T there --
    # a padded block that drifts nonzero corrupts the forward SpMM).
    vm = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(db) * vm, np.asarray(db_r) * vm,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(db) * (1 - vm), 0.0)
    # Rows with padding exist in this layout (else the mask is untested).
    assert float(np.asarray(valid).min()) == 0.0
