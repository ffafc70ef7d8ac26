"""Sparse graph-operator support: ELL format, SpMM, SDDMM, and the sparse
fused equivariant apply (SURVEY.md section 2.3(a) native surface).

For scaled graphs the fused operator ``A_bar`` is DENSE even when A is sparse
(the rank-1 basis terms touch every entry), so materialising it is O(n^2) --
the rank-structured decomposition (ops/equiv_basis.py) is the only viable
path: ``A_bar @ M = B1 @ M + B2^T @ M + diag/rank-1 corrections`` where B1,
B2 share A's sparsity. This module supplies the sparse building blocks:

  * ELL (padded-neighbour-list) representation: ``indices (n, K)``,
    ``values (n, K)`` with out-of-range padding rows masked by index == n.
    Fixed shape => no recompiles, gathers vectorise on TPU.
  * ``ell_spmm``: row-gather SpMM  (A @ M).
  * ``ell_spmm_t``: transpose SpMM (A^T @ M) via flattened segment-sum.
  * ``ell_sddmm``: sampled dense-dense matmul ``(X @ Y^T)`` at A's pattern.
    This IS the VJP of ``ell_spmm`` w.r.t. ``values`` (and XLA derives
    exactly it from the gather formulation -- asserted in tests/test_sparse);
    it is exposed directly for schedulers/kernels that want it explicitly.
  * ``sparse_fused_apply`` / ``sparse_fused_apply_directed``: the full
    8-/11-term basis operator with O(nnz * H) message-passing cost instead
    of O(n^2 * H).

A Pallas scalar-prefetch-gather SpMM kernel lives in
``ops/pallas/sparse_spmm.py`` (see that module for when it wins vs XLA).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import Module, static_field


class ELL(Module):
    """Padded-neighbour-list sparse matrix. ``n`` rides in the treedef (static)
    so ELL controls pass through ``jax.jit`` without tracing the dimension."""

    indices: jax.Array  # (n, K) int32; padding entries == n
    values: jax.Array  # (n, K) float
    n: int = static_field()

    @property
    def max_degree(self) -> int:
        return self.indices.shape[1]

    def astype(self, dtype) -> "ELL":
        return ELL(self.indices, self.values.astype(dtype), self.n)

    def scale(self, c) -> "ELL":
        return ELL(self.indices, c * self.values, self.n)

    def combine(self, other: "ELL", ca=1.0, cb=1.0) -> "ELL":
        """``ca * self + cb * other`` for ELLs sharing one index pattern."""
        return ELL(self.indices, ca * self.values + cb * other.values, self.n)


def ell_from_dense(A: np.ndarray, max_degree: tp.Optional[int] = None) -> ELL:
    """Build ELL from a dense matrix (host-side preprocessing)."""
    A = np.asarray(A)
    n = A.shape[0]
    rows, cols = np.nonzero(A)
    degs = np.bincount(rows, minlength=n)
    K = int(max_degree or (degs.max() if len(rows) else 1))
    indices = np.full((n, K), n, dtype=np.int32)
    values = np.zeros((n, K), dtype=np.float32)
    slot = np.zeros(n, dtype=np.int64)
    for r, c in zip(rows, cols):
        if slot[r] < K:
            indices[r, slot[r]] = c
            values[r, slot[r]] = A[r, c]
            slot[r] += 1
    return ELL(jnp.asarray(indices), jnp.asarray(values), n)


def ell_from_edges(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n: int,
    max_degree: tp.Optional[int] = None,
) -> ELL:
    from .. import native

    nat = native.build_ell_native(src, dst, w, n, max_degree)
    if nat is not None:
        indices, values = nat
        return ELL(jnp.asarray(indices), jnp.asarray(values), n)
    degs = np.bincount(src, minlength=n)
    K = int(max_degree or (degs.max() if len(src) else 1))
    indices = np.full((n, K), n, dtype=np.int32)
    values = np.zeros((n, K), dtype=np.float32)
    slot = np.zeros(n, dtype=np.int64)
    for s, d, wi in zip(src, dst, w):
        if slot[s] < K:
            indices[s, slot[s]] = d
            values[s, slot[s]] = wi
            slot[s] += 1
    return ELL(jnp.asarray(indices), jnp.asarray(values), n)


def ell_spmm(ell: ELL, M: jax.Array) -> jax.Array:
    """``A @ M`` with A in ELL form. M: (n, H) -> (n, H)."""
    M_pad = jnp.concatenate([M, jnp.zeros((1, M.shape[1]), M.dtype)], axis=0)
    gathered = M_pad[ell.indices]  # (n, K, H)
    return jnp.einsum("nk,nkh->nh", ell.values, gathered)


def ell_spmm_t(ell: ELL, M: jax.Array) -> jax.Array:
    """``A^T @ M``: scatter-add of row contributions via segment_sum."""
    n, K = ell.indices.shape
    flat_idx = ell.indices.reshape(-1)  # (n*K,)
    # contribution of entry (i, k): values[i,k] * M[i, :] added to row col.
    contrib = (ell.values[..., None] * M[:, None, :]).reshape(n * K, -1)
    out = jax.ops.segment_sum(contrib, flat_idx, num_segments=n + 1)
    return out[:-1]


def ell_row_sums(ell: ELL) -> jax.Array:
    return jnp.sum(ell.values, axis=1)


def ell_col_sums(ell: ELL) -> jax.Array:
    flat_idx = ell.indices.reshape(-1)
    return jax.ops.segment_sum(
        ell.values.reshape(-1), flat_idx, num_segments=ell.n + 1
    )[:-1]


def ell_diag(ell: ELL) -> jax.Array:
    """diag(A) from ELL: entries where indices[i, k] == i."""
    n = ell.indices.shape[0]
    rows = jnp.arange(n)[:, None]
    mask = ell.indices == rows
    return jnp.sum(jnp.where(mask, ell.values, 0.0), axis=1)


def ell_sddmm(indices: jax.Array, X: jax.Array, Y: jax.Array) -> jax.Array:
    """Sampled dense-dense matmul: ``(X @ Y^T)`` evaluated only at the ELL
    pattern.  ``X: (n, H)``, ``Y: (n, H)``, ``indices: (n, K)`` (padding rows
    == n) -> ``(n, K)`` with ``out[i, k] = X[i] . Y[indices[i, k]]`` and 0 at
    padding slots.

    This is the gradient of ``ell_spmm(A, M)`` w.r.t. ``A.values`` (with
    ``X = dOut, Y = M``) and of ``ell_spmm_t`` (with ``X = M, Y = dOut``):
    computing it at the sparsity pattern keeps the backward pass O(nnz * H)
    instead of densifying to n^2 (reference trains through torch dense
    matmuls; SURVEY.md section 2.3(a) names SDDMM as the native surface).
    """
    Y_pad = jnp.concatenate([Y, jnp.zeros((1, Y.shape[1]), Y.dtype)], axis=0)
    gathered = Y_pad[indices]  # (n, K, H)
    return jnp.einsum("nh,nkh->nk", X, gathered)


def sparse_fused_apply(
    ell_A: ELL,
    ell_dA: ELL,
    M: jax.Array,
    params: tp.Sequence[jax.Array],
    add_identity: bool = False,
) -> jax.Array:
    """Undirected 8-term fused basis apply with sparse A, dA.

    A and dA always share one index pattern (they are interpolations of the
    same signal -- interp.SparseMatrixControl guarantees it), so the basis
    pairs combine VALUES first: one gather-SpMM for the identity pair (B1)
    and one scatter-SpMM for the transpose pair (B2), exactly mirroring the
    rank-structured dense decomposition (equiv_basis.py:116-138). Halves the
    gather/scatter traffic vs the naive 4-SpMM formulation. Matches
    ops.equiv_basis.fused_apply allclose (including the term_7 sum(A) quirk).
    """
    p1, p2, p3, p4, p5, p6, p7, p8 = params
    n = ell_A.n
    rA, rdA = ell_row_sums(ell_A), ell_row_sums(ell_dA)
    sA, sdA = jnp.sum(rA), jnp.sum(rdA)

    if ell_A.indices is ell_dA.indices:
        # Shared pattern (always true for SparseMatrixControl pairs): combine
        # values first -- one gather + one scatter SpMM instead of four.
        rowpart = ell_spmm(ell_A.combine(ell_dA, 1.0 + p1[0], 1.0 + p1[1]), M)
        colpart = ell_spmm_t(ell_A.combine(ell_dA, p2[0], p2[1]), M)
    else:
        rowpart = (1.0 + p1[0]) * ell_spmm(ell_A, M) + (1.0 + p1[1]) * ell_spmm(ell_dA, M)
        colpart = p2[0] * ell_spmm_t(ell_A, M) + p2[1] * ell_spmm_t(ell_dA, M)

    dvec = (
        p3[0] * ell_diag(ell_A)
        + p3[1] * ell_diag(ell_dA)
        + (p6[0] * rA + p6[1] * rdA) / n
        + (p8[0] * sA + p8[1] * sdA) / n**2
    )
    if add_identity:
        dvec = dvec + 1.0
    u = (p4[0] * rA + p4[1] * rdA) / n
    v = (p5[0] * rA + p5[1] * rdA) / n
    c7 = (p7[0] + p7[1]) * sA / n**2

    s = jnp.sum(M, axis=0)
    w = v @ M
    return (
        rowpart
        + colpart
        + dvec[:, None] * M
        + u[:, None] * s[None, :]
        + (w + c7 * s)[None, :]
    )


def sparse_fused_apply_directed(
    ell_A: ELL,
    ell_dA: ELL,
    M: jax.Array,
    params: tp.Sequence[jax.Array],
    add_identity: bool = False,
) -> jax.Array:
    """Directed 11-term fused basis apply with sparse A, dA.

    Matches ops.equiv_basis.fused_apply(directed=True) allclose, including
    the reference's term_4_prime row/col mix and term_7 sum(A) quirks
    (equiv_basis.py:141-167 <- reference layers.py:256-345).
    """
    p1, p2, p3, p4, p4p, p5, p5p, p6, p6p, p7, p8 = params
    n = ell_A.n
    rA, rdA = ell_row_sums(ell_A), ell_row_sums(ell_dA)
    cA, cdA = ell_col_sums(ell_A), ell_col_sums(ell_dA)
    sA, sdA = jnp.sum(rA), jnp.sum(rdA)

    if ell_A.indices is ell_dA.indices:
        rowpart = ell_spmm(ell_A.combine(ell_dA, 1.0 + p1[0], 1.0 + p1[1]), M)
        colpart = ell_spmm_t(ell_A.combine(ell_dA, p2[0], p2[1]), M)
    else:
        rowpart = (1.0 + p1[0]) * ell_spmm(ell_A, M) + (1.0 + p1[1]) * ell_spmm(ell_dA, M)
        colpart = p2[0] * ell_spmm_t(ell_A, M) + p2[1] * ell_spmm_t(ell_dA, M)

    dvec = (
        p3[0] * ell_diag(ell_A)
        + p3[1] * ell_diag(ell_dA)
        + (p6[0] * cA + p6[1] * cdA) / n
        + (p6p[0] * rA + p6p[1] * rdA) / n
        + (p8[0] * sA + p8[1] * sdA) / n**2
    )
    if add_identity:
        dvec = dvec + 1.0
    u = (p4[0] * cA + p4[1] * cdA) / n
    v = (
        (p4p[0] * rA + p4p[1] * cdA)  # term_4_prime quirk
        + (p5[0] * cA + p5[1] * cdA)
        + (p5p[0] * rA + p5p[1] * rdA)
    ) / n
    c7 = (p7[0] + p7[1]) * sA / n**2

    s = jnp.sum(M, axis=0)
    w = v @ M
    return (
        rowpart
        + colpart
        + dvec[:, None] * M
        + u[:, None] * s[None, :]
        + (w + c7 * s)[None, :]
    )
