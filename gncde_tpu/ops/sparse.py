"""Sparse graph-operator support: ELL format, SpMM, and the sparse fused
equivariant apply.

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
  * ``sparse_fused_apply``: the full 8-term basis operator with O(nnz * H)
    message-passing cost instead of O(n^2 * H).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


class ELL(tp.NamedTuple):
    indices: jax.Array  # (n, K) int32; padding entries == n
    values: jax.Array  # (n, K) float
    n: int

    @property
    def max_degree(self) -> int:
        return self.indices.shape[1]


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


def sparse_fused_apply(
    ell_A: ELL,
    ell_dA: ELL,
    M: jax.Array,
    params: tp.Sequence[jax.Array],
    add_identity: bool = False,
) -> jax.Array:
    """Undirected 8-term fused basis apply with sparse A, dA.

    Cost: 4 sparse SpMMs (A, dA, A^T, dA^T) + O(n + nnz) vector work. Matches
    ops.equiv_basis.fused_apply allclose (including the term_7 sum(A) quirk).
    """
    p1, p2, p3, p4, p5, p6, p7, p8 = params
    n = ell_A.n
    rA, rdA = ell_row_sums(ell_A), ell_row_sums(ell_dA)
    sA, sdA = jnp.sum(rA), jnp.sum(rdA)

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
