"""Permutation-equivariant basis fusion operators.

The reference's hot kernel builds a fused message-passing operator
``A_bar = sum of 8 (undirected) / 11 (directed) Maron-basis terms`` as dense
n-by-n intermediates and then multiplies once (reference:
src/models/vector_fields/layers.py:102-160 and 256-345, applied at
layers.py:45-48). Every basis term beyond the identity/transpose pair is
rank-structured (diagonal, row-broadcast, column-broadcast, or global-sum), so
this module computes ``A_bar @ M`` WITHOUT materialising A_bar:

    A_bar @ M = B1 @ M + B2^T @ M + dvec * M + u (x) colsum(M)
                + 1 (x) (v @ M + c7 * colsum(M))

with
    B1 = (1+p1_0) A + (1+p1_1) dA          (identity pair)
    B2 = p2_0 A + p2_1 dA                  (transpose pair)
    dvec, u, v, c7 : O(n) vectors / scalars from row/col/diag/global sums.

Cost: 2 dense matmuls (MXU) + O(n^2) elementwise, versus the reference's
~16 dense n-by-n temporaries + 1 matmul -- about 4x less HBM traffic per
vector-field evaluation, which is the workload bottleneck (SURVEY.md section
3.5). The dense-oracle functions reproduce the reference semantics exactly
(including its quirks, see below) and anchor the allclose parity tests.

Reference quirks reproduced bit-for-bit (SURVEY.md section 7.4):
  * ``term_7``'s second operand scales by ``sum(A)`` where the symmetric
    expression would use ``sum(dA)`` (layers.py:144-148, 317-321).
  * the directed ``term_4_prime`` mixes ``sum(A, axis=1)`` with
    ``sum(dA, axis=0)`` (layers.py:288-292).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Dense oracles (parity reference; used in tests and as a fallback)
# ---------------------------------------------------------------------------


def fusion_matrix_dense(A: jax.Array, dA: jax.Array, params: tp.Sequence[jax.Array]) -> jax.Array:
    """Materialise the fused operator for the undirected 8-term basis.

    ``params`` is ``(p1, ..., p8)``, each a length-2 vector. Semantics match
    reference layers.py:102-160 term by term.
    """
    p1, p2, p3, p4, p5, p6, p7, p8 = params
    n = A.shape[0]
    rA = jnp.sum(A, axis=1)
    rdA = jnp.sum(dA, axis=1)
    sA = jnp.sum(A)
    sdA = jnp.sum(dA)

    out = (1.0 + p1[0]) * A + (1.0 + p1[1]) * dA
    out = out + p2[0] * A.T + p2[1] * dA.T
    out = out + jnp.diag(p3[0] * jnp.diag(A) + p3[1] * jnp.diag(dA))
    out = out + (p4[0] / n * rA + p4[1] / n * rdA)[:, None] * jnp.ones((1, n), A.dtype)
    out = out + (p5[0] / n * rA + p5[1] / n * rdA)[None, :] * jnp.ones((n, 1), A.dtype)
    out = out + jnp.diag(p6[0] / n * rA + p6[1] / n * rdA)
    # Reference quirk: both summands of term_7 use sum(A).
    out = out + (p7[0] / n**2 * sA + p7[1] / n**2 * sA) * jnp.ones((n, n), A.dtype)
    out = out + (p8[0] * sA + p8[1] * sdA) / n**2 * jnp.eye(n, dtype=A.dtype)
    return out


def fusion_matrix_dense_directed(
    A: jax.Array, dA: jax.Array, params: tp.Sequence[jax.Array]
) -> jax.Array:
    """Dense oracle for the directed 11-term basis (layers.py:256-345)."""
    p1, p2, p3, p4, p4p, p5, p5p, p6, p6p, p7, p8 = params
    n = A.shape[0]
    rA, rdA = jnp.sum(A, axis=1), jnp.sum(dA, axis=1)
    cA, cdA = jnp.sum(A, axis=0), jnp.sum(dA, axis=0)
    sA, sdA = jnp.sum(A), jnp.sum(dA)
    ones_row = jnp.ones((1, n), A.dtype)
    ones_col = jnp.ones((n, 1), A.dtype)

    out = (1.0 + p1[0]) * A + (1.0 + p1[1]) * dA
    out = out + p2[0] * A.T + p2[1] * dA.T
    out = out + jnp.diag(p3[0] * jnp.diag(A) + p3[1] * jnp.diag(dA))
    # term_4: column sums broadcast over rows (entry (i,j) = colsum[i]).
    out = out + (p4[0] / n * cA + p4[1] / n * cdA)[:, None] * ones_row
    # term_4_prime quirk: row-sum of A but column-sum of dA, broadcast as cols.
    out = out + (p4p[0] / n * rA + p4p[1] / n * cdA)[None, :] * ones_col
    # term_5: column sums broadcast over columns (entry (i,j) = colsum[j]).
    out = out + (p5[0] / n * cA + p5[1] / n * cdA)[None, :] * ones_col
    # term_5_prime: row sums broadcast over columns.
    out = out + (p5p[0] / n * rA + p5p[1] / n * rdA)[None, :] * ones_col
    out = out + jnp.diag(p6[0] / n * cA + p6[1] / n * cdA)
    out = out + jnp.diag(p6p[0] / n * rA + p6p[1] / n * rdA)
    out = out + (p7[0] / n**2 * sA + p7[1] / n**2 * sA) * jnp.ones((n, n), A.dtype)
    out = out + (p8[0] * sA + p8[1] * sdA) / n**2 * jnp.eye(n, dtype=A.dtype)
    return out


# ---------------------------------------------------------------------------
# Rank-structured decomposition
# ---------------------------------------------------------------------------


class FusedCoeffs(tp.NamedTuple):
    """The O(n) data defining ``A_bar`` on top of the (B1, B2) dense pair."""

    B1: jax.Array  # (n, n)   identity-pair combination
    B2: jax.Array  # (n, n)   transpose-pair combination (applied as B2^T @ M)
    dvec: jax.Array  # (n,)   diagonal contribution (row scaling)
    u: jax.Array  # (n,)     rank-1: u (x) colsum(M)
    v: jax.Array  # (n,)     rank-1: 1 (x) (v @ M)
    c7: jax.Array  # ()      rank-1: 1 (x) c7 * colsum(M)


def fused_coeffs(
    A: jax.Array, dA: jax.Array, params: tp.Sequence[jax.Array]
) -> FusedCoeffs:
    """Undirected 8-term basis -> rank-structured coefficients."""
    p1, p2, p3, p4, p5, p6, p7, p8 = params
    n = A.shape[0]
    rA = jnp.sum(A, axis=1)
    rdA = jnp.sum(dA, axis=1)
    sA = jnp.sum(A)
    sdA = jnp.sum(dA)

    B1 = (1.0 + p1[0]) * A + (1.0 + p1[1]) * dA
    B2 = p2[0] * A + p2[1] * dA
    dvec = (
        p3[0] * jnp.diag(A)
        + p3[1] * jnp.diag(dA)
        + (p6[0] * rA + p6[1] * rdA) / n
        + (p8[0] * sA + p8[1] * sdA) / n**2
    )
    u = (p4[0] * rA + p4[1] * rdA) / n
    v = (p5[0] * rA + p5[1] * rdA) / n
    c7 = (p7[0] + p7[1]) * sA / n**2  # quirk: both use sum(A)
    return FusedCoeffs(B1, B2, dvec, u, v, c7)


def fused_coeffs_directed(
    A: jax.Array, dA: jax.Array, params: tp.Sequence[jax.Array]
) -> FusedCoeffs:
    """Directed 11-term basis -> rank-structured coefficients."""
    p1, p2, p3, p4, p4p, p5, p5p, p6, p6p, p7, p8 = params
    n = A.shape[0]
    rA, rdA = jnp.sum(A, axis=1), jnp.sum(dA, axis=1)
    cA, cdA = jnp.sum(A, axis=0), jnp.sum(dA, axis=0)
    sA, sdA = jnp.sum(A), jnp.sum(dA)

    B1 = (1.0 + p1[0]) * A + (1.0 + p1[1]) * dA
    B2 = p2[0] * A + p2[1] * dA
    dvec = (
        p3[0] * jnp.diag(A)
        + p3[1] * jnp.diag(dA)
        + (p6[0] * cA + p6[1] * cdA) / n
        + (p6p[0] * rA + p6p[1] * rdA) / n
        + (p8[0] * sA + p8[1] * sdA) / n**2
    )
    u = (p4[0] * cA + p4[1] * cdA) / n
    v = (
        (p4p[0] * rA + p4p[1] * cdA)  # term_4_prime quirk
        + (p5[0] * cA + p5[1] * cdA)
        + (p5p[0] * rA + p5p[1] * rdA)
    ) / n
    c7 = (p7[0] + p7[1]) * sA / n**2
    return FusedCoeffs(B1, B2, dvec, u, v, c7)


def fused_matvec(coeffs: FusedCoeffs, M: jax.Array, add_identity: bool = False) -> jax.Array:
    """Compute ``A_bar @ M`` (plus optionally ``+ M``) from rank-structured
    coefficients. ``M``: (n, H). Two MXU matmuls + O(nH) vector ops.

    ``add_identity=True`` folds the residual ``m + A_bar @ m`` of the
    reference ConvLayer (layers.py:47) into the diagonal for free.
    """
    B1, B2, dvec, u, v, c7 = coeffs
    s = jnp.sum(M, axis=0)  # (H,)
    w = v @ M  # (H,)
    d = dvec + 1.0 if add_identity else dvec
    out = (
        B1 @ M
        + B2.T @ M
        + d[:, None] * M
        + u[:, None] * s[None, :]
        + (w + c7 * s)[None, :]
    )
    return out


def fused_apply(
    A: jax.Array,
    dA: jax.Array,
    M: jax.Array,
    params: tp.Sequence[jax.Array],
    directed: bool = False,
    add_identity: bool = False,
) -> jax.Array:
    """One-call fused ``(A, dA, M) -> A_bar @ M`` (never materialises A_bar)."""
    mk = fused_coeffs_directed if directed else fused_coeffs
    return fused_matvec(mk(A, dA, params), M, add_identity=add_identity)
