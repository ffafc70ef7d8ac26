"""Tiled Pallas kernel for the fused equivariant operator at scaled n.

Serves the regime above :data:`~gncde_tpu.ops.pallas.megakernel.MEGAKERNEL_MAX_N`
(whole-VMEM kernel), i.e. the reference's largest graphs -- twitter n=1000
(configs/pgt/twitter/perm_equiv_gncde_config.yaml), tgbn-genre n=1505
(configs/tgb/genre/st_gncde_config.yaml:30-35) -- and anything bigger, with
no upper bound beyond one chip's HBM (see :data:`TILED_MAX_N`).

The hot computation (reference src/models/vector_fields/layers.py:45-48 with
the fused operator of layers.py:102-160/256-345) decomposes as

    A_bar @ M = B1 @ M + B2^T @ M + O(n*H) rank-structured terms
    B1 = c_r0 A(t) + c_r1 dA(t),   B2 = c_c0 A(t) + c_c1 dA(t)

and A(t), dA(t) are *linear in the four Hermite coefficient planes*
(d, c, b, a), so

    B1 = w_r . (d, c, b, a),    w_r = c_r0 * wA(tau) + c_r1 * wdA(tau)
    wA(tau) = (tau^3, tau^2, tau, 1),   wdA(tau) = (3 tau^2, 2 tau, 1, 0).

The kernel therefore never materialises A(t)/dA(t) (in HBM *or* as separate
VMEM temporaries): each grid step loads one (TM, TK) tile of each bf16
coefficient plane, forms B1/B2 tiles with four fused multiply-adds each, and
feeds the MXU. One sweep of the planes serves BOTH matmuls:

    tile (i, k):  rowpart[i] += B1[i,k] @ M[k]        (blocked accumulator)
                  colpart[k] += B2[i,k]^T @ M[i]      (VMEM-resident (NP,H))

HBM traffic per layer eval = one bf16 read of the 4 interval planes
(8 n^2 bytes) -- the information-theoretic floor for this operator.

The O(n) reduction data the rank-structured terms need (row/col/diag sums of
A and dA) is NOT computed here: sums of A(t) are the same Hermite combination
of per-plane sums, so :func:`cubic_plane_reductions` precomputes reduced
stacks ONCE per trajectory (cached on ``interp.MatrixControl.red``) and
:func:`reductions_at` evaluates them in O(n) per vf eval.

Batching: `jax.vmap` of a gridded ``pallas_call`` prepends a batch grid
dimension and (verified on jax 0.9) remaps ``pl.program_id`` to the original
axes, so the loss-level batch vmap is efficient -- no unrolling, no
scalar-prefetch (the round-2 megakernel regression; see megakernel.py).

Differentiation: :func:`tiled_abar_apply` carries a custom VJP --
``dM`` reuses the SAME kernel with (w_row, w_col) swapped (transposing the
operator swaps the row/col pair), and the 8 per-plane weight cotangents come
from one :func:`_dw_call` sweep (fused SDDMM-style: per tile, ``G @ M^T`` /
``M @ G^T`` on the MXU contracted against each plane tile). Coefficient
planes are training DATA in every trainer; with ``symbolic_zeros`` their
cotangents are statically skipped (no (T-1, n, n) zero-scatters per eval).
Everything above the primitive (norm/linear/rank-1 terms) is plain JAX.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 256


def pick_tile(n: int) -> int:
    """Tile size by problem size. 512 runs ~1.55x faster PER BYTE than 256
    (measured at n=2048, v5e: 22.6 vs 35.1 us/layer-call -- fewer grid
    steps), but pads the plane read to a 512-multiple, so the choice
    minimises (padded n)^2 x per-byte cost. At most sizes >= 1024 the two
    pad to the same extent and 512 wins (tgbn-genre n=1505: both pad to
    1536); in the window where a 512 tile adds a whole extra 512-block
    (e.g. n in 1537..1791: 2048^2 vs 1792^2) 256 wins."""
    if n < 1024:
        return 256
    cost = {t: (_cdiv(n, t) * t) ** 2 * c
            for t, c in ((256, 1.55), (512, 1.0))}
    return min(cost, key=cost.get)

# colpart/dM accumulators are VMEM-resident (NP, H) f32; past this the
# resident buffers stop fitting comfortably next to double-buffered plane
# tiles. Graphs beyond it belong to the sparse/sharded path anyway.
TILED_MAX_N = 32768


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def hermite_weights(tau):
    """(wA, wdA): weights of A(t0+tau) and dA/dt over the (d, c, b, a) planes."""
    one = jnp.ones_like(tau)
    zero = jnp.zeros_like(tau)
    wA = jnp.stack([tau * tau * tau, tau * tau, tau, one])
    wdA = jnp.stack([3.0 * tau * tau, 2.0 * tau, one, zero])
    return wA, wdA


class PlaneReductions(tp.NamedTuple):
    """Per-plane reduced stacks: sums of each Hermite plane over rows/cols/diag.

    Each field is (T-1, n, 4) float32, last axis ordered like the coefficient
    tuple (d, c, b, a). ``reductions_at`` turns these into the O(n) sums of
    A(t), dA(t) by the same Hermite weights the kernel uses.
    """

    rs: jax.Array  # row sums:    rs[i, r, j] = sum_c plane_j[i, r, c]
    cs: jax.Array  # column sums: cs[i, c, j] = sum_r plane_j[i, r, c]
    dg: jax.Array  # diagonals:   dg[i, r, j] = plane_j[i, r, r]


def cubic_plane_reductions(coeffs) -> PlaneReductions:
    """Reduce the 4 (T-1, n, n) Hermite stacks once per trajectory (O(T n^2)
    read, amortised over every vf eval of the solve)."""
    rs = jnp.stack(
        [jnp.sum(c.astype(jnp.float32), axis=-1) for c in coeffs], axis=-1
    )
    cs = jnp.stack(
        [jnp.sum(c.astype(jnp.float32), axis=-2) for c in coeffs], axis=-1
    )
    dg = jnp.stack(
        [
            jnp.diagonal(c, axis1=-2, axis2=-1).astype(jnp.float32)
            for c in coeffs
        ],
        axis=-1,
    )
    return PlaneReductions(rs, cs, dg)


def reductions_from_slabs(slabs, wA, wdA):
    """Fallback: O(n^2) reductions straight from the sliced interval planes
    (used when the control carries no cached :class:`PlaneReductions`)."""
    stack = jnp.stack([s.astype(jnp.float32) for s in slabs])  # (4, n, n)
    A = jnp.einsum("p,pij->ij", wA, stack)
    dA = jnp.einsum("p,pij->ij", wdA, stack)
    return (
        jnp.sum(A, axis=1), jnp.sum(dA, axis=1),
        jnp.sum(A, axis=0), jnp.sum(dA, axis=0),
        jnp.diagonal(A), jnp.diagonal(dA),
    )


def reductions_at(red: PlaneReductions, idx, wA, wdA):
    """(rA, rdA, cA, cdA, diagA, diagdA) at interval ``idx`` -- O(n)."""
    rs = jax.lax.dynamic_index_in_dim(red.rs, idx, axis=0, keepdims=False)
    cs = jax.lax.dynamic_index_in_dim(red.cs, idx, axis=0, keepdims=False)
    dg = jax.lax.dynamic_index_in_dim(red.dg, idx, axis=0, keepdims=False)
    return (rs @ wA, rs @ wdA, cs @ wA, cs @ wdA, dg @ wA, dg @ wdA)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(n, TM, TK, ragged,
                wvec_ref, d_ref, c_ref, b_ref, a_ref, mk_ref, mi_ref,
                row_ref, col_ref):
    ii = pl.program_id(0)
    kk = pl.program_id(1)

    d = d_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    a = a_ref[:].astype(jnp.float32)
    B1 = (wvec_ref[0, 0] * d + wvec_ref[0, 1] * c
          + wvec_ref[0, 2] * b + wvec_ref[0, 3] * a)
    B2 = (wvec_ref[0, 4] * d + wvec_ref[0, 5] * c
          + wvec_ref[0, 6] * b + wvec_ref[0, 7] * a)
    if ragged:
        # Edge-overhang tiles read unspecified padding; zero it so the
        # matmuls stay exact (M's padded rows are explicit zeros, but
        # garbage may be non-finite and 0 * inf = nan).
        rows_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 0)
                   + ii * TM) < n
        cols_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
                   + kk * TK) < n
        valid = rows_ok & cols_ok
        B1 = jnp.where(valid, B1, 0.0)
        B2 = jnp.where(valid, B2, 0.0)
    B1 = B1.astype(jnp.bfloat16)
    B2 = B2.astype(jnp.bfloat16)

    @pl.when(kk == 0)
    def _():
        row_ref[:] = jnp.zeros_like(row_ref)

    row_ref[:] += jnp.dot(B1, mk_ref[:], preferred_element_type=jnp.float32)

    @pl.when((ii == 0) & (kk == 0))
    def _():
        col_ref[:] = jnp.zeros_like(col_ref)

    colc = jax.lax.dot_general(
        B2, mi_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_ref[pl.ds(pl.multiple_of(kk * TK, TK), TK), :] += colc


def _fwd_call(slabs, wvec, M, *, tile, interpret):
    n = slabs[0].shape[0]
    NP, H = M.shape
    TM = TK = tile
    I, K = _cdiv(n, TM), _cdiv(n, TK)
    if NP != I * TM:
        raise ValueError(
            f"M rows {NP} != padded n {I * TM} (n={n}, tile={tile})")
    ragged = (n % tile) != 0
    kern = functools.partial(_fwd_kernel, n, TM, TK, ragged)
    plane_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(I, K),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # wvec (1, 8)
            plane_spec, plane_spec, plane_spec, plane_spec,  # d, c, b, a
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, H), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, H), jnp.float32),
            jax.ShapeDtypeStruct((NP, H), jnp.float32),
        ],
        interpret=interpret,
    )(wvec, *slabs, M, M)


# ---------------------------------------------------------------------------
# Backward kernel: per-plane weight cotangents
# ---------------------------------------------------------------------------


def _dw_kernel(n, TM, TK, ragged, g_i_ref, m_k_ref, m_i_ref, g_k_ref,
               d_ref, c_ref, b_ref, a_ref, dw_ref):
    """Accumulate dw[j] = <plane_j, G M^T> (j < 4) and <plane_j, M G^T>
    (j >= 4): ``d(out)/d(w_row[j]) = plane_j @ M`` gives
    ``dw_row[j] = sum(plane_j * (G M^T))`` and the transpose pair likewise.
    """
    ii = pl.program_id(0)
    kk = pl.program_id(1)

    @pl.when((ii == 0) & (kk == 0))
    def _():
        # Scalar-wise init: SMEM only supports SCALAR loads/stores on
        # hardware (a vector zeros_like here compiled in interpret mode but
        # failed on the chip).
        for j in range(8):
            dw_ref[0, j] = 0.0

    # G/M are real zero-padded (NP, H) arrays, so P and Q are exact; only
    # the plane tiles can overhang (n, n) with unspecified padding.
    P = jnp.dot(g_i_ref[:], m_k_ref[:].T, preferred_element_type=jnp.float32)
    Q = jnp.dot(m_i_ref[:], g_k_ref[:].T, preferred_element_type=jnp.float32)
    if ragged:
        rows_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 0)
                   + ii * TM) < n
        cols_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
                   + kk * TK) < n
        valid = rows_ok & cols_ok
    for j, ref in enumerate((d_ref, c_ref, b_ref, a_ref)):
        plane = ref[:].astype(jnp.float32)
        if ragged:
            plane = jnp.where(valid, plane, 0.0)
        dw_ref[0, j] += jnp.sum(plane * P)
        dw_ref[0, 4 + j] += jnp.sum(plane * Q)


def _dw_call(slabs, G, M, *, tile, interpret):
    n = slabs[0].shape[0]
    NP, H = M.shape
    TM = TK = tile
    I, K = _cdiv(n, TM), _cdiv(n, TK)
    ragged = (n % tile) != 0
    kern = functools.partial(_dw_kernel, n, TM, TK, ragged)
    plane_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(I, K),
        in_specs=[
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            plane_spec, plane_spec, plane_spec, plane_spec,
        ],
        out_specs=pl.BlockSpec((1, 8), lambda i, k: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        interpret=interpret,
    )(G, M, M, G, *slabs)


# ---------------------------------------------------------------------------
# Two-plane forward kernel: reads materialised A(t), dA(t) tiles
# ---------------------------------------------------------------------------


def _fwd2_kernel(n, TM, TK, ragged,
                 cvec_ref, A_ref, dA_ref, mk_ref, mi_ref, row_ref, col_ref):
    ii = pl.program_id(0)
    kk = pl.program_id(1)

    A = A_ref[:]
    dA = dA_ref[:]
    cr0 = cvec_ref[0, 0].astype(A.dtype)
    cr1 = cvec_ref[0, 1].astype(A.dtype)
    cc0 = cvec_ref[0, 2].astype(A.dtype)
    cc1 = cvec_ref[0, 3].astype(A.dtype)
    B1 = cr0 * A + cr1 * dA
    B2 = cc0 * A + cc1 * dA
    if ragged:
        rows_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 0)
                   + ii * TM) < n
        cols_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
                   + kk * TK) < n
        valid = rows_ok & cols_ok
        B1 = jnp.where(valid, B1, 0)
        B2 = jnp.where(valid, B2, 0)

    @pl.when(kk == 0)
    def _():
        row_ref[:] = jnp.zeros_like(row_ref)

    row_ref[:] += jnp.dot(B1, mk_ref[:], preferred_element_type=jnp.float32)

    @pl.when((ii == 0) & (kk == 0))
    def _():
        col_ref[:] = jnp.zeros_like(col_ref)

    colc = jax.lax.dot_general(
        B2, mi_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_ref[pl.ds(pl.multiple_of(kk * TK, TK), TK), :] += colc


def _fwd2_call(A, dA, cvec, M, *, tile, interpret):
    n = A.shape[0]
    NP, H = M.shape
    TM = TK = tile
    I, K = _cdiv(n, TM), _cdiv(n, TK)
    if NP != I * TM:
        raise ValueError(
            f"M rows {NP} != padded n {I * TM} (n={n}, tile={tile})")
    ragged = (n % tile) != 0
    kern = functools.partial(_fwd2_kernel, n, TM, TK, ragged)
    plane_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(I, K),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cvec (1, 4)
            plane_spec, plane_spec,                 # A, dA
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, H), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, H), jnp.float32),
            jax.ShapeDtypeStruct((NP, H), jnp.float32),
        ],
        interpret=interpret,
    )(cvec, A, dA, M, M)


def _dw2_kernel(n, TM, TK, ragged, g_i_ref, m_k_ref, m_i_ref, g_k_ref,
                A_ref, dA_ref, dw_ref):
    """dw[0:2] = <A|dA, G M^T>, dw[2:4] = <A|dA, M G^T> (two-plane variant)."""
    ii = pl.program_id(0)
    kk = pl.program_id(1)

    @pl.when((ii == 0) & (kk == 0))
    def _():
        for j in range(4):  # scalar-wise: see _dw_kernel
            dw_ref[0, j] = 0.0

    P = jnp.dot(g_i_ref[:], m_k_ref[:].T, preferred_element_type=jnp.float32)
    Q = jnp.dot(m_i_ref[:], g_k_ref[:].T, preferred_element_type=jnp.float32)
    if ragged:
        rows_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 0)
                   + ii * TM) < n
        cols_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
                   + kk * TK) < n
        valid = rows_ok & cols_ok
    for j, ref in enumerate((A_ref, dA_ref)):
        plane = ref[:].astype(jnp.float32)
        if ragged:
            plane = jnp.where(valid, plane, 0.0)
        dw_ref[0, j] += jnp.sum(plane * P)
        dw_ref[0, 2 + j] += jnp.sum(plane * Q)


def _bwd2_kernel(n, TM, TK, ragged, cvec_ref, A_ref, dA_ref,
                 g_i_ref, g_k_ref, m_i_ref, m_k_ref,
                 row_ref, col_ref, dw_ref):
    """Merged training backward: dM AND the 4 plane-weight cotangents in ONE
    plane sweep.

    Per tile, four MXU products on the SAME (bf16) plane tiles --
    ``AG = A @ g_k``, ``dAG = dA @ g_k``, ``ATG = A^T @ g_i``,
    ``dATG = dA^T @ g_i`` -- then everything downstream is (tile, H)-sized:

        dM row part = c_col . (AG, dAG)          (out = B(c_row) M + B(c_col)^T M
        dM col part = c_row . (ATG, dATG)         => dM = B(c_row)^T g + B(c_col) g)
        dw[0:2] = <A|dA, G M^T> = sum((ATG|dATG) * m_k)
        dw[2:4] = <A|dA, M G^T> = sum((AG|dAG) * m_i)

    vs the split path (_fwd2_call swapped + _dw2_call): half the HBM plane
    traffic (one sweep instead of two) and no plane-sized VPU intermediates
    (the split _dw2 materialises (TM, TK) f32 ``G M^T``/``M G^T`` tiles).
    """
    ii = pl.program_id(0)
    kk = pl.program_id(1)

    A = A_ref[:]
    dA = dA_ref[:]
    if ragged:
        # g/M padded rows are exact zeros, but plane overhang may be
        # non-finite garbage: mask once, every product below is then exact.
        rows_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 0)
                   + ii * TM) < n
        cols_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
                   + kk * TK) < n
        valid = rows_ok & cols_ok
        A = jnp.where(valid, A, 0)
        dA = jnp.where(valid, dA, 0)

    g_k = g_k_ref[:]
    g_i = g_i_ref[:]
    AG = jnp.dot(A, g_k, preferred_element_type=jnp.float32)      # (TM, H)
    dAG = jnp.dot(dA, g_k, preferred_element_type=jnp.float32)
    tdims = (((0,), (0,)), ((), ()))
    ATG = jax.lax.dot_general(A, g_i, dimension_numbers=tdims,
                              preferred_element_type=jnp.float32)  # (TK, H)
    dATG = jax.lax.dot_general(dA, g_i, dimension_numbers=tdims,
                               preferred_element_type=jnp.float32)

    @pl.when((ii == 0) & (kk == 0))
    def _():
        for j in range(4):  # scalar-wise: see _dw_kernel
            dw_ref[0, j] = 0.0

    m_k = m_k_ref[:].astype(jnp.float32)
    m_i = m_i_ref[:].astype(jnp.float32)
    dw_ref[0, 0] += jnp.sum(ATG * m_k)
    dw_ref[0, 1] += jnp.sum(dATG * m_k)
    dw_ref[0, 2] += jnp.sum(AG * m_i)
    dw_ref[0, 3] += jnp.sum(dAG * m_i)

    @pl.when(kk == 0)
    def _():
        row_ref[:] = jnp.zeros_like(row_ref)

    row_ref[:] += cvec_ref[0, 0] * AG + cvec_ref[0, 1] * dAG

    @pl.when((ii == 0) & (kk == 0))
    def _():
        col_ref[:] = jnp.zeros_like(col_ref)

    col_ref[pl.ds(pl.multiple_of(kk * TK, TK), TK), :] += (
        cvec_ref[0, 2] * ATG + cvec_ref[0, 3] * dATG)


def _bwd2_call(A, dA, cvec, G, M, *, tile, interpret):
    """One-sweep backward over (A, dA): returns (dM rowpart, dM colpart, dw4).

    ``cvec`` = (1, 4) f32 ``[c_col0, c_col1, c_row0, c_row1]`` (the dM
    operator is the forward with the row/col pairs swapped); ``G``/``M`` are
    zero-padded (NP, H) bf16.
    """
    n = A.shape[0]
    NP, H = M.shape
    TM = TK = tile
    I, K = _cdiv(n, TM), _cdiv(n, TK)
    if NP != I * TM:
        raise ValueError(
            f"M rows {NP} != padded n {I * TM} (n={n}, tile={tile})")
    ragged = (n % tile) != 0
    kern = functools.partial(_bwd2_kernel, n, TM, TK, ragged)
    plane_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(I, K),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cvec (1, 4)
            plane_spec, plane_spec,                 # A, dA
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, H), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, H), jnp.float32),
            jax.ShapeDtypeStruct((NP, H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(cvec, A, dA, G, G, M, M)


# ---------------------------------------------------------------------------
# Rectangular two-plane pair primitive (differentiable planes)
# ---------------------------------------------------------------------------
#
# Serves (a) the node-sharded multi-device path (parallel/sharded_ops.py
# backend="pallas": each device's local compute on its (n_loc, n) row slab)
# and (b) the enc_idx modulated path (square planes that ARE functions of
# trainable MLP/embedding parameters, so plane cotangents must flow). Unlike
# :func:`tiled_fused2`, A/dA here are genuine differentiable inputs.


def _pair_kernel(nr, nc, TM, TK, ragged,
                 cvec_ref, A_ref, dA_ref, mk_ref, mi_ref, row_ref, col_ref):
    """rowpart[i] += B1[i,k] @ mk[k]; colpart[k] += B2[i,k]^T @ mi[i] with
    B1 = c0 A + c1 dA, B2 = c2 A + c3 dA, over a rectangular (I, K) grid."""
    ii = pl.program_id(0)
    kk = pl.program_id(1)

    A = A_ref[:]
    dA = dA_ref[:]
    cr0 = cvec_ref[0, 0].astype(A.dtype)
    cr1 = cvec_ref[0, 1].astype(A.dtype)
    cc0 = cvec_ref[0, 2].astype(A.dtype)
    cc1 = cvec_ref[0, 3].astype(A.dtype)
    B1 = cr0 * A + cr1 * dA
    B2 = cc0 * A + cc1 * dA
    if ragged:
        rows_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 0)
                   + ii * TM) < nr
        cols_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
                   + kk * TK) < nc
        valid = rows_ok & cols_ok
        B1 = jnp.where(valid, B1, 0)
        B2 = jnp.where(valid, B2, 0)

    @pl.when(kk == 0)
    def _():
        row_ref[:] = jnp.zeros_like(row_ref)

    row_ref[:] += jnp.dot(B1, mk_ref[:], preferred_element_type=jnp.float32)

    @pl.when((ii == 0) & (kk == 0))
    def _():
        col_ref[:] = jnp.zeros_like(col_ref)

    colc = jax.lax.dot_general(
        B2, mi_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col_ref[pl.ds(pl.multiple_of(kk * TK, TK), TK), :] += colc


def _pair_call(A, dA, cvec, Mk, Mi, *, nr, nc, tile, interpret):
    """Rectangular pair sweep. A/dA: (ra, ca) planes with logical extent
    (nr, nc) (overhang masked in-kernel when nr/nc aren't tile multiples --
    pass zero-padded planes with nr/nc = padded sizes to skip the masks).
    Mk: (NPc, H) column-side operand, Mi: (NPr, H) row-side operand, both
    zero-padded. Returns (rowpart (NPr, H) f32, colpart (NPc, H) f32)."""
    NPr, H = Mi.shape
    NPc = Mk.shape[0]
    TM = TK = tile
    I, K = _cdiv(nr, TM), _cdiv(nc, TK)
    if NPr != I * TM or NPc != K * TK:
        raise ValueError(
            f"operand rows (Mi {NPr}, Mk {NPc}) != padded extents "
            f"({I * TM}, {K * TK}) for (nr={nr}, nc={nc}, tile={tile})")
    ragged = (nr % tile != 0) or (nc % tile != 0)
    kern = functools.partial(_pair_kernel, nr, nc, TM, TK, ragged)
    plane_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(I, K),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cvec (1, 4)
            plane_spec, plane_spec,                 # A, dA
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NPc, H), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NPr, H), jnp.float32),
            jax.ShapeDtypeStruct((NPc, H), jnp.float32),
        ],
        interpret=interpret,
    )(cvec, A, dA, Mk, Mi)


def _pair_dw_kernel(nr, nc, TM, TK, ragged,
                    gr_ref, mk_ref, mi_ref, gc_ref, A_ref, dA_ref, dw_ref):
    """dw[0:2] = <A|dA, g_r Mk^T>, dw[2:4] = <A|dA, Mi g_c^T> (rect)."""
    ii = pl.program_id(0)
    kk = pl.program_id(1)

    @pl.when((ii == 0) & (kk == 0))
    def _():
        for j in range(4):  # scalar-wise: see _dw_kernel
            dw_ref[0, j] = 0.0

    P = jnp.dot(gr_ref[:], mk_ref[:].T, preferred_element_type=jnp.float32)
    Q = jnp.dot(mi_ref[:], gc_ref[:].T, preferred_element_type=jnp.float32)
    if ragged:
        rows_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 0)
                   + ii * TM) < nr
        cols_ok = (jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
                   + kk * TK) < nc
        valid = rows_ok & cols_ok
    for j, ref in enumerate((A_ref, dA_ref)):
        plane = ref[:].astype(jnp.float32)
        if ragged:
            plane = jnp.where(valid, plane, 0.0)
        dw_ref[0, j] += jnp.sum(plane * P)
        dw_ref[0, 2 + j] += jnp.sum(plane * Q)


def _pair_dw_call(A, dA, Gr, Mk, Mi, Gc, *, nr, nc, tile, interpret):
    NPr, H = Mi.shape
    NPc = Mk.shape[0]
    TM = TK = tile
    I, K = _cdiv(nr, TM), _cdiv(nc, TK)
    ragged = (nr % tile != 0) or (nc % tile != 0)
    kern = functools.partial(_pair_dw_kernel, nr, nc, TM, TK, ragged)
    plane_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(I, K),
        in_specs=[
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            plane_spec, plane_spec,
        ],
        out_specs=pl.BlockSpec((1, 4), lambda i, k: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32),
        interpret=interpret,
    )(Gr, Mk, Mi, Gc, A, dA)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def plane_pair_apply(A, dA, c_row, c_col, Mk, Mi, nr, nc, tile):
    """Differentiable rectangular pair: ``(B1 @ Mk, B2^T @ Mi)`` with
    ``B1 = c_row . (A, dA)``, ``B2 = c_col . (A, dA)``.

    A/dA: (nr-, nc-extent) planes, ANY float dtype (consumed at their own
    precision as MXU operands; pass bf16 for speed). Mk: (NPc, H), Mi:
    (NPr, H), zero-padded, where NP* = ceil(n*/tile)*tile. Unlike
    :func:`tiled_fused2`, the planes are GENUINE differentiable inputs --
    their cotangents are rank-H products ``c.(g_r Mk^T, Mi g_c^T)`` computed
    in XLA (MXU matmuls), statically skipped when unperturbed. Used by the
    node-sharded Pallas path (rect slabs) and the enc_idx modulated path
    (square trainable planes). Returns (rowpart (NPr, H), colpart (NPc, H)),
    both f32.
    """
    cvec = jnp.concatenate([c_row, c_col]).reshape(1, 4).astype(jnp.float32)
    return tuple(_pair_call(
        A, dA, cvec, Mk, Mi, nr=nr, nc=nc, tile=tile,
        interpret=_should_interpret()))


def _ppa_fwd(A, dA, c_row, c_col, Mk, Mi, nr, nc, tile):
    needs = (_perturbed(A) or _perturbed(dA),
             _perturbed(c_row), _perturbed(c_col),
             _perturbed(Mk), _perturbed(Mi))
    A_v, dA_v, cr_v, cc_v, Mk_v, Mi_v = (
        _unwrap(A), _unwrap(dA), _unwrap(c_row), _unwrap(c_col),
        _unwrap(Mk), _unwrap(Mi))
    out = plane_pair_apply(A_v, dA_v, cr_v, cc_v, Mk_v, Mi_v, nr, nc, tile)
    return out, (A_v, dA_v, cr_v, cc_v, Mk_v, Mi_v, needs)


def _ppa_bwd(nr, nc, tile, res, gs):
    A, dA, c_row, c_col, Mk, Mi, needs = res
    need_planes, need_cr, need_cc, need_Mk, need_Mi = needs
    g_r, g_c = gs
    r_zero = isinstance(g_r, jax.custom_derivatives.SymbolicZero)
    c_zero = isinstance(g_c, jax.custom_derivatives.SymbolicZero)
    if r_zero and c_zero:
        return (None,) * 6
    interpret = _should_interpret()
    NPr, H = Mi.shape
    NPc = Mk.shape[0]
    g_r = jnp.zeros((NPr, H), jnp.float32) if r_zero else g_r
    g_c = jnp.zeros((NPc, H), jnp.float32) if c_zero else g_c
    # Precision follows the caller's plane dtype: bf16 planes (the TPU
    # production setting) get bf16 cotangent operands; f32 planes keep the
    # backward exact (the sharded parity gates compare against XLA-f32).
    mm_dtype = jnp.bfloat16 if A.dtype == jnp.bfloat16 else jnp.float32
    grb = g_r.astype(mm_dtype)
    gcb = g_c.astype(mm_dtype)

    d_A = d_dA = d_cr = d_cc = d_Mk = d_Mi = None
    if need_Mk or need_Mi:
        # d_Mi = B2 @ g_c (rowpart-style, pair c_col);
        # d_Mk = B1^T @ g_r (colpart-style, pair c_row): one fused sweep.
        cvec = jnp.concatenate([c_col, c_row]).reshape(1, 4).astype(
            jnp.float32)
        d_Mi_v, d_Mk_v = _pair_call(
            A, dA, cvec, gcb, grb, nr=nr, nc=nc, tile=tile,
            interpret=interpret)
        d_Mk = d_Mk_v if need_Mk else None
        d_Mi = d_Mi_v if need_Mi else None
    if need_cr or need_cc:
        dw = _pair_dw_call(
            A, dA, grb, Mk.astype(mm_dtype), Mi.astype(mm_dtype),
            gcb, nr=nr, nc=nc, tile=tile, interpret=interpret)[0]
        d_cr = dw[:2] if need_cr else None
        d_cc = dw[2:] if need_cc else None
    if need_planes:
        # Rank-H plane cotangents (exact: padded rows of g/Mk/Mi are zero).
        GMt = g_r @ Mk.T.astype(jnp.float32)     # (NPr, NPc)
        MGt = Mi.astype(jnp.float32) @ g_c.T     # (NPr, NPc)
        ra, ca = A.shape
        GMt = GMt[:ra, :ca]
        MGt = MGt[:ra, :ca]
        d_A = (c_row[0] * GMt + c_col[0] * MGt).astype(A.dtype)
        d_dA = (c_row[1] * GMt + c_col[1] * MGt).astype(dA.dtype)
    return d_A, d_dA, d_cr, d_cc, d_Mk, d_Mi


plane_pair_apply.defvjp(_ppa_fwd, _ppa_bwd, symbolic_zeros=True)


def _dw2_call(A, dA, G, M, *, tile, interpret):
    n = A.shape[0]
    NP, H = M.shape
    TM = TK = tile
    I, K = _cdiv(n, TM), _cdiv(n, TK)
    ragged = (n % tile) != 0
    kern = functools.partial(_dw2_kernel, n, TM, TK, ragged)
    plane_spec = pl.BlockSpec((TM, TK), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(I, K),
        in_specs=[
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, H), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            plane_spec, plane_spec,
        ],
        out_specs=pl.BlockSpec((1, 4), lambda i, k: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32),
        interpret=interpret,
    )(G, M, M, G, A, dA)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def tiled_fused2(A, dA, slabs, wA, wdA, c_row, c_col, M, tile=DEFAULT_TILE):
    """``B1 @ M + B2^T @ M`` with B1 = c_row.(A, dA), B2 = c_col.(A, dA).

    The fast-path formulation of :func:`tiled_abar_apply`: ``A``/``dA`` are
    the MATERIALISED bf16 interval planes (computed once per vf eval by XLA
    from the Hermite stacks -- a gather-fused read of the 4 coefficient
    planes), so each per-layer sweep reads 2 planes instead of 4 and forms
    B1/B2 with two fused multiply-adds -- less than half the HBM traffic
    and roughly a third of the VPU work of the 4-plane kernel. ``A``/``dA``
    may be pre-padded to (NP, NP) with explicit zeros (``tiled_vf_eval``
    does); the kernels then skip per-tile ragged masking entirely.

    Gradient contract: ``A``/``dA`` are REDUNDANT CACHE INPUTS -- pass them
    as ``stop_gradient`` of ``wA.(slabs)`` / ``wdA.(slabs)``. The complete
    derivative flows through (slabs, wA, wdA, c_row, c_col, M): the tau
    chain rides the O(4) ``wA``/``wdA`` cotangents (never an (n, n)
    cotangent), and slab cotangents are statically skipped unless perturbed.
    """
    cvec = jnp.concatenate([c_row, c_col]).reshape(1, 4).astype(jnp.float32)
    rowpart, colpart = _fwd2_call(
        A, dA, cvec, M.astype(jnp.bfloat16),
        tile=tile, interpret=_should_interpret())
    return rowpart + colpart


def _tf2_fwd(A, dA, slabs, wA, wdA, c_row, c_col, M, tile):
    if _perturbed(A) or _perturbed(dA):
        raise ValueError(
            "tiled_fused2: A/dA are cache inputs -- pass stop_gradient "
            "planes; gradients flow through (slabs, wA, wdA, c_row, c_col)."
        )
    needs = (_perturbed(slabs), _perturbed(wA) or _perturbed(wdA),
             _perturbed(c_row), _perturbed(c_col), _perturbed(M))
    A_v, dA_v, slabs_v, wA_v, wdA_v, cr_v, cc_v, M_v = (
        _unwrap(A), _unwrap(dA), _unwrap(slabs), _unwrap(wA), _unwrap(wdA),
        _unwrap(c_row), _unwrap(c_col), _unwrap(M))
    out = tiled_fused2(A_v, dA_v, slabs_v, wA_v, wdA_v, cr_v, cc_v, M_v, tile)
    return out, (A_v, dA_v, slabs_v, wA_v, wdA_v, cr_v, cc_v, M_v, needs)


def _tf2_bwd(tile, res, g):
    (A, dA, slabs, wA, wdA, c_row, c_col, M,
     (need_slabs, need_w, need_cr, need_cc, need_M)) = res
    if isinstance(g, jax.custom_derivatives.SymbolicZero):
        return (None,) * 8
    interpret = _should_interpret()
    gb = g.astype(jnp.bfloat16)
    Mb = M.astype(jnp.bfloat16)

    d_M = d_wA = d_wdA = d_cr = d_cc = d_slabs = None
    # The TRAINING hot path (params perturbed, tau/planes not): ONE merged
    # plane sweep produces dM and the 4 c_row/c_col cotangents together --
    # half the HBM traffic of the split dM-kernel + _dw2_call pair.
    use_merged = (need_M and (need_cr or need_cc)
                  and not (need_slabs or need_w))
    if need_M and not use_merged:
        # Transposing the operator swaps the row/col coefficient pairs.
        d_M = tiled_fused2(A, dA, slabs, wA, wdA, c_col, c_row, gb, tile)
    if need_slabs or need_w:
        # Per-slab inner products: dw8[j] = <slab_j, G M^T>, [4+j] = <.., M G^T>
        dw8 = _dw_call(slabs, gb, Mb, tile=tile, interpret=interpret)[0]
        if need_w:
            # w_row[j] = c_r0 wA[j] + c_r1 wdA[j]; likewise col.
            d_wA = c_row[0] * dw8[:4] + c_col[0] * dw8[4:]
            d_wdA = c_row[1] * dw8[:4] + c_col[1] * dw8[4:]
        if need_cr or need_cc:
            d_cr = jnp.stack([dw8[:4] @ wA, dw8[:4] @ wdA])
            d_cc = jnp.stack([dw8[4:] @ wA, dw8[4:] @ wdA])
            d_cr = d_cr if need_cr else None
            d_cc = d_cc if need_cc else None
        if need_slabs:
            n = slabs[0].shape[0]
            gf = g[:n].astype(jnp.float32)
            GMt = gf @ M[:n].T.astype(jnp.float32)
            MGt = GMt.T
            w_row = c_row[0] * wA + c_row[1] * wdA
            w_col = c_col[0] * wA + c_col[1] * wdA
            d_slabs = tuple(
                (w_row[j] * GMt + w_col[j] * MGt).astype(slabs[j].dtype)
                for j in range(4)
            )
    elif use_merged:
        cvec = (jnp.concatenate([c_col, c_row]).reshape(1, 4)
                .astype(jnp.float32))
        rowp, colp, dw4 = _bwd2_call(A, dA, cvec, gb, Mb,
                                     tile=tile, interpret=interpret)
        d_M = rowp + colp
        d_cr = dw4[0, :2] if need_cr else None
        d_cc = dw4[0, 2:] if need_cc else None
    elif need_cr or need_cc:
        # Cheaper 2-plane inner products when tau isn't perturbed.
        dw4 = _dw2_call(A, dA, gb, Mb, tile=tile, interpret=interpret)[0]
        d_cr = dw4[:2] if need_cr else None
        d_cc = dw4[2:] if need_cc else None
    return None, None, d_slabs, d_wA, d_wdA, d_cr, d_cc, d_M


tiled_fused2.defvjp(_tf2_fwd, _tf2_bwd, symbolic_zeros=True)


# ---------------------------------------------------------------------------
# Differentiable primitive
# ---------------------------------------------------------------------------


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def tiled_abar_apply(slabs, w_row, w_col, M, tile=DEFAULT_TILE):
    """``B(w_row) @ M + B(w_col)^T @ M`` over Hermite interval planes, tiled.

    slabs: 4-tuple of (n, n) interval planes (any float dtype; consumed as
    bf16 matmul operands with f32 accumulation). w_row/w_col: (4,) f32
    per-plane weights (see module docstring). M: (NP, H) with
    NP = ceil(n/tile)*tile, rows >= n zero. Returns (NP, H) f32 whose [:n]
    rows hold the result; rows >= n are zero.
    """
    wvec = jnp.concatenate([w_row, w_col]).reshape(1, 8).astype(jnp.float32)
    rowpart, colpart = _fwd_call(slabs, wvec, M.astype(jnp.bfloat16),
                                 tile=tile, interpret=_should_interpret())
    return rowpart + colpart


def _unwrap(tree):
    return jax.tree_util.tree_map(lambda leaf: leaf.value, tree)


def _perturbed(tree) -> bool:
    return any(leaf.perturbed for leaf in jax.tree_util.tree_leaves(tree))


def _taa_fwd(slabs, w_row, w_col, M, tile):
    # NOTE: custom_vjp's fwd receives nondiff_argnums in their ORIGINAL
    # positions (only bwd gets them as leading args).
    needs = (_perturbed(slabs), _perturbed(w_row), _perturbed(w_col),
             _perturbed(M))
    slabs_v, w_row_v, w_col_v, M_v = (
        _unwrap(slabs), _unwrap(w_row), _unwrap(w_col), _unwrap(M))
    out = tiled_abar_apply(slabs_v, w_row_v, w_col_v, M_v, tile)
    return out, (slabs_v, w_row_v, w_col_v, M_v, needs)


def _taa_bwd(tile, res, g):
    slabs, w_row, w_col, M, (need_slabs, need_wr, need_wc, need_M) = res
    if isinstance(g, jax.custom_derivatives.SymbolicZero):
        return None, None, None, None
    n = slabs[0].shape[0]
    interpret = _should_interpret()
    gb = g.astype(jnp.bfloat16)

    d_M = d_w_row = d_w_col = d_slabs = None
    if need_M:
        # dM = B(w_row)^T g + B(w_col) g: the same kernel with the weight
        # pairs swapped (transposing the operator swaps row/col roles).
        d_M = tiled_abar_apply(slabs, w_col, w_row, gb, tile)
    if need_wr or need_wc:
        dw = _dw_call(slabs, gb, M.astype(jnp.bfloat16),
                      tile=tile, interpret=interpret)[0]
        d_w_row = dw[:4] if need_wr else None
        d_w_col = dw[4:] if need_wc else None
    if need_slabs:
        # Rare path (coefficient planes are data in every trainer): dense
        # outer products, one (n, n) per plane.
        gf = g[:n].astype(jnp.float32)
        Mf = M[:n].astype(jnp.float32)
        GMt = gf @ Mf.T
        MGt = GMt.T
        d_slabs = tuple(
            (w_row[j] * GMt + w_col[j] * MGt).astype(slabs[j].dtype)
            for j in range(4)
        )
    return d_slabs, d_w_row, d_w_col, d_M


tiled_abar_apply.defvjp(_taa_fwd, _taa_bwd, symbolic_zeros=True)


# ---------------------------------------------------------------------------
# Full vector-field evaluation (plain JAX above the primitive)
# ---------------------------------------------------------------------------


def _interval(ts, t):
    idx = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0,
                   ts.shape[0] - 2)
    return idx, t - ts[idx]


def _rank_terms(p, directed, n, rA, rdA, cA, cdA, dgA, dgdA, sA, sdA):
    """O(n) rank-structured tail of the fused basis apply: (dvec, u, v, c7)
    with the residual identity folded into dvec. Shared by the Hermite-
    factorised and materialised-plane tiled paths; reproduces the reference
    term_4'/term_7 quirks (equiv_basis.fused_coeffs[_directed])."""
    if directed:
        _, _, p3, p4, p4p, p5, p5p, p6, p6p, p7, p8 = p
        dvec = (p3[0] * dgA + p3[1] * dgdA
                + (p6[0] * cA + p6[1] * cdA) / n
                + (p6p[0] * rA + p6p[1] * rdA) / n
                + (p8[0] * sA + p8[1] * sdA) / n**2 + 1.0)
        u = (p4[0] * cA + p4[1] * cdA) / n
        v = ((p4p[0] * rA + p4p[1] * cdA)   # term_4' quirk, layers.py:288
             + (p5[0] * cA + p5[1] * cdA)
             + (p5p[0] * rA + p5p[1] * rdA)) / n
    else:
        _, _, p3, p4, p5, p6, p7, p8 = p
        dvec = (p3[0] * dgA + p3[1] * dgdA
                + (p6[0] * rA + p6[1] * rdA) / n
                + (p8[0] * sA + p8[1] * sdA) / n**2 + 1.0)
        u = (p4[0] * rA + p4[1] * rdA) / n
        v = (p5[0] * rA + p5[1] * rdA) / n
    c7 = (p7[0] + p7[1]) * sA / n**2  # quirk: both operands sum(A)
    return dvec, u, v, c7


def tiled_vf_eval_planes(A, dA, Z, vf, tile: tp.Optional[int] = None):
    """Evaluate a PermEquiv(Dir)GraphVectorField on MATERIALISED (n, n)
    planes via per-layer Pallas pair sweeps, with the planes as GENUINE
    differentiable inputs.

    Serves the enc_idx configs (reference
    perm_equiv_dir_graph_vector_field.py:185-236): the modulated A/dA are
    functions of trainable MLP/embedding parameters, so the
    Hermite-factorised :func:`tiled_vf_eval` contract (stop_gradient cache
    planes) does not apply -- plane cotangents flow through
    :func:`plane_pair_apply`'s rank-H backward into the modulation chain.
    Pass bf16 planes for MXU-native speed (the cast is itself
    differentiable); reductions are computed from the planes in f32.
    """
    n = Z.shape[0]
    if tile is None:
        tile = pick_tile(n)
    directed = (
        type(vf.gnn_layers[0]).__name__ == "ConvEquivFusionDirectedLayer"
    )
    NP = _cdiv(n, tile) * tile
    if A.shape[0] == n and NP != n:
        Ap = jnp.zeros((NP, NP), A.dtype).at[:n, :n].set(A)
        dAp = jnp.zeros((NP, NP), dA.dtype).at[:n, :n].set(dA)
    elif A.shape[0] in (n, NP):
        # Already padded (e.g. by the fused modulation kernel): rows/cols
        # >= n are zero by contract, so the padded reductions below are
        # exact after slicing.
        Ap, dAp = A, dA
    else:
        raise ValueError(
            f"planes of shape {A.shape} don't match n={n} (padded {NP})")
    Af = Ap.astype(jnp.float32)
    dAf = dAp.astype(jnp.float32)
    rA, rdA = jnp.sum(Af, axis=1)[:n], jnp.sum(dAf, axis=1)[:n]
    cA, cdA = jnp.sum(Af, axis=0)[:n], jnp.sum(dAf, axis=0)[:n]
    dgA, dgdA = jnp.diagonal(Af)[:n], jnp.diagonal(dAf)[:n]
    sA, sdA = jnp.sum(rA), jnp.sum(rdA)
    feats = Z
    L = len(vf.gnn_layers)
    for l, layer in enumerate(vf.gnn_layers):
        M = layer.conv_layer.transform(feats)  # (n, H)
        p = layer.params
        p1, p2 = p[0], p[1]
        if NP != n:
            Mp = jnp.zeros((NP, M.shape[1]), M.dtype).at[:n].set(M)
        else:
            Mp = M
        rowp, colp = plane_pair_apply(
            Ap, dAp, 1.0 + p1, p2, Mp, Mp, NP, NP, tile)
        heavy = (rowp + colp)[:n]
        dvec, u, v, c7 = _rank_terms(
            p, directed, n, rA, rdA, cA, cdA, dgA, dgdA, sA, sdA)
        s = jnp.sum(M, axis=0)
        w = v @ M
        feats = (heavy + dvec[:, None] * M
                 + u[:, None] * s[None, :] + (w + c7 * s)[None, :])
        if l < L - 1:
            feats = jax.nn.relu(feats)
    return feats


def tiled_vf_eval(coeffs, ts, t, Z, vf,
                  red: tp.Optional[PlaneReductions] = None,
                  tile: tp.Optional[int] = None):
    """Evaluate a PermEquiv(Dir)GraphVectorField at (t, Z) via the tiled path.

    coeffs: slim value-channel Hermite stacks (d, c, b, a), each (T-1, n, n);
    red: cached :class:`PlaneReductions` (from the control; computed from the
    interval slabs when absent). Fully differentiable in Z / vf params / t;
    coefficient cotangents are statically skipped unless perturbed
    (symbolic_zeros on the inner primitive).

    Semantics match the dense oracle chain
    ``equiv_basis.fused_apply(A(t), dA(t), transform(.), params,
    add_identity=True)`` per layer with inter-layer relu (reference
    perm_equiv_graph_vector_field.py:122-125), in bf16 matmul precision.
    """
    n = Z.shape[0]
    if tile is None:
        tile = pick_tile(n)
    directed = (
        type(vf.gnn_layers[0]).__name__ == "ConvEquivFusionDirectedLayer"
    )
    idx, tau = _interval(ts, t)
    slabs = tuple(
        jax.lax.dynamic_index_in_dim(p, idx, axis=0, keepdims=False)
        for p in coeffs
    )
    wA, wdA = hermite_weights(tau)
    if red is not None:
        rA, rdA, cA, cdA, dgA, dgdA = reductions_at(red, idx, wA, wdA)
    else:
        rA, rdA, cA, cdA, dgA, dgdA = reductions_from_slabs(slabs, wA, wdA)
    sA, sdA = jnp.sum(rA), jnp.sum(rdA)

    # Materialise the bf16 interval planes ONCE per eval (XLA fuses the
    # interval gather into this polynomial -- one read of the coefficient
    # stacks, one 2-plane write); every per-layer kernel sweep then reads
    # 2 planes instead of 4. Gradients flow through (slabs, wA, wdA) inside
    # tiled_fused2, so the caches are stop_gradient by contract.
    #
    # The planes are ZERO-PADDED to (NP, NP) at ragged n (the pad fuses into
    # this same materialise write): the per-layer kernels then run with
    # ragged=False -- no per-tile iota/where masking, which costs plane-sized
    # VPU work on EVERY tile (measured 1.7x per sweep at n=1505).
    NP = _cdiv(n, tile) * tile
    df, cf, bf, af = (s.astype(jnp.float32) for s in slabs)
    A_t = ((df * tau + cf) * tau + bf) * tau + af
    dA_t = (3.0 * df * tau + 2.0 * cf) * tau + bf
    # Cast to bf16 BEFORE padding: if XLA fails to fuse the pad into the
    # materialise write, the worst-case intermediates are bf16 NP^2 rather
    # than f32 NP^2 (ADVICE r4).
    A_h = jax.lax.stop_gradient(A_t.astype(jnp.bfloat16))
    dA_h = jax.lax.stop_gradient(dA_t.astype(jnp.bfloat16))
    if NP != n:
        A_h = jnp.zeros((NP, NP), A_h.dtype).at[:n, :n].set(A_h)
        dA_h = jnp.zeros((NP, NP), dA_h.dtype).at[:n, :n].set(dA_h)
    feats = Z
    L = len(vf.gnn_layers)
    for l, layer in enumerate(vf.gnn_layers):
        M = layer.conv_layer.transform(feats)  # (n, H)
        p = layer.params
        p1, p2 = p[0], p[1]
        if NP != n:
            Mp = jnp.zeros((NP, M.shape[1]), M.dtype).at[:n].set(M)
        else:
            Mp = M
        heavy = tiled_fused2(
            A_h, dA_h, slabs, wA, wdA, 1.0 + p1, p2, Mp, tile
        )[:n]
        dvec, u, v, c7 = _rank_terms(
            p, directed, n, rA, rdA, cA, cdA, dgA, dgdA, sA, sdA)
        s = jnp.sum(M, axis=0)
        w = v @ M
        feats = (heavy + dvec[:, None] * M
                 + u[:, None] * s[None, :] + (w + c7 * s)[None, :])
        if l < L - 1:
            feats = jax.nn.relu(feats)
    return feats
