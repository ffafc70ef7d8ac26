"""Pallas TPU pipeline kernel: single-pass fused equivariant conv layer.

This is the production successor to the whole-VMEM megakernel
(ops/pallas/megakernel.py, kept as an experiment): instead of holding the
entire n x n state in VMEM -- which made Mosaic compile time scale with n --
the layer streams A and dA through a *fixed-tile* grid, so compile time is
n-independent and the kernel serves any graph size.

Per vector-field evaluation the reference algorithm materialises the dense
fused operator ``A_bar`` per layer and reads A twice more for the transpose
terms (reference src/models/vector_fields/layers.py:45-48, 102-160). Here one
grid pass over row tiles of (A, dA) computes BOTH matmul families at once:

    row tile k:  R = q00*A[k] + q01*dA[k]        (identity-pair combination)
                 C = q10*A[k] + q11*dA[k]        (transpose-pair combination)
                 out[k]  = R @ M + dvec[k]*M[k] + u[k] (x) s + wrow   (rowpart)
                 acc    += C^T @ M[k]                                 (colpart)

so every element of A and dA is read from HBM exactly once per layer, M stays
VMEM-resident across the grid, and the rank-structured O(n) terms
(diag / row-sum / col-sum / global-sum basis contributions, see
ops/equiv_basis.py) ride along as vector epilogues. The final output is
``out + acc`` (one cheap XLA add).

The backward pass needs ``dM = A_bar^T @ g`` -- the transpose operator is in
the same family (swap the row/col matrix roles, swap u<->v), so the SAME
kernel computes it; the dense cotangents dB1 = g M^T / dB2 = M g^T and the
O(n) reduction chain run in XLA via ``jax.vjp`` of the (cheap, elementwise)
coefficient builders, which keeps the directed 11-term quirks
(reference layers.py:288-292, 317-321) exactly right.

Works for the undirected 8-term and directed 11-term bases; matches
ops.equiv_basis.fused_apply (and hence the dense reference oracle) allclose.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import equiv_basis


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _make_kernel(block_n: int, n: int):
    def kernel(q_ref, A_ref, dA_ref, Mf_ref, Mt_ref, dvec_ref, u_ref,
               s_ref, wrow_ref, out_ref, acc_ref):
        k = pl.program_id(0)
        TA = A_ref[:].astype(jnp.float32)
        TdA = dA_ref[:].astype(jnp.float32)
        R = q_ref[0, 0] * TA + q_ref[0, 1] * TdA  # (block_n, n)
        C = q_ref[1, 0] * TA + q_ref[1, 1] * TdA

        M = Mf_ref[:]  # (n, H), VMEM-resident across grid steps
        Mt = Mt_ref[:]  # (block_n, H)
        row = jnp.dot(R, M, preferred_element_type=jnp.float32)
        out_ref[:] = row + dvec_ref[:] * Mt + u_ref[:] * s_ref[:] + wrow_ref[:]

        # Transpose-part accumulation. Partial edge tiles carry padding rows
        # whose contents are unspecified -- mask them out of the contraction.
        rowid = jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0) + k * block_n
        valid = rowid < n
        Cm = jnp.where(valid, C, 0.0)
        Mtm = jnp.where(valid, Mt, 0.0)
        partial = jax.lax.dot_general(
            Cm, Mtm,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, H)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = partial

        @pl.when(k > 0)
        def _():
            acc_ref[:] = acc_ref[:] + partial

    return kernel


def fused_conv_stream(
    A: jax.Array,
    dA: jax.Array,
    M: jax.Array,
    dvec: jax.Array,
    u: jax.Array,
    s: jax.Array,
    wrow: jax.Array,
    q: jax.Array,
    *,
    block_n: int = 128,
    interpret: tp.Optional[bool] = None,
) -> jax.Array:
    """One streamed pass: ``(q00 A + q01 dA) @ M + (q10 A + q11 dA)^T @ M
    + dvec * M + u (x) s + 1 (x) wrow``.

    A, dA: (n, n) (any float dtype; f32 compute). M: (n, H) f32.
    dvec, u: (n,). s, wrow: (H,). q: (2, 2).
    """
    n, H = M.shape
    bn = min(block_n, _round_up(max(n, 8), 8))
    grid = (pl.cdiv(n, bn),)
    kernel = _make_kernel(bn, n)
    if interpret is None:
        interpret = _should_interpret()

    tile = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    out, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, 2), whole, memory_space=pltpu.SMEM),  # q
            pl.BlockSpec((bn, n), tile, memory_space=pltpu.VMEM),  # A tile
            pl.BlockSpec((bn, n), tile, memory_space=pltpu.VMEM),  # dA tile
            pl.BlockSpec((n, H), whole, memory_space=pltpu.VMEM),  # M full
            pl.BlockSpec((bn, H), tile, memory_space=pltpu.VMEM),  # M tile
            pl.BlockSpec((bn, 1), tile, memory_space=pltpu.VMEM),  # dvec
            pl.BlockSpec((bn, 1), tile, memory_space=pltpu.VMEM),  # u
            pl.BlockSpec((1, H), whole, memory_space=pltpu.VMEM),  # s
            pl.BlockSpec((1, H), whole, memory_space=pltpu.VMEM),  # wrow
        ],
        out_specs=[
            pl.BlockSpec((bn, H), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, H), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, H), jnp.float32),
            jax.ShapeDtypeStruct((n, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        q.astype(jnp.float32),
        A,
        dA,
        M.astype(jnp.float32),
        M.astype(jnp.float32),
        dvec.reshape(n, 1).astype(jnp.float32),
        u.reshape(n, 1).astype(jnp.float32),
        s.reshape(1, H).astype(jnp.float32),
        wrow.reshape(1, H).astype(jnp.float32),
    )
    return out + acc


def _rank_structure(A, dA, params, directed: bool):
    """The O(n) parts of the fused operator (dvec, u, v, c7) WITHOUT forming
    B1/B2 densely (mirrors equiv_basis.fused_coeffs[_directed])."""
    n = A.shape[0]
    if directed:
        p1, p2, p3, p4, p4p, p5, p5p, p6, p6p, p7, p8 = params
        rA, rdA = jnp.sum(A, axis=1), jnp.sum(dA, axis=1)
        cA, cdA = jnp.sum(A, axis=0), jnp.sum(dA, axis=0)
        sA, sdA = jnp.sum(rA), jnp.sum(rdA)
        dvec = (
            p3[0] * jnp.diagonal(A)
            + p3[1] * jnp.diagonal(dA)
            + (p6[0] * cA + p6[1] * cdA) / n
            + (p6p[0] * rA + p6p[1] * rdA) / n
            + (p8[0] * sA + p8[1] * sdA) / n**2
        )
        u = (p4[0] * cA + p4[1] * cdA) / n
        v = (
            (p4p[0] * rA + p4p[1] * cdA)  # reference term_4_prime quirk
            + (p5[0] * cA + p5[1] * cdA)
            + (p5p[0] * rA + p5p[1] * rdA)
        ) / n
        c7 = (p7[0] + p7[1]) * sA / n**2
    else:
        p1, p2, p3, p4, p5, p6, p7, p8 = params
        rA, rdA = jnp.sum(A, axis=1), jnp.sum(dA, axis=1)
        sA, sdA = jnp.sum(rA), jnp.sum(rdA)
        dvec = (
            p3[0] * jnp.diagonal(A)
            + p3[1] * jnp.diagonal(dA)
            + (p6[0] * rA + p6[1] * rdA) / n
            + (p8[0] * sA + p8[1] * sdA) / n**2
        )
        u = (p4[0] * rA + p4[1] * rdA) / n
        v = (p5[0] * rA + p5[1] * rdA) / n
        c7 = (p7[0] + p7[1]) * sA / n**2  # reference term_7 sum(A) quirk
    q = jnp.stack(
        [
            jnp.stack([1.0 + p1[0], 1.0 + p1[1]]),
            jnp.stack([p2[0], p2[1]]),
        ]
    )
    return q, dvec, u, v, c7


def _apply_fwd_impl(A, dA, M, params, directed, add_identity, block_n):
    q, dvec, u, v, c7 = _rank_structure(A, dA, params, directed)
    if add_identity:
        dvec = dvec + 1.0
    s = jnp.sum(M, axis=0)
    wrow = v @ M + c7 * s
    return fused_conv_stream(A, dA, M, dvec, u, s, wrow, q, block_n=block_n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def pipeline_fused_apply(A, dA, M, params, directed=False, add_identity=False,
                         block_n=128):
    """Streamed-Pallas fused basis apply: ``A_bar @ M`` (+ optionally ``M``).

    Drop-in for ops.equiv_basis.fused_apply with the same semantics
    (including the reference's term_7 / term_4_prime quirks). Forward and the
    ``dM`` cotangent run through the tiled Pallas kernel; the dense
    ``dA``/``ddA`` cotangents and parameter gradients run in XLA via the
    rank-structure chain (see module docstring).
    """
    return _apply_fwd_impl(A, dA, M, params, directed, add_identity, block_n)


def _pfa_fwd(A, dA, M, params, directed, add_identity, block_n):
    out = _apply_fwd_impl(A, dA, M, params, directed, add_identity, block_n)
    return out, (A, dA, M, params)


def _pfa_bwd(directed, add_identity, block_n, res, g):
    A, dA, M, params = res
    q, dvec, u, v, c7 = _rank_structure(A, dA, params, directed)
    dvec_id = dvec + 1.0 if add_identity else dvec

    # dM = A_bar^T @ g (+ g for the identity): transpose operator is in the
    # same family -- swap row/col matrix roles and u <-> (v + c7).
    n = A.shape[0]
    q_t = q[::-1]
    colsum_g = jnp.sum(g, axis=0)
    wrow_t = u @ g
    dM = fused_conv_stream(
        A, dA, g, dvec_id, v + c7, colsum_g, wrow_t, q_t, block_n=block_n
    )

    # Dense cotangents of the matmul pair and the O(n) reduction cotangents.
    s = jnp.sum(M, axis=0)
    dB1 = jnp.dot(g, M.T, preferred_element_type=jnp.float32)
    dB2 = jnp.dot(M, g.T, preferred_element_type=jnp.float32)
    g_dvec = jnp.sum(g * M, axis=1)
    g_u = g @ s
    g_v = M @ colsum_g
    g_c7 = jnp.dot(colsum_g, s)

    # Chain through the (cheap, elementwise) coefficient builders -- this
    # keeps the directed quirks exactly consistent with the oracle.
    mk = equiv_basis.fused_coeffs_directed if directed else equiv_basis.fused_coeffs
    _, vjp_fn = jax.vjp(lambda A_, dA_, p_: tuple(mk(A_, dA_, p_)), A, dA, tuple(params))
    dA_, ddA_, dparams = vjp_fn((dB1, dB2, g_dvec, g_u, g_v, g_c7))
    if isinstance(params, list):
        dparams = list(dparams)
    return dA_.astype(A.dtype), ddA_.astype(dA.dtype), dM, dparams


pipeline_fused_apply.defvjp(_pfa_fwd, _pfa_bwd)
