"""Batched BCSR block kernels (VERDICT r4 item 7): vmap dispatches to ONE
batch-grid pallas_call (the megakernel's custom_vmap arrangement) instead of
unrolling vmap-of-scalar-prefetch kernels.

Covers: value parity of the batched SpMM/SDDMM against per-element calls
(all operand-batching combinations), the no-unroll guarantee (exactly one
pallas_call in the vmapped jaxpr), gradient parity through the vmapped
differentiable SpMM, and the vmapped BCSR control through the fused apply.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu.ops.bcsr import (
    BCSR,
    _bcsr_sddmm_pallas,
    _bcsr_spmm_pallas,
    bcsr_from_dense,
    bcsr_spmm_xla,
    bcsr_sddmm_xla,
    bcsr_to_dense,
    bcsr_transpose,
)


def _banded_dense(key, n, width):
    i = np.arange(n)
    band = np.abs(i[:, None] - i[None, :]) <= width
    vals = np.asarray(jr.uniform(key, (n, n))) * 0.1
    return np.where(band, vals, 0.0).astype(np.float32)


def _count_pallas_calls(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            total += 1
        for p in eqn.params.values():
            for sub in _sub(p):
                total += _count_pallas_calls(sub)
    return total


def _sub(p):
    if isinstance(p, jax.extend.core.Jaxpr):
        yield p
    elif isinstance(p, jax.extend.core.ClosedJaxpr):
        yield p.jaxpr
    elif isinstance(p, (tuple, list)):
        for x in p:
            yield from _sub(x)


def _batch(key, B, n, width, bs):
    """B BCSRs sharing one pattern (stacked leaves) + B feature matrices."""
    ks = jr.split(key, B + 1)
    denses = [_banded_dense(k, n, width) for k in ks[:B]]
    elems = [bcsr_from_dense(d, bs) for d in denses]
    b_stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *elems)
    M = jr.normal(ks[B], (B, n, 8))
    return denses, elems, b_stacked, M


def test_vmapped_spmm_matches_per_element():
    n, B, bs, width = 48, 3, 16, 10
    denses, elems, b_stacked, M = _batch(jr.PRNGKey(0), B, n, width, bs)

    out = jax.vmap(
        lambda b, m: _bcsr_spmm_pallas(b, m, interpret=True)
    )(b_stacked, M)
    for i in range(B):
        want = np.asarray(denses[i]) @ np.asarray(M[i])
        np.testing.assert_allclose(
            np.asarray(out[i]), want, atol=1e-4, rtol=1e-4
        )


def test_vmapped_spmm_unbatched_matrix_batched_features():
    """Shared matrix, batched features: the unbatched operands must NOT be
    broadcast-copied (flags route the index maps instead)."""
    n, bs = 48, 16
    dense = _banded_dense(jr.PRNGKey(1), n, 8)
    b = bcsr_from_dense(dense, bs)
    M = jr.normal(jr.PRNGKey(2), (4, n, 8))
    out = jax.vmap(
        lambda m: _bcsr_spmm_pallas(b, m, interpret=True)
    )(M)
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(out[i]), dense @ np.asarray(M[i]), atol=1e-4, rtol=1e-4
        )


def test_vmapped_spmm_is_one_pallas_call():
    n, B, bs = 48, 3, 16
    _, _, b_stacked, M = _batch(jr.PRNGKey(3), B, n, 10, bs)
    jaxpr = jax.make_jaxpr(
        jax.vmap(lambda b, m: _bcsr_spmm_pallas(b, m, interpret=True))
    )(b_stacked, M)
    assert _count_pallas_calls(jaxpr.jaxpr) == 1, (
        "vmapped BCSR SpMM must dispatch to ONE batch-grid pallas_call"
    )


def test_vmapped_sddmm_matches_per_element():
    n, B, bs = 48, 3, 16
    denses, elems, b_stacked, M = _batch(jr.PRNGKey(4), B, n, 10, bs)
    X = jr.normal(jr.PRNGKey(5), (B, n, 8))
    out = jax.vmap(
        lambda idx, x, y: _bcsr_sddmm_pallas(idx, x, y, bs, interpret=True)
    )(b_stacked.block_idx, X, M)
    for i in range(B):
        want = bcsr_sddmm_xla(elems[i].block_idx, X[i], M[i], bs)
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(want), atol=1e-4, rtol=1e-4
        )
    jaxpr = jax.make_jaxpr(
        jax.vmap(
            lambda idx, x, y: _bcsr_sddmm_pallas(idx, x, y, bs, interpret=True)
        )
    )(b_stacked.block_idx, X, M)
    assert _count_pallas_calls(jaxpr.jaxpr) == 1


def test_vmapped_spmm_grad_matches_per_element():
    """Gradients through the vmapped differentiable SpMM: the custom-VJP
    backward (SDDMM + transposed SpMM) also rides the batch-grid kernels."""
    from gncde_tpu.ops.bcsr import bcsr_spmm_grad, slot_mask

    n, B, bs = 48, 2, 16
    denses, elems, b_stacked, M = _batch(jr.PRNGKey(6), B, n, 10, bs)
    elems_T = [bcsr_transpose(e) for e in elems]
    bT = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *elems_T)
    valid = jax.vmap(slot_mask)(b_stacked.block_idx, b_stacked.nblocks)

    def batched_loss(blocks, M_):
        out = jax.vmap(
            lambda bl, bi, blT, biT, v, m: bcsr_spmm_grad(
                bl, bi, blT, biT, v, m, n
            )
        )(blocks, b_stacked.block_idx, bT.blocks, bT.block_idx, valid, M_)
        return jnp.sum(out**2)

    g_blocks, g_M = jax.grad(batched_loss, argnums=(0, 1))(
        b_stacked.blocks, M
    )

    for i in range(B):
        def one_loss(blocks_i, M_i):
            out = bcsr_spmm_grad(
                blocks_i, elems[i].block_idx, elems_T[i].blocks,
                elems_T[i].block_idx,
                slot_mask(elems[i].block_idx, elems[i].nblocks), M_i, n,
            )
            return jnp.sum(out**2)

        gb_i, gm_i = jax.grad(one_loss, argnums=(0, 1))(
            b_stacked.blocks[i], M[i]
        )
        np.testing.assert_allclose(
            np.asarray(g_blocks[i]), np.asarray(gb_i), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(g_M[i]), np.asarray(gm_i), atol=1e-4, rtol=1e-4
        )


def test_batched_cubic_bcsr_control_matches_dense():
    """Batched (vmapped) cubic BCSR control: adj/dadj at every element must
    reproduce the dense interpolation. Regression for the classmethod-
    identity bug that routed the batched CUBIC build down the linear
    single-plane branch (pre-round-5 latent; caught by the dyn bcsr e2e)."""
    import jax
    from gncde_tpu.interp import backward_hermite_coefficients
    from gncde_tpu.interp.bcsr_paths import BCSRMatrixControl
    from gncde_tpu.ops.bcsr import BCSR, bcsr_to_dense

    B, T, n = 2, 6, 9
    ts = jnp.linspace(0, 1, T)
    A = jr.uniform(jr.PRNGKey(0), (B, T, n, n)) * 0.1
    t_idx = jnp.broadcast_to(ts[None, :, None, None], (B, T, n, n))
    X = jnp.stack([t_idx, A], axis=-1)
    coeffs = jax.vmap(lambda x: backward_hermite_coefficients(ts, x))(X)
    ctrl = BCSRMatrixControl.from_stacked("cubic", ts, coeffs, block_size=4)
    assert len(ctrl.path.coeffs) == 4
    assert ctrl.path.coeffs[0].shape[:2] == (B, T - 1)

    t = jnp.asarray(0.37)
    vals = jax.vmap(lambda c: c.adj(t).blocks)(ctrl)
    for b in range(B):
        lay = ctrl.path.layout
        dense = bcsr_to_dense(BCSR(
            lay.block_idx[b], vals[b], n,
        ))
        # dense reference: Hermite-evaluate the value channel
        d_, c_, b_, a_ = (np.asarray(c[b, ..., -1]) for c in coeffs)
        idx = int(np.searchsorted(np.asarray(ts), float(t), side="right")) - 1
        tau = float(t) - float(ts[idx])
        want = ((d_[idx] * tau + c_[idx]) * tau + b_[idx]) * tau + a_[idx]
        np.testing.assert_allclose(
            np.asarray(dense), want, atol=1e-5, rtol=1e-5
        )
