"""Block-sparse (BCSR / blocked-ELL) graph operators with Pallas TPU kernels.

SURVEY.md section 2.3(a) names Pallas SpMM *and* SDDMM as the native sparse
surface (the dense matmul at reference src/models/vector_fields/layers.py:
45-48 is the target). The element-sparse Pallas seed
(ops/pallas/sparse_spmm.py) is blocked on Mosaic's missing sublane
dynamic-gather: a scalar row loop loses ~40x to XLA's fused gather. The
standard TPU answer is BLOCK sparsity -- no gathers at all:

  * the matrix is a grid of dense ``bs x bs`` tiles; only nonzero tiles are
    stored (blocked-ELL: ``block_idx (nb, kb)`` column-block ids per block
    row, zero-padded slots);
  * SpMM walks ``grid=(nb, kb)`` and feeds the MXU one
    ``(bs, bs) @ (bs, H)`` per step, with the M operand tile DMA'd by a
    *scalar-prefetch* index map (``block_idx`` rides in SMEM ahead of the
    body -- the canonical Pallas block-sparse pattern);
  * SDDMM emits one ``X_i @ Y_j^T`` tile per stored block -- exactly the
    VJP of SpMM w.r.t. the stored values, and the standard attention-style
    sampled product.

For graph operators this fits the partitioned/halo regime (banded or
community-clustered adjacency, gncde_tpu/parallel/sharded_ops.py): stored
blocks are mostly full, so the MXU runs near-dense efficiency while HBM
traffic stays O(stored-blocks). For uniformly random sparsity at ~1%
density a 128-block pulls mostly zeros -- that regime belongs to the
element-sparse ELL path (ops/sparse.py); benchmarks/bcsr_micro.py measures
both regimes honestly.

``A^T @ M`` does not scatter: :func:`bcsr_transpose` rebuilds the
transposed layout once at construction (host side, like ell_from_dense),
and ``spmm_t(A, M) == spmm(A_T, M)``.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.module import Module, static_field


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class BCSR(Module):
    """Blocked-ELL sparse matrix.

    block_idx: (nb, kb) int32 column-block ids; padding slots are 0 and
    their blocks are all-zero (contributions vanish, index stays in range).
    blocks: (nb, kb, bs, bs) float tile values.
    n: logical matrix dimension (rows = cols = n; the block grid covers
    ceil(n / bs) * bs with zero padding).
    """

    block_idx: jax.Array
    blocks: jax.Array
    n: int = static_field()
    # Per-block-row count of VALID slots (slots >= nblocks[i] are zero
    # padding whose block_idx is 0). Optional for direct constructions that
    # only run the forward ops; required by the differentiable path so the
    # values-VJP can zero padded slots (see slot_mask / bcsr_spmm_grad).
    nblocks: tp.Optional[jax.Array] = None

    @property
    def block_size(self) -> int:
        return self.blocks.shape[-1]

    @property
    def nb(self) -> int:
        return self.block_idx.shape[0]

    @property
    def kb(self) -> int:
        return self.block_idx.shape[1]

    def astype(self, dtype) -> "BCSR":
        return BCSR(self.block_idx, self.blocks.astype(dtype), self.n, self.nblocks)

    def scale(self, c) -> "BCSR":
        return BCSR(self.block_idx, c * self.blocks, self.n, self.nblocks)

    def combine(self, other: "BCSR", ca=1.0, cb=1.0) -> "BCSR":
        """``ca * self + cb * other`` for BCSRs sharing one block pattern."""
        return BCSR(
            self.block_idx, ca * self.blocks + cb * other.blocks, self.n,
            self.nblocks,
        )


def slot_mask(block_idx: jax.Array, nblocks: jax.Array) -> jax.Array:
    """(nb, kb) float32 mask: 1.0 on valid slots, 0.0 on zero padding."""
    kb = block_idx.shape[1]
    return (jnp.arange(kb)[None, :] < nblocks[:, None]).astype(jnp.float32)


def bcsr_from_dense(
    A: np.ndarray, block_size: int = 128, max_blocks_per_row: tp.Optional[int] = None
) -> BCSR:
    """Build the blocked-ELL layout from a dense matrix (host side)."""
    A = np.asarray(A)
    n = A.shape[0]
    bs = block_size
    nb = _cdiv(n, bs)
    Ap = np.zeros((nb * bs, nb * bs), A.dtype)
    Ap[:n, :n] = A
    tiles = Ap.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)  # (nb, nb, bs, bs)
    nz = [(np.nonzero(np.any(tiles[i] != 0, axis=(1, 2)))[0]) for i in range(nb)]
    kb = max((len(z) for z in nz), default=1) or 1
    if max_blocks_per_row is not None:
        if any(len(z) > max_blocks_per_row for z in nz):
            raise ValueError("max_blocks_per_row too small for this pattern")
        kb = max_blocks_per_row
    block_idx = np.zeros((nb, kb), np.int32)
    blocks = np.zeros((nb, kb, bs, bs), np.float32)
    nblocks = np.zeros((nb,), np.int32)
    for i, z in enumerate(nz):
        block_idx[i, : len(z)] = z
        blocks[i, : len(z)] = tiles[i, z]
        nblocks[i] = len(z)
    return BCSR(
        jnp.asarray(block_idx), jnp.asarray(blocks), n, jnp.asarray(nblocks)
    )


def bcsr_to_dense(b: BCSR) -> jax.Array:
    bs, nb = b.block_size, b.nb
    out = jnp.zeros((nb, nb, bs, bs), b.blocks.dtype)
    rows = jnp.repeat(jnp.arange(nb), b.kb)
    cols = b.block_idx.reshape(-1)
    out = out.at[rows, cols].add(b.blocks.reshape(-1, bs, bs))
    return out.transpose(0, 2, 1, 3).reshape(nb * bs, nb * bs)[: b.n, : b.n]


def bcsr_transpose(b: BCSR) -> "BCSR":
    """Transposed layout (host-side rebuild; padding-safe because padded
    blocks are all-zero)."""
    return bcsr_from_dense(np.asarray(bcsr_to_dense(b)).T, b.block_size, None)


# ---------------------------------------------------------------------------
# XLA reference implementations (oracle + CPU fallback)
# ---------------------------------------------------------------------------


def _pad_rows(M: jax.Array, rows: int) -> jax.Array:
    if M.shape[0] == rows:
        return M
    return jnp.zeros((rows, M.shape[1]), M.dtype).at[: M.shape[0]].set(M)


def bcsr_spmm_xla(b: BCSR, M: jax.Array) -> jax.Array:
    """Reference ``A @ M``: gather M's row blocks, batched block matmuls."""
    bs, nb = b.block_size, b.nb
    Mp = _pad_rows(M, nb * bs).reshape(nb, bs, -1)
    gathered = Mp[b.block_idx]  # (nb, kb, bs, H)
    out = jnp.einsum(
        "rkab,rkbh->rah",
        b.blocks.astype(jnp.float32),
        gathered.astype(jnp.float32),
    )
    return out.reshape(nb * bs, -1)[: M.shape[0]]


def bcsr_sddmm_xla(
    block_idx: jax.Array, X: jax.Array, Y: jax.Array, block_size: int
) -> jax.Array:
    """Reference sampled product: blocks[r, k] = X_r @ Y_{idx[r,k]}^T."""
    nb = block_idx.shape[0]
    Xp = _pad_rows(X, nb * block_size).reshape(nb, block_size, -1)
    Yp = _pad_rows(Y, nb * block_size).reshape(nb, block_size, -1)
    Yg = Yp[block_idx]  # (nb, kb, bs, H)
    return jnp.einsum(
        "rah,rkbh->rkab", Xp.astype(jnp.float32), Yg.astype(jnp.float32)
    )


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _use_xla_fallback() -> bool:
    """On non-TPU backends the public ops dispatch to the XLA reference
    implementations (NOT interpret-mode Pallas -- the kernel bodies are
    exercised on CPU via the private ``_bcsr_*_pallas(interpret=True)``
    entry points in tests/test_bcsr.py)."""
    return jax.default_backend() != "tpu"


def _make_spmm_kernel(k_axis: int):
    def kernel(idx_ref, blk_ref, m_ref, out_ref):
        k = pl.program_id(k_axis)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += jax.lax.dot_general(
            blk_ref[0, 0], m_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


def _spmm_call(block_idx, blocks, Mp, *, interpret):
    """Unbatched blocked-ELL SpMM pallas_call on padded operands."""
    nb, kb = block_idx.shape
    bs = blocks.shape[-1]
    H = Mp.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_idx
        grid=(nb, kb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bs, bs), lambda i, k, idx: (i, k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bs, H), lambda i, k, idx: (idx[i, k], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bs, H), lambda i, k, idx: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_spmm_kernel(1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bs, H), jnp.float32),
        interpret=interpret,
    )(block_idx, blocks, Mp)


def _spmm_call_batched(block_idx, blocks, Mp, flags, *, interpret):
    """Batch-grid blocked-ELL SpMM: ONE pallas_call with the batch as the
    leading grid dimension (the megakernel's custom_vmap arrangement --
    nothing is vmapped, so the scalar-prefetch index maps don't unroll).
    ``flags`` says which operands carry the batch axis; unbatched operands
    are indexed ignoring the batch coordinate (no broadcast copies)."""
    idx_b, blk_b, m_b = flags
    nb, kb = block_idx.shape[-2:]
    bs = blocks.shape[-1]
    H = Mp.shape[-1]
    B = (block_idx.shape[0] if idx_b else
         blocks.shape[0] if blk_b else Mp.shape[0])

    if idx_b:
        take_idx = lambda b, i, k, idx: idx[b, i, k]  # noqa: E731
    else:
        take_idx = lambda b, i, k, idx: idx[i, k]  # noqa: E731
    blk_spec = pl.BlockSpec(
        (None, 1, 1, bs, bs) if blk_b else (1, 1, bs, bs),
        (lambda b, i, k, idx: (b, i, k, 0, 0)) if blk_b
        else (lambda b, i, k, idx: (i, k, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    m_spec = pl.BlockSpec(
        (None, bs, H) if m_b else (bs, H),
        (lambda b, i, k, idx: (b, take_idx(b, i, k, idx), 0)) if m_b
        else (lambda b, i, k, idx: (take_idx(b, i, k, idx), 0)),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb, kb),
        in_specs=[blk_spec, m_spec],
        out_specs=pl.BlockSpec(
            (None, bs, H), lambda b, i, k, idx: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _make_spmm_kernel(2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nb * bs, H), jnp.float32),
        interpret=interpret,
    )(block_idx, blocks, Mp)


@functools.lru_cache(maxsize=None)
def _spmm_core(interpret: bool):
    """custom_vmap-wrapped padded SpMM: the loss-level batch vmap (dyn
    trainer) dispatches to the batch-grid kernel instead of unrolling
    vmap-of-scalar-prefetch-pallas_call (VERDICT r4 item 7)."""
    import jax.custom_batching

    @jax.custom_batching.custom_vmap
    def core(block_idx, blocks, Mp):
        return _spmm_call(block_idx, blocks, Mp, interpret=interpret)

    @core.def_vmap
    def _rule(axis_size, in_batched, block_idx, blocks, Mp):
        flags = tuple(bool(b) for b in in_batched)
        out = _spmm_call_batched(block_idx, blocks, Mp, flags,
                                 interpret=interpret)
        return out, True

    return core


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bcsr_spmm_pallas(b: BCSR, M: jax.Array, interpret: bool = False):
    bs, nb = b.block_size, b.nb
    Mp = _pad_rows(M, nb * bs)
    out = _spmm_core(interpret)(b.block_idx, b.blocks, Mp)
    return out[: M.shape[0]]


def bcsr_spmm(b: BCSR, M: jax.Array) -> jax.Array:
    """``A @ M`` -- Pallas block kernel on TPU, XLA reference elsewhere."""
    if _use_xla_fallback():
        return bcsr_spmm_xla(b, M)
    return _bcsr_spmm_pallas(b, M)


def _sddmm_kernel(idx_ref, x_ref, y_ref, out_ref):
    out_ref[0, 0] = jax.lax.dot_general(
        x_ref[:], y_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _sddmm_call(block_idx, Xp, Yp, bs, *, interpret):
    nb, kb = block_idx.shape
    H = Xp.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, kb),
        in_specs=[
            pl.BlockSpec(
                (bs, H), lambda i, k, idx: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bs, H), lambda i, k, idx: (idx[i, k], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bs, bs), lambda i, k, idx: (i, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, kb, bs, bs), jnp.float32),
        interpret=interpret,
    )(block_idx, Xp, Yp)


def _sddmm_call_batched(block_idx, Xp, Yp, bs, flags, *, interpret):
    """Batch-grid SDDMM (see _spmm_call_batched)."""
    idx_b, x_b, y_b = flags
    nb, kb = block_idx.shape[-2:]
    H = Xp.shape[-1]
    B = (block_idx.shape[0] if idx_b else
         Xp.shape[0] if x_b else Yp.shape[0])

    if idx_b:
        take_idx = lambda b, i, k, idx: idx[b, i, k]  # noqa: E731
    else:
        take_idx = lambda b, i, k, idx: idx[i, k]  # noqa: E731
    x_spec = pl.BlockSpec(
        (None, bs, H) if x_b else (bs, H),
        (lambda b, i, k, idx: (b, i, 0)) if x_b
        else (lambda b, i, k, idx: (i, 0)),
        memory_space=pltpu.VMEM,
    )
    y_spec = pl.BlockSpec(
        (None, bs, H) if y_b else (bs, H),
        (lambda b, i, k, idx: (b, take_idx(b, i, k, idx), 0)) if y_b
        else (lambda b, i, k, idx: (take_idx(b, i, k, idx), 0)),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb, kb),
        in_specs=[x_spec, y_spec],
        out_specs=pl.BlockSpec(
            (None, 1, 1, bs, bs), lambda b, i, k, idx: (b, i, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nb, kb, bs, bs), jnp.float32),
        interpret=interpret,
    )(block_idx, Xp, Yp)


@functools.lru_cache(maxsize=None)
def _sddmm_core(bs: int, interpret: bool):
    import jax.custom_batching

    @jax.custom_batching.custom_vmap
    def core(block_idx, Xp, Yp):
        return _sddmm_call(block_idx, Xp, Yp, bs, interpret=interpret)

    @core.def_vmap
    def _rule(axis_size, in_batched, block_idx, Xp, Yp):
        flags = tuple(bool(b) for b in in_batched)
        out = _sddmm_call_batched(block_idx, Xp, Yp, bs, flags,
                                  interpret=interpret)
        return out, True

    return core


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def _bcsr_sddmm_pallas(
    block_idx: jax.Array, X: jax.Array, Y: jax.Array, block_size: int,
    interpret: bool = False,
):
    nb = block_idx.shape[0]
    bs = block_size
    Xp = _pad_rows(X, nb * bs)
    Yp = _pad_rows(Y, nb * bs)
    return _sddmm_core(bs, interpret)(block_idx, Xp, Yp)


def bcsr_sddmm(
    block_idx: jax.Array, X: jax.Array, Y: jax.Array, block_size: int
) -> jax.Array:
    """Sampled ``X @ Y^T`` at a blocked-ELL pattern: the VJP of
    :func:`bcsr_spmm` w.r.t. ``blocks`` (cotangent G in X's slot, M in Y's)
    and the building block for attention-style scores over graph blocks."""
    if _use_xla_fallback():
        return bcsr_sddmm_xla(block_idx, X, Y, block_size)
    return _bcsr_sddmm_pallas(block_idx, X, Y, block_size)


# ---------------------------------------------------------------------------
# Differentiable SpMM (backward = SDDMM + transposed SpMM)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def bcsr_spmm_grad(blocks, block_idx, blocks_T, block_idx_T, valid, M, n):
    """Differentiable ``A @ M`` with explicit transposed layout.

    d/dM = A^T @ G rides the SAME SpMM kernel on the transposed layout;
    d/dblocks = SDDMM(G, M) at A's pattern, with ``valid`` (the
    :func:`slot_mask` of the forward layout) zeroing the padded slots --
    padding's block_idx is 0, so an unmasked SDDMM would deposit spurious
    ``X_i @ Y_0^T`` gradient there and a subsequent optimizer step would
    corrupt the forward (padded blocks must stay zero). Pass layouts from
    :func:`bcsr_transpose`; ``n`` (static) is the logical dimension.

    NOTE: ``blocks_T`` receives ZERO gradient by design -- this op assumes
    the adjacency VALUES are data (as in every control-path use). If
    ``blocks`` is ever trained, rebuild the transposed layout from the
    updated values after each optimizer step, or the d/dM path goes stale.
    """
    b = BCSR(block_idx, blocks, n)
    return bcsr_spmm(b, M)


def _bsg_fwd(blocks, block_idx, blocks_T, block_idx_T, valid, M, n):
    out = bcsr_spmm_grad(blocks, block_idx, blocks_T, block_idx_T, valid, M, n)
    return out, (blocks, block_idx, blocks_T, block_idx_T, valid, M)


def _int_zero(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _bsg_bwd(n, res, g):
    blocks, block_idx, blocks_T, block_idx_T, valid, M = res
    bs = blocks.shape[-1]
    d_blocks = bcsr_sddmm(block_idx, g, M, bs) * valid[:, :, None, None]
    bT = BCSR(block_idx_T, blocks_T, n)
    d_M = bcsr_spmm(bT, g).astype(M.dtype)
    return (
        d_blocks.astype(blocks.dtype),
        _int_zero(block_idx),
        jnp.zeros_like(blocks_T),
        _int_zero(block_idx_T),
        jnp.zeros_like(valid),
        d_M,
    )


bcsr_spmm_grad.defvjp(_bsg_fwd, _bsg_bwd)


# ---------------------------------------------------------------------------
# Row-slab SpMM (the node-sharded building block)
# ---------------------------------------------------------------------------


def _slab_spmm_xla(blocks, block_idx, Mp):
    """XLA reference for the slab SpMM: gather Mp's row blocks by GLOBAL
    column-block id, batched block matmuls. Mp: (NBg*bs, H) padded full
    features; blocks: (nb_loc, kb, bs, bs)."""
    bs = blocks.shape[-1]
    gathered = Mp.reshape(-1, bs, Mp.shape[-1])[block_idx]  # (nb_loc,kb,bs,H)
    out = jnp.einsum(
        "rkab,rkbh->rah",
        blocks.astype(jnp.float32),
        gathered.astype(jnp.float32),
    )
    return out.reshape(blocks.shape[0] * bs, -1)


@jax.custom_vjp
def bcsr_slab_spmm(blocks, block_idx, valid, Mp):
    """``A_slab @ M`` for a blocked-ELL ROW SLAB whose column ids index the
    FULL padded feature matrix ``Mp`` ((NB_global*bs, H), zero-padded).

    The node-sharded BCSR building block (VERDICT r4 item 1 "and/or BCSR
    block kernels"): each device's forward AND transposed slab products are
    LOCAL block-kernel SpMMs against the all-gathered features -- the
    two-layout arrangement means no psum_scatter is needed for the
    transpose pair. Differentiable: d_blocks rides the SDDMM block kernel
    at the slab pattern (``valid`` zeroes padded slots); d_Mp is an
    O(nnz_loc * H) XLA block scatter-add (shard_map's transpose then
    psum-scatters it back to the owning shards). Returns (nb_loc*bs, H)
    f32.
    """
    if _use_xla_fallback():
        return _slab_spmm_xla(blocks, block_idx, Mp)
    return _spmm_call(block_idx, blocks, Mp, interpret=False)


def _bss_fwd(blocks, block_idx, valid, Mp):
    out = bcsr_slab_spmm(blocks, block_idx, valid, Mp)
    return out, (blocks, block_idx, valid, Mp)


def _bss_bwd(res, g):
    blocks, block_idx, valid, Mp = res
    nb_loc, kb, bs, _ = blocks.shape
    g = g.astype(jnp.float32)
    # d_blocks[r, k] = g_r @ M_{idx[r,k]}^T (SDDMM at the slab pattern).
    if _use_xla_fallback():
        Yg = Mp.reshape(-1, bs, Mp.shape[-1])[block_idx]
        d_blocks = jnp.einsum(
            "rah,rkbh->rkab", g.reshape(nb_loc, bs, -1),
            Yg.astype(jnp.float32),
        )
    else:
        d_blocks = _sddmm_call(block_idx, g, Mp.astype(jnp.float32), bs,
                               interpret=False)
    d_blocks = d_blocks * valid[:, :, None, None]
    # d_Mp[idx[r,k]] += blocks[r,k]^T @ g_r (block scatter-add).
    g_blocks = g.reshape(nb_loc, bs, -1)
    contrib = jnp.einsum(
        "rkab,rah->rkbh", blocks.astype(jnp.float32), g_blocks
    )
    NBg = Mp.shape[0] // bs
    d_Mp = (
        jnp.zeros((NBg, bs, Mp.shape[-1]), jnp.float32)
        .at[block_idx.reshape(-1)]
        .add(contrib.reshape(nb_loc * kb, bs, -1))
        .reshape(Mp.shape)
    )
    return (
        d_blocks.astype(blocks.dtype),
        _int_zero(block_idx),
        jnp.zeros_like(valid),
        d_Mp.astype(Mp.dtype),
    )


bcsr_slab_spmm.defvjp(_bss_fwd, _bss_bwd)


# ---------------------------------------------------------------------------
# Model-path consumer: BCSR-valued adjacency controls (VERDICT r3 item 4)
# ---------------------------------------------------------------------------


class BCSRLayout(Module):
    """Static-pattern data shared by every plane of a BCSR control path.

    Both the forward and the transposed blocked-ELL patterns are built once
    host-side (the transpose does not scatter at solve time -- mirror of
    ops/sparse.py's two-pattern ELL arrangement), plus the per-block-row
    diagonal-slot index the rank-structured terms need.
    """

    block_idx: jax.Array      # (nb, kb) forward pattern
    nblocks: jax.Array        # (nb,)
    block_idx_T: jax.Array    # (nb, kbT) transposed pattern
    nblocks_T: jax.Array      # (nb,)
    diag_slot: jax.Array      # (nb,) slot of the diagonal block, kb if absent
    n: int = static_field()
    bs: int = static_field()

    @property
    def valid(self) -> jax.Array:
        return slot_mask(self.block_idx, self.nblocks)

    @property
    def valid_T(self) -> jax.Array:
        return slot_mask(self.block_idx_T, self.nblocks_T)


class BCSRVal(Module):
    """A BCSR-valued matrix A(t) (or dA/dt) produced by a BCSR control path:
    forward-layout blocks + transposed-layout blocks at one shared
    :class:`BCSRLayout`. The fusion layers dispatch on this type (mirror of
    ops.sparse.ELL)."""

    blocks: jax.Array    # (nb, kb, bs, bs)
    blocks_T: jax.Array  # (nb, kbT, bs, bs)
    layout: BCSRLayout

    def combine(self, other: "BCSRVal", ca, cb) -> "BCSRVal":
        return BCSRVal(
            ca * self.blocks + cb * other.blocks,
            ca * self.blocks_T + cb * other.blocks_T,
            self.layout,
        )


def bcsr_pattern_from_mask(mask: np.ndarray, block_size: int):
    """(block_idx, nblocks) of the blocked-ELL pattern covering ``mask``."""
    b = bcsr_from_dense(mask.astype(np.float32), block_size)
    return np.asarray(b.block_idx), np.asarray(b.nblocks)


def bcsr_gather_blocks(
    plane: np.ndarray, block_idx: np.ndarray, nblocks: np.ndarray, bs: int
) -> np.ndarray:
    """Gather ``plane``'s (bs, bs) tiles at a blocked-ELL pattern
    (host-side; padding slots zero). plane may carry leading axes."""
    plane = np.asarray(plane)
    n = plane.shape[-1]
    nb, kb = block_idx.shape
    lead = plane.shape[:-2]
    padded = np.zeros(lead + (nb * bs, nb * bs), plane.dtype)
    padded[..., :n, :n] = plane
    tiles = padded.reshape(lead + (nb, bs, nb, bs))
    tiles = np.moveaxis(tiles, -2, -3)  # (..., nb, nb, bs, bs)
    rows = np.arange(nb)[:, None]
    out = tiles[..., rows, block_idx, :, :]  # (..., nb, kb, bs, bs)
    invalid = np.arange(kb)[None, :] >= nblocks[:, None]
    out[..., invalid, :, :] = 0.0
    return out


def bcsr_diag_slots(block_idx: np.ndarray, nblocks: np.ndarray) -> np.ndarray:
    """Per-block-row slot holding the diagonal block (kb where absent)."""
    nb, kb = block_idx.shape
    slots = np.full((nb,), kb, np.int32)
    for i in range(nb):
        hits = np.nonzero(block_idx[i, : nblocks[i]] == i)[0]
        if len(hits):
            slots[i] = hits[0]
    return slots


def bcsr_row_sums(blocks: jax.Array, n: int) -> jax.Array:
    """Row sums of the represented matrix: padding blocks are zero, so a
    plain reduction over (slots, block-cols) is exact. Returns (n,)."""
    nb, _, bs, _ = blocks.shape
    rs = jnp.sum(blocks.astype(jnp.float32), axis=(1, 3))  # (nb, bs)
    return rs.reshape(nb * bs)[:n]


def bcsr_diag(blocks: jax.Array, diag_slot: jax.Array, n: int) -> jax.Array:
    """Diagonal of the represented matrix via the precomputed slot index."""
    nb, kb, bs, _ = blocks.shape
    safe = jnp.minimum(diag_slot, kb - 1)
    dblocks = blocks[jnp.arange(nb), safe]  # (nb, bs, bs)
    dvals = jnp.diagonal(dblocks, axis1=-2, axis2=-1).astype(jnp.float32)
    dvals = jnp.where((diag_slot < kb)[:, None], dvals, 0.0)
    return dvals.reshape(nb * bs)[:n]


def _bcsr_apply_pair(val: BCSRVal, M: jax.Array, transpose: bool) -> jax.Array:
    """Differentiable SpMM of a combined BCSRVal (or its transpose) with M,
    through the Pallas block kernels (XLA reference off-TPU)."""
    lay = val.layout
    if transpose:
        return bcsr_spmm_grad(
            val.blocks_T, lay.block_idx_T, val.blocks, lay.block_idx,
            lay.valid_T, M, lay.n,
        )
    return bcsr_spmm_grad(
        val.blocks, lay.block_idx, val.blocks_T, lay.block_idx_T,
        lay.valid, M, lay.n,
    )


def bcsr_fused_apply(
    bA: BCSRVal, bdA: BCSRVal, M: jax.Array,
    params: tp.Sequence[jax.Array], add_identity: bool = False,
) -> jax.Array:
    """Undirected 8-term fused basis apply over BCSR values -- the blocked
    mirror of ops.sparse.sparse_fused_apply (same rank-structured
    decomposition, equiv_basis.py:116-138, term_7 sum(A) quirk included).
    A and dA share one layout (the control path guarantees it), so each
    basis pair combines VALUES first: one block-SpMM for the identity pair
    and one transposed-layout block-SpMM for the transpose pair.
    """
    p1, p2, p3, p4, p5, p6, p7, p8 = params
    lay = bA.layout
    n = lay.n
    rA = bcsr_row_sums(bA.blocks, n)
    rdA = bcsr_row_sums(bdA.blocks, n)
    sA, sdA = jnp.sum(rA), jnp.sum(rdA)

    rowpart = _bcsr_apply_pair(bA.combine(bdA, 1.0 + p1[0], 1.0 + p1[1]), M,
                               transpose=False)
    colpart = _bcsr_apply_pair(bA.combine(bdA, p2[0], p2[1]), M,
                               transpose=True)

    dvec = (
        p3[0] * bcsr_diag(bA.blocks, lay.diag_slot, n)
        + p3[1] * bcsr_diag(bdA.blocks, lay.diag_slot, n)
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


def bcsr_fused_apply_directed(
    bA: BCSRVal, bdA: BCSRVal, M: jax.Array,
    params: tp.Sequence[jax.Array], add_identity: bool = False,
) -> jax.Array:
    """Directed 11-term fused basis apply over BCSR values (mirror of
    ops.sparse.sparse_fused_apply_directed, incl. the reference's
    term_4_prime row/col mix and term_7 sum(A) quirks)."""
    p1, p2, p3, p4, p4p, p5, p5p, p6, p6p, p7, p8 = params
    lay = bA.layout
    n = lay.n
    rA = bcsr_row_sums(bA.blocks, n)
    rdA = bcsr_row_sums(bdA.blocks, n)
    cA = bcsr_row_sums(bA.blocks_T, n)
    cdA = bcsr_row_sums(bdA.blocks_T, n)
    sA, sdA = jnp.sum(rA), jnp.sum(rdA)

    rowpart = _bcsr_apply_pair(bA.combine(bdA, 1.0 + p1[0], 1.0 + p1[1]), M,
                               transpose=False)
    colpart = _bcsr_apply_pair(bA.combine(bdA, p2[0], p2[1]), M,
                               transpose=True)

    dvec = (
        p3[0] * bcsr_diag(bA.blocks, lay.diag_slot, n)
        + p3[1] * bcsr_diag(bdA.blocks, lay.diag_slot, n)
        + (p6[0] * cA + p6[1] * cdA) / n
        + (p6p[0] * rA + p6p[1] * rdA) / n
        + (p8[0] * sA + p8[1] * sdA) / n**2
    )
    if add_identity:
        dvec = dvec + 1.0
    u = (p4[0] * cA + p4[1] * cdA) / n
    v = (
        (p4p[0] * rA + p4p[1] * cdA)  # term_4' quirk (layers.py:288)
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


def blocked_fill_ratio(mask: np.ndarray, block_size: int) -> float:
    """nnz / stored-block capacity of the blocked-ELL layout covering
    ``mask`` -- the auto-detection statistic for routing sparse controls to
    BCSR. Banded / community-clustered patterns keep their stored tiles
    usefully full (e.g. ~0.25 for a bw=24 band at bs=64); uniform random
    sparsity leaves them at ~density (ELL wins that regime,
    PERFORMANCE.md BCSR table). A stored block at even ~10% fill still
    beats per-element TPU gathers (~50x per-element cost, ops/sparse.py
    round-2 measurements), hence the low routing threshold in the
    trainers (0.1)."""
    mask = np.asarray(mask).astype(bool)
    n = mask.shape[0]
    bs = block_size
    nb = _cdiv(n, bs)
    padded = np.zeros((nb * bs, nb * bs), bool)
    padded[:n, :n] = mask
    tiles = padded.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)
    stored = np.any(tiles, axis=(2, 3)).sum()
    if stored == 0:
        return 0.0
    return float(mask.sum() / (stored * bs * bs))


# ---------------------------------------------------------------------------
# O(nnz) edge-list construction (no dense detour; C++ fast path)
# ---------------------------------------------------------------------------


def _edges_block_mark(src, dst, n: int, bs: int) -> np.ndarray:
    """(nb, nb) uint8 touched-block bitmap from an edge list."""
    from .. import native

    mark = native.bcsr_pattern_native(src, dst, n, bs)
    if mark is not None:
        return mark
    nb = _cdiv(n, bs)
    mark = np.zeros((nb, nb), np.uint8)
    src = np.asarray(src) // bs
    dst = np.asarray(dst) // bs
    mark[src, dst] = 1
    return mark


def bcsr_pattern_from_edges(
    src, dst, n: int, block_size: int,
    max_blocks_per_row: tp.Optional[int] = None,
):
    """(block_idx, nblocks, slot_lut) of the blocked-ELL pattern covering an
    edge list -- O(nnz), never materialises an (n, n) matrix. slot_lut is
    the (nb, nb) int32 slot index per (row-block, col-block), -1 where
    unstored (the scatter kernels' lookup table)."""
    bs = block_size
    nb = _cdiv(n, bs)
    mark = _edges_block_mark(src, dst, n, bs)
    counts = mark.sum(axis=1).astype(np.int64)
    kb = int(max(counts.max() if nb else 1, 1))
    if max_blocks_per_row is not None:
        if kb > max_blocks_per_row:
            raise ValueError("max_blocks_per_row too small for this pattern")
        kb = max_blocks_per_row
    block_idx = np.zeros((nb, kb), np.int32)
    nblocks = counts.astype(np.int32)
    slot_lut = np.full((nb, nb), -1, np.int32)
    for rb in range(nb):
        cols = np.nonzero(mark[rb])[0]
        block_idx[rb, : len(cols)] = cols
        slot_lut[rb, cols] = np.arange(len(cols), dtype=np.int32)
    return block_idx, nblocks, slot_lut


def bcsr_values_from_edges(
    src, dst, w, n: int, block_size: int, kb: int, slot_lut: np.ndarray
) -> np.ndarray:
    """(nb, kb, bs, bs) tile values at a fixed pattern -- O(nnz); duplicate
    edges accumulate (matching dense_adj_native / the CSV ingestion path)."""
    from .. import native

    blocks = native.bcsr_scatter_native(src, dst, w, n, block_size, kb,
                                        slot_lut)
    if blocks is not None:
        return blocks
    bs = block_size
    nb = _cdiv(n, bs)
    blocks = np.zeros((nb, kb, bs, bs), np.float32)
    src = np.asarray(src)
    dst = np.asarray(dst)
    wf = np.ones(len(src), np.float32) if w is None else np.asarray(w, np.float32)
    slots = slot_lut[src // bs, dst // bs]
    ok = slots >= 0
    np.add.at(
        blocks,
        (src[ok] // bs, slots[ok], src[ok] % bs, dst[ok] % bs),
        wf[ok],
    )
    return blocks


def bcsr_from_edges(
    src, dst, w, n: int, block_size: int = 128
) -> BCSR:
    """Edge list -> BCSR, O(nnz) with the C++ fast path (numpy fallback).
    Equivalent to ``bcsr_from_dense(dense_adj(edges))`` without ever
    building the (n, n) matrix -- the scaled-n input path."""
    block_idx, nblocks, slot_lut = bcsr_pattern_from_edges(
        src, dst, n, block_size
    )
    blocks = bcsr_values_from_edges(src, dst, w, n, block_size,
                                    block_idx.shape[1], slot_lut)
    return BCSR(
        jnp.asarray(block_idx), jnp.asarray(blocks), n, jnp.asarray(nblocks)
    )
