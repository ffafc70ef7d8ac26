"""Node-partitioned equivariant message passing with explicit collectives.

The scaled-n compute path (SURVEY.md section 2.2: the graph IS the model, so
the node dimension is the TP/CP-analogue axis). Under ``shard_map`` over a
``graph`` mesh axis:

  * A, dA are row-sharded: each device holds (n/G, n) slabs.
  * Node state Z and layer output are row-sharded (n/G, H).
  * One layer costs per device:
      - ``all_gather(M)``      -- boundary/halo exchange of transformed
                                  features (the operator is dense, so the
                                  halo is the full feature set),
      - local ``B1_loc @ M``   -- MXU,
      - local ``B2_loc^T @ M_loc`` partial + ``psum_scatter``  -- the
                                  transpose-pair contribution,
      - O(n) ``psum``s for the global sums feeding the rank-1 basis terms.
    XLA overlaps the all-gather with the local matmul (async collectives).

For SPARSE (ELL) slabs over banded/clustered graphs, the all_gather and
psum_scatter degrade to moving O(n*H) per device even though each shard only
references columns owned by a few neighbour shards. ``ell_halo_width``
computes the minimal neighbour distance from the index pattern, and
``sharded_sparse_fused_apply(..., halo=h)`` then exchanges exactly 2h
(n/G, H) slabs each way via ``ppermute`` rings -- ICI neighbour traffic
instead of full-mesh collectives.

Numerics match gncde_tpu.ops.equiv_basis.fused_apply exactly (tested allclose
on a virtual CPU mesh, both halo and all-gather paths).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import equiv_basis


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name)


def ell_halo_width(indices, n: int, num_shards: int) -> int:
    """Minimal circular halo width for a row-sharded ELL pattern.

    Host-side partitioning helper: returns the smallest ``h`` such that every
    non-padding column referenced by shard ``i``'s row slab is owned by a
    shard within circular distance ``h`` of ``i``. Banded/clustered graphs
    (grids, community graphs, locality-reordered meshes) give small ``h``,
    letting the sharded sparse fused apply exchange only neighbour slabs via
    ``ppermute`` instead of all-gathering the full feature matrix. If
    ``2*h + 1 >= num_shards`` the halo covers everything and the all-gather
    path is cheaper -- callers should pass ``halo=None`` in that case (the
    runtime falls back automatically).
    """
    idx = np.asarray(indices)
    if idx.size == 0:
        return 0
    n_loc = n // num_shards
    if n_loc * num_shards != n:
        raise ValueError(f"n={n} must be divisible by num_shards={num_shards}")
    row_shard = (np.arange(idx.shape[0]) // n_loc)[:, None]
    valid = idx != n
    col_shard = np.minimum(idx, n - 1) // n_loc
    # Signed circular shard distance in [-G//2, G//2).
    d = (col_shard - row_shard + num_shards // 2) % num_shards - num_shards // 2
    d = np.where(valid, d, 0)
    return int(np.max(np.abs(d)))


def _halo_ring_gather(M_loc, halo: int, axis_name: str, num_shards: int):
    """Gather the (2*halo+1)-shard feature window via ``ppermute`` rings.

    Window position ``halo + d`` holds shard ``idx + d``'s slab (circular).
    Returns ((2*halo+1)*n_loc, H). Comm: 2*halo slabs of (n_loc, H) per
    device vs the all-gather's (G-1) slabs.
    """
    slabs = [None] * (2 * halo + 1)
    slabs[halo] = M_loc
    for d in range(1, halo + 1):
        fwd = [((i + d) % num_shards, i) for i in range(num_shards)]
        bwd = [((i - d) % num_shards, i) for i in range(num_shards)]
        slabs[halo + d] = jax.lax.ppermute(M_loc, axis_name, fwd)
        slabs[halo - d] = jax.lax.ppermute(M_loc, axis_name, bwd)
    return jnp.concatenate(slabs, axis=0)


def _halo_ring_scatter(partial_window, halo: int, axis_name: str,
                       num_shards: int, n_loc: int):
    """Deliver window-keyed partial sums to their owning shards.

    ``partial_window`` is ((2*halo+1)*n_loc, H); the slab at window position
    ``halo + d`` (computed locally) belongs to shard ``idx + d``. Each slab
    rides one ``ppermute``; the receiver sums its 2*halo+1 contributions.
    The neighbour-exchange replacement for ``psum_scatter`` over (n, H).
    """
    out = partial_window[halo * n_loc:(halo + 1) * n_loc]
    for d in range(1, halo + 1):
        fwd_slab = partial_window[(halo + d) * n_loc:(halo + d + 1) * n_loc]
        bwd_slab = partial_window[(halo - d) * n_loc:(halo - d + 1) * n_loc]
        fwd = [(i, (i + d) % num_shards) for i in range(num_shards)]
        bwd = [(i, (i - d) % num_shards) for i in range(num_shards)]
        out = out + jax.lax.ppermute(fwd_slab, axis_name, fwd)
        out = out + jax.lax.ppermute(bwd_slab, axis_name, bwd)
    return out


def _slab_tile(n_loc: int, n: int) -> int:
    """Tile size for the Pallas slab kernel: the largest power of two that
    divides into both padded extents without gross waste, capped at the
    single-chip sweet spot."""
    from ..ops.pallas.tiled import pick_tile

    t = pick_tile(n)
    while t > 8 and t > n_loc:
        t //= 2
    return t


def _pallas_slab_pair(A_loc, dA_loc, c_row, c_col, M_full, M_loc,
                      tile: tp.Optional[int] = None):
    """Local row-slab pair products through the tiled Pallas kernel:
    ``rowpart = B1_loc @ M_full`` (n_loc, H) and the transpose-pair partial
    ``B2_loc^T @ M_loc`` (n, H). The per-shard compute of the multi-device
    Pallas path -- same kernel family as the single-chip tiled path
    (ops/pallas/tiled.py), so sharding does not forfeit the kernel speed."""
    from ..ops.pallas.tiled import _cdiv, plane_pair_apply

    n_loc, n = A_loc.shape
    H = M_loc.shape[1]
    T = tile if tile is not None else _slab_tile(n_loc, n)
    NPr = _cdiv(n_loc, T) * T
    NPc = _cdiv(n, T) * T
    Mk = M_full
    Mi = M_loc
    if NPc != n:
        Mk = jnp.zeros((NPc, H), M_full.dtype).at[:n].set(M_full)
    if NPr != n_loc:
        Mi = jnp.zeros((NPr, H), M_loc.dtype).at[:n_loc].set(M_loc)
    rowpart, colpart = plane_pair_apply(
        A_loc, dA_loc, c_row, c_col, Mk, Mi, n_loc, n, T)
    return rowpart[:n_loc], colpart[:n]


def dense_halo_width(A: "np.ndarray", num_shards: int) -> int:
    """Minimal circular halo width for a row-sharded DENSE matrix: smallest
    ``h`` such that every nonzero column of shard ``i``'s row slab is owned
    by a shard within circular distance ``h``. Host-side partitioning helper
    (the dense analogue of :func:`ell_halo_width`); pass ``halo=None`` when
    ``2*h + 1 >= num_shards`` (the all-gather path is then cheaper)."""
    A = np.asarray(A)
    n = A.shape[-1]
    n_loc = n // num_shards
    if n_loc * num_shards != n:
        raise ValueError(f"n={n} must be divisible by num_shards={num_shards}")
    rows, cols = np.nonzero(np.any(A != 0.0, axis=tuple(range(A.ndim - 2))))
    if rows.size == 0:
        return 0
    d = (cols // n_loc - rows // n_loc + num_shards // 2) % num_shards
    return int(np.max(np.abs(d - num_shards // 2)))


def _halo_window_cols(A_loc, halo: int, axis_name: str, num_shards: int):
    """Slice a (n_loc, n) dense row slab down to its (n_loc, (2h+1)*n_loc)
    circular halo window of columns (shard-granular block gather). Contract:
    every nonzero column lies inside the window (halo >= dense_halo_width);
    columns outside are DROPPED."""
    n_loc = A_loc.shape[0]
    idx = jax.lax.axis_index(axis_name)
    Wsh = 2 * halo + 1
    blocks = A_loc.reshape(n_loc, num_shards, n_loc)
    shard_ids = (idx - halo + jnp.arange(Wsh)) % num_shards
    return jnp.take(blocks, shard_ids, axis=1).reshape(n_loc, Wsh * n_loc)


def sharded_fused_apply(
    A_loc: jax.Array,       # (n_loc, n) row slab of A
    dA_loc: jax.Array,      # (n_loc, n)
    M_loc: jax.Array,       # (n_loc, H) row slab of transformed features
    params: tp.Sequence[jax.Array],
    axis_name: str = "graph",
    add_identity: bool = False,
    backend: str = "xla",
    tile: tp.Optional[int] = None,
    halo: tp.Optional[int] = None,
) -> jax.Array:
    """Row-sharded ``A_bar @ M (+ M)`` for the undirected 8-term basis.

    Must run inside ``shard_map`` with ``axis_name`` mapped.
    Returns the local (n_loc, H) output slab.

    ``backend="pallas"`` computes the two heavy slab products with the tiled
    Pallas pair kernel (:func:`_pallas_slab_pair`) instead of plain XLA
    matmuls -- the multi-chip execution path that KEEPS the single-chip
    kernel surface (VERDICT r4 item 1). Collectives (all_gather /
    psum_scatter / psums) are identical in both modes; pass bf16
    ``A_loc``/``dA_loc``/``M_loc`` for MXU-native speed.

    ``halo=h`` (from :func:`dense_halo_width`) is the banded-graph fast
    path: the feature exchange switches from all-gather/psum_scatter to
    ``ppermute`` neighbour rings moving 2h slabs of (n_loc, H) each way, AND
    the heavy products shrink to the (n_loc, (2h+1)*n_loc) column window --
    O(halo) comm and compute per shard instead of O(n). Columns outside the
    window are dropped, so an understated ``h`` silently loses edges: always
    compute it from the true pattern. Falls back to the all-gather path when
    the window spans the mesh axis.
    """
    p1, p2, p3, p4, p5, p6, p7, p8 = params
    n = A_loc.shape[1]
    n_loc = A_loc.shape[0]
    # The diagonal extraction below assumes equal row slabs (local rows
    # idx*n_loc..(idx+1)*n_loc own diagonal columns idx*n_loc+arange(n_loc));
    # a ragged partition would silently read the wrong columns.
    num_shards = jax.lax.psum(1, axis_name)
    if n_loc * num_shards != n:
        raise ValueError(
            f"sharded_fused_apply requires n % num_shards == 0: got local "
            f"slab ({n_loc}, {n}) over {num_shards} shards (n_loc * shards "
            f"= {n_loc * num_shards} != {n}). Pad the node dimension to a "
            f"multiple of the graph-axis size."
        )
    idx = jax.lax.axis_index(axis_name)

    # ---- O(n) reductions ---------------------------------------------------
    rA_loc = jnp.sum(A_loc, axis=1)        # (n_loc,) row sums (local rows)
    rdA_loc = jnp.sum(dA_loc, axis=1)
    sA = _psum(jnp.sum(A_loc), axis_name)  # global sums
    sdA = _psum(jnp.sum(dA_loc), axis_name)

    # Local diagonal entries: columns idx*n_loc .. for local rows.
    col0 = idx * n_loc
    diag_cols = col0 + jnp.arange(n_loc)
    diagA_loc = A_loc[jnp.arange(n_loc), diag_cols]
    diagdA_loc = dA_loc[jnp.arange(n_loc), diag_cols]

    # ---- feature-side reductions ------------------------------------------
    s = _psum(jnp.sum(M_loc, axis=0), axis_name)  # colsum(M): (H,)
    v_loc = (p5[0] * rA_loc + p5[1] * rdA_loc) / n
    w = _psum(v_loc @ M_loc, axis_name)           # (H,)

    # ---- halo exchange + dense pair ---------------------------------------
    use_halo = halo is not None and 2 * halo + 1 < num_shards
    if use_halo:
        A_win = _halo_window_cols(A_loc, halo, axis_name, num_shards)
        dA_win = _halo_window_cols(dA_loc, halo, axis_name, num_shards)
        M_window = _halo_ring_gather(M_loc, halo, axis_name, num_shards)
        if backend == "pallas":
            rowpart, partial_win = _pallas_slab_pair(
                A_win, dA_win, 1.0 + p1, p2, M_window, M_loc, tile=tile)
        else:
            B1_win = (1.0 + p1[0]) * A_win + (1.0 + p1[1]) * dA_win
            rowpart = B1_win @ M_window  # (n_loc, H)
            B2_win = p2[0] * A_win + p2[1] * dA_win
            partial_win = B2_win.T @ M_loc  # (W, H)
        colpart = _halo_ring_scatter(
            partial_win, halo, axis_name, num_shards, n_loc)
        M_rows = M_loc
    else:
        M_full = jax.lax.all_gather(M_loc, axis_name, tiled=True)  # (n, H)
        if backend == "pallas":
            rowpart, partial = _pallas_slab_pair(
                A_loc, dA_loc, 1.0 + p1, p2, M_full, M_loc, tile=tile)
        else:
            B1_loc = (1.0 + p1[0]) * A_loc + (1.0 + p1[1]) * dA_loc
            rowpart = B1_loc @ M_full  # (n_loc, H)

            B2_loc = p2[0] * A_loc + p2[1] * dA_loc
            partial = B2_loc.T @ M_loc  # (n, H) partial of transpose product
        colpart = jax.lax.psum_scatter(
            partial, axis_name, scatter_dimension=0, tiled=True
        )  # (n_loc, H) rows for this shard
        M_rows = jax.lax.dynamic_slice_in_dim(M_full, col0, n_loc, axis=0)

    # ---- rank-structured corrections --------------------------------------
    dvec_loc = (
        p3[0] * diagA_loc
        + p3[1] * diagdA_loc
        + (p6[0] * rA_loc + p6[1] * rdA_loc) / n
        + (p8[0] * sA + p8[1] * sdA) / n**2
    )
    if add_identity:
        dvec_loc = dvec_loc + 1.0
    u_loc = (p4[0] * rA_loc + p4[1] * rdA_loc) / n
    c7 = (p7[0] + p7[1]) * sA / n**2  # reference term_7 quirk: sum(A) twice

    return (
        rowpart
        + colpart
        + dvec_loc[:, None] * M_rows
        + u_loc[:, None] * s[None, :]
        + (w + c7 * s)[None, :]
    )


def sharded_sparse_fused_apply(
    indices_loc: jax.Array,   # (n_loc, K) int32 GLOBAL column ids; padding == n
    valsA_loc: jax.Array,     # (n_loc, K) local row slab of A's ELL values
    valsdA_loc: jax.Array,    # (n_loc, K) local row slab of dA's ELL values
    M_loc: jax.Array,         # (n_loc, H) row slab of transformed features
    params: tp.Sequence[jax.Array],
    n: int,                   # GLOBAL node count (static)
    axis_name: str = "graph",
    add_identity: bool = False,
    directed: bool = False,
    halo: tp.Optional[int] = None,
) -> jax.Array:
    """Row-sharded sparse (ELL) fused basis apply: the scaled-n multi-device
    message-passing path (SURVEY.md section 2.2 x 2.3(a)).

    Each device owns an ELL row slab with GLOBAL column indices (padding
    slots == ``n``). A and dA share one index pattern (interp guarantees it:
    they interpolate the same signal), so the basis pairs combine values
    first, exactly like ``ops.sparse.sparse_fused_apply``. Per device, one
    layer costs:

      * ``all_gather(M)``              -- halo for the gather-SpMM row pair,
      * local gather-SpMM              -- O(nnz_loc * H),
      * local segment-sum partial of the transpose pair + ``psum_scatter``,
      * O(n) ``psum``s for the rank-1 basis reductions.

    With ``halo=h`` (from :func:`ell_halo_width`: every referenced column is
    owned by a shard within circular distance h), the all-gather and
    psum_scatter are replaced by ``ppermute`` neighbour rings moving only
    2h slabs of (n_loc, H) each way -- the banded/clustered-graph fast path.
    Columns outside the halo window read/write the zero padding row, so an
    understated ``h`` silently drops edges: always compute it from the true
    index pattern. Falls back to the all-gather path when ``halo is None``
    or the window already spans the mesh axis.

    vs the dense sharded path this replaces two (n/G, n) @ (n, H) matmuls
    with O(nnz/G * H) gathers -- the only viable layout once n is large
    enough that (n, n) slabs stop fitting in HBM. Matches
    ``ops.equiv_basis.fused_apply`` allclose (tested on an 8-device mesh),
    including the reference's term_7 sum(A) and directed term_4_prime quirks
    (reference layers.py:102-160, 256-345).

    Must run inside ``shard_map`` with ``axis_name`` mapped. Returns the
    local (n_loc, H) output slab.
    """
    n_loc, K = indices_loc.shape
    num_shards = jax.lax.psum(1, axis_name)
    if n_loc * num_shards != n:
        raise ValueError(
            f"sharded_sparse_fused_apply requires n % num_shards == 0: got "
            f"local slab ({n_loc}, {K}) over {num_shards} shards with global "
            f"n={n}. Pad the node dimension to a multiple of the graph axis."
        )
    idx = jax.lax.axis_index(axis_name)
    col0 = idx * n_loc

    if directed:
        p1, p2, p3, p4, p4p, p5, p5p, p6, p6p, p7, p8 = params
    else:
        p1, p2, p3, p4, p5, p6, p7, p8 = params

    # ---- O(n)/O(nnz) reductions --------------------------------------------
    rA_loc = jnp.sum(valsA_loc, axis=1)   # row sums of local rows (padding=0)
    rdA_loc = jnp.sum(valsdA_loc, axis=1)
    sA = _psum(jnp.sum(rA_loc), axis_name)
    sdA = _psum(jnp.sum(rdA_loc), axis_name)

    # Local diagonal entries: slots whose global column == global row.
    diag_mask = indices_loc == (col0 + jnp.arange(n_loc))[:, None]
    diagA_loc = jnp.sum(jnp.where(diag_mask, valsA_loc, 0.0), axis=1)
    diagdA_loc = jnp.sum(jnp.where(diag_mask, valsdA_loc, 0.0), axis=1)

    flat_idx = indices_loc.reshape(-1)
    if directed:
        # Column sums: local partial over all n+1 segments, then reduce and
        # keep this shard's column slab.
        cA_part = jax.ops.segment_sum(
            valsA_loc.reshape(-1), flat_idx, num_segments=n + 1
        )[:-1]
        cdA_part = jax.ops.segment_sum(
            valsdA_loc.reshape(-1), flat_idx, num_segments=n + 1
        )[:-1]
        cA_loc = jax.lax.psum_scatter(
            cA_part, axis_name, scatter_dimension=0, tiled=True
        )
        cdA_loc = jax.lax.psum_scatter(
            cdA_part, axis_name, scatter_dimension=0, tiled=True
        )

    # ---- feature-side reductions --------------------------------------------
    s = _psum(jnp.sum(M_loc, axis=0), axis_name)  # colsum(M): (H,)
    if directed:
        v_loc = (
            (p4p[0] * rA_loc + p4p[1] * cdA_loc)  # reference term_4_prime quirk
            + (p5[0] * cA_loc + p5[1] * cdA_loc)
            + (p5p[0] * rA_loc + p5p[1] * rdA_loc)
        ) / n
    else:
        v_loc = (p5[0] * rA_loc + p5[1] * rdA_loc) / n
    w = _psum(v_loc @ M_loc, axis_name)           # (H,)

    # ---- halo exchange + sparse pair ----------------------------------------
    B1_vals = (1.0 + p1[0]) * valsA_loc + (1.0 + p1[1]) * valsdA_loc
    B2_vals = p2[0] * valsA_loc + p2[1] * valsdA_loc
    use_halo = halo is not None and 2 * halo + 1 < num_shards
    if use_halo:
        W = (2 * halo + 1) * n_loc
        base = (idx - halo) * n_loc
        # Window-local ids: padding (== n) -> W; out-of-window -> clamped to
        # the zero row at W (contract: halo >= ell_halo_width, see docstring).
        loc_idx = jnp.where(indices_loc == n, W, (indices_loc - base) % n)
        loc_idx = jnp.minimum(loc_idx, W)
        M_window = _halo_ring_gather(M_loc, halo, axis_name, num_shards)
        M_pad = jnp.concatenate(
            [M_window, jnp.zeros((1, M_window.shape[1]), M_window.dtype)], 0
        )
        rowpart = jnp.einsum("nk,nkh->nh", B1_vals, M_pad[loc_idx])

        contrib = (B2_vals[..., None] * M_loc[:, None, :]).reshape(n_loc * K, -1)
        partial = jax.ops.segment_sum(
            contrib, loc_idx.reshape(-1), num_segments=W + 1
        )[:-1]
        colpart = _halo_ring_scatter(partial, halo, axis_name, num_shards, n_loc)
    else:
        M_full = jax.lax.all_gather(M_loc, axis_name, tiled=True)  # (n, H)
        M_pad = jnp.concatenate(
            [M_full, jnp.zeros((1, M_full.shape[1]), M_full.dtype)], 0
        )
        rowpart = jnp.einsum("nk,nkh->nh", B1_vals, M_pad[indices_loc])  # (n_loc, H)

        contrib = (B2_vals[..., None] * M_loc[:, None, :]).reshape(n_loc * K, -1)
        partial = jax.ops.segment_sum(contrib, flat_idx, num_segments=n + 1)[:-1]
        colpart = jax.lax.psum_scatter(
            partial, axis_name, scatter_dimension=0, tiled=True
        )  # (n_loc, H)

    # ---- rank-structured corrections ----------------------------------------
    if directed:
        dvec_loc = (
            p3[0] * diagA_loc
            + p3[1] * diagdA_loc
            + (p6[0] * cA_loc + p6[1] * cdA_loc) / n
            + (p6p[0] * rA_loc + p6p[1] * rdA_loc) / n
            + (p8[0] * sA + p8[1] * sdA) / n**2
        )
        u_loc = (p4[0] * cA_loc + p4[1] * cdA_loc) / n
    else:
        dvec_loc = (
            p3[0] * diagA_loc
            + p3[1] * diagdA_loc
            + (p6[0] * rA_loc + p6[1] * rdA_loc) / n
            + (p8[0] * sA + p8[1] * sdA) / n**2
        )
        u_loc = (p4[0] * rA_loc + p4[1] * rdA_loc) / n
    if add_identity:
        dvec_loc = dvec_loc + 1.0
    c7 = (p7[0] + p7[1]) * sA / n**2  # reference term_7 quirk: sum(A) twice

    return (
        rowpart
        + colpart
        + dvec_loc[:, None] * M_loc
        + u_loc[:, None] * s[None, :]
        + (w + c7 * s)[None, :]
    )


def sharded_bcsr_fused_apply(
    blocksA, blocksdA,        # (nb_loc, kb, bs, bs) forward-layout slabs
    blocksA_T, blocksdA_T,    # (nb_loc, kbT, bs, bs) transposed-layout slabs
    block_idx, nblocks,       # (nb_loc, kb), (nb_loc,) GLOBAL col-block ids
    block_idx_T, nblocks_T,
    diag_slot,                # (nb_loc,) slot of the diagonal block
    M_loc,                    # (n_loc, H)
    params,
    n: int,                   # GLOBAL node count (static); n % (G*bs) == 0
    axis_name: str = "graph",
    add_identity: bool = False,
    directed: bool = False,
):
    """Node-sharded BLOCK-SPARSE fused basis apply: the BCSR half of the
    kernel-keeping multi-chip path (VERDICT r4 item 1 "and/or BCSR block
    kernels").

    Each device owns the BLOCK-ROW slabs of both layouts (slice the full
    BCSRLayout/BCSRVal along the nb axis), so BOTH heavy products are
    LOCAL block-kernel SpMMs against the all-gathered features
    (:func:`~gncde_tpu.ops.bcsr.bcsr_slab_spmm`):

      rowpart_loc = A_slab   @ M_full    (forward layout)
      colpart_loc = A^T_slab @ M_full    (transposed layout -- NO
                                          psum_scatter: the two-layout
                                          arrangement makes the transpose
                                          pair row-local too)

    plus O(n) psums for the rank-structured reductions. Differentiable:
    the slab kernel's VJP rides the SDDMM block kernel (d_blocks) and a
    block scatter-add (d_M, psum-scattered back by shard_map's all_gather
    transpose). Per-device HBM is O(stored-blocks/G); the only full-width
    object is the gathered (n, H) feature matrix.

    Must run inside ``shard_map``. Returns the local (n_loc, H) slab.
    """
    from ..ops.bcsr import (
        bcsr_diag,
        bcsr_row_sums,
        bcsr_slab_spmm,
        slot_mask,
    )

    if directed:
        p1, p2, p3, p4, p4p, p5, p5p, p6, p6p, p7, p8 = params
    else:
        p1, p2, p3, p4, p5, p6, p7, p8 = params
    bs = blocksA.shape[-1]
    nb_loc = blocksA.shape[0]
    n_loc = M_loc.shape[0]
    num_shards = jax.lax.psum(1, axis_name)
    if nb_loc * bs != n_loc:
        raise ValueError(
            f"sharded_bcsr_fused_apply: slab covers {nb_loc * bs} rows but "
            f"M_loc has {n_loc}; n must divide by shards * block_size."
        )

    # ---- O(n) reductions ---------------------------------------------------
    rA_loc = bcsr_row_sums(blocksA, n_loc)
    rdA_loc = bcsr_row_sums(blocksdA, n_loc)
    sA = _psum(jnp.sum(rA_loc), axis_name)
    sdA = _psum(jnp.sum(rdA_loc), axis_name)
    diagA_loc = bcsr_diag(blocksA, diag_slot, n_loc)
    diagdA_loc = bcsr_diag(blocksdA, diag_slot, n_loc)
    if directed:
        # Column sums of A == row sums of A^T: local on the T slabs.
        cA_loc = bcsr_row_sums(blocksA_T, n_loc)
        cdA_loc = bcsr_row_sums(blocksdA_T, n_loc)

    # ---- feature-side reductions ------------------------------------------
    s = _psum(jnp.sum(M_loc, axis=0), axis_name)  # colsum(M): (H,)
    if directed:
        v_loc = (
            (p4p[0] * rA_loc + p4p[1] * cdA_loc)  # term_4' quirk
            + (p5[0] * cA_loc + p5[1] * cdA_loc)
            + (p5p[0] * rA_loc + p5p[1] * rdA_loc)
        ) / n
    else:
        v_loc = (p5[0] * rA_loc + p5[1] * rdA_loc) / n
    w = _psum(v_loc @ M_loc, axis_name)           # (H,)

    # ---- all-gather + two LOCAL block-kernel SpMMs ------------------------
    M_full = jax.lax.all_gather(M_loc, axis_name, tiled=True)  # (n, H)
    NBg = n // bs
    Mp = M_full
    if NBg * bs != n:
        raise ValueError(f"n={n} must divide by block_size={bs}")
    valid = slot_mask(block_idx, nblocks)
    valid_T = slot_mask(block_idx_T, nblocks_T)
    combA = (1.0 + p1[0]) * blocksA + (1.0 + p1[1]) * blocksdA
    combT = p2[0] * blocksA_T + p2[1] * blocksdA_T
    rowpart = bcsr_slab_spmm(combA, block_idx, valid, Mp)[:n_loc]
    colpart = bcsr_slab_spmm(combT, block_idx_T, valid_T, Mp)[:n_loc]

    # ---- rank-structured corrections --------------------------------------
    if directed:
        dvec_loc = (
            p3[0] * diagA_loc
            + p3[1] * diagdA_loc
            + (p6[0] * cA_loc + p6[1] * cdA_loc) / n
            + (p6p[0] * rA_loc + p6p[1] * rdA_loc) / n
            + (p8[0] * sA + p8[1] * sdA) / n**2
        )
        u_loc = (p4[0] * cA_loc + p4[1] * cdA_loc) / n
    else:
        dvec_loc = (
            p3[0] * diagA_loc
            + p3[1] * diagdA_loc
            + (p6[0] * rA_loc + p6[1] * rdA_loc) / n
            + (p8[0] * sA + p8[1] * sdA) / n**2
        )
        u_loc = (p4[0] * rA_loc + p4[1] * rdA_loc) / n
    if add_identity:
        dvec_loc = dvec_loc + 1.0
    c7 = (p7[0] + p7[1]) * sA / n**2  # reference term_7 quirk: sum(A) twice

    return (
        rowpart
        + colpart
        + dvec_loc[:, None] * M_loc
        + u_loc[:, None] * s[None, :]
        + (w + c7 * s)[None, :]
    )


def make_sharded_bcsr_vf_eval(mesh: Mesh, vf, layout, n: int,
                              axis_name: str = "graph"):
    """Jitted node-sharded vf-stack evaluation over BCSR-valued planes.

    ``layout``: the FULL :class:`~gncde_tpu.ops.bcsr.BCSRLayout` (its nb
    axis is sharded by the in_specs). Returns
    ``f(Z, blocksA, blocksdA, blocksA_T, blocksdA_T) -> (n, H)`` on full
    arrays carried with block-row-sharded layouts.
    """
    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    directed = (
        type(vf.gnn_layers[0]).__name__ == "ConvEquivFusionDirectedLayer"
    )

    def local(Z_loc, bA, bdA, bAT, bdAT, bidx, nbl, bidxT, nblT, dslot):
        feats = Z_loc
        for i, layer in enumerate(vf.gnn_layers):
            M_loc = layer.conv_layer.transform(feats)
            feats = sharded_bcsr_fused_apply(
                bA, bdA, bAT, bdAT, bidx, nbl, bidxT, nblT, dslot,
                M_loc, layer.params, n, axis_name,
                add_identity=True, directed=directed,
            )
            if i < len(vf.gnn_layers) - 1:
                feats = jax.nn.relu(feats)
        return feats

    row = P(axis_name)
    rowd = P(axis_name, None)
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None),
                  rowd, rowd, rowd, rowd,
                  rowd, row, rowd, row, row),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    lay = layout

    def f(Z, blocksA, blocksdA, blocksA_T, blocksdA_T):
        return sharded(
            Z, blocksA, blocksdA, blocksA_T, blocksdA_T,
            lay.block_idx, lay.nblocks, lay.block_idx_T, lay.nblocks_T,
            lay.diag_slot,
        )

    return jax.jit(f)


def sharded_equiv_conv(layer, Z_loc, A_loc, dA_loc, axis_name="graph",
                       backend="xla", tile=None, halo=None):
    """Row-sharded ConvEquivFusionLayer forward: transform locally, then
    sharded fused matvec with the residual identity folded in."""
    M_loc = layer.conv_layer.transform(Z_loc)
    return sharded_fused_apply(
        A_loc, dA_loc, M_loc, layer.params, axis_name=axis_name,
        add_identity=True, backend=backend, tile=tile, halo=halo,
    )


def sharded_vf_stack(vf, Z_loc, A_loc, dA_loc, axis_name="graph",
                     backend="xla", tile=None, halo=None):
    """Row-sharded PermEquivGraphVectorField layer stack (no time scaling --
    slim-control semantics with unit time gradient)."""
    feats = Z_loc
    for i, layer in enumerate(vf.gnn_layers):
        feats = sharded_equiv_conv(layer, feats, A_loc, dA_loc, axis_name,
                                   backend=backend, tile=tile, halo=halo)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    return feats


def make_sharded_vf_eval(mesh: Mesh, vf, axis_name: str = "graph",
                         backend: str = "xla", tile: tp.Optional[int] = None,
                         halo: tp.Optional[int] = None):
    """Build a jitted node-sharded vf-stack evaluation over ``mesh``.

    Returns f(Z, A, dA) operating on FULL arrays carried with node-sharded
    layouts; shard_map provides each device its slab. ``backend="pallas"``
    keeps the per-shard heavy products on the tiled Pallas kernel.
    """
    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    spec_mat = P(axis_name, None)
    spec_feat = P(axis_name, None)

    def local(Z_loc, A_loc, dA_loc):
        return sharded_vf_stack(vf, Z_loc, A_loc, dA_loc, axis_name,
                                backend=backend, tile=tile, halo=halo)

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_feat, spec_mat, spec_mat),
        out_specs=spec_feat,
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_sparse_equiv_conv(
    layer, Z_loc, indices_loc, valsA_loc, valsdA_loc, n, axis_name="graph",
    directed=False, halo=None,
):
    """Row-sharded ConvEquivFusionLayer forward on ELL slabs: transform
    locally, then sparse sharded fused matvec with the residual identity
    folded in."""
    M_loc = layer.conv_layer.transform(Z_loc)
    return sharded_sparse_fused_apply(
        indices_loc, valsA_loc, valsdA_loc, M_loc, layer.params, n,
        axis_name=axis_name, add_identity=True, directed=directed, halo=halo,
    )


def sharded_sparse_vf_stack(
    vf, Z_loc, indices_loc, valsA_loc, valsdA_loc, n, axis_name="graph",
    halo=None,
):
    """Row-sharded PermEquivGraphVectorField layer stack on ELL slabs
    (slim-control semantics with unit time gradient)."""
    feats = Z_loc
    for i, layer in enumerate(vf.gnn_layers):
        feats = sharded_sparse_equiv_conv(
            layer, feats, indices_loc, valsA_loc, valsdA_loc, n, axis_name,
            halo=halo,
        )
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    return feats


def make_sharded_sparse_vf_eval(
    mesh: Mesh, vf, n: int, axis_name: str = "graph",
    halo: tp.Optional[int] = None,
):
    """Build a jitted node-sharded SPARSE vf-stack evaluation over ``mesh``.

    Returns f(Z, indices, valsA, valsdA) on FULL (n, .) arrays carried with
    node-sharded layouts (indices hold GLOBAL column ids, padding == n);
    shard_map hands each device its ELL row slab. The sparse counterpart of
    ``make_sharded_vf_eval`` for graphs whose (n, n) dense slabs no longer
    fit in HBM. ``halo`` (from :func:`ell_halo_width`) switches the feature
    exchange from all-gather to ppermute neighbour rings.
    """
    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    spec = P(axis_name, None)

    def local(Z_loc, indices_loc, valsA_loc, valsdA_loc):
        return sharded_sparse_vf_stack(
            vf, Z_loc, indices_loc, valsA_loc, valsdA_loc, n, axis_name,
            halo=halo,
        )

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(sharded)
