"""Pallas TPU megakernel: one kernel per vector-field evaluation.

The GNCDE hot loop is HBM-bound on coefficient reads and A(t)/dA(t)/A_bar
materialisation (profiled on v5e: the XLA path moves ~13 MB/eval at n=400
where the information content is the ~2.5 MB of interval coefficients). This
kernel evaluates the ENTIRE undirected perm-equiv vector field in one
pallas_call with everything VMEM-resident:

    read d,c,b,a interval slices (XLA dynamic-slice outside) -- 4 n^2 reads
      -> A(t), dA(t) as VMEM values (never hit HBM)
      -> shared reductions (row/col sums, diag, totals)
      -> L x [RMSNorm -> Linear -> rank-structured fused matvec]
    write out (n, H)                                         -- tiny

Serves BOTH the undirected 8-term and directed 11-term bases (see
_make_kernel). Constraints: single-core whole-VMEM kernel; VMEM footprint
is roughly ``n^2 * (4 coeff planes + A/dA f32 + 4 matmul-operand copies)``
which caps ``n`` at :data:`MEGAKERNEL_MAX_N` (larger graphs fall back to
the XLA dense path in the vector-field dispatch). Backward is a second
fused Pallas kernel (megakernel_bwd.py) computing every cotangent in one
pallas_call; custom_vjp with ``symbolic_zeros=True`` statically skips
cotangents for unperturbed inputs (the coefficient planes are data in
every trainer), and perturbed-coefficient or 512 < n <= 640 cases keep the
equivalent-XLA backward.

STATUS: production TPU path since round 2, for training AND inference --
flagship dyn train step 0.905 s (f32) / 0.663 s (bf16) vs 1.39 s on the
dense XLA backend; forward vf eval 2.5x the XLA slim+bf16 dense path.
The round-1 Mosaic compile-time blocker (>15 min at n>=400) no longer
reproduces (~3 s at n=400). History: an earlier revision DMA'd the interval
planes via scalar-prefetch index_maps -- faster in isolation but
catastrophic under the loss-level vmap (no efficient batching rule; see
PERFORMANCE.md round-2 section).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6

# Largest n the whole-VMEM kernel serves: VMEM bytes ~= n^2 * 24 (bf16 coeff
# planes 8 + f32 A/dA 8 + matmul-operand copies 8) must stay under ~16 MB/core
# with headroom for double-buffered coefficient DMA.
MEGAKERNEL_MAX_N = 640


def _layer_param_arrays(vf):
    """Flatten the per-layer parameters of a PermEquivGraphVectorField."""
    out = []
    for layer in vf.gnn_layers:
        conv = layer.conv_layer
        out.append(
            dict(
                norm_w=conv.norm.weight[None, :],
                norm_b=conv.norm.bias[None, :],
                W=conv.linear.weight,  # (Hout, Hin)
                lin_b=conv.linear.bias[None, :],
                basis=jnp.stack(layer.params),  # (8, 2)
            )
        )
    return out


def _make_vf_body(n: int, dims: tp.List[tp.Tuple[int, int]], bf16: bool,
                  directed: bool):
    """The megakernel eval body as a function of VMEM *values*.

    Returns ``body(tau, d, c, b, a, feats, layer_refs) -> (n, Hout)`` where
    d/c/b/a are the f32 interval coefficient planes. Shared by the per-eval
    kernel (:func:`_make_kernel`) and the fused RK-step kernel
    (fused_step.py), so both compile the identical eval math.
    """
    L = len(dims)
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32

    def body(tau, d, c, b, a, feats, layer_refs):
        A = ((d * tau + c) * tau + b) * tau + a  # (n, n), VMEM value
        dA = (3.0 * d * tau + 2.0 * c) * tau + b

        # Transpose once, outside the layer loop: each layer's column part is
        # B2^T = p2[0] A^T + p2[1] dA^T, so two in-register transposes here
        # replace one per layer (relayouts are the VPU's weak spot).
        At = A.T.astype(mm_dtype)
        dAt = dA.T.astype(mm_dtype)
        Ah = A.astype(mm_dtype)
        dAh = dA.astype(mm_dtype)

        # Shared reductions. Everything stays 2-D ((n, 1) / (1, H)): Mosaic's
        # relayouts for 1-D vectors are limited.
        rA = jnp.sum(A, axis=1, keepdims=True)  # (n, 1)
        rdA = jnp.sum(dA, axis=1, keepdims=True)
        sA = jnp.sum(rA)
        sdA = jnp.sum(rdA)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        eye = rows == cols
        diagA = jnp.sum(jnp.where(eye, A, 0.0), axis=1, keepdims=True)
        diagdA = jnp.sum(jnp.where(eye, dA, 0.0), axis=1, keepdims=True)
        if directed:
            # Column sums as (n, 1): row sums of the transposes.
            cA = jnp.sum(At.astype(jnp.float32), axis=1, keepdims=True)
            cdA = jnp.sum(dAt.astype(jnp.float32), axis=1, keepdims=True)

        for l in range(L):
            normw = layer_refs[5 * l + 0][:]
            normb = layer_refs[5 * l + 1][:]
            W = layer_refs[5 * l + 2][:]
            lin_b = layer_refs[5 * l + 3][:]
            p = layer_refs[5 * l + 4]

            inv_rms = jax.lax.rsqrt(
                jnp.mean(feats * feats, axis=1, keepdims=True) + _EPS
            )
            zn = feats * inv_rms * normw + normb
            M = (
                jax.lax.dot_general(
                    zn, W,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + lin_b
            )  # (n, Hout)

            if directed:
                # (11, 2) stack: [p1, p2, p3, p4, p4', p5, p5', p6, p6', p7, p8]
                p1, p2, p3 = p[0], p[1], p[2]
                p4, p4p, p5, p5p = p[3], p[4], p[5], p[6]
                p6, p6p, p7, p8 = p[7], p[8], p[9], p[10]
            else:
                p1 = p[0]
                p2 = p[1]
                p3 = p[2]
                p4 = p[3]
                p5 = p[4]
                p6 = p[5]
                p7 = p[6]
                p8 = p[7]

            # In bf16 precision mode the MXU operands are bfloat16 with f32
            # accumulation: the v5e MXU is native-bf16 (f32 matmuls are
            # emulated at a fraction of that throughput) and the ~3e-3
            # relative error matches the XLA bf16 path's, safe at the
            # reference's rtol=1e-3 training tolerance.
            b1_0 = (1.0 + p1[0]).astype(mm_dtype)
            b1_1 = (1.0 + p1[1]).astype(mm_dtype)
            b2_0 = p2[0].astype(mm_dtype)
            b2_1 = p2[1].astype(mm_dtype)
            B1 = b1_0 * Ah + b1_1 * dAh
            B2t = b2_0 * At + b2_1 * dAt  # == B2^T, transposes hoisted
            Mh = M.astype(mm_dtype)
            rowpart = jnp.dot(B1, Mh, preferred_element_type=jnp.float32)
            colpart = jnp.dot(B2t, Mh, preferred_element_type=jnp.float32)
            if directed:
                # layers.py:256-345 semantics incl. the term_4' row/col mix
                # and term_7 sum(A)-for-both quirks (equiv_basis.py:82-97).
                dvec = (
                    p3[0] * diagA
                    + p3[1] * diagdA
                    + (p6[0] * cA + p6[1] * cdA) / n
                    + (p6p[0] * rA + p6p[1] * rdA) / n
                    + (p8[0] * sA + p8[1] * sdA) / n**2
                    + 1.0  # folded residual identity
                )  # (n, 1)
                u = (p4[0] * cA + p4[1] * cdA) / n  # (n, 1)
                v = (
                    p4p[0] * rA + p4p[1] * cdA
                    + p5[0] * cA + p5[1] * cdA
                    + p5p[0] * rA + p5p[1] * rdA
                ) / n  # (n, 1)
            else:
                dvec = (
                    p3[0] * diagA
                    + p3[1] * diagdA
                    + (p6[0] * rA + p6[1] * rdA) / n
                    + (p8[0] * sA + p8[1] * sdA) / n**2
                    + 1.0  # folded residual identity
                )  # (n, 1)
                u = (p4[0] * rA + p4[1] * rdA) / n  # (n, 1)
                v = (p5[0] * rA + p5[1] * rdA) / n  # (n, 1)
            c7 = (p7[0] + p7[1]) * sA / n**2
            s = jnp.sum(M, axis=0, keepdims=True)  # (1, H)
            w = jnp.sum(v * M, axis=0, keepdims=True)  # (1, H)
            feats = rowpart + colpart + dvec * M + u * s + (w + c7 * s)
            if l < L - 1:
                feats = jnp.maximum(feats, 0.0)

        return feats

    return body


def _make_kernel(
    n: int, dims: tp.List[tp.Tuple[int, int]], bf16: bool, directed: bool = False
):
    """dims: [(Hin, Hout)] per layer; bf16 selects MXU operand precision.

    ``directed`` switches to the 11-term directed basis
    (equiv_basis.fusion_matrix_dense_directed, reference layers.py:256-345):
    same rank structure as the undirected 8-term basis -- B1 row part, B2^T
    column part, diagonal vector, rank-1 outer products -- with column sums
    (cA, cdA) joining the row sums in the diagonal/rank-1 compositions. The
    column sums come from axis-1 reductions of the already-transposed
    At/dAt, so the directed path adds no relayouts."""
    L = len(dims)
    body = _make_vf_body(n, dims, bf16, directed)

    def kernel(tau_ref, d_ref, c_ref, b_ref, a_ref, z_ref, *rest):
        layer_refs = rest[: 5 * L]
        out_ref = rest[5 * L]
        tau = tau_ref[0, 0]

        # Coefficient planes may be stored bf16 (half the HBM traffic -- the
        # kernel's only O(n^2) reads); Hermite evaluation runs in f32.
        d = d_ref[:].astype(jnp.float32)
        c = c_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        a = a_ref[:].astype(jnp.float32)
        out_ref[:] = body(tau, d, c, b, a, z_ref[:], layer_refs)

    return kernel


def _forward_impl(coeffs, idx, tau, Z, layer_arrays, n, dims, bf16,
                  directed=False):
    """Unbatched path: XLA dynamic-slice the 4 interval planes + one plain
    pallas_call. Batched calls go through :func:`_forward_batched` instead
    (in-kernel DMA, no slice copies)."""
    d, c, b, a = coeffs
    H_out = dims[-1][1]
    kernel = _make_kernel(n, dims, bf16, directed)

    slices = [
        jax.lax.dynamic_index_in_dim(p, idx, axis=0, keepdims=False)
        for p in (d, c, b, a)
    ]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tau (1, 1)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # d slice (n, n)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # c
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # a
        pl.BlockSpec(memory_space=pltpu.VMEM),  # Z
    ]
    operands = [tau.reshape(1, 1).astype(jnp.float32), *slices, Z]
    for la in layer_arrays:
        for key in ("norm_w", "norm_b", "W", "lin_b", "basis"):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(la[key])

    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, H_out), jnp.float32),
    )(*operands)


class _GridScalar:
    """Adapter presenting ``scalars[program_id(0)]`` through the (1, 1)
    SMEM-ref indexing the unbatched kernel body uses for tau."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, _):
        return self._ref[pl.program_id(0)]


def _forward_batched(coeffs, coeffs_batched, idx_b, tau_b, Z_b, layer_arrays,
                     n, dims, bf16, directed):
    """Batched megakernel forward: ONE pallas_call with the batch as the
    leading grid dimension and each element's 4 interval planes DMA'd
    in-kernel by scalar-prefetch index maps (idx_b rides in SMEM).

    This replaces the round-2/3 arrangement (XLA dynamic-slice copies + the
    default vmap-of-plain-pallas_call batching) whose slice copies cost ~3
    extra HBM passes over the planes per eval -- measured 8.9 -> 6.9 us/eval
    at the flagship n=400 shape (benchmarks/mk_probe2.py). The round-2
    "17.7 s pathology" (PERFORMANCE.md) was vmap OF a scalar-prefetch
    kernel, which unrolls; here the batch IS the grid, nothing is vmapped.
    """
    d, c, b, a = coeffs
    B = Z_b.shape[0]
    H_out = dims[-1][1]
    kernel = _make_kernel(n, dims, bf16, directed)

    def wrapped(idx_sref, tau_sref, d_ref, c_ref, b_ref, a_ref, z_ref, *rest):
        kernel(_GridScalar(tau_sref), d_ref, c_ref, b_ref, a_ref, z_ref,
               *rest)

    if coeffs_batched:
        plane_spec = pl.BlockSpec(
            (None, None, n, n), lambda i, idx, tau: (i, idx[i], 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        plane_spec = pl.BlockSpec(
            (None, n, n), lambda i, idx, tau: (idx[i], 0, 0),
            memory_space=pltpu.VMEM,
        )
    in_specs = [plane_spec] * 4 + [
        pl.BlockSpec((None, n, Z_b.shape[2]), lambda i, idx, tau: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [d, c, b, a, Z_b]
    for la in layer_arrays:
        for key in ("norm_w", "norm_b", "W", "lin_b", "basis"):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(la[key])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # idx_b (B,) int32, tau_b (B,) f32
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, n, H_out),
                               lambda i, idx, tau: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n, H_out), jnp.float32),
    )(idx_b.astype(jnp.int32), tau_b.astype(jnp.float32), *operands)


@functools.lru_cache(maxsize=None)
def _fused_forward(n, dims, bf16, directed):
    """custom_vmap-wrapped forward: the loss-level batch vmap dispatches to
    the batch-grid kernel (:func:`_forward_batched`) instead of the default
    vmap-of-pallas_call batching with its XLA slice copies."""
    import jax.custom_batching

    @jax.custom_batching.custom_vmap
    def fused(coeffs, idx, tau, Z, layer_arrays):
        return _forward_impl(coeffs, idx, tau, Z, layer_arrays, n, list(dims),
                             bf16, directed)

    @fused.def_vmap
    def _rule(axis_size, in_batched, coeffs, idx, tau, Z, layer_arrays):
        coeff_flags = jax.tree_util.tree_leaves(in_batched[0])
        cb = all(coeff_flags)
        mixed_coeffs = any(coeff_flags) and not cb
        params_batched = any(jax.tree_util.tree_leaves(in_batched[4]))
        if params_batched or mixed_coeffs:
            # Per-element parameters (no trainer does this): generic vmap of
            # the unbatched implementation.
            axes = jax.tree_util.tree_map(
                lambda bt: 0 if bt else None, in_batched
            )
            out = jax.vmap(
                lambda c_, i_, t_, z_, la_: _forward_impl(
                    c_, i_, t_, z_, la_, n, list(dims), bf16, directed
                ),
                in_axes=tuple(axes),
            )(coeffs, idx, tau, Z, layer_arrays)
            return out, True
        idx_b = idx if in_batched[1] else jnp.broadcast_to(idx, (axis_size,))
        tau_b = tau if in_batched[2] else jnp.broadcast_to(tau, (axis_size,))
        Z_b = Z if in_batched[3] else jnp.broadcast_to(
            Z, (axis_size,) + Z.shape
        )
        out = _forward_batched(coeffs, cb, idx_b, tau_b, Z_b, layer_arrays,
                               n, list(dims), bf16, directed)
        return out, True

    return fused


def _forward(coeffs, idx, tau, Z, layer_arrays, n, dims, bf16, directed=False):
    return _fused_forward(n, tuple(dims), bf16, directed)(
        coeffs, idx, tau, Z, layer_arrays
    )


def _xla_reference(coeffs, idx, tau, Z, vf):
    """Equivalent XLA computation (used for the backward pass)."""
    d, c, b, a = coeffs
    A = ((d[idx] * tau + c[idx]) * tau + b[idx]) * tau + a[idx]
    dA = (3.0 * d[idx] * tau + 2.0 * c[idx]) * tau + b[idx]
    feats = Z
    for i, layer in enumerate(vf.gnn_layers):
        feats = layer(feats, A, dA)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    return feats


def _interval(ts, t):
    idx = jnp.clip(
        jnp.searchsorted(ts, t, side="right") - 1, 0, ts.shape[0] - 2
    )
    return idx, t - ts[idx]


def _bwd_max_n() -> int:
    from .megakernel_bwd import MEGAKERNEL_BWD_MAX_N

    return MEGAKERNEL_BWD_MAX_N


@jax.custom_vjp
def megakernel_vf_eval(coeffs, ts, t, Z, vf):
    """Single fused vf evaluation: interval coeffs -> vf output.

    coeffs: slim value-channel (d, c, b, a), each (T-1, n, n); ts: knot
    times; t: evaluation time; Z: (n, Hin) node state;
    vf: PermEquivGraphVectorField (undirected or directed). Fully
    differentiable -- the backward pass is a second fused Pallas kernel
    (megakernel_bwd.py), so training steps run Pallas in both directions.
    """
    from ... import ops as ops_config

    n = Z.shape[0]
    dims = [
        (l.conv_layer.linear.in_features, l.conv_layer.linear.out_features)
        for l in vf.gnn_layers
    ]
    idx, tau = _interval(ts, t)
    layer_arrays = _layer_param_arrays(vf)
    bf16 = ops_config.get_fusion_precision() == "bf16"
    directed = type(vf.gnn_layers[0]).__name__ == "ConvEquivFusionDirectedLayer"
    return _forward(coeffs, idx, tau, Z, layer_arrays, n, dims, bf16, directed)


def _unwrap(tree):
    """Strip CustomVJPPrimal wrappers (symbolic_zeros=True fwd signature)."""
    return jax.tree_util.tree_map(lambda leaf: leaf.value, tree)


def _perturbed(tree) -> bool:
    return any(
        leaf.perturbed for leaf in jax.tree_util.tree_leaves(tree)
    )


def _mk_fwd(coeffs, ts, t, Z, vf):
    # symbolic_zeros=True: every array leaf arrives as a CustomVJPPrimal
    # carrying (value, perturbed). The perturbed bits are STATIC, so the
    # backward trace below can skip whole cotangent computations. This
    # matters enormously for `coeffs`: the adjacency coefficient planes are
    # (T-1, n, n) x 4 DATA (hundreds of MB at the flagship workload) and are
    # never differentiated in any trainer -- but without the static flag the
    # backward would materialise a full zeros+scatter cotangent for them on
    # EVERY vf eval (measured 8-13x training slowdown at T=119, n=400; see
    # benchmarks/grad_micro.py).
    needs = (
        _perturbed(coeffs), _perturbed(t), _perturbed(Z), _perturbed(vf),
    )
    coeffs_v, ts_v, t_v, Z_v, vf_v = (
        _unwrap(coeffs), _unwrap(ts), _unwrap(t), _unwrap(Z), _unwrap(vf),
    )
    out = megakernel_vf_eval(coeffs_v, ts_v, t_v, Z_v, vf_v)
    return out, (coeffs_v, ts_v, t_v, Z_v, vf_v, needs)


def _mk_bwd(res, g):
    coeffs, ts, t, Z, vf, (need_coeffs, need_t, need_Z, need_vf) = res
    if isinstance(g, jax.custom_derivatives.SymbolicZero):
        return None, None, None, None, None

    if not need_coeffs and Z.shape[0] <= _bwd_max_n():
        # Production path: ONE fused Pallas kernel computes every cotangent
        # (dZ, dt, all layer params) with the coefficient planes' read as its
        # only O(n^2) HBM traffic (megakernel_bwd.py). The XLA fallback below
        # remains for perturbed coefficients (no trainer does this) and for
        # the 512 < n <= 640 sliver where the reverse sweep's VMEM footprint
        # doesn't fit.
        from . import megakernel_bwd

        d_t, d_Z, d_vf = megakernel_bwd.megakernel_vf_bwd(
            coeffs, ts, t, Z, vf, g, need_t=need_t
        )
        return (
            None,
            None,
            d_t if need_t else None,
            d_Z if need_Z else None,
            d_vf if need_vf else None,
        )

    idx, _ = _interval(ts, t)

    if need_coeffs:
        def f(coeffs_, t_, Z_, vf_):
            tau_ = t_ - ts[idx]
            return _xla_reference(coeffs_, idx, tau_, Z_, vf_)

        _, vjp = jax.vjp(f, coeffs, t, Z, vf)
        d_coeffs, d_t, d_Z, d_vf = vjp(g)
    else:
        def f(t_, Z_, vf_):
            tau_ = t_ - ts[idx]
            return _xla_reference(coeffs, idx, tau_, Z_, vf_)

        _, vjp = jax.vjp(f, t, Z, vf)
        d_t, d_Z, d_vf = vjp(g)
        d_coeffs = None
    return (
        d_coeffs,
        None,  # ts: knot grid, never differentiated
        d_t if need_t else None,
        d_Z if need_Z else None,
        d_vf if need_vf else None,
    )


megakernel_vf_eval.defvjp(_mk_fwd, _mk_bwd, symbolic_zeros=True)
