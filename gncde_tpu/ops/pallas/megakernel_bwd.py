"""Fused Pallas backward pass for the whole-VMEM megakernel.

Round 2 shipped the forward megakernel as the production TPU path but ran
the backward through the equivalent XLA program (megakernel.py `_mk_bwd`),
so a training step -- ~6 vf evals each needing forward AND backward under
the checkpointed adjoint -- was backward-dominated.  This kernel closes
that: ONE pallas_call per vf-eval cotangent that

    reads the 4 coefficient interval planes (the only O(n^2) HBM traffic,
    exactly like the forward), the node state Z, the output cotangent G,
    and the per-layer parameters
      -> recomputes the forward layer stack VMEM-resident (2 MXU matmuls
         per layer, no HBM round trips -- cheaper than saving residuals)
      -> walks the stack in reverse:
           dM   = [B1^T + B2 (+ rank-structured vectors)] applied to G
                  (ONE combined-operand MXU matmul per layer)
           dW, db, dnorm via small (n,H) contractions
           basis-coefficient cotangents as SDDMM-style inner products
           <plane, G M^T> / <plane, M G^T> (P/Q formed on the MXU)
      -> emits dZ, dtau and every per-layer parameter cotangent.

Semantics match ``jax.vjp`` of the XLA reference chain
(megakernel.py:_xla_reference, i.e. reference layers.py:102-160/256-345
with the folded residual identity) for all of (Z, t, layer params); the
coefficient planes are data in every trainer and keep their XLA fallback
for the rare perturbed case.

Serves both the undirected 8-term and directed 11-term bases.  VMEM
footprint is ~38 n^2 bytes (A/dA/ddA f32 + bf16 matmul copies + P/Q), so
the fused backward caps at :data:`MEGAKERNEL_BWD_MAX_N` = 512 (covers every
reference config below the tiled regime: heat n=400, trade n=255, england
n=129, SIR n=100); 512 < n <= 640 keeps the XLA backward.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6

# ~38 n^2 VMEM bytes live in the reverse sweep (vs the forward's ~24):
# 512^2 * 38 = 10 MB leaves headroom; 640 would not.
MEGAKERNEL_BWD_MAX_N = 512


def _make_bwd_kernel(
    n: int, dims: tp.List[tp.Tuple[int, int]], bf16: bool, directed: bool,
    need_tau: bool = True,
):
    """Build the fused backward kernel body.

    dims: [(Hin, Hout)] per layer.  Ref layout (inputs):
      tau, d, c, b, a, Z, G, then per layer [norm_w, norm_b, W, lin_b, basis]
    outputs:
      dtau (1,1 SMEM), dZ (n, Hin0), per layer [dnorm_w (1,H), dnorm_b (1,H),
      dW (Hout,Hin), dlin_b (1,Hout), dbasis (P,2)].
    """
    L = len(dims)
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    nparams = 11 if directed else 8

    def kernel(tau_ref, d_ref, c_ref, b_ref, a_ref, z_ref, g_ref, *rest):
        layer_refs = rest[: 5 * L]
        dtau_ref = rest[5 * L]
        dz_ref = rest[5 * L + 1]
        grad_refs = rest[5 * L + 2 :]
        tau = tau_ref[0, 0]

        d = d_ref[:].astype(jnp.float32)
        c = c_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        a = a_ref[:].astype(jnp.float32)
        A = ((d * tau + c) * tau + b) * tau + a
        dA = (3.0 * d * tau + 2.0 * c) * tau + b
        # d(dA)/dtau, only needed when t's cotangent is requested (the
        # adaptive solver detaches step placement, so training steps
        # normally compile with need_tau=False and skip this chain).
        ddA = (6.0 * d * tau + 2.0 * c) if need_tau else None

        Ah = A.astype(mm_dtype)
        dAh = dA.astype(mm_dtype)
        At = A.T.astype(mm_dtype)
        dAt = dA.T.astype(mm_dtype)

        # Shared reductions (2-D shapes throughout; see megakernel.py).
        rA = jnp.sum(A, axis=1, keepdims=True)
        rdA = jnp.sum(dA, axis=1, keepdims=True)
        rddA = jnp.sum(ddA, axis=1, keepdims=True) if need_tau else None
        sA = jnp.sum(rA)
        sdA = jnp.sum(rdA)
        sddA = jnp.sum(rddA) if need_tau else None
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        eye = rows == cols
        diagA = jnp.sum(jnp.where(eye, A, 0.0), axis=1, keepdims=True)
        diagdA = jnp.sum(jnp.where(eye, dA, 0.0), axis=1, keepdims=True)
        diagddA = (
            jnp.sum(jnp.where(eye, ddA, 0.0), axis=1, keepdims=True)
            if need_tau else None
        )
        if directed:
            # Column sums as (n, 1) row sums of the transposes -- Mosaic's
            # relayouts for (1, n) -> (n, 1) vectors are limited, (n, n)
            # transposes are fine (same trick as the forward kernel).
            cA = jnp.sum(At.astype(jnp.float32), axis=1, keepdims=True)
            cdA = jnp.sum(dAt.astype(jnp.float32), axis=1, keepdims=True)
            cddA = (
                jnp.sum(ddA.T, axis=1, keepdims=True) if need_tau else None
            )

        def unpack(p):
            if directed:
                return dict(
                    p1=p[0], p2=p[1], p3=p[2], p4=p[3], p4p=p[4], p5=p[5],
                    p5p=p[6], p6=p[7], p6p=p[8], p7=p[9], p8=p[10],
                )
            return dict(
                p1=p[0], p2=p[1], p3=p[2], p4=p[3], p5=p[4], p6=p[5],
                p7=p[6], p8=p[7],
            )

        def rank_vectors(q):
            """(dvec, u, v, c7) exactly as the forward kernel composes them."""
            if directed:
                dvec = (
                    q["p3"][0] * diagA + q["p3"][1] * diagdA
                    + (q["p6"][0] * cA + q["p6"][1] * cdA) / n
                    + (q["p6p"][0] * rA + q["p6p"][1] * rdA) / n
                    + (q["p8"][0] * sA + q["p8"][1] * sdA) / n**2
                    + 1.0
                )
                u = (q["p4"][0] * cA + q["p4"][1] * cdA) / n
                v = (
                    q["p4p"][0] * rA + q["p4p"][1] * cdA  # term_4' quirk
                    + q["p5"][0] * cA + q["p5"][1] * cdA
                    + q["p5p"][0] * rA + q["p5p"][1] * rdA
                ) / n
            else:
                dvec = (
                    q["p3"][0] * diagA + q["p3"][1] * diagdA
                    + (q["p6"][0] * rA + q["p6"][1] * rdA) / n
                    + (q["p8"][0] * sA + q["p8"][1] * sdA) / n**2
                    + 1.0
                )
                u = (q["p4"][0] * rA + q["p4"][1] * rdA) / n
                v = (q["p5"][0] * rA + q["p5"][1] * rdA) / n
            c7 = (q["p7"][0] + q["p7"][1]) * sA / n**2
            return dvec, u, v, c7

        # ---- Forward recompute, storing per-layer intermediates ----------
        feats_list = [z_ref[:]]
        inv_list, zn_list, M_list = [], [], []
        for l in range(L):
            normw = layer_refs[5 * l + 0][:]
            normb = layer_refs[5 * l + 1][:]
            W = layer_refs[5 * l + 2][:]
            lin_b = layer_refs[5 * l + 3][:]
            q = unpack(layer_refs[5 * l + 4])

            x = feats_list[l]
            inv_rms = jax.lax.rsqrt(
                jnp.mean(x * x, axis=1, keepdims=True) + _EPS
            )
            zn = x * inv_rms * normw + normb
            M = (
                jax.lax.dot_general(
                    zn, W, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + lin_b
            )
            inv_list.append(inv_rms)
            zn_list.append(zn)
            M_list.append(M)

            b1_0 = (1.0 + q["p1"][0]).astype(mm_dtype)
            b1_1 = (1.0 + q["p1"][1]).astype(mm_dtype)
            b2_0 = q["p2"][0].astype(mm_dtype)
            b2_1 = q["p2"][1].astype(mm_dtype)
            Mh = M.astype(mm_dtype)
            rowpart = jnp.dot(
                b1_0 * Ah + b1_1 * dAh, Mh, preferred_element_type=jnp.float32
            )
            colpart = jnp.dot(
                b2_0 * At + b2_1 * dAt, Mh, preferred_element_type=jnp.float32
            )
            dvec, u, v, c7 = rank_vectors(q)
            s = jnp.sum(M, axis=0, keepdims=True)
            w = jnp.sum(v * M, axis=0, keepdims=True)
            out = rowpart + colpart + dvec * M + u * s + (w + c7 * s)
            if l < L - 1:
                out = jnp.maximum(out, 0.0)
            feats_list.append(out)

        # ---- Reverse sweep -----------------------------------------------
        g = g_ref[:]
        dtau = jnp.float32(0.0)
        for l in range(L - 1, -1, -1):
            normw = layer_refs[5 * l + 0][:]
            W = layer_refs[5 * l + 2][:]
            q = unpack(layer_refs[5 * l + 4])
            x = feats_list[l]
            inv_rms = inv_list[l]
            zn = zn_list[l]
            M = M_list[l]

            if l < L - 1:
                # feats_list[l+1] = relu(pre-activation): its positive mask
                # IS the relu mask (jax relu's subgradient at 0 is 0 too).
                g = jnp.where(feats_list[l + 1] > 0.0, g, 0.0)

            gb = g.astype(mm_dtype)
            Mb = M.astype(mm_dtype)
            # P = G M^T, Q = M G^T (= P^T, formed on the MXU: cheaper than a
            # Mosaic (n, n) relayout).
            P = jax.lax.dot_general(
                gb, Mb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Q = jax.lax.dot_general(
                Mb, gb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            dvec, u, v, c7 = rank_vectors(q)
            s = jnp.sum(M, axis=0, keepdims=True)  # (1, H)
            gcol = jnp.sum(g, axis=0, keepdims=True)  # (1, H)
            gM_row = jnp.sum(g * M, axis=1, keepdims=True)  # (n, 1)
            du_vec = jnp.sum(g * s, axis=1, keepdims=True)  # (n, 1) = g s^T
            dv_vec = jnp.sum(M * gcol, axis=1, keepdims=True)  # (n,1) = M g_c^T
            dc7 = jnp.sum(gcol * s)  # scalar
            sgM = jnp.sum(gM_row)

            # Basis-coefficient cotangents (order = _layer_param_arrays).
            dp1 = jnp.stack([jnp.sum(A * P), jnp.sum(dA * P)])
            dp2 = jnp.stack([jnp.sum(A * Q), jnp.sum(dA * Q)])
            dp3 = jnp.stack(
                [jnp.sum(gM_row * diagA), jnp.sum(gM_row * diagdA)]
            )
            dp7v = dc7 * sA / n**2
            dp7 = jnp.stack([dp7v, dp7v])
            dp8 = jnp.stack([sgM * sA / n**2, sgM * sdA / n**2])
            if directed:
                dp4 = jnp.stack(
                    [jnp.sum(du_vec * cA), jnp.sum(du_vec * cdA)]
                ) / n
                dp4p = jnp.stack(
                    [jnp.sum(dv_vec * rA), jnp.sum(dv_vec * cdA)]
                ) / n
                dp5 = jnp.stack(
                    [jnp.sum(dv_vec * cA), jnp.sum(dv_vec * cdA)]
                ) / n
                dp5p = jnp.stack(
                    [jnp.sum(dv_vec * rA), jnp.sum(dv_vec * rdA)]
                ) / n
                dp6 = jnp.stack(
                    [jnp.sum(gM_row * cA), jnp.sum(gM_row * cdA)]
                ) / n
                dp6p = jnp.stack(
                    [jnp.sum(gM_row * rA), jnp.sum(gM_row * rdA)]
                ) / n
                dbasis = jnp.stack(
                    [dp1, dp2, dp3, dp4, dp4p, dp5, dp5p, dp6, dp6p, dp7, dp8]
                )
            else:
                dp4 = jnp.stack(
                    [jnp.sum(du_vec * rA), jnp.sum(du_vec * rdA)]
                ) / n
                dp5 = jnp.stack(
                    [jnp.sum(dv_vec * rA), jnp.sum(dv_vec * rdA)]
                ) / n
                dp6 = jnp.stack(
                    [jnp.sum(gM_row * rA), jnp.sum(gM_row * rdA)]
                ) / n
                dbasis = jnp.stack([dp1, dp2, dp3, dp4, dp5, dp6, dp7, dp8])

            # tau chain: matmul parts via <dA|ddA, P|Q>, rank parts via the
            # tau-derivatives of every reduction (d rA/dtau = rdA, etc.).
            if not need_tau:
                pass
            else:
                dtau += (1.0 + q["p1"][0]) * dp1[1] + (
                    1.0 + q["p1"][1]
                ) * jnp.sum(ddA * P)
                dtau += q["p2"][0] * dp2[1] + q["p2"][1] * jnp.sum(ddA * Q)
            if need_tau and directed:
                ddvec_dt = (
                    q["p3"][0] * diagdA + q["p3"][1] * diagddA
                    + (q["p6"][0] * cdA + q["p6"][1] * cddA) / n
                    + (q["p6p"][0] * rdA + q["p6p"][1] * rddA) / n
                    + (q["p8"][0] * sdA + q["p8"][1] * sddA) / n**2
                )
                du_dt = (q["p4"][0] * cdA + q["p4"][1] * cddA) / n
                dv_dt = (
                    q["p4p"][0] * rdA + q["p4p"][1] * cddA
                    + q["p5"][0] * cdA + q["p5"][1] * cddA
                    + q["p5p"][0] * rdA + q["p5p"][1] * rddA
                ) / n
            elif need_tau:
                ddvec_dt = (
                    q["p3"][0] * diagdA + q["p3"][1] * diagddA
                    + (q["p6"][0] * rdA + q["p6"][1] * rddA) / n
                    + (q["p8"][0] * sdA + q["p8"][1] * sddA) / n**2
                )
                du_dt = (q["p4"][0] * rdA + q["p4"][1] * rddA) / n
                dv_dt = (q["p5"][0] * rdA + q["p5"][1] * rddA) / n
            if need_tau:
                dtau += jnp.sum(gM_row * ddvec_dt)
                dtau += jnp.sum(du_vec * du_dt)
                dtau += jnp.sum(dv_vec * dv_dt)
                dtau += dc7 * (q["p7"][0] + q["p7"][1]) * sdA / n**2

            # dM: ONE combined-operand matmul covers B1^T g + B2 g, then the
            # rank-structured vector corrections.
            Cop = (
                (1.0 + q["p1"][0]).astype(mm_dtype) * At
                + (1.0 + q["p1"][1]).astype(mm_dtype) * dAt
                + q["p2"][0].astype(mm_dtype) * Ah
                + q["p2"][1].astype(mm_dtype) * dAh
            )
            dM = jnp.dot(Cop, gb, preferred_element_type=jnp.float32)
            utg = jnp.sum(u * g, axis=0, keepdims=True)  # (1, H)
            dM = dM + dvec * g + utg + v * gcol + c7 * gcol

            # Linear: M = zn @ W^T + lin_b.
            dW = jax.lax.dot_general(
                dM, zn, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Hout, Hin)
            dlin_b = jnp.sum(dM, axis=0, keepdims=True)
            dzn = jax.lax.dot_general(
                dM, W, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (n, Hin)

            # RMSNorm: zn = x * inv_rms * normw + normb.
            Hin = dims[l][0]
            dnorm_w = jnp.sum(dzn * x * inv_rms, axis=0, keepdims=True)
            dnorm_b = jnp.sum(dzn, axis=0, keepdims=True)
            h = dzn * normw
            dot_hx = jnp.sum(h * x, axis=1, keepdims=True)
            g = h * inv_rms - x * (inv_rms**3 / Hin) * dot_hx

            grad_refs[5 * l + 0][:] = dnorm_w
            grad_refs[5 * l + 1][:] = dnorm_b
            grad_refs[5 * l + 2][:] = dW
            grad_refs[5 * l + 3][:] = dlin_b
            grad_refs[5 * l + 4][:] = dbasis

        dz_ref[:] = g
        dtau_ref[0, 0] = dtau

    return kernel, nparams


def bwd_call(tau, slices, Z, G, layer_arrays, n, dims, bf16, directed,
             need_tau=True):
    """Invoke the fused backward kernel; returns (dtau, dZ, per-layer grads).

    slices: the 4 (n, n) interval coefficient planes; layer_arrays: the
    megakernel._layer_param_arrays flattening.
    """
    L = len(dims)
    kernel, nparams = _make_bwd_kernel(n, dims, bf16, directed, need_tau)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tau (1, 1)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # d
        pl.BlockSpec(memory_space=pltpu.VMEM),  # c
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # a
        pl.BlockSpec(memory_space=pltpu.VMEM),  # Z
        pl.BlockSpec(memory_space=pltpu.VMEM),  # G
    ]
    operands = [tau.reshape(1, 1).astype(jnp.float32), *slices, Z, G]
    for la in layer_arrays:
        for key in ("norm_w", "norm_b", "W", "lin_b", "basis"):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(la[key])

    out_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # dtau
        pl.BlockSpec(memory_space=pltpu.VMEM),  # dZ
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, dims[0][0]), jnp.float32),
    ]
    for Hin, Hout in dims:
        for shp in ((1, Hin), (1, Hin), (Hout, Hin), (1, Hout), (nparams, 2)):
            out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(shp, jnp.float32))

    outs = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*operands)
    dtau = outs[0][0, 0]
    dZ = outs[1]
    per_layer = [tuple(outs[2 + 5 * l : 7 + 5 * l]) for l in range(L)]
    return dtau, dZ, per_layer


def bwd_call_batched(coeffs, coeffs_batched, idx_b, tau_b, Z_b, G_b,
                     layer_arrays, n, dims, bf16, directed, need_tau=True):
    """Batched fused backward: ONE pallas_call, batch as the leading grid
    dimension, per-element interval planes DMA'd in-kernel by
    scalar-prefetch index maps (mirrors megakernel._forward_batched --
    removes the per-element XLA slice copies the default vmap batching
    makes). Returns (dtau (B,), dZ (B, n, Hin), per-layer grads each
    (B, ...)); the cotangent sum over the batch for the unbatched layer
    params happens outside (the transpose of their broadcast)."""
    from .megakernel import _GridScalar

    d, c, b, a = coeffs
    B = Z_b.shape[0]
    L = len(dims)
    kernel, nparams = _make_bwd_kernel(n, dims, bf16, directed, need_tau)

    def wrapped(idx_sref, tau_sref, d_ref, c_ref, b_ref, a_ref, z_ref, g_ref,
                *rest):
        kernel(_GridScalar(tau_sref), d_ref, c_ref, b_ref, a_ref, z_ref,
               g_ref, *rest)

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
        pl.BlockSpec((None, n, G_b.shape[2]), lambda i, idx, tau: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [d, c, b, a, Z_b, G_b]
    for la in layer_arrays:
        for key in ("norm_w", "norm_b", "W", "lin_b", "basis"):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(la[key])

    out_specs = [
        pl.BlockSpec((None, 1, 1), lambda i, idx, tau: (i, 0, 0),
                     memory_space=pltpu.SMEM),  # dtau
        pl.BlockSpec((None, n, dims[0][0]), lambda i, idx, tau: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # dZ
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, n, dims[0][0]), jnp.float32),
    ]
    for Hin, Hout in dims:
        for shp in ((1, Hin), (1, Hin), (Hout, Hin), (1, Hout), (nparams, 2)):
            out_specs.append(
                pl.BlockSpec((None,) + shp,
                             lambda i, idx, tau: (i,) + (0,) * len(shp),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((B,) + shp, jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(idx_b.astype(jnp.int32), tau_b.astype(jnp.float32), *operands)
    dtau = outs[0][:, 0, 0]
    dZ = outs[1]
    per_layer = [tuple(outs[2 + 5 * l : 7 + 5 * l]) for l in range(L)]
    return dtau, dZ, per_layer


@functools.lru_cache(maxsize=None)
def _fused_bwd(n, dims, bf16, directed, need_tau):
    """custom_vmap-wrapped backward core: under the loss-level batch vmap
    the cotangent computation dispatches to :func:`bwd_call_batched`."""
    import jax.custom_batching

    from .megakernel import _layer_param_arrays  # noqa: F401 (doc anchor)

    def _impl(coeffs, idx, tau, Z, G, layer_arrays):
        slices = [
            jax.lax.dynamic_index_in_dim(p, idx, axis=0, keepdims=False)
            for p in coeffs
        ]
        return bwd_call(tau, slices, Z, G, layer_arrays, n, list(dims), bf16,
                        directed, need_tau=need_tau)

    @jax.custom_batching.custom_vmap
    def fused(coeffs, idx, tau, Z, G, layer_arrays):
        return _impl(coeffs, idx, tau, Z, G, layer_arrays)

    @fused.def_vmap
    def _rule(axis_size, in_batched, coeffs, idx, tau, Z, G, layer_arrays):
        coeff_flags = jax.tree_util.tree_leaves(in_batched[0])
        cb = all(coeff_flags)
        mixed_coeffs = any(coeff_flags) and not cb
        params_batched = any(jax.tree_util.tree_leaves(in_batched[5]))
        out_batched = (True, True, [(True,) * 5 for _ in dims])
        if params_batched or mixed_coeffs:
            axes = jax.tree_util.tree_map(
                lambda bt: 0 if bt else None, in_batched
            )
            out = jax.vmap(_impl, in_axes=tuple(axes))(
                coeffs, idx, tau, Z, G, layer_arrays
            )
            return out, out_batched
        idx_b = idx if in_batched[1] else jnp.broadcast_to(idx, (axis_size,))
        tau_b = tau if in_batched[2] else jnp.broadcast_to(tau, (axis_size,))
        Z_b = Z if in_batched[3] else jnp.broadcast_to(
            Z, (axis_size,) + Z.shape
        )
        G_b = G if in_batched[4] else jnp.broadcast_to(
            G, (axis_size,) + G.shape
        )
        out = bwd_call_batched(coeffs, cb, idx_b, tau_b, Z_b, G_b,
                               layer_arrays, n, list(dims), bf16, directed,
                               need_tau=need_tau)
        return out, out_batched

    return fused


def megakernel_vf_bwd(coeffs, ts, t, Z, vf, g, need_t=True):
    """Full fused cotangent for megakernel_vf_eval: (d_t, d_Z, d_vf).

    d_vf is pulled back into the vector field's pytree structure via
    ``jax.vjp`` of the parameter extraction (exact tangent types, zeros for
    every leaf the kernel doesn't touch, e.g. the directed field's unused
    enc_idx modules).
    """
    from ... import ops as ops_config
    from .megakernel import _interval, _layer_param_arrays

    n = Z.shape[0]
    dims = [
        (l.conv_layer.linear.in_features, l.conv_layer.linear.out_features)
        for l in vf.gnn_layers
    ]
    idx, tau = _interval(ts, t)
    layer_arrays = _layer_param_arrays(vf)
    bf16 = ops_config.get_fusion_precision() == "bf16"
    directed = (
        type(vf.gnn_layers[0]).__name__ == "ConvEquivFusionDirectedLayer"
    )
    # custom_vmap core: unbatched calls slice the interval planes and run
    # the plain kernel; under the loss-level batch vmap the whole cotangent
    # runs as ONE batch-grid pallas_call with in-kernel plane DMA.
    dtau, dZ, per_layer = _fused_bwd(
        n, tuple(dims), bf16, directed, need_t
    )(tuple(coeffs), idx, tau, Z, g, layer_arrays)

    def extract(v):
        out = []
        for layer in v.gnn_layers:
            conv = layer.conv_layer
            out.append(
                (
                    conv.norm.weight,
                    conv.norm.bias,
                    conv.linear.weight,
                    conv.linear.bias,
                    tuple(layer.params),
                )
            )
        return out

    _, pull = jax.vjp(extract, vf)
    cts = []
    for l, (dnw, dnb, dW, dlb, dbasis) in enumerate(per_layer):
        P = dbasis.shape[0]
        cts.append(
            (
                dnw[0].astype(jnp.float32),
                dnb[0].astype(jnp.float32),
                dW,
                dlb[0].astype(jnp.float32),
                tuple(dbasis[i] for i in range(P)),
            )
        )
    (d_vf,) = pull(cts)
    return dtau, dZ, d_vf
