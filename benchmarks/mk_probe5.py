"""Probe 5 (VERDICT r4 item 6): ablation PROFILE of the batch-grid megakernel.

mk_probe4 falsified the guess list: precomputed reductions and dot_general
transposes both LOSE. This probe measures where the 7 us actually goes by
deleting one component at a time (math intentionally wrong -- timing only):

  full        -- production kernel body (baseline)
  no_hermite  -- A := planes a, dA := planes b (drop ~11 n^2 f32 poly ops)
  no_reduce   -- rA/rdA/diag/sums := 1.0 (drop the reduction block)
  no_transpose-- At/dAt := Ah/dAh (drop the 2 in-register transposes)
  no_bbuild   -- B1 := Ah, B2t := dAt (drop 4 n^2 bf16 combines x L)
  no_rowmm    -- rowpart := M (drop L MXU matmuls)
  no_colmm    -- colpart := M (drop the other L MXU matmuls)
  no_norm     -- skip RMSNorm+Linear (drop L small matmuls + VPU norm)
  no_glue     -- feats := rowpart + colpart (drop O(nH) rank-1 glue)
  dma_only    -- out := sum of raw plane casts (everything but the DMA)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, L, B = 400, 32, 3, 16
EVALS = 50
T = 12
_EPS = 1e-6


def make_kernel(n, dims, drop):
    Lk = len(dims)
    mm_dtype = jnp.bfloat16

    def kernel(idx_sref, tau_sref, d_ref, c_ref, b_ref, a_ref, z_ref, *rest):
        del idx_sref
        layer_refs = rest[: 5 * Lk]
        out_ref = rest[5 * Lk]
        bg = pl.program_id(0)
        tau = tau_sref[bg]

        d = d_ref[:].astype(jnp.float32)
        c = c_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        a = a_ref[:].astype(jnp.float32)
        if drop == "dma_only":
            out_ref[:] = (
                jnp.sum(d + c + b + a, axis=1, keepdims=True)
                * jnp.ones((1, dims[-1][1]), jnp.float32)
            )
            return
        if drop == "no_hermite":
            A, dA = a, b
        else:
            A = ((d * tau + c) * tau + b) * tau + a
            dA = (3.0 * d * tau + 2.0 * c) * tau + b

        Ah = A.astype(mm_dtype)
        dAh = dA.astype(mm_dtype)
        if drop == "no_transpose":
            At, dAt = Ah, dAh
        else:
            At = A.T.astype(mm_dtype)
            dAt = dA.T.astype(mm_dtype)

        if drop == "no_reduce":
            rA = rdA = diagA = diagdA = jnp.ones((n, 1), jnp.float32)
            sA = sdA = 1.0
        else:
            rA = jnp.sum(A, axis=1, keepdims=True)
            rdA = jnp.sum(dA, axis=1, keepdims=True)
            sA = jnp.sum(rA)
            sdA = jnp.sum(rdA)
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            eye = rows == cols
            diagA = jnp.sum(jnp.where(eye, A, 0.0), axis=1, keepdims=True)
            diagdA = jnp.sum(jnp.where(eye, dA, 0.0), axis=1, keepdims=True)

        feats = z_ref[:]
        for l in range(Lk):
            normw = layer_refs[5 * l + 0][:]
            normb = layer_refs[5 * l + 1][:]
            W = layer_refs[5 * l + 2][:]
            lin_b = layer_refs[5 * l + 3][:]
            p = layer_refs[5 * l + 4]
            p1, p2, p3 = p[0], p[1], p[2]
            p4, p5, p6, p7, p8 = p[3], p[4], p[5], p[6], p[7]

            if drop == "no_norm":
                M = feats
            else:
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
                )
            b1_0 = (1.0 + p1[0]).astype(mm_dtype)
            b1_1 = (1.0 + p1[1]).astype(mm_dtype)
            b2_0 = p2[0].astype(mm_dtype)
            b2_1 = p2[1].astype(mm_dtype)
            if drop == "no_bbuild":
                B1, B2t = Ah, dAt
            else:
                B1 = b1_0 * Ah + b1_1 * dAh
                B2t = b2_0 * At + b2_1 * dAt
            Mh = M.astype(mm_dtype)
            if drop == "no_rowmm":
                rowpart = M
            else:
                rowpart = jnp.dot(B1, Mh, preferred_element_type=jnp.float32)
            if drop == "no_colmm":
                colpart = M
            else:
                colpart = jnp.dot(B2t, Mh, preferred_element_type=jnp.float32)
            if drop == "no_glue":
                feats = rowpart + colpart
            else:
                dvec = (
                    p3[0] * diagA
                    + p3[1] * diagdA
                    + (p6[0] * rA + p6[1] * rdA) / n
                    + (p8[0] * sA + p8[1] * sdA) / n**2
                    + 1.0
                )
                u = (p4[0] * rA + p4[1] * rdA) / n
                v = (p5[0] * rA + p5[1] * rdA) / n
                c7 = (p7[0] + p7[1]) * sA / n**2
                s = jnp.sum(M, axis=0, keepdims=True)
                w = jnp.sum(v * M, axis=0, keepdims=True)
                feats = rowpart + colpart + dvec * M + u * s + (w + c7 * s)
            if l < Lk - 1:
                feats = jnp.maximum(feats, 0.0)

        out_ref[:] = feats

    return kernel


def main():
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.ops.pallas.megakernel import _layer_param_arrays, _interval
    from gncde_tpu.interp import backward_hermite_coefficients

    key = jr.PRNGKey(0)
    k_vf, k_A, k_y = jr.split(key, 3)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=N, key=k_vf,
    )
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(k_A, (B, T, N, N)) * 0.1
    coeffs = jax.vmap(
        lambda x: tuple(
            cc.astype(jnp.bfloat16)
            for cc in backward_hermite_coefficients(ts, x)
        )
    )(A_path)
    y0 = jr.normal(k_y, (B, N, H)) * 0.1
    dims = [(H, H)] * L
    layer_arrays = _layer_param_arrays(vf)
    eval_ts = jnp.linspace(0.01, 0.99, EVALS)

    def bg_call(coeffs_b, idx_b, tau_b, Z_b, drop):
        d, c, b, a = coeffs_b
        kernel = make_kernel(N, dims, drop)
        plane_spec = pl.BlockSpec(
            (None, None, N, N), lambda i, idx, tau: (i, idx[i], 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [plane_spec] * 4 + [
            pl.BlockSpec((None, N, H), lambda i, idx, tau: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [d, c, b, a, Z_b]
        for la in layer_arrays:
            for k2 in ("norm_w", "norm_b", "W", "lin_b", "basis"):
                in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                operands.append(la[k2])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((None, N, H), lambda i, idx, tau: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, N, H), jnp.float32),
        )(idx_b.astype(jnp.int32), tau_b.astype(jnp.float32), *operands)

    def make_run(drop):
        def run(coeffs_b, y0_b):
            def body(Y, t):
                idx, tau = _interval(ts, t)
                idx_b = jnp.full((B,), idx, jnp.int32)
                tau_b = jnp.full((B,), tau, jnp.float32)
                out = bg_call(coeffs_b, idx_b, tau_b, Y, drop)
                return Y + 1e-3 * out, None
            Y_fin, _ = jax.lax.scan(body, y0_b, eval_ts)
            return Y_fin
        return run

    def log(msg):
        print(msg, flush=True)
        with open("/tmp/mk_probe5.log", "a") as fh:
            fh.write(msg + "\n")

    drops = ["full", "no_hermite", "no_reduce", "no_transpose", "no_bbuild",
             "no_rowmm", "no_colmm", "no_norm", "no_glue", "dma_only"]
    base = None
    for drop in drops:
        try:
            f = jax.jit(make_run(drop))
            out = f(coeffs, y0)
            out.block_until_ready()

            def timed(reps_n):
                t0 = time.perf_counter()
                o = None
                for _ in range(reps_n):
                    o = f(coeffs, y0)
                float(o[0, 0, 0])
                return time.perf_counter() - t0
            timed(2)
            t1, t2 = timed(5), timed(25)
            dt = (t2 - t1) / 20
            per_eval = dt / (B * EVALS)
            delta = "" if base is None else f"  (saves {(base - dt)*1e3:.2f} ms)"
            if base is None:
                base = dt
            log(f"{drop}: {dt*1e3:.2f} ms/run, {per_eval*1e6:.2f} us/eval{delta}")
        except Exception as e:
            log(f"{drop}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
