"""Probe 6 (VERDICT r4 item 6): candidate restructures, profile-guided.

mk_probe5's ablation profile (marginal method, us/eval): DMA+call floor 3.04,
B1/B2^T builds ~1.0, norm chain ~0.75, Hermite ~0.6, reductions ~0.5,
transposes ~0.2, MXU matmuls ~0.2-0.4. The biggest compute item is the
per-layer operand builds -- linear combinations the matmul can absorb:

    B1_l @ M_l = a_l (A @ M_l) + b_l (dA @ M_l)

so 4 plain matmuls per layer (A/dA x row/col side) + O(nH) scalar combines
replace the 4 n^2-op combines per layer. (A restructure like this measured
slower in round 4 -- BEFORE the batch-grid arrangement; re-probed here.)

Variants:
  full      -- production kernel body (baseline)
  v4mm      -- 4 matmuls/layer, hoisted transposes for the col side
  v4mm_mt   -- 4 matmuls/layer, col side via (M^T @ A)^T (no n^2 transposes;
               two small (n,H) relayouts per layer instead)
  v4mm_bf16 -- v4mm + Hermite evaluated in bf16 (casts dropped; reductions
               still accumulated f32)
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


def make_kernel(n, dims, variant):
    Lk = len(dims)
    mm_dtype = jnp.bfloat16

    def kernel(idx_sref, tau_sref, d_ref, c_ref, b_ref, a_ref, z_ref, *rest):
        del idx_sref
        layer_refs = rest[: 5 * Lk]
        out_ref = rest[5 * Lk]
        bg = pl.program_id(0)
        tau = tau_sref[bg]

        if variant == "v4mm_bf16":
            d = d_ref[:]
            c = c_ref[:]
            b = b_ref[:]
            a = a_ref[:]
            taub = tau.astype(jnp.bfloat16)
            Ah = ((d * taub + c) * taub + b) * taub + a
            dAh = (3.0 * d * taub + 2.0 * c) * taub + b
            A = Ah.astype(jnp.float32)
            dA = dAh.astype(jnp.float32)
        else:
            d = d_ref[:].astype(jnp.float32)
            c = c_ref[:].astype(jnp.float32)
            b = b_ref[:].astype(jnp.float32)
            a = a_ref[:].astype(jnp.float32)
            A = ((d * tau + c) * tau + b) * tau + a
            dA = (3.0 * d * tau + 2.0 * c) * tau + b
            Ah = A.astype(mm_dtype)
            dAh = dA.astype(mm_dtype)
        if variant in ("full", "v4mm"):
            At = A.T.astype(mm_dtype)
            dAt = dA.T.astype(mm_dtype)

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
            Mh = M.astype(mm_dtype)
            if variant == "full":
                b1_0 = (1.0 + p1[0]).astype(mm_dtype)
                b1_1 = (1.0 + p1[1]).astype(mm_dtype)
                b2_0 = p2[0].astype(mm_dtype)
                b2_1 = p2[1].astype(mm_dtype)
                B1 = b1_0 * Ah + b1_1 * dAh
                B2t = b2_0 * At + b2_1 * dAt
                rowpart = jnp.dot(B1, Mh, preferred_element_type=jnp.float32)
                colpart = jnp.dot(B2t, Mh, preferred_element_type=jnp.float32)
            else:
                AM = jnp.dot(Ah, Mh, preferred_element_type=jnp.float32)
                dAM = jnp.dot(dAh, Mh, preferred_element_type=jnp.float32)
                if variant == "v4mm_mt":
                    Mt = Mh.T
                    AtM = jnp.dot(Mt, Ah, preferred_element_type=jnp.float32).T
                    dAtM = jnp.dot(Mt, dAh,
                                   preferred_element_type=jnp.float32).T
                else:
                    AtM = jnp.dot(At, Mh, preferred_element_type=jnp.float32)
                    dAtM = jnp.dot(dAt, Mh, preferred_element_type=jnp.float32)
                rowpart = (1.0 + p1[0]) * AM + (1.0 + p1[1]) * dAM
                colpart = p2[0] * AtM + p2[1] * dAtM
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

    def bg_call(coeffs_b, idx_b, tau_b, Z_b, variant):
        d, c, b, a = coeffs_b
        kernel = make_kernel(N, dims, variant)
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

    def make_run(variant):
        def run(coeffs_b, y0_b):
            def body(Y, t):
                idx, tau = _interval(ts, t)
                idx_b = jnp.full((B,), idx, jnp.int32)
                tau_b = jnp.full((B,), tau, jnp.float32)
                out = bg_call(coeffs_b, idx_b, tau_b, Y, variant)
                return Y + 1e-3 * out, None
            Y_fin, _ = jax.lax.scan(body, y0_b, eval_ts)
            return Y_fin
        return run

    def log(msg):
        print(msg, flush=True)
        with open("/tmp/mk_probe6.log", "a") as fh:
            fh.write(msg + "\n")

    outs = {}
    for variant in ["full", "v4mm", "v4mm_mt", "v4mm_bf16"]:
        try:
            f = jax.jit(make_run(variant))
            out = f(coeffs, y0)
            out.block_until_ready()
            outs[variant] = out

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
            # block-method companion (bench.py's arrangement)
            t0 = time.perf_counter()
            for _ in range(20):
                o = f(coeffs, y0)
            o.block_until_ready()
            dtb = (time.perf_counter() - t0) / 20
            per_eval = dt / (B * EVALS)
            log(f"{variant}: {dt*1e3:.2f} ms/run marg ({dtb*1e3:.2f} block), "
                f"{per_eval*1e6:.2f} us/eval, "
                f"{N*N*L/per_eval/1e9:.1f} Gedges/s")
        except Exception as e:
            log(f"{variant}: FAILED {type(e).__name__}: {str(e)[:300]}")

    base = outs.get("full")
    if base is not None:
        for name, o in outs.items():
            if name == "full":
                continue
            dev = float(jnp.max(jnp.abs(base - o)) / jnp.max(jnp.abs(base)))
            log(f"rel dev full vs {name}: {dev:.3e}")


if __name__ == "__main__":
    main()
