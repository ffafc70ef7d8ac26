"""Probe 4 (VERDICT r4 item 6): attack the VPU-bound megakernel compute.

mk_probe2 established the batch-grid kernel is VPU-bound: 6.38 us kernel-only
vs ~1.6 us/plane-pass HBM speed of light at the flagship shape. The in-kernel
VPU budget is roughly (n^2 lanewise ops):

    Hermite A/dA eval            ~11   (f32)
    iota x2 + eye + diag masks    ~8   (int + f32; diagA/diagdA)
    row sums rA/rdA               ~2
    casts Ah/dAh                  ~2   + 2 in-register transposes (relayouts)
    per-layer B1/B2^T builds      ~4 x L = 12
    final combines                O(nH)

Variants (n=400, H=32, L=3, B=16, 50 chained evals, batch-grid arrangement):
  current   -- production kernel (in-kernel reductions, hoisted transposes)
  red       -- reductions PRECOMPUTED outside: row/diag sums commute with the
               Hermite evaluation (tiled.cubic_plane_reductions already
               exploits this for n>640), so the kernel receives an (n, 4)
               [rA, rdA, diagA, diagdA] operand and drops the iota/eye/diag/
               rowsum block (~10 n^2 ops -> O(n)).
  notr      -- column part via dot_general contracting dim 0 (B2 built from
               the untransposed planes; no At/dAt relayouts).
  red_notr  -- both.

Timing: marginal-cost method (PERFORMANCE.md round-5 timing note) PLUS the
chained-scan array block that cross-validated clean on forward programs.
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


def make_kernel(n, dims, use_red, no_tr):
    Lk = len(dims)
    mm_dtype = jnp.bfloat16

    def kernel(idx_sref, tau_sref, d_ref, c_ref, b_ref, a_ref, z_ref, *rest):
        del idx_sref  # consumed by the index maps
        off = 0
        if use_red:
            rvec_ref = rest[0]
            off = 1
        layer_refs = rest[off: off + 5 * Lk]
        out_ref = rest[off + 5 * Lk]
        bg = pl.program_id(0)
        tau = tau_sref[bg]

        d = d_ref[:].astype(jnp.float32)
        c = c_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        a = a_ref[:].astype(jnp.float32)
        A = ((d * tau + c) * tau + b) * tau + a
        dA = (3.0 * d * tau + 2.0 * c) * tau + b

        Ah = A.astype(mm_dtype)
        dAh = dA.astype(mm_dtype)
        if not no_tr:
            At = A.T.astype(mm_dtype)
            dAt = dA.T.astype(mm_dtype)

        if use_red:
            rvec = rvec_ref[:]  # (n, 4) f32: rA, rdA, diagA, diagdA
            rA = rvec[:, 0:1]
            rdA = rvec[:, 1:2]
            diagA = rvec[:, 2:3]
            diagdA = rvec[:, 3:4]
            sA = jnp.sum(rA)
            sdA = jnp.sum(rdA)
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
            B1 = b1_0 * Ah + b1_1 * dAh
            Mh = M.astype(mm_dtype)
            rowpart = jnp.dot(B1, Mh, preferred_element_type=jnp.float32)
            if no_tr:
                B2 = b2_0 * Ah + b2_1 * dAh
                colpart = jax.lax.dot_general(
                    B2, Mh,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                B2t = b2_0 * At + b2_1 * dAt
                colpart = jnp.dot(B2t, Mh, preferred_element_type=jnp.float32)
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
    from gncde_tpu.ops.pallas.tiled import (
        cubic_plane_reductions, hermite_weights,
    )
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

    red_b = jax.vmap(lambda cs: cubic_plane_reductions(cs))(coeffs)

    def bg_call(coeffs_b, idx_b, tau_b, Z_b, rvec_b, use_red, no_tr):
        d, c, b, a = coeffs_b
        kernel = make_kernel(N, dims, use_red, no_tr)

        plane_spec = pl.BlockSpec(
            (None, None, N, N), lambda i, idx, tau: (i, idx[i], 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [plane_spec] * 4 + [
            pl.BlockSpec((None, N, H), lambda i, idx, tau: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [d, c, b, a, Z_b]
        if use_red:
            in_specs.append(
                pl.BlockSpec((None, N, 4), lambda i, idx, tau: (i, 0, 0),
                             memory_space=pltpu.VMEM))
            operands.append(rvec_b)
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

    def make_run(use_red, no_tr):
        def run(coeffs_b, y0_b):
            def body(Y, t):
                idx, tau = _interval(ts, t)
                idx_b = jnp.full((B,), idx, jnp.int32)
                tau_b = jnp.full((B,), tau, jnp.float32)
                if use_red:
                    wA, wdA = hermite_weights(tau)
                    rs_i = jax.lax.dynamic_index_in_dim(
                        red_b.rs, idx, axis=1, keepdims=False)  # (B, N, 4)
                    dg_i = jax.lax.dynamic_index_in_dim(
                        red_b.dg, idx, axis=1, keepdims=False)
                    rvec = jnp.stack(
                        [rs_i @ wA, rs_i @ wdA, dg_i @ wA, dg_i @ wdA],
                        axis=-1)  # (B, N, 4) f32
                else:
                    rvec = None
                out = bg_call(coeffs_b, idx_b, tau_b, Y, rvec, use_red, no_tr)
                return Y + 1e-3 * out, None
            Y_fin, _ = jax.lax.scan(body, y0_b, eval_ts)
            return Y_fin
        return run

    def log(msg):
        print(msg, flush=True)
        with open("/tmp/mk_probe4.log", "a") as fh:
            fh.write(msg + "\n")

    variants = [
        ("current", make_run(False, False)),
        ("red", make_run(True, False)),
        ("notr", make_run(False, True)),
        ("red_notr", make_run(True, True)),
    ]
    outs = {}
    for name, fn in variants:
        try:
            f = jax.jit(fn)
            out = f(coeffs, y0)
            out.block_until_ready()
            outs[name] = out
            # chained-scan array-block timing
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                out = f(coeffs, y0)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            # marginal cross-check: N1 vs N2 enqueued, forced scalar fetch
            def timed(reps_n):
                t0 = time.perf_counter()
                o = None
                for _ in range(reps_n):
                    o = f(coeffs, y0)
                float(o[0, 0, 0])
                return time.perf_counter() - t0
            timed(2)
            t1, t2 = timed(5), timed(25)
            dt_marg = (t2 - t1) / 20
            per_eval = dt / (B * EVALS)
            log(f"{name}: {dt*1e3:.2f} ms/run (marg {dt_marg*1e3:.2f}), "
                f"{per_eval*1e6:.2f} us/eval, "
                f"{N*N*L/per_eval/1e9:.1f} Gedges/s")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:500]}")

    base = outs.get("current")
    if base is not None:
        for name, o in outs.items():
            if name == "current":
                continue
            dev = float(jnp.max(jnp.abs(base - o)) / jnp.max(jnp.abs(base)))
            log(f"rel dev current vs {name}: {dev:.3e}")


if __name__ == "__main__":
    main()
