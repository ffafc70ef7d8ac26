"""Probe 7 (VERDICT r4 item 6): fused Tsit5 STEP kernel.

mk_probe5's decomposition: per-eval cost = ~1.2 us launch overhead + ~1.6 us
plane DMA + ~2.4 us serial compute, with NO DMA/compute overlap (full ==
dma_only + sum(compute parts) to within noise). Launch + DMA are per-CALL
costs -- and a Tsit5 step makes 6 back-to-back calls whose stages almost
always share one interval's planes. Fusing the whole RK step into ONE
pallas_call with grid=(B, 6 stages) + a VMEM k-scratch:

  * launch overhead /6
  * plane DMA: Mosaic skips the copy when the block index map repeats
    (consecutive stages, same element, same interval) -> ~1 DMA per step
  * stage combinations (y + h sum a_ij k_j) move from XLA glue into the
    kernel (VPU O(nH))

Variants (n=400, H=32, L=3, B=16, 10 chained steps = 60 evals):
  seq       -- production arrangement: 6 batch-grid eval calls + XLA combos
  fusedstep -- ONE call per step, grid (B, S), k's in VMEM scratch
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, L, B = 400, 32, 3, 16
STEPS = 10
T = 12
_EPS = 1e-6
S = 6  # Tsit5 evaluated stages per step (stage 0 is FSAL)


def _eval_body(n, dims, tau, d, c, b, a, feats, layer_refs):
    """The production megakernel eval body (undirected, bf16 MXU operands)."""
    Lk = len(dims)
    mm_dtype = jnp.bfloat16
    A = ((d * tau + c) * tau + b) * tau + a
    dA = (3.0 * d * tau + 2.0 * c) * tau + b
    Ah = A.astype(mm_dtype)
    dAh = dA.astype(mm_dtype)
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
                zn, W, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + lin_b
        )
        b1_0 = (1.0 + p1[0]).astype(mm_dtype)
        b1_1 = (1.0 + p1[1]).astype(mm_dtype)
        b2_0 = p2[0].astype(mm_dtype)
        b2_1 = p2[1].astype(mm_dtype)
        B1 = b1_0 * Ah + b1_1 * dAh
        B2t = b2_0 * At + b2_1 * dAt
        Mh = M.astype(mm_dtype)
        rowpart = jnp.dot(B1, Mh, preferred_element_type=jnp.float32)
        colpart = jnp.dot(B2t, Mh, preferred_element_type=jnp.float32)
        dvec = (
            p3[0] * diagA + p3[1] * diagdA
            + (p6[0] * rA + p6[1] * rdA) / n
            + (p8[0] * sA + p8[1] * sdA) / n**2
            + 1.0
        )
        u = (p4[0] * rA + p4[1] * rdA) / n
        v = (p5[0] * rA + p5[1] * rdA) / n
        c7 = (p7[0] + p7[1]) * sA / n**2
        s_ = jnp.sum(M, axis=0, keepdims=True)
        w = jnp.sum(v * M, axis=0, keepdims=True)
        feats = rowpart + colpart + dvec * M + u * s_ + (w + c7 * s_)
        if l < Lk - 1:
            feats = jnp.maximum(feats, 0.0)
    return feats


def main():
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.ops.pallas.megakernel import (
        _layer_param_arrays, _interval, _forward,
    )
    from gncde_tpu.interp import backward_hermite_coefficients
    from gncde_tpu.solve.tableaus import TSIT5
    from gncde_tpu import ops as ops_cfg

    ops_cfg.set_fusion_precision("bf16")
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

    tab = TSIT5
    # static stage matrices (numpy, folded into the kernels)
    A_mat = np.zeros((S, S + 1), np.float32)  # row s: weights of [f0, k1..k6]
    for srow in range(S):
        arow = tab.a[srow + 1]
        for j, aij in enumerate(arow):
            A_mat[srow, j] = aij
    C_vec = np.asarray(tab.c[1:], np.float32)  # (6,)
    BERR = np.asarray(tab.b_err, np.float32)  # (7,)

    h_fixed = 0.9 / STEPS
    t_grid = jnp.arange(STEPS) * h_fixed + 0.02

    # ---- seq: production per-eval kernels + XLA stage combos --------------
    def step_seq(coeffs_b, t, h, Y, F0):
        ks = [F0]
        for srow in range(S):
            acc = None
            for j, aij in enumerate(A_mat[srow]):
                if aij == 0.0 or j >= len(ks):
                    continue
                term = float(aij) * ks[j]
                acc = term if acc is None else acc + term
            Yi = Y if acc is None else Y + h * acc
            ti = t + float(C_vec[srow]) * h
            idx, tau = _interval(ts, ti)
            out = jax.vmap(
                lambda cf, z: _forward(cf, idx, tau, z, layer_arrays, N,
                                       dims, True)
            )(coeffs_b, Yi)
            ks.append(out)
        y1 = ks[S]  # a[6] == b for Tsit5 => stage-6 input IS y1; but the
        # stage list here stores k's, so recompute y1 from b:
        acc = None
        for i, bi in enumerate(tab.b):
            if bi == 0.0:
                continue
            term = float(bi) * ks[i]
            acc = term if acc is None else acc + term
        y1 = Y + h * acc
        eacc = None
        for i, bi in enumerate(BERR):
            if bi == 0.0:
                continue
            term = float(bi) * ks[i]
            eacc = term if eacc is None else eacc + term
        err = h * eacc
        f1 = ks[S]
        return y1, err, f1

    def run_seq(coeffs_b, y0_b):
        f0 = jax.vmap(
            lambda cf, z: _forward(
                cf, *_interval(ts, t_grid[0]), z, layer_arrays, N, dims, True)
        )(coeffs_b, y0_b)

        def body(carry, t):
            Y, F0 = carry
            y1, err, f1 = step_seq(coeffs_b, t, h_fixed, Y, F0)
            return (y1 + 0.0 * jnp.sum(err), f1), None
        (Y_fin, _), _ = jax.lax.scan(body, (y0_b, f0), t_grid)
        return Y_fin

    # ---- fusedstep --------------------------------------------------------
    def make_step_kernel():
        def kernel(idx_sref, tau_sref, h_sref, amat_ref, berr_ref,
                   d_ref, c_ref, b_ref, a_ref, y_ref, f0_ref, *rest):
            layer_refs = rest[: 5 * L]
            y1_ref = rest[5 * L]
            err_ref = rest[5 * L + 1]
            f1_ref = rest[5 * L + 2]
            ks_ref = rest[5 * L + 3]
            i = pl.program_id(0)
            s = pl.program_id(1)
            tau = tau_sref[i, s]
            h = h_sref[i]

            @pl.when(s == 0)
            def _():
                ks_ref[...] = jnp.zeros_like(ks_ref)

            f0 = f0_ref[:]
            y = y_ref[:]
            acc = amat_ref[s, 0] * f0
            for j in range(1, S):
                acc = acc + amat_ref[s, j] * ks_ref[j - 1]
            Yi = y + h * acc

            d = d_ref[:].astype(jnp.float32)
            c = c_ref[:].astype(jnp.float32)
            b = b_ref[:].astype(jnp.float32)
            a = a_ref[:].astype(jnp.float32)
            k = _eval_body(N, dims, tau, d, c, b, a, Yi, layer_refs)
            ks_ref[s] = k

            @pl.when(s == S - 1)
            def _():
                y1 = Yi  # Tsit5: a[6] == b, so the last stage input IS y1
                y1_ref[:] = y1
                f1_ref[:] = k
                eacc = berr_ref[0] * f0
                for j in range(1, S):
                    eacc = eacc + berr_ref[j] * ks_ref[j - 1]
                eacc = eacc + berr_ref[S] * k
                err_ref[:] = h * eacc

        return kernel

    def fused_step_call(coeffs_b, idx_bs, tau_bs, h_b, Y, F0):
        d, c, b, a = coeffs_b
        kernel = make_step_kernel()
        plane_spec = pl.BlockSpec(
            (None, None, N, N),
            lambda i, s, idx, tau, h, am, be: (i, idx[i, s], 0, 0),
            memory_space=pltpu.VMEM,
        )
        nh_spec = pl.BlockSpec((None, N, H),
                               lambda i, s, idx, tau, h, am, be: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs = [plane_spec] * 4 + [nh_spec, nh_spec]
        operands = [d, c, b, a, Y, F0]
        for la in layer_arrays:
            for k2 in ("norm_w", "norm_b", "W", "lin_b", "basis"):
                in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                operands.append(la[k2])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B, S),
            in_specs=in_specs,
            out_specs=[nh_spec, nh_spec, nh_spec],
            scratch_shapes=[pltpu.VMEM((S, N, H), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, N, H), jnp.float32)] * 3,
        )(idx_bs.astype(jnp.int32), tau_bs.astype(jnp.float32),
          h_b.astype(jnp.float32), jnp.asarray(A_mat), jnp.asarray(BERR),
          *operands)

    def run_fused(coeffs_b, y0_b):
        f0 = jax.vmap(
            lambda cf, z: _forward(
                cf, *_interval(ts, t_grid[0]), z, layer_arrays, N, dims, True)
        )(coeffs_b, y0_b)

        def body(carry, t):
            Y, F0 = carry
            t_stages = t + jnp.asarray(C_vec) * h_fixed  # (6,)
            iv = jax.vmap(lambda tt: jnp.stack(_interval(ts, tt)))(t_stages)
            idx_s = iv[:, 0].astype(jnp.int32)
            tau_s = iv[:, 1]
            idx_bs = jnp.broadcast_to(idx_s[None], (B, S))
            tau_bs = jnp.broadcast_to(tau_s[None], (B, S))
            h_b = jnp.full((B,), h_fixed, jnp.float32)
            y1, err, f1 = fused_step_call(coeffs_b, idx_bs, tau_bs, h_b, Y, F0)
            return (y1 + 0.0 * jnp.sum(err), f1), None
        (Y_fin, _), _ = jax.lax.scan(body, (y0_b, f0), t_grid)
        return Y_fin

    def log(msg):
        print(msg, flush=True)
        with open("/tmp/mk_probe7.log", "a") as fh:
            fh.write(msg + "\n")

    outs = {}
    for name, fn in [("seq", run_seq), ("fusedstep", run_fused)]:
        try:
            f = jax.jit(fn)
            out = f(coeffs, y0)
            out.block_until_ready()
            outs[name] = out

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
            evals = B * STEPS * S
            log(f"{name}: {dt*1e3:.2f} ms/run, {dt/evals*1e6:.2f} us/eval, "
                f"{dt/(B*STEPS)*1e6:.1f} us/step/elem")
        except Exception as e:
            import traceback
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:800]}")
            traceback.print_exc()

    if "seq" in outs and "fusedstep" in outs:
        aa, bb = outs["seq"], outs["fusedstep"]
        dev = float(jnp.max(jnp.abs(aa - bb)) / jnp.max(jnp.abs(aa)))
        log(f"rel dev seq vs fusedstep: {dev:.3e}")


if __name__ == "__main__":
    main()
