"""Probe: Mosaic lowering + timing of megakernel restructure candidates.

Compares, at the flagship shape (n=400, H=32, L=3, B=16):
  (a) current production megakernel forward
  (b) restructured kernel: no transposes, no per-layer B1/B2 construction;
      4 dot_generals per layer (axis-1 and axis-0 contractions) + (n,H)
      combines; MXU column sums via ones-matvec.
Run on TPU: python benchmarks/mk_probe.py
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
_EPS = 1e-6


def make_restructured_kernel(n, dims, bf16=True):
    Lk = len(dims)
    mm = jnp.bfloat16 if bf16 else jnp.float32

    def kernel(tau_ref, d_ref, c_ref, b_ref, a_ref, z_ref, *rest):
        layer_refs = rest[: 5 * Lk]
        out_ref = rest[5 * Lk]
        tau = tau_ref[0, 0]
        d = d_ref[:].astype(jnp.float32)
        c = c_ref[:].astype(jnp.float32)
        b = b_ref[:].astype(jnp.float32)
        a = a_ref[:].astype(jnp.float32)
        A = ((d * tau + c) * tau + b) * tau + a
        dA = (3.0 * d * tau + 2.0 * c) * tau + b
        Ah = A.astype(mm)
        dAh = dA.astype(mm)

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
            p1, p2, p3, p4, p5, p6, p7, p8 = (p[i] for i in range(8))

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
            Mh = M.astype(mm)
            AM = jnp.dot(Ah, Mh, preferred_element_type=jnp.float32)
            dAM = jnp.dot(dAh, Mh, preferred_element_type=jnp.float32)
            AtM = jax.lax.dot_general(
                Ah, Mh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dAtM = jax.lax.dot_general(
                dAh, Mh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rowpart = (1.0 + p1[0]) * AM + (1.0 + p1[1]) * dAM
            colpart = p2[0] * AtM + p2[1] * dAtM
            dvec = (
                p3[0] * diagA + p3[1] * diagdA
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


def restructured_forward(slices, tau, Z, layer_arrays, n, dims):
    kernel = make_restructured_kernel(n, dims)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ] * (5 + 5 * len(dims))
    operands = [tau.reshape(1, 1).astype(jnp.float32), *slices, Z]
    for la in layer_arrays:
        for key in ("norm_w", "norm_b", "W", "lin_b", "basis"):
            operands.append(la[key])
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, dims[-1][1]), jnp.float32),
    )(*operands)


def main():
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.ops.pallas.megakernel import (
        _layer_param_arrays, _forward, _interval,
    )
    from gncde_tpu.interp import backward_hermite_coefficients
    from gncde_tpu import ops as ops_cfg

    ops_cfg.set_fusion_precision("bf16")
    key = jr.PRNGKey(0)
    k_vf, k_A, k_y = jr.split(key, 3)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=N, key=k_vf,
    )
    T = 12
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

    def run_current(coeffs_b, y0_b):
        def one(coeffs_i, y0_i):
            def body(y, t):
                idx, tau = _interval(ts, t)
                out = _forward(coeffs_i, idx, tau, y, layer_arrays, N, dims, True)
                return y + 1e-3 * out, None
            y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
            return y_fin
        return jax.vmap(one)(coeffs_b, y0_b)

    def run_restruct(coeffs_b, y0_b):
        def one(coeffs_i, y0_i):
            def body(y, t):
                idx, tau = _interval(ts, t)
                slices = [
                    jax.lax.dynamic_index_in_dim(p, idx, axis=0, keepdims=False)
                    for p in coeffs_i
                ]
                out = restructured_forward(slices, tau, y, layer_arrays, N, dims)
                return y + 1e-3 * out, None
            y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
            return y_fin
        return jax.vmap(one)(coeffs_b, y0_b)

    for name, fn in [("current", run_current), ("restructured", run_restruct)]:
        f = jax.jit(fn)
        out = f(coeffs, y0)
        out.block_until_ready()
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = f(coeffs, y0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        per_eval = dt / (B * EVALS)
        print(f"{name}: {dt*1e3:.2f} ms/run, {per_eval*1e6:.2f} us/eval, "
              f"{N*N*L/per_eval/1e9:.1f} Gedges/s")
    # parity
    a = jax.jit(run_current)(coeffs, y0)
    b2 = jax.jit(run_restruct)(coeffs, y0)
    import numpy as np
    dev = float(jnp.max(jnp.abs(a - b2)) / jnp.max(jnp.abs(a)))
    print("rel dev current vs restructured:", dev)


if __name__ == "__main__":
    main()
