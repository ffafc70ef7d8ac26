"""Probe 2: isolate megakernel cost components at the flagship shape.

Variants (n=400, H=32, L=3, B=16, 50 chained evals):
  current     -- production path: XLA dynamic-slice 4 planes + whole-VMEM kernel
  fixedslice  -- same kernel, slices precomputed once (isolates kernel compute)
  batchgrid   -- ONE pallas_call, grid=(B,), scalar-prefetch per-element idx,
                 in-kernel DMA of each element's interval planes (no XLA copy)
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


def main():
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.ops.pallas.megakernel import (
        _layer_param_arrays, _forward, _interval, _make_kernel,
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

    # ---- current ----------------------------------------------------------
    def run_current(coeffs_b, y0_b):
        def one(coeffs_i, y0_i):
            def body(y, t):
                idx, tau = _interval(ts, t)
                out = _forward(coeffs_i, idx, tau, y, layer_arrays, N, dims, True)
                return y + 1e-3 * out, None
            y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
            return y_fin
        return jax.vmap(one)(coeffs_b, y0_b)

    # ---- fixedslice: kernel compute only ----------------------------------
    kernel = _make_kernel(N, dims, True)

    def call_kernel(slices, tau, Z):
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
        ] * (5 + 5 * L)
        operands = [tau.reshape(1, 1).astype(jnp.float32), *slices, Z]
        for la in layer_arrays:
            for k2 in ("norm_w", "norm_b", "W", "lin_b", "basis"):
                operands.append(la[k2])
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, H), jnp.float32),
        )(*operands)

    def run_fixedslice(coeffs_b, y0_b):
        slices_b = [c[:, 3] for c in coeffs_b]  # one fixed plane per element

        def one(slices_i, y0_i):
            def body(y, t):
                _, tau = _interval(ts, t)
                out = call_kernel(slices_i, tau, y)
                return y + 1e-3 * out, None
            y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
            return y_fin
        return jax.vmap(one)(list(zip(*[list(s) for s in [slices_b]]))[0] if False else slices_b, y0_b)

    # ---- batchgrid: scalar-prefetch in-kernel DMA -------------------------
    mk_kernel = _make_kernel(N, dims, True)

    def bg_call(coeffs_b, idx_b, tau_b, Z_b):
        d, c, b, a = coeffs_b  # each (B, T-1, N, N)

        def wrapped(idx_sref, tau_sref, d_ref, c_ref, b_ref, a_ref, z_ref,
                    *rest):
            bg = pl.program_id(0)

            class SR:
                def __getitem__(self, _):
                    return tau_sref[bg]

            mk_kernel(SR(), d_ref, c_ref, b_ref, a_ref, z_ref, *rest)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # idx_b (B,), tau_b (B,)
            grid=(B,),
            in_specs=[
                pl.BlockSpec((None, None, N, N),
                             lambda i, idx, tau: (i, idx[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, N, N),
                             lambda i, idx, tau: (i, idx[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, N, N),
                             lambda i, idx, tau: (i, idx[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, N, N),
                             lambda i, idx, tau: (i, idx[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, N, H), lambda i, idx, tau: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(memory_space=pltpu.VMEM)
            ] * (5 * L),
            out_specs=pl.BlockSpec((None, N, H), lambda i, idx, tau: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        operands = [d, c, b, a, Z_b]
        for la in layer_arrays:
            for k2 in ("norm_w", "norm_b", "W", "lin_b", "basis"):
                operands.append(la[k2])
        return pl.pallas_call(
            wrapped,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, N, H), jnp.float32),
        )(idx_b, tau_b.astype(jnp.float32), *operands)

    def run_batchgrid(coeffs_b, y0_b):
        def body(Y, t):
            idx, tau = _interval(ts, t)  # scalars, same t for all elements
            idx_b = jnp.full((B,), idx, jnp.int32)
            tau_b = jnp.full((B,), tau, jnp.float32)
            out = bg_call(coeffs_b, idx_b, tau_b, Y)
            return Y + 1e-3 * out, None
        Y_fin, _ = jax.lax.scan(body, y0_b, eval_ts)
        return Y_fin

    import numpy as np

    def log(msg):
        print(msg)
        with open("/tmp/mk_probe2.log", "a") as fh:
            fh.write(msg + "\n")

    results = {}
    for name, fn in [
        ("current", run_current),
        ("fixedslice", run_fixedslice),
        ("batchgrid", run_batchgrid),
    ]:
        try:
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
            results[name] = per_eval
            log(f"{name}: {dt*1e3:.2f} ms/run, {per_eval*1e6:.2f} us/eval, "
                  f"{N*N*L/per_eval/1e9:.1f} Gedges/s, "
                  f"roofline24={3*4*N*N*2/per_eval/819e9:.3f}")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")

    # parity current vs batchgrid
    try:
        a = jax.jit(run_current)(coeffs, y0)
        b2 = jax.jit(run_batchgrid)(coeffs, y0)
        dev = float(jnp.max(jnp.abs(a - b2)) / jnp.max(jnp.abs(a)))
        log(f"rel dev current vs batchgrid: {dev}")
    except Exception as e:
        log(f"parity check failed: {e!r:.500}")


T = 12

if __name__ == "__main__":
    main()
