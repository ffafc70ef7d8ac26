"""Micro-benchmark: whole-VMEM megakernel vs the XLA dense-bf16 path.

Measures Mosaic compile time and steady-state per-eval time of
ops/pallas/megakernel.py at several n (round-1 blocker was compile time at
n >= 400). Run on TPU.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import jax.random as jr

from gncde_tpu import ops as gncde_ops
from gncde_tpu.interp import backward_hermite_coefficients, CubicInterpolation, MatrixControl
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.ops.pallas.megakernel import megakernel_vf_eval


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--H", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--T", type=int, default=12)
    p.add_argument("--evals", type=int, default=50)
    p.add_argument("--runs", type=int, default=20)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--variant", default="mega", choices=["mega", "dense"])
    p.add_argument("--f32", action="store_true", help="keep coeff planes f32")
    args = p.parse_args()
    n, H, B, T, L = args.n, args.H, args.batch, args.T, args.layers

    key = jr.PRNGKey(0)
    k_vf, kA, ky = jr.split(key, 3)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H,
        num_layers=L, data_embed_dim=1, num_nodes=n, key=k_vf,
    )
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(kA, (B, T, n, n)) * 0.1
    coeffs = jax.vmap(lambda x: backward_hermite_coefficients(ts, x))(A_path)
    y0 = jr.normal(ky, (B, n, H)) * 0.1
    eval_ts = jnp.linspace(0.01, 0.99, args.evals)

    if args.variant == "mega":
        if not args.f32:
            coeffs = tuple(c.astype(jnp.bfloat16) for c in coeffs)

        def one(coeffs_i, y0_i):
            def body(y, t):
                out = megakernel_vf_eval(tuple(coeffs_i), ts, t, y, vf)
                return y + 1e-3 * out, None

            y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
            return y_fin
    else:
        gncde_ops.set_fusion_backend("dense")
        gncde_ops.set_fusion_precision("bf16")

        def one(coeffs_i, y0_i):
            ctrl = MatrixControl(
                CubicInterpolation(ts, tuple(c.astype(jnp.bfloat16) for c in coeffs_i))
            )

            def body(y, t):
                return y + 1e-3 * vf(t, y, ctrl), None

            y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
            return y_fin

    run = jax.jit(lambda c, y: jax.vmap(one)(c, y))
    t0 = time.perf_counter()
    out = run(coeffs, y0)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.runs):
        out = run(coeffs, y0)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / args.runs
    per_eval_us = dt / args.evals * 1e6
    edges_per_s = n * n * args.evals * B * L / dt
    print(
        f"{args.variant:6s} n={n} B={B} L={L}: {dt*1e3:.3f} ms/run "
        f"{per_eval_us:.1f} us/eval  {edges_per_s:.3e} edges/s  "
        f"(compile {compile_s:.1f}s)"
    )


if __name__ == "__main__":
    main()
