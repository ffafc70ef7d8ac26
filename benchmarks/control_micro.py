"""Micro-benchmark: control-path evaluation cost (A(t), dA(t) from cubic
coefficients) vs the full vf eval, isolating where the hot loop spends time.
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
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.interp import (
    backward_hermite_coefficients,
    CubicInterpolation,
    MatrixControl,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--H", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--T", type=int, default=12)
    p.add_argument("--evals", type=int, default=50)
    p.add_argument("--runs", type=int, default=20)
    p.add_argument("--backend", default="decomposed")
    p.add_argument("--precision", default="bf16")
    args = p.parse_args()
    n, H, B, T = args.n, args.H, args.batch, args.T

    gncde_ops.set_fusion_backend(args.backend)
    gncde_ops.set_fusion_precision(args.precision)

    key = jr.PRNGKey(0)
    k_vf, k_A, k_y = jr.split(key, 3)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H,
        num_layers=3, data_embed_dim=1, num_nodes=n, key=k_vf,
    )
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(k_A, (B, T, n, n)) * 0.1
    coeffs = jax.vmap(lambda x: backward_hermite_coefficients(ts, x))(A_path)
    slim = tuple(c.astype(jnp.bfloat16) for c in coeffs)
    y0 = jr.normal(k_y, (B, n, H)) * 0.1
    eval_ts = jnp.linspace(0.01, 0.99, args.evals)

    def ctrl_only(coeffs_i, y0_i):
        ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i))

        def body(y, t):
            A = ctrl.adj(t)
            dA = ctrl.dadj(t)
            # touch A/dA cheaply so nothing is DCE'd
            return y + jnp.sum(A, axis=1, keepdims=True) + jnp.sum(dA, axis=1, keepdims=True), None

        y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
        return y_fin

    def full_vf(coeffs_i, y0_i):
        ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i))

        def body(y, t):
            return y + 1e-3 * vf(t, y, ctrl), None

        y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
        return y_fin

    for name, fn in [("ctrl_only", ctrl_only), ("full_vf", full_vf)]:
        run = jax.jit(lambda c, y, f=fn: jax.vmap(f)(c, y))
        t0 = time.perf_counter()
        out = run(slim, y0)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.runs):
            out = run(slim, y0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.runs
        per_eval_us = dt / args.evals * 1e6
        print(
            f"{name:10s} backend={args.backend}/{args.precision} n={n} B={B}: "
            f"{dt*1e3:.3f} ms/run  {per_eval_us:.1f} us/eval  (compile {compile_s:.1f}s)"
        )


if __name__ == "__main__":
    main()
