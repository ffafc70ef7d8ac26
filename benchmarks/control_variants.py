"""Experiment: control-path evaluation strategies for A(t), dA(t).

The hot loop (bench.py) spends ~40% of each vf eval gathering + evaluating
Hermite coefficients. Variants measured here on TPU:

  sep      -- current: ctrl.adj(t) then ctrl.dadj(t) (separate gathers,
              relying on XLA CSE).
  joint    -- one interval gather shared by value and derivative.
  stacked  -- coefficients stored as one (T-1, 4, n, n) array; a single
              dynamic slice fetches all 4 planes; A and dA come from one
              (2,4) @ (4, n*n) contraction (each plane read exactly once).
  fused3   -- stacked + the full 3-layer fused conv chained (end-to-end
              per-eval shape of bench.py) for each control variant.
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

from gncde_tpu.interp import backward_hermite_coefficients, CubicInterpolation
from gncde_tpu.ops.equiv_basis import fusion_matrix_dense


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--H", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--T", type=int, default=12)
    p.add_argument("--evals", type=int, default=50)
    p.add_argument("--runs", type=int, default=20)
    p.add_argument("--layers", type=int, default=3)
    args = p.parse_args()
    n, H, B, T, L = args.n, args.H, args.batch, args.T, args.layers

    key = jr.PRNGKey(0)
    kA, ky, kp = jr.split(key, 3)
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(kA, (B, T, n, n)) * 0.1
    coeffs = jax.vmap(lambda x: backward_hermite_coefficients(ts, x))(A_path)
    slim = tuple(c.astype(jnp.bfloat16) for c in coeffs)  # (B, T-1, n, n) x4
    stackedc = jnp.stack(slim, axis=2)  # (B, T-1, 4, n, n)
    y0 = jr.normal(ky, (B, n, H)) * 0.1
    eval_ts = jnp.linspace(0.01, 0.99, args.evals)
    params = [
        tuple(1 / 15 * jr.uniform(kk, (2,), minval=-1.0, maxval=1.0)
              for kk in jr.split(k_l, 8))
        for k_l in jr.split(kp, L)
    ]

    def idx_tau(t):
        i = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, T - 2)
        return i, t - ts[i]

    def sep(coeffs_i, stacked_i, t):
        ctrl = CubicInterpolation(ts, coeffs_i)
        return ctrl.evaluate(t), ctrl.derivative(t)

    def joint(coeffs_i, stacked_i, t):
        d, c, b, a = coeffs_i
        i, tau = idx_tau(t)
        di, ci, bi, ai = d[i], c[i], b[i], a[i]
        A = ((di * tau + ci) * tau + bi) * tau + ai
        dA = (3.0 * di * tau + 2.0 * ci) * tau + bi
        return A, dA

    def stacked(coeffs_i, stacked_i, t):
        i, tau = idx_tau(t)
        P = stacked_i[i].reshape(4, n * n)  # (4, n*n) one slice
        w = jnp.stack(
            [
                jnp.stack([tau**3, tau**2, tau, jnp.ones_like(tau)]),
                jnp.stack([3.0 * tau**2, 2.0 * tau, jnp.ones_like(tau), jnp.zeros_like(tau)]),
            ]
        )  # (2, 4)
        AD = jnp.dot(w.astype(P.dtype), P, preferred_element_type=jnp.float32)
        return AD[0].reshape(n, n), AD[1].reshape(n, n)

    variants = {"sep": sep, "joint": joint, "stacked": stacked}
    only = os.environ.get("ONLY")

    def bench(name, ctrl_fn, with_conv):
        def one(coeffs_i, stacked_i, y0_i):
            def body(y, t):
                A, dA = ctrl_fn(coeffs_i, stacked_i, t)
                if with_conv:
                    feats = y
                    for l in range(L):
                        fused = fusion_matrix_dense(
                            A.astype(jnp.bfloat16), dA.astype(jnp.bfloat16), params[l]
                        )
                        feats = feats + jnp.dot(
                            fused, feats.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32,
                        )
                        if l < L - 1:
                            feats = jax.nn.relu(feats)
                    return y + 1e-3 * feats, None
                return (
                    y
                    + jnp.sum(A.astype(jnp.float32), axis=1, keepdims=True)
                    + jnp.sum(dA.astype(jnp.float32), axis=1, keepdims=True),
                    None,
                )

            y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
            return y_fin

        run = jax.jit(lambda c, s, y: jax.vmap(one)(c, s, y))
        t0 = time.perf_counter()
        out = run(slim, stackedc, y0)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.runs):
            out = run(slim, stackedc, y0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.runs
        per_eval_us = dt / args.evals * 1e6
        tag = "ctrl+conv3" if with_conv else "ctrl_only "
        print(
            f"{name:8s} {tag} n={n} B={B}: {dt*1e3:.3f} ms/run "
            f"{per_eval_us:.1f} us/eval (compile {compile_s:.1f}s)"
        )

    for name, fn in variants.items():
        if only and name not in only.split(","):
            continue
        bench(name, fn, with_conv=False)
    for name, fn in variants.items():
        if only and name not in only.split(","):
            continue
        bench(name, fn, with_conv=True)


if __name__ == "__main__":
    main()
