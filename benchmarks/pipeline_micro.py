"""Micro-benchmark: pipeline Pallas kernel vs dense-bf16 XLA fused apply.

Times the per-layer fused basis apply chained EVALS times (forward only and
grad), at reference scale (n=400) and scaled n. Run on TPU.
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

from gncde_tpu.ops import equiv_basis
from gncde_tpu.ops.pallas.pipeline import pipeline_fused_apply


def dense_bf16_apply(A, dA, M, params):
    fused = equiv_basis.fusion_matrix_dense(
        A.astype(jnp.bfloat16), dA.astype(jnp.bfloat16), params
    )
    return M + jnp.dot(fused, M.astype(jnp.bfloat16), preferred_element_type=jnp.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--H", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--evals", type=int, default=60)
    p.add_argument("--runs", type=int, default=20)
    p.add_argument("--grad", action="store_true")
    p.add_argument("--bf16", action="store_true", help="store A/dA in bf16")
    args = p.parse_args()
    n, H, B = args.n, args.H, args.batch

    k = jr.PRNGKey(0)
    kA, kdA, kM, kp = jr.split(k, 4)
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    A = (jr.uniform(kA, (B, n, n)) * 0.1).astype(dt)
    dA = (jr.normal(kdA, (B, n, n)) * 0.03).astype(dt)
    M = jr.normal(kM, (B, n, H)) * 0.1
    params = tuple(
        1 / 15 * jr.uniform(kk, (2,), minval=-1.0, maxval=1.0)
        for kk in jr.split(kp, 8)
    )

    def chain(apply_fn, A_i, dA_i, M0):
        def body(m, _):
            out = apply_fn(A_i, dA_i, m, params)
            return jnp.tanh(out), None

        m_fin, _ = jax.lax.scan(body, M0, None, length=args.evals)
        return m_fin

    def decomposed_bf16(A_, dA_, m, p_):
        return equiv_basis.fused_apply(
            A_.astype(jnp.bfloat16), dA_.astype(jnp.bfloat16), m, p_,
            add_identity=True,
        )

    variants = [
        ("pipeline", lambda A_, dA_, m, p_: pipeline_fused_apply(A_, dA_, m, p_, False, True)),
        ("pipeline512", lambda A_, dA_, m, p_: pipeline_fused_apply(A_, dA_, m, p_, False, True, 512)),
        ("dense_bf16", dense_bf16_apply),
        ("decomp_bf16", decomposed_bf16),
    ]
    only = os.environ.get("ONLY")
    if only:
        variants = [v for v in variants if v[0] in only.split(",")]
    for name, fn in variants:
        def fwd(A_b, dA_b, M_b):
            return jax.vmap(lambda a, d, m: chain(fn, a, d, m))(A_b, dA_b, M_b)

        if args.grad:
            run = jax.jit(
                lambda A_b, dA_b, M_b: jax.grad(
                    lambda m: jnp.sum(fwd(A_b, dA_b, m) ** 2)
                )(M_b)
            )
        else:
            run = jax.jit(fwd)
        t0 = time.perf_counter()
        out = run(A, dA, M)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.runs):
            out = run(A, dA, M)
        out.block_until_ready()
        dt_run = (time.perf_counter() - t0) / args.runs
        per_eval_us = dt_run / (args.evals * B) * 1e6
        edges_per_s = n * n * args.evals * B / dt_run
        print(
            f"{name:12s} n={n} B={B} grad={args.grad} bf16={args.bf16}: "
            f"{dt_run*1e3:.3f} ms/run  {per_eval_us:.2f} us/apply  "
            f"{edges_per_s:.3e} edges/s  (compile {compile_s:.1f}s)"
        )


if __name__ == "__main__":
    main()
