"""Micro-benchmark: forward vs backward cost of the fused vf eval.

Sizes the headroom for a Pallas backward kernel: with the megakernel
forward + XLA backward (current custom_vjp), how much of a training-style
value_and_grad over chained vf evals is backward?

Run on TPU:  python benchmarks/grad_micro.py --n 400 --evals 50
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


def build(n, H, T, L, key):
    kv, kc, kz = jr.split(key, 3)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=H, num_nodes=n, key=kv,
    )
    coeffs = tuple(
        jr.normal(k, (T - 1, n, n), jnp.float32) * 0.05
        for k in jr.split(kc, 4)
    )
    ts = jnp.linspace(0.0, 1.0, T)
    Z = jr.normal(kz, (n, H))
    return vf, coeffs, ts, Z


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--H", type=int, default=32)
    p.add_argument("--T", type=int, default=12)
    p.add_argument("--L", type=int, default=3)
    p.add_argument("--evals", type=int, default=50)
    p.add_argument("--runs", type=int, default=10)
    p.add_argument("--precision", default="bf16", choices=["f32", "bf16"])
    args = p.parse_args()

    gncde_ops.set_fusion_precision(args.precision)
    vf, coeffs, ts, Z0 = build(args.n, args.H, args.T, args.L, jr.PRNGKey(0))
    from gncde_tpu.ops.pallas.megakernel import megakernel_vf_eval

    def chain_mega(Z, t0):
        def body(Z, i):
            t = t0 + i * (0.8 / args.evals)
            Z = Z + 0.01 * megakernel_vf_eval(coeffs, ts, t, Z, vf)
            return Z, None
        Z, _ = jax.lax.scan(body, Z, jnp.arange(args.evals))
        return Z

    def chain_dense(Z, t0):
        from gncde_tpu.ops.pallas.megakernel import _xla_reference, _interval
        def body(Z, i):
            t = t0 + i * (0.8 / args.evals)
            idx, tau = _interval(ts, t)
            Z = Z + 0.01 * _xla_reference(coeffs, idx, tau, Z, vf)
            return Z, None
        Z, _ = jax.lax.scan(body, Z, jnp.arange(args.evals))
        return Z

    def loss_of(chain):
        def loss(Z, t0):
            return jnp.sum(chain(Z, t0) ** 2)
        return loss

    variants = {
        "fwd_mega": jax.jit(chain_mega),
        "fwd_dense": jax.jit(chain_dense),
        "grad_mega(fwd=pallas,bwd=xla)": jax.jit(jax.value_and_grad(loss_of(chain_mega))),
        "grad_dense(all xla)": jax.jit(jax.value_and_grad(loss_of(chain_dense))),
    }
    for name, fn in variants.items():
        r = fn(Z0, 0.05)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(args.runs):
            r = fn(Z0, 0.05)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / args.runs
        per_eval = dt / args.evals
        print(f"{name:34s} {dt*1e3:8.2f} ms/run  {per_eval*1e6:8.1f} us/eval")


if __name__ == "__main__":
    main()
