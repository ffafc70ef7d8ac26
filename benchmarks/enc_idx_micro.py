"""enc_idx vf-eval microbenchmark: XLA dense stack vs the Pallas plane path.

Shapes are the reference enc_idx configs
(configs/tgb/{trade,genre}/perm_equiv_dir_enc_idx_gncde_config.yaml):
trade n=255, H=32, L=4, idx_dim=512; genre n=1505, H=8, L=3, idx_dim=512.
Run EXCLUSIVELY on the TPU (a concurrent CPU suite inflates numbers ~15%).

  python benchmarks/enc_idx_micro.py [--grad]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr

from gncde_tpu import ops as ops_config
from gncde_tpu.interp import (
    CubicInterpolation,
    MatrixControl,
    backward_hermite_coefficients,
)
from gncde_tpu.models.vector_fields import PermEquivDirGraphVectorField
from gncde_tpu.nn import combine, is_inexact_array, partition


def bench_shape(name, n, H, L, idx_dim, grad=False, iters=50):
    key = jr.PRNGKey(0)
    vf = PermEquivDirGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, enc_idx=True, enc_type="emb",
        idx_dim=idx_dim, key=key,
    )
    T = 6
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(1), (T, n, n)) * 0.1
    coeffs = backward_hermite_coefficients(ts, A_path)
    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))
    Z = jr.normal(jr.PRNGKey(2), (n, H))
    t = jnp.asarray(0.37)

    # Chain K evals inside ONE jit (bench.py pattern): per-call dispatch
    # over the axon tunnel is ~0.5 ms, which would swamp single-eval timings.
    # Grad mode chains fewer: naive scan backprop stores per-step plane
    # residuals (the production trainers use the checkpointed adjoint).
    K = 10 if grad else 50
    t_s = jnp.linspace(0.05, 0.95, K)

    results = {}
    for backend in ("dense", "megakernel"):
        ops_config.set_fusion_backend(backend)

        if grad:
            params0, static = partition(vf, is_inexact_array)

            def chained_loss(params, ts_, Z0, c):
                vf_p = combine(params, static)

                def body(Zc, t_):
                    return Zc + 1e-3 * vf_p(t_, Zc, c), ()

                Zf, _ = jax.lax.scan(body, Z0, ts_)
                return jnp.sum(Zf**2)

            # Collapse (value, grads) to ONE scalar array: on the axon
            # tunnel, jax.block_until_ready over a pytree does not reliably
            # wait for execution (measured 0.28 ms/call for >= 7 ms of
            # work); a single-array .block_until_ready() does.
            def scalarised(params, ts_, Z0, c):
                v, g = jax.value_and_grad(chained_loss)(params, ts_, Z0, c)
                return v + sum(
                    jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g)
                )

            f = jax.jit(scalarised)
            out = f(params0, t_s, Z, ctrl)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(params0, t_s, Z, ctrl)
            out.block_until_ready()
        else:

            def chained(ts_, Z0, c):
                def body(Zc, t_):
                    return Zc + 1e-3 * vf(t_, Zc, c), ()

                Zf, _ = jax.lax.scan(body, Z0, ts_)
                return Zf

            f = jax.jit(chained)
            out = f(t_s, Z, ctrl)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(t_s, Z, ctrl)
            out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters / K
        results[backend] = dt
        print(f"{name} n={n} H={H} L={L} d={idx_dim} "
              f"{'grad' if grad else 'eval'} backend={backend}: "
              f"{dt * 1e6:9.1f} us/eval")
    speedup = results["dense"] / results["megakernel"]
    print(f"{name}: pallas-plane path speedup {speedup:.2f}x")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    ops_config.set_fusion_precision("bf16")
    print(f"backend: {jax.default_backend()}")
    bench_shape("trade", 255, 32, 4, 512, grad=args.grad, iters=args.iters)
    bench_shape("genre", 1505, 8, 3, 512, grad=args.grad, iters=args.iters)
