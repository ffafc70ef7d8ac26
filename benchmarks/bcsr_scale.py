"""Extreme-scale training feasibility point: n=32768 on ONE chip via BCSR.

A dense cubic control at n=32768 stores 4 (T-1) n^2 coefficient planes
(~17 GB bf16 per interval) -- infeasible on a 16 GB chip, and even the
HOST cannot afford a dense scaffold. The control is therefore built
straight from per-knot EDGE LISTS through the O(nnz) production path
(interp.bcsr_control_from_edge_snapshots: C++ pattern/scatter kernels via
ctypes, entrywise Hermite over the tile stacks) and the training step runs
through the Pallas block kernels (ops/bcsr.py) end to end. No n^2 object
ever exists on host or device.

Run on the TPU chip:  python benchmarks/bcsr_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import jax.random as jr
import numpy as np


def main(n=32768, bw=64, bs=128, H=32, L=3, T=3):
    from gncde_tpu.interp import bcsr_control_from_edge_snapshots
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.nn import apply_updates, filter_value_and_grad
    from gncde_tpu.solve import (
        ConstantStepSize, ODETerm, SaveAt, diffeqsolve,
    )

    print(f"backend: {jax.default_backend()}  n={n} bw={bw} bs={bs} H={H} L={L}")
    rng = np.random.default_rng(0)
    # Circular +-bw band as per-knot edge lists (nnz = n (2 bw + 1)).
    i = np.repeat(np.arange(n), 2 * bw + 1)
    o = np.tile(np.arange(-bw, bw + 1), n)
    src, dst = i, (i + o) % n
    ts = jnp.linspace(0.0, 1.0, T)
    snapshots = [
        (src, dst, 0.1 * rng.random(src.size).astype(np.float32))
        for _ in range(T)
    ]

    t0 = time.perf_counter()
    ctrl = bcsr_control_from_edge_snapshots(
        ts, snapshots, n, block_size=bs, dtype=jnp.bfloat16
    )
    build_s = time.perf_counter() - t0
    path = ctrl.path
    coeff_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize
        for p in (*path.coeffs, *path.coeffs_T)
    )
    print(f"control built from {src.size * T / 1e6:.1f}M edges in "
          f"{build_s:.1f}s; coefficient tiles {coeff_bytes/1e9:.2f} GB on "
          f"device (dense per-interval planes would be "
          f"{4*(T-1)*n*n*2/1e9:.0f} GB bf16)")

    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(1),
    )
    y0 = jr.normal(jr.PRNGKey(2), (n, H)) * 0.1

    def loss_fn(model, c):
        sol = diffeqsolve(
            ODETerm(model), "Heun", t0=0.0, t1=1.0, dt0=0.25, y0=y0,
            args=c, stepsize_controller=ConstantStepSize(),
            saveat=SaveAt(t1=True), max_steps=8,
        )
        return jnp.mean(sol.ys**2)

    @jax.jit
    def step(model, c):
        loss, grads = filter_value_and_grad(loss_fn)(model, c)
        updates = jax.tree_util.tree_map(
            lambda g: None if g is None else -1e-3 * g, grads,
            is_leaf=lambda x: x is None,
        )
        return loss, apply_updates(model, updates)

    loss, model = step(vf, ctrl)
    loss.block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        loss, model = step(vf, ctrl)
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    nnz = src.size
    evals = 4 * 2  # 4 Heun steps x 2 stages
    print(f"train step (4 Heun steps, value_and_grad+update): {dt:.3f} s  "
          f"loss={float(loss):.5f}")
    print(f"forward edge throughput proxy: "
          f"{nnz * L * evals / dt / 1e9:.2f} Gnnz-edges/s (nnz={nnz})")


if __name__ == "__main__":
    main()
