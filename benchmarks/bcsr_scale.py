"""Extreme-scale training feasibility point: n=32768 on ONE chip via BCSR.

A dense cubic control at n=32768 stores 4 (T-1) n^2 coefficient planes
(~17 GB bf16 per interval) -- infeasible on a 16 GB chip, and even the
HOST cannot afford the dense scaffold. This benchmark therefore builds the
blocked control analytically: a circular band's entries are (T,)-signals
indexed by (row, offset), Hermite interpolation is entrywise, so the
coefficient planes are computed in BAND layout (T-1, n, 2 bw + 1) and the
(bs, bs) tiles of both BCSR layouts are assembled directly -- no n^2
object ever exists on host or device. The training step then runs through
the Pallas block kernels (ops/bcsr.py) end to end.

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


def band_to_tiles(band, offs, n, bs, block_idx, nblocks):
    """Assemble BCSR tiles from a band-layout plane.

    band: (n, K) with band[r, k] = dense[r, (r + offs[k]) % n].
    Returns (nb, kb, bs, bs) float32 tiles at the given blocked pattern.
    """
    nb = n // bs
    kb = block_idx.shape[1]
    K = band.shape[1]
    tiles = np.zeros((nb, kb, bs, bs), np.float32)
    rows_local = np.arange(bs)
    for rb in range(nb):
        r_global = rb * bs + rows_local
        strip = np.zeros((bs, n), np.float32)
        cols = (r_global[:, None] + offs[None, :]) % n
        strip[rows_local[:, None].repeat(K, 1), cols] = band[r_global]
        for s in range(nblocks[rb]):
            cb = block_idx[rb, s]
            tiles[rb, s] = strip[:, cb * bs : (cb + 1) * bs]
    return tiles


def main(n=32768, bw=64, bs=128, H=32, L=3, T=3):
    from gncde_tpu.interp.bcsr_paths import BCSRCubicMatrixPath
    from gncde_tpu.interp import BCSRMatrixControl, backward_hermite_coefficients
    from gncde_tpu.ops.bcsr import BCSRLayout, bcsr_diag_slots
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.nn import apply_updates, filter_value_and_grad
    from gncde_tpu.solve import (
        ConstantStepSize, ODETerm, SaveAt, diffeqsolve,
    )

    print(f"backend: {jax.default_backend()}  n={n} bw={bw} bs={bs} H={H} L={L}")
    rng = np.random.default_rng(0)
    offs = np.arange(-bw, bw + 1)
    K = offs.size
    nb = n // bs

    t0 = time.perf_counter()
    # Band-layout knot values + entrywise Hermite coefficients (host CPU).
    band_knots = 0.1 * rng.random((T, n, K)).astype(np.float32)
    ts = jnp.linspace(0.0, 1.0, T)
    with jax.default_device(jax.devices("cpu")[0]):
        band_coeffs = [
            np.asarray(c)
            for c in backward_hermite_coefficients(ts, jnp.asarray(band_knots))
        ]  # 4 x (T-1, n, K)

    # Blocked pattern of a circular +-bw band at bs | n: each block-row
    # touches col-blocks {rb-1, rb, rb+1} (mod nb).
    block_idx = np.stack(
        [
            np.mod(np.arange(nb) - 1, nb),
            np.arange(nb),
            np.mod(np.arange(nb) + 1, nb),
        ],
        axis=1,
    ).astype(np.int32)
    nblocks = np.full((nb,), 3, np.int32)
    diag_slot = bcsr_diag_slots(block_idx, nblocks)
    layout = BCSRLayout(
        jnp.asarray(block_idx), jnp.asarray(nblocks),
        jnp.asarray(block_idx), jnp.asarray(nblocks),  # symmetric pattern
        jnp.asarray(diag_slot), n, bs,
    )

    def plane_tiles(plane_band):
        return band_to_tiles(plane_band, offs, n, bs, block_idx, nblocks)

    def plane_tiles_T(plane_band):
        # dense^T in band layout: bandT[r, k] = band[(r + offs[k]) % n,
        # K-1-k] (offset negated).
        r = np.arange(n)[:, None]
        bandT = plane_band[(r + offs[None, :]) % n, (K - 1 - np.arange(K))[None, :]]
        return band_to_tiles(bandT, offs, n, bs, block_idx, nblocks)

    coeffs = tuple(
        jnp.asarray(
            np.stack([plane_tiles(p[i]) for i in range(T - 1)]), jnp.bfloat16
        )
        for p in band_coeffs
    )
    coeffs_T = tuple(
        jnp.asarray(
            np.stack([plane_tiles_T(p[i]) for i in range(T - 1)]), jnp.bfloat16
        )
        for p in band_coeffs
    )
    ctrl = BCSRMatrixControl(
        BCSRCubicMatrixPath(ts, coeffs, coeffs_T, layout)
    )
    build_s = time.perf_counter() - t0
    coeff_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize for p in (*coeffs, *coeffs_T)
    )
    print(f"control built in {build_s:.1f}s; coefficient tiles "
          f"{coeff_bytes/1e9:.2f} GB on device (dense per-interval planes "
          f"would be {4*(T-1)*n*n*2/1e9:.0f} GB bf16)")

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
    nnz = n * K
    evals = 4 * 2  # 4 Heun steps x 2 stages
    print(f"train step (4 Heun steps, value_and_grad+update): {dt:.3f} s  "
          f"loss={float(loss):.5f}")
    print(f"forward edge throughput proxy: "
          f"{nnz * L * evals / dt / 1e9:.2f} Gnnz-edges/s (nnz={nnz})")


if __name__ == "__main__":
    main()
