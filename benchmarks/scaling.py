"""Multi-device scaling benchmark: edges/s of the node-partitioned fused
message-passing stack across mesh sizes.

The BASELINE.json north star asks for edges/s scaling efficiency measured at
1 chip, 1 host, and N hosts. This harness runs on whatever devices are
visible: real TPU slices measure true ICI scaling; the 8-device virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) validates the
collective program only (CPU "scaling" numbers are not meaningful).

Usage: python benchmarks/scaling.py [--n 1024] [--hidden 32] [--layers 3]
                                    [--mode dense|sparse|sparse-halo]
                                    [--band 32] [--density 0.5]
Prints one JSON line per mesh size with edges/s and efficiency vs 1 device.

Modes: ``dense`` = row-sharded dense slabs (all_gather exchange);
``sparse`` = ELL row slabs, all_gather exchange; ``sparse-halo`` = ELL row
slabs with ppermute neighbour rings sized by ``ell_halo_width`` -- the
banded-graph layout whose per-device traffic is O(halo*n/G*H) instead of
O(n*H). Sparse modes use a circular band graph (--band, --density).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr

import numpy as np

from gncde_tpu.parallel.mesh import make_mesh
from gncde_tpu.parallel.sharded_ops import (
    ell_halo_width,
    make_sharded_sparse_vf_eval,
    make_sharded_vf_eval,
)
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField


def _banded_ell(n: int, band: int, density: float, seed: int = 0):
    from gncde_tpu.ops.sparse import ell_from_dense

    rng = np.random.default_rng(seed)
    i = np.arange(n)
    d = (i[:, None] - i[None, :] + n // 2) % n - n // 2
    mask = (np.abs(d) <= band) & (rng.random((n, n)) < density)
    A = np.where(mask, 0.1 * rng.normal(size=(n, n)), 0.0).astype(np.float32)
    return ell_from_dense(A)


def _time_reps(f, args, reps):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_mesh(n_devices: int, n: int, hidden: int, layers: int,
               mode: str = "dense", band: int = 32, density: float = 0.5,
               reps: int = 20):
    mesh = make_mesh(n_devices, graph_axis=n_devices)
    vf = PermEquivGraphVectorField(
        input_dim=hidden, hidden_dim=hidden, output_dim=hidden,
        num_layers=layers, data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(0),
    )
    Z = jr.normal(jr.PRNGKey(1), (n, hidden))

    if mode == "dense":
        A = jr.normal(jr.PRNGKey(2), (n, n)) * 0.1
        dA = jr.normal(jr.PRNGKey(3), (n, n)) * 0.1
        f = make_sharded_vf_eval(mesh, vf)
        dt = _time_reps(f, (Z, A, dA), reps)
        edges = n * n * layers
        halo = None
    else:
        ell = _banded_ell(n, band, density)
        halo = (
            ell_halo_width(ell.indices, n, n_devices)
            if mode == "sparse-halo" else None
        )
        if halo is not None and 2 * halo + 1 >= n_devices:
            halo = None  # window spans the mesh: all-gather is the right call
        f = make_sharded_sparse_vf_eval(mesh, vf, n, halo=halo)
        dt = _time_reps(f, (Z, ell.indices, ell.values, ell.values), reps)
        edges = int(np.sum(np.asarray(ell.indices) != n)) * layers
    return edges / dt, halo


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1024)
    parser.add_argument("--hidden", type=int, default=32)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument(
        "--mode", choices=("dense", "sparse", "sparse-halo"), default="dense"
    )
    parser.add_argument("--band", type=int, default=32)
    parser.add_argument("--density", type=float, default=0.5)
    args = parser.parse_args()

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_dev and args.n % d == 0]
    base = None
    for d in sizes:
        eps, halo = bench_mesh(
            d, args.n, args.hidden, args.layers,
            mode=args.mode, band=args.band, density=args.density,
        )
        if base is None:
            base = eps
        rec = {
            "devices": d,
            "mode": args.mode,
            "edges_per_s": eps,
            "efficiency_vs_1dev": eps / (base * d),
            "platform": jax.devices()[0].platform,
        }
        if args.mode == "sparse-halo":
            rec["halo"] = halo
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
