"""Multi-device scaling benchmark: edges/s of the node-partitioned fused
message-passing stack across mesh sizes, with per-step collective byte
accounting.

The BASELINE.json north star asks for edges/s scaling efficiency measured at
1 chip, 1 host, and N hosts. This harness runs on whatever devices are
visible: real TPU slices measure true ICI scaling; the 8-device virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) is the DRESS
REHEARSAL -- it validates the collective program and the traffic model
(CPU "scaling" numbers are not chip-meaningful and are labelled so).

Usage: python benchmarks/scaling.py [--n 1024] [--hidden 32] [--layers 3]
         [--mode dense|pallas|dense-halo|pallas-halo|sparse|sparse-halo]
         [--band 32] [--density 0.5] [--weak] [--markdown out.md]

Modes:
  dense        row-sharded dense slabs, XLA matmuls, all_gather exchange
  pallas       same collectives, per-shard products on the tiled Pallas
               pair kernel (parallel/sharded_ops.py backend="pallas")
  dense-halo   banded dense slabs, ppermute rings + windowed products
  pallas-halo  the halo exchange with the Pallas slab kernel
  sparse       ELL row slabs, all_gather exchange
  sparse-halo  ELL row slabs, ppermute rings sized by ell_halo_width

``--weak``: weak scaling -- the global n grows with the mesh (n_loc = --n
per device), so per-device work is constant and efficiency is
eps(d) / (d * eps(1)).
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

from gncde_tpu.parallel.audit import collective_volume, total_bytes
from gncde_tpu.parallel.mesh import make_mesh
from gncde_tpu.parallel.sharded_ops import (
    dense_halo_width,
    ell_halo_width,
    make_sharded_sparse_vf_eval,
    make_sharded_vf_eval,
)
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField


def _banded_dense(n: int, band: int, density: float, seed: int = 0):
    rng = np.random.default_rng(seed)
    i = np.arange(n)
    d = (i[:, None] - i[None, :] + n // 2) % n - n // 2
    mask = (np.abs(d) <= band) & (rng.random((n, n)) < density)
    return jnp.asarray(
        np.where(mask, 0.1 * rng.normal(size=(n, n)), 0.0).astype(np.float32)
    )


def _banded_ell(n: int, band: int, density: float, seed: int = 0):
    from gncde_tpu.ops.sparse import ell_from_dense

    return ell_from_dense(np.asarray(_banded_dense(n, band, density, seed)))


def _time_reps(f, args, reps):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def _collective_summary(f, args):
    recs = collective_volume(f, *args)
    return {
        "ppermute_bytes": total_bytes(recs, {"ppermute"}),
        "allgather_bytes": total_bytes(recs, {"all_gather"}),
        "reduce_bytes": total_bytes(
            recs, {"psum", "psum2", "psum_scatter", "reduce_scatter"}
        ),
    }


def bench_mesh(n_devices: int, n: int, hidden: int, layers: int,
               mode: str = "dense", band: int = 32, density: float = 0.5,
               reps: int = 20, tile=None):
    mesh = make_mesh(n_devices, graph_axis=n_devices)
    vf = PermEquivGraphVectorField(
        input_dim=hidden, hidden_dim=hidden, output_dim=hidden,
        num_layers=layers, data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(0),
    )
    Z = jr.normal(jr.PRNGKey(1), (n, hidden))
    halo = None

    if mode in ("dense", "pallas", "dense-halo", "pallas-halo"):
        backend = "pallas" if mode.startswith("pallas") else "xla"
        if mode.endswith("halo"):
            A = _banded_dense(n, band, density, seed=2)
            dA = _banded_dense(n, band, density, seed=3)
            halo = dense_halo_width(A, n_devices)
            if 2 * halo + 1 >= n_devices:
                halo = None  # window spans the mesh: all-gather wins
            edges = int(np.sum(np.asarray(A) != 0.0)) * layers
        else:
            A = jr.normal(jr.PRNGKey(2), (n, n)) * 0.1
            dA = jr.normal(jr.PRNGKey(3), (n, n)) * 0.1
            edges = n * n * layers
        f = make_sharded_vf_eval(mesh, vf, backend=backend, tile=tile,
                                 halo=halo)
        coll = _collective_summary(f, (Z, A, dA))
        dt = _time_reps(f, (Z, A, dA), reps)
    else:
        ell = _banded_ell(n, band, density)
        halo = (
            ell_halo_width(ell.indices, n, n_devices)
            if mode == "sparse-halo" else None
        )
        if halo is not None and 2 * halo + 1 >= n_devices:
            halo = None
        f = make_sharded_sparse_vf_eval(mesh, vf, n, halo=halo)
        args = (Z, ell.indices, ell.values, ell.values)
        coll = _collective_summary(f, args)
        dt = _time_reps(f, args, reps)
        edges = int(np.sum(np.asarray(ell.indices) != n)) * layers
    return edges / dt, halo, coll


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1024,
                        help="global n (strong) or n per device (--weak)")
    parser.add_argument("--hidden", type=int, default=32)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument(
        "--mode",
        choices=("dense", "pallas", "dense-halo", "pallas-halo", "sparse",
                 "sparse-halo"),
        default="dense",
    )
    parser.add_argument("--band", type=int, default=32)
    parser.add_argument("--density", type=float, default=0.5)
    parser.add_argument("--weak", action="store_true")
    parser.add_argument("--tile", type=int, default=None,
                        help="Pallas slab tile (small meshes on CPU need it)")
    parser.add_argument("--markdown", type=str, default=None,
                        help="append a markdown row set to this file")
    args = parser.parse_args()

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]
    base = None
    rows = []
    for d in sizes:
        n = args.n * d if args.weak else args.n
        if n % d != 0:
            continue
        eps, halo, coll = bench_mesh(
            d, n, args.hidden, args.layers,
            mode=args.mode, band=args.band, density=args.density,
            tile=args.tile,
        )
        if base is None:
            base = eps
        rec = {
            "devices": d,
            "n": n,
            "mode": args.mode,
            "scaling": "weak" if args.weak else "strong",
            "edges_per_s": eps,
            "efficiency_vs_1dev": eps / (base * d),
            "platform": jax.devices()[0].platform,
            **coll,
        }
        if halo is not None:
            rec["halo"] = halo
        rows.append(rec)
        print(json.dumps(rec))

    if args.markdown:
        with open(args.markdown, "a") as fh:
            fh.write(
                f"\n### mode={args.mode} "
                f"{'weak' if args.weak else 'strong'} "
                f"(n{'_loc' if args.weak else ''}={args.n}, H={args.hidden}, "
                f"L={args.layers}, platform={rows[0]['platform']})\n\n"
            )
            fh.write("| devices | n | edges/s | efficiency | ppermute B | "
                     "all_gather B | reduce B |\n|---|---|---|---|---|---|---|\n")
            for r in rows:
                fh.write(
                    f"| {r['devices']} | {r['n']} | {r['edges_per_s']:.3e} | "
                    f"{r['efficiency_vs_1dev']:.2f} | {r['ppermute_bytes']} | "
                    f"{r['allgather_bytes']} | {r['reduce_bytes']} |\n"
                )


if __name__ == "__main__":
    main()
