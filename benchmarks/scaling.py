"""Multi-device scaling benchmark: edges/s of the node-partitioned fused
message-passing stack across mesh sizes.

The BASELINE.json north star asks for edges/s scaling efficiency measured at
1 chip, 1 host, and N hosts. This harness runs on whatever devices are
visible: real TPU slices measure true ICI scaling; the 8-device virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) validates the
collective program only (CPU "scaling" numbers are not meaningful).

Usage: python benchmarks/scaling.py [--n 1024] [--hidden 32] [--layers 3]
Prints one JSON line per mesh size with edges/s and efficiency vs 1 device.
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

from gncde_tpu.parallel.mesh import make_mesh
from gncde_tpu.parallel.sharded_ops import make_sharded_vf_eval
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField


def bench_mesh(n_devices: int, n: int, hidden: int, layers: int, reps: int = 20):
    mesh = make_mesh(n_devices, graph_axis=n_devices)
    vf = PermEquivGraphVectorField(
        input_dim=hidden, hidden_dim=hidden, output_dim=hidden,
        num_layers=layers, data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(0),
    )
    Z = jr.normal(jr.PRNGKey(1), (n, hidden))
    A = jr.normal(jr.PRNGKey(2), (n, n)) * 0.1
    dA = jr.normal(jr.PRNGKey(3), (n, n)) * 0.1

    f = make_sharded_vf_eval(mesh, vf)
    out = f(Z, A, dA)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(Z, A, dA)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    edges = n * n * layers
    return edges / dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1024)
    parser.add_argument("--hidden", type=int, default=32)
    parser.add_argument("--layers", type=int, default=3)
    args = parser.parse_args()

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_dev and args.n % d == 0]
    base = None
    for d in sizes:
        eps = bench_mesh(d, args.n, args.hidden, args.layers)
        if base is None:
            base = eps
        print(
            json.dumps(
                {
                    "devices": d,
                    "edges_per_s": eps,
                    "efficiency_vs_1dev": eps / (base * d),
                    "platform": jax.devices()[0].platform,
                }
            )
        )


if __name__ == "__main__":
    main()
