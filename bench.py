"""Benchmark: permutation-equivariant vector-field evaluation throughput.

Measures edges/s/chip of the hot kernel (the fused equivariant message-
passing layer stack inside the CDE solver loop, SURVEY.md section 3.5) at the
reference's oversampling workload scale (n=400, B=50, L=3), and compares the
TPU-native rank-structured decomposition against a faithful reference-style
implementation (materialise all 8 dense basis terms, then one matmul --
reference layers.py:102-160) run on the SAME hardware.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` = baseline_time / our_time (>1 means faster than the
reference algorithm on this chip).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import jax.random as jr

from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.ops.equiv_basis import fusion_matrix_dense
from gncde_tpu.interp import backward_hermite_coefficients, CubicInterpolation

N_NODES = 400
BATCH = 16
HIDDEN = 32
LAYERS = 3
T_KNOTS = 12
EVALS_PER_RUN = 50  # vf evals chained per timed run (scan)
RUNS = 10


def build():
    key = jr.PRNGKey(0)
    k_vf, k_A, k_y = jr.split(key, 3)
    vf = PermEquivGraphVectorField(
        input_dim=HIDDEN, hidden_dim=HIDDEN, output_dim=HIDDEN,
        num_layers=LAYERS, data_embed_dim=1, num_nodes=N_NODES, key=k_vf,
    )
    ts = jnp.linspace(0.0, 1.0, T_KNOTS)
    A_path = jr.uniform(k_A, (BATCH, T_KNOTS, N_NODES, N_NODES)) * 0.1
    t_idx = jnp.broadcast_to(
        ts[None, :, None, None], (BATCH, T_KNOTS, N_NODES, N_NODES)
    )
    X = jnp.stack([t_idx, A_path], axis=-1)
    coeffs = jax.vmap(lambda x: backward_hermite_coefficients(ts, x))(X)
    y0 = jr.normal(k_y, (BATCH, N_NODES, HIDDEN)) * 0.1
    return vf, ts, coeffs, y0


def dense_reference_vf(vf, t, y, ctrl):
    """Reference-style evaluation: materialise the fused operator densely."""
    adj = ctrl.evaluate(t)[..., -1]
    deriv = ctrl.derivative(t)
    dadj = deriv[..., -1]
    feats = y
    for i, layer in enumerate(vf.gnn_layers):
        fused = fusion_matrix_dense(adj, dadj, layer.params)
        feats = layer.conv_layer(feats, fused)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    t_gradient = jnp.mean(deriv[..., 0], axis=0)
    return t_gradient[:, None] * feats


def make_runner(vf, ts, coeffs, mode):
    eval_ts = jnp.linspace(0.01, 0.99, EVALS_PER_RUN)

    def one_traj(coeffs_i, y0_i):
        ctrl = CubicInterpolation(ts, coeffs_i)

        def body(y, t):
            if mode == "fused":
                out = vf(t, y, ctrl)
            else:
                out = dense_reference_vf(vf, t, y, ctrl)
            return y + 1e-3 * out, None

        y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
        return y_fin

    @jax.jit
    def run(coeffs_b, y0_b):
        return jax.vmap(one_traj)(coeffs_b, y0_b)

    return run


def time_runner(run, coeffs, y0):
    out = run(coeffs, y0)
    out.block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(RUNS):
        out = run(coeffs, y0)
    out.block_until_ready()
    return (time.perf_counter() - t0) / RUNS


def main():
    vf, ts, coeffs, y0 = build()

    fused_run = make_runner(vf, ts, coeffs, "fused")
    ref_run = make_runner(vf, ts, coeffs, "dense")

    fused_t = time_runner(fused_run, coeffs, y0)
    ref_t = time_runner(ref_run, coeffs, y0)

    # sanity: both modes compute the same function
    a = fused_run(coeffs, y0)
    b = ref_run(coeffs, y0)
    max_dev = float(jnp.max(jnp.abs(a - b)))
    assert max_dev < 1e-2, f"fused/dense mismatch: {max_dev}"

    edges = N_NODES * N_NODES * BATCH * LAYERS * EVALS_PER_RUN
    edges_per_s = edges / fused_t
    print(
        json.dumps(
            {
                "metric": "vf_eval_edges_per_s_per_chip",
                "value": edges_per_s,
                "unit": "edges/s",
                "vs_baseline": ref_t / fused_t,
            }
        )
    )


if __name__ == "__main__":
    main()
