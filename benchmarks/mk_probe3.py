"""Probe 3: where does the bench-harness vf eval lose time vs the raw
batched kernel call?

Variants (all n=400, H=32, L=3, B=16, 50 chained evals, batch-grid kernel):
  dispatch_arg    -- bench-style: vf(t, y, ctrl) through the production
                     dispatch, vf passed as a jit ARGUMENT (traced weights)
  dispatch_const  -- same dispatch, vf closed over (constant weights)
  raw_arg         -- direct _forward call, layer_arrays built per eval from
                     the traced vf (isolates dispatch/control overhead)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr

N, H, L, B = 400, 32, 3, 16
EVALS = 50
T = 12


def main():
    from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
    from gncde_tpu.ops.pallas.megakernel import (
        _layer_param_arrays, _forward, _interval,
    )
    from gncde_tpu.interp import (
        backward_hermite_coefficients, CubicInterpolation, MatrixControl,
    )
    from gncde_tpu import ops as ops_cfg

    ops_cfg.set_fusion_precision("bf16")
    ops_cfg.set_fusion_backend("megakernel")
    key = jr.PRNGKey(0)
    k_vf, k_A, k_y = jr.split(key, 3)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=N, key=k_vf,
    )
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(k_A, (B, T, N, N)) * 0.1
    coeffs = jax.vmap(
        lambda x: tuple(
            cc.astype(jnp.bfloat16)
            for cc in backward_hermite_coefficients(ts, x)
        )
    )(A_path)
    y0 = jr.normal(k_y, (B, N, H)) * 0.1
    dims = [(H, H)] * L
    eval_ts = jnp.linspace(0.01, 0.99, EVALS)

    def traj_dispatch(v, coeffs_i, y0_i):
        ctrl = MatrixControl(CubicInterpolation(ts, coeffs_i))

        def body(y, t):
            return y + 1e-3 * v(t, y, ctrl), None

        y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
        return y_fin

    def run_dispatch_arg(v, coeffs_b, y0_b):
        return jax.vmap(lambda c, y: traj_dispatch(v, c, y))(coeffs_b, y0_b)

    def run_dispatch_const(coeffs_b, y0_b):
        return jax.vmap(lambda c, y: traj_dispatch(vf, c, y))(coeffs_b, y0_b)

    def run_raw_arg(v, coeffs_b, y0_b):
        la = _layer_param_arrays(v)

        def one(coeffs_i, y0_i):
            def body(y, t):
                idx, tau = _interval(ts, t)
                out = _forward(coeffs_i, idx, tau, y, la, N, dims, True)
                return y + 1e-3 * out, None

            y_fin, _ = jax.lax.scan(body, y0_i, eval_ts)
            return y_fin

        return jax.vmap(one)(coeffs_b, y0_b)

    def log(msg):
        print(msg)
        with open("/tmp/mk_probe3.log", "a") as fh:
            fh.write(msg + "\n")

    cases = [
        ("dispatch_arg", jax.jit(run_dispatch_arg), (vf, coeffs, y0)),
        ("dispatch_const", jax.jit(run_dispatch_const), (coeffs, y0)),
        ("raw_arg", jax.jit(run_raw_arg), (vf, coeffs, y0)),
    ]
    for name, f, args in cases:
        try:
            out = f(*args)
            out.block_until_ready()
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                out = f(*args)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            per_eval = dt / (B * EVALS)
            log(f"{name}: {per_eval*1e6:.2f} us/eval, "
                f"{N*N*L/per_eval/1e9:.1f} Gedges/s")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
