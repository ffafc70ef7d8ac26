"""A/B 2: fused step on a FIXED-step solve (isolates the step from the PID
controller; this is also the TGB/PGT solver regime -- ConstantStepSize).

Measures fwd solve and grad-of-solve at the flagship shape, fused off/on.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from gncde_tpu import ops as ops_cfg
from gncde_tpu.interp import CubicInterpolation, MatrixControl
from gncde_tpu.nn import filter_value_and_grad
from gncde_tpu.solve import ConstantStepSize, ODETerm, SaveAt, diffeqsolve


def main():
    vf, ts, coeffs, y0 = bench.build()
    slim = bench.slim_coeffs(coeffs)
    NSTEP = 64
    dt0 = float(ts[-1] - ts[0]) / NSTEP

    def solve_one(model, cf, y):
        ctrl = MatrixControl(CubicInterpolation(ts, cf))
        sol = diffeqsolve(
            ODETerm(model), "Tsit5", t0=ts[0], t1=ts[-1], dt0=dt0, y0=y,
            args=ctrl, stepsize_controller=ConstantStepSize(),
            saveat=SaveAt(t1=True), max_steps=NSTEP,
        )
        return sol.ys

    def fwd(model, cf_b, y_b):
        return jnp.mean(jax.vmap(
            lambda c, y: solve_one(model, c, y))(cf_b, y_b) ** 2)

    def log(msg):
        print(msg, flush=True)
        with open("/tmp/fused_step_ab2.log", "a") as fh:
            fh.write(msg + "\n")

    for fused in (False, True):
        ops_cfg.set_fused_step(fused)
        tag = "fused" if fused else "stagewise"
        f = jax.jit(fwd)
        out = f(vf, slim, y0)
        out.block_until_ready()
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = f(vf, slim, y0)
        out.block_until_ready()
        log(f"{tag}: fixed-step fwd solve {(time.perf_counter()-t0)/reps*1e3:.1f} ms"
            f" ({NSTEP} steps, B={y0.shape[0]})")

        g = jax.jit(lambda m, c, y: filter_value_and_grad(fwd)(m, c, y))
        loss, grads = g(vf, slim, y0)
        loss.block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            loss, grads = g(vf, slim, y0)
        loss.block_until_ready()
        log(f"{tag}: fixed-step grad step {(time.perf_counter()-t0)/reps*1e3:.1f} ms")
    ops_cfg.set_fused_step(True)


if __name__ == "__main__":
    main()
