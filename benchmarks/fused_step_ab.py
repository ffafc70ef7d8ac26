"""A/B the fused RK-step kernel on the production bench surfaces (v5e).

Measures, fused off -> on: adaptive solve (inference), train step
(checkpointed + full adjoint) at the flagship shape, via bench.py's own
builders so the numbers are apples-to-apples with BENCH_r*.json.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import bench
from gncde_tpu import ops as ops_cfg


def main():
    vf, ts, coeffs, y0 = bench.build()
    slim = bench.slim_coeffs(coeffs)

    def log(msg):
        print(msg, flush=True)
        with open("/tmp/fused_step_ab.log", "a") as fh:
            fh.write(msg + "\n")

    for fused in (False, True):
        ops_cfg.set_fused_step(fused)
        tag = "fused" if fused else "stagewise"
        try:
            steps_per_s, solve_t = bench.solver_steps_per_s(vf, ts, slim, y0)
            log(f"{tag}: adaptive_solve {solve_t*1e3:.1f} ms, "
                f"{steps_per_s:.0f} steps/s")
        except Exception as e:
            log(f"{tag}: solve FAILED {type(e).__name__}: {str(e)[:300]}")
        for adjoint in ("checkpointed", "full"):
            try:
                t = bench.train_step_time(vf, ts, slim, y0, adjoint=adjoint)
                log(f"{tag}: train_step[{adjoint}] {t:.3f} s")
            except Exception as e:
                log(f"{tag}: train[{adjoint}] FAILED "
                    f"{type(e).__name__}: {str(e)[:300]}")
    ops_cfg.set_fused_step(True)


if __name__ == "__main__":
    main()
