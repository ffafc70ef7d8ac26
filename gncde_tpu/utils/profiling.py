"""Profiling and throughput instrumentation.

The reference's only tracing is wall-clock timers logged to wandb
(src/engine/trainer.py:122, 146-151; SURVEY.md section 5). This module adds
the TPU-native toolkit: jax.profiler trace capture around training steps and
roofline-style throughput counters (edges/s, solver steps/s) derived from
solver stats.
"""

from __future__ import annotations

import contextlib
import time
import typing as tp

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gncde_trace"):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a captured trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock + derived throughput for repeated steps."""

    def __init__(self):
        self.times: tp.List[float] = []
        self._t0: tp.Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def vf_throughput(
    num_nodes: int,
    batch: int,
    num_layers: int,
    solver_stats: tp.Dict[str, tp.Any],
    evals_per_step: int,
    wall_time_s: float,
) -> tp.Dict[str, float]:
    """edges/s + steps/s counters from solver stats (the BASELINE.json
    metrics). Dense operator => n^2 'edges' per layer eval."""
    steps = float(solver_stats["num_accepted_steps"]) + float(
        solver_stats["num_rejected_steps"]
    )
    vf_evals = steps * evals_per_step * batch
    edges = vf_evals * num_layers * num_nodes * num_nodes
    return {
        "solver_steps_per_s": steps / wall_time_s if wall_time_s else 0.0,
        "vf_evals_per_s": vf_evals / wall_time_s if wall_time_s else 0.0,
        "edges_per_s": edges / wall_time_s if wall_time_s else 0.0,
    }
