"""Synthetic dynamical-systems dataset generation.

Reference: src/dataset/ode_dataset.py. Differences (intentional, documented):
  * Ground-truth solves run through gncde_tpu.solve (constant dt0 steps, the
    diffrax default the reference hits by passing no controller) as ONE
    vmapped XLA program per graph segment.
  * The reference's SIR path is broken as committed (beta/gamma are never
    forwarded into the solve -- ode_dataset.py:264-276 binds them as unused
    defaults -- and the 3-channel state crashes the downstream squeeze).
    Here SIR integrates the real 3-channel system: class 0 uses
    (beta[0], gamma[0]) ("dies out"), class 1 (beta[1], gamma[1])
    ("spreading"), giving 2*batch_size labelled trajectories, which is what
    the oversampling classification task consumes.
  * ``mixed`` graphs generate 3*batch_size trajectories to match the
    3-class labels (the reference builds 3b graphs but only b initial
    states, which cannot vmap).
"""

from __future__ import annotations

import dataclasses
import logging
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from ..solve import ODETerm, SaveAt, ConstantStepSize, diffeqsolve
from . import ode_systems
from .graph_gen import generate_graphs, degree_laplacian
from .events import gen_events_happen_time, gen_events_happen_graph
from .misc_rect import sample_non_overlapping_rect

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ODEDatasetSpec:
    name: str  # heat | gene | mutualistic | sir
    batch_size: int = 1
    dynamic_graph: bool = False
    all_dynamic: bool = False
    graph_type: str = "grid"
    split_ratio: tp.Sequence[float] = (0.8, 0.2)
    num_nodes: int = 400
    final_time: float = 5.0
    time_tick: int = 100
    sampling_type: str = "irregular"
    method: str = "Dopri5"
    dt0: float = 0.01
    layout: str = "community"
    operator_type: str = "norm_lap"
    padding_mode: str = "same"
    seed: int = 1234
    amp_range: tp.Tuple[float, float] = (0.5, 1.0)
    beta: tp.Tuple[float, float] = (0.5, 1.0)
    gamma: tp.Tuple[float, float] = (0.3, 1.0)
    sparse_scale: int = 10
    event_times: int = 10
    event_p: float = 0.001


@dataclasses.dataclass
class ODEDatasetResult:
    t: np.ndarray  # (B, T)
    x0: np.ndarray  # (B, n, C)
    true_y: np.ndarray  # (B, T, n) or (B, T, n, 3) for sir
    A: np.ndarray  # (B, n, n) static or (B, E+1, n, n) dynamic
    D: np.ndarray
    L: np.ndarray
    labels: np.ndarray
    events_time: tp.Optional[np.ndarray]  # (B, E)
    events_time_indices: tp.Optional[np.ndarray]  # (E,)
    spec: ODEDatasetSpec


def _effective_batch(spec: ODEDatasetSpec) -> int:
    if spec.graph_type == "mixed":
        return 3 * spec.batch_size
    if spec.name.lower() == "sir":
        return 2 * spec.batch_size
    return spec.batch_size


def _labels(spec: ODEDatasetSpec) -> np.ndarray:
    if spec.graph_type == "mixed":
        return np.repeat(np.arange(3), spec.batch_size).reshape(-1, 1)
    if spec.name.lower() == "sir":
        return np.concatenate(
            [np.zeros(spec.batch_size), np.ones(spec.batch_size)]
        )
    return np.zeros(spec.batch_size)


def gen_sampling_time(spec: ODEDatasetSpec, rng: np.random.Generator, batch: int):
    """Reference ode_dataset.py:303-342."""
    if spec.sampling_type == "equal":
        t = np.linspace(0.0, spec.final_time, spec.time_tick)
        return np.tile(t, (batch, 1))
    if spec.sampling_type == "irregular":
        t_full = np.linspace(
            0.0, spec.final_time, spec.time_tick * spec.sparse_scale
        )
        num_points = int(spec.time_tick * 1.2)
        rows = []
        for _ in range(batch):
            sel = np.sort(rng.permutation(t_full)[:num_points])
            sel[0] = 0.0
            rows.append(sel)
        return np.stack(rows, axis=0)
    raise ValueError(f"{spec.sampling_type} sampling is not supported")


def initialize_states(spec: ODEDatasetSpec, rng: np.random.Generator, batch: int):
    """Patch-amplitude grid initialisation (reference ode_dataset.py:93-140),
    expanded to the system's channel count (SIR: S=1-x, I=x, R=0)."""
    N = int(np.ceil(np.sqrt(spec.num_nodes)))
    x0 = np.zeros((batch, N, N))
    center_sizes = [(0.20, 0.20), (0.30, 0.30), (0.20, 0.30)]
    for i in range(batch):
        existing: list = []
        for frac_h, frac_w in center_sizes:
            h = max(1, int(frac_h * N))
            w = max(1, int(frac_w * N))
            r1, c1, r2, c2 = sample_non_overlapping_rect(N, h, w, existing, rng=rng)
            existing.append((r1, c1, r2, c2))
            amp = rng.uniform(*spec.amp_range)
            x0[i, r1:r2, c1:c2] = amp
    flat = x0.reshape(batch, -1, 1)
    if spec.name.lower() == "sir":
        I0 = np.clip(flat[..., 0], 0.0, 1.0)
        return np.stack([1.0 - I0, I0, np.zeros_like(I0)], axis=-1)
    return flat


def solve_segment(
    spec: ODEDatasetSpec,
    L: np.ndarray,
    A: np.ndarray,
    x0: np.ndarray,
    t: np.ndarray,
    betas: np.ndarray,
    gammas: np.ndarray,
) -> np.ndarray:
    """Vmapped ground-truth solve over the batch for one graph segment.

    Returns ys of shape (B, T_seg, n, C). Runs on host CPU: data generation
    compiles once per segment shape, and accelerator round-trips (or a
    remote-TPU tunnel) would dominate -- the training chip is left free.
    """
    max_steps = int(np.ceil(spec.final_time / spec.dt0)) + 4

    def one(L_i, A_i, x0_i, t_i, beta_i, gamma_i):
        vf = ode_systems.make_system(spec.name, A_i, L_i, beta_i, gamma_i)
        sol = diffeqsolve(
            ODETerm(lambda tt, y, args: vf(tt, y)),
            spec.method,
            t0=t_i[0],
            t1=t_i[-1],
            dt0=spec.dt0,
            y0=x0_i,
            stepsize_controller=ConstantStepSize(),
            saveat=SaveAt(ts=t_i),
            max_steps=max_steps,
            adjoint="none",
        )
        return sol.ys

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ys = jax.jit(jax.vmap(one))(
            jnp.asarray(L),
            jnp.asarray(A),
            jnp.asarray(x0),
            jnp.asarray(t),
            jnp.asarray(betas),
            jnp.asarray(gammas),
        )
    return np.asarray(ys)


def generate(spec: ODEDatasetSpec) -> ODEDatasetResult:
    rng = np.random.default_rng(spec.seed)
    batch = _effective_batch(spec)

    event_times = spec.event_times
    if spec.all_dynamic:
        event_times += int(event_times / spec.split_ratio[0] * spec.split_ratio[1])

    t = gen_sampling_time(spec, rng, batch)
    x0 = initialize_states(spec, rng, batch)
    labels = _labels(spec)

    # Per-trajectory SIR parameters: class 0 = dies out, class 1 = spreading.
    if spec.name.lower() == "sir" and spec.graph_type != "mixed":
        betas = np.concatenate(
            [np.full(spec.batch_size, spec.beta[0]), np.full(spec.batch_size, spec.beta[1])]
        )
        gammas = np.concatenate(
            [np.full(spec.batch_size, spec.gamma[0]), np.full(spec.batch_size, spec.gamma[1])]
        )
    else:
        betas = np.full(batch, spec.beta[0])
        gammas = np.full(batch, spec.gamma[0])

    if spec.graph_type == "mixed":
        A = generate_graphs(spec.graph_type, spec.num_nodes, spec.batch_size, spec.seed, spec.layout)
    else:
        A = generate_graphs(spec.graph_type, spec.num_nodes, batch, spec.seed, spec.layout)
    D, L = degree_laplacian(A)

    if not spec.dynamic_graph:
        ys = solve_segment(spec, L, A, x0, t, betas, gammas)
        events_time, event_indices = None, None
        A_out, D_out, L_out = A, D, L
    else:
        events_time, event_indices = gen_events_happen_time(
            t, event_times, spec.split_ratio, spec.all_dynamic, rng=rng
        )
        # Small time grids may not fit the requested event count; clamp to
        # what was actually sampled so segments and graphs stay aligned.
        event_times = len(event_indices)
        A_list, D_list, L_list = gen_events_happen_graph(
            A, event_times, spec.event_p, rng=rng
        )
        segments = []
        state = x0
        for k in range(len(A_list)):
            if k == 0:
                t_seg = t[:, : event_indices[0]]
            elif k == event_times:
                t_seg = t[:, event_indices[k - 1] :]
            else:
                t_seg = t[:, event_indices[k - 1] : event_indices[k]]
            if t_seg.shape[1] == 0:
                continue
            ys_seg = solve_segment(spec, L_list[k], A_list[k], state, t_seg, betas, gammas)
            state = ys_seg[:, -1]
            segments.append(ys_seg)
        ys = np.concatenate(segments, axis=1)
        A_out = np.stack(A_list, axis=1)  # (B, E+1, n, n)
        D_out = np.stack(D_list, axis=1)
        L_out = np.stack(L_list, axis=1)

    # true_y: (B, T, n) for single-channel systems, (B, T, n, 3) for sir.
    if ode_systems.state_channels(spec.name) == 1:
        true_y = ys[..., 0]
    else:
        true_y = ys

    return ODEDatasetResult(
        t=t,
        x0=x0,
        true_y=true_y,
        A=A_out,
        D=D_out,
        L=L_out,
        labels=labels,
        events_time=events_time,
        events_time_indices=event_indices,
        spec=spec,
    )


def split_train_val_test(spec: ODEDatasetSpec, rng: tp.Optional[np.random.Generator] = None):
    """Train / extrapolation / interpolation index split
    (reference ode_dataset.py:344-386)."""
    if rng is None:
        rng = np.random.default_rng(spec.seed + 77)
    if spec.sampling_type == "equal":
        id_train = list(range(round(spec.time_tick * spec.split_ratio[0])))
        id_test_extra = list(
            range(round(spec.time_tick * spec.split_ratio[0]), spec.time_tick)
        )
        id_test_inter = None
    elif spec.sampling_type == "irregular":
        id_test_extra = list(
            range(spec.time_tick, round(spec.time_tick * (1.0 + spec.split_ratio[1])))
        )
        all_indices = list(range(1, spec.time_tick))
        id_test_inter = rng.permutation(all_indices)[
            : round(spec.time_tick * spec.split_ratio[1])
        ].tolist()
        id_test_inter.sort()
        id_train = list(sorted(set(range(spec.time_tick)) - set(id_test_inter)))
    else:
        raise ValueError(f"{spec.sampling_type} sampling is not supported")
    return id_train, id_test_extra, id_test_inter
