"""Control-path assembly: padding dynamic graphs over time, stacking the time
channel, interpolation-coefficient precomputation, and train/test data dicts.

Reference: the dataset-side methods of ODEDataSetCfg
(src/configs/dataset_configs.py:107-322). Data-dict key names are kept
identical so downstream code and cached artifacts are interchangeable.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from ..interp import linear_interpolation, backward_hermite_coefficients
from .ode_dataset import ODEDatasetSpec, ODEDatasetResult, split_train_val_test
from .operators import get_graph_operator


def padding_graph_by_time(
    adjacencies: jax.Array,
    events_indices: tp.Optional[jax.Array],
    ts: jax.Array,
    padding_mode: str = "none",
    padding_last: bool = False,
) -> jax.Array:
    """Duplicate each event's adjacency until the next event
    (dataset_configs.py:107-145)."""
    if events_indices is None:
        return jnp.repeat(adjacencies[None, ...], len(ts), axis=0)

    event_idx_arr = jnp.zeros(len(ts), dtype=jnp.int32)
    event_idx_arr = event_idx_arr.at[events_indices].set(1)
    cum_event_idx_arr = jnp.cumsum(event_idx_arr)

    if padding_mode == "none":
        padded_A = jnp.where(
            (event_idx_arr > 0)[:, None, None],
            adjacencies[cum_event_idx_arr],
            jnp.nan,
        )
    else:
        padded_A = adjacencies[cum_event_idx_arr]

    if padding_last and events_indices[-1] != len(ts) - 1:
        padded_A = padded_A.at[-1].set(adjacencies[event_idx_arr[-1]])

    return padded_A


def graph_interpolation_coeffs(
    ts: jax.Array, padded_adjacencies: jax.Array, interpolation: str
):
    """Stack the time channel and compute path coefficients
    (dataset_configs.py:147-173). Channel 0 = time, channel 1 = adjacency."""
    t_index = jnp.broadcast_to(
        ts[:, None, None],
        (ts.shape[0], padded_adjacencies.shape[1], padded_adjacencies.shape[2]),
    )
    X = jnp.stack([t_index, padded_adjacencies], axis=-1)
    if interpolation == "linear":
        return linear_interpolation(ts, X)
    if interpolation == "cubic":
        return backward_hermite_coefficients(ts, X)
    raise ValueError(f"Unknown interpolation method: {interpolation}")


def prepare_graph_path(
    ts: jax.Array,
    adjacencies: jax.Array,
    events_indices: tp.Optional[jax.Array],
    interpolation: str,
    padding_mode: str,
):
    """Truncate to visible events, pad, and compute batched coefficients
    (dataset_configs.py:175-199). ts: (B, T); adjacencies: (B, E+1, n, n)."""
    if events_indices is not None:
        visible = int(np.sum(np.asarray(events_indices) < ts.shape[1]))
        adjacencies = adjacencies[:, : visible + 1, ...]
        events_indices = jnp.asarray(events_indices[:visible])
        pad = jax.vmap(
            lambda a, t: padding_graph_by_time(a, events_indices, t, padding_mode)
        )(jnp.asarray(adjacencies), jnp.asarray(ts))
    else:
        pad = jax.vmap(
            lambda a, t: padding_graph_by_time(a, None, t, padding_mode)
        )(jnp.asarray(adjacencies), jnp.asarray(ts))

    return jax.vmap(lambda t, p: graph_interpolation_coeffs(t, p, interpolation))(
        jnp.asarray(ts), pad
    )


def signal_interpolation_coeffs(ts: jax.Array, signal: jax.Array, interpolation: str):
    """Per-trajectory data-path coefficients (dataset_configs.py:201-234).
    signal: (B, T, n) or (B, T, n, 3)."""
    if signal.ndim == 4:
        t_index = jnp.broadcast_to(
            ts[:, :, None, None],
            (ts.shape[0], signal.shape[1], signal.shape[2], signal.shape[3]),
        )
    else:
        t_index = jnp.broadcast_to(
            ts[:, :, None], (ts.shape[0], signal.shape[1], signal.shape[2])
        )
    X = jnp.stack([t_index, signal], axis=-1)
    if interpolation == "linear":
        return jax.vmap(linear_interpolation)(ts, X)
    if interpolation == "cubic":
        return jax.vmap(backward_hermite_coefficients)(ts, X)
    raise ValueError(f"Unknown interpolation method: {interpolation}")


def apply_operator(spec: ODEDatasetSpec, A: np.ndarray, L: np.ndarray):
    if spec.dynamic_graph:
        return np.asarray(
            jax.vmap(jax.vmap(lambda a, l: get_graph_operator(spec.operator_type, a, l)))(
                jnp.asarray(A), jnp.asarray(L)
            )
        )
    return np.asarray(
        jax.vmap(lambda a, l: get_graph_operator(spec.operator_type, a, l))(
            jnp.asarray(A), jnp.asarray(L)
        )
    )


def get_split_train_data(
    spec: ODEDatasetSpec, dataset: ODEDatasetResult, interpolation: str
) -> tp.Dict[str, jax.Array]:
    """Training data dict (dataset_configs.py:236-283); key names preserved."""
    id_train, id_test_extra, id_test_inter = split_train_val_test(spec)

    OM = apply_operator(spec, dataset.A, dataset.L)

    data_dict = {
        "t": jnp.array(dataset.t),
        "train_t": jnp.array(dataset.t[:, id_train]),
        "true_y": jnp.array(dataset.true_y),
        "train_true_y": jnp.array(dataset.true_y[:, id_train]),
        "true_y0": jnp.array(dataset.x0),
        "id_train": jnp.array(id_train),
        "id_test_extra": jnp.array(id_test_extra),
        "id_test_inter": (
            jnp.array(id_test_inter) if id_test_inter is not None else None
        ),
        "A": jnp.array(OM),
        "A_t": (
            jnp.array(dataset.events_time_indices)
            if dataset.events_time_indices is not None
            else None
        ),
        "events_time": (
            jnp.array(dataset.events_time) if dataset.events_time is not None else None
        ),
        "labels": jnp.array(dataset.labels),
    }

    data_dict["train_graph_path_coeffs"] = prepare_graph_path(
        dataset.t[:, id_train],
        OM,
        dataset.events_time_indices,
        interpolation,
        spec.padding_mode,
    )
    data_dict["val_graph_path_coeffs"] = prepare_graph_path(
        dataset.t, OM, dataset.events_time_indices, interpolation, spec.padding_mode
    )
    data_dict["y_coeffs"] = signal_interpolation_coeffs(
        jnp.asarray(dataset.t), jnp.asarray(dataset.true_y), interpolation
    )
    return data_dict


def get_split_test_data(
    spec: ODEDatasetSpec, dataset: ODEDatasetResult, interpolation: str
) -> tp.Dict[str, jax.Array]:
    """Held-out data dict (dataset_configs.py:285-322)."""
    OM = apply_operator(spec, dataset.A, dataset.L)
    data_dict = {
        "t": jnp.array(dataset.t),
        "true_y": jnp.array(dataset.true_y),
        "true_y0": jnp.array(dataset.x0),
        "A": jnp.array(OM),
        "A_t": (
            jnp.array(dataset.events_time_indices)
            if dataset.events_time_indices is not None
            else None
        ),
        "events_time": (
            jnp.array(dataset.events_time) if dataset.events_time is not None else None
        ),
        "labels": jnp.array(dataset.labels),
    }
    data_dict["test_graph_path_coeffs"] = prepare_graph_path(
        dataset.t, OM, dataset.events_time_indices, interpolation, spec.padding_mode
    )
    data_dict["y_coeffs"] = signal_interpolation_coeffs(
        jnp.asarray(dataset.t), jnp.asarray(dataset.true_y), interpolation
    )
    return data_dict
