"""Sliding-window machinery for temporal graph datasets (TGB + PGT).

Reference: src/dataset/tgb_dataset.py (SlidingWindowTemporalLoader) and the
window-processing methods of TGBDataSetCfg / PGTDataSetCfg
(src/configs/dataset_configs.py:615-811, 1005-1131). Key semantics kept:
  * disjoint randomly-shuffled window starts split 60/20/20,
  * the last snapshot of each window is the prediction target; the window
    body (window[:-1]) forms the control path with times 0..T-2,
  * per-window interpolation coefficients are precomputed once (cached),
  * node features default to adjacency rows for TGB.

Snapshots are plain numpy; coefficients are jnp (ready for device upload).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import numpy as np
import jax.numpy as jnp

from ..interp import linear_interpolation, backward_hermite_coefficients


@dataclasses.dataclass
class Snapshot:
    adj: np.ndarray  # (n, n) dense weighted adjacency
    x: tp.Optional[np.ndarray] = None  # (n, d) node features
    y: tp.Optional[np.ndarray] = None  # targets
    t: float = 0.0
    src: tp.Optional[np.ndarray] = None  # active source nodes (TGB)


def to_dense_adj(
    src: np.ndarray,
    dst: np.ndarray,
    edge_attr: tp.Optional[np.ndarray],
    num_nodes: int,
) -> np.ndarray:
    """Dense weighted adjacency (duplicate edges accumulate), matching
    torch_geometric's to_dense_adj as used at dataset_configs.py:676-680.
    Uses the native C++ accumulator when available (gncde_tpu.native)."""
    from .. import native

    nat = native.dense_adj_native(
        np.asarray(src), np.asarray(dst), edge_attr, num_nodes
    )
    if nat is not None:
        return nat
    A = np.zeros((num_nodes, num_nodes), dtype=np.float32)
    w = (
        np.ones(len(src), dtype=np.float32)
        if edge_attr is None
        else np.asarray(edge_attr, dtype=np.float32)
    )
    np.add.at(A, (np.asarray(src), np.asarray(dst)), w)
    return A


def sample_disjoint_window_starts(
    num_snapshots: int,
    window_size: int,
    stride: int,
    split_ratio: tp.Sequence[float],
    rng: np.random.Generator,
):
    """Shuffled disjoint train/val/test window start indices
    (dataset_configs.py:692-716)."""
    window_starts = np.arange(0, num_snapshots - window_size + 1, stride)
    rng.shuffle(window_starts)
    num_train = int(len(window_starts) * split_ratio[0])
    num_val = int(len(window_starts) * split_ratio[1])
    train = window_starts[:num_train]
    val = window_starts[num_train : num_train + num_val]
    test = window_starts[num_train + num_val :]
    return train, val, test


def _softmax_rows(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _coeffs(ts: jnp.ndarray, signal: jnp.ndarray, interpolation: str):
    """Stack the time channel on ``signal`` and compute path coefficients
    (dataset_configs.py:742-770)."""
    shape = (ts.shape[0],) + signal.shape[1:]
    reshape = (-1,) + (1,) * (signal.ndim - 1)
    t_index = jnp.broadcast_to(ts.reshape(reshape), shape)
    X = jnp.stack([t_index, signal], axis=-1)
    if interpolation == "linear":
        return linear_interpolation(ts, X)
    if interpolation == "cubic":
        return backward_hermite_coefficients(ts, X)
    raise ValueError(f"Unknown interpolation method: {interpolation}")


def process_window_tgb(
    window: tp.List[Snapshot],
    interpolation: str,
    normalise_features: bool = False,
) -> tp.Dict:
    """TGB window dict (dataset_configs.py:772-811)."""
    last = window[-1]
    body = window[:-1]
    times = np.arange(len(body), dtype=np.float32)
    num_nodes = last.x.shape[0]
    source_mask = np.isin(np.arange(num_nodes), last.src)

    if normalise_features:
        x_t = np.stack([_softmax_rows(s.x) for s in body])
    else:
        x_t = np.stack([s.x for s in body])

    A = np.stack([s.adj for s in body])
    data = {
        "t": times,
        "A": A,
        "A_t": times,
        "events_time": times,
        "true_y": last.x,
        "true_y0": body[0].x,
        "x_t": x_t,
        "source_mask": source_mask,
        "start_time": np.float32(body[0].t),
    }
    ts = jnp.asarray(times)
    data["graph_path_coeffs"] = _coeffs(ts, jnp.asarray(A), interpolation)
    data["x_coeffs"] = _coeffs(ts, jnp.asarray(x_t), interpolation)
    return data


def process_window_pgt(window: tp.List[Snapshot], interpolation: str) -> tp.Dict:
    """PGT window dict (dataset_configs.py:1103-1131): target = last
    snapshot's y."""
    last = window[-1]
    body = window[:-1]
    times = np.arange(len(body), dtype=np.float32)
    x_t = np.stack([s.x for s in body])
    A = np.stack([s.adj for s in body])
    data = {
        "t": times,
        "A": A,
        "A_t": times,
        "events_time": times,
        "true_y": last.y,
        "true_y0": body[0].x,
        "x_t": x_t,
    }
    ts = jnp.asarray(times)
    data["graph_path_coeffs"] = _coeffs(ts, jnp.asarray(A), interpolation)
    data["x_coeffs"] = _coeffs(ts, jnp.asarray(x_t), interpolation)
    return data


class WindowLoader:
    """Iterator over processed window dicts (replaces the reference's
    torch DataLoader with identity collate, tgb_dataset.py:202-218)."""

    def __init__(self, windows: tp.List[tp.Dict], shuffle: bool = False, seed: int = 0):
        self.windows = windows
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.windows)

    def __iter__(self):
        order = np.arange(len(self.windows))
        if self.shuffle:
            self._rng.shuffle(order)
        for i in order:
            yield self.windows[i]


class SlidingWindowTemporalDataset:
    """API-parity counterpart of reference tgb_dataset.py:164-198: indexable
    view of overlapping windows over a snapshot sequence."""

    def __init__(self, snapshots: tp.Sequence, window_size: int, stride: int = 1):
        self.snapshots = list(snapshots)
        self.window_size = window_size
        self.stride = stride
        self._starts = list(
            range(0, max(len(self.snapshots) - window_size + 1, 0), stride)
        )

    def __len__(self) -> int:
        return len(self._starts)

    def __getitem__(self, i: int):
        s = self._starts[i]
        return self.snapshots[s : s + self.window_size]


# Loader name used by the reference (tgb_dataset.py:202-218).
SlidingWindowTemporalLoader = WindowLoader
