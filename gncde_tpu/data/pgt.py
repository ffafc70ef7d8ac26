"""PGT (PyTorch-Geometric-Temporal) dataset ingestion.

Reference: PGTDataSetCfg loading pickled snapshot lists from ``.datasets/``
(src/configs/dataset_configs.py:978-1032). The pickles contain
torch_geometric Data objects; :mod:`gncde_tpu.data.pyg_shim` restores them
without a PyG install. Everything is converted to numpy Snapshots.
"""

from __future__ import annotations

import os
import pickle
import typing as tp
from pathlib import Path

import numpy as np

from .pyg_shim import install as _install_shim
from .windows import Snapshot, to_dense_adj

DATASET_PATHS = {
    "england-covid": ".datasets/england_dataset.pkl",
    "twitter-tennis": ".datasets/twitter_dataset.pkl",
}


def _to_np(x):
    if x is None:
        return None
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _default_search_dirs() -> tp.Tuple[str, ...]:
    """Search order: $GNCDE_DATA_DIR, cwd, the repo root (vendored copy)."""
    dirs: tp.List[str] = []
    env = os.environ.get("GNCDE_DATA_DIR")
    if env:
        dirs.append(env)
    dirs.append(".")
    # The repo vendors .datasets/england_dataset.pkl two levels above this file.
    dirs.append(str(Path(__file__).resolve().parents[2]))
    return tuple(dirs)


def load_pgt_snapshots(
    name: str, search_dirs: tp.Optional[tp.Sequence[str]] = None
) -> tp.List[Snapshot]:
    """Load and densify the pickled snapshot list for a PGT dataset."""
    if name not in DATASET_PATHS:
        raise ValueError(f"Unknown PGT dataset {name!r}")
    if search_dirs is None:
        search_dirs = _default_search_dirs()
    rel = DATASET_PATHS[name]
    path = None
    for d in search_dirs:
        cand = Path(d) / rel
        # $GNCDE_DATA_DIR may point directly at a directory of pickles.
        for c in (cand, Path(d) / Path(rel).name):
            if c.exists():
                path = c
                break
        if path is not None:
            break
    if path is None:
        raise FileNotFoundError(
            f"PGT pickle {rel} not found under {list(search_dirs)}; "
            "set $GNCDE_DATA_DIR or place it under .datasets/"
        )

    _install_shim()
    with open(path, "rb") as f:
        raw = pickle.load(f)

    snapshots = []
    for t, d in enumerate(raw):
        edge_index = _to_np(d.edge_index)
        edge_attr = _to_np(getattr(d, "edge_attr", None))
        x = _to_np(d.x)
        y = _to_np(getattr(d, "y", None))
        n = x.shape[0]
        adj = to_dense_adj(edge_index[0], edge_index[1], edge_attr, n)
        snapshots.append(Snapshot(adj=adj, x=x, y=y, t=float(t)))
    return snapshots
