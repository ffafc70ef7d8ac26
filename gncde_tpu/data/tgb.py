"""TGB (Temporal Graph Benchmark) node-property dataset ingestion.

Reference: TGBDataSetCfg loading via ``PyGNodePropPredDataset``
(src/configs/dataset_configs.py:589-690). The ``tgb`` package downloads a
CSV edge list (source, destination, timestamp, weight); this environment has
zero network egress, so here the loader reads an on-disk TGB-format CSV if
present (the layout ``tgb`` caches under ``<root>/<name>/<name>_edgelist.csv``)
and otherwise raises with instructions. Snapshot construction (time
bucketing, dense adjacency, features = adjacency rows) matches the reference.
"""

from __future__ import annotations

import csv
import typing as tp
from pathlib import Path

import numpy as np

from .windows import Snapshot, to_dense_adj

MINUTE_DURATION = 60
HOUR_DURATION = 60 * MINUTE_DURATION
DAY_DURATION = 24 * HOUR_DURATION
WEEK_DURATION = 7 * DAY_DURATION
MONTH_DURATION = 30 * DAY_DURATION
YEAR_DURATION = 365 * DAY_DURATION

FREQUENCY_DURATIONS = {
    "None": 1,
    "daily": DAY_DURATION,
    "weekly": WEEK_DURATION,
    "monthly": MONTH_DURATION,
    "yearly": YEAR_DURATION,
}


class TemporalEdges(tp.NamedTuple):
    src: np.ndarray
    dst: np.ndarray
    t: np.ndarray
    msg: tp.Optional[np.ndarray]
    num_nodes: int


def load_tgb_edgelist(name: str, data_dir: str = "datasets") -> TemporalEdges:
    """Load a TGB edge list from disk (no network access)."""
    base = Path(data_dir)
    underscored = name.replace("-", "_")
    candidates = [
        base / name / f"{name}_edgelist.csv",
        base / name / f"{underscored}_edgelist.csv",
        base / underscored / f"{underscored}_edgelist.csv",
        base / f"{name}_edgelist.csv",
        base / f"{underscored}_edgelist.csv",
    ]
    path = next((c for c in candidates if c.exists()), None)
    if path is None:
        raise FileNotFoundError(
            f"TGB dataset {name!r} not found under {base}/. This environment "
            "has no network egress; place the TGB edgelist CSV at "
            f"{candidates[0]} (columns: timestamp/ts, source/src, "
            "destination/dst[, weight/w])."
        )
    srcs, dsts, ts, ws = [], [], [], []
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        cols = {c.strip().lower(): i for i, c in enumerate(header)}

        def col(*names):
            for nme in names:
                if nme in cols:
                    return cols[nme]
            return None

        i_t = col("timestamp", "ts", "time", "t", "year")
        i_s = col("source", "src", "u")
        i_d = col("destination", "dst", "target", "i", "v")
        i_w = col("weight", "w", "msg")
        for row in reader:
            if not row:
                continue
            ts.append(float(row[i_t]))
            srcs.append(row[i_s])
            dsts.append(row[i_d])
            ws.append(float(row[i_w]) if i_w is not None else 1.0)

    # Node ids may be strings; build a joint index.
    nodes = {}
    for v in srcs + dsts:
        if v not in nodes:
            nodes[v] = len(nodes)
    src = np.array([nodes[v] for v in srcs], dtype=np.int64)
    dst = np.array([nodes[v] for v in dsts], dtype=np.int64)
    return TemporalEdges(
        src=src,
        dst=dst,
        t=np.asarray(ts, dtype=np.float64),
        msg=np.asarray(ws, dtype=np.float32),
        num_nodes=len(nodes),
    )


def process_snapshots(
    edges: TemporalEdges, frequency: str = "None"
) -> tp.List[Snapshot]:
    """Bucket edges by ``frequency`` into dense-adjacency snapshots; node
    features are the adjacency rows (dataset_configs.py:615-690)."""
    duration = FREQUENCY_DURATIONS.get(frequency)
    if duration is None:
        raise ValueError(f"Invalid frequency: {frequency}")

    start_time = edges.t.min()
    end_time = edges.t.max()
    snapshots = []
    current = start_time
    while current <= end_time:
        mask = (edges.t >= current) & (edges.t < current + duration)
        src = edges.src[mask]
        dst = edges.dst[mask]
        msg = edges.msg[mask] if edges.msg is not None else None
        adj = to_dense_adj(src, dst, msg, edges.num_nodes)
        snapshots.append(Snapshot(adj=adj, x=adj, t=float(current), src=src))
        current += duration
    return snapshots
