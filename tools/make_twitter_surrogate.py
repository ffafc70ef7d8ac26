"""Offline surrogate for the PGT ``twitter-tennis`` pickle.

The reference loads ``.datasets/twitter_dataset.pkl`` — a pickle of
torch_geometric ``Data`` snapshots exported from torch_geometric_temporal's
``TwitterTennisDatasetLoader`` (rg17: 1000 nodes, 120 hourly snapshots,
16-dim encoded node features, next-step mention-popularity targets; the
reference consumes it via PGTDataSetCfg, src/configs/dataset_configs.py:
983-993).  The pickle is not part of the reference checkout and this
environment has zero network egress, so this tool generates a surrogate at
the REAL dataset's scale with tennis-tournament-like dynamics:

  * a small set of "player" nodes whose latent popularity follows AR(1)
    drift plus match-day bursts (the dominant structure of the real data);
  * each snapshot's mention edges sampled with probability proportional to
    source popularity times a static affinity graph, with integer mention
    counts as ``edge_attr``;
  * ``x``: 16-dim encoded features — 8 one-hot log-degree bins plus an
    8-tap smoothed popularity history, the same "encoded" flavour the real
    loader produces;
  * ``y``: next-step log1p mention count per node (the regression target).

Metrics measured on the surrogate validate the PIPELINE at true scale, not
leaderboard parity — swap in the real pickle for reportable numbers.

Usage:
    python tools/make_twitter_surrogate.py --out .datasets/twitter_dataset.pkl
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gncde_tpu.data.pyg_shim import Data  # noqa: E402  (self-contained unpickle)


def make_twitter_surrogate(
    num_nodes: int = 1000,
    num_snapshots: int = 120,
    num_players: int = 30,
    mean_edges: int = 2500,
    feature_dim: int = 16,
    seed: int = 0,
):
    """Return a list of ``Data`` snapshots at twitter-tennis scale."""
    rng = np.random.default_rng(seed)
    n, T = num_nodes, num_snapshots

    # Latent popularity: players get AR(1) + burst dynamics, the crowd a
    # small baseline.  Bursts cluster on "match days" (every ~12 steps).
    base = np.full(n, -3.0)
    players = rng.choice(n, size=num_players, replace=False)
    base[players] = rng.normal(0.5, 0.8, size=num_players)
    pop = np.zeros((T, n))
    state = base.copy()
    for t in range(T):
        burst = np.zeros(n)
        if t % 12 < 3:  # match window
            active = rng.choice(players, size=max(2, num_players // 4), replace=False)
            burst[active] = rng.gamma(2.0, 1.5, size=active.size)
        state = 0.8 * state + 0.2 * base + burst + rng.normal(0.0, 0.15, n)
        pop[t] = state

    # Static affinity: crowd nodes follow a few preferred players.
    fav = rng.integers(0, num_players, size=n)

    half = feature_dim // 2
    hist = np.zeros((n, half))
    snapshots = []
    rate_t = np.exp(pop)  # (T, n) mention intensity
    for t in range(T):
        # Sample mentions: src ~ crowd, dst ~ favourite player or popular node.
        lam = rate_t[t] / rate_t[t].sum()
        E = rng.poisson(mean_edges)
        src = rng.integers(0, n, size=E)
        toward_fav = rng.random(E) < 0.7
        dst = np.where(
            toward_fav,
            players[fav[src]],
            rng.choice(n, size=E, p=lam),
        )
        keep = src != dst
        src, dst = src[keep], dst[keep]
        # Aggregate duplicate mentions into integer counts.
        key = src.astype(np.int64) * n + dst
        uniq, counts = np.unique(key, return_counts=True)
        edge_index = np.stack([uniq // n, uniq % n]).astype(np.int64)
        edge_attr = counts.astype(np.float32)

        mentions = np.bincount(edge_index[1], weights=edge_attr, minlength=n)
        out_deg = np.bincount(edge_index[0], weights=edge_attr, minlength=n)

        # Features: one-hot log-degree bin  +  smoothed popularity history.
        bins = np.clip(np.log1p(mentions + out_deg).astype(int), 0, half - 1)
        onehot = np.zeros((n, half), np.float32)
        onehot[np.arange(n), bins] = 1.0
        hist = np.roll(hist, 1, axis=1)
        hist[:, 0] = np.log1p(mentions)
        x = np.concatenate([onehot, hist], axis=1).astype(np.float32)

        snapshots.append(
            dict(t=t, edge_index=edge_index, edge_attr=edge_attr, x=x, mentions=mentions)
        )

    out = []
    for t, snap in enumerate(snapshots):
        nxt = snapshots[t + 1]["mentions"] if t + 1 < T else snapshots[t]["mentions"]
        d = Data()
        d.edge_index = snap["edge_index"]
        d.edge_attr = snap["edge_attr"]
        d.x = snap["x"]
        d.y = np.log1p(nxt).astype(np.float32)
        d.num_nodes = num_nodes
        out.append(d)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".datasets/twitter_dataset.pkl")
    ap.add_argument("--num-nodes", type=int, default=1000)
    ap.add_argument("--num-snapshots", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    snaps = make_twitter_surrogate(
        num_nodes=args.num_nodes, num_snapshots=args.num_snapshots, seed=args.seed
    )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(snaps, f)
    print(f"wrote {len(snaps)} snapshots (n={args.num_nodes}) to {out}")


if __name__ == "__main__":
    main()
