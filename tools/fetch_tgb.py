"""TGB dataset mirror / surrogate tool.

The reference obtains tgbn-trade / tgbn-genre through the ``tgb`` package
(reference src/configs/dataset_configs.py:589-690, PyGNodePropPredDataset),
which downloads a zip from the TGB object store on first use. This
environment has zero network egress, so this tool provides:

``fetch``      the real mirror procedure — run it on any machine WITH
               egress, then copy the resulting ``datasets/<name>/`` folder
               here (or point $GNCDE_DATA_DIR at it). Uses the ``tgb``
               package when installed, else plain HTTPS.

``synthetic``  an offline surrogate at the exact tgbn-trade scale
               (255 nodes, ~31 yearly snapshots, ~470k weighted edges,
               gravity-model weights with AR(1) drift) so the full TGB
               training pipeline — windowing, masked CE, NDCG@10 selection —
               can be exercised and benchmarked at true scale without the
               archive. Task metrics measured on the surrogate validate the
               PIPELINE, not leaderboard parity; swap in the real CSV for
               reportable numbers.

Usage:
    python tools/fetch_tgb.py fetch --name tgbn-trade --out datasets/
    python tools/fetch_tgb.py synthetic --name tgbn-trade --out datasets/
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

TGB_URL = "https://object-arbutus.cloud.computecanada.ca/tgb/{name}.zip"

# Real-dataset shape targets (TGB paper, table 2).
SCALES = {
    "tgbn-trade": dict(num_nodes=255, num_years=31, edges_per_step=15100),
    "tgbn-genre": dict(num_nodes=1505, num_years=133, edges_per_step=130000),
}


def fetch(name: str, out: Path) -> None:
    """Download the real archive (requires network egress)."""
    try:
        from tgb.nodeproppred.dataset_pyg import PyGNodePropPredDataset

        PyGNodePropPredDataset(name=name, root=str(out))
        print(f"fetched {name} via tgb package into {out}/")
        return
    except ImportError:
        pass
    import urllib.request
    import zipfile

    url = TGB_URL.format(name=name.replace("-", "_"))
    dest = out / f"{name}.zip"
    out.mkdir(parents=True, exist_ok=True)
    print(f"downloading {url} ...")
    urllib.request.urlretrieve(url, dest)
    with zipfile.ZipFile(dest) as z:
        z.extractall(out)
    print(f"extracted under {out}/; expected CSV: "
          f"{out}/{name}/{name.replace('-', '_')}_edgelist.csv")


def synthetic(name: str, out: Path, seed: int = 0) -> Path:
    """Write a TGB-format edgelist CSV surrogate at the real dataset's scale.

    Gravity model: w_ij(t) = exp(m_i + m_j + s_ij(t)), with log-normal node
    masses (trade volumes are heavy-tailed) and a per-pair AR(1) drift so
    consecutive snapshots are correlated like real yearly trade flows. The
    active edge set also drifts: ~2% of pairs toggle per step.
    """
    scale = SCALES[name]
    n = scale["num_nodes"]
    T = scale["num_years"]
    e_per = scale["edges_per_step"]
    rng = np.random.default_rng(seed)

    mass = rng.normal(0.0, 1.5, size=n)  # log node "size"
    # Candidate pair pool: sample generously, weighted by mass product.
    logits = mass[:, None] + mass[None, :]
    np.fill_diagonal(logits, -np.inf)
    flat = logits.ravel()
    probs = np.exp(flat - flat.max())
    probs /= probs.sum()
    pool_size = min(int(e_per * 2.5), n * n - n)
    pool = rng.choice(n * n, size=pool_size, replace=False, p=probs)
    src_pool, dst_pool = pool // n, pool % n

    # AR(1) log-weight drift per pooled pair.
    s = rng.normal(0.0, 0.5, size=pool_size)
    active = np.zeros(pool_size, dtype=bool)
    active[rng.choice(pool_size, size=e_per, replace=False)] = True

    dirname = name + "-synth" if not name.endswith("-synth") else name
    ddir = out / dirname
    ddir.mkdir(parents=True, exist_ok=True)
    csv_path = ddir / f"{dirname.replace('-', '_')}_edgelist.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["timestamp", "source", "destination", "weight"])
        for t in range(T):
            s = 0.9 * s + rng.normal(0.0, 0.22, size=pool_size)
            toggle = rng.random(pool_size) < 0.02
            active ^= toggle
            # Keep the active count near the target.
            deficit = e_per - int(active.sum())
            if deficit > 0:
                idle = np.flatnonzero(~active)
                active[rng.choice(idle, size=min(deficit, idle.size),
                                  replace=False)] = True
            idx = np.flatnonzero(active)
            wts = np.exp(mass[src_pool[idx]] + mass[dst_pool[idx]] + s[idx])
            for i, wt in zip(idx, wts):
                w.writerow([t, int(src_pool[i]), int(dst_pool[i]),
                            f"{wt:.6g}"])
    print(f"wrote {csv_path} ({T} snapshots, ~{e_per} edges/step, n={n})")
    return csv_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["fetch", "synthetic"])
    p.add_argument("--name", default="tgbn-trade", choices=list(SCALES))
    p.add_argument("--out", default="datasets")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.mode == "fetch":
        fetch(args.name, Path(args.out))
    else:
        synthetic(args.name, Path(args.out), args.seed)


if __name__ == "__main__":
    sys.exit(main())
