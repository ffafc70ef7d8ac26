"""Anchor the TGB surrogate task metrics with trivial comparators.

The model's surrogate numbers (PERFORMANCE.md: val NDCG@10 0.316 / test
0.227) need falsifiable context. This tool evaluates two baselines on the
SAME dataset splits and metric (reference metric definition:
src/engine/trainer_tgb.py:63-81 -- NDCG@10 over active source rows):

  copy-last   predict the last observed snapshot's interaction weights
              (``x_t[-1]`` -- the strongest naive temporal baseline; row
              softmax is rank-preserving so raw rows give identical NDCG)
  popularity  rank destinations by their global weight aggregated over the
              TRAIN windows' labels, identically for every source

Usage:
    python tools/tgb_comparators.py [--config configs/tgb/trade_synth_perm_equiv_gncde.yaml]

Generates the synthetic surrogate first if the edgelist CSV is absent
(zero-egress environment; see tools/fetch_tgb.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import yaml


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config", default="configs/tgb/trade_synth_perm_equiv_gncde.yaml"
    )
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import jax.random as jr

    from gncde_tpu.configs.dataset_configs import TGBDataSetCfg
    from gncde_tpu.train.metrics import masked_mean_ndcg

    cfg_yaml = yaml.safe_load(open(args.config))
    ds_cfg = cfg_yaml["dataset"]
    data_dir = Path(ds_cfg.get("data_dir", "datasets"))
    name = ds_cfg["name"]
    csv = data_dir / name / f"{name.replace('-', '_')}_edgelist.csv"
    if not csv.exists():
        from tools.fetch_tgb import synthetic

        base = name[: -len("-synth")] if name.endswith("-synth") else name
        synthetic(base, data_dir)

    ds = TGBDataSetCfg(**ds_cfg)
    # Key choreography mirrors _WindowedTrainerBase.run so the splits are
    # the exact ones the model trained on.
    trainer_key = jr.PRNGKey(cfg_yaml.get("seed", 1234))
    train_key, val_key, test_key, *_ = jr.split(trainer_key, 6)
    train = list(ds.get_training_data(train_key))
    val = list(ds.get_validation_data(val_key))
    test = list(ds.get_test_data(test_key))

    # Global destination popularity from TRAIN labels only.
    pop = np.zeros(np.asarray(train[0]["true_y"]).shape[-1])
    for w in train:
        pop += np.asarray(w["true_y"]).sum(axis=0)

    def ndcg(windows, predict):
        vals = []
        for w in windows:
            label = jnp.asarray(w["true_y"])
            mask = jnp.asarray(w["source_mask"])
            pred = jnp.asarray(predict(w))
            vals.append(float(masked_mean_ndcg(label, pred, mask, k=10)))
        return float(np.mean(vals)) if vals else float("nan")

    rng = np.random.default_rng(0)
    predictors = {
        "copy_last": lambda w: np.asarray(w["x_t"])[-1],
        "popularity": lambda w: np.broadcast_to(
            pop, np.asarray(w["true_y"]).shape
        ),
        # Chance floor: any trained model must clear this.
        "random": lambda w: rng.random(np.asarray(w["true_y"]).shape),
    }
    out = {}
    for split_name, windows in (("val", val), ("test", test)):
        for pname, fn in predictors.items():
            out[f"{split_name}_ndcg@10_{pname}"] = round(
                ndcg(windows, fn), 4
            )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
