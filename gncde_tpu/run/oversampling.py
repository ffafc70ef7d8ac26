"""Oversampling (graph classification) entry point.

Reference: src/run/dyn/single_run_oversampling.py (dispatches discrete
baselines to the recurrent variant).
"""

from __future__ import annotations

import argparse

import yaml

from ..train.oversampling import OversamplingTrainer, OversamplingRecurrentTrainer
from .common import apply_overrides, enable_compilation_cache

RECURRENT_MODELS = {"astgcn", "dcrnn", "stid_gcn"}


def main(argv=None):
    enable_compilation_cache()
    # Multi-host bootstrap (no-op single-process; env-driven on pods).
    from ..parallel import multihost

    multihost.initialize()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config_yaml = yaml.safe_load(f)
    config_yaml = apply_overrides(config_yaml, args.overrides)

    if config_yaml["model"]["name"] in RECURRENT_MODELS:
        trainer = OversamplingRecurrentTrainer(**config_yaml)
    else:
        trainer = OversamplingTrainer(**config_yaml)
    return trainer.run()


if __name__ == "__main__":
    main()
