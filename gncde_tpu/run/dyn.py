"""Dynamical-systems training entry point.

Reference: src/run/dyn/single_run.py (which hardcodes its config path); here
the config comes from ``--config`` with optional ``key=value`` dotted
overrides, e.g.::

    python -m gncde_tpu.run.dyn --config configs/dyn/perm_equiv_gncde.yaml \
        epochs=100 dataset.num_nodes=100
"""

from __future__ import annotations

import argparse

import yaml

from ..train.trainer import Trainer
from .common import apply_overrides, enable_compilation_cache


def main(argv=None):
    enable_compilation_cache()
    # Multi-host bootstrap (no-op single-process; env-driven on pods).
    from ..parallel import multihost

    multihost.initialize()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="Path to YAML config")
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        config_yaml = yaml.safe_load(f)
    config_yaml = apply_overrides(config_yaml, args.overrides)

    trainer = Trainer(**config_yaml)
    return trainer.run()


if __name__ == "__main__":
    main()
