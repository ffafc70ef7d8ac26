"""TGB training entry point (reference: src/run/tgb/single_run.py)."""

from __future__ import annotations

import argparse

import yaml

from ..train.windowed import TGBTrainer
from .common import apply_overrides, enable_compilation_cache


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
    return TGBTrainer(**config_yaml).run()


if __name__ == "__main__":
    main()
