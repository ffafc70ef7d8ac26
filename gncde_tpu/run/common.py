"""Shared CLI helpers for run scripts."""

from __future__ import annotations

import os
import typing as tp

import yaml


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for every CLI trainer.

    First compiles over the axon TPU tunnel take minutes; the on-disk cache
    (shared with bench.py) makes config-variant reruns start in seconds.
    Opt out with GNCDE_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("GNCDE_NO_COMPILE_CACHE"):
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def apply_overrides(config: dict, overrides: tp.Sequence[str]) -> dict:
    """Apply ``a.b.c=value`` overrides (values parsed as YAML scalars)."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override {item!r} must be key=value")
        key, value = item.split("=", 1)
        parts = key.split(".")
        node = config
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(value)
    return config
