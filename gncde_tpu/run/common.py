"""Shared CLI helpers for run scripts."""

from __future__ import annotations

import typing as tp

import yaml


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
