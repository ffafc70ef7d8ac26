"""Experiment-tracking config (reference src/configs/wandb_configs.py)."""

from __future__ import annotations

import pydantic


class WandBConfig(pydantic.BaseModel):
    project: str = "GNCDEs"
    mode: str = "auto"  # auto | disabled ("auto" uses wandb when installed)
