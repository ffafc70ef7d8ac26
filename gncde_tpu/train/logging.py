"""Metric logging with wandb-compatible names.

The reference logs scalars straight to wandb (src/engine/trainer.py:148-151,
222-229). Here a small indirection keeps the exact metric names but works
without wandb installed: metrics go to wandb when available+enabled, and
always to an in-memory history + optional JSONL file (so runs are inspectable
in zero-egress environments).
"""

from __future__ import annotations

import json
import logging
import time
import typing as tp
from pathlib import Path

logger = logging.getLogger(__name__)

try:  # wandb is optional in this environment
    import wandb as _wandb
except Exception:  # noqa: BLE001
    _wandb = None


class MetricLogger:
    def __init__(
        self,
        project: str = "GNCDEs",
        mode: str = "auto",
        jsonl_path: tp.Optional[str] = None,
        config: tp.Optional[dict] = None,
    ):
        self.history: tp.List[dict] = []
        self._file = None
        self._use_wandb = False
        if mode != "disabled" and _wandb is not None:
            try:
                _wandb.init(project=project, config=config or {})
                self._use_wandb = True
            except Exception as e:  # noqa: BLE001 - offline envs
                logger.info("wandb unavailable (%s); falling back to JSONL", e)
        if jsonl_path is not None:
            Path(jsonl_path).parent.mkdir(parents=True, exist_ok=True)
            self._file = open(jsonl_path, "a")

    def log(self, metrics: tp.Dict[str, tp.Any]) -> None:
        record = {
            k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()
        }
        record["_time"] = time.time()
        self.history.append(record)
        if self._use_wandb:
            _wandb.log(metrics)
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._use_wandb:
            _wandb.finish()
