"""Submit-once task execution with result caching.

Replaces the role of ``exca.TaskInfra`` in the reference (``infra:
xk.TaskInfra`` + ``@infra.apply`` on Trainer.run, src/engine/trainer.py:52,
89; SURVEY.md section 5): running the same config twice returns the cached
result instead of recomputing. Results are pickled under ``cache_dir`` keyed
by an md5 of the pydantic config dump.
"""

from __future__ import annotations

import functools
import hashlib
import json
import logging
import pickle
import typing as tp
from pathlib import Path

logger = logging.getLogger(__name__)


def config_hash(cfg) -> str:
    if hasattr(cfg, "model_dump"):
        payload = cfg.model_dump()
    else:
        payload = cfg
    return hashlib.md5(
        json.dumps(payload, sort_keys=True, default=str).encode()
    ).hexdigest()


def cached_run(cache_dir: str = ".task_cache"):
    """Decorator for zero-arg methods on pydantic config objects (e.g.
    ``Trainer.run``): caches the return value per config hash."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(self, *args, **kwargs):
            d = Path(cache_dir)
            d.mkdir(parents=True, exist_ok=True)
            path = d / f"{config_hash(self)}_{fn.__name__}.pkl"
            if path.exists():
                try:
                    with open(path, "rb") as f:
                        logger.info("Task cache hit: %s", path)
                        return pickle.load(f)
                except Exception as e:  # noqa: BLE001
                    logger.info("Task cache read failed (%s); recomputing", e)
            result = fn(self, *args, **kwargs)
            try:
                with open(path, "wb") as f:
                    pickle.dump(result, f)
            except Exception as e:  # noqa: BLE001
                logger.info("Task cache write failed: %s", e)
            return result

        return wrapped

    return deco
