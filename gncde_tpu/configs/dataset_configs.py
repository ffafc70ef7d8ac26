"""Dataset configuration + cache layer (synthetic dynamical systems).

Reference: src/configs/dataset_configs.py:35-458 (ODEDataSetCfg). The pydantic
schema accepts the reference's YAML dataset blocks unchanged. Processed splits
are pickled under ``cache_dir`` keyed by an md5 of the config, and the
reference's seed-mutation quirk for decorrelating val/test
(dataset_configs.py:404, 439: ``seed += 500 / 1000``) is preserved.
"""

from __future__ import annotations

import hashlib
import json
import logging
import pickle
import typing as tp
from pathlib import Path

import numpy as np
import pydantic

from ..data.ode_dataset import ODEDatasetSpec, generate
from ..data import pipeline
from ..data import windows as win
from ..data import tgb as tgb_data
from ..data import pgt as pgt_data

logger = logging.getLogger(__name__)


def _host_shard() -> tp.Tuple[int, int]:
    """(process_index, process_count) of the running job; (0, 1) when JAX
    is single-process or not yet importable. Multi-host runs key every
    cache file by the host so N processes never serialise through (or race
    on) one pickle (SURVEY.md section 5: cache becomes per-host
    shard-aware)."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:  # noqa: BLE001 - cache keying must never fail
        return 0, 1


def _shard_suffix() -> str:
    pi, pc = _host_shard()
    return f"_host{pi}of{pc}" if pc > 1 else ""


class ODEDataSetCfg(pydantic.BaseModel):
    name: tp.Literal["heat", "gene", "mutualistic", "sir"] = pydantic.Field(...)
    batch_size: int = 1
    dynamic_graph: bool = pydantic.Field(...)
    all_dynamic: bool = pydantic.Field(...)
    graph_type: tp.Literal[
        "grid", "random", "power_law", "small_world", "community", "mixed"
    ] = "grid"
    split_ratio: tp.List = [0.8, 0.2]
    num_nodes: int = 400
    final_time: float = 5.0
    time_tick: int = 100
    sampling_type: tp.Literal["irregular", "equal"] = "irregular"
    method: tp.Literal["Dopri5", "Tsit5"] = "Dopri5"
    dt0: float = 0.01
    layout: tp.Literal["community", "degree"] = "community"
    operator_type: tp.Literal["lap", "norm_lap", "kipf", "norm_adj"] = "norm_lap"
    padding_mode: tp.Literal["same", "none"] = "same"
    cache_dir: str = "cache"
    interpolation: tp.Literal["linear", "cubic"] = "cubic"
    seed: int = 1234
    amp_range: tp.Tuple = (0.5, 1.0)
    beta: tp.Tuple[float, float] = (0.5, 1.0)
    gamma: tp.Tuple[float, float] = (0.3, 1.0)

    model_config = pydantic.ConfigDict(extra="forbid")

    def _spec(self) -> ODEDatasetSpec:
        return ODEDatasetSpec(
            name=self.name,
            batch_size=self.batch_size,
            dynamic_graph=self.dynamic_graph,
            all_dynamic=self.all_dynamic,
            graph_type=self.graph_type,
            split_ratio=tuple(self.split_ratio),
            num_nodes=self.num_nodes,
            final_time=self.final_time,
            time_tick=self.time_tick,
            sampling_type=self.sampling_type,
            method=self.method,
            dt0=self.dt0,
            layout=self.layout,
            operator_type=self.operator_type,
            padding_mode=self.padding_mode,
            seed=self.seed,
            amp_range=tuple(self.amp_range),
            beta=tuple(self.beta),
            gamma=tuple(self.gamma),
        )

    def _hash_config(self) -> str:
        config_dict = self.model_dump(exclude={"cache_dir"})
        config_str = json.dumps(config_dict, sort_keys=True, default=str)
        return hashlib.md5(config_str.encode()).hexdigest()

    def _get_cache_path(self, config_hash: str, data_key: str) -> Path:
        cache_dir = Path(self.cache_dir)
        cache_dir.mkdir(parents=True, exist_ok=True)
        return cache_dir / f"cache_{config_hash}_{data_key}{_shard_suffix()}.pkl"

    def _load_or_compute(self, cache_path: Path, compute):
        if cache_path.exists():
            try:
                with open(cache_path, "rb") as f:
                    logger.info("Loaded cache from %s", cache_path)
                    return pickle.load(f)
            except Exception as e:  # noqa: BLE001 - cache corruption tolerated
                logger.info("Cache load failed: %s. Computing fresh result.", e)
        result = compute()
        try:
            with open(cache_path, "wb") as f:
                pickle.dump(result, f)
                logger.info("Saved cache to %s", cache_path)
        except Exception as e:  # noqa: BLE001
            logger.info("Cache save failed: %s", e)
        return result

    def get_training_data(self, train_data_key=None) -> tp.Dict:
        cache_path = self._get_cache_path(self._hash_config(), "default_train")

        def compute():
            import jax

            # Data prep runs on host CPU (one-shot shapes; keeps the
            # training accelerator free and avoids per-shape compiles there).
            with jax.default_device(jax.devices("cpu")[0]):
                dataset = generate(self._spec())
                return pipeline.get_split_train_data(
                    self._spec(), dataset, self.interpolation
                )

        return self._load_or_compute(cache_path, compute)

    def get_validation_data(self, val_data_key=None) -> tp.Dict:
        cache_path = self._get_cache_path(self._hash_config(), "default_test")
        # Reference quirk: seed shifted to decorrelate the validation draw.
        self.seed += 500

        def compute():
            import jax

            with jax.default_device(jax.devices("cpu")[0]):
                dataset = generate(self._spec())
                return pipeline.get_split_test_data(
                    self._spec(), dataset, self.interpolation
                )

        return self._load_or_compute(cache_path, compute)

    def get_test_data(self, test_data_key=None) -> tp.Dict:
        cache_path = self._get_cache_path(self._hash_config(), "default2_test")
        self.seed += 1000

        def compute():
            import jax

            with jax.default_device(jax.devices("cpu")[0]):
                dataset = generate(self._spec())
                return pipeline.get_split_test_data(
                    self._spec(), dataset, self.interpolation
                )

        return self._load_or_compute(cache_path, compute)


class _WindowedDataSetCfg(pydantic.BaseModel):
    """Shared machinery for windowed temporal datasets (TGB + PGT).

    Mirrors the cache/window behaviour of the reference's TGBDataSetCfg /
    PGTDataSetCfg (dataset_configs.py:461-1223) through one base class
    instead of two near-clones.
    """

    window_size: int = 5
    stride: int = 1
    split_ratio: tp.List[float] = [0.6, 0.2, 0.2]
    interpolation: tp.Literal["linear", "cubic"] = "cubic"
    cache_dir: str = ".cache"
    seed: int = 1234
    # OPT-IN multi-host data parallelism over training windows: each host
    # processes/caches only its round-robin shard. Leave False unless the
    # surrounding training loop synchronises gradients across hosts (the
    # stock windowed trainers do NOT -- they are single-host loops; with
    # sharding on but no psum, each host would silently train a divergent
    # model). The host-keyed cache FILES are always on under multi-host,
    # independent of this knob (no write races either way).
    shard_train_windows: bool = False

    def _hash_config(self) -> str:
        config_dict = self.model_dump(exclude={"cache_dir"})
        config_str = json.dumps(config_dict, sort_keys=True, default=str)
        return hashlib.md5(config_str.encode()).hexdigest()

    def _get_cache_path(self, config_hash: str, data_key: str) -> Path:
        cache_dir = Path(self.cache_dir)
        cache_dir.mkdir(parents=True, exist_ok=True)
        return cache_dir / f"cache_{config_hash}_{data_key}{_shard_suffix()}.pkl"

    def _load_or_compute(self, cache_path: Path, compute):
        if cache_path.exists():
            try:
                with open(cache_path, "rb") as f:
                    logger.info("Loaded cache from %s", cache_path)
                    return pickle.load(f)
            except Exception as e:  # noqa: BLE001
                logger.info("Cache load failed: %s. Computing fresh result.", e)
        result = compute()
        try:
            with open(cache_path, "wb") as f:
                pickle.dump(result, f)
                logger.info("Saved cache to %s", cache_path)
        except Exception as e:  # noqa: BLE001
            logger.info("Cache save failed: %s", e)
        return result

    # Subclasses provide _load_snapshots() and _process_window(window).
    def _split_windows(self):
        snapshots = self._load_snapshots()
        rng = np.random.default_rng(self.seed)
        train_s, val_s, test_s = win.sample_disjoint_window_starts(
            len(snapshots), self.window_size, self.stride, self.split_ratio, rng
        )
        w = self.window_size
        return (
            [snapshots[s : s + w] for s in train_s],
            [snapshots[s : s + w] for s in val_s],
            [snapshots[s : s + w] for s in test_s],
        )

    def _get_loader(self, split_idx: int, data_key: str) -> win.WindowLoader:
        cache_path = self._get_cache_path(self._hash_config(), data_key)

        def compute():
            splits = self._split_windows()
            windows = splits[split_idx]
            if split_idx == 0 and self.shard_train_windows:
                # Opt-in multi-host DP over training windows: each host
                # processes and caches only ITS round-robin shard. The
                # disjoint window split itself is host-independent (same
                # seed), so shards are disjoint and exhaustive. Eval
                # splits stay whole on every host (metrics must be
                # host-independent).
                pi, pc = _host_shard()
                if pc > 1:
                    windows = windows[pi::pc]
            return [self._process_window(wnd) for wnd in windows]

        return win.WindowLoader(self._load_or_compute(cache_path, compute))

    def get_training_data(self, train_data_key=None) -> win.WindowLoader:
        return self._get_loader(0, "default_train")

    def get_validation_data(self, val_data_key=None) -> win.WindowLoader:
        return self._get_loader(1, "default_val")

    def get_test_data(self, test_data_key=None) -> win.WindowLoader:
        return self._get_loader(2, "default2_test")


class TGBDataSetCfg(_WindowedDataSetCfg):
    """TGB node-property windows (reference dataset_configs.py:461-903)."""

    # The ``-synth`` variants are offline surrogates at the real dataset's
    # scale (tools/fetch_tgb.py synthetic) for pipeline validation and
    # benchmarking in zero-egress environments; they never shadow real data.
    name: tp.Literal[
        "tgbn-trade", "tgbn-genre", "tgbn-trade-synth", "tgbn-genre-synth"
    ] = "tgbn-trade"
    frequency: tp.Literal["None", "daily", "weekly", "monthly", "yearly"] = "None"
    data_dir: str = "datasets"
    normalise_features: bool = False
    recompile: bool = False

    model_config = pydantic.ConfigDict(extra="forbid")

    def _load_snapshots(self):
        edges = tgb_data.load_tgb_edgelist(self.name, self.data_dir)
        return tgb_data.process_snapshots(edges, self.frequency)

    def _process_window(self, window):
        return win.process_window_tgb(
            window, self.interpolation, self.normalise_features
        )


class PGTDataSetCfg(_WindowedDataSetCfg):
    """PGT pickled-snapshot windows (reference dataset_configs.py:906-1223)."""

    name: tp.Literal["england-covid", "twitter-tennis"] = pydantic.Field(...)

    model_config = pydantic.ConfigDict(extra="forbid")

    def _load_snapshots(self):
        return pgt_data.load_pgt_snapshots(self.name)

    def _process_window(self, window):
        return win.process_window_pgt(window, self.interpolation)
