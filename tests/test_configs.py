"""Every shipped YAML config must parse into its Trainer schema and the model
must build (the reference's config tree is the public API surface)."""

import glob

import jax.random as jr
import pytest
import yaml

from gncde_tpu.train.trainer import Trainer as DynTrainer
from gncde_tpu.train.windowed import PGTTrainer, TGBTrainer, RecurrentPGTTrainer
from gncde_tpu.train.oversampling import (
    OversamplingTrainer,
    OversamplingRecurrentTrainer,
)

RECURRENT = {"astgcn", "dcrnn", "stid_gcn"}


def _load(path):
    with open(path) as f:
        return yaml.safe_load(f)


def _trainer_for(path, cfg):
    name = cfg["model"]["name"]
    if "/dyn/" in path:
        return DynTrainer(**cfg)
    if "/oversampling/" in path:
        if name in RECURRENT:
            return OversamplingRecurrentTrainer(**cfg)
        return OversamplingTrainer(**cfg)
    if "/pgt/" in path:
        if name in RECURRENT:
            return RecurrentPGTTrainer(**cfg)
        return PGTTrainer(**cfg)
    if "/tgb/" in path:
        return TGBTrainer(**cfg)
    raise AssertionError(path)


ALL_CONFIGS = sorted(glob.glob("configs/**/*.yaml", recursive=True))


def test_config_family_is_complete():
    assert len(ALL_CONFIGS) >= 30


@pytest.mark.parametrize("path", ALL_CONFIGS)
def test_config_parses_and_model_builds(path):
    cfg = _load(path)
    trainer = _trainer_for(path, cfg)
    model = trainer.model.build(jr.PRNGKey(0))
    assert model is not None
