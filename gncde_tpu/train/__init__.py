"""Trainers for every reference task family (reference: src/engine/*).

Public surface: ``Trainer`` (dynamical systems, reference trainer.py),
``PGTTrainer``/``RecurrentPGTTrainer`` (trainer_pgt.py /
trainer_recurrent_pgt.py), ``TGBTrainer`` (trainer_tgb.py),
``OversamplingTrainer``/``OversamplingRecurrentTrainer``
(trainer_oversampling*.py), plus the GSPMD sharded step, full-state
checkpointing and the metric logger.
"""

from .trainer import Trainer, make_step_fn
from .windowed import PGTTrainer, RecurrentPGTTrainer, TGBTrainer
from .oversampling import OversamplingTrainer, OversamplingRecurrentTrainer
from .sharded import make_sharded_step
from .logging import MetricLogger
from . import checkpoints, metrics

__all__ = [
    "Trainer",
    "PGTTrainer",
    "RecurrentPGTTrainer",
    "TGBTrainer",
    "OversamplingTrainer",
    "OversamplingRecurrentTrainer",
    "make_step_fn",
    "make_sharded_step",
    "MetricLogger",
    "checkpoints",
    "metrics",
]
