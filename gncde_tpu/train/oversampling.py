"""Graph-classification ("oversampling") trainers over synthetic systems.

Reference: src/engine/trainer_oversampling.py (full-batch CE + accuracy over
``jax.vmap(PGTGraphNeuralCDE)`` with the signal path as CDE control) and
trainer_oversampling_recurrent.py (discrete baselines, node-logit sum).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import random
import time
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import optax
import pydantic

from ..nn import partition, is_inexact_array, num_params
from ..configs import (
    WandBConfig,
    OptimiserCfg,
    ODEDataSetCfg,
    PGTGraphNeuralCDECfg,
    StidGCNCfg,
    ASTGCNCfg,
    DCRNNCfg,
)
from .logging import MetricLogger
from .windowed import make_window_step_fn
from . import checkpoints

logging.basicConfig(level=logging.INFO)


def cross_entropy_loss(model, data_i):
    """Reference trainer_oversampling.py:25-53."""
    t_i, adj_coeffs_i, x_coeffs, x0_i, label_i = data_i
    pred_logits = jax.vmap(model)(t_i, adj_coeffs_i, x_coeffs, x0_i)
    loss = optax.softmax_cross_entropy_with_integer_labels(
        pred_logits, label_i.astype(jnp.int32)
    )
    predictions = jnp.argmax(pred_logits, axis=-1)
    return jnp.mean(loss), jnp.mean(predictions == label_i)


def recurrent_cross_entropy_loss(model, data_i, *, key):
    """Reference trainer_oversampling_recurrent.py:25-55 (node-logit sum)."""
    from ..models.dcrnn import DCRNNModelSingleStep

    x0_i, label_i, adj = data_i
    if isinstance(model, DCRNNModelSingleStep):
        out = jax.vmap(model)(x0_i, adj)
        pred_logits = jnp.squeeze(jnp.sum(out, axis=-2))
    else:
        out = jax.vmap(model, in_axes=(0, None))(x0_i, key)
        pred_logits = jnp.squeeze(jnp.sum(out, axis=-2))
    loss = optax.softmax_cross_entropy_with_integer_labels(
        pred_logits, label_i.astype(jnp.int32)
    )
    predictions = jnp.argmax(pred_logits, axis=-1)
    return jnp.mean(loss), jnp.mean(predictions == label_i)


class OversamplingTrainer(pydantic.BaseModel):
    """Full-batch classification trainer (reference trainer_oversampling.py)."""

    wandb: WandBConfig = WandBConfig()
    model: PGTGraphNeuralCDECfg = pydantic.Field(...)
    epochs: int = 2000
    patience: int = -1
    min_epochs: int = 100
    seed: int = 1234
    log_freq: int = 10
    eval_freq: int = 10
    checkpoint_dir: str = ".checkpoints/"
    checkpoint_name: str = "model"
    dataset: ODEDataSetCfg = pydantic.Field(...)
    optimiser: OptimiserCfg = pydantic.Field(...)
    logger_name: str = "gncde-oversampling"
    metrics_jsonl: tp.Optional[str] = None

    model_config = pydantic.ConfigDict(extra="ignore")

    def _hash_config(self) -> str:
        config_str = json.dumps(self.model_dump(), sort_keys=True, default=str)
        return hashlib.md5(config_str.encode()).hexdigest()

    @staticmethod
    def _data_tuple(d):
        return (
            d["t"], d["val_graph_path_coeffs"], d["y_coeffs"], d["true_y0"],
            d["labels"],
        )

    @staticmethod
    def _test_tuple(d):
        return (
            d["t"], d["test_graph_path_coeffs"], d["y_coeffs"], d["true_y0"],
            d["labels"],
        )

    def run(self) -> tp.Dict[str, float]:
        random.seed(self.seed)
        np.random.seed(self.seed)
        config_hash = self._hash_config()
        logger = logging.getLogger(self.logger_name)
        logger.setLevel(logging.INFO)
        logger.info(self)

        trainer_key = jr.PRNGKey(self.seed)
        train_key, val_key, test_key, model_key, opt_key = jr.split(trainer_key, 5)
        train_d = self.dataset.get_training_data(train_key)
        val_d = self.dataset.get_validation_data(val_key)
        test_d = self.dataset.get_test_data(test_key)
        logger.info("Data loading done")

        model = self.model.build(model_key)
        metric_logger = MetricLogger(
            project=self.wandb.project, mode=self.wandb.mode,
            jsonl_path=self.metrics_jsonl, config=self.model_dump(),
        )
        metric_logger.log({"num_params": num_params(model)})

        optimiser, schedule = self.optimiser.build(opt_key)
        params, _ = partition(model, is_inexact_array)
        opt_state = optimiser.init(params)
        step = make_window_step_fn(optimiser, cross_entropy_loss, has_aux=True)
        eval_fn = jax.jit(cross_entropy_loss)

        data_i = self._data_tuple(train_d)
        val_data_i = self._test_tuple(val_d)
        test_data_i = self._test_tuple(test_d)

        best_validation_loss, best_epoch = np.inf, 0
        test_loss, test_acc = np.inf, 0.0
        patience_counter = 0

        for epoch in range(self.epochs):
            start_time = time.time()
            (train_loss, train_acc), model, opt_state, max_grad, max_update = step(
                model, opt_state, data_i
            )
            jax.block_until_ready(train_loss)
            end_time = time.time()
            metric_logger.log(
                {
                    "train_loss": train_loss, "train_acc": train_acc,
                    "train_step_time": end_time - start_time,
                    "max_grad": max_grad, "max_update": max_update,
                }
            )
            if epoch == 0 or (epoch + 1) % self.log_freq == 0:
                logger.info(
                    "Epoch: %04d, Train Loss: %s, Train Acc: %s, Step: %.3fs",
                    epoch + 1, train_loss, train_acc, end_time - start_time,
                )

            if (epoch + 1) % self.eval_freq == 0:
                t0 = time.time()
                val_loss, val_acc = eval_fn(model, val_data_i)
                metric_logger.log(
                    {
                        "validation_loss": val_loss, "validation_acc": val_acc,
                        "validation_step_time": time.time() - t0,
                    }
                )
                logger.info(
                    "Epoch: %04d, Val Loss: %s, Val Acc: %s",
                    epoch + 1, val_loss, val_acc,
                )
                if float(val_loss) < best_validation_loss:
                    patience_counter = 0
                    best_validation_loss = float(val_loss)
                    best_epoch = epoch
                    if self.checkpoint_dir:
                        checkpoints.save_weights(
                            os.path.join(self.checkpoint_dir, f"{config_hash}.npz"),
                            model,
                        )
                    test_loss, test_acc = eval_fn(model, test_data_i)
                    metric_logger.log(
                        {"test_loss": test_loss, "test_acc": test_acc}
                    )
                else:
                    patience_counter += 1
                    if (
                        self.patience > 0
                        and patience_counter * self.eval_freq >= self.patience
                        and epoch > self.min_epochs
                    ):
                        logger.info("Early stopping")
                        break

        summary = {
            "validation_loss": best_validation_loss,
            "corr_test_loss": float(test_loss),
            "corr_test_acc": float(test_acc),
            "best_epoch": best_epoch,
        }
        logger.info("Final: %s", summary)
        metric_logger.log(summary)
        metric_logger.close()
        return summary


class OversamplingRecurrentTrainer(OversamplingTrainer):
    """Discrete-baseline variant (reference trainer_oversampling_recurrent.py)."""

    model: tp.Union[StidGCNCfg, ASTGCNCfg, DCRNNCfg] = pydantic.Field(
        ..., discriminator="name"
    )

    def run(self) -> tp.Dict[str, float]:
        random.seed(self.seed)
        np.random.seed(self.seed)
        config_hash = self._hash_config()
        logger = logging.getLogger(self.logger_name)
        logger.info(self)

        trainer_key = jr.PRNGKey(self.seed)
        train_key, val_key, test_key, model_key, opt_key, run_key = jr.split(
            trainer_key, 6
        )
        train_d = self.dataset.get_training_data(train_key)
        val_d = self.dataset.get_validation_data(val_key)
        test_d = self.dataset.get_test_data(test_key)

        model = self.model.build(model_key)
        metric_logger = MetricLogger(
            project=self.wandb.project, mode=self.wandb.mode,
            jsonl_path=self.metrics_jsonl, config=self.model_dump(),
        )
        metric_logger.log({"num_params": num_params(model)})

        optimiser, schedule = self.optimiser.build(opt_key)
        params, _ = partition(model, is_inexact_array)
        opt_state = optimiser.init(params)

        def loss_with_key(m, d):
            return recurrent_cross_entropy_loss(m, d, key=run_key)

        step = make_window_step_fn(optimiser, loss_with_key, has_aux=True)
        eval_fn = jax.jit(loss_with_key)

        # x_t over the training region drives the recurrent baselines; the
        # label is the class (reference trainer_oversampling_recurrent.py).
        def tuple_of(d):
            # true_y: (B, T, n[, C]) -> model input (B, T, n, C)
            x = d["true_y"]
            if x.ndim == 3:
                x = x[..., None]
            adj = d["A"]
            if adj.ndim == 4:
                adj = adj[:, 0]
            T = x.shape[1]
            adj_t = jnp.repeat(adj[:, None], T, axis=1)
            return (x, d["labels"], adj_t)

        data_i = tuple_of(train_d)
        val_data_i = tuple_of(val_d)
        test_data_i = tuple_of(test_d)

        best_validation_loss, best_epoch = np.inf, 0
        test_loss, test_acc = np.inf, 0.0
        patience_counter = 0
        for epoch in range(self.epochs):
            start_time = time.time()
            (train_loss, train_acc), model, opt_state, max_grad, max_update = step(
                model, opt_state, data_i
            )
            jax.block_until_ready(train_loss)
            metric_logger.log(
                {
                    "train_loss": train_loss, "train_acc": train_acc,
                    "train_step_time": time.time() - start_time,
                    "max_grad": max_grad, "max_update": max_update,
                }
            )
            if (epoch + 1) % self.eval_freq == 0:
                val_loss, val_acc = eval_fn(model, val_data_i)
                metric_logger.log(
                    {"validation_loss": val_loss, "validation_acc": val_acc}
                )
                if float(val_loss) < best_validation_loss:
                    patience_counter = 0
                    best_validation_loss = float(val_loss)
                    best_epoch = epoch
                    if self.checkpoint_dir:
                        checkpoints.save_weights(
                            os.path.join(self.checkpoint_dir, f"{config_hash}.npz"),
                            model,
                        )
                    test_loss, test_acc = eval_fn(model, test_data_i)
                else:
                    patience_counter += 1
                    if (
                        self.patience > 0
                        and patience_counter * self.eval_freq >= self.patience
                        and epoch > self.min_epochs
                    ):
                        break

        summary = {
            "validation_loss": best_validation_loss,
            "corr_test_loss": float(test_loss),
            "corr_test_acc": float(test_acc),
            "best_epoch": best_epoch,
        }
        metric_logger.log(summary)
        metric_logger.close()
        return summary
