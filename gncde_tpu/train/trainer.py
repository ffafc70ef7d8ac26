"""Dynamical-systems trainer (full-batch, inter/extra-polation evaluation).

Reference: src/engine/trainer.py. The epoch loop, metric names, best-val
checkpointing and patience early-stop match; additions over the reference:
deterministic resume from a full-state checkpoint and solver-step stats.
The jitted train step is a plain ``jax.jit`` (models are pytrees with static
aux; no filtered-transform machinery needed).
"""

from __future__ import annotations

import functools
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

from ..nn import (
    filter_value_and_grad,
    partition,
    is_inexact_array,
    apply_updates,
    num_params,
)
from ..models import GraphNeuralCDE, GraphNeuralODE
from ..configs import (
    WandBConfig,
    GraphNeuralCDECfg,
    GraphNeuralODECfg,
    ODEDataSetCfg,
    OptimiserCfg,
    MSELossCfg,
    L1LossCfg,
)
from .logging import MetricLogger
from . import checkpoints

logging.basicConfig(level=logging.INFO)


def make_step_fn(optimiser: optax.GradientTransformation, loss: tp.Callable):
    """Build the jitted training step (reference trainer.py:288-327).

    Model and optimiser state buffers are donated: the update happens
    in-place on device, halving parameter-memory pressure.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(model, opt_state, data_i):
        loss_val, grads = filter_value_and_grad(loss)(model, data_i)

        flat_grads = [
            g for g in jax.tree_util.tree_leaves(grads) if g is not None
        ]
        max_grad = jnp.max(
            jnp.abs(jnp.concatenate([g.ravel() for g in flat_grads]))
        )

        params, _ = partition(model, is_inexact_array)
        updates, opt_state = optimiser.update(grads, opt_state, params)
        model = apply_updates(model, updates)

        flat_updates = [
            u for u in jax.tree_util.tree_leaves(updates) if u is not None
        ]
        max_update = jnp.max(
            jnp.abs(jnp.concatenate([u.ravel() for u in flat_updates]))
        )
        return loss_val, model, opt_state, max_grad, max_update

    return step


class Trainer(pydantic.BaseModel):
    """Dyn-task trainer; YAML-compatible with the reference Trainer schema."""

    wandb: WandBConfig = WandBConfig()
    model: tp.Union[GraphNeuralCDECfg, GraphNeuralODECfg] = pydantic.Field(
        ..., discriminator="name"
    )
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
    loss: tp.Union[MSELossCfg, L1LossCfg] = pydantic.Field(..., discriminator="name")
    logger_name: str = "gncde"
    resume: bool = False
    metrics_jsonl: tp.Optional[str] = None
    # Scaled-n sparse message passing: convert the dense graph-path
    # coefficients to interp.SparseMatrixControl (ELL) host-side, so the
    # solver hot loop is O(nnz * H) instead of O(n^2). Exact at any density
    # (the ELL pattern is the union of nonzero coefficient entries).
    sparse_control: bool = False
    sparse_max_degree: tp.Optional[int] = None
    # Sparse layout: "ell" (element-sparse), "bcsr" (blocked-ELL, Pallas
    # block kernels -- the banded/clustered-pattern surface), or "auto"
    # (route by blocked fill ratio; interp.bcsr_paths.build_sparse_control).
    sparse_format: tp.Literal["ell", "bcsr", "auto"] = "ell"
    sparse_block_size: int = 128
    # "bf16" runs message passing in bfloat16 (f32 accumulation + solver
    # control); see ops.set_fusion_precision and PERFORMANCE.md bf16 study.
    fusion_precision: tp.Optional[str] = None
    fusion_backend: tp.Optional[str] = None
    # Failure detection (SURVEY.md section 5: the reference has no in-run
    # recovery): when the train loss goes non-finite, restore the last
    # full-state checkpoint (or reinitialise if none exists yet) and keep
    # training; abort with FloatingPointError after max_restores attempts
    # so a deterministically diverging run fails loudly instead of looping.
    nan_guard: bool = False
    nan_guard_max_restores: int = 3

    model_config = pydantic.ConfigDict(extra="ignore")

    def _hash_config(self) -> str:
        config_str = json.dumps(self.model_dump(), sort_keys=True, default=str)
        return hashlib.md5(config_str.encode()).hexdigest()

    def _resume_hash(self) -> str:
        """Config identity for resume: run-length/logging knobs excluded so
        'train for longer' resumes instead of restarting."""
        payload = self.model_dump(
            exclude={
                "epochs", "patience", "min_epochs", "log_freq", "eval_freq",
                "resume", "metrics_jsonl", "checkpoint_name", "logger_name",
                "wandb",
            }
        )
        config_str = json.dumps(payload, sort_keys=True, default=str)
        return hashlib.md5(config_str.encode()).hexdigest()

    def run_initialisations(self):
        random.seed(self.seed)
        np.random.seed(self.seed)
        from .. import ops as ops_config

        if self.fusion_precision is not None:
            ops_config.set_fusion_precision(self.fusion_precision)
        if self.fusion_backend is not None:
            ops_config.set_fusion_backend(self.fusion_backend)

    def _data_tuple(self, model, d, t_key, coeffs_key, y_key, y0_key):
        if isinstance(model, GraphNeuralODE):
            return (
                d[t_key],
                d[coeffs_key],
                d[y_key],
                d[y0_key],
                d["A"],
                d["events_time"],
            )
        return (d[t_key], d[coeffs_key], d[y_key], d[y0_key])

    def run(self) -> tp.Dict[str, float]:
        self.run_initialisations()
        config_hash = self._hash_config()
        logger = logging.getLogger(self.logger_name)
        logger.setLevel(logging.INFO)
        logger.info(self)

        trainer_key = jr.PRNGKey(self.seed)
        train_data_key, val_data_key, test_data_key, model_key, optimiser_key = (
            jr.split(trainer_key, 5)
        )
        train_data_dict = self.dataset.get_training_data(train_data_key)
        val_data_dict = self.dataset.get_validation_data(val_data_key)
        test_data_dict = self.dataset.get_test_data(test_data_key)
        logger.info("Data loading done")

        if self.sparse_control:
            from ..interp import build_sparse_control

            interpolation = getattr(self.model, "interpolation", "cubic")
            for dct in (train_data_dict, val_data_dict, test_data_dict):
                for ckey, tkey in (
                    ("train_graph_path_coeffs", "train_t"),
                    ("val_graph_path_coeffs", "t"),
                    ("test_graph_path_coeffs", "t"),
                ):
                    if ckey in dct:
                        dct[ckey] = build_sparse_control(
                            interpolation,
                            dct[tkey],
                            dct[ckey],
                            sparse_format=self.sparse_format,
                            max_degree=self.sparse_max_degree,
                            block_size=self.sparse_block_size,
                        )
            logger.info(
                "Sparse control conversion done (format=%s)",
                self.sparse_format,
            )
        else:
            # Build the slim control (time-channel strip + optional bf16
            # coefficient planes) HERE, eagerly, not inside the jitted step.
            # Inside the step the channel slice is a producer XLA cannot fuse
            # into a pallas_call operand, so under the checkpointed-adjoint
            # remat the full (T-1, n, n) planes get re-materialised over and
            # over (measured 13x train-step blowup on the flagship dyn
            # config with the megakernel backend: 17.7 s vs 1.35 s per step).
            from ..models.continuous import make_control

            interpolation = getattr(self.model, "interpolation", "cubic")
            for dct in (train_data_dict, val_data_dict, test_data_dict):
                for ckey, tkey in (
                    ("train_graph_path_coeffs", "train_t"),
                    ("val_graph_path_coeffs", "t"),
                    ("test_graph_path_coeffs", "t"),
                ):
                    if ckey in dct and not hasattr(dct[ckey], "adj"):
                        dct[ckey] = make_control(
                            interpolation, dct[tkey], dct[ckey], slim=True
                        )
            logger.info("Slim control conversion done")

        model = self.model.build(model_key)
        optimiser, schedule = self.optimiser.build(optimiser_key)
        params, _ = partition(model, is_inexact_array)
        opt_state = optimiser.init(params)

        loss = self.loss.build()
        validation_loss_fn = jax.jit(self.loss.build_validation_loss())
        step = make_step_fn(optimiser, loss)

        metric_logger = MetricLogger(
            project=self.wandb.project,
            mode=self.wandb.mode,
            jsonl_path=self.metrics_jsonl,
            config=self.model_dump(),
        )
        metric_logger.log({"num_params": num_params(model)})

        start_epoch = 0
        best_validation_loss, corr_test_loss, best_epoch = np.inf, np.inf, 0
        corr_test_l1_loss = np.inf
        resume_dir = os.path.join(self.checkpoint_dir, f"{self._resume_hash()}_state")
        if self.resume:
            restored = checkpoints.load_state(
                resume_dir,
                checkpoints.TrainState(model, opt_state, 0, float("inf")),
            )
            if restored is not None:
                model, opt_state = restored.model, restored.opt_state
                start_epoch = restored.epoch + 1
                best_validation_loss = restored.best_metric
                logger.info("Resumed from epoch %d", start_epoch)

        patience_counter = 0
        # Best-state saves run in the background (training continues while
        # the previous checkpoint commits); see AsyncStateCheckpointer.
        state_ckptr = (
            checkpoints.AsyncStateCheckpointer(resume_dir)
            if self.checkpoint_dir
            else None
        )

        train_data_i = self._data_tuple(
            model, train_data_dict, "train_t", "train_graph_path_coeffs",
            "train_true_y", "true_y0",
        )
        val_data_i = self._data_tuple(
            model, train_data_dict, "t", "val_graph_path_coeffs", "true_y", "true_y0"
        )
        separate_val_data_i = self._data_tuple(
            model, val_data_dict, "t", "test_graph_path_coeffs", "true_y", "true_y0"
        )
        test_data_i = self._data_tuple(
            model, test_data_dict, "t", "test_graph_path_coeffs", "true_y", "true_y0"
        )

        nan_restores = 0
        for epoch in range(start_epoch, self.epochs):
            start_time = time.time()
            train_loss, model, opt_state, max_grad, max_update = step(
                model, opt_state, train_data_i
            )
            train_loss.block_until_ready()
            end_time = time.time()

            if self.nan_guard and not np.isfinite(float(train_loss)):
                nan_restores += 1
                metric_logger.log({"nan_restores": nan_restores})
                if nan_restores > self.nan_guard_max_restores:
                    raise FloatingPointError(
                        f"train loss non-finite at epoch {epoch} after "
                        f"{nan_restores - 1} checkpoint restores -- the run "
                        f"diverges deterministically; lower the LR or tighten "
                        f"gradient clipping"
                    )
                if state_ckptr is not None:
                    state_ckptr.wait_until_finished()
                restored = checkpoints.load_state(
                    resume_dir,
                    checkpoints.TrainState(model, opt_state, 0, float("inf")),
                ) if state_ckptr is not None else None
                if restored is not None:
                    model, opt_state = restored.model, restored.opt_state
                    logger.warning(
                        "Non-finite train loss at epoch %d; restored the "
                        "best-state checkpoint from epoch %d (restore %d/%d)",
                        epoch, restored.epoch, nan_restores,
                        self.nan_guard_max_restores,
                    )
                else:
                    model = self.model.build(model_key)
                    params, _ = partition(model, is_inexact_array)
                    opt_state = optimiser.init(params)
                    logger.warning(
                        "Non-finite train loss at epoch %d with no checkpoint "
                        "yet; reinitialised model/optimiser (restore %d/%d)",
                        epoch, nan_restores, self.nan_guard_max_restores,
                    )
                continue

            metric_logger.log(
                {
                    "train_loss": train_loss,
                    "train_step_time": end_time - start_time,
                    "max_grad": max_grad,
                    "max_update": max_update,
                }
            )

            if epoch == 0 or (epoch + 1) % self.log_freq == 0:
                logger.info(
                    "Epoch: %04d, Train Loss: %s, Train Step Time: %.4fs, LR: %s",
                    epoch + 1, train_loss, end_time - start_time, schedule(epoch),
                )

            if (epoch + 1) % self.eval_freq == 0:
                total_validation_loss, total_validation_loss_l1 = validation_loss_fn(
                    model, val_data_i
                )
                validation_ids_total = jnp.hstack(
                    [train_data_dict["id_test_inter"], train_data_dict["id_test_extra"]]
                )
                validation_loss_inter = jnp.mean(
                    total_validation_loss[:, train_data_dict["id_test_inter"]]
                )
                validation_loss_extra = jnp.mean(
                    total_validation_loss[:, train_data_dict["id_test_extra"]]
                )
                validation_loss_total = jnp.mean(
                    total_validation_loss[:, validation_ids_total]
                )
                validation_loss_l1_total = (
                    jnp.mean(total_validation_loss_l1)
                    if total_validation_loss_l1 is not None
                    else jnp.nan
                )

                separate_val_loss, separate_val_l1 = validation_loss_fn(
                    model, separate_val_data_i
                )
                separate_val_loss_total = jnp.mean(separate_val_loss)
                separate_val_loss_l1_total = (
                    jnp.mean(separate_val_l1) if separate_val_l1 is not None else jnp.nan
                )

                logger.info(
                    "Epoch: %04d, Val Inter: %s, Val Extra: %s, Val Total: %s",
                    epoch + 1, validation_loss_inter, validation_loss_extra,
                    validation_loss_total,
                )
                metric_logger.log(
                    {
                        "validation_loss_inter": validation_loss_inter,
                        "validation_loss_extra": validation_loss_extra,
                        "validation_loss_total": validation_loss_total,
                        "validation_loss_l1_total": validation_loss_l1_total,
                        "separate_val_loss_total": separate_val_loss_total,
                        "separate_val_loss_l1_total": separate_val_loss_l1_total,
                        "validation_step_time": time.time() - end_time,
                    }
                )

                if float(separate_val_loss_total) < best_validation_loss:
                    patience_counter = 0
                    best_validation_loss = float(separate_val_loss_total)
                    best_epoch = epoch
                    if state_ckptr is not None:
                        path = checkpoints.save_weights(
                            os.path.join(self.checkpoint_dir, f"{config_hash}.npz"),
                            model,
                        )
                        state_ckptr.save(
                            checkpoints.TrainState(
                                model, opt_state, epoch, best_validation_loss
                            ),
                        )
                        logger.info("Model saved at epoch %d to %s", epoch, path)

                    test_loss_total, test_loss_l1_total = validation_loss_fn(
                        model, test_data_i
                    )
                    corr_test_loss = float(jnp.mean(test_loss_total))
                    corr_test_l1_loss = (
                        float(jnp.mean(test_loss_l1_total))
                        if test_loss_l1_total is not None
                        else float("nan")
                    )
                    metric_logger.log({"test_loss": corr_test_loss})
                else:
                    patience_counter += 1
                    if (
                        self.patience > 0
                        and patience_counter * self.eval_freq >= self.patience
                        and epoch > self.min_epochs
                    ):
                        logger.info("Early stopping")
                        break

        if state_ckptr is not None:
            state_ckptr.wait_until_finished()
        logger.info(
            "Best validation loss: %s, test loss: %s, L1 test loss: %s, epoch: %s",
            best_validation_loss, corr_test_loss, corr_test_l1_loss, best_epoch,
        )
        metric_logger.log(
            {
                "validation_loss": best_validation_loss,
                "corr_test_loss": corr_test_loss,
                "best_epoch": best_epoch,
            }
        )
        metric_logger.close()
        return {
            "validation_loss": best_validation_loss,
            "corr_test_loss": corr_test_loss,
            "best_epoch": best_epoch,
        }
