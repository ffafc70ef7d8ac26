"""Loss configs for the dynamical-systems task.

Reference: src/configs/loss_configs.py. Losses dispatch on the model class and
vmap the model over the batch axis (loss_configs.py:37-47); validation losses
return per-timestep (metric, MAE) pairs (loss_configs.py:74-76).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import pydantic

from ..models import GraphNeuralCDE, GraphNeuralODE


def _predict(model, data_i):
    if isinstance(model, GraphNeuralODE):
        t_i, coeffs_adj_i, label_i, x0_i, adjacency_list, events_time = data_i
        pred_y = jax.vmap(
            lambda t, c, x0, al, et: model(t, c, x0, al, et)
        )(t_i, coeffs_adj_i, x0_i, adjacency_list, events_time)
    elif isinstance(model, GraphNeuralCDE):
        t_i, coeffs_adj_i, label_i, x0_i = data_i
        pred_y = jax.vmap(model)(t_i, coeffs_adj_i, x0_i)
    else:
        raise ValueError(f"Unsupported model {type(model).__name__}")
    return jnp.squeeze(pred_y, axis=-1), label_i


class MSELossCfg(pydantic.BaseModel):
    name: tp.Literal["MSE"] = pydantic.Field(...)
    model_config = pydantic.ConfigDict(extra="forbid")

    @staticmethod
    def mse_loss(model, data_i) -> jax.Array:
        pred_y, label_i = _predict(model, data_i)
        return jnp.mean((pred_y - label_i) ** 2)

    @staticmethod
    def validation_mse_loss(model, data_i):
        pred_y, label_i = _predict(model, data_i)
        return (
            jnp.mean((pred_y - label_i) ** 2, axis=-1),
            jnp.mean(jnp.abs(pred_y - label_i), axis=-1),
        )

    def build(self):
        return self.mse_loss

    def build_validation_loss(self):
        return self.validation_mse_loss


class L1LossCfg(pydantic.BaseModel):
    name: tp.Literal["L1"] = pydantic.Field(...)
    model_config = pydantic.ConfigDict(extra="forbid")

    @staticmethod
    def l1_loss(model, data_i) -> jax.Array:
        pred_y, label_i = _predict(model, data_i)
        return jnp.mean(jnp.abs(pred_y - label_i))

    @staticmethod
    def validation_l1_loss(model, data_i):
        pred_y, label_i = _predict(model, data_i)
        return jnp.mean(jnp.abs(pred_y - label_i), axis=-1), None

    def build(self):
        return self.l1_loss

    def build_validation_loss(self):
        return self.validation_l1_loss
