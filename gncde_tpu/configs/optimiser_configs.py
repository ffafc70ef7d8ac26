"""Optimiser/schedule configs (reference src/configs/optimiser_configs.py)."""

from __future__ import annotations

import typing as tp

import optax
import pydantic


class ConstantScheduleCfg(pydantic.BaseModel):
    name: tp.Literal["constant_schedule"] = "constant_schedule"
    value: float = 0.01

    model_config = pydantic.ConfigDict(extra="forbid")

    def build(self) -> optax.Schedule:
        return optax.constant_schedule(value=self.value)


class WarmupCosineDecayScheduleCfg(pydantic.BaseModel):
    name: tp.Literal["warmup_cosine_decay_schedule", "sgd", "adamw"] = pydantic.Field(...)
    init_value: float = 0.0
    peak_value: float = 1.0
    warmup_steps: int = 50
    decay_steps: int = 1_000
    end_value: float = 0.0

    model_config = pydantic.ConfigDict(extra="forbid")

    def build(self) -> optax.Schedule:
        return optax.warmup_cosine_decay_schedule(
            init_value=self.init_value,
            peak_value=self.peak_value,
            warmup_steps=self.warmup_steps,
            decay_steps=self.decay_steps,
            end_value=self.end_value,
        )


class OptimiserCfg(pydantic.BaseModel):
    name: tp.Literal["adam", "sgd", "adamw"] = pydantic.Field(...)
    weight_decay: float = 0.0
    schedule: tp.Union[ConstantScheduleCfg, WarmupCosineDecayScheduleCfg] = (
        pydantic.Field(..., discriminator="name")
    )
    gradient_clipping: bool = pydantic.Field(...)

    model_config = pydantic.ConfigDict(extra="forbid")

    def build(self, optimiser_key=None):
        schedule = self.schedule.build()
        if self.name == "sgd":
            optimiser = optax.sgd(learning_rate=schedule)
        elif self.name == "adam":
            optimiser = optax.adam(learning_rate=schedule)
        else:
            optimiser = optax.adamw(
                learning_rate=schedule, weight_decay=self.weight_decay
            )
        if self.gradient_clipping:
            optimiser = optax.chain(optax.clip_by_global_norm(1.0), optimiser)
        return optimiser, schedule
