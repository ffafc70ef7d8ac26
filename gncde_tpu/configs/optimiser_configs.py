"""Optimiser + LR-schedule configs.

The field names, defaults, and Literal discriminators ARE the YAML
compatibility surface (reference src/configs/optimiser_configs.py:46-127:
every reference config's ``optimiser:`` block must validate unchanged,
including the reference's quirk of listing "sgd"/"adamw" among the
warmup-schedule name literals). Construction is table-driven over plain
optax factories.
"""

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
    # The extra "sgd"/"adamw" literals mirror the reference schema quirk.
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


# name -> factory(schedule, weight_decay). Only adamw consumes the decay,
# matching the reference's dispatch.
_OPTIMISERS = {
    "sgd": lambda lr, wd: optax.sgd(learning_rate=lr),
    "adam": lambda lr, wd: optax.adam(learning_rate=lr),
    "adamw": lambda lr, wd: optax.adamw(learning_rate=lr, weight_decay=wd),
}


class OptimiserCfg(pydantic.BaseModel):
    name: tp.Literal["adam", "sgd", "adamw"] = pydantic.Field(...)
    weight_decay: float = 0.0
    schedule: tp.Union[ConstantScheduleCfg, WarmupCosineDecayScheduleCfg] = (
        pydantic.Field(..., discriminator="name")
    )
    gradient_clipping: bool = pydantic.Field(...)

    model_config = pydantic.ConfigDict(extra="forbid")

    def build(self, optimiser_key=None):
        """(optimiser, schedule); ``gradient_clipping`` prepends the
        reference's fixed clip_by_global_norm(1.0)."""
        schedule = self.schedule.build()
        optimiser = _OPTIMISERS[self.name](schedule, self.weight_decay)
        if self.gradient_clipping:
            optimiser = optax.chain(optax.clip_by_global_norm(1.0), optimiser)
        return optimiser, schedule
