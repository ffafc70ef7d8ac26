"""Neural-net factory config (reference src/configs/neural_nets_configs.py)."""

from __future__ import annotations

import typing as tp

import pydantic

from ..models import neural_nets


class NeuralNetsCfg(pydantic.BaseModel):
    name: tp.Literal["FinalTanhF",] = pydantic.Field(...)
    hidden_dim: int = 64
    data_embed_dim: int = 16
    num_layers: int = 4

    model_config = pydantic.ConfigDict(extra="forbid")

    def build(self, nn_key):
        neural_net_cls = getattr(neural_nets, self.name)
        return neural_net_cls(
            input_dim=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            output_dim=self.hidden_dim * self.data_embed_dim,
            num_layers=self.num_layers,
            key=nn_key,
        )
