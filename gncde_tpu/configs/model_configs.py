"""Model factory configs (reference src/configs/model_configs.py).

All 11 reference model configs with their ``name`` Literal discriminators,
including the reference's mislabeled ``tgb_st_graph_neural_cde`` literal on
TGBSTGraphNeuralODECfg (model_configs.py:187).
"""

from __future__ import annotations

import typing as tp

import jax.random as jr
import pydantic

from .vector_field_configs import VectorFieldCfg
from .neural_nets_configs import NeuralNetsCfg
from ..models import (
    GraphNeuralCDE,
    GraphNeuralODE,
    TGBGraphNeuralCDE,
    TGBGraphNeuralODE,
    TGBSTGraphNeuralCDE,
    PGTGraphNeuralCDE,
    PGTGraphNeuralODE,
    PGTSTGraphNeuralCDE,
)

_INTERP = tp.Literal["linear", "rectilinear", "cubic", "cubic_hermite"]


class GraphNeuralCDECfg(pydantic.BaseModel):
    name: tp.Literal["graph_neural_cde"] = pydantic.Field(...)
    vector_field: VectorFieldCfg
    hidden_dim: int = 64
    interpolation: _INTERP = "linear"
    use_initial: bool = True
    method: tp.Literal["Tsit5", "Dopri5", "Dopri8", "Bosh3", "Euler", "Heun", "Kvaerno3", "Kvaerno3Picard", "KenCarp4", "Kvaerno4", "Kvaerno5"] = "Tsit5"
    return_sequence: bool = True
    max_steps: int = 512
    # "checkpointed" (sqrt-memory adjoint) or "full" (store-all: skips the
    # backward's forward replay; faster when max_steps * state fits HBM).
    adjoint: tp.Literal["checkpointed", "full"] = "checkpointed"

    model_config = pydantic.ConfigDict(extra="forbid")

    def build(self, model_key) -> GraphNeuralCDE:
        model_key, vf_key = jr.split(model_key, 2)
        vector_field = self.vector_field.build(vf_key)
        return GraphNeuralCDE(
            vector_field,
            hidden_dim=self.hidden_dim,
            interpolation=self.interpolation,
            method=self.method,
            return_sequence=self.return_sequence,
            max_steps=self.max_steps,
            adjoint=self.adjoint,
            key=model_key,
        )


class GraphNeuralODECfg(pydantic.BaseModel):
    name: tp.Literal["graph_neural_ode"] = pydantic.Field(...)
    vector_field: VectorFieldCfg
    hidden_dim: int = 64
    interpolation: _INTERP = "linear"
    use_initial: bool = True
    method: tp.Literal["Tsit5", "Dopri5", "Dopri8", "Bosh3", "Euler", "Heun", "Kvaerno3", "Kvaerno3Picard", "KenCarp4", "Kvaerno4", "Kvaerno5"] = "Tsit5"
    return_sequence: bool = True
    max_steps: int = 512
    # "checkpointed" (sqrt-memory adjoint) or "full" (store-all: skips the
    # backward's forward replay; faster when max_steps * state fits HBM).
    adjoint: tp.Literal["checkpointed", "full"] = "checkpointed"

    model_config = pydantic.ConfigDict(extra="forbid")

    def build(self, model_key) -> GraphNeuralODE:
        model_key, vf_key = jr.split(model_key, 2)
        vector_field = self.vector_field.build(vf_key)
        return GraphNeuralODE(
            vector_field,
            hidden_dim=self.hidden_dim,
            interpolation=self.interpolation,
            method=self.method,
            return_sequence=self.return_sequence,
            max_steps=self.max_steps,
            adjoint=self.adjoint,
            key=model_key,
        )


class TGBGraphNeuralCDECfg(pydantic.BaseModel):
    name: tp.Literal["tgb_graph_neural_cde"] = pydantic.Field(...)
    vector_field: VectorFieldCfg
    hidden_dim: int = 64
    interpolation: _INTERP = "linear"
    use_initial: bool = True
    method: tp.Literal["Tsit5", "Dopri5", "Dopri8", "Bosh3", "Euler", "Heun", "Kvaerno3", "Kvaerno3Picard", "KenCarp4", "Kvaerno4", "Kvaerno5"] = "Tsit5"
    return_sequence: bool = True
    use_mlps: bool = False
    dt0: float = 0.01
    # Opt-in (not in the reference): learned persistence-residual head
    # scores = decoder(z) + alpha * last-snapshot features. See
    # models/tgb.py; default off keeps reference parameter-count parity.
    persistence_head: bool = False

    model_config = pydantic.ConfigDict(extra="forbid")

    # "checkpointed" (sqrt-memory adjoint) or "full" (store-all: skips
    # the backward re-integration; more memory, faster step)
    adjoint: tp.Literal["checkpointed", "full"] = "checkpointed"

    def build(self, model_key) -> TGBGraphNeuralCDE:
        model_key, vf_key = jr.split(model_key, 2)
        vector_field = self.vector_field.build(vf_key)
        return TGBGraphNeuralCDE(
            vector_field,
            hidden_dim=self.hidden_dim,
            interpolation=self.interpolation,
            method=self.method,
            return_sequence=self.return_sequence,
            use_mlps=self.use_mlps,
            dt0=self.dt0,
            persistence_head=self.persistence_head,
            adjoint=self.adjoint,
            key=model_key,
        )


class TGBGraphNeuralODECfg(pydantic.BaseModel):
    name: tp.Literal["tgb_graph_neural_ode"] = pydantic.Field(...)
    vector_field: VectorFieldCfg
    hidden_dim: int = 64
    interpolation: _INTERP = "linear"
    use_initial: bool = True
    method: tp.Literal["Tsit5", "Dopri5", "Dopri8", "Bosh3", "Euler", "Heun", "Kvaerno3", "Kvaerno3Picard", "KenCarp4", "Kvaerno4", "Kvaerno5"] = "Tsit5"
    return_sequence: bool = True
    use_mlps: bool = False
    max_steps: int = 1024

    model_config = pydantic.ConfigDict(extra="forbid")

    # "checkpointed" (sqrt-memory adjoint) or "full" (store-all: skips
    # the backward re-integration; more memory, faster step)
    adjoint: tp.Literal["checkpointed", "full"] = "checkpointed"

    def build(self, model_key) -> TGBGraphNeuralODE:
        model_key, vf_key = jr.split(model_key, 2)
        vector_field = self.vector_field.build(vf_key)
        return TGBGraphNeuralODE(
            vector_field,
            hidden_dim=self.hidden_dim,
            interpolation=self.interpolation,
            method=self.method,
            return_sequence=self.return_sequence,
            use_mlps=self.use_mlps,
            max_steps=self.max_steps,
            adjoint=self.adjoint,
            key=model_key,
        )


class TGBSTGraphNeuralODECfg(pydantic.BaseModel):
    # Reference quirk: the literal says "cde" (model_configs.py:187).
    name: tp.Literal["tgb_st_graph_neural_cde"] = pydantic.Field(...)
    f_func: NeuralNetsCfg
    g_func: VectorFieldCfg
    interpolation: _INTERP = "linear"
    use_initial: bool = True
    method: tp.Literal["Tsit5", "Dopri5", "Dopri8", "Bosh3", "Euler", "Heun", "Kvaerno3", "Kvaerno3Picard", "KenCarp4", "Kvaerno4", "Kvaerno5"] = "Tsit5"
    return_sequence: bool = True
    use_mlps: bool = False
    max_steps: int = 4096

    model_config = pydantic.ConfigDict(extra="forbid")

    # "checkpointed" (sqrt-memory adjoint) or "full" (store-all: skips
    # the backward re-integration; more memory, faster step)
    adjoint: tp.Literal["checkpointed", "full"] = "checkpointed"

    def build(self, model_key) -> TGBSTGraphNeuralCDE:
        model_key, f_func_key, g_func_key = jr.split(model_key, 3)
        f_func = self.f_func.build(f_func_key)
        g_func = self.g_func.build(g_func_key, hidden_dim_f=self.f_func.hidden_dim)
        return TGBSTGraphNeuralCDE(
            f_func,
            g_func,
            interpolation=self.interpolation,
            data_embed_dim=self.f_func.data_embed_dim,
            method=self.method,
            return_sequence=self.return_sequence,
            use_mlps=self.use_mlps,
            max_steps=self.max_steps,
            adjoint=self.adjoint,
            key=model_key,
        )


class PGTGraphNeuralCDECfg(pydantic.BaseModel):
    name: tp.Literal["pgt_graph_neural_cde"] = pydantic.Field(...)
    vector_field: VectorFieldCfg
    hidden_dim: int = 64
    data_dim: int
    feature_dim: int
    interpolation: _INTERP = "linear"
    use_initial: bool = True
    method: tp.Literal["Tsit5", "Dopri5", "Dopri8", "Bosh3", "Euler", "Heun", "Kvaerno3", "Kvaerno3Picard", "KenCarp4", "Kvaerno4", "Kvaerno5"] = "Tsit5"
    return_sequence: bool = True
    dt0: float = 0.1

    model_config = pydantic.ConfigDict(extra="forbid")

    # "checkpointed" (sqrt-memory adjoint) or "full" (store-all: skips
    # the backward re-integration; more memory, faster step)
    adjoint: tp.Literal["checkpointed", "full"] = "checkpointed"

    def build(self, model_key) -> PGTGraphNeuralCDE:
        model_key, vf_key = jr.split(model_key, 2)
        vector_field = self.vector_field.build(vf_key)
        return PGTGraphNeuralCDE(
            vector_field,
            hidden_dim=self.hidden_dim,
            data_dim=self.data_dim,
            feature_dim=self.feature_dim,
            interpolation=self.interpolation,
            method=self.method,
            return_sequence=self.return_sequence,
            dt0=self.dt0,
            adjoint=self.adjoint,
            key=model_key,
        )


class PGTGraphNeuralODECfg(pydantic.BaseModel):
    name: tp.Literal["pgt_graph_neural_ode"] = pydantic.Field(...)
    vector_field: VectorFieldCfg
    hidden_dim: int = 64
    data_dim: int
    feature_dim: int
    interpolation: _INTERP = "linear"
    use_initial: bool = True
    method: tp.Literal["Tsit5", "Dopri5", "Dopri8", "Bosh3", "Euler", "Heun", "Kvaerno3", "Kvaerno3Picard", "KenCarp4", "Kvaerno4", "Kvaerno5"] = "Tsit5"
    return_sequence: bool = True
    max_steps: int = 1024

    model_config = pydantic.ConfigDict(extra="forbid")

    # "checkpointed" (sqrt-memory adjoint) or "full" (store-all: skips
    # the backward re-integration; more memory, faster step)
    adjoint: tp.Literal["checkpointed", "full"] = "checkpointed"

    def build(self, model_key) -> PGTGraphNeuralODE:
        model_key, vf_key = jr.split(model_key, 2)
        vector_field = self.vector_field.build(vf_key)
        return PGTGraphNeuralODE(
            vector_field,
            hidden_dim=self.hidden_dim,
            data_dim=self.data_dim,
            feature_dim=self.feature_dim,
            interpolation=self.interpolation,
            method=self.method,
            return_sequence=self.return_sequence,
            max_steps=self.max_steps,
            adjoint=self.adjoint,
            key=model_key,
        )


class PGTSTGraphNeuralCDECfg(pydantic.BaseModel):
    name: tp.Literal["pgt_st_graph_neural_cde"] = pydantic.Field(...)
    f_func: NeuralNetsCfg
    g_func: VectorFieldCfg
    interpolation: _INTERP = "linear"
    use_initial: bool = True
    method: tp.Literal["Tsit5", "Dopri5", "Dopri8", "Bosh3", "Euler", "Heun", "Kvaerno3", "Kvaerno3Picard", "KenCarp4", "Kvaerno4", "Kvaerno5"] = "Tsit5"
    return_sequence: bool = True
    data_dim: int
    feature_dim: int
    max_steps: int = 4096

    model_config = pydantic.ConfigDict(extra="forbid")

    # "checkpointed" (sqrt-memory adjoint) or "full" (store-all: skips
    # the backward re-integration; more memory, faster step)
    adjoint: tp.Literal["checkpointed", "full"] = "checkpointed"

    def build(self, model_key) -> PGTSTGraphNeuralCDE:
        model_key, f_func_key, g_func_key = jr.split(model_key, 3)
        f_func = self.f_func.build(f_func_key)
        g_func = self.g_func.build(g_func_key, hidden_dim_f=self.f_func.hidden_dim)
        return PGTSTGraphNeuralCDE(
            f_func,
            g_func,
            interpolation=self.interpolation,
            data_dim=self.data_dim,
            feature_dim=self.feature_dim,
            method=self.method,
            max_steps=self.max_steps,
            adjoint=self.adjoint,
            key=model_key,
        )


class StidGCNCfg(pydantic.BaseModel):
    name: tp.Literal["stid_gcn"] = pydantic.Field(...)
    input_dim: int = pydantic.Field(...)
    num_nodes: int = pydantic.Field(...)
    num_time_steps: int = pydantic.Field(...)
    channels: int = pydantic.Field(...)
    output_len: int = 1
    granularity: int = pydantic.Field(...)
    dropout: float = pydantic.Field(...)
    memory_dim1: int = pydantic.Field(...)
    memory_dim2: int = pydantic.Field(...)

    def build(self, model_key):
        from ..models.stid_gcn import STIDGCN

        return STIDGCN(
            self.input_dim,
            self.num_nodes,
            self.num_time_steps,
            self.channels,
            self.output_len,
            self.granularity,
            self.dropout,
            self.memory_dim1,
            self.memory_dim2,
            key=model_key,
        )


class ASTGCNCfg(pydantic.BaseModel):
    name: tp.Literal["astgcn"] = pydantic.Field(...)
    input_dim: int = pydantic.Field(...)
    output_dim: int = 1
    num_nodes: int = pydantic.Field(...)
    node_embed_dim: int = pydantic.Field(...)
    num_time_steps: int = pydantic.Field(...)
    channels: int = pydantic.Field(...)
    K: int = pydantic.Field(...)

    def build(self, model_key):
        from ..models.astgcn import ASTGCN

        backbones = [
            {
                "K": self.K,
                "num_of_chev_filters": self.input_dim,
                "num_of_time_filters": self.input_dim,
                "time_conv_strides": self.num_time_steps,
            },
            {
                "K": self.K,
                "num_of_chev_filters": self.input_dim,
                "num_of_time_filters": self.input_dim,
                "time_conv_strides": 1,
            },
        ]
        return ASTGCN(
            num_for_prediction=self.output_dim,
            backbones=backbones,
            num_vertices=self.num_nodes,
            node_embed_dim=self.node_embed_dim,
            num_features=self.input_dim,
            num_timesteps=self.num_time_steps,
            key=model_key,
        )


class DCRNNCfg(pydantic.BaseModel):
    name: tp.Literal["dcrnn"] = pydantic.Field(...)
    input_dim: int = pydantic.Field(...)
    num_nodes: int = pydantic.Field(...)
    hidden_dim: int = pydantic.Field(...)
    output_dim: int = 1
    num_time_steps: int = pydantic.Field(...)
    order: int = pydantic.Field(...)
    num_layers: int = pydantic.Field(...)

    def build(self, model_key):
        from ..models.dcrnn import DCRNNModelSingleStep

        return DCRNNModelSingleStep(
            num_node=self.num_nodes,
            input_dim=self.input_dim,
            hidden_dim=self.hidden_dim,
            output_dim=self.output_dim,
            order=self.order,
            num_layers=self.num_layers,
            key=model_key,
        )
