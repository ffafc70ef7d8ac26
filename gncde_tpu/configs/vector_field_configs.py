"""Vector-field factory config.

Reference: src/configs/vector_field_configs.py. The key dimensional rule is
preserved: with ``use_control`` the vf output dim is
``hidden_dim * data_embed_dim * 2`` so the CDE wrapper can reshape to
(n, H, E, 2) and contract with the data path derivative
(vector_field_configs.py:71, cde_wrapper_vector_field.py:19-26).
"""

from __future__ import annotations

import typing as tp

import pydantic

from ..models import vector_fields


class VectorFieldCfg(pydantic.BaseModel):
    name: tp.Literal[
        "ConstVectorField",
        "GNODEVectorField",
        "GNODEFloorVectorField",
        "PermEquivGraphVectorField",
        "PermEquivDirGraphVectorField",
        "GraphVectorField",
        "PreMultFusionGraphVectorField",
        "STGraphVectorField",
    ] = pydantic.Field(...)
    hidden_dim: int = 64
    data_embed_dim: int = 16
    node_embed_dim: int = 16
    num_layers: int = 4
    use_control: bool = True
    cheb_k: int = 3
    num_nodes: int = 0
    enc_idx: bool = False
    enc_type: str = "mlp"
    idx_dim: int = 512

    model_config = pydantic.ConfigDict(extra="forbid")

    def build(self, vf_key, hidden_dim_f: tp.Optional[int] = None):
        vector_field_cls = getattr(vector_fields, self.name)
        if self.use_control:
            if self.name == "STGraphVectorField":
                return vector_field_cls(
                    input_dim=self.hidden_dim,
                    hidden_dim=self.hidden_dim,
                    output_dim=self.hidden_dim * hidden_dim_f,
                    num_layers=self.num_layers,
                    node_embed_dim=self.node_embed_dim,
                    num_nodes=self.num_nodes,
                    cheb_k=self.cheb_k,
                    key=vf_key,
                )
            if not self.enc_idx:
                return vector_field_cls(
                    input_dim=self.hidden_dim,
                    hidden_dim=self.hidden_dim,
                    output_dim=self.hidden_dim * self.data_embed_dim * 2,
                    num_layers=self.num_layers,
                    data_embed_dim=self.data_embed_dim,
                    num_nodes=self.num_nodes,
                    key=vf_key,
                )
            return vector_field_cls(
                input_dim=self.hidden_dim,
                hidden_dim=self.hidden_dim,
                output_dim=self.hidden_dim,
                num_layers=self.num_layers,
                data_embed_dim=self.data_embed_dim,
                num_nodes=self.num_nodes,
                enc_idx=self.enc_idx,
                enc_type=self.enc_type,
                idx_dim=self.idx_dim,
                key=vf_key,
            )
        if self.name == "GNODEFloorVectorField":
            return vector_field_cls(
                input_dim=self.hidden_dim,
                hidden_dim=self.hidden_dim,
                output_dim=self.hidden_dim,
                num_layers=self.num_layers,
                key=vf_key,
            )
        return vector_field_cls(
            input_dim=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            output_dim=self.hidden_dim,
            num_layers=self.num_layers,
            data_embed_dim=self.data_embed_dim,
            num_nodes=self.num_nodes,
            key=vf_key,
        )
