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

    def _output_dim(self, hidden_dim_f: tp.Optional[int]) -> int:
        """Reference dimensional rules (vector_field_configs.py:53-109):
        the ST g-func emits H * H_f entries; a controlled non-enc_idx vf
        emits H * E * 2 so CDEWrapperVectorField can reshape to
        (n, H, E, 2); everything else maps H -> H."""
        if not self.use_control:
            return self.hidden_dim
        if self.name == "STGraphVectorField":
            return self.hidden_dim * hidden_dim_f
        if self.enc_idx:
            return self.hidden_dim
        return self.hidden_dim * self.data_embed_dim * 2

    def _extra_kwargs(self) -> dict:
        """Per-class constructor surface beyond the (in, hidden, out,
        layers) core."""
        if self.name == "STGraphVectorField":
            return dict(
                node_embed_dim=self.node_embed_dim,
                num_nodes=self.num_nodes,
                cheb_k=self.cheb_k,
            )
        if self.name == "GNODEFloorVectorField":
            return {}
        kw = dict(
            data_embed_dim=self.data_embed_dim, num_nodes=self.num_nodes
        )
        if self.use_control and self.enc_idx:
            kw.update(
                enc_idx=True, enc_type=self.enc_type, idx_dim=self.idx_dim
            )
        return kw

    def build(self, vf_key, hidden_dim_f: tp.Optional[int] = None):
        cls = getattr(vector_fields, self.name)
        return cls(
            input_dim=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            output_dim=self._output_dim(hidden_dim_f),
            num_layers=self.num_layers,
            key=vf_key,
            **self._extra_kwargs(),
        )
