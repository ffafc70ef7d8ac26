"""Graph-convolution layers with equivariant fusion.

TPU-native re-design of reference src/models/vector_fields/layers.py:
the fused operator ``A_bar`` is never materialised; each layer costs two MXU
matmuls plus O(n) vector work (see gncde_tpu/ops/equiv_basis.py). The
``fusion_matrix`` methods expose the dense operator for parity testing against
the reference semantics (layers.py:102-160, 256-345).

PRNG key choreography intentionally mirrors the reference so weight
distributions match at init (layers.py:87-99, 219-254).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from ...nn import Module, Linear, RMSNorm, static_field
from ...ops import equiv_basis


class ConvLayer(Module):
    """RMSNorm -> per-node Linear -> ``m + A @ m`` (reference layers.py:11-48)."""

    linear: Linear
    norm: RMSNorm

    def __init__(self, input_dim: int, output_dim: int, *, key: jax.Array):
        skey, nkey = jr.split(key, 2)
        self.linear = Linear(input_dim, output_dim, key=skey)
        self.norm = RMSNorm(input_dim)

    def transform(self, node_feats: jax.Array) -> jax.Array:
        """The pre-aggregation part: per-node norm + linear."""
        node_feats = jax.vmap(self.norm)(node_feats)
        return jax.vmap(self.linear)(node_feats)

    def __call__(self, node_feats: jax.Array, adj_matrix) -> jax.Array:
        from ...ops import bcsr as ops_bcsr
        from ...ops import sparse as ops_sparse

        m = self.transform(node_feats)
        if isinstance(adj_matrix, ops_sparse.ELL):
            return m + ops_sparse.ell_spmm(adj_matrix, m)
        if isinstance(adj_matrix, ops_bcsr.BCSRVal):
            return m + ops_bcsr._bcsr_apply_pair(adj_matrix, m, transpose=False)
        return m + adj_matrix @ m


def _bcsr_val_type():
    from ...ops import bcsr as ops_bcsr

    return ops_bcsr.BCSRVal


def _init_fusion_params(key: jax.Array, count: int):
    """``count`` 2-vectors scaled to 1/15 * U(-1, 1); returns (params, key)."""
    keys = jr.split(key, count + 1)
    params = [
        1 / 15 * jr.uniform(k, (2,), minval=-1.0, maxval=1.0) for k in keys[:-1]
    ]
    return params, keys[-1]


class ConvEquivFusionLayer(Module):
    """Undirected 8-term Maron-basis fusion + graph conv (layers.py:51-177).

    Forward = ``transform -> fused_matvec`` with the residual identity folded
    into the diagonal: O(2 matmuls) instead of 8 dense n^2 temporaries.
    """

    param1: jax.Array
    param2: jax.Array
    param3: jax.Array
    param4: jax.Array
    param5: jax.Array
    param6: jax.Array
    param7: jax.Array
    param8: jax.Array
    conv_layer: ConvLayer

    def __init__(self, input_dim: int, output_dim: int, *, key: jax.Array):
        (
            self.param1,
            self.param2,
            self.param3,
            self.param4,
            self.param5,
            self.param6,
            self.param7,
            self.param8,
        ), key = _init_fusion_params(key, 8)
        conv_key, key = jr.split(key, 2)
        self.conv_layer = ConvLayer(input_dim, output_dim, key=conv_key)

    @property
    def params(self):
        return (
            self.param1,
            self.param2,
            self.param3,
            self.param4,
            self.param5,
            self.param6,
            self.param7,
            self.param8,
        )

    def fusion_matrix(self, adjacency: jax.Array, control_gradient: jax.Array):
        """Dense fused operator (the default hot path: XLA fuses all basis
        terms into the matmul operand, so one matmul suffices)."""
        return equiv_basis.fusion_matrix_dense(adjacency, control_gradient, self.params)

    def __call__(
        self,
        node_feats: jax.Array,
        adj_matrix,
        control_gradient,
    ) -> jax.Array:
        from ... import ops as ops_config
        from ...ops import sparse as ops_sparse

        backend = ops_config.get_fusion_backend()
        m = self.conv_layer.transform(node_feats)
        if isinstance(adj_matrix, ops_sparse.ELL):
            # Sparse (scaled-n) path: ELL controls bypass the dense backends
            # entirely -- O(nnz * H) message passing, no n^2 operator.
            return ops_sparse.sparse_fused_apply(
                adj_matrix, control_gradient, m, self.params, add_identity=True
            )
        if isinstance(adj_matrix, _bcsr_val_type()):
            # Block-sparse path: banded/clustered patterns ride the
            # scalar-prefetch Pallas block kernels (ops/bcsr.py) -- no
            # gathers, MXU-dense per stored block.
            from ...ops import bcsr as ops_bcsr

            return ops_bcsr.bcsr_fused_apply(
                adj_matrix, control_gradient, m, self.params, add_identity=True
            )
        # "megakernel" is a vector-field-level backend (fields.py intercepts
        # before the layers); when the control shape doesn't qualify, the
        # layer-level fallback is the fastest XLA path: dense.
        if backend in ("dense", "megakernel"):
            if ops_config.get_fusion_precision() == "bf16":
                fused = self.fusion_matrix(
                    adj_matrix.astype(jnp.bfloat16),
                    control_gradient.astype(jnp.bfloat16),
                )
                return m + jnp.dot(
                    fused, m.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            fused = self.fusion_matrix(adj_matrix, control_gradient)
            return m + fused @ m
        if backend == "pipeline":
            from ...ops.pallas.pipeline import pipeline_fused_apply

            return pipeline_fused_apply(
                adj_matrix, control_gradient, m, self.params,
                False, True,
            )
        if backend == "pallas":
            from ...ops.pallas.fused_basis import fused_apply_pallas

            return fused_apply_pallas(
                adj_matrix, control_gradient, m, self.params, False, True
            )
        return equiv_basis.fused_apply(
            adj_matrix, control_gradient, m, self.params, add_identity=True
        )


class ConvEquivFusionDirectedLayer(Module):
    """Directed 11-term basis fusion + graph conv (layers.py:180-362).

    Reproduces the reference's ``param6_prime``-reuses-``p5_primekey`` init
    quirk (layers.py:245-247) for weight-distribution parity.
    """

    param1: jax.Array
    param2: jax.Array
    param3: jax.Array
    param4: jax.Array
    param4_prime: jax.Array
    param5: jax.Array
    param5_prime: jax.Array
    param6: jax.Array
    param6_prime: jax.Array
    param7: jax.Array
    param8: jax.Array
    conv_layer: ConvLayer

    def __init__(self, input_dim: int, output_dim: int, *, key: jax.Array):
        (
            p1key,
            p2key,
            p3key,
            p4key,
            p4_primekey,
            p5key,
            p5_primekey,
            p6key,
            p6_primekey,
            p7key,
            p8key,
            key,
        ) = jr.split(key, 12)

        u = lambda k: 1 / 15 * jr.uniform(k, (2,), minval=-1.0, maxval=1.0)
        self.param1 = u(p1key)
        self.param2 = u(p2key)
        self.param3 = u(p3key)
        self.param4 = u(p4key)
        self.param4_prime = u(p4_primekey)
        self.param5 = u(p5key)
        self.param5_prime = u(p5_primekey)
        self.param6 = u(p6key)
        # Reference quirk: p6' drawn from p5_primekey, not p6_primekey.
        self.param6_prime = u(p5_primekey)
        self.param7 = u(p7key)
        self.param8 = u(p8key)

        conv_key, key = jr.split(key, 2)
        self.conv_layer = ConvLayer(input_dim, output_dim, key=conv_key)

    @property
    def params(self):
        return (
            self.param1,
            self.param2,
            self.param3,
            self.param4,
            self.param4_prime,
            self.param5,
            self.param5_prime,
            self.param6,
            self.param6_prime,
            self.param7,
            self.param8,
        )

    def fusion_matrix(self, adjacency: jax.Array, control_gradient: jax.Array):
        return equiv_basis.fusion_matrix_dense_directed(
            adjacency, control_gradient, self.params
        )

    def __call__(
        self,
        node_feats: jax.Array,
        adj_matrix,
        control_gradient,
    ) -> jax.Array:
        from ... import ops as ops_config
        from ...ops import sparse as ops_sparse

        backend = ops_config.get_fusion_backend()
        m = self.conv_layer.transform(node_feats)
        if isinstance(adj_matrix, _bcsr_val_type()):
            from ...ops import bcsr as ops_bcsr

            return ops_bcsr.bcsr_fused_apply_directed(
                adj_matrix, control_gradient, m, self.params, add_identity=True
            )
        if isinstance(adj_matrix, ops_sparse.ELL):
            return ops_sparse.sparse_fused_apply_directed(
                adj_matrix, control_gradient, m, self.params, add_identity=True
            )
        # No directed megakernel yet: fall back to the fastest XLA path.
        if backend in ("dense", "megakernel"):
            if ops_config.get_fusion_precision() == "bf16":
                fused = self.fusion_matrix(
                    adj_matrix.astype(jnp.bfloat16),
                    control_gradient.astype(jnp.bfloat16),
                )
                return m + jnp.dot(
                    fused, m.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            fused = self.fusion_matrix(adj_matrix, control_gradient)
            return m + fused @ m
        if backend == "pipeline":
            from ...ops.pallas.pipeline import pipeline_fused_apply

            return pipeline_fused_apply(
                adj_matrix, control_gradient, m, self.params,
                True, True,
            )
        if backend == "pallas":
            from ...ops.pallas.fused_basis import fused_apply_pallas

            return fused_apply_pallas(
                adj_matrix, control_gradient, m, self.params, True, True
            )
        return equiv_basis.fused_apply(
            adj_matrix, control_gradient, m, self.params, directed=True, add_identity=True
        )


class ConvPreMultFusionLayer(Module):
    """Non-equivariant ablation: dense learnable fusion matrices
    ``F1 @ A + F2 @ dA`` (layers.py:365-425). The reference hardcodes 400x400
    fusion matrices; ``num_nodes`` parameterises that here (default preserves
    reference behaviour).
    """

    fusion_1: jax.Array
    fusion_2: jax.Array
    conv_layer: ConvLayer

    def __init__(
        self, input_dim: int, output_dim: int, *, key: jax.Array, num_nodes: int = 400
    ):
        fkey1, fkey2, key = jr.split(key, 3)
        self.fusion_1 = jr.uniform(fkey1, (num_nodes, num_nodes))
        self.fusion_2 = jr.uniform(fkey2, (num_nodes, num_nodes))
        conv_key, key = jr.split(key, 2)
        self.conv_layer = ConvLayer(input_dim, output_dim, key=conv_key)

    def __call__(
        self,
        node_feats: jax.Array,
        adj_matrix: jax.Array,
        control_gradient: jax.Array,
    ) -> jax.Array:
        m = self.conv_layer.transform(node_feats)
        # (F1 A + F2 dA) @ m computed right-to-left: two (n,n)@(n,H) matmuls
        # instead of two (n,n)@(n,n) -- H << n so this is ~n/H times cheaper.
        fused_m = self.fusion_1 @ (adj_matrix @ m) + self.fusion_2 @ (
            control_gradient @ m
        )
        return m + fused_m
