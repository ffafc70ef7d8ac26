"""ASTGCN discrete baseline (attention-based spatial-temporal GCN).

Reference: src/models/astgcn.py. TPU-first deviations from the reference's
structure (outputs match): the per-timestep Python loop in the Chebyshev
convolution (astgcn.py:93-114) is replaced by one einsum over all timesteps
and stacked Chebyshev supports, keeping the MXU busy instead of issuing T
small matmuls. The reference's quirks are preserved: the Chebyshev recurrence
uses ELEMENTWISE products with the support (astgcn.py:104), supports come
from learned node embeddings (not the data adjacency), and the final conv's
in_channels equal the last backbone's ``time_conv_strides`` (astgcn.py:283).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from ..nn import Module, Conv2d, LayerNorm, static_field


class SpatialAttention(Module):
    W_1: jax.Array
    W_2: jax.Array
    W_3: jax.Array
    b_s: jax.Array
    V_s: jax.Array

    def __init__(self, num_vertices, num_features, num_timesteps, *, key):
        k1, k2, k3, k4, k5 = jr.split(key, 5)
        self.W_1 = jr.normal(k1, (num_timesteps,))
        self.W_2 = jr.normal(k2, (num_features, num_timesteps))
        self.W_3 = jr.normal(k3, (num_features,))
        self.b_s = jr.normal(k4, (num_vertices, num_vertices))
        self.V_s = jr.normal(k5, (num_vertices, num_vertices))

    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (N, F, T)
        lhs = jnp.einsum("nft,t->nf", x, self.W_1) @ self.W_2  # (N, T)
        rhs = jnp.einsum("f,ftn->tn", self.W_3, x.transpose(1, 2, 0))  # (T, N)
        product = lhs @ rhs  # (N, N)
        S = self.V_s @ jax.nn.sigmoid(product + self.b_s)
        return jax.nn.softmax(S, axis=1)


class TemporalAttention(Module):
    U_1: jax.Array
    U_2: jax.Array
    U_3: jax.Array
    b_e: jax.Array
    V_e: jax.Array

    def __init__(self, num_vertices, num_features, num_timesteps, *, key):
        k1, k2, k3, k4, k5 = jr.split(key, 5)
        self.U_1 = jr.normal(k1, (num_vertices,))
        self.U_2 = jr.normal(k2, (num_features, num_vertices))
        self.U_3 = jr.normal(k3, (num_features,))
        self.b_e = jr.normal(k4, (num_timesteps, num_timesteps))
        self.V_e = jr.normal(k5, (num_timesteps, num_timesteps))

    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (N, F, T)
        lhs = jnp.einsum("tfn,n->tf", x.transpose(2, 1, 0), self.U_1) @ self.U_2
        rhs = jnp.einsum("f,fnt->nt", self.U_3, x.transpose(1, 0, 2))
        product = lhs @ rhs  # (T, T)
        E = self.V_e @ jax.nn.sigmoid(product + self.b_e)
        return jax.nn.softmax(E, axis=1)


class ChebConvWithSAT(Module):
    Theta: jax.Array
    num_filters: int = static_field()
    K: int = static_field()

    def __init__(self, num_features, num_filters, K, *, key):
        self.Theta = jr.normal(key, (K, num_features, num_filters))
        self.num_filters = num_filters
        self.K = K

    def __call__(self, x, spatial_attention, node_embeddings):
        # x: (N, F, T)
        sim = node_embeddings @ node_embeddings.T
        supports = jax.nn.softmax(jax.nn.relu(sim), axis=1)
        N = x.shape[0]

        # Chebyshev stack with the reference's elementwise recurrence.
        polys = [jnp.eye(N, dtype=x.dtype)]
        if self.K > 1:
            polys.append(supports)
        for k in range(2, self.K):
            polys.append(2 * supports * polys[-1] - polys[-2])
        T_k = jnp.stack(polys[: self.K], axis=0)  # (K, N, N)
        T_at = spatial_attention[None] * T_k  # (K, N, N)

        # One contraction over all timesteps and orders:
        # out[m, o, t] = sum_{k,n,f} T_at[k,n,m] x[n,f,t] Theta[k,f,o]
        h = jnp.einsum("knm,nft,kfo->mot", T_at, x, self.Theta)
        return jax.nn.relu(h)


class ASTGCNBlock(Module):
    SAt: SpatialAttention
    cheb_conv: ChebConvWithSAT
    TAt: TemporalAttention
    time_conv: Conv2d
    residual_conv: Conv2d
    ln: LayerNorm

    def __init__(
        self,
        num_vertices,
        num_features,
        num_timesteps,
        K,
        num_chev_filters,
        num_time_filters,
        time_conv_strides,
        *,
        key,
    ):
        k1, k2, k3, k4, k5 = jr.split(key, 5)
        self.SAt = SpatialAttention(num_vertices, num_features, time_conv_strides, key=k1)
        self.TAt = TemporalAttention(num_vertices, num_features, time_conv_strides, key=k2)
        self.cheb_conv = ChebConvWithSAT(num_features, num_chev_filters, K, key=k3)
        self.time_conv = Conv2d(
            num_chev_filters, num_time_filters, kernel_size=(1, 3),
            stride=(1, time_conv_strides), padding=((0, 0), (1, 1)), key=k4,
        )
        self.residual_conv = Conv2d(
            num_features, num_time_filters, kernel_size=(1, 1),
            stride=(1, time_conv_strides), key=k5,
        )
        self.ln = LayerNorm((num_time_filters,))

    def __call__(self, x: jax.Array, node_embeddings: jax.Array) -> jax.Array:
        # x: (N, F, T)
        N, F, T = x.shape
        E = self.TAt(x)
        x_tatt = (x.reshape(-1, T) @ E).reshape(N, F, T)
        S = self.SAt(x_tatt)
        gcn_out = self.cheb_conv(x, S, node_embeddings)  # (N, F', T)
        t_out = self.time_conv(gcn_out.transpose(1, 0, 2)).transpose(1, 0, 2)
        x_res = self.residual_conv(x.transpose(1, 0, 2)).transpose(1, 0, 2)
        h = jax.nn.relu(x_res + t_out)
        h = jnp.squeeze(h)
        return jnp.expand_dims(jax.vmap(self.ln)(h), axis=-1)


class ASTGCNSubmodule(Module):
    blocks: list
    final_conv: Conv2d
    W: jax.Array

    def __init__(
        self,
        num_for_prediction,
        backbones,
        *,
        num_vertices,
        num_features,
        num_timesteps,
        key,
    ):
        keys = jr.split(key, len(backbones) + 2)
        self.blocks = [
            ASTGCNBlock(
                num_vertices,
                num_features,
                num_timesteps,
                b["K"],
                b["num_of_chev_filters"],
                b["num_of_time_filters"],
                b["time_conv_strides"],
                key=keys[i],
            )
            for i, b in enumerate(backbones)
        ]
        last_nf = backbones[-1]["time_conv_strides"]
        self.final_conv = Conv2d(
            last_nf, num_for_prediction, kernel_size=(1, last_nf), key=keys[-2]
        )
        self.W = jr.normal(keys[-1], (num_vertices, num_for_prediction))

    def __call__(self, x, node_embeddings):
        h = x
        for block in self.blocks:
            h = block(h, node_embeddings)
        h_t = self.final_conv(h.transpose(2, 0, 1))  # (pred, N, *)
        out = h_t[:, :, -1].transpose(1, 0)  # (N, pred)
        return out * self.W


class ASTGCN(Module):
    submodule: ASTGCNSubmodule
    node_embeddings: jax.Array

    def __init__(
        self,
        num_for_prediction,
        backbones,
        *,
        num_vertices,
        node_embed_dim,
        num_features,
        num_timesteps,
        key,
    ):
        key_sub, key_emb = jr.split(key, 2)
        self.submodule = ASTGCNSubmodule(
            num_for_prediction,
            backbones,
            num_vertices=num_vertices,
            num_features=num_features,
            num_timesteps=num_timesteps,
            key=key_sub,
        )
        self.node_embeddings = jr.normal(key_emb, (num_vertices, node_embed_dim))

    def __call__(self, x: jax.Array, key=None) -> jax.Array:
        # x: (T, N, F) -> (N, F, T)
        x = x.transpose(1, 2, 0)
        return self.submodule(x, self.node_embeddings)
