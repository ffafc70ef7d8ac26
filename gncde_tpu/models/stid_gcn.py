"""STIDGCN discrete baseline (interleaved dynamic-graph convolution tree).

Reference: src/models/stid_gcn.py. TPU-first deviations (outputs match):
even/odd interleaving uses a stack+reshape instead of a Python loop
(stid_gcn.py:433-446), and conv blocks are explicit modules rather than
Sequential wrappers. The reference's dead temporal-embedding path in the top
forward (stid_gcn.py:534-541 commented out) is kept dead but the module
exists, as there.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from ..nn import Module, Conv2d, Linear, Dropout, static_field


def _glorot(key, shape):
    return jax.nn.initializers.glorot_uniform()(key, shape)


class GLU(Module):
    conv1: Conv2d
    conv2: Conv2d
    conv3: Conv2d
    dropout_layer: Dropout

    def __init__(self, features: int, dropout: float = 0.1, *, key):
        k1, k2, k3 = jr.split(key, 3)
        self.conv1 = Conv2d(features, features, (1, 1), key=k1)
        self.conv2 = Conv2d(features, features, (1, 1), key=k2)
        self.conv3 = Conv2d(features, features, (1, 1), key=k3)
        self.dropout_layer = Dropout(dropout)

    def __call__(self, x, *, key, train: bool = True):
        dropout_key, _ = jr.split(key)
        out = self.conv1(x) * jax.nn.sigmoid(self.conv2(x))
        out = self.dropout_layer(out, key=dropout_key, inference=not train)
        return self.conv3(out)


class TemporalEmbedding(Module):
    time: int = static_field()
    time_day: jax.Array
    time_week: jax.Array

    def __init__(self, time: int, features: int, *, key):
        k1, k2 = jr.split(key)
        self.time = time
        self.time_day = _glorot(k1, (time, features))
        self.time_week = _glorot(k2, (7, features))

    def __call__(self, x):
        day_idx = jnp.asarray(x[..., 1] * self.time, jnp.int32)
        week_idx = jnp.asarray(x[..., 2], jnp.int32)
        time_day = jnp.transpose(self.time_day[day_idx], (0, 2, 1))
        time_week = jnp.transpose(self.time_week[week_idx], (0, 2, 1))
        return jnp.transpose(time_day + time_week, (0, 3, 1, 2))


class DiffusionGCNBlock(Module):
    """Diffusion over a (dynamic) adjacency, 1x1-conv mixed (stid_gcn.py:77-110)."""

    diffusion_step: int = static_field()
    conv: Conv2d
    dropout_layer: Dropout

    def __init__(self, channels=128, diffusion_step=1, dropout=0.1, *, key):
        self.diffusion_step = diffusion_step
        key_conv, _ = jr.split(key)
        self.conv = Conv2d(diffusion_step * channels, channels, (1, 1), key=key_conv)
        self.dropout_layer = Dropout(dropout)

    def __call__(self, x, adj, *, key, train: bool = True):
        outs = []
        current = x  # (C, N, T)
        for _ in range(self.diffusion_step):
            current = jnp.einsum("cnt,nm->cmt", current, adj)
            outs.append(current)
        x_cat = jnp.concatenate(outs, axis=0)
        x_conv = self.conv(x_cat)
        dropout_key, _ = jr.split(key)
        return self.dropout_layer(x_conv, key=dropout_key, inference=not train)


class GraphGenerator(Module):
    """Dynamic adjacency from a memory bank + activity, top-k 0.8 sparsified
    (stid_gcn.py:114-163)."""

    memory: jax.Array
    fc: Linear

    def __init__(self, channels=128, num_nodes=170, diffusion_step=1, dropout=0.1, *, key):
        k1, k2 = jr.split(key)
        self.memory = _glorot(k1, (channels, num_nodes))
        self.fc = Linear(2, 1, key=k2)

    def __call__(self, x):
        adj_dyn_1 = jnp.einsum("cnt,cm->nm", x, self.memory) / jnp.sqrt(x.shape[1])
        adj_dyn_1 = jax.nn.softmax(jax.nn.relu(adj_dyn_1), axis=-1)

        x_sum = x.sum(axis=-1)
        adj_dyn_2 = jnp.einsum("cn,cm->nm", x_sum, x_sum) / jnp.sqrt(x.shape[1])
        adj_dyn_2 = jax.nn.softmax(jax.nn.relu(adj_dyn_2), axis=-1)

        adj_f = jnp.stack([adj_dyn_1, adj_dyn_2], axis=-1)
        adj_f = jnp.squeeze(jax.vmap(jax.vmap(self.fc))(adj_f), axis=-1)
        adj_f = jax.nn.softmax(adj_f, axis=-1)

        k = int(adj_f.shape[-1] * 0.8)
        _, topk_indices = jax.lax.top_k(adj_f, k)
        mask = jnp.zeros_like(adj_f)
        rows = jnp.arange(adj_f.shape[0])[:, None]
        mask = mask.at[rows, topk_indices].set(1.0)
        return adj_f * mask


class DGCN(Module):
    conv: Conv2d
    generator: GraphGenerator
    gcn: DiffusionGCNBlock
    emb: jax.Array

    def __init__(self, channels=128, num_nodes=170, diffusion_step=1, dropout=0.1,
                 emb=None, *, key):
        key_conv, key_gen, key_gcn = jr.split(key, 3)
        self.conv = Conv2d(channels, channels, (1, 1), key=key_conv)
        self.generator = GraphGenerator(channels, num_nodes, diffusion_step, dropout, key=key_gen)
        self.gcn = DiffusionGCNBlock(channels, diffusion_step, dropout, key=key_gcn)
        self.emb = emb

    def __call__(self, x, *, key, train: bool = True):
        skip = x
        x_conv = self.conv(x)
        adj_dyn = self.generator(x_conv)
        key_gcn, _ = jr.split(key)
        x_gcn = self.gcn(x_conv, adj_dyn, key=key_gcn, train=train)
        return x_gcn * self.emb + skip


class _ConvBlock(Module):
    """pad(edge,3/3) -> conv(1,5) [-> leaky_relu] -> dropout -> conv(1,3) -> tanh."""

    conva: Conv2d
    convb: Conv2d
    dropout_layer: Dropout
    leaky: bool = static_field()

    def __init__(self, channels, dropout, leaky, *, key_a, key_b):
        # Two explicit keys: the reference draws each Conv2d directly from
        # IDGCN's 8-way split (stid_gcn.py:283, 263-341), so splitting a
        # single key here would diverge from its weight stream.
        self.conva = Conv2d(channels, channels, (1, 5), key=key_a)
        self.convb = Conv2d(channels, channels, (1, 3), key=key_b)
        self.dropout_layer = Dropout(dropout)
        self.leaky = leaky

    def __call__(self, x, *, key, train: bool = True):
        x = jnp.pad(x, ((0, 0), (0, 0), (3, 3)), mode="edge")
        x = self.conva(x)
        if self.leaky:
            x = jax.nn.leaky_relu(x, negative_slope=0.01)
        x = self.dropout_layer(x, key=key, inference=not train)
        x = self.convb(x)
        return jnp.tanh(x)


class IDGCN(Module):
    split_flag: bool = static_field()
    conv1: _ConvBlock
    conv2: _ConvBlock
    conv3: _ConvBlock
    conv4: _ConvBlock
    dgcn: DGCN

    def __init__(self, channels=64, diffusion_step=1, splitting=True, num_nodes=170,
                 dropout=0.2, emb=None, *, key):
        keys = jr.split(key, 9)
        self.split_flag = splitting
        # Reference quirk: conv1 has NO leaky_relu between its convs
        # (stid_gcn.py:263-281); conv2-4 do.
        self.conv1 = _ConvBlock(channels, dropout, leaky=False,
                                key_a=keys[0], key_b=keys[1])
        self.conv2 = _ConvBlock(channels, dropout, leaky=True,
                                key_a=keys[2], key_b=keys[3])
        self.conv3 = _ConvBlock(channels, dropout, leaky=True,
                                key_a=keys[4], key_b=keys[5])
        self.conv4 = _ConvBlock(channels, dropout, leaky=True,
                                key_a=keys[6], key_b=keys[7])
        # Reference quirk: IDGCN splits 8 keys but passes keys[8] to DGCN
        # (stid_gcn.py:236, 348) -- jax clamps the out-of-bounds index, so
        # DGCN actually REUSES keys[7] (conv4's second conv key).
        self.dgcn = DGCN(channels, num_nodes, diffusion_step, dropout, emb=emb, key=keys[7])

    def __call__(self, x, *, key, train: bool = True):
        keys = jr.split(key, 9)
        if self.split_flag:
            x_even, x_odd = x[..., ::2], x[..., 1::2]
        else:
            x_even = x_odd = x

        x1 = self.conv1(x_even, key=keys[0], train=train)
        x1 = self.dgcn(x1, key=keys[1], train=train)
        d = x_odd * jnp.tanh(x1)

        x2 = self.conv2(x_odd, key=keys[2], train=train)
        x2 = self.dgcn(x2, key=keys[3], train=train)
        c = x_even * jnp.tanh(x2)

        x3 = self.conv3(c, key=keys[4], train=train)
        x3 = self.dgcn(x3, key=keys[5], train=train)
        x_odd_update = d + x3

        x4 = self.conv4(d, key=keys[6], train=train)
        x4 = self.dgcn(x4, key=keys[7], train=train)
        x_even_update = c + x4

        return x_even_update, x_odd_update


class IDGCNTree(Module):
    memory1: jax.Array
    memory2: jax.Array
    IDGCN1: IDGCN
    IDGCN2: IDGCN
    IDGCN3: IDGCN

    def __init__(self, channels=64, diffusion_step=1, num_nodes=170, dropout=0.1,
                 memory_dim1=6, memory_dim2=3, *, key):
        keys = jr.split(key, 4)
        self.memory1 = _glorot(keys[0], (channels, num_nodes, memory_dim1))
        self.memory2 = _glorot(keys[1], (channels, num_nodes, memory_dim2))
        k1, k2, k3 = jr.split(keys[3], 3)
        self.IDGCN1 = IDGCN(channels, diffusion_step, True, num_nodes, dropout,
                            emb=self.memory1, key=k1)
        self.IDGCN2 = IDGCN(channels, diffusion_step, True, num_nodes, dropout,
                            emb=self.memory2, key=k2)
        self.IDGCN3 = IDGCN(channels, diffusion_step, True, num_nodes, dropout,
                            emb=self.memory2, key=k3)

    @staticmethod
    def _interleave(even: jax.Array, odd: jax.Array) -> jax.Array:
        # (C, N, T1) x2 -> (C, N, 2*T1) with even/odd time interleaving.
        C, N, T1 = even.shape
        return jnp.stack([even, odd], axis=-1).reshape(C, N, 2 * T1)

    def __call__(self, x, *, key, train: bool = True):
        k1, k2, k3 = jr.split(key, 3)
        e1, o1 = self.IDGCN1(x, key=k1, train=train)
        e2, o2 = self.IDGCN2(e1, key=k2, train=train)
        e3, o3 = self.IDGCN3(o1, key=k3, train=train)
        concat1 = self._interleave(e2, o2)
        concat2 = self._interleave(e3, o3)
        concat0 = self._interleave(concat1, concat2)
        return concat0 + x


class STIDGCN(Module):
    num_nodes: int = static_field()
    num_time_steps: int = static_field()
    output_len: int = static_field()
    Temb: TemporalEmbedding
    start_conv: Conv2d
    tree: IDGCNTree
    glu: GLU
    regression_layer: Conv2d

    def __init__(self, input_dim, num_nodes, num_time_steps, channels, output_len,
                 granularity, dropout=0.1, memory_dim1=128, memory_dim2=64, *, key):
        keys = jr.split(key, 6)
        self.num_nodes = num_nodes
        self.num_time_steps = num_time_steps
        self.output_len = output_len
        diffusion_step = 1

        self.Temb = TemporalEmbedding(granularity, channels, key=keys[0])
        self.start_conv = Conv2d(input_dim, channels, (1, 1), key=keys[1])
        self.tree = IDGCNTree(channels, diffusion_step, num_nodes, dropout,
                              memory_dim1, memory_dim2, key=keys[2])
        self.glu = GLU(channels, dropout=dropout, key=keys[3])
        self.regression_layer = Conv2d(
            channels, output_len, (1, num_time_steps), key=keys[4]
        )

    def __call__(self, input: jax.Array, key, train: bool = True) -> jax.Array:
        # input: (T, N, D) -> (D, N, T)
        x = jnp.transpose(input, (2, 1, 0))
        x = self.start_conv(x)
        key_tree, key_glu, _ = jr.split(key, 3)
        x_tree = self.tree(x, key=key_tree, train=train)
        gcn_out = self.glu(x_tree, key=key_glu, train=train) + x_tree
        prediction = self.regression_layer(gcn_out)  # (out_len, N, 1)
        return jnp.transpose(jnp.squeeze(prediction, axis=-1), (1, 0))
