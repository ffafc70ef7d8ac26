"""Core neural-net layers, built on :mod:`gncde_tpu.nn.module`.

Reimplements (from scratch, matching the init/forward semantics the reference
gets from ``equinox.nn``) the layers the reference models rely on:
``Linear``/``MLP`` (reference uses eqx.nn.Linear/MLP e.g.
src/models/vector_fields/layers.py:33, src/models/tgb_graph_neural_cde.py:51-76)
and ``RMSNorm`` (layers.py:34).

Init matches the torch-style uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) scheme
with a (wkey, bkey) split so weight distributions line up with the reference.
All layers are single-example: batch/node axes are handled by ``jax.vmap`` at
call sites, exactly like the reference (layers.py:45-46).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import jax.random as jr

from .module import Module, field, static_field


class Linear(Module):
    weight: jax.Array
    bias: tp.Optional[jax.Array]
    in_features: int = static_field()
    out_features: int = static_field()
    use_bias: bool = static_field()

    def __init__(
        self,
        in_features: int,
        out_features: int,
        use_bias: bool = True,
        *,
        key: jax.Array,
    ):
        wkey, bkey = jr.split(key, 2)
        lim = 1.0 / math.sqrt(in_features)
        self.weight = jr.uniform(
            wkey, (out_features, in_features), minval=-lim, maxval=lim
        )
        self.bias = (
            jr.uniform(bkey, (out_features,), minval=-lim, maxval=lim)
            if use_bias
            else None
        )
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = use_bias

    def __call__(self, x: jax.Array) -> jax.Array:
        out = self.weight @ x
        if self.bias is not None:
            out = out + self.bias
        return out


class Identity(Module):
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x: jax.Array) -> jax.Array:
        return x


_ACTIVATIONS: dict = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "elu": jax.nn.elu,
    "identity": lambda x: x,
}
_ACTIVATION_NAMES = {id(v): k for k, v in _ACTIVATIONS.items()}
_ACTIVATION_NAMES[id(jnp.tanh)] = "tanh"


def _activation_name(act) -> str:
    """Normalise an activation (callable or name) to a registry name.

    Names (not callables) are stored in static fields so that two modules
    built with the same config share a treedef (no spurious recompiles).
    """
    if act is None:
        return "identity"
    if isinstance(act, str):
        if act not in _ACTIVATIONS:
            raise ValueError(f"Unknown activation {act!r}")
        return act
    name = _ACTIVATION_NAMES.get(id(act))
    if name is None:
        name = getattr(act, "__name__", None)
        if name not in _ACTIVATIONS:
            raise ValueError(
                "Pass a registry name or register the callable in _ACTIVATIONS"
            )
    return name


class MLP(Module):
    """Multi-layer perceptron mirroring eqx.nn.MLP's key-splitting scheme."""

    layers: list
    activation: str = static_field()
    final_activation: str = static_field()
    in_size: int = static_field()
    out_size: int = static_field()
    width_size: int = static_field()
    depth: int = static_field()

    def __init__(
        self,
        in_size: int,
        out_size: int,
        width_size: int,
        depth: int,
        activation=jax.nn.relu,
        final_activation=None,
        use_bias: bool = True,
        use_final_bias: bool = True,
        *,
        key: jax.Array,
    ):
        keys = jr.split(key, depth + 1)
        layers = []
        if depth == 0:
            layers.append(Linear(in_size, out_size, use_final_bias, key=keys[0]))
        else:
            layers.append(Linear(in_size, width_size, use_bias, key=keys[0]))
            for i in range(depth - 1):
                layers.append(
                    Linear(width_size, width_size, use_bias, key=keys[i + 1])
                )
            layers.append(Linear(width_size, out_size, use_final_bias, key=keys[-1]))
        self.layers = layers
        self.activation = _activation_name(activation)
        self.final_activation = _activation_name(final_activation)
        self.in_size = in_size
        self.out_size = out_size
        self.width_size = width_size
        self.depth = depth

    def __call__(self, x: jax.Array) -> jax.Array:
        act = _ACTIVATIONS[self.activation]
        for layer in self.layers[:-1]:
            x = act(layer(x))
        x = self.layers[-1](x)
        return _ACTIVATIONS[self.final_activation](x)


class RMSNorm(Module):
    """Root-mean-square norm over the full input shape (reference layers.py:34).

    ``y = x / sqrt(mean(x^2) + eps) * weight + bias`` with weight=ones,
    bias=zeros at init (matching equinox's RMSNorm defaults).
    """

    weight: tp.Optional[jax.Array]
    bias: tp.Optional[jax.Array]
    eps: float = static_field()
    shape: tuple = static_field()

    def __init__(
        self,
        shape,
        eps: float = 1e-6,
        use_weight: bool = True,
        use_bias: bool = True,
    ):
        if isinstance(shape, int):
            shape = (shape,)
        self.shape = tuple(shape)
        self.eps = eps
        self.weight = jnp.ones(self.shape) if use_weight else None
        self.bias = jnp.zeros(self.shape) if use_bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        inv_rms = jax.lax.rsqrt(jnp.mean(x**2) + self.eps)
        out = x * inv_rms
        if self.weight is not None:
            out = out * self.weight
        if self.bias is not None:
            out = out + self.bias
        return out


class LayerNorm(Module):
    weight: tp.Optional[jax.Array]
    bias: tp.Optional[jax.Array]
    eps: float = static_field()
    shape: tuple = static_field()

    def __init__(
        self,
        shape,
        eps: float = 1e-5,
        use_weight: bool = True,
        use_bias: bool = True,
    ):
        if isinstance(shape, int):
            shape = (shape,)
        self.shape = tuple(shape)
        self.eps = eps
        self.weight = jnp.ones(self.shape) if use_weight else None
        self.bias = jnp.zeros(self.shape) if use_bias else None

    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x)
        var = jnp.var(x)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.weight is not None:
            out = out * self.weight
        if self.bias is not None:
            out = out + self.bias
        return out


class Embedding(Module):
    weight: jax.Array
    num_embeddings: int = static_field()
    embedding_size: int = static_field()

    def __init__(self, num_embeddings: int, embedding_size: int, *, key: jax.Array):
        self.weight = jr.normal(key, (num_embeddings, embedding_size))
        self.num_embeddings = num_embeddings
        self.embedding_size = embedding_size

    def __call__(self, idx: jax.Array) -> jax.Array:
        return self.weight[idx]


class Dropout(Module):
    p: float = static_field()

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(
        self, x: jax.Array, *, key: tp.Optional[jax.Array] = None, inference: bool = False
    ) -> jax.Array:
        if inference or self.p == 0.0 or key is None:
            return x
        keep = 1.0 - self.p
        mask = jr.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class Conv2d(Module):
    """Minimal NCHW 2-D convolution (for the discrete baselines)."""

    weight: jax.Array
    bias: tp.Optional[jax.Array]
    stride: tuple = static_field()
    padding: tuple = static_field()

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        use_bias: bool = True,
        *,
        key: jax.Array,
    ):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if isinstance(stride, int):
            stride = (stride, stride)
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        elif isinstance(padding, (tuple, list)) and all(
            isinstance(p, int) for p in padding
        ):
            # equinox semantics: one int per spatial dim, symmetric.
            padding = tuple((p, p) for p in padding)
        wkey, bkey = jr.split(key, 2)
        fan_in = in_channels * kernel_size[0] * kernel_size[1]
        lim = 1.0 / math.sqrt(fan_in)
        self.weight = jr.uniform(
            wkey, (out_channels, in_channels, *kernel_size), minval=-lim, maxval=lim
        )
        self.bias = (
            jr.uniform(bkey, (out_channels,), minval=-lim, maxval=lim)
            if use_bias
            else None
        )
        self.stride = tuple(stride)
        self.padding = tuple(padding)

    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (C, H, W) single example.
        out = jax.lax.conv_general_dilated(
            x[None],
            self.weight,
            window_strides=self.stride,
            padding=self.padding,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0]
        if self.bias is not None:
            out = out + self.bias[:, None, None]
        return out
