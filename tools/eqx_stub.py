"""Minimal equinox facade for EXECUTING reference model code without the
real equinox installed (tools/make_goldens.py injects it as ``equinox`` in
sys.modules before importing reference sources).

The primitives (Linear/MLP/RMSNorm/Embedding) are gncde_tpu.nn's -- written
to mirror equinox's public init/forward semantics -- so goldens generated
through this stub validate the reference's COMPOSITE math (fusion terms, key
choreography, modulation) as actually executed from the reference source
files. Equinox-primitive fidelity itself remains a documented assumption of
gncde_tpu.nn; regenerate with real equinox (make_goldens.py prefers it when
importable) to remove that assumption.
"""

from __future__ import annotations

import sys
import types

from gncde_tpu.nn import layers as _gnn


class Module:
    """Plain attribute-holding base: reference classes annotate fields and
    assign them in __init__; no pytree registration is needed for forward
    execution."""

    def __init__(self, **kwargs):
        if kwargs:
            raise TypeError(f"unexpected kwargs {sorted(kwargs)}")


class Lambda(Module):
    """equinox.nn.Lambda: wrap a function as a (stateless) layer."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x, *, key=None):
        return self.fn(x)


class Sequential(Module):
    """equinox.nn.Sequential: apply layers in order; a provided key is split
    one-per-layer and passed to layers that accept it."""

    def __init__(self, layers):
        self.layers = tuple(layers)

    def __call__(self, x, *, key=None):
        import jax.random as jr

        keys = (
            [None] * len(self.layers)
            if key is None
            else list(jr.split(key, len(self.layers)))
        )
        for layer, k in zip(self.layers, keys):
            try:
                x = layer(x, key=k)
            except TypeError:
                x = layer(x)
        return x


def build_stub() -> types.ModuleType:
    from gncde_tpu.nn import module as _gmod

    eqx = types.ModuleType("equinox")
    eqx.Module = Module
    eqx.is_array = _gmod.is_array
    eqx.partition = _gmod.partition
    nn = types.ModuleType("equinox.nn")
    nn.Linear = _gnn.Linear
    nn.MLP = _gnn.MLP
    nn.RMSNorm = _gnn.RMSNorm
    nn.Embedding = _gnn.Embedding
    nn.LayerNorm = _gnn.LayerNorm
    nn.Conv2d = _gnn.Conv2d
    nn.Dropout = _gnn.Dropout
    nn.Lambda = Lambda
    nn.Sequential = Sequential
    eqx.nn = nn
    return eqx


def install():
    """Register the stub as ``equinox`` / ``equinox.nn`` (no-op if the real
    equinox is importable)."""
    try:
        import equinox  # noqa: F401

        return False
    except ImportError:
        pass
    eqx = build_stub()
    sys.modules["equinox"] = eqx
    sys.modules["equinox.nn"] = eqx.nn
    return True
