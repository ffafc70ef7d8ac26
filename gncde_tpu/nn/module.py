"""Pytree-native module system for gncde_tpu.

A from-scratch, JAX-idiomatic replacement for the Equinox module layer the
reference builds on (reference: src/models/*.py all subclass ``eqx.Module``).
Modules are dataclasses registered as pytrees: array-valued fields are pytree
leaves (trainable state), fields declared with ``field(static=True)`` ride in
the hashable treedef aux data so plain ``jax.jit`` / ``jax.grad`` work directly
on model objects.

Design notes (TPU-first):
  * No filtered-transform machinery is required at trace time -- static
    metadata lives in the treedef, so models pass through ``jax.jit``,
    ``jax.vmap``, ``shard_map`` etc. unchanged.
  * ``partition``/``combine`` provide Equinox-style param/static splitting for
    optimisers (optax sees only inexact-array leaves).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

_MISSING = dataclasses.MISSING


def field(*, static: bool = False, default=_MISSING, default_factory=_MISSING):
    """Declare a module field; ``static=True`` puts it in the treedef."""
    kwargs = {}
    if default is not _MISSING:
        kwargs["default"] = default
    if default_factory is not _MISSING:
        kwargs["default_factory"] = default_factory
    return dataclasses.field(metadata={"static": static}, **kwargs)


static_field = lambda **kw: field(static=True, **kw)


def _hashable(x):
    """Convert config-ish values to hashable equivalents for treedef aux."""
    if isinstance(x, (list, tuple)):
        return tuple(_hashable(v) for v in x)
    if isinstance(x, dict):
        return tuple(sorted((k, _hashable(v)) for k, v in x.items()))
    return x


class _ModuleMeta(type):
    def __new__(mcs, name, bases, namespace, **kwargs):
        cls = super().__new__(mcs, name, bases, namespace, **kwargs)
        if namespace.get("_gncde_abstract_", False):
            return cls
        cls = dataclasses.dataclass(eq=False, repr=False)(cls)
        fields = dataclasses.fields(cls)
        dyn_names = tuple(
            f.name for f in fields if not f.metadata.get("static", False)
        )
        sta_names = tuple(f.name for f in fields if f.metadata.get("static", False))
        cls._dyn_names_ = dyn_names
        cls._sta_names_ = sta_names

        def flatten_with_keys(obj):
            children = tuple(
                (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in dyn_names
            )
            aux = tuple(_hashable(getattr(obj, n)) for n in sta_names)
            return children, aux

        def flatten(obj):
            children = tuple(getattr(obj, n) for n in dyn_names)
            aux = tuple(_hashable(getattr(obj, n)) for n in sta_names)
            return children, aux

        def unflatten(aux, children):
            obj = object.__new__(cls)
            for n, v in zip(dyn_names, children):
                object.__setattr__(obj, n, v)
            for n, v in zip(sta_names, aux):
                object.__setattr__(obj, n, v)
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )
        return cls


class Module(metaclass=_ModuleMeta):
    """Base class for all gncde_tpu modules (models, layers, vector fields)."""

    _gncde_abstract_ = True

    def __repr__(self):
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name, None)
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                parts.append(f"{f.name}=Array{tuple(v.shape)}")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{type(self).__name__}({', '.join(parts)})"

    def replace(self, **updates) -> "Module":
        """Structural field replacement (bypasses the custom ``__init__``)."""
        cls = type(self)
        new = object.__new__(cls)
        for f in dataclasses.fields(self):
            value = updates.pop(f.name, getattr(self, f.name))
            object.__setattr__(new, f.name, value)
        if updates:
            raise TypeError(f"Unknown fields in replace: {sorted(updates)}")
        return new


# ---------------------------------------------------------------------------
# Filtering utilities (Equinox-style partition/combine, reimplemented).
# ---------------------------------------------------------------------------

def is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


def is_inexact_array(x) -> bool:
    return is_array(x) and jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)


def partition(tree, pred=is_inexact_array):
    """Split ``tree`` into (dynamic, static) with ``None`` placeholders."""
    dyn = jax.tree_util.tree_map(lambda x: x if pred(x) else None, tree)
    sta = jax.tree_util.tree_map(lambda x: None if pred(x) else x, tree)
    return dyn, sta


def combine(*trees):
    """Inverse of :func:`partition`: first non-None leaf wins."""

    def _pick(*xs):
        for x in xs:
            if x is not None:
                return x
        return None

    return jax.tree_util.tree_map(_pick, *trees, is_leaf=lambda x: x is None)


def filter_value_and_grad(fn, has_aux: bool = False):
    """``jax.value_and_grad`` over only the inexact-array leaves of arg 0."""

    def wrapped(model, *args, **kwargs):
        params, static = partition(model, is_inexact_array)

        def inner(p):
            return fn(combine(p, static), *args, **kwargs)

        return jax.value_and_grad(inner, has_aux=has_aux)(params)

    return wrapped


def filter_grad(fn, has_aux: bool = False):
    vg = filter_value_and_grad(fn, has_aux=has_aux)

    def wrapped(model, *args, **kwargs):
        _, g = vg(model, *args, **kwargs)
        return g

    return wrapped


def apply_updates(model, updates):
    """Apply optax updates (None leaves allowed) to a module tree."""

    def _apply(p, u):
        if u is None:
            return p
        return p + u

    return jax.tree_util.tree_map(
        _apply, model, updates, is_leaf=lambda x: x is None
    )


def num_params(model) -> int:
    leaves = [x for x in jax.tree_util.tree_leaves(model) if is_inexact_array(x)]
    return int(sum(np.prod(x.shape) for x in leaves))


# ---------------------------------------------------------------------------
# Leaf serialisation (replaces eqx.tree_serialise_leaves; reference:
# src/engine/trainer.py:68-79 checkpoints via tree_serialise_leaves).
# ---------------------------------------------------------------------------

def _leaf_key(path) -> str:
    return "/".join(str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p)))) for p in path)


def tree_serialise_leaves(path: str, tree) -> None:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for i, (kp, leaf) in enumerate(flat):
        if is_array(leaf):
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    np.savez(path, **arrays)


def tree_deserialise_leaves(path: str, like):
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten(like)
    out = []
    for i, leaf in enumerate(flat):
        key = f"leaf_{i}"
        if is_array(leaf) and key in data:
            out.append(jnp.asarray(data[key]))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
