"""Checkpoint / resume.

The reference only ever SAVES best-model weights (eqx.tree_serialise_leaves,
src/engine/trainer.py:68-79) -- there is no load/resume path and optimiser
state is dropped (SURVEY.md section 5). Here full training state (model
params, optimiser state, epoch, best metric) round-trips through orbax, and
a light npz path keeps weight-only snapshots cheap.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import numpy as np

from ..nn import tree_serialise_leaves, tree_deserialise_leaves

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # noqa: BLE001
    _HAS_ORBAX = False


def save_weights(path: str, model) -> str:
    """Weight-only snapshot (npz), the analogue of the reference's .eqx file."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    tree_serialise_leaves(path, model)
    return path


def load_weights(path: str, like):
    return tree_deserialise_leaves(path, like)


class TrainState(tp.NamedTuple):
    model: tp.Any
    opt_state: tp.Any
    epoch: int
    best_metric: float


def save_state(directory: str, state: TrainState) -> None:
    """Full-state checkpoint for resume (orbax if available, else npz pair)."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        arrays = {
            "model": jax.tree_util.tree_map(np.asarray, _arrays_only(state.model)),
            "opt_state": jax.tree_util.tree_map(np.asarray, _arrays_only(state.opt_state)),
        }
        ckptr.save((d / "state").absolute(), arrays, force=True)
        ckptr.wait_until_finished()
    else:
        tree_serialise_leaves(str(d / "model.npz"), state.model)
        tree_serialise_leaves(str(d / "opt_state.npz"), state.opt_state)
    np.savez(d / "meta.npz", epoch=state.epoch, best_metric=state.best_metric)


def _arrays_only(tree):
    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, (jax.Array, np.ndarray)) else None, tree
    )


def load_state(directory: str, like: TrainState) -> tp.Optional[TrainState]:
    d = Path(directory)
    if not (d / "meta.npz").exists():
        return None
    meta = np.load(d / "meta.npz")
    if _HAS_ORBAX and (d / "state").exists():
        ckptr = ocp.StandardCheckpointer()
        target = {
            "model": jax.tree_util.tree_map(np.asarray, _arrays_only(like.model)),
            "opt_state": jax.tree_util.tree_map(np.asarray, _arrays_only(like.opt_state)),
        }
        restored = ckptr.restore((d / "state").absolute(), target)
        model = _merge(like.model, restored["model"])
        opt_state = _merge(like.opt_state, restored["opt_state"])
    else:
        model = tree_deserialise_leaves(str(d / "model.npz"), like.model)
        opt_state = tree_deserialise_leaves(str(d / "opt_state.npz"), like.opt_state)
    return TrainState(
        model=model,
        opt_state=opt_state,
        epoch=int(meta["epoch"]),
        best_metric=float(meta["best_metric"]),
    )


def _merge(like, restored):
    import jax.numpy as jnp

    def pick(a, b):
        if b is None:
            return a
        return jnp.asarray(b)

    return jax.tree_util.tree_map(
        pick, like, restored, is_leaf=lambda x: x is None
    )
