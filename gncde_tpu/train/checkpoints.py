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


class AsyncStateCheckpointer:
    """Non-blocking full-state checkpointing.

    ``save`` snapshots the state to host memory and returns immediately; the
    serialisation/commit happens in the background while training continues
    (orbax ``AsyncCheckpointer`` when available, else a daemon thread around
    the npz writer). A new save first waits for the previous commit, so at
    most one background write is in flight and the on-disk checkpoint is
    always a complete, consistent state. Call ``wait_until_finished`` before
    reading the checkpoint back (resume does this via ``load_state``).

    The reference has no checkpoint/resume at all (it re-serialises best
    weights inline, src/engine/trainer.py:68-79); on TPU pods the blocking
    write would sit inside the step loop, so async is the production default.
    """

    def __init__(self, directory: str):
        self._dir = Path(directory)
        self._thread = None
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
            if _HAS_ORBAX
            else None
        )

    def save(self, state: TrainState) -> None:
        self.wait_until_finished()
        self._dir.mkdir(parents=True, exist_ok=True)
        # Snapshot to host with real copies BEFORE handing off: the training
        # loop may donate/overwrite the device buffers (and on the CPU
        # backend np.asarray can alias them) right after save() returns.
        snap = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: None if x is None else np.array(x), _arrays_only(t)
        )
        if self._ckptr is not None:
            arrays = {"model": snap(state.model), "opt_state": snap(state.opt_state)}
            self._ckptr.save(
                (self._dir / "state").absolute(),
                args=ocp.args.StandardSave(arrays),
                force=True,
            )
        else:
            import threading

            model = _merge(state.model, snap(state.model))
            opt = _merge(state.opt_state, snap(state.opt_state))

            def _write():
                tree_serialise_leaves(str(self._dir / "model.npz"), model)
                tree_serialise_leaves(str(self._dir / "opt_state.npz"), opt)

            self._thread = threading.Thread(target=_write, daemon=True)
            self._thread.start()
        # meta is tiny; write it synchronously, last.
        np.savez(
            self._dir / "meta.npz",
            epoch=state.epoch,
            best_metric=state.best_metric,
        )

    def wait_until_finished(self) -> None:
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()
        if self._thread is not None:
            self._thread.join()
            self._thread = None


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
