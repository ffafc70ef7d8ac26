"""Multi-host (multi-process) bootstrap and data distribution.

SURVEY.md section 2.2 / BASELINE.md north star: scale the GSPMD training step
beyond one host (>=80% efficiency 1 -> 4 hosts). The reference is strictly
single-process (no distributed backend of any kind); this module supplies the
TPU-native story:

  * :func:`initialize` -- one-call ``jax.distributed.initialize`` wrapper,
    idempotent, env-var driven (``COORDINATOR_ADDRESS``/``NUM_PROCESSES``/
    ``PROCESS_ID``), and a no-op on real TPU pods where JAX autodetects the
    topology from the TPU runtime metadata.
  * :func:`make_global_mesh` -- a (data, graph) mesh over ALL processes'
    devices laid out so the ``data`` axis crosses the DCN (host) boundary and
    the ``graph`` axis stays inside each host's ICI domain: the node-sharded
    operator products ride ICI; only gradient psums cross DCN once per step.
  * :func:`distribute_batch` -- per-host batch sharding: each process passes
    only ITS slice of the global batch
    (``jax.make_array_from_process_local_data``) and the jitted GSPMD step
    consumes the resulting global arrays unchanged.

Proven under 2 real OS processes on CPU (tests/test_multihost.py spawns them
with a localhost coordinator) -- the same program path a TPU pod takes.
"""

from __future__ import annotations

import os
import typing as tp

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(
    coordinator_address: tp.Optional[str] = None,
    num_processes: tp.Optional[int] = None,
    process_id: tp.Optional[int] = None,
    local_device_ids: tp.Optional[tp.Sequence[int]] = None,
) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    Resolution order per argument: explicit parameter, then environment
    (``COORDINATOR_ADDRESS``, ``NUM_PROCESSES``, ``PROCESS_ID``), then JAX's
    own autodetection (TPU pods need no configuration at all). Call before
    any other JAX API on every process. A single-process run (no coordinator
    resolvable, NUM_PROCESSES absent or 1) is a no-op, so trainers can call
    this unconditionally.
    """
    # NOTE: do not touch jax.devices()/process_count() here -- any backend
    # query would initialise the runtime before distributed.initialize runs.
    global _INITIALIZED
    if _INITIALIZED:
        return

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    env_np = os.environ.get("NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )

    if coordinator_address is None and num_processes is None:
        return  # single-process; nothing to bootstrap
    if num_processes is not None and num_processes <= 1:
        return

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def make_global_mesh(graph_axis: tp.Optional[int] = None) -> Mesh:
    """(data, graph) mesh over every device of every process.

    ``graph_axis`` (default: devices-per-process, capped at 8) stays within
    one process's ICI domain; the data axis tiles processes across DCN. With
    one process this reduces to parallel.mesh.make_mesh semantics.
    """
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    n_proc = jax.process_count()
    if graph_axis is None:
        graph_axis = min(n_local, 8)
    while graph_axis > 1 and n_local % graph_axis != 0:
        graph_axis -= 1

    if n_proc > 1:
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_local // graph_axis, graph_axis),
                dcn_mesh_shape=(n_proc, 1),
                devices=jax.devices(),
            )
            return Mesh(dev_array, ("data", "graph"))
        except ValueError:
            # No slice metadata (e.g. multi-process CPU): group by process
            # manually -- graph axis within a process, data across them.
            devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
            dev_array = np.array(devs).reshape(
                n_proc * (n_local // graph_axis), graph_axis
            )
            return Mesh(dev_array, ("data", "graph"))
    dev_array = np.array(jax.devices()).reshape(n_total // graph_axis, graph_axis)
    return Mesh(dev_array, ("data", "graph"))


def process_batch_slice(global_batch: int) -> slice:
    """The half-open row range of the global batch this process owns.

    The global batch must divide by process_count (fixed-shape SPMD); the
    data loader feeds each process only its slice.
    """
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n_proc} processes"
        )
    per = global_batch // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def distribute_batch(local_data, shardings):
    """Assemble global jax.Arrays from per-process local batch slices.

    ``local_data``: pytree of host (numpy) arrays holding THIS process's rows
    of the global batch (see :func:`process_batch_slice`). ``shardings``: a
    matching pytree of NamedShardings (e.g. parallel.mesh.dyn_data_shardings
    built on :func:`make_global_mesh`). Single-process: plain device_put.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s),
            local_data,
            shardings,
            is_leaf=lambda x: hasattr(x, "shape"),
        )
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        local_data,
        shardings,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
