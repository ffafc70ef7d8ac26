"""Device-mesh construction and sharding specs for GNCDE workloads.

Parallelism mapping for this model family (SURVEY.md section 2.2):
  * ``data`` axis: the trajectory/batch dimension every dyn/oversampling
    task vmaps over (DP). Gradients are combined by XLA's SPMD partitioner
    (psum inserted automatically under jit with sharded inputs).
  * ``graph`` axis: the node dimension of the dense operator and latent
    state -- the graph IS the model here, so this is the TP/CP-analogue
    axis. Adjacency control-path coefficients shard as (n/g, n), latent
    states as (n/g, H); boundary contributions ride ICI collectives.

The reference is single-device with no parallelism of any kind (SURVEY.md
section 2.2); this module is new TPU-native capability.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: tp.Optional[int] = None,
    graph_axis: tp.Optional[int] = None,
) -> Mesh:
    """Create a (data, graph) mesh over the first ``n_devices`` devices.

    ``graph_axis`` defaults to 2 when the device count allows it, else 1.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if graph_axis is None:
        graph_axis = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    data_axis = n_devices // graph_axis
    if data_axis * graph_axis != n_devices:
        raise ValueError(f"{n_devices} devices not divisible into graph={graph_axis}")
    dev_array = np.array(devices).reshape(data_axis, graph_axis)
    return Mesh(dev_array, ("data", "graph"))


def batch_spec(ndim: int, node_axes: tp.Sequence[int] = ()) -> P:
    """PartitionSpec for a batched array: axis 0 -> data, ``node_axes`` ->
    graph (first listed node axis only; the rest replicate)."""
    parts: tp.List = [None] * ndim
    parts[0] = "data"
    if node_axes:
        parts[node_axes[0]] = "graph"
    return P(*parts)


def dyn_data_shardings(mesh: Mesh, data_tuple) -> tuple:
    """Shardings for the dyn task's (ts, coeffs, y, x0) tuple.

    ts: (B,T) -> (data,)
    coeffs: tuple of (B,T-1,n,n,2) -> (data, None, graph, None, None)
    y: (B,T,n) -> (data, None, graph)
    x0: (B,n,C) -> (data, graph, None)
    """
    ts, coeffs, y, x0 = data_tuple

    def ns(spec):
        return NamedSharding(mesh, spec)

    coeff_spec = jax.tree_util.tree_map(
        lambda c: ns(P("data", None, "graph", None, None)), coeffs
    )
    return (
        ns(P("data", None)),
        coeff_spec,
        ns(P("data", None, "graph")),
        ns(P("data", "graph", None)),
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_tree(tree, sharding):
    """Place every array leaf of ``tree`` with ``sharding``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, tree
    )
