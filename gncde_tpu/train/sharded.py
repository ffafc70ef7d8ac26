"""Sharded training step: DP over trajectories x graph partition over nodes.

Builds one jitted train step whose inputs carry NamedShardings on a
(data, graph) mesh; XLA's SPMD partitioner inserts the psum for gradient
combination across the data axis and the collectives for the node-sharded
dense operator products. This is the multi-chip path the single-chip trainer
composes with (the reference has no distributed path at all).

NOTE on kernels: this GSPMD path targets the DENSE XLA fused operator (the
SPMD partitioner can slice and insert collectives around plain HLO, but a
Pallas custom call is opaque to it) -- runs through it should keep
``fusion_backend: dense``. Multi-chip runs that want the Pallas kernel
speed use the shard_map path instead: parallel/sharded_ops.py
``backend="pallas"`` keeps every per-shard heavy product on the tiled pair
kernel (forward AND adjoint) with explicit all_gather/psum_scatter or
ppermute-halo collectives; parallel/sharded_model.py
``make_sharded_gncde_loss(backend="pallas")`` is the training entry.
"""

from __future__ import annotations

import typing as tp

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn import filter_value_and_grad, partition, is_inexact_array, apply_updates
from ..parallel.mesh import dyn_data_shardings, replicated, shard_tree


def make_sharded_step(
    mesh: Mesh,
    optimiser: optax.GradientTransformation,
    loss: tp.Callable,
    example_data,
):
    """Returns (step_fn, place_fn). ``place_fn(model, opt_state, data)``
    device_puts everything with the right shardings; ``step_fn`` is jitted
    over the mesh."""

    data_shardings = dyn_data_shardings(mesh, example_data)
    rep = replicated(mesh)

    def place(model, opt_state, data):
        """``data`` is this process's local batch slice in the multi-host
        case (parallel.multihost.process_batch_slice); the full batch when
        single-process."""
        from ..parallel import multihost

        model = shard_tree(model, rep)
        opt_state = shard_tree(opt_state, rep)
        data = multihost.distribute_batch(data, data_shardings)
        return model, opt_state, data

    @jax.jit
    def step(model, opt_state, data_i):
        loss_val, grads = filter_value_and_grad(loss)(model, data_i)
        params, _ = partition(model, is_inexact_array)
        updates, opt_state = optimiser.update(grads, opt_state, params)
        model = apply_updates(model, updates)
        return loss_val, model, opt_state

    return step, place
