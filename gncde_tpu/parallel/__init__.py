"""Multi-device / multi-host parallelism (all new TPU-native capability --
the reference is strictly single-device, SURVEY.md section 2.2).

Public surface:

  * mesh:         (data x graph) device mesh + sharding helpers
  * sharded_ops:  node-partitioned fused message passing under shard_map,
                  dense slabs or sparse ELL row slabs, all_gather or
                  ppermute halo-ring exchange (``ell_halo_width``)
  * sharded_model: whole adaptive CDE solves under shard_map (pmean'd
                  error norm), forward and differentiable-training forms
  * multihost:    jax.distributed bootstrap + per-host batch distribution
"""

from .mesh import (
    batch_spec,
    dyn_data_shardings,
    make_mesh,
    replicated,
    shard_tree,
)
from .sharded_model import (
    make_sharded_gncde_solve,
    make_sharded_sparse_gncde_loss,
    make_sharded_sparse_gncde_solve,
)
from .sharded_ops import (
    ell_halo_width,
    make_sharded_sparse_vf_eval,
    make_sharded_vf_eval,
    sharded_fused_apply,
    sharded_sparse_fused_apply,
)

__all__ = [
    "batch_spec",
    "dyn_data_shardings",
    "ell_halo_width",
    "make_mesh",
    "make_sharded_gncde_solve",
    "make_sharded_sparse_gncde_loss",
    "make_sharded_sparse_gncde_solve",
    "make_sharded_sparse_vf_eval",
    "make_sharded_vf_eval",
    "replicated",
    "shard_tree",
    "sharded_fused_apply",
    "sharded_sparse_fused_apply",
]
