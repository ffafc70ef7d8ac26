"""Node-sharded BLOCK-SPARSE message passing (the BCSR half of the
kernel-keeping multi-chip path, VERDICT r4 item 1).

Each device owns block-row slabs of BOTH layouts, so the transpose pair is
row-local (no psum_scatter). Covers: the slab SpMM primitive (values +
gradients vs dense), the sharded fused apply vs the dense oracle
(undirected and directed), the full vf stack, and gradients through the
sharded apply (d_M riding shard_map's all_gather transpose).
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gncde_tpu.interp import backward_hermite_coefficients
from gncde_tpu.interp.bcsr_paths import BCSRMatrixControl
from gncde_tpu.models.vector_fields import (
    PermEquivDirGraphVectorField,
    PermEquivGraphVectorField,
)
from gncde_tpu.ops.bcsr import bcsr_slab_spmm, slot_mask
from gncde_tpu.ops.equiv_basis import fused_apply
from gncde_tpu.parallel.mesh import make_mesh
from gncde_tpu.parallel.sharded_ops import (
    make_sharded_bcsr_vf_eval,
    sharded_bcsr_fused_apply,
)

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _banded(key, n, width):
    i = np.arange(n)
    d = (i[:, None] - i[None, :] + n // 2) % n - n // 2
    band = np.abs(d) <= width
    vals = np.asarray(jr.uniform(key, (n, n))) * 0.1
    return jnp.asarray(np.where(band, vals, 0.0).astype(np.float32))


def _control(n, bs, T=5, key=0):
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jnp.stack([_banded(jr.PRNGKey(key + i), n, 5) for i in range(T)])
    return BCSRMatrixControl.from_knots(ts, A_path, "cubic", block_size=bs), ts


def test_slab_spmm_matches_dense_and_grads():
    n, bs = 32, 8
    ctrl, ts = _control(n, bs)
    val = ctrl.adj(jnp.asarray(0.3))
    lay = val.layout
    M = jr.normal(jr.PRNGKey(9), (n, 4))
    valid = slot_mask(lay.block_idx, lay.nblocks)

    from gncde_tpu.ops.bcsr import BCSR, bcsr_to_dense

    dense = bcsr_to_dense(BCSR(lay.block_idx, val.blocks, n))

    def f(blocks, Mp):
        return jnp.sum(
            jnp.sin(bcsr_slab_spmm(blocks, lay.block_idx, valid, Mp))
        )

    def f_ref(blocks, Mp):
        from gncde_tpu.ops.bcsr import BCSR, bcsr_to_dense

        d = bcsr_to_dense(BCSR(lay.block_idx, blocks, n))
        return jnp.sum(jnp.sin(d @ Mp))

    out = bcsr_slab_spmm(val.blocks, lay.block_idx, valid, M)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense @ M), atol=1e-4, rtol=1e-4
    )
    g = jax.grad(f, argnums=(0, 1))(val.blocks, M)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(val.blocks, M)
    np.testing.assert_allclose(
        np.asarray(g[1]), np.asarray(g_ref[1]), atol=1e-4, rtol=1e-4
    )
    # Block cotangents agree on VALID slots (padded slots are masked).
    np.testing.assert_allclose(
        np.asarray(g[0] * valid[:, :, None, None]),
        np.asarray(g_ref[0] * valid[:, :, None, None]),
        atol=1e-4, rtol=1e-4,
    )


def _slab_args(val_a, val_d):
    lay = val_a.layout
    return (
        val_a.blocks, val_d.blocks, val_a.blocks_T, val_d.blocks_T,
        lay.block_idx, lay.nblocks, lay.block_idx_T, lay.nblocks_T,
        lay.diag_slot,
    )


@needs8
@pytest.mark.parametrize("directed", [False, True])
def test_sharded_bcsr_fused_apply_matches_dense(directed):
    n, bs, G, H = 64, 8, 8, 4
    mesh = make_mesh(G, graph_axis=G)
    ctrl, ts = _control(n, bs)
    t = jnp.asarray(0.4)
    valA, valD = ctrl.adj(t), ctrl.dadj(t)
    ks = jr.split(jr.PRNGKey(1), 12)
    M = jr.normal(ks[0], (n, H))
    nparams = 11 if directed else 8
    params = tuple(
        1 / 15 * jr.uniform(k, (2,), minval=-1, maxval=1)
        for k in ks[1 : 1 + nparams]
    )

    def local(bA, bdA, bAT, bdAT, bidx, nbl, bidxT, nblT, dslot, M_loc):
        return sharded_bcsr_fused_apply(
            bA, bdA, bAT, bdAT, bidx, nbl, bidxT, nblT, dslot, M_loc,
            params, n, "graph", add_identity=True, directed=directed,
        )

    rowd = P("graph", None)
    row = P("graph")
    f = shard_map(
        local, mesh=mesh,
        in_specs=(rowd, rowd, rowd, rowd, rowd, row, rowd, row, row, rowd),
        out_specs=P("graph", None),
        check_vma=False,
    )
    got = jax.jit(f)(*_slab_args(valA, valD), M)

    from gncde_tpu.ops.bcsr import BCSR, bcsr_to_dense

    lay = valA.layout
    A = bcsr_to_dense(BCSR(lay.block_idx, valA.blocks, n))
    dA = bcsr_to_dense(BCSR(lay.block_idx, valD.blocks, n))
    want = fused_apply(A, dA, M, params, directed=directed, add_identity=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


@needs8
def test_sharded_bcsr_vf_stack_and_grads():
    """Full vf stack over block-row-sharded BCSR planes + gradients wrt Z
    through the sharded apply (d_M crosses the all_gather transpose)."""
    n, bs, G, H = 64, 8, 8, 4
    mesh = make_mesh(G, graph_axis=G)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(3),
    )
    ctrl, ts = _control(n, bs, key=5)
    t = jnp.asarray(0.6)
    valA, valD = ctrl.adj(t), ctrl.dadj(t)
    Z = jr.normal(jr.PRNGKey(4), (n, H))

    f = make_sharded_bcsr_vf_eval(mesh, vf, valA.layout, n)
    got = f(Z, valA.blocks, valD.blocks, valA.blocks_T, valD.blocks_T)

    from gncde_tpu.ops.bcsr import BCSR, bcsr_to_dense

    lay = valA.layout
    A = bcsr_to_dense(BCSR(lay.block_idx, valA.blocks, n))
    dA = bcsr_to_dense(BCSR(lay.block_idx, valD.blocks, n))
    feats = Z
    for i, layer in enumerate(vf.gnn_layers):
        feats = layer(feats, A, dA)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(feats), atol=1e-4, rtol=1e-3
    )

    def loss_sharded(Z_):
        out = f(Z_, valA.blocks, valD.blocks, valA.blocks_T, valD.blocks_T)
        return jnp.sum(out**2)

    def loss_dense(Z_):
        feats = Z_
        for i, layer in enumerate(vf.gnn_layers):
            feats = layer(feats, A, dA)
            if i < len(vf.gnn_layers) - 1:
                feats = jax.nn.relu(feats)
        return jnp.sum(feats**2)

    gs = jax.grad(loss_sharded)(Z)
    gd = jax.grad(loss_dense)(Z)
    np.testing.assert_allclose(
        np.asarray(gs), np.asarray(gd), atol=1e-3, rtol=1e-3
    )
