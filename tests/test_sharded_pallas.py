"""The multi-device path that KEEPS the Pallas kernels (VERDICT r4 item 1).

Covers, on the virtual 8-device CPU mesh (kernels in interpret mode):
  * the rectangular plane-pair primitive vs dense math, values and grads,
  * shard-local kernel tiles vs the single-chip tiled kernel (rowpart
    bitwise-identical; colpart allclose up to reduction order),
  * the sharded vf stack with backend="pallas" vs the dense oracle,
  * the full node-sharded training loss (adaptive solve + adjoint) with
    backend="pallas" vs backend="xla" -- gradients through the kernels,
    the collectives, and the checkpointed adjoint.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gncde_tpu.ops.equiv_basis import fused_apply
from gncde_tpu.ops.pallas.tiled import _cdiv, plane_pair_apply
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField
from gncde_tpu.parallel.mesh import make_mesh
from gncde_tpu.parallel.sharded_ops import make_sharded_vf_eval

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _pad_rows(x, rows):
    out = jnp.zeros((rows, x.shape[1]), x.dtype)
    return out.at[: x.shape[0]].set(x)


@pytest.mark.parametrize("nr,nc,tile", [(16, 48, 16), (12, 40, 16)])
def test_plane_pair_apply_matches_dense(nr, nc, tile):
    key = jr.PRNGKey(0)
    ks = jr.split(key, 6)
    A = jr.normal(ks[0], (nr, nc))
    dA = jr.normal(ks[1], (nr, nc))
    c_row = jr.normal(ks[2], (2,))
    c_col = jr.normal(ks[3], (2,))
    H = 8
    NPr, NPc = _cdiv(nr, tile) * tile, _cdiv(nc, tile) * tile
    Mk = _pad_rows(jr.normal(ks[4], (nc, H)), NPc)
    Mi = _pad_rows(jr.normal(ks[5], (nr, H)), NPr)

    rowp, colp = plane_pair_apply(A, dA, c_row, c_col, Mk, Mi, nr, nc, tile)
    B1 = c_row[0] * A + c_row[1] * dA
    B2 = c_col[0] * A + c_col[1] * dA
    np.testing.assert_allclose(
        np.asarray(rowp[:nr]), np.asarray(B1 @ Mk[:nc]), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(colp[:nc]), np.asarray(B2.T @ Mi[:nr]), atol=1e-5, rtol=1e-5
    )
    assert np.all(np.asarray(rowp[nr:]) == 0.0)


def test_plane_pair_apply_grads_match_dense():
    nr, nc, tile, H = 12, 24, 8, 4
    key = jr.PRNGKey(1)
    ks = jr.split(key, 6)
    A = jr.normal(ks[0], (nr, nc))
    dA = jr.normal(ks[1], (nr, nc))
    c_row = jr.normal(ks[2], (2,))
    c_col = jr.normal(ks[3], (2,))
    NPr, NPc = _cdiv(nr, tile) * tile, _cdiv(nc, tile) * tile
    Mk = _pad_rows(jr.normal(ks[4], (nc, H)), NPc)
    Mi = _pad_rows(jr.normal(ks[5], (nr, H)), NPr)

    def via_kernel(A, dA, c_row, c_col, Mk, Mi):
        r, c = plane_pair_apply(A, dA, c_row, c_col, Mk, Mi, nr, nc, tile)
        return jnp.sum(r[:nr] ** 2) + jnp.sum(jnp.sin(c[:nc]))

    def via_dense(A, dA, c_row, c_col, Mk, Mi):
        B1 = c_row[0] * A + c_row[1] * dA
        B2 = c_col[0] * A + c_col[1] * dA
        r = B1 @ Mk[:nc]
        c = B2.T @ Mi[:nr]
        return jnp.sum(r**2) + jnp.sum(jnp.sin(c))

    args = (A, dA, c_row, c_col, Mk, Mi)
    got = jax.grad(via_kernel, argnums=(0, 1, 2, 3, 4, 5))(*args)
    want = jax.grad(via_dense, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for g, w, name in zip(got, want, ("A", "dA", "c_row", "c_col", "Mk", "Mi")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-2, rtol=2e-2,
            err_msg=f"cotangent {name}",
        )


def test_slab_tiles_match_single_chip_kernel():
    """Per-shard slab kernel vs ONE full-matrix kernel call: the row parts
    must be BITWISE identical (same tile sweep, same accumulation order);
    the column part is a sum of per-slab partials (different reduction
    order) and must be allclose."""
    n, H, G, tile = 64, 8, 4, 16
    key = jr.PRNGKey(2)
    ks = jr.split(key, 4)
    A = jr.normal(ks[0], (n, n))
    dA = jr.normal(ks[1], (n, n))
    M = jr.normal(ks[2], (n, H))
    c_row = jnp.asarray([1.3, -0.4])
    c_col = jnp.asarray([0.7, 0.2])

    full_row, full_col = plane_pair_apply(
        A, dA, c_row, c_col, M, M, n, n, tile)

    n_loc = n // G
    slab_rows = []
    col_sum = jnp.zeros((n, H))
    for g in range(G):
        A_loc = A[g * n_loc : (g + 1) * n_loc]
        dA_loc = dA[g * n_loc : (g + 1) * n_loc]
        Mi = _pad_rows(M[g * n_loc : (g + 1) * n_loc], tile)
        r, c = plane_pair_apply(
            A_loc, dA_loc, c_row, c_col, M, Mi, n_loc, n, tile)
        slab_rows.append(r[:n_loc])
        col_sum = col_sum + c
    got_row = jnp.concatenate(slab_rows, axis=0)
    assert np.array_equal(np.asarray(got_row), np.asarray(full_row)), (
        "shard-local rowpart tiles differ from the single-chip kernel"
    )
    np.testing.assert_allclose(
        np.asarray(col_sum), np.asarray(full_col), atol=1e-4, rtol=1e-4
    )


@needs8
def test_sharded_pallas_vf_stack_matches_dense():
    n, H = 64, 8
    mesh = make_mesh(8, graph_axis=8)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=3,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(1),
    )
    Z = jr.normal(jr.PRNGKey(2), (n, H))
    A = jr.normal(jr.PRNGKey(3), (n, n)) * 0.1
    dA = jr.normal(jr.PRNGKey(4), (n, n)) * 0.1

    f = make_sharded_vf_eval(mesh, vf, backend="pallas", tile=8)
    got = f(Z, A, dA)

    feats = Z
    for i, layer in enumerate(vf.gnn_layers):
        feats = layer(feats, A, dA)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(feats), atol=1e-4, rtol=1e-3
    )


@needs8
def test_sharded_pallas_loss_grads_match_xla_backend():
    """Full sharded training loss (adaptive solve + adjoint) with the
    per-shard Pallas kernels == the XLA-backend sharded loss, values and
    parameter gradients."""
    from gncde_tpu.interp import backward_hermite_coefficients
    from gncde_tpu.parallel.sharded_model import make_sharded_gncde_loss
    from gncde_tpu.solve import ConstantStepSize

    n, T, H, G = 32, 5, 8, 8
    mesh = make_mesh(G, graph_axis=G)
    key = jr.PRNGKey(7)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=key,
    )
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(8), (T, n, n)) * 0.1
    coeffs = backward_hermite_coefficients(ts, A_path)
    y0 = jr.normal(jr.PRNGKey(9), (n, H)) * 0.1
    labels = jnp.zeros((T, n, H))

    losses, grads = {}, {}
    for backend in ("xla", "pallas"):
        # Fixed steps: both backends take the identical step sequence, so the
        # comparison isolates the kernels (adaptive stepping would amplify
        # f32 accumulation-order noise through accept/reject divergence).
        loss_fn, params0 = make_sharded_gncde_loss(
            mesh, vf, max_steps=64, backend=backend, tile=8,
            stepsize_controller=ConstantStepSize(), dt0=0.05,
        )
        with mesh:
            val, g = jax.jit(jax.value_and_grad(loss_fn))(
                params0, ts, tuple(coeffs), y0, labels
            )
        losses[backend] = float(val)
        grads[backend] = g
    assert np.isfinite(losses["pallas"])
    np.testing.assert_allclose(
        losses["pallas"], losses["xla"], rtol=1e-5, atol=1e-8
    )
    flat_p = jax.tree_util.tree_leaves(grads["pallas"])
    flat_x = jax.tree_util.tree_leaves(grads["xla"])
    assert len(flat_p) == len(flat_x) and flat_p
    for gp, gx in zip(flat_p, flat_x):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-3
        )
