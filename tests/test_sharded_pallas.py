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


def _banded(key, n, width):
    i = np.arange(n)
    d = (i[:, None] - i[None, :] + n // 2) % n - n // 2
    band = np.abs(d) <= width
    vals = np.asarray(jr.uniform(key, (n, n))) * 0.1
    return jnp.asarray(np.where(band, vals, 0.0).astype(np.float32))


def test_dense_halo_width():
    from gncde_tpu.parallel.sharded_ops import dense_halo_width

    n, G = 64, 8
    A = _banded(jr.PRNGKey(0), n, 3)  # band 3 < n_loc 8 -> halo 1
    assert dense_halo_width(A, G) == 1
    A9 = _banded(jr.PRNGKey(0), n, 9)  # band crosses one shard -> halo 2
    assert dense_halo_width(A9, G) == 2
    assert dense_halo_width(jnp.zeros((n, n)), G) == 0


@needs8
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_sharded_dense_halo_matches_dense(backend):
    """Banded dense slabs: halo-ring exchange + windowed heavy products ==
    the full dense oracle, on both backends."""
    from gncde_tpu.parallel.sharded_ops import (
        dense_halo_width,
        sharded_fused_apply,
    )

    n, H, G = 64, 8, 8
    mesh = make_mesh(G, graph_axis=G)
    key = jr.PRNGKey(3)
    ks = jr.split(key, 12)
    A = _banded(ks[0], n, 3)
    dA = _banded(ks[1], n, 3)
    M = jr.normal(ks[2], (n, H))
    params = tuple(
        1 / 15 * jr.uniform(k, (2,), minval=-1, maxval=1) for k in ks[3:11]
    )
    halo = dense_halo_width(A, G)
    assert halo == 1

    def local(A_loc, dA_loc, M_loc):
        return sharded_fused_apply(
            A_loc, dA_loc, M_loc, params, "graph", True,
            backend=backend, tile=8, halo=halo,
        )

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("graph", None), P("graph", None), P("graph", None)),
        out_specs=P("graph", None),
        check_vma=False,
    )
    got = jax.jit(f)(A, dA, M)
    ref = fused_apply(A, dA, M, params, add_identity=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


@needs8
def test_halo_collective_volume_is_o_halo():
    """Regression guard on ICI traffic: the banded halo path must move
    exactly 4*halo ppermute slabs of (n_loc, H) per fused apply (2 gather +
    2 scatter rings at halo=1) and NO all_gather/reduce_scatter, while the
    all-gather path's exchange volume scales with n."""
    from gncde_tpu.parallel.audit import collective_volume, total_bytes
    from gncde_tpu.parallel.sharded_ops import sharded_fused_apply

    n, H, G = 64, 8, 8
    n_loc = n // G
    mesh = make_mesh(G, graph_axis=G)
    ks = jr.split(jr.PRNGKey(11), 12)
    A = _banded(ks[0], n, 3)
    dA = _banded(ks[1], n, 3)
    M = jr.normal(ks[2], (n, H))
    params = tuple(jr.uniform(k, (2,)) for k in ks[3:11])

    def run(halo):
        def local(A_loc, dA_loc, M_loc):
            return sharded_fused_apply(
                A_loc, dA_loc, M_loc, params, "graph", True, halo=halo
            )

        f = shard_map(
            local, mesh=mesh, in_specs=(P("graph", None),) * 3,
            out_specs=P("graph", None), check_vma=False,
        )
        return collective_volume(f, A, dA, M)

    recs_halo = run(1)
    recs_full = run(None)

    slab_bytes = n_loc * H * 4
    perms = [r for r in recs_halo if r.primitive == "ppermute"]
    assert len(perms) == 4 and all(
        r.bytes_per_device == slab_bytes for r in perms
    ), perms
    assert not any(
        r.primitive in ("all_gather", "reduce_scatter", "psum_scatter")
        for r in recs_halo
    )
    # Feature-exchange volume (excluding the O(n) scalar/vector psums):
    # halo path O(halo * n_loc * H); all-gather path's reduce_scatter alone
    # carries the full (n, H) partial.
    halo_exchange = total_bytes(recs_halo, {"ppermute"})
    full_exchange = total_bytes(recs_full, {"all_gather", "reduce_scatter",
                                            "psum_scatter"})
    assert halo_exchange == 4 * slab_bytes
    assert full_exchange >= n * H * 4


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
