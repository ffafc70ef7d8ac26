"""Sharding tests on a virtual 8-device CPU mesh: node-partitioned fused conv
allclose vs the single-device path, and the full sharded training step."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from jax.sharding import Mesh, PartitionSpec as P

from gncde_tpu.parallel.mesh import make_mesh
from gncde_tpu.parallel.sharded_ops import make_sharded_vf_eval, sharded_fused_apply
from gncde_tpu.models.vector_fields import (
    ConvEquivFusionLayer,
    PermEquivGraphVectorField,
)
from gncde_tpu.ops.equiv_basis import fused_apply

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_fused_apply_matches_dense():
    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n, H, G = 64, 16, 8
    mesh = make_mesh(8, graph_axis=8)
    key = jr.PRNGKey(0)
    ks = jr.split(key, 12)
    A = jr.normal(ks[0], (n, n))
    dA = jr.normal(ks[1], (n, n))
    M = jr.normal(ks[2], (n, H))
    params = tuple(
        1 / 15 * jr.uniform(k, (2,), minval=-1, maxval=1) for k in ks[3:11]
    )

    def local(A_loc, dA_loc, M_loc):
        return sharded_fused_apply(A_loc, dA_loc, M_loc, params, "graph", True)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("graph", None), P("graph", None), P("graph", None)),
        out_specs=P("graph", None),
        check_vma=False,
    )
    got = jax.jit(f)(A, dA, M)
    ref = fused_apply(A, dA, M, params, add_identity=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_sharded_vf_stack_matches_dense():
    n, H = 64, 8
    mesh = make_mesh(8, graph_axis=8)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=3,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(1),
    )
    Z = jr.normal(jr.PRNGKey(2), (n, H))
    A = jr.normal(jr.PRNGKey(3), (n, n)) * 0.1
    dA = jr.normal(jr.PRNGKey(4), (n, n)) * 0.1

    f = make_sharded_vf_eval(mesh, vf)
    got = f(Z, A, dA)

    feats = Z
    for i, layer in enumerate(vf.gnn_layers):
        feats = layer(feats, A, dA)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(feats), atol=1e-4, rtol=1e-3)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]


def test_sharded_solve_matches_single_device():
    """Full adaptive CDE solve under shard_map == single-device solve."""
    from gncde_tpu.parallel.sharded_model import make_sharded_gncde_solve
    from gncde_tpu.interp import (
        backward_hermite_coefficients,
        CubicInterpolation,
        MatrixControl,
    )
    from gncde_tpu.solve import ODETerm, SaveAt, PIDController, diffeqsolve

    n, T, H = 64, 6, 8
    mesh = make_mesh(8, graph_axis=8)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(0),
    )
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(1), (T, n, n)) * 0.1
    coeffs = backward_hermite_coefficients(ts, A_path)
    y0 = jr.normal(jr.PRNGKey(2), (n, H)) * 0.1

    # Compare at tight tolerance: at loose tolerances f32 reduction-order
    # differences flip borderline accept decisions, and the two (both valid)
    # step sequences diverge at the tolerance level.
    f = make_sharded_gncde_solve(mesh, vf, rtol=1e-6, atol=1e-9, max_steps=2048)
    with mesh:
        ys_sharded = f(ts, tuple(coeffs), y0)

    ctrl = MatrixControl(CubicInterpolation(ts, coeffs))
    sol = diffeqsolve(
        ODETerm(vf), "tsit5", ts[0], ts[-1], None, y0, args=ctrl,
        stepsize_controller=PIDController(1e-6, 1e-9), saveat=SaveAt(ts=ts),
        max_steps=2048,
    )
    np.testing.assert_allclose(
        np.asarray(ys_sharded), np.asarray(sol.ys), atol=2e-3
    )


def _ell_parts(A, K):
    """Full-array ELL (GLOBAL column ids, padding == n) for shard_map specs."""
    from gncde_tpu.ops.sparse import ell_from_dense

    ell = ell_from_dense(np.asarray(A), max_degree=K)
    return ell.indices, ell.values


@pytest.mark.parametrize("directed", [False, True])
def test_sharded_sparse_fused_apply_matches_dense(directed):
    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from gncde_tpu.parallel.sharded_ops import sharded_sparse_fused_apply

    n, H = 64, 16
    nterms = 11 if directed else 8
    mesh = make_mesh(8, graph_axis=8)
    rng = np.random.default_rng(0)
    # Shared sparsity pattern for A and dA (interp guarantees this), with
    # some diagonal entries so the diag terms are exercised.
    mask = rng.random((n, n)) < 0.1
    np.fill_diagonal(mask, rng.random(n) < 0.5)
    K = int(mask.sum(axis=1).max())  # no truncation vs the dense oracle
    A = np.where(mask, rng.normal(size=(n, n)), 0.0).astype(np.float32)
    dA = np.where(mask, rng.normal(size=(n, n)), 0.0).astype(np.float32)
    M = rng.normal(size=(n, H)).astype(np.float32)
    params = tuple(
        (1 / 15 * rng.uniform(-1, 1, size=2)).astype(np.float32)
        for _ in range(nterms)
    )

    indices, valsA = _ell_parts(A, K)
    _, valsdA = _ell_parts(dA, K)

    def local(idx_loc, vA_loc, vdA_loc, M_loc):
        return sharded_sparse_fused_apply(
            idx_loc, vA_loc, vdA_loc, M_loc, params, n, "graph",
            add_identity=True, directed=directed,
        )

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("graph", None),) * 4,
        out_specs=P("graph", None),
        check_vma=False,
    )
    got = jax.jit(f)(indices, valsA, valsdA, jnp.asarray(M))
    ref = fused_apply(
        jnp.asarray(A), jnp.asarray(dA), jnp.asarray(M), params,
        add_identity=True, directed=directed,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_sharded_sparse_vf_stack_matches_dense():
    from gncde_tpu.parallel.sharded_ops import make_sharded_sparse_vf_eval

    n, H = 64, 8
    mesh = make_mesh(8, graph_axis=8)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=3,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(1),
    )
    rng = np.random.default_rng(1)
    mask = rng.random((n, n)) < 0.1
    K = int(mask.sum(axis=1).max())
    A = np.where(mask, 0.1 * rng.normal(size=(n, n)), 0.0).astype(np.float32)
    dA = np.where(mask, 0.1 * rng.normal(size=(n, n)), 0.0).astype(np.float32)
    Z = jr.normal(jr.PRNGKey(2), (n, H))

    indices, valsA = _ell_parts(A, K)
    _, valsdA = _ell_parts(dA, K)

    f = make_sharded_sparse_vf_eval(mesh, vf, n)
    got = f(Z, indices, valsA, valsdA)

    feats = Z
    for i, layer in enumerate(vf.gnn_layers):
        feats = layer(feats, jnp.asarray(A), jnp.asarray(dA))
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(feats), atol=1e-4, rtol=1e-3)


def test_sharded_sparse_solve_matches_single_device():
    """Full adaptive CDE solve over SPARSE (ELL) controls under shard_map ==
    the single-device sparse-control solve (and, since the union-pattern
    gather is exact, the dense-control solve)."""
    from gncde_tpu.parallel.sharded_model import make_sharded_sparse_gncde_solve
    from gncde_tpu.interp.sparse_paths import SparseMatrixControl
    from gncde_tpu.solve import ODETerm, SaveAt, PIDController, diffeqsolve

    n, T, H = 64, 6, 8
    mesh = make_mesh(8, graph_axis=8)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(0),
    )
    ts = jnp.linspace(0.0, 1.0, T)
    rng = np.random.default_rng(3)
    mask = rng.random((n, n)) < 0.1
    A_path = jnp.asarray(
        np.where(mask, 0.1 * rng.random((T, n, n)), 0.0).astype(np.float32)
    )
    y0 = jr.normal(jr.PRNGKey(2), (n, H)) * 0.1

    ctrl = SparseMatrixControl.from_knots(ts, A_path, "cubic")
    path = ctrl.path

    f = make_sharded_sparse_gncde_solve(
        mesh, vf, n, rtol=1e-6, atol=1e-9, max_steps=2048
    )
    with mesh:
        ys_sharded = f(ts, path.indices, tuple(path.coeffs), y0)

    sol = diffeqsolve(
        ODETerm(vf), "tsit5", ts[0], ts[-1], None, y0, args=ctrl,
        stepsize_controller=PIDController(1e-6, 1e-9), saveat=SaveAt(ts=ts),
        max_steps=2048,
    )
    np.testing.assert_allclose(
        np.asarray(ys_sharded), np.asarray(sol.ys), atol=2e-3
    )


def _banded_mask(n: int, b: int) -> np.ndarray:
    """Circular band mask: (i, j) present iff circular |i - j| <= b."""
    i = np.arange(n)
    d = (i[:, None] - i[None, :] + n // 2) % n - n // 2
    return np.abs(d) <= b


def test_ell_halo_width():
    from gncde_tpu.ops.sparse import ell_from_dense
    from gncde_tpu.parallel.sharded_ops import ell_halo_width

    n, G = 64, 8  # n_loc = 8
    rng = np.random.default_rng(7)

    diag = np.diag(rng.random(n)).astype(np.float32)
    ell = ell_from_dense(diag)
    assert ell_halo_width(ell.indices, n, G) == 0

    band = np.where(_banded_mask(n, 8), rng.random((n, n)), 0.0)
    ell = ell_from_dense(band.astype(np.float32))
    assert ell_halo_width(ell.indices, n, G) == 1

    wide = np.where(_banded_mask(n, 20), rng.random((n, n)), 0.0)
    ell = ell_from_dense(wide.astype(np.float32))
    assert ell_halo_width(ell.indices, n, G) == 3


@pytest.mark.parametrize("directed,band,want_halo", [
    (False, 7, 1), (True, 7, 1), (False, 14, 2),
])
def test_sharded_sparse_fused_apply_halo_matches_dense(directed, band, want_halo):
    """ppermute neighbour-ring halo exchange == dense oracle on a banded
    graph (halo computed from the index pattern; the band=14 case runs two
    rings each way, covering the multi-ring wraparound at shards 0/G-1)."""
    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from gncde_tpu.parallel.sharded_ops import (
        ell_halo_width,
        sharded_sparse_fused_apply,
    )

    n, H, G = 64, 16, 8
    nterms = 11 if directed else 8
    mesh = make_mesh(8, graph_axis=8)
    rng = np.random.default_rng(5)
    mask = _banded_mask(n, band) & (rng.random((n, n)) < 0.7)
    np.fill_diagonal(mask, rng.random(n) < 0.5)
    K = int(mask.sum(axis=1).max())
    A = np.where(mask, rng.normal(size=(n, n)), 0.0).astype(np.float32)
    dA = np.where(mask, rng.normal(size=(n, n)), 0.0).astype(np.float32)
    M = rng.normal(size=(n, H)).astype(np.float32)
    params = tuple(
        (1 / 15 * rng.uniform(-1, 1, size=2)).astype(np.float32)
        for _ in range(nterms)
    )

    indices, valsA = _ell_parts(A, K)
    _, valsdA = _ell_parts(dA, K)
    halo = ell_halo_width(indices, n, G)
    assert halo == want_halo  # the band wraps shard boundaries circularly

    def local(idx_loc, vA_loc, vdA_loc, M_loc):
        return sharded_sparse_fused_apply(
            idx_loc, vA_loc, vdA_loc, M_loc, params, n, "graph",
            add_identity=True, directed=directed, halo=halo,
        )

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("graph", None),) * 4,
        out_specs=P("graph", None),
        check_vma=False,
    )
    got = jax.jit(f)(indices, valsA, valsdA, jnp.asarray(M))
    ref = fused_apply(
        jnp.asarray(A), jnp.asarray(dA), jnp.asarray(M), params,
        add_identity=True, directed=directed,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_sharded_sparse_solve_halo_matches_single_device():
    """Full adaptive sparse solve with ppermute halo exchange == the
    single-device sparse-control solve on a banded dynamic graph."""
    from gncde_tpu.parallel.sharded_model import make_sharded_sparse_gncde_solve
    from gncde_tpu.parallel.sharded_ops import ell_halo_width
    from gncde_tpu.interp.sparse_paths import SparseMatrixControl
    from gncde_tpu.solve import ODETerm, SaveAt, PIDController, diffeqsolve

    n, T, H, G = 64, 6, 8, 8
    mesh = make_mesh(8, graph_axis=8)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(0),
    )
    ts = jnp.linspace(0.0, 1.0, T)
    rng = np.random.default_rng(9)
    mask = _banded_mask(n, 6) & (rng.random((n, n)) < 0.5)
    A_path = jnp.asarray(
        np.where(mask, 0.1 * rng.random((T, n, n)), 0.0).astype(np.float32)
    )
    y0 = jr.normal(jr.PRNGKey(2), (n, H)) * 0.1

    ctrl = SparseMatrixControl.from_knots(ts, A_path, "cubic")
    path = ctrl.path
    halo = ell_halo_width(np.asarray(path.indices), n, G)
    assert halo == 1

    f = make_sharded_sparse_gncde_solve(
        mesh, vf, n, rtol=1e-6, atol=1e-9, max_steps=2048, halo=halo
    )
    with mesh:
        ys_sharded = f(ts, path.indices, tuple(path.coeffs), y0)

    sol = diffeqsolve(
        ODETerm(vf), "tsit5", ts[0], ts[-1], None, y0, args=ctrl,
        stepsize_controller=PIDController(1e-6, 1e-9), saveat=SaveAt(ts=ts),
        max_steps=2048,
    )
    np.testing.assert_allclose(
        np.asarray(ys_sharded), np.asarray(sol.ys), atol=2e-3
    )


def test_sharded_sparse_loss_grads_match_single_device():
    """TRAINING through the node-sharded sparse halo solve: loss value and
    parameter gradients match jax.value_and_grad through the single-device
    sparse-control solve, and one optax step stays finite.

    Fixed steps on both sides: under an adaptive controller the two (both
    valid) step sequences diverge at the tolerance level and the adjoint
    treats its own sequence as constant, so gradients differ by a few e-3
    even when both are correct (verified against finite differences).
    Identical fixed sequences make a tight comparison meaningful."""
    import optax
    from gncde_tpu.parallel.sharded_model import make_sharded_sparse_gncde_loss
    from gncde_tpu.parallel.sharded_ops import ell_halo_width
    from gncde_tpu.interp.sparse_paths import SparseMatrixControl
    from gncde_tpu.nn import combine, is_inexact_array, partition
    from gncde_tpu.solve import (
        ConstantStepSize,
        ODETerm,
        SaveAt,
        diffeqsolve,
    )

    n, T, H, G = 64, 5, 8, 8
    mesh = make_mesh(8, graph_axis=8)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(0),
    )
    ts = jnp.linspace(0.0, 1.0, T)
    rng = np.random.default_rng(11)
    mask = _banded_mask(n, 6) & (rng.random((n, n)) < 0.5)
    A_path = jnp.asarray(
        np.where(mask, 0.1 * rng.random((T, n, n)), 0.0).astype(np.float32)
    )
    y0 = jr.normal(jr.PRNGKey(2), (n, H)) * 0.1
    labels = jr.normal(jr.PRNGKey(3), (T, n, H)) * 0.1

    ctrl = SparseMatrixControl.from_knots(ts, A_path, "cubic")
    path = ctrl.path
    halo = ell_halo_width(np.asarray(path.indices), n, G)

    dt0 = 0.02
    loss_fn, params0 = make_sharded_sparse_gncde_loss(
        mesh, vf, n, max_steps=128, halo=halo,
        stepsize_controller=ConstantStepSize(), dt0=dt0,
    )
    with mesh:
        val, grads = jax.jit(jax.value_and_grad(loss_fn))(
            params0, ts, path.indices, tuple(path.coeffs), y0, labels
        )

    _, static = partition(vf, is_inexact_array)

    def ref_loss(params):
        sol = diffeqsolve(
            ODETerm(combine(params, static)), "tsit5", ts[0], ts[-1], dt0,
            y0, args=ctrl, stepsize_controller=ConstantStepSize(),
            saveat=SaveAt(ts=ts), max_steps=128,
        )
        return jnp.mean((sol.ys - labels) ** 2)

    ref_val, ref_grads = jax.jit(jax.value_and_grad(ref_loss))(params0)

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    got_leaves = jax.tree_util.tree_leaves(grads)
    ref_leaves = jax.tree_util.tree_leaves(ref_grads)
    assert len(got_leaves) == len(ref_leaves)
    for g, r in zip(got_leaves, ref_leaves):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-4, rtol=1e-2
        )

    optimiser = optax.adam(1e-3)
    opt_state = optimiser.init(params0)
    updates, _ = optimiser.update(grads, opt_state, params0)
    new_params = optax.apply_updates(params0, updates)
    assert all(
        bool(jnp.all(jnp.isfinite(p)))
        for p in jax.tree_util.tree_leaves(new_params)
    )
