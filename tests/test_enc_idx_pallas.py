"""enc_idx on the Pallas plane surface (VERDICT r4 item 2).

The 4 enc_idx reference configs (configs/tgb/*/perm_equiv_dir_enc_idx_*)
previously bypassed every Pallas kernel; they now dispatch to
tiled_vf_eval_planes via fields._enc_idx_pallas_eval. These tests pin:
  * tiled_vf_eval_planes == the dense layer-stack oracle, values and
    gradients (planes differentiable -- the new contract vs tiled_vf_eval),
  * the full enc_idx vf __call__ under fusion_backend="megakernel" ==
    the dense-backend XLA path, for both the directed reference config
    shape and the undirected fixed mode,
  * gradients w.r.t. the modulation MLPs and embeddings flow through the
    kernel (non-zero, finite, match the XLA path).
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu import ops as ops_config
from gncde_tpu.interp import (
    CubicInterpolation,
    MatrixControl,
    backward_hermite_coefficients,
)
from gncde_tpu.models.vector_fields import (
    PermEquivDirGraphVectorField,
    PermEquivGraphVectorField,
)
from gncde_tpu.nn import is_inexact_array, partition, combine
from gncde_tpu.ops.pallas.tiled import tiled_vf_eval_planes


@pytest.fixture
def backend_guard():
    prev = ops_config._BACKEND
    yield
    ops_config.set_fusion_backend(prev)


def _mk_vf(directed, n, H=8, L=2, idx_dim=16, key=0):
    cls = PermEquivDirGraphVectorField if directed else PermEquivGraphVectorField
    return cls(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=L,
        data_embed_dim=1, num_nodes=n, enc_idx=True, enc_type="emb",
        idx_dim=idx_dim, key=jr.PRNGKey(key),
    )


def _dense_stack(vf, Z, A, dA):
    feats = Z
    for i, layer in enumerate(vf.gnn_layers):
        feats = layer(feats, A, dA)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    return feats


@pytest.mark.parametrize("directed", [False, True])
@pytest.mark.parametrize("n", [24, 40])
def test_tiled_vf_eval_planes_matches_dense(directed, n):
    vf = _mk_vf(directed, n)
    Z = jr.normal(jr.PRNGKey(2), (n, 8))
    A = jr.normal(jr.PRNGKey(3), (n, n)) * 0.1
    dA = jr.normal(jr.PRNGKey(4), (n, n)) * 0.1
    got = tiled_vf_eval_planes(A, dA, Z, vf, tile=16)
    want = _dense_stack(vf, Z, A, dA)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-3
    )


def test_tiled_vf_eval_planes_plane_grads():
    """Plane cotangents (the new contract vs tiled_vf_eval) match the dense
    stack -- the chain the modulation MLP gradients ride."""
    n, H = 16, 4
    vf = _mk_vf(True, n, H=H)
    Z = jr.normal(jr.PRNGKey(5), (n, H))
    A = jr.normal(jr.PRNGKey(6), (n, n)) * 0.1
    dA = jr.normal(jr.PRNGKey(7), (n, n)) * 0.1

    f_k = lambda A_, dA_: jnp.sum(tiled_vf_eval_planes(A_, dA_, Z, vf, tile=8) ** 2)
    f_d = lambda A_, dA_: jnp.sum(_dense_stack(vf, Z, A_, dA_) ** 2)
    gk = jax.grad(f_k, argnums=(0, 1))(A, dA)
    gd = jax.grad(f_d, argnums=(0, 1))(A, dA)
    for a, b, name in zip(gk, gd, ("dA_plane", "ddA_plane")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=name,
        )


def _control(n, T=6, key=9):
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(key), (T, n, n)) * 0.1
    coeffs = backward_hermite_coefficients(ts, A_path)
    return MatrixControl(CubicInterpolation(ts, coeffs)), ts


@pytest.mark.parametrize("directed", [False, True])
def test_enc_idx_call_pallas_matches_dense_backend(directed, backend_guard):
    n = 24
    vf = _mk_vf(directed, n)
    ctrl, ts = _control(n)
    Z = jr.normal(jr.PRNGKey(10), (n, 8))
    t = jnp.asarray(0.37)

    ops_config.set_fusion_backend("dense")
    want = vf(t, Z, ctrl)
    ops_config.set_fusion_backend("megakernel")
    got = vf(t, Z, ctrl)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-3
    )


def _count_pallas_calls(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            total += 1
        for p in eqn.params.values():
            for sub in _subjaxprs(p):
                total += _count_pallas_calls(sub)
    return total


def _subjaxprs(p):
    if isinstance(p, jax.extend.core.Jaxpr):
        yield p
    elif isinstance(p, jax.extend.core.ClosedJaxpr):
        yield p.jaxpr
    elif isinstance(p, (tuple, list)):
        for x in p:
            yield from _subjaxprs(x)


@pytest.mark.parametrize("directed", [False, True])
def test_enc_idx_dispatches_to_pallas(directed, backend_guard):
    """The 4 enc_idx reference configs must actually land on the kernel
    surface: under fusion_backend=megakernel the traced eval contains the
    fused modulation kernel + one pair sweep per layer (L=2 -> 3 calls),
    and none under the dense backend."""
    n = 24
    vf = _mk_vf(directed, n)
    ctrl, ts = _control(n)
    Z = jr.normal(jr.PRNGKey(13), (n, 8))
    t = jnp.asarray(0.4)

    ops_config.set_fusion_backend("megakernel")
    jaxpr = jax.make_jaxpr(lambda t_, Z_: vf(t_, Z_, ctrl))(t, Z)
    n_pallas = _count_pallas_calls(jaxpr.jaxpr)
    assert n_pallas == 3, (
        f"expected modulation kernel + 2 layer pair sweeps, got {n_pallas}"
    )
    ops_config.set_fusion_backend("dense")
    jaxpr = jax.make_jaxpr(lambda t_, Z_: vf(t_, Z_, ctrl))(t, Z)
    assert _count_pallas_calls(jaxpr.jaxpr) == 0


def test_enc_idx_param_grads_flow_through_kernel(backend_guard):
    """value_and_grad through the enc_idx Pallas path: modulation-MLP and
    embedding cotangents are finite, non-zero, and match the XLA path."""
    n = 16
    vf = _mk_vf(True, n, H=4, idx_dim=8)
    ctrl, ts = _control(n, key=11)
    Z = jr.normal(jr.PRNGKey(12), (n, 4))
    t = jnp.asarray(0.61)
    params0, static = partition(vf, is_inexact_array)

    def loss(params):
        vf_p = combine(params, static)
        return jnp.sum(vf_p(t, Z, ctrl) ** 2)

    grads = {}
    for backend in ("dense", "megakernel"):
        ops_config.set_fusion_backend(backend)
        grads[backend] = jax.grad(loss)(params0)

    leaves_k, treedef_k = jax.tree_util.tree_flatten(grads["megakernel"])
    leaves_x, treedef_x = jax.tree_util.tree_flatten(grads["dense"])
    assert treedef_k == treedef_x and leaves_k
    nonzero = 0
    for gk, gx in zip(leaves_k, leaves_x):
        assert np.all(np.isfinite(np.asarray(gk)))
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), atol=2e-3, rtol=2e-3
        )
        nonzero += int(np.any(np.asarray(gk) != 0.0))
    assert nonzero > len(leaves_k) // 2
