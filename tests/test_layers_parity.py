"""Layer/vf parity vs dense-oracle computation + equivariance property tests.

The permutation-equivariance test is the mathematical contract the whole
model family is named for: permuting nodes of (A, dA, Z) must permute the
layer output identically.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gncde_tpu.models.vector_fields import (
    ConvLayer,
    ConvEquivFusionLayer,
    ConvEquivFusionDirectedLayer,
    PermEquivGraphVectorField,
)
from gncde_tpu.interp import backward_hermite_coefficients, CubicInterpolation


def test_conv_layer_forward():
    n, din, dout = 9, 4, 6
    layer = ConvLayer(din, dout, key=jr.PRNGKey(0))
    Z = jr.normal(jr.PRNGKey(1), (n, din))
    A = jr.normal(jr.PRNGKey(2), (n, n))
    out = layer(Z, A)
    m = layer.transform(Z)
    np.testing.assert_allclose(out, m + A @ m, atol=1e-5)


def test_fusion_layer_matches_dense_path():
    n, din, dout = 12, 5, 7
    layer = ConvEquivFusionLayer(din, dout, key=jr.PRNGKey(3))
    Z = jr.normal(jr.PRNGKey(4), (n, din))
    A = jr.normal(jr.PRNGKey(5), (n, n))
    dA = jr.normal(jr.PRNGKey(6), (n, n))
    out = layer(Z, A, dA)
    # dense-oracle path: materialise fused operator, then ConvLayer forward
    fused = layer.fusion_matrix(A, dA)
    ref = layer.conv_layer(Z, fused)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_directed_fusion_layer_matches_dense_path():
    n, din, dout = 10, 4, 4
    layer = ConvEquivFusionDirectedLayer(din, dout, key=jr.PRNGKey(7))
    Z = jr.normal(jr.PRNGKey(8), (n, din))
    A = jr.normal(jr.PRNGKey(9), (n, n))
    dA = jr.normal(jr.PRNGKey(10), (n, n))
    out = layer(Z, A, dA)
    ref = layer.conv_layer(Z, layer.fusion_matrix(A, dA))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_directed_init_quirk_param6_prime():
    layer = ConvEquivFusionDirectedLayer(4, 4, key=jr.PRNGKey(11))
    # param6_prime is drawn from p5_primekey (reference layers.py:245-247)
    np.testing.assert_allclose(layer.param6_prime, layer.param5_prime)


def test_permutation_equivariance_of_fusion_layer():
    n, din, dout = 15, 6, 6
    layer = ConvEquivFusionLayer(din, dout, key=jr.PRNGKey(12))
    Z = jr.normal(jr.PRNGKey(13), (n, din))
    A = jr.normal(jr.PRNGKey(14), (n, n))
    dA = jr.normal(jr.PRNGKey(15), (n, n))
    perm = jr.permutation(jr.PRNGKey(16), n)
    out = layer(Z, A, dA)
    out_perm = layer(Z[perm], A[perm][:, perm], dA[perm][:, perm])
    np.testing.assert_allclose(out_perm, out[perm], atol=1e-4, rtol=1e-4)


def test_vector_field_shapes_and_time_scaling():
    n, T, H = 8, 6, 4
    ts = jnp.linspace(0.0, 1.0, T)
    A_path = jr.uniform(jr.PRNGKey(17), (T, n, n))
    X = jnp.stack([jnp.broadcast_to(ts[:, None, None], (T, n, n)), A_path], -1)
    coeffs = backward_hermite_coefficients(ts, X)
    ctrl = CubicInterpolation(ts, coeffs)
    vf = PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
        data_embed_dim=1, num_nodes=n, key=jr.PRNGKey(18),
    )
    y = jr.normal(jr.PRNGKey(19), (n, H))
    out = vf(0.37, y, ctrl)
    assert out.shape == (n, H)
    # time-channel gradient is 1 everywhere => scaling is identity; compare
    # against a manual stack evaluation
    adj = ctrl.evaluate(0.37)[..., -1]
    dadj = ctrl.derivative(0.37)[..., -1]
    feats = y
    for i, layer in enumerate(vf.gnn_layers):
        feats = layer(feats, adj, dadj)
        if i < len(vf.gnn_layers) - 1:
            feats = jax.nn.relu(feats)
    np.testing.assert_allclose(out, feats, atol=1e-4, rtol=1e-4)
