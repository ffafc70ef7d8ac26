"""Parity details: init distributions/choreography and reference quirks."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gncde_tpu.nn import Linear, MLP, RMSNorm
from gncde_tpu.models.vector_fields import (
    ConvEquivFusionLayer,
    ConvPreMultFusionLayer,
)
from gncde_tpu.models.pgt import PGTGraphNeuralCDE
from gncde_tpu.models.tgb import TGBGraphNeuralCDE
from gncde_tpu.models.vector_fields import PermEquivGraphVectorField


def test_linear_init_bounds():
    lin = Linear(64, 32, key=jr.PRNGKey(0))
    lim = 1 / np.sqrt(64)
    assert float(jnp.max(jnp.abs(lin.weight))) <= lim
    assert float(jnp.max(jnp.abs(lin.bias))) <= lim
    # roughly uniform: std close to lim/sqrt(3)
    np.testing.assert_allclose(
        float(jnp.std(lin.weight)), lim / np.sqrt(3), rtol=0.15
    )


def test_fusion_params_scaled_to_one_fifteenth():
    layer = ConvEquivFusionLayer(8, 8, key=jr.PRNGKey(1))
    for p in layer.params:
        assert float(jnp.max(jnp.abs(p))) <= 1 / 15 + 1e-7


def test_rmsnorm_unit_init_and_forward():
    norm = RMSNorm(6)
    x = jnp.array([3.0, -3.0, 3.0, -3.0, 3.0, -3.0])
    out = norm(x)
    np.testing.assert_allclose(out, x / 3.0, atol=1e-4)


def test_premult_fusion_shape_default_400():
    layer = ConvPreMultFusionLayer(4, 4, key=jr.PRNGKey(2))
    assert layer.fusion_1.shape == (400, 400)  # reference layers.py:390-391


def test_pgt_decoder_reuses_encoder_key():
    # Reference quirk pgt_graph_neural_cde.py:57-63: decoder built with the
    # encoder's key -> identical first-layer weights (same shapes).
    vf = PermEquivGraphVectorField(
        input_dim=4, hidden_dim=4, output_dim=4 * 4 * 2, num_layers=2,
        data_embed_dim=4, num_nodes=6, key=jr.PRNGKey(3),
    )
    m = PGTGraphNeuralCDE(vf, hidden_dim=4, data_dim=4, feature_dim=4,
                          interpolation="cubic", key=jr.PRNGKey(4))
    np.testing.assert_allclose(
        m.encoder.layers[0].weight, m.decoder.layers[0].weight
    )


def test_tgb_data_encoder_reuses_encoder_key():
    vf = PermEquivGraphVectorField(
        input_dim=4, hidden_dim=4, output_dim=4 * 2 * 2, num_layers=2,
        data_embed_dim=2, num_nodes=6, key=jr.PRNGKey(5),
    )
    model_key = jr.PRNGKey(6)
    m = TGBGraphNeuralCDE(vf, hidden_dim=4, interpolation="cubic",
                          key=model_key)
    # Reference quirk tgb_graph_neural_cde.py:86-90: data_encoder is built
    # with encoder_key (the FIRST of the model key's 3-way split), not its
    # own key. Rebuild that Linear independently and demand weight equality.
    encoder_key, decoder_key, data_encoder_key = jr.split(model_key, 3)
    expected = Linear(6, vf.data_embed_dim, key=encoder_key)
    np.testing.assert_array_equal(
        np.asarray(m.data_encoder.weight), np.asarray(expected.weight)
    )
    np.testing.assert_array_equal(
        np.asarray(m.data_encoder.bias), np.asarray(expected.bias)
    )
    # ... and NOT with the split's dedicated third key.
    not_expected = Linear(6, vf.data_embed_dim, key=data_encoder_key)
    assert not np.array_equal(
        np.asarray(m.data_encoder.weight), np.asarray(not_expected.weight)
    )


def test_mlp_depth_zero_single_linear():
    m = MLP(in_size=3, out_size=2, width_size=8, depth=0, key=jr.PRNGKey(7))
    assert len(m.layers) == 1


def test_modulate_matrix_decomposition_matches_naive():
    """The low-rank per-edge MLP modulation (first layer decomposed into
    two (n, d) matmuls + broadcast) equals the reference's nested-vmap MLP
    over the materialised (n, n, 2d+1) concat."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np

    from gncde_tpu.models.neural_nets import IdxEncoder
    from gncde_tpu.models.vector_fields.fields import _modulate_matrix
    from gncde_tpu.nn import MLP

    n, d = 17, 16
    enc = IdxEncoder(n, d, key=jr.PRNGKey(0), type="mlp")
    mlp = MLP(in_size=2 * d + 1, out_size=1, width_size=8, depth=2,
              key=jr.PRNGKey(1))
    mat = jr.normal(jr.PRNGKey(2), (n, n))

    got = _modulate_matrix(mat, mlp, enc.node_embedding())

    pairwise = enc()  # (n, n, 2d) reference layout
    feats = jnp.concatenate([mat[:, :, None], pairwise], axis=-1)
    ref = jnp.squeeze(jax.vmap(jax.vmap(mlp))(feats), axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
