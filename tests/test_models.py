"""Forward-shape, vmap, and gradient smoke tests for all solver model shells
and their config-driven builds."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu.models import (
    GraphNeuralCDE,
    GraphNeuralODE,
    TGBGraphNeuralCDE,
    TGBGraphNeuralODE,
    TGBSTGraphNeuralCDE,
    PGTGraphNeuralCDE,
    PGTGraphNeuralODE,
    PGTSTGraphNeuralCDE,
)
from gncde_tpu.models.vector_fields import (
    PermEquivGraphVectorField,
    PermEquivDirGraphVectorField,
    GNODEFloorVectorField,
    GraphVectorField,
    ConstVectorField,
    MLPVectorField,
)
from gncde_tpu.models.neural_nets import FinalTanhF
from gncde_tpu.models.vector_fields.st import STGraphVectorField
from gncde_tpu.interp import backward_hermite_coefficients
from gncde_tpu.nn import filter_value_and_grad

N, T, H = 12, 6, 8


def _adj_coeffs(key, n=N, T_=T):
    ts = jnp.linspace(0.0, float(T_ - 1), T_)
    A_path = jr.uniform(key, (T_, n, n)) * 0.1
    X = jnp.stack([jnp.broadcast_to(ts[:, None, None], (T_, n, n)), A_path], -1)
    return ts, backward_hermite_coefficients(ts, X)


def _mk_vf(out_mult=1, data_embed_dim=1, key=jr.PRNGKey(1)):
    return PermEquivGraphVectorField(
        input_dim=H, hidden_dim=H, output_dim=H * out_mult, num_layers=2,
        data_embed_dim=data_embed_dim, num_nodes=N, key=key,
    )


class TestDynModels:
    def test_gncde_forward_and_grad(self):
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0))
        model = GraphNeuralCDE(_mk_vf(), hidden_dim=H, interpolation="cubic",
                               max_steps=64, key=jr.PRNGKey(2))
        x0 = jr.normal(jr.PRNGKey(3), (N, 1))
        out = model(ts, coeffs, x0)
        assert out.shape == (T, N, 1)

        def loss(m):
            return jnp.mean(m(ts, coeffs, x0) ** 2)

        val, grads = filter_value_and_grad(loss)(model)
        assert np.isfinite(float(val))
        gmax = max(
            float(jnp.max(jnp.abs(g)))
            for g in jax.tree_util.tree_leaves(grads)
            if g is not None
        )
        assert np.isfinite(gmax) and gmax > 0

    def test_gncde_last_only(self):
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0))
        model = GraphNeuralCDE(_mk_vf(), hidden_dim=H, interpolation="cubic",
                               return_sequence=False, max_steps=64, key=jr.PRNGKey(2))
        out = model(ts, coeffs, jr.normal(jr.PRNGKey(3), (N, 1)), evolving_out=False)
        assert out.shape == (1,) or out.shape == (N, 1) or out.ndim <= 2

    def test_gnode_floor(self):
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0))
        vf = GNODEFloorVectorField(input_dim=H, hidden_dim=H, output_dim=H,
                                   num_layers=2, key=jr.PRNGKey(1))
        model = GraphNeuralODE(vf, hidden_dim=H, interpolation="cubic",
                               max_steps=64, key=jr.PRNGKey(2))
        adj_list = jr.uniform(jr.PRNGKey(4), (3, N, N))
        events = jnp.array([0.0, 2.0, 4.0])
        out = model(ts, coeffs, jr.normal(jr.PRNGKey(3), (N, 1)), adj_list, events)
        assert out.shape == (T, N, 1)

    def test_gncde_rejects_floor_vf(self):
        vf = GNODEFloorVectorField(input_dim=H, hidden_dim=H, output_dim=H,
                                   num_layers=2, key=jr.PRNGKey(1))
        with pytest.raises(ValueError):
            GraphNeuralCDE(vf, hidden_dim=H, interpolation="cubic", key=jr.PRNGKey(2))


class TestPGTModels:
    def _x_coeffs(self, key, data_dim=3):
        ts = jnp.linspace(0.0, float(T - 1), T)
        x_path = jr.normal(key, (T, N, data_dim))
        X = jnp.stack(
            [jnp.broadcast_to(ts[:, None, None], (T, N, data_dim)), x_path], -1
        )
        return backward_hermite_coefficients(ts, X)

    def test_pgt_cde_global_readout(self):
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0))
        x_coeffs = self._x_coeffs(jr.PRNGKey(5))
        vf = _mk_vf(out_mult=3 * 2, data_embed_dim=3)
        model = PGTGraphNeuralCDE(vf, hidden_dim=H, data_dim=3, feature_dim=2,
                                  interpolation="cubic", key=jr.PRNGKey(2))
        x0 = jr.normal(jr.PRNGKey(3), (N, 3))
        out = model(ts, coeffs, x_coeffs, x0)
        assert out.shape == (2,)  # global node-sum readout of feature_dim
        out2 = model(ts, coeffs, x_coeffs, x0, global_readout=False)
        assert out2.shape == (N, 2)

    def test_pgt_st(self):
        x_coeffs = self._x_coeffs(jr.PRNGKey(5), data_dim=3)
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0))
        f_func = FinalTanhF(input_dim=H, hidden_dim=H, output_dim=H * 3,
                            num_layers=1, key=jr.PRNGKey(6))
        g_func = STGraphVectorField(input_dim=H, hidden_dim=H, output_dim=H * H,
                                    num_layers=2, node_embed_dim=4, num_nodes=N,
                                    cheb_k=2, key=jr.PRNGKey(7))
        model = PGTSTGraphNeuralCDE(f_func, g_func, interpolation="cubic",
                                    data_dim=3, feature_dim=1, max_steps=128,
                                    key=jr.PRNGKey(8))
        x0 = jr.normal(jr.PRNGKey(3), (N, 3))
        out = model(ts, coeffs, x_coeffs, x0)
        assert out.shape == (N, 1)


class TestTGBModels:
    def test_tgb_cde(self):
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0), T_=4)
        vf = PermEquivGraphVectorField(
            input_dim=H, hidden_dim=H, output_dim=H * 4 * 2, num_layers=2,
            data_embed_dim=4, num_nodes=N, key=jr.PRNGKey(1),
        )
        model = TGBGraphNeuralCDE(vf, hidden_dim=H, interpolation="cubic",
                                  dt0=0.1, key=jr.PRNGKey(2))
        x_data = jr.normal(jr.PRNGKey(4), (4, N, N))
        x0 = jr.normal(jr.PRNGKey(3), (N, N))
        out = model(ts[:4], coeffs, x_data, x0)
        assert out.shape == (N, N)

    def test_tgb_cde_persistence_head(self):
        """Opt-in head: scores = beta*decoder(z) + alpha*rownorm(x[-1]).
        At init beta=0 and alpha=1, so the output IS the row-max-normalised
        last snapshot -- the model starts as the copy-last ranker."""
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0), T_=4)
        vf = PermEquivGraphVectorField(
            input_dim=H, hidden_dim=H, output_dim=H * 4 * 2, num_layers=2,
            data_embed_dim=4, num_nodes=N, key=jr.PRNGKey(1),
        )
        base = TGBGraphNeuralCDE(vf, hidden_dim=H, interpolation="cubic",
                                 dt0=0.1, key=jr.PRNGKey(2))
        headed = TGBGraphNeuralCDE(vf, hidden_dim=H, interpolation="cubic",
                                   dt0=0.1, persistence_head=True,
                                   key=jr.PRNGKey(2))
        assert headed.persistence_alpha is not None
        assert base.persistence_alpha is None
        x_data = jr.normal(jr.PRNGKey(4), (4, N, N))
        x0 = jr.normal(jr.PRNGKey(3), (N, N))
        out_b = base(ts[:4], coeffs, x_data, x0)
        out_h = headed(ts[:4], coeffs, x_data, x0)
        rowmax = jnp.max(jnp.abs(x_data[-1]), axis=-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(out_h), np.asarray(x_data[-1] / (rowmax + 1e-8)),
            rtol=1e-5, atol=1e-5,
        )
        # Rankings per source row equal copy-last's at init.
        assert np.array_equal(
            np.argsort(np.asarray(out_h), axis=-1),
            np.argsort(np.asarray(x_data[-1]), axis=-1),
        )
        assert np.isfinite(np.asarray(out_b)).all()

    def test_tgb_st(self):
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0), T_=4)
        f_func = FinalTanhF(input_dim=H, hidden_dim=H, output_dim=H * 4,
                            num_layers=1, key=jr.PRNGKey(6))
        g_func = STGraphVectorField(input_dim=H, hidden_dim=H, output_dim=H * H,
                                    num_layers=2, node_embed_dim=4, num_nodes=N,
                                    cheb_k=2, key=jr.PRNGKey(7))
        model = TGBSTGraphNeuralCDE(f_func, g_func, interpolation="cubic",
                                    data_embed_dim=4, max_steps=128,
                                    key=jr.PRNGKey(8))
        x_data = jr.normal(jr.PRNGKey(4), (4, N, N))
        x0 = jr.normal(jr.PRNGKey(3), (N, N))
        out = model(ts[:4], coeffs, x_data, x0)
        assert out.shape == (N, N)


class TestDirectedAndEncIdx:
    def test_enc_idx_forward(self):
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0))
        vf = PermEquivDirGraphVectorField(
            input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
            data_embed_dim=1, num_nodes=N, enc_idx=True, enc_type="emb",
            idx_dim=4, key=jr.PRNGKey(1),
        )
        from gncde_tpu.interp import MatrixControl

        ctrl = MatrixControl.from_stacked("cubic", ts, coeffs)
        y = jr.normal(jr.PRNGKey(2), (N, H))
        out = vf(0.5, y, ctrl)
        assert out.shape == (N, H)

    def test_undirected_enc_idx_forward(self):
        """Fixed mode for the reference's dead undirected enc_idx branch
        (graph_vector_field.py:21-22,71-77): builds and forwards."""
        ts, coeffs = _adj_coeffs(jr.PRNGKey(0))
        from gncde_tpu.interp import MatrixControl

        ctrl = MatrixControl.from_stacked("cubic", ts, coeffs)
        y = jr.normal(jr.PRNGKey(2), (N, H))
        vf = PermEquivGraphVectorField(
            input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
            data_embed_dim=1, num_nodes=N, enc_idx=True, enc_type="emb",
            idx_dim=4, key=jr.PRNGKey(1),
        )
        out = vf(0.5, y, ctrl)
        assert out.shape == (N, H)
        assert np.isfinite(np.asarray(out)).all()

        from gncde_tpu.models.vector_fields import GraphVectorField

        vf2 = GraphVectorField(
            input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
            data_embed_dim=1, num_nodes=N, enc_idx=True, enc_type="emb",
            idx_dim=4, key=jr.PRNGKey(3),
        )
        out2 = vf2(0.5, y, ctrl)
        assert out2.shape == (N, H)
        assert np.isfinite(np.asarray(out2)).all()

    def test_enc_idx_false_has_no_encoder_params(self):
        """Parameter-count parity: without enc_idx the encoder trio is absent
        (the reference's fields are commented out)."""
        vf = PermEquivGraphVectorField(
            input_dim=H, hidden_dim=H, output_dim=H, num_layers=2,
            data_embed_dim=1, num_nodes=N, enc_idx=False, key=jr.PRNGKey(1),
        )
        assert vf.idx_enc is None and vf.msg_func_adj is None


def test_kvaerno3_model_solves():
    """Implicit method literal from the reference configs runs end to end."""
    ts, coeffs = _adj_coeffs(jr.PRNGKey(0))
    model = GraphNeuralCDE(_mk_vf(), hidden_dim=H, interpolation="cubic",
                           method="Kvaerno3", max_steps=128, key=jr.PRNGKey(2))
    out = model(ts, coeffs, jr.normal(jr.PRNGKey(3), (N, 1)))
    assert out.shape == (T, N, 1)
    assert np.isfinite(np.asarray(out)).all()
