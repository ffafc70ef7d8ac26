"""Data-layer tests mirroring the reference suite's coverage
(test/dataset/*: grid structure, operators goldens, event machinery, dataset
shapes/splits) plus the ODE-system formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from gncde_tpu.data.graph_gen import (
    grid_8_neighbor_graph,
    generate_graphs,
    degree_laplacian,
)
from gncde_tpu.data.events import gen_events_happen_time, gen_events_happen_graph
from gncde_tpu.data.operators import (
    zipf_smoothing,
    normalized_laplacian,
    normalized_adj,
    get_graph_operator,
)
from gncde_tpu.data import ode_systems
from gncde_tpu.data.ode_dataset import (
    ODEDatasetSpec,
    generate,
    split_train_val_test,
)
from gncde_tpu.data.pipeline import (
    padding_graph_by_time,
    get_split_train_data,
    get_split_test_data,
)


class TestGridGraph:
    def test_corner_and_center_degrees(self):
        A = grid_8_neighbor_graph(4)
        assert A.shape == (16, 16)
        deg = A.sum(1)
        assert deg[0] == 3  # corner
        assert deg[5] == 8  # interior
        np.testing.assert_allclose(A, A.T)
        assert np.all(np.diag(A) == 0)


class TestOperators:
    def test_norm_lap_two_node_golden(self):
        # 2-node graph with one edge; A+I has degree 2 everywhere.
        A = jnp.array([[0.0, 1.0], [1.0, 0.0]])
        out = normalized_laplacian(A)
        expected = jnp.eye(2) - jnp.array([[0.5, 0.5], [0.5, 0.5]])
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_norm_adj_row_sums(self):
        A = jnp.array([[0.0, 1.0], [1.0, 0.0]])
        out = normalized_adj(A)
        np.testing.assert_allclose(out, jnp.full((2, 2), 0.5), atol=1e-6)

    def test_kipf(self):
        A = jnp.array([[0.0, 1.0], [1.0, 0.0]])
        out = zipf_smoothing(A)
        np.testing.assert_allclose(out, jnp.full((2, 2), 0.5), atol=1e-6)

    def test_dispatcher_lap(self):
        A = jnp.eye(3)
        L = 2 * jnp.eye(3)
        np.testing.assert_allclose(get_graph_operator("lap", A, L), L)


class TestEvents:
    def test_event_time_sorted_and_in_range(self):
        t = np.tile(np.linspace(0, 1, 50), (3, 1))
        ev_t, ev_idx = gen_events_happen_time(
            t, 5, [0.8, 0.2], enable_all_dynamic=True,
            rng=np.random.default_rng(0),
        )
        assert ev_t.shape == (3, 5)
        assert np.all(np.diff(ev_idx) > 0)
        assert ev_idx.min() >= 2 and ev_idx.max() < 50

    def test_non_all_dynamic_branch_works(self):
        # The reference raises here (data_tools.py broken branch); ours works.
        t = np.tile(np.linspace(0, 1, 40), (2, 1))
        ev_t, ev_idx = gen_events_happen_time(
            t, 4, [0.8, 0.2], enable_all_dynamic=False,
            rng=np.random.default_rng(0),
        )
        assert ev_idx.shape == (4,)
        assert ev_idx.max() < 32  # confined to train region

    def test_event_graph_chain(self):
        A = (np.random.default_rng(1).random((2, 10, 10)) > 0.5).astype(float)
        A_list, D_list, L_list = gen_events_happen_graph(
            A, 3, 0.01, rng=np.random.default_rng(2)
        )
        assert len(A_list) == 4
        for Ai, Di, Li in zip(A_list, D_list, L_list):
            np.testing.assert_allclose(Di - Ai, Li)
            np.testing.assert_allclose(np.diag(Di[0]), Ai[0].sum(1))


class TestODESystems:
    def test_heat_formula(self):
        L = jnp.array([[1.0, -1.0], [-1.0, 1.0]])
        x = jnp.array([[2.0], [0.0]])
        vf = ode_systems.heat_diffusion(L, 1.0)
        np.testing.assert_allclose(vf(0.0, x), -(L @ x))

    def test_gene_formula_matches_reference_code_order(self):
        A = jnp.array([[0.0, 1.0], [1.0, 0.0]])
        x = jnp.array([[0.5], [2.0]])
        vf = ode_systems.gene_dynamics(A, 1.0)
        xh = x**2
        expected = -x + (A @ xh) / (xh + 1)
        np.testing.assert_allclose(vf(0.0, x), expected, atol=1e-6)

    def test_sir_conserves_population(self):
        A = jnp.ones((4, 4)) - jnp.eye(4)
        x = jnp.stack(
            [jnp.full(4, 0.9), jnp.full(4, 0.1), jnp.zeros(4)], axis=1
        )
        vf = ode_systems.sir_dynamics(A, 0.3, 0.1)
        d = vf(0.0, x)
        np.testing.assert_allclose(d.sum(axis=1), 0.0, atol=1e-6)

    def test_mutualistic_shape(self):
        A = jnp.ones((3, 3)) - jnp.eye(3)
        x = jnp.array([[0.5], [1.0], [2.0]])
        out = ode_systems.mutualistic_dynamics(A)(0.0, x)
        assert out.shape == (3, 1)


class TestODEDataset:
    def _spec(self, **kw):
        base = dict(
            name="heat", batch_size=2, dynamic_graph=False, all_dynamic=False,
            graph_type="grid", num_nodes=16, final_time=1.0, time_tick=20,
            sampling_type="equal", method="Tsit5", dt0=0.02, seed=7,
        )
        base.update(kw)
        return ODEDatasetSpec(**base)

    def test_static_generation_shapes(self):
        res = generate(self._spec())
        assert res.t.shape == (2, 20)
        assert res.true_y.shape == (2, 20, 16)
        assert res.A.shape == (2, 16, 16)
        assert np.isfinite(res.true_y).all()

    def test_heat_diffuses_towards_mean(self):
        res = generate(self._spec(final_time=5.0))
        var0 = res.true_y[:, 0].var(axis=-1)
        varT = res.true_y[:, -1].var(axis=-1)
        assert np.all(varT < var0)

    def test_dynamic_generation(self):
        res = generate(self._spec(dynamic_graph=True, all_dynamic=True))
        assert res.A.ndim == 4  # (B, E+1, n, n)
        assert res.events_time_indices is not None
        assert res.true_y.shape == (2, 20, 16)

    def test_irregular_sampling(self):
        res = generate(self._spec(sampling_type="irregular"))
        assert res.t.shape == (2, 24)  # 1.2x time_tick
        assert np.all(np.diff(res.t, axis=1) >= 0)
        np.testing.assert_allclose(res.t[:, 0], 0.0)

    def test_split_irregular(self):
        spec = self._spec(sampling_type="irregular")
        id_train, id_extra, id_inter = split_train_val_test(spec)
        assert len(id_extra) == 4  # time_tick*(1+0.2) - time_tick
        assert len(id_inter) == 4
        assert set(id_train).isdisjoint(id_inter)
        assert 0 in id_train

    def test_sir_two_class_batch(self):
        spec = self._spec(name="sir", final_time=1.0, beta=(0.25, 0.9),
                          gamma=(0.7, 0.1))
        res = generate(spec)
        assert res.true_y.shape == (4, 20, 16, 3)  # 2*batch trajectories
        assert res.labels.shape == (4,)
        # spreading class (high R0 = beta/gamma) depletes susceptibles more
        S_end_class0 = res.true_y[:2, -1, :, 0].mean()
        S_end_class1 = res.true_y[2:, -1, :, 0].mean()
        assert S_end_class1 < S_end_class0


class TestPipeline:
    def test_padding_same_mode(self):
        adjs = jnp.stack([jnp.zeros((3, 3)), jnp.ones((3, 3)), 2 * jnp.ones((3, 3))])
        ts = jnp.arange(6.0)
        events = jnp.array([2, 4])
        padded = padding_graph_by_time(adjs, events, ts, "same")
        expect = jnp.array([0, 0, 1, 1, 2, 2])
        np.testing.assert_allclose(padded[:, 0, 0], expect)

    def test_padding_none_mode_nans(self):
        adjs = jnp.stack([jnp.zeros((2, 2)), jnp.ones((2, 2))])
        ts = jnp.arange(4.0)
        events = jnp.array([2])
        padded = padding_graph_by_time(adjs, events, ts, "none")
        assert jnp.isnan(padded[1]).all()
        np.testing.assert_allclose(padded[2], 1.0)

    def test_train_data_dict_keys_and_shapes(self):
        spec = ODEDatasetSpec(
            name="heat", batch_size=2, dynamic_graph=True, all_dynamic=True,
            graph_type="grid", num_nodes=9, final_time=1.0, time_tick=10,
            sampling_type="irregular", method="Tsit5", dt0=0.05, seed=3,
        )
        res = generate(spec)
        d = get_split_train_data(spec, res, "cubic")
        for key in [
            "t", "train_t", "true_y", "train_true_y", "true_y0", "id_train",
            "id_test_extra", "id_test_inter", "A", "A_t", "events_time",
            "labels", "train_graph_path_coeffs", "val_graph_path_coeffs",
            "y_coeffs",
        ]:
            assert key in d, key
        T_train = d["train_t"].shape[1]
        assert d["train_graph_path_coeffs"][0].shape[:2] == (2, T_train - 1)
        d2 = get_split_test_data(spec, res, "cubic")
        assert "test_graph_path_coeffs" in d2


class TestOtherSystems:
    def _spec(self, name, **kw):
        from gncde_tpu.data.ode_dataset import ODEDatasetSpec

        base = dict(
            name=name, batch_size=2, dynamic_graph=False, all_dynamic=False,
            graph_type="grid", num_nodes=9, final_time=0.5, time_tick=8,
            sampling_type="equal", method="Tsit5", dt0=0.01, seed=11,
        )
        base.update(kw)
        return ODEDatasetSpec(**base)

    def test_gene_generation_finite(self):
        from gncde_tpu.data.ode_dataset import generate

        res = generate(self._spec("gene"))
        assert res.true_y.shape == (2, 8, 9)
        assert np.isfinite(res.true_y).all()

    def test_mutualistic_generation_finite(self):
        from gncde_tpu.data.ode_dataset import generate

        res = generate(self._spec("mutualistic", final_time=0.2))
        assert res.true_y.shape == (2, 8, 9)
        assert np.isfinite(res.true_y).all()


class TestPaddingNonePath:
    def test_linear_interp_with_nan_padding_solves(self):
        """padding_mode='none' produces NaNs between events; the NaN-filling
        interpolation must yield a finite, solvable control path."""
        import jax
        import jax.numpy as jnp
        import jax.random as jr
        from gncde_tpu.data.ode_dataset import ODEDatasetSpec, generate
        from gncde_tpu.data.pipeline import get_split_train_data
        from gncde_tpu.models import GraphNeuralCDE
        from gncde_tpu.models.vector_fields import PermEquivGraphVectorField

        spec = ODEDatasetSpec(
            name="heat", batch_size=2, dynamic_graph=True, all_dynamic=True,
            graph_type="grid", num_nodes=9, final_time=1.0, time_tick=10,
            sampling_type="irregular", method="Tsit5", dt0=0.05,
            padding_mode="none", seed=5,
        )
        res = generate(spec)
        d = get_split_train_data(spec, res, "linear")
        assert np.isfinite(np.asarray(d["train_graph_path_coeffs"])).all()

        vf = PermEquivGraphVectorField(
            input_dim=4, hidden_dim=4, output_dim=4, num_layers=2,
            data_embed_dim=1, num_nodes=9, key=jr.PRNGKey(0),
        )
        model = GraphNeuralCDE(
            vf, hidden_dim=4, interpolation="linear", max_steps=64,
            key=jr.PRNGKey(1),
        )
        out = jax.vmap(model)(
            d["train_t"], d["train_graph_path_coeffs"], d["true_y0"]
        )
        assert np.isfinite(np.asarray(out)).all()
