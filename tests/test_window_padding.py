"""Pad-to-max window batching (train/windowed.py:pad_windows).

End-state-extension padding must (a) collapse ragged hand-built window lists
to ONE stacked group (one compiled program) and (b) preserve the window
losses EXACTLY: repeated final knots keep t1 unchanged and the padded
intervals carry the end value + end derivative, so every solver evaluation
-- including the final RK stage at t1 -- is identical
(SURVEY.md section 7.3 item 6).
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gncde_tpu.data import pgt as pgt_data
from gncde_tpu.data.windows import process_window_pgt, process_window_tgb, Snapshot
from gncde_tpu.train.windowed import PGTTrainer, TGBTrainer, pad_windows, stack_windows
from gncde_tpu.configs import PGTGraphNeuralCDECfg, TGBGraphNeuralCDECfg
from gncde_tpu.interp import CubicInterpolation


def _ragged_pgt_windows(n_nodes=12, lengths=(4, 6, 5)):
    rng = np.random.default_rng(0)
    snaps = []
    t0 = 0
    windows = []
    for L in lengths:
        w = []
        for j in range(L):
            adj = (rng.random((n_nodes, n_nodes)) < 0.3).astype(np.float32)
            x = rng.normal(size=(n_nodes, 8)).astype(np.float32)
            y = rng.normal(size=(n_nodes,)).astype(np.float32)
            w.append(Snapshot(t=t0 + j, adj=adj, x=x, y=y, src=None))
        windows.append(process_window_pgt(w, "cubic"))
        t0 += L
    return windows


def test_pad_windows_cubic_constant_extension():
    windows = _ragged_pgt_windows()
    t_max = max(int(np.asarray(w["t"]).shape[0]) for w in windows)
    padded = pad_windows(windows, t_max)
    for orig, pad in zip(windows, padded):
        t_len = int(np.asarray(orig["t"]).shape[0])
        ts_pad = np.asarray(pad["t"])
        # Knots repeat the final time: t1 unchanged.
        assert ts_pad.shape[0] == t_max
        np.testing.assert_array_equal(ts_pad[t_len:], ts_pad[t_len - 1])
        # Padded path evaluates to the exact end value with zero derivative.
        path_o = CubicInterpolation(jnp.asarray(orig["t"]),
                                    orig["graph_path_coeffs"])
        path_p = CubicInterpolation(jnp.asarray(pad["t"]),
                                    pad["graph_path_coeffs"])
        t1 = float(ts_pad[t_len - 1])
        np.testing.assert_allclose(np.asarray(path_p.evaluate(t1)),
                                   np.asarray(path_o.evaluate(t1)),
                                   rtol=1e-5, atol=1e-5)
        # Evaluation at t1 lands in a padded (zero-length) interval carrying
        # the exact end value AND end derivative -- the final RK stage and
        # SaveAt point see identical inputs, so trajectories match exactly.
        np.testing.assert_allclose(np.asarray(path_p.derivative(t1)),
                                   np.asarray(path_o.derivative(t1)),
                                   rtol=1e-5, atol=1e-6)
        # Interior evaluations untouched.
        for t in (0.3, t1 - 0.7):
            np.testing.assert_allclose(np.asarray(path_p.evaluate(t)),
                                       np.asarray(path_o.evaluate(t)),
                                       rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(pad["time_mask"]), np.arange(t_max) < t_len)


def test_ragged_pgt_windows_stack_to_one_group_with_exact_loss():
    windows = _ragged_pgt_windows()
    model = PGTGraphNeuralCDECfg(
        name="pgt_graph_neural_cde", hidden_dim=4, data_dim=8,
        feature_dim=1, interpolation="cubic", method="Tsit5",
        return_sequence=False,
        vector_field=dict(
            name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
            data_embed_dim=8, num_nodes=12,
        ),
    ).build(jr.PRNGKey(0))

    tr = PGTTrainer.__new__(PGTTrainer)  # only _data_tuple/_loss needed
    per_window = [
        float(PGTTrainer._loss(model, tr._data_tuple(model, w)))
        for w in windows
    ]

    stacked = stack_windows(windows)
    assert len(stacked) == 1, "ragged windows did not pad to one group"
    loss = float(PGTTrainer._loss(model, tr._data_tuple(model, stacked[0])))
    np.testing.assert_allclose(loss, np.mean(per_window), rtol=2e-4)


def test_ragged_tgb_windows_stack_to_one_group_with_matching_loss():
    rng = np.random.default_rng(1)
    n = 10
    windows = []
    t0 = 0
    for L in (4, 5):
        w = []
        for j in range(L):
            adj = (rng.random((n, n)) < 0.3).astype(np.float32)
            x = rng.random((n, n)).astype(np.float32)
            src = rng.choice(n, size=3, replace=False)
            w.append(Snapshot(t=t0 + j, adj=adj, x=x, y=None, src=src))
        windows.append(process_window_tgb(w, "cubic"))
        t0 += L

    model = TGBGraphNeuralCDECfg(
        name="tgb_graph_neural_cde", hidden_dim=4, interpolation="cubic",
        method="Tsit5", return_sequence=False, dt0=0.1,
        vector_field=dict(
            name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
            data_embed_dim=4, num_nodes=n,
        ),
    ).build(jr.PRNGKey(0))

    # _loss became an instance method with the round-5 ranking objectives
    # (loss_type dispatch); build a bare instance with the CE defaults.
    tr = TGBTrainer.model_construct(loss_type="ce")
    per_window = [
        float(tr._loss(model, tr._data_tuple(model, w)))
        for w in windows
    ]
    stacked = stack_windows(windows)
    assert len(stacked) == 1
    loss = float(tr._loss(model, tr._data_tuple(model, stacked[0])))
    # TGB models rebuild the data-path coefficients from the padded knots in
    # the forward (models/tgb.py:96-104); repeated knots reproduce the end
    # value exactly and the derivative to solver-step accuracy.
    np.testing.assert_allclose(loss, np.mean(per_window), rtol=2e-3)
