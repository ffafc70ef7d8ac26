"""End-to-end trainer smoke tests on tiny synthetic workloads: each task
family's full loop (data -> model -> jitted step -> eval -> checkpoint) runs
and produces finite metrics."""

import os

import numpy as np
import pytest
import yaml


def _write_tgb_fixture(tmp_path, n_nodes=12, n_snap=22, seed=0):
    """Synthetic TGB-format edge list CSV."""
    rng = np.random.default_rng(seed)
    rows = ["timestamp,source,destination,weight"]
    for t in range(n_snap):
        for _ in range(30):
            s, d = rng.integers(0, n_nodes, 2)
            rows.append(f"{t},{s},{d},{rng.uniform(0.1, 2.0):.4f}")
    path = tmp_path / "tgbn-trade"
    path.mkdir(parents=True)
    (path / "tgbn-trade_edgelist.csv").write_text("\n".join(rows))
    return tmp_path


def test_dyn_trainer_e2e(tmp_path):
    from gncde_tpu.train.trainer import Trainer

    cfg = dict(
        model=dict(
            name="graph_neural_cde",
            hidden_dim=4,
            interpolation="cubic",
            method="Tsit5",
            return_sequence=True,
            max_steps=64,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                use_control=False,
            ),
        ),
        dataset=dict(
            name="heat", batch_size=2, num_nodes=9, dynamic_graph=True,
            all_dynamic=True, graph_type="grid", final_time=1.0, time_tick=10,
            sampling_type="irregular", method="Tsit5", dt0=0.05,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-2),
        ),
        loss=dict(name="MSE"),
        epochs=2, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_name="t",
        logger_name="test-dyn",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = Trainer(**cfg).run()
    assert np.isfinite(summary["validation_loss"])
    assert any(f.endswith(".npz") for f in os.listdir(tmp_path / "ckpt"))


def test_pgt_trainer_e2e(tmp_path):
    from gncde_tpu.train.windowed import PGTTrainer

    cfg = dict(
        model=dict(
            name="pgt_graph_neural_cde", hidden_dim=4, data_dim=8,
            feature_dim=1, interpolation="cubic", method="Tsit5",
            return_sequence=False,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                data_embed_dim=8, num_nodes=129,
            ),
        ),
        dataset=dict(
            name="england-covid", window_size=5, stride=5,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-pgt",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = PGTTrainer(**cfg).run()
    assert np.isfinite(summary["best_selection"])


def test_pgt_gnode_trainer_e2e(tmp_path):
    """PGT GNODE (piecewise-constant adjacency, reference
    configs/pgt/england/gnode_config.yaml): one training window through the
    solver trainer with the GNODEFloorVectorField arg tuple."""
    from gncde_tpu.train.windowed import PGTTrainer

    cfg = dict(
        model=dict(
            name="pgt_graph_neural_ode", hidden_dim=4, data_dim=8,
            feature_dim=1, interpolation="cubic", method="Tsit5",
            return_sequence=False,
            vector_field=dict(
                name="GNODEFloorVectorField", hidden_dim=4, num_layers=2,
                num_nodes=129, use_control=False,
            ),
        ),
        dataset=dict(
            name="england-covid", window_size=5, stride=5,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-pgt-gnode",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = PGTTrainer(**cfg).run()
    assert np.isfinite(summary["best_selection"])


def test_pgt_twitter_trainer_e2e(tmp_path, monkeypatch):
    """twitter-tennis pipeline end-to-end on a reduced-scale surrogate
    pickle (tools/make_twitter_surrogate.py): 16-dim encoded features,
    weighted mention edges, next-step popularity regression — the same
    schema as the real pickle, loaded through the standard search path."""
    import pickle
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_twitter_surrogate import make_twitter_surrogate

    from gncde_tpu.train.windowed import PGTTrainer

    snaps = make_twitter_surrogate(num_nodes=24, num_snapshots=30, num_players=4,
                                   mean_edges=60, seed=3)
    ddir = tmp_path / "data" / ".datasets"
    ddir.mkdir(parents=True)
    with open(ddir / "twitter_dataset.pkl", "wb") as f:
        pickle.dump(snaps, f)
    monkeypatch.setenv("GNCDE_DATA_DIR", str(tmp_path / "data"))

    cfg = dict(
        model=dict(
            name="pgt_graph_neural_cde", hidden_dim=4, data_dim=16,
            feature_dim=1, interpolation="cubic", method="Tsit5",
            return_sequence=False,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                data_embed_dim=16, num_nodes=24,
            ),
        ),
        dataset=dict(
            name="twitter-tennis", window_size=10, stride=10,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-twitter",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = PGTTrainer(**cfg).run()
    assert np.isfinite(summary["best_selection"])


def test_tgb_trainer_e2e(tmp_path, monkeypatch):
    from gncde_tpu.train.windowed import TGBTrainer

    data_dir = _write_tgb_fixture(tmp_path)
    cfg = dict(
        model=dict(
            name="tgb_graph_neural_cde", hidden_dim=4, interpolation="cubic",
            method="Tsit5", return_sequence=False, dt0=0.1,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                data_embed_dim=4, num_nodes=12,
            ),
        ),
        dataset=dict(
            name="tgbn-trade", window_size=3, stride=3, frequency="None",
            data_dir=str(data_dir), interpolation="cubic",
            cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-tgb",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = TGBTrainer(**cfg).run()
    assert "test_ndcg@10" in summary
    assert 0.0 <= summary["test_ndcg@10"] <= 1.0


def test_tgb_persistence_head_trainer_e2e(tmp_path, monkeypatch):
    """TGB with persistence_head: the gated copy-last head trains through
    the full loop (alpha/beta are optimized with the rest of the model)."""
    from gncde_tpu.train.windowed import TGBTrainer

    data_dir = _write_tgb_fixture(tmp_path)
    cfg = dict(
        model=dict(
            name="tgb_graph_neural_cde", hidden_dim=4, interpolation="cubic",
            method="Tsit5", return_sequence=False, dt0=0.1,
            persistence_head=True,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                data_embed_dim=4, num_nodes=12,
            ),
        ),
        dataset=dict(
            name="tgbn-trade", window_size=3, stride=3, frequency="None",
            data_dir=str(data_dir), interpolation="cubic",
            cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=2, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-tgb-persist",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = TGBTrainer(**cfg).run()
    assert "test_ndcg@10" in summary
    assert 0.0 <= summary["test_ndcg@10"] <= 1.0


def test_oversampling_trainer_e2e(tmp_path):
    from gncde_tpu.train.oversampling import OversamplingTrainer

    cfg = dict(
        model=dict(
            name="pgt_graph_neural_cde", hidden_dim=4, data_dim=3,
            feature_dim=2, interpolation="cubic", method="Tsit5",
            return_sequence=False,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                data_embed_dim=3, num_nodes=9,
            ),
        ),
        dataset=dict(
            name="sir", batch_size=3, num_nodes=9, dynamic_graph=True,
            all_dynamic=True, graph_type="grid", final_time=1.0, time_tick=8,
            sampling_type="irregular", method="Tsit5", dt0=0.05,
            interpolation="cubic", beta=[0.25, 0.9], gamma=[0.7, 0.1],
            cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=2, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-os",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = OversamplingTrainer(**cfg).run()
    assert np.isfinite(summary["validation_loss"])
    assert 0.0 <= summary["corr_test_acc"] <= 1.0


def test_recurrent_pgt_trainer_e2e(tmp_path):
    from gncde_tpu.train.windowed import RecurrentPGTTrainer

    cfg = dict(
        model=dict(
            name="dcrnn", input_dim=8, num_nodes=129, hidden_dim=4,
            num_time_steps=4, order=2, num_layers=1,
        ),
        dataset=dict(
            name="england-covid", window_size=5, stride=5,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-rec",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = RecurrentPGTTrainer(**cfg).run()
    assert np.isfinite(summary["best_selection"])


def test_dyn_gnode_floor_trainer_e2e(tmp_path):
    """GraphNeuralODE (floored adjacency) through the dyn trainer."""
    from gncde_tpu.train.trainer import Trainer

    cfg = dict(
        model=dict(
            name="graph_neural_ode",
            hidden_dim=4,
            interpolation="cubic",
            method="Tsit5",
            return_sequence=True,
            max_steps=64,
            vector_field=dict(
                name="GNODEFloorVectorField", hidden_dim=4, num_layers=2,
                use_control=False,
            ),
        ),
        dataset=dict(
            name="heat", batch_size=2, num_nodes=9, dynamic_graph=True,
            all_dynamic=True, graph_type="grid", final_time=1.0, time_tick=10,
            sampling_type="irregular", method="Tsit5", dt0=0.05,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-2),
        ),
        loss=dict(name="MSE"),
        epochs=2, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_name="t",
        logger_name="test-gnode",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = Trainer(**cfg).run()
    assert np.isfinite(summary["validation_loss"])


def test_dyn_trainer_resume(tmp_path):
    """Full-state resume: second run continues from the saved epoch (a
    capability the reference lacks entirely, SURVEY.md section 5)."""
    from gncde_tpu.train.trainer import Trainer

    base = dict(
        model=dict(
            name="graph_neural_cde", hidden_dim=4, interpolation="cubic",
            method="Tsit5", return_sequence=True, max_steps=64,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                use_control=False,
            ),
        ),
        dataset=dict(
            name="heat", batch_size=2, num_nodes=9, dynamic_graph=True,
            all_dynamic=True, graph_type="grid", final_time=1.0, time_tick=10,
            sampling_type="irregular", method="Tsit5", dt0=0.05,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-2),
        ),
        loss=dict(name="MSE"),
        eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_name="t",
        logger_name="test-resume", wandb=dict(project="test", mode="disabled"),
    )
    Trainer(**base, epochs=2, resume=True).run()
    # Second run with more epochs resumes rather than restarting.
    import logging

    records = []

    class Grab(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    logging.getLogger("test-resume").addHandler(Grab())
    Trainer(**base, epochs=3, resume=True).run()
    assert any("Resumed from epoch" in m for m in records)


def _tiny_dyn_cfg(tmp_path, **overrides):
    cfg = dict(
        model=dict(
            name="graph_neural_cde",
            hidden_dim=4,
            interpolation="cubic",
            method="Tsit5",
            return_sequence=True,
            max_steps=64,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                use_control=False,
            ),
        ),
        dataset=dict(
            name="heat", batch_size=2, num_nodes=9, dynamic_graph=True,
            all_dynamic=True, graph_type="grid", final_time=1.0, time_tick=10,
            sampling_type="irregular", method="Tsit5", dt0=0.05,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-2),
        ),
        loss=dict(name="MSE"),
        epochs=4, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_name="t",
        logger_name="test-nan-guard",
        wandb=dict(project="test", mode="disabled"),
    )
    cfg.update(overrides)
    return cfg


def _poison_step_fn(monkeypatch, poison_calls):
    """Wrap the real train step so selected calls return a NaN loss AND a
    NaN-poisoned model -- recovery only succeeds if the guard actually
    replaces the state, not just the logged loss."""
    import jax
    import jax.numpy as jnp
    from gncde_tpu.train import trainer as trainer_mod

    real_make = trainer_mod.make_step_fn
    counter = {"i": -1}

    def make_poisoned(optimiser, loss):
        real = real_make(optimiser, loss)

        def step(model, opt_state, data_i):
            counter["i"] += 1
            loss_val, model, opt_state, mg, mu = real(model, opt_state, data_i)
            if counter["i"] in poison_calls:
                loss_val = jnp.asarray(jnp.nan, dtype=jnp.float32)
                model = jax.tree_util.tree_map(
                    lambda x: x * jnp.nan
                    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
                    else x,
                    model,
                )
            return loss_val, model, opt_state, mg, mu

        return step

    monkeypatch.setattr(trainer_mod, "make_step_fn", make_poisoned)
    return counter


def test_nan_guard_restores_from_checkpoint(tmp_path, monkeypatch):
    """A transient non-finite step (NaN loss + NaN params) is detected and
    the last best-state checkpoint restored; training completes with finite
    metrics."""
    from gncde_tpu.train.trainer import Trainer

    _poison_step_fn(monkeypatch, poison_calls={1})
    cfg = _tiny_dyn_cfg(tmp_path, nan_guard=True)
    summary = Trainer(**cfg).run()
    assert np.isfinite(summary["validation_loss"])


def test_nan_guard_raises_after_max_restores(tmp_path, monkeypatch):
    """A deterministically diverging run (every step NaN, so no checkpoint
    ever exists -> reinitialise branch) fails loudly after max_restores."""
    from gncde_tpu.train.trainer import Trainer

    _poison_step_fn(monkeypatch, poison_calls=set(range(100)))
    cfg = _tiny_dyn_cfg(
        tmp_path, epochs=10, nan_guard=True, nan_guard_max_restores=2
    )
    with pytest.raises(FloatingPointError, match="non-finite"):
        Trainer(**cfg).run()


def test_tgb_sparse_control_genre_scale_e2e(tmp_path):
    """TGB training at tgbn-genre scale (n=1505, reference
    configs/tgb/genre/st_gncde_config.yaml:30-35) with the windowed
    trainers' ``sparse_control`` knob: window coefficients become ELL
    SparseMatrixControls host-side, so the solve is O(nnz * H) -- the
    memory-feasibility route for the large-n config families."""
    from gncde_tpu.train.windowed import TGBTrainer

    n = 1505
    rng = np.random.default_rng(3)
    rows = ["timestamp,source,destination,weight"]
    # Sparse activity: ~4 edges per node per snapshot window overall.
    for t in range(8):
        for _ in range(800):
            s, d = rng.integers(0, n, 2)
            rows.append(f"{t},{s},{d},{rng.uniform(0.1, 2.0):.4f}")
    ddir = tmp_path / "tgbn-genre"
    ddir.mkdir(parents=True)
    (ddir / "tgbn-genre_edgelist.csv").write_text("\n".join(rows))

    cfg = dict(
        model=dict(
            name="tgb_graph_neural_cde", hidden_dim=4, interpolation="cubic",
            method="Tsit5", return_sequence=False, dt0=0.5,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                data_embed_dim=4, num_nodes=n,
            ),
        ),
        dataset=dict(
            name="tgbn-genre", window_size=3, stride=3, frequency="None",
            data_dir=str(tmp_path), interpolation="cubic",
            cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
        sparse_control=True,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-tgb-sparse",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = TGBTrainer(**cfg).run()
    assert "test_ndcg@10" in summary
    assert 0.0 <= summary["test_ndcg@10"] <= 1.0


def test_pgt_bcsr_sparse_format_e2e(tmp_path):
    """PGT (england-covid) with ``sparse_format: bcsr``: the window
    coefficients become BCSRMatrixControls and the whole training loop runs
    through the blocked-ELL kernels (ops/bcsr.py). The resulting metrics
    must agree with the ELL format (same math, different layout)."""
    from gncde_tpu.train.windowed import PGTTrainer

    def cfg_for(fmt, sub, lr):
        return dict(
            model=dict(
                name="pgt_graph_neural_cde", hidden_dim=4, data_dim=8,
                feature_dim=1, interpolation="cubic", method="Tsit5",
                return_sequence=False,
                vector_field=dict(
                    name="PermEquivGraphVectorField", hidden_dim=4,
                    num_layers=2, data_embed_dim=8, num_nodes=129,
                ),
            ),
            dataset=dict(
                name="england-covid", window_size=5, stride=5,
                interpolation="cubic", cache_dir=str(tmp_path / sub / "cache"),
            ),
            optimiser=dict(
                name="adamw", weight_decay=1e-4, gradient_clipping=True,
                schedule=dict(name="constant_schedule", value=lr),
            ),
            epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
            sparse_control=True, sparse_format=fmt, sparse_block_size=16,
            checkpoint_dir=str(tmp_path / sub / "ckpt"),
            logger_name=f"test-pgt-{fmt}",
            wandb=dict(project="test", mode="disabled"),
        )

    # Function-level agreement: at LR 0 both formats evaluate the SAME
    # initial model. england-covid's raw edge weights are ~1e5 and the
    # CDE dynamics are stiff, so f32 summation-order noise between the two
    # layouts amplifies through the 40-step solve to ~1e-3 relative
    # (measured 7.5e-4; each run is bit-deterministic). Tight numerical
    # parity on tame data lives in tests/test_bcsr_model.py; here we pin
    # the e2e agreement envelope. (At a real LR the same noise compounds
    # through the optimizer into visible trajectory divergence -- expected,
    # not a layout bug.)
    s_bcsr0 = PGTTrainer(**cfg_for("bcsr", "b0", 0.0)).run()
    s_ell0 = PGTTrainer(**cfg_for("ell", "e0", 0.0)).run()
    np.testing.assert_allclose(
        s_bcsr0["best_selection"], s_ell0["best_selection"], rtol=5e-3,
    )
    # And the BCSR format actually TRAINS (finite losses, params move).
    s_bcsr = PGTTrainer(**cfg_for("bcsr", "b1", 1e-3)).run()
    assert np.isfinite(s_bcsr["best_selection"])
    assert s_bcsr["best_selection"] != s_bcsr0["best_selection"]


def test_pgt_sparse_control_e2e(tmp_path):
    """PGT (england-covid) with sparse_control: the same knob routes the
    window coefficients through ELL sparse message passing."""
    from gncde_tpu.train.windowed import PGTTrainer

    cfg = dict(
        model=dict(
            name="pgt_graph_neural_cde", hidden_dim=4, data_dim=8,
            feature_dim=1, interpolation="cubic", method="Tsit5",
            return_sequence=False,
            vector_field=dict(
                name="PermEquivGraphVectorField", hidden_dim=4, num_layers=2,
                data_embed_dim=8, num_nodes=129,
            ),
        ),
        dataset=dict(
            name="england-covid", window_size=5, stride=5,
            interpolation="cubic", cache_dir=str(tmp_path / "cache"),
        ),
        optimiser=dict(
            name="adamw", weight_decay=1e-4, gradient_clipping=True,
            schedule=dict(name="constant_schedule", value=1e-3),
        ),
        epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
        sparse_control=True,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-pgt-sparse",
        wandb=dict(project="test", mode="disabled"),
    )
    summary = PGTTrainer(**cfg).run()
    assert np.isfinite(summary["best_selection"])
