"""TGB selection-at-init + ranking-aligned objectives (VERDICT r4 item 3).

Units for the two opt-in losses (listwise top-k softmax, pairwise hinge on
hard negatives) and a behavioural test that the windowed trainer evaluates
the INIT as a selection candidate -- with the persistence head's beta=0
init (= copy-last), best-val can then never fall below the init's NDCG.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from gncde_tpu.train.windowed import (
    TGBTrainer,
    _hinge_rank_loss,
    _ndcg_listwise_loss,
)


def _row_setup(key, rows=6, n=20):
    ks = jr.split(key, 3)
    scores = jr.normal(ks[0], (rows, n))
    label = jnp.where(
        jr.uniform(ks[1], (rows, n)) < 0.2, jr.uniform(ks[2], (rows, n)), 0.0
    )
    label = label / jnp.maximum(label.sum(-1, keepdims=True), 1e-12)
    mask = jnp.arange(rows) < rows - 1  # last row inactive
    return scores, label, mask


def test_listwise_loss_perfect_ranking_is_lower():
    scores, label, mask = _row_setup(jr.PRNGKey(0))
    # Scores proportional to labels (perfect ranking, peaked) vs random.
    good = 20.0 * label
    l_good = float(_ndcg_listwise_loss(good, label, mask, k=10))
    l_rand = float(_ndcg_listwise_loss(scores, label, mask, k=10))
    assert np.isfinite(l_good) and np.isfinite(l_rand)
    assert l_good < l_rand


def test_listwise_loss_masked_rows_ignored():
    scores, label, mask = _row_setup(jr.PRNGKey(1))
    # Perturbing ONLY the masked row changes nothing.
    scores2 = scores.at[-1].set(scores[-1] + 100.0)
    a = float(_ndcg_listwise_loss(scores, label, mask, k=5))
    b = float(_ndcg_listwise_loss(scores2, label, mask, k=5))
    assert a == b


def test_hinge_loss_zero_when_positives_clear_margin():
    rows, n = 4, 16
    label = jnp.zeros((rows, n)).at[:, :3].set(1.0 / 3)
    # Positives 10 above every negative: no violation at margin 0.1.
    scores = jnp.concatenate(
        [jnp.full((rows, 3), 10.0), jnp.zeros((rows, n - 3))], axis=1
    )
    mask = jnp.ones((rows,), bool)
    assert float(_hinge_rank_loss(scores, label, mask, 5, 0.1)) == 0.0
    # Inverted scores: full violation.
    bad = -scores
    assert float(_hinge_rank_loss(bad, label, mask, 5, 0.1)) > 1.0


def test_hinge_loss_grad_pushes_positives_up():
    scores, label, mask = _row_setup(jr.PRNGKey(2))
    g = jax.grad(
        lambda s: _hinge_rank_loss(s, label, mask, 8, 0.5)
    )(scores)
    # Gradient on positive entries of active rows must be <= 0 (raise score).
    pos = (np.asarray(label) > 0) & np.asarray(mask)[:, None]
    assert np.all(np.asarray(g)[pos] <= 1e-9)
    assert np.isfinite(np.asarray(g)).all()


def _tiny_tgb_cfg(tmp_path, data_dir, **over):
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
            # LR large enough that one epoch visibly degrades the init.
            schedule=dict(name="constant_schedule", value=3e-2),
        ),
        epochs=1, eval_freq=1, log_freq=1, min_epochs=0,
        checkpoint_dir=str(tmp_path / "ckpt"), logger_name="test-tgb-init",
        wandb=dict(project="test", mode="disabled"),
    )
    cfg.update(over)
    return cfg


def test_init_is_selection_candidate(tmp_path):
    """With eval_at_init (default), the persistence-head init is evaluated
    and selected when training degrades it; disabled, selection can only
    see post-training epochs."""
    from tests.test_trainers_e2e import _write_tgb_fixture

    data_dir = _write_tgb_fixture(tmp_path)
    on = TGBTrainer(**_tiny_tgb_cfg(tmp_path, data_dir)).run()
    off = TGBTrainer(
        **_tiny_tgb_cfg(tmp_path, data_dir, eval_at_init=False)
    ).run()
    # best_selection is -NDCG: with the init as a candidate the selected
    # value can never be worse than with it excluded.
    assert on["best_selection"] <= off["best_selection"] + 1e-9
    assert off["best_epoch"] >= 0


@pytest.mark.parametrize("loss_type", ["listwise", "hinge"])
def test_tgb_ranking_loss_e2e(tmp_path, loss_type):
    from tests.test_trainers_e2e import _write_tgb_fixture

    data_dir = _write_tgb_fixture(tmp_path)
    cfg = _tiny_tgb_cfg(tmp_path, data_dir, loss_type=loss_type)
    summary = TGBTrainer(**cfg).run()
    assert "test_ndcg@10" in summary
    assert 0.0 <= summary["test_ndcg@10"] <= 1.0
