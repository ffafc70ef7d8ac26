"""Utility subsystem tests: batching, metrics, task cache, checkpoints."""

import numpy as np
import jax.numpy as jnp
import jax.random as jr
import pydantic

from gncde_tpu.utils.batching import dataloader, miss_rate, graph_mini_batch
from gncde_tpu.utils.task_cache import cached_run, config_hash
from gncde_tpu.train import checkpoints
from gncde_tpu.train.metrics import ndcg_at_k, masked_mean_ndcg
from gncde_tpu.nn import Linear, tree_serialise_leaves, tree_deserialise_leaves


def test_dataloader_batches():
    xs = np.arange(10)[:, None]
    ys = np.arange(10) * 2
    gen = dataloader([xs, ys], 4, shuffle=False, rng=np.random.default_rng(0))
    bx, by = next(gen)
    assert bx.shape == (4, 1)
    np.testing.assert_array_equal(by, bx[:, 0] * 2)


def test_miss_rate():
    pred = jnp.array([0.0, 1.0, 2.0])
    tgt = jnp.array([0.1, 1.0, 0.0])
    np.testing.assert_allclose(float(miss_rate(pred, tgt, 0.5)), 1 / 3, rtol=1e-6)


def test_graph_mini_batch_block_diagonal():
    a1 = np.ones((2, 2))
    a2 = np.ones((3, 3)) * 2
    x1 = np.ones((2, 4))
    x2 = np.zeros((3, 4))
    A, X, gid = graph_mini_batch([a1, a2], [x1, x2])
    assert A.shape == (5, 5)
    assert np.all(A[:2, 2:] == 0) and np.all(A[2:, :2] == 0)
    np.testing.assert_array_equal(gid, [0, 0, 1, 1, 1])


def test_cached_run(tmp_path):
    calls = []

    class Cfg(pydantic.BaseModel):
        x: int = 3

        @cached_run(cache_dir=str(tmp_path))
        def run(self):
            calls.append(1)
            return self.x * 2

    cfg = Cfg()
    assert cfg.run() == 6
    assert cfg.run() == 6
    assert len(calls) == 1  # second call came from the cache
    assert Cfg(x=4).run() == 8  # different hash -> recompute
    assert len(calls) == 2


def test_config_hash_stable():
    class Cfg(pydantic.BaseModel):
        a: int = 1
        b: str = "x"

    assert config_hash(Cfg()) == config_hash(Cfg())
    assert config_hash(Cfg()) != config_hash(Cfg(a=2))


def test_ndcg_perfect_and_worst():
    y_true = jnp.array([[1.0, 0.5, 0.0, 0.0]])
    perfect = ndcg_at_k(y_true, jnp.array([[4.0, 3.0, 2.0, 1.0]]), k=4)
    np.testing.assert_allclose(perfect, 1.0, atol=1e-6)
    reversed_ = ndcg_at_k(y_true, jnp.array([[1.0, 2.0, 3.0, 4.0]]), k=4)
    assert float(reversed_[0]) < 1.0
    masked = masked_mean_ndcg(
        y_true.repeat(3, 0), jnp.array([[4.0, 3.0, 2.0, 1.0]]).repeat(3, 0),
        jnp.array([True, False, True]), k=4,
    )
    np.testing.assert_allclose(masked, 1.0, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    model = Linear(4, 3, key=jr.PRNGKey(0))
    path = str(tmp_path / "w.npz")
    tree_serialise_leaves(path, model)
    blank = Linear(4, 3, key=jr.PRNGKey(1))
    restored = tree_deserialise_leaves(path, blank)
    np.testing.assert_allclose(restored.weight, model.weight)


def test_full_state_checkpoint_roundtrip(tmp_path):
    import optax
    from gncde_tpu.nn import partition, is_inexact_array

    model = Linear(4, 3, key=jr.PRNGKey(0))
    opt = optax.adam(1e-3)
    params, _ = partition(model, is_inexact_array)
    opt_state = opt.init(params)
    state = checkpoints.TrainState(model, opt_state, epoch=7, best_metric=0.25)
    checkpoints.save_state(str(tmp_path / "s"), state)
    like = checkpoints.TrainState(
        Linear(4, 3, key=jr.PRNGKey(9)), opt.init(params), 0, float("inf")
    )
    restored = checkpoints.load_state(str(tmp_path / "s"), like)
    assert restored is not None
    assert restored.epoch == 7
    np.testing.assert_allclose(restored.best_metric, 0.25)
    np.testing.assert_allclose(restored.model.weight, model.weight)


def test_async_checkpointer_roundtrip(tmp_path):
    import optax
    from gncde_tpu.nn import partition, is_inexact_array

    model = Linear(4, 3, key=jr.PRNGKey(0))
    opt = optax.adam(1e-3)
    params, _ = partition(model, is_inexact_array)
    opt_state = opt.init(params)
    ckptr = checkpoints.AsyncStateCheckpointer(str(tmp_path / "s"))
    # Two back-to-back saves: the second must wait out the first's commit and
    # win (latest state on disk).
    ckptr.save(checkpoints.TrainState(model, opt_state, 3, 1.0))
    model2 = Linear(4, 3, key=jr.PRNGKey(5))
    ckptr.save(checkpoints.TrainState(model2, opt_state, 9, 0.5))
    ckptr.wait_until_finished()
    like = checkpoints.TrainState(
        Linear(4, 3, key=jr.PRNGKey(9)), opt.init(params), 0, float("inf")
    )
    restored = checkpoints.load_state(str(tmp_path / "s"), like)
    assert restored is not None and restored.epoch == 9
    np.testing.assert_allclose(restored.best_metric, 0.5)
    np.testing.assert_allclose(restored.model.weight, model2.weight)


def test_stack_windows_pads_ragged_to_one_group():
    from gncde_tpu.train.windowed import stack_windows

    w1 = {"t": np.arange(4.0), "A": np.zeros((4, 3, 3))}
    w2 = {"t": np.arange(4.0), "A": np.ones((4, 3, 3))}
    w3 = {"t": np.arange(6.0), "A": np.ones((6, 3, 3))}  # different length
    # Default: ragged windows are padded to the longest (6 knots) -> ONE
    # stacked group, one compiled program (SURVEY.md section 7.3 item 6;
    # exact-loss parity covered by tests/test_window_padding.py).
    stacked = stack_windows([w1, w2, w3])
    assert [s["_batched"] for s in stacked] == [3]
    assert stacked[0]["t"].shape == (3, 6)
    assert stacked[0]["A"].shape == (3, 6, 3, 3)


def test_stack_windows_groups_by_shape_without_padding():
    from gncde_tpu.train.windowed import stack_windows

    w1 = {"t": np.arange(4.0), "A": np.zeros((4, 3, 3))}
    w2 = {"t": np.arange(4.0), "A": np.ones((4, 3, 3))}
    w3 = {"t": np.arange(6.0), "A": np.ones((6, 3, 3))}
    stacked = stack_windows([w1, w2, w3], pad_ragged=False)
    sizes = sorted(s["_batched"] for s in stacked)
    assert sizes == [1, 2]
    big = next(s for s in stacked if s["_batched"] == 2)
    assert big["t"].shape == (2, 4)
    assert big["A"].shape == (2, 4, 3, 3)


def test_stack_windows_coeff_tuples():
    from gncde_tpu.train.windowed import stack_windows

    w = {"graph_path_coeffs": tuple(np.zeros((3, 2, 2)) for _ in range(4))}
    stacked = stack_windows([w, w])
    assert stacked[0]["graph_path_coeffs"][0].shape == (2, 3, 2, 2)
