"""Generic batching utilities.

Counterparts of the live-useful pieces of reference src/engine/utils.py
(SURVEY.md component #9): a shuffling minibatch generator (utils.py:268-280),
a miss-rate metric (utils.py:283-290), and block-diagonal graph minibatching
(utils.py:293-330). The reference's hardcoded-path dataset classes
(SDataset/MD17/ISO17) are cluster-specific dead code and intentionally have
no counterpart.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax
import jax.numpy as jnp


def dataloader(
    arrays: tp.Sequence[np.ndarray],
    batch_size: int,
    *,
    shuffle: bool = True,
    rng: tp.Optional[np.random.Generator] = None,
):
    """Yield aligned minibatches from equally-sized leading axes, forever."""
    n = arrays[0].shape[0]
    assert all(a.shape[0] == n for a in arrays)
    if rng is None:
        rng = np.random.default_rng()
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            yield tuple(a[idx] for a in arrays)


def miss_rate(pred: jax.Array, target: jax.Array, threshold: float = 0.5) -> jax.Array:
    """Fraction of entries whose absolute error exceeds ``threshold``."""
    return jnp.mean((jnp.abs(pred - target) > threshold).astype(jnp.float32))


def graph_mini_batch(
    adjacencies: tp.Sequence[np.ndarray],
    features: tp.Sequence[np.ndarray],
) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Block-diagonal batching of variable-size graphs.

    Returns (A_block, X_cat, graph_ids): one big disconnected graph whose
    blocks are the inputs, plus a node->graph index for segment readouts.
    """
    sizes = [a.shape[0] for a in adjacencies]
    total = sum(sizes)
    d = features[0].shape[-1]
    A = np.zeros((total, total), dtype=adjacencies[0].dtype)
    X = np.zeros((total, d), dtype=features[0].dtype)
    gid = np.zeros(total, dtype=np.int32)
    off = 0
    for g, (a, x) in enumerate(zip(adjacencies, features)):
        k = a.shape[0]
        A[off : off + k, off : off + k] = a
        X[off : off + k] = x
        gid[off : off + k] = g
        off += k
    return A, X, gid
