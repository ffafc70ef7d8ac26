"""Evaluation metrics.

``ndcg_at_k`` replaces the host-side ``tgb`` Evaluator the reference calls
per window (src/engine/trainer_tgb.py:63-81) with a vectorised device-side
computation -- no per-window device->host sync (SURVEY.md section 7.3 item 4).
Semantics match TGB's node-property NDCG@10: per source node, rank classes by
predicted score, relevance = true label weights, normalised by the ideal DCG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ndcg_at_k(y_true: jax.Array, y_pred: jax.Array, k: int = 10) -> jax.Array:
    """Mean NDCG@k over rows. y_true/y_pred: (rows, classes)."""
    k = min(k, y_pred.shape[-1])
    # DCG of predicted ranking
    top_idx = jnp.argsort(-y_pred, axis=-1)[..., :k]
    rel = jnp.take_along_axis(y_true, top_idx, axis=-1)
    discounts = 1.0 / jnp.log2(jnp.arange(2, k + 2, dtype=y_pred.dtype))
    dcg = jnp.sum(rel * discounts, axis=-1)
    # Ideal DCG
    ideal = jnp.sort(y_true, axis=-1)[..., ::-1][..., :k]
    idcg = jnp.sum(ideal * discounts, axis=-1)
    ndcg = jnp.where(idcg > 0, dcg / jnp.where(idcg > 0, idcg, 1.0), 0.0)
    return ndcg


def masked_mean_ndcg(
    y_true: jax.Array, y_pred: jax.Array, mask: jax.Array, k: int = 10
) -> jax.Array:
    ndcg = ndcg_at_k(y_true, y_pred, k)
    return jnp.sum(jnp.where(mask, ndcg, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
