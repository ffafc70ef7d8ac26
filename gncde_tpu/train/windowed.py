"""Windowed-task trainers (PGT, TGB, recurrent baselines).

One parameterised epoch-loop base replaces the reference's near-clone
trainers (src/engine/trainer_pgt.py, trainer_recurrent_pgt.py,
trainer_tgb.py -- SURVEY.md section 7.1 item 7). Metric names and selection
rules are preserved per task:
  * PGT: window-mean MSE, best = min validation_loss (trainer_pgt.py:45-66)
  * TGB: masked softmax CE over active source rows, best = max
    validation_ndcg@10 (trainer_tgb.py:40-60, 261-285)
  * recurrent: direct model(x_t, A) on the last window, MSE
    (trainer_recurrent_pgt.py:26-48)
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import random
import time
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import optax
import pydantic

from ..nn import (
    filter_value_and_grad,
    partition,
    is_inexact_array,
    apply_updates,
    num_params,
)
from ..models import (
    PGTGraphNeuralCDE,
    PGTGraphNeuralODE,
    PGTSTGraphNeuralCDE,
    TGBGraphNeuralCDE,
    TGBGraphNeuralODE,
    TGBSTGraphNeuralCDE,
)
from ..configs import (
    WandBConfig,
    OptimiserCfg,
    MSELossCfg,
    L1LossCfg,
    PGTGraphNeuralCDECfg,
    PGTGraphNeuralODECfg,
    PGTSTGraphNeuralCDECfg,
    TGBGraphNeuralCDECfg,
    TGBGraphNeuralODECfg,
    TGBSTGraphNeuralODECfg,
    StidGCNCfg,
    ASTGCNCfg,
    DCRNNCfg,
)
from ..configs.dataset_configs import PGTDataSetCfg, TGBDataSetCfg
from .logging import MetricLogger
from .metrics import masked_mean_ndcg
from . import checkpoints

logging.basicConfig(level=logging.INFO)


def _cubic_end_state(coeff_tuple):
    """(value, derivative) at the last knot from (d, c, b, a) stacks.

    Window knots are 0, 1, 2, ... (data/windows.py: ``np.arange``), so the
    last interval has unit length: value(t_end) = d + c + b + a and
    derivative(t_end) = 3d + 2c + b of the final interval.
    """
    d, c, b, a = (jnp.asarray(x)[-1] for x in coeff_tuple)
    return ((d + c) + b) + a, (3.0 * d + 2.0 * c) + b


def pad_windows(batches: tp.List[tp.Dict], t_max: int) -> tp.List[tp.Dict]:
    """Pad ragged windows to ``t_max`` snapshots with a CONSTANT extension.

    Padding scheme (SURVEY.md section 7.3 item 6 -- fixed-shape batching):
      * ``t`` (and other knot vectors) repeat the final knot, so the solve's
        ``t1 = ts[-1]`` -- and hence the integration span and step count --
        are UNCHANGED; the solver never enters the padded region.
      * cubic coefficient tuples gain zero-length intervals carrying the
        path's END VALUE and END DERIVATIVE (d = c = 0, b = deriv,
        a = value): an evaluation at exactly ``t1`` (the final RK stage /
        SaveAt point) sees the same (value, derivative) as the unpadded
        path, so trajectories are bit-equivalent.
      * time-major signal arrays (``x_t``, ``A``) repeat the last frame;
        models that rebuild coefficients from them in-forward get the same
        end state via the interpolation layer's zero-length-interval
        slope fill (interp/paths.py:backward_hermite_coefficients).
      * ``time_mask`` records the valid knots for sequence-style consumers.

    Final-time losses (the PGT/TGB window trainers) are therefore EXACT
    under padding, not approximated.
    """
    out = []
    for b in batches:
        t_len = int(np.asarray(b["t"]).shape[0])
        extra = t_max - t_len
        if extra < 0:
            raise ValueError(f"window longer ({t_len}) than t_max ({t_max})")
        nb = {}
        for k, v in b.items():
            if isinstance(v, (tuple, list)):  # cubic (d, c, b, a) stacks
                if extra == 0:
                    nb[k] = tuple(jnp.asarray(c) for c in v)
                    continue
                end_val, end_der = _cubic_end_state(v)
                dt = jnp.asarray(v[0]).dtype
                zeros = jnp.zeros((extra,) + end_val.shape, dt)
                ext = lambda stack, pad: jnp.concatenate(
                    [jnp.asarray(stack),
                     jnp.broadcast_to(pad, (extra,) + pad.shape).astype(dt)]
                )
                nb[k] = (
                    ext(v[0], jnp.zeros_like(end_val)),  # d
                    ext(v[1], jnp.zeros_like(end_val)),  # c
                    ext(v[2], end_der),                  # b
                    ext(v[3], end_val),                  # a
                )
                continue
            arr = jnp.asarray(v)
            # Knot vectors and time-major signals (window dict layout:
            # data/windows.py:process_window_{tgb,pgt}); labels/masks/scalars
            # are time-free and stay untouched.
            if k in ("t", "A_t", "events_time", "x_t", "A") and extra:
                rep = jnp.broadcast_to(arr[-1], (extra,) + arr.shape[1:])
                arr = jnp.concatenate([arr, rep])
            nb[k] = arr
        nb["time_mask"] = jnp.arange(t_max) < t_len
        out.append(nb)
    return out


def stack_windows(batches: tp.List[tp.Dict], pad_ragged: bool = True) -> tp.List[tp.Dict]:
    """Group window dicts by array shapes and stack each group along a new
    leading axis (ready for a vmapped loss).

    Window starts are sampled up to ``num_snapshots - window_size + 1``
    (data/windows.py:sample_disjoint_window_starts, mirroring reference
    dataset_configs.py:692-716), so every window has identical shapes and
    this produces exactly ONE stacked group -- one compiled program per
    loader. Ragged hand-built window lists are padded to the longest window
    (:func:`pad_windows` -- exact constant-extension semantics) so they
    still compile ONE program; if padding cannot reconcile the shapes
    (e.g. differing node counts), fall back to shape groups with a loud
    warning instead of silently multiplying compile count.
    """

    def _group(bs):
        groups: tp.Dict[tp.Tuple, tp.List[tp.Dict]] = {}
        for b in bs:
            sig = tuple(
                (k, tuple(jnp.asarray(v).shape) if not isinstance(v, (tuple, list))
                 else tuple(tuple(c.shape) for c in v))
                for k, v in sorted(b.items())
            )
            groups.setdefault(sig, []).append(b)
        return groups

    groups = _group(batches)
    if len(groups) > 1 and pad_ragged and all("t" in b for b in batches):
        t_max = max(int(np.asarray(b["t"]).shape[0]) for b in batches)
        try:
            padded = pad_windows(batches, t_max)
            regrouped = _group(padded)
            if len(regrouped) == 1:
                groups = regrouped
                logging.getLogger("gncde").info(
                    "stack_windows: padded %d ragged windows to %d knots "
                    "(one compiled program)", len(batches), t_max,
                )
        except Exception as exc:  # noqa: BLE001 - fall back to shape groups
            logging.getLogger("gncde").warning(
                "stack_windows: pad-to-max failed (%r); falling back to "
                "shape groups", exc,
            )

    stacked = []
    for group in groups.values():
        out = {}
        for k in group[0]:
            v0 = group[0][k]
            if isinstance(v0, (tuple, list)):
                out[k] = tuple(
                    jnp.stack([jnp.asarray(g[k][i]) for g in group])
                    for i in range(len(v0))
                )
            else:
                out[k] = jnp.stack([jnp.asarray(g[k]) for g in group])
        out["_batched"] = len(group)
        stacked.append(out)
    if len(stacked) > 1:
        logging.getLogger("gncde").warning(
            "stack_windows: %d distinct window shapes -> %d compiled programs "
            "per step fn (expected 1; check the window pipeline for ragged "
            "shapes)", len(stacked), len(stacked),
        )
    return stacked


def make_window_step_fn(optimiser, loss, has_aux=False):
    # NOTE: no buffer donation here -- models with the reference's key-reuse
    # quirks (e.g. PGT encoder/decoder built from the same key) can hold
    # aliased buffers, which XLA rejects when donated twice.
    @jax.jit
    def step(model, opt_state, data_i):
        out, grads = filter_value_and_grad(loss, has_aux=has_aux)(model, data_i)
        flat_grads = [g for g in jax.tree_util.tree_leaves(grads) if g is not None]
        max_grad = jnp.max(jnp.abs(jnp.concatenate([g.ravel() for g in flat_grads])))
        params, _ = partition(model, is_inexact_array)
        updates, opt_state = optimiser.update(grads, opt_state, params)
        model = apply_updates(model, updates)
        flat_updates = [u for u in jax.tree_util.tree_leaves(updates) if u is not None]
        max_update = jnp.max(
            jnp.abs(jnp.concatenate([u.ravel() for u in flat_updates]))
        )
        return out, model, opt_state, max_grad, max_update

    return step


class _WindowedTrainerBase(pydantic.BaseModel):
    wandb: WandBConfig = WandBConfig()
    epochs: int = 2000
    patience: int = -1
    min_epochs: int = 100
    seed: int = 1234
    log_freq: int = 10
    eval_freq: int = 10
    checkpoint_dir: str = ".checkpoints/"
    checkpoint_name: str = "model"
    optimiser: OptimiserCfg = pydantic.Field(...)
    logger_name: str = "gncde"
    metrics_jsonl: tp.Optional[str] = None
    # Stack equally-shaped windows and vmap the per-window loss over them --
    # one big solver program instead of a Python loop of small ones (the
    # reference processes windows one at a time with batch_size=1,
    # tgb_dataset.py:202-218). Significant on accelerators.
    batch_windows: bool = False
    # Scaled-n sparse message passing for the LARGE window graphs (twitter
    # n=1000, tgbn-genre n=1505): convert each window's dense graph-path
    # coefficients to interp.SparseMatrixControl (ELL) host-side, making the
    # solver hot loop O(nnz * H) instead of O(n^2 * H) and the coefficient
    # storage O(T * nnz). Exact at any density (ELL pattern = union of
    # nonzero coefficient entries). Mirrors the dyn trainer's knob
    # (trainer.py sparse_control); composes with batch_windows (the batched
    # from_stacked path shares one K across the stack).
    sparse_control: bool = False
    sparse_max_degree: tp.Optional[int] = None
    sparse_format: tp.Literal["ell", "bcsr", "auto"] = "ell"
    sparse_block_size: int = 128
    # Evaluate the freshly built model BEFORE epoch 1 so the initialisation
    # is a model-selection candidate (best_epoch == -1 means "init won").
    # Matters for heads whose init encodes a strong baseline -- the
    # persistence head's beta=0 init IS copy-last (models/tgb.py), and the
    # reference's select-after-training loop (trainer_tgb.py:261-285) can
    # otherwise end below its own starting point.
    eval_at_init: bool = True

    model_config = pydantic.ConfigDict(extra="ignore")
    _run_key: tp.Any = pydantic.PrivateAttr(default=None)

    # -- task hooks -------------------------------------------------------
    #   _data_tuple(model, window_dict) -> pytree of jnp arrays
    #   _loss(model, data_i) -> scalar (or (scalar, aux))
    #   _eval_metrics(model, data_i) -> dict of scalars
    #   _selection(metrics) -> float, lower is better
    _has_aux: tp.ClassVar[bool] = False

    def _hash_config(self) -> str:
        config_str = json.dumps(self.model_dump(), sort_keys=True, default=str)
        return hashlib.md5(config_str.encode()).hexdigest()

    def run(self) -> tp.Dict[str, float]:
        random.seed(self.seed)
        np.random.seed(self.seed)

        config_hash = self._hash_config()
        logger = logging.getLogger(self.logger_name)
        logger.setLevel(logging.INFO)
        logger.info(self)

        trainer_key = jr.PRNGKey(self.seed)
        (train_key, val_key, test_key, model_key, opt_key, self._run_key) = jr.split(
            trainer_key, 6
        )
        train_loader = self.dataset.get_training_data(train_key)
        val_loader = self.dataset.get_validation_data(val_key)
        test_loader = self.dataset.get_test_data(test_key)
        logger.info(
            "Data loading done: %d/%d/%d windows",
            len(train_loader), len(val_loader), len(test_loader),
        )
        if self.batch_windows:
            train_loader = type(train_loader)(stack_windows(list(train_loader)))
            val_loader = type(val_loader)(stack_windows(list(val_loader)))
            test_loader = type(test_loader)(stack_windows(list(test_loader)))
            logger.info(
                "Window batching: %d/%d/%d stacked groups",
                len(train_loader), len(val_loader), len(test_loader),
            )

        if self.sparse_control:
            from ..interp import build_sparse_control

            interpolation = getattr(self.model, "interpolation", "cubic")

            def _sparsify(loader):
                out = []
                for d in loader:
                    if "graph_path_coeffs" in d:
                        d = dict(d)
                        d["graph_path_coeffs"] = build_sparse_control(
                            interpolation,
                            jnp.asarray(d["t"]),
                            d["graph_path_coeffs"],
                            sparse_format=self.sparse_format,
                            max_degree=self.sparse_max_degree,
                            block_size=self.sparse_block_size,
                        )
                    out.append(d)
                return type(loader)(out)

            train_loader = _sparsify(train_loader)
            val_loader = _sparsify(val_loader)
            test_loader = _sparsify(test_loader)
            logger.info("Sparse ELL control conversion done")

        model = self.model.build(model_key)
        metric_logger = MetricLogger(
            project=self.wandb.project, mode=self.wandb.mode,
            jsonl_path=self.metrics_jsonl, config=self.model_dump(),
        )
        metric_logger.log({"num_params": num_params(model)})

        optimiser, schedule = self.optimiser.build(opt_key)
        params, _ = partition(model, is_inexact_array)
        opt_state = optimiser.init(params)
        step = make_window_step_fn(optimiser, self._loss, self._has_aux)

        best_selection, best_epoch = np.inf, 0
        final_test_metrics: tp.Dict[str, float] = {}
        patience_counter = 0

        def eval_and_select(model, epoch, train_loss=None):
            """Shared eval + best-model selection; returns True on improve."""
            nonlocal best_selection, best_epoch, final_test_metrics
            nonlocal patience_counter
            t0 = time.time()
            val_metrics = self._eval_loader(model, val_loader)
            val_metrics["validation_step_time"] = time.time() - t0
            metric_logger.log(val_metrics)
            logger.info("Epoch: %04d, %s", epoch + 1, val_metrics)

            if len(val_loader) == 0:
                # No validation windows (tiny split): select on train loss.
                if train_loss is None:
                    return False
                selection = train_loss
            else:
                selection = self._selection(val_metrics)
            if selection < best_selection:
                patience_counter = 0
                best_selection = selection
                best_epoch = epoch
                if self.checkpoint_dir:
                    checkpoints.save_weights(
                        os.path.join(self.checkpoint_dir, f"{config_hash}.npz"),
                        model,
                    )
                    logger.info("Model saved at epoch %d", epoch)
                final_test_metrics = {
                    f"test_{k.replace('validation_', '')}": v
                    for k, v in self._eval_loader(model, test_loader).items()
                }
                metric_logger.log(final_test_metrics)
                return True
            patience_counter += 1
            return False

        if self.eval_at_init and len(val_loader) > 0:
            # The init is a selection candidate (best_epoch -1 == init won).
            eval_and_select(model, -1)

        for epoch in range(self.epochs):
            train_loss, max_grad, max_update = 0.0, 0.0, 0.0
            start_time = time.time()
            for batch in train_loader:
                data_i = self._data_tuple(model, batch)
                out, model, opt_state, g, u = step(model, opt_state, data_i)
                loss_val = out[0] if self._has_aux else out
                train_loss += float(loss_val)
                max_grad = max(max_grad, float(g))
                max_update = max(max_update, float(u))
            train_loss /= max(len(train_loader), 1)
            end_time = time.time()

            metric_logger.log(
                {
                    "train_loss": train_loss,
                    "train_step_time": end_time - start_time,
                    "max_grad": max_grad,
                    "max_update": max_update,
                }
            )
            if epoch == 0 or (epoch + 1) % self.log_freq == 0:
                logger.info(
                    "Epoch: %04d, Train Loss: %s, Step Time: %.4fs, LR: %s",
                    epoch + 1, train_loss, end_time - start_time, schedule(epoch),
                )

            if (epoch + 1) % self.eval_freq == 0:
                improved = eval_and_select(model, epoch, train_loss=train_loss)
                if not improved:
                    if (
                        self.patience > 0
                        and patience_counter * self.eval_freq >= self.patience
                        and epoch > self.min_epochs
                    ):
                        logger.info("Early stopping")
                        break

        summary = {
            "best_selection": best_selection,
            "best_epoch": best_epoch,
            **final_test_metrics,
        }
        logger.info("Final: %s", summary)
        metric_logger.log({"best_epoch": best_epoch})
        metric_logger.close()
        return summary

    def _eval_loader(self, model, loader) -> tp.Dict[str, float]:
        totals: tp.Dict[str, float] = {}
        for batch in loader:
            data_i = self._data_tuple(model, batch)
            for k, v in self._eval_metrics(model, data_i).items():
                totals[k] = totals.get(k, 0.0) + float(v)
        return {k: v / max(len(loader), 1) for k, v in totals.items()}


# ---------------------------------------------------------------------------
# PGT (solver models)
# ---------------------------------------------------------------------------


class PGTTrainer(_WindowedTrainerBase):
    """Reference src/engine/trainer_pgt.py."""

    model: tp.Union[
        PGTGraphNeuralCDECfg, PGTGraphNeuralODECfg, PGTSTGraphNeuralCDECfg
    ] = pydantic.Field(..., discriminator="name")
    dataset: tp.Union[PGTDataSetCfg, TGBDataSetCfg] = pydantic.Field(
        ..., discriminator="name"
    )
    loss: tp.Union[MSELossCfg, L1LossCfg] = pydantic.Field(
        MSELossCfg(name="MSE"), discriminator="name"
    )

    def _data_tuple(self, model, d):
        if isinstance(model, PGTGraphNeuralODE):
            return (
                jnp.asarray(d["t"]), d["graph_path_coeffs"], jnp.asarray(d["A"]),
                d["x_coeffs"], jnp.asarray(d["true_y0"]), jnp.asarray(d["true_y"]),
            )
        return (
            jnp.asarray(d["t"]), d["graph_path_coeffs"], d["x_coeffs"],
            jnp.asarray(d["true_y0"]), jnp.asarray(d["true_y"]),
        )

    @staticmethod
    def _loss_single(model, data_i):
        if isinstance(model, PGTGraphNeuralODE):
            t_i, adj_coeffs, adj_list, x_coeffs, x0, label = data_i
            y_pred = model(t_i, adj_coeffs, adj_list, x_coeffs, x0)
        else:
            t_i, adj_coeffs, x_coeffs, x0, label = data_i
            y_pred = model(t_i, adj_coeffs, x_coeffs, x0)
        y_pred = jnp.reshape(y_pred, (y_pred.shape[0], 1))
        label = jnp.reshape(label, (-1, 1))
        return jnp.mean((y_pred - label) ** 2)

    @staticmethod
    def _loss(model, data_i):
        if data_i[0].ndim == 2:  # stacked windows -> vmap the solve
            losses = jax.vmap(
                lambda *args: PGTTrainer._loss_single(model, args)
            )(*data_i)
            return jnp.mean(losses)
        return PGTTrainer._loss_single(model, data_i)

    def _eval_metrics(self, model, data_i):
        return {"validation_loss": _pgt_eval_jit(model, data_i)}

    def _selection(self, metrics):
        return metrics["validation_loss"]


@jax.jit
def _pgt_eval_jit(model, data_i):
    return PGTTrainer._loss(model, data_i)


# ---------------------------------------------------------------------------
# TGB (solver models; CE + NDCG@10)
# ---------------------------------------------------------------------------


def _ndcg_listwise_loss(y_pred, label, mask, k: int):
    """Listwise softmax over the label's top-k with DCG discount weights.

    Per masked row: take the k highest-label targets, weight them
    ``label_j / log2(rank + 2)`` (the NDCG gain/discount of the rank the
    label itself assigns), normalise, and cross-entropy them against
    ``log_softmax(scores)``. vs plain CE (which spends capacity matching
    the full distribution's tail) this concentrates the objective on
    exactly the entries NDCG@k scores.
    """
    gains, idx = jax.lax.top_k(label, k)  # (rows, k) label-ranked targets
    disc = 1.0 / jnp.log2(jnp.arange(k, dtype=y_pred.dtype) + 2.0)
    w = gains * disc[None, :]
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    row_loss = -jnp.sum(w * jnp.take_along_axis(logp, idx, axis=-1), axis=-1)
    row_loss = jnp.where(jnp.sum(gains, axis=-1) > 0, row_loss, 0.0)
    filtered = jnp.where(mask, row_loss, 0.0)
    return jnp.sum(filtered) / jnp.sum(mask)


def _hinge_rank_loss(y_pred, label, mask, k: int, margin: float):
    """Pairwise hinge on active rows against top-k hard negatives.

    Per masked row: every positive target (label > 0, weighted by its
    label) must beat the k highest-SCORING zero-label nodes by ``margin``:
    mean_p w_p * mean_neg relu(margin - s_p + s_neg). Directly penalises
    the inversions NDCG counts, at O(k n) per row instead of O(n^2).
    """
    neg_scores = jnp.where(label > 0, -jnp.inf, y_pred)
    hard, _ = jax.lax.top_k(neg_scores, k)  # (rows, k)
    hard = jnp.where(jnp.isfinite(hard), hard, -1e30)
    # (rows, n, k): positive j vs hard negative l
    viol = jax.nn.relu(margin - y_pred[..., :, None] + hard[..., None, :])
    per_pos = jnp.mean(viol, axis=-1)  # (rows, n)
    w = jnp.where(label > 0, label, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    row_loss = jnp.sum(w * per_pos, axis=-1)
    filtered = jnp.where(mask, row_loss, 0.0)
    return jnp.sum(filtered) / jnp.sum(mask)


class TGBTrainer(_WindowedTrainerBase):
    """Reference src/engine/trainer_tgb.py."""

    model: tp.Union[
        TGBGraphNeuralCDECfg, TGBGraphNeuralODECfg, TGBSTGraphNeuralODECfg
    ] = pydantic.Field(..., discriminator="name")
    dataset: TGBDataSetCfg = pydantic.Field(...)
    # Opt-in ranking-aligned objectives (VERDICT r4 item 3b): the reference
    # trains masked softmax CE (trainer_tgb.py:42-60) but SELECTS on
    # NDCG@10 -- "ce" keeps that; "listwise" is a top-k DCG-weighted
    # softmax CE; "hinge" is a pairwise margin against hard negatives.
    loss_type: tp.Literal["ce", "listwise", "hinge"] = "ce"
    rank_topk: int = 10
    hinge_margin: float = 0.1

    def _data_tuple(self, model, d):
        return (
            jnp.asarray(d["start_time"]), jnp.asarray(d["t"]),
            d["graph_path_coeffs"], jnp.asarray(d["x_t"]),
            jnp.asarray(d["true_y0"]), jnp.asarray(d["true_y"]),
            jnp.asarray(d["source_mask"]),
        )

    @staticmethod
    def _predict(model, data_i):
        start_time, t_i, adj_coeffs, x_t, x0, label, mask = data_i
        return model(t_i, adj_coeffs, x_t, x0, start_time), label, mask

    def _loss_single(self, model, data_i):
        y_pred, label, mask = TGBTrainer._predict(model, data_i)
        if self.loss_type == "listwise":
            return _ndcg_listwise_loss(y_pred, label, mask, self.rank_topk)
        if self.loss_type == "hinge":
            return _hinge_rank_loss(
                y_pred, label, mask, self.rank_topk, self.hinge_margin)
        loss = jnp.sum(-label * jax.nn.log_softmax(y_pred, axis=-1), axis=-1)
        filtered = jnp.where(mask, loss, 0.0)
        return jnp.sum(filtered) / jnp.sum(mask)

    def _loss(self, model, data_i):
        if data_i[1].ndim == 2:  # stacked windows
            losses = jax.vmap(
                lambda *args: self._loss_single(model, args)
            )(*data_i)
            return jnp.mean(losses)
        return self._loss_single(model, data_i)

    def _eval_metrics(self, model, data_i):
        ce, ndcg = _tgb_eval_jit(model, data_i)
        return {"validation_loss": ce, "validation_ndcg@10": ndcg}

    def _selection(self, metrics):
        # Reference selects on max NDCG (trainer_tgb.py:261-285)
        return -metrics["validation_ndcg@10"]


@jax.jit
def _tgb_eval_jit(model, data_i):
    def one(*args):
        y_pred, label, mask = TGBTrainer._predict(model, args)
        ce = jnp.sum(-label * jax.nn.log_softmax(y_pred, axis=-1), axis=-1)
        ce = jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.sum(mask)
        ndcg = masked_mean_ndcg(label, y_pred, mask, k=10)
        return ce, ndcg

    if data_i[1].ndim == 2:  # stacked windows
        ces, ndcgs = jax.vmap(one)(*data_i)
        return jnp.mean(ces), jnp.mean(ndcgs)
    return one(*data_i)


# ---------------------------------------------------------------------------
# Recurrent discrete baselines over PGT windows
# ---------------------------------------------------------------------------


class RecurrentPGTTrainer(_WindowedTrainerBase):
    """Reference src/engine/trainer_recurrent_pgt.py."""

    model: tp.Union[StidGCNCfg, ASTGCNCfg, DCRNNCfg] = pydantic.Field(
        ..., discriminator="name"
    )
    dataset: tp.Union[PGTDataSetCfg, TGBDataSetCfg] = pydantic.Field(
        ..., discriminator="name"
    )

    def _data_tuple(self, model, d):
        return (
            jnp.asarray(d["x_t"]), jnp.asarray(d["true_y"]), jnp.asarray(d["A"]),
        )

    def _loss(self, model, data_i):
        from ..models.dcrnn import DCRNNModelSingleStep

        def one(x0_i, label_i, adj):
            if isinstance(model, DCRNNModelSingleStep):
                pred_y = model(x0_i, adj)
                pred_y = jnp.squeeze(pred_y, axis=0)
            else:
                pred_y = model(x0_i, self._run_key)
                pred_y = jnp.squeeze(pred_y, axis=-1)
            return jnp.mean((pred_y - label_i) ** 2)

        x0_i, label_i, adj = data_i
        if x0_i.ndim == 4:  # stacked windows
            return jnp.mean(jax.vmap(one)(x0_i, label_i, adj))
        return one(x0_i, label_i, adj)

    def _eval_metrics(self, model, data_i):
        return {"validation_loss": self._loss(model, data_i)}

    def _selection(self, metrics):
        return metrics["validation_loss"]
