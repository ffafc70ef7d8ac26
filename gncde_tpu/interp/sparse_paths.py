"""Sparse (ELL) control paths for scaled-n graphs.

The dense control path (interp/paths.py) stores O(n^2) coefficient planes and
the fusion layers multiply dense operators -- fine at the reference's n=400
but O(n^2) HBM per solver step at scaled n. Here the adjacency signal A(t) is
interpolated ENTRYWISE only at its (time-union) sparsity pattern:

  * one ELL index pattern ``indices (n, K)`` shared by every knot/plane
    (interpolation is entrywise-linear in the knot values, so an entry that is
    zero at every knot has identically-zero coefficients -- gathering at the
    union pattern is exact, not an approximation);
  * cubic Hermite coefficient planes ``(T-1, n, K)`` (or linear knots
    ``(T, n, K)``) in place of the dense ``(T-1, n, n)``;
  * ``adj(t)`` / ``dadj(t)`` return :class:`gncde_tpu.ops.sparse.ELL` values,
    which the fusion layers dispatch to ``sparse_fused_apply`` --
    O(nnz * H) message passing, no n^2 anywhere in the solver hot loop.

Duck-type-compatible with interp.MatrixControl (``adj``/``dadj``/
``tgrad_is_unit``); reference has no sparse path at all (its
dataset_configs.py:147-234 interpolates dense stacked [t, A] planes).
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.module import Module, static_field
from ..ops.sparse import ELL
from .paths import backward_hermite_coefficients, fill_nan_linear, _interval_index


def union_ell_pattern(
    planes: tp.Sequence[np.ndarray], max_degree: tp.Optional[int] = None
) -> np.ndarray:
    """ELL ``indices (n, K)`` covering every entry that is nonzero in ANY
    plane (host-side preprocessing). Padding slots hold ``n``."""
    mask = None
    for p in planes:
        pm = np.any(np.asarray(p) != 0.0, axis=tuple(range(np.asarray(p).ndim - 2)))
        mask = pm if mask is None else (mask | pm)
    n = mask.shape[0]
    degs = mask.sum(axis=1)
    K = int(max_degree or max(int(degs.max()) if n else 1, 1))
    indices = np.full((n, K), n, dtype=np.int32)
    for r in range(n):
        cols = np.nonzero(mask[r])[0][:K]
        indices[r, : len(cols)] = cols
    return indices


def _gather_pattern(plane: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Gather ``plane[..., i, indices[i, k]]`` with zero at padding slots."""
    plane = np.asarray(plane)
    n, K = indices.shape
    safe = np.minimum(indices, n - 1)
    rows = np.arange(n)[:, None]
    out = plane[..., rows, safe]
    out[..., indices == n] = 0.0
    return out


class SparseCubicMatrixPath(Module):
    """Hermite-cubic path over ELL values: coefficient planes ``(T-1, n, K)``."""

    ts: jax.Array
    coeffs: tuple  # (d, c, b, a), each (T-1, n, K)
    indices: jax.Array  # (n, K) int32
    n: int = static_field()

    @property
    def t0(self):
        return self.ts[0]

    @property
    def t1(self):
        return self.ts[-1]

    def evaluate(self, t: jax.Array) -> ELL:
        d, c, b, a = self.coeffs
        i = _interval_index(self.ts, t)
        tau = t - self.ts[i]
        vals = ((d[i] * tau + c[i]) * tau + b[i]) * tau + a[i]
        return ELL(self.indices, vals, self.n)

    def derivative(self, t: jax.Array) -> ELL:
        d, c, b, a = self.coeffs
        i = _interval_index(self.ts, t)
        tau = t - self.ts[i]
        vals = (3.0 * d[i] * tau + 2.0 * c[i]) * tau + b[i]
        return ELL(self.indices, vals, self.n)


class SparseLinearMatrixPath(Module):
    """Piecewise-linear path over ELL values: knots ``(T, n, K)``."""

    ts: jax.Array
    ys: jax.Array  # (T, n, K)
    indices: jax.Array
    n: int = static_field()

    @property
    def t0(self):
        return self.ts[0]

    @property
    def t1(self):
        return self.ts[-1]

    def evaluate(self, t: jax.Array) -> ELL:
        i = _interval_index(self.ts, t)
        t0, t1 = self.ts[i], self.ts[i + 1]
        w = (t - t0) / (t1 - t0)
        return ELL(self.indices, self.ys[i] + w * (self.ys[i + 1] - self.ys[i]), self.n)

    def derivative(self, t: jax.Array) -> ELL:
        i = _interval_index(self.ts, t)
        t0, t1 = self.ts[i], self.ts[i + 1]
        return ELL(self.indices, (self.ys[i + 1] - self.ys[i]) / (t1 - t0), self.n)


class SparseMatrixControl(Module):
    """Sparse adjacency control path with an implicit (analytic) time channel.

    Same contract as interp.MatrixControl, but ``adj``/``dadj`` return ELL.
    Construct host-side via :meth:`from_knots` (dense adjacency snapshots) or
    :meth:`from_stacked` (reference-layout dense coefficients, e.g. the
    trainer's cached ``*_graph_path_coeffs``).
    """

    path: Module
    tgrad_is_unit: bool = static_field()

    def __init__(self, path):
        self.path = path
        self.tgrad_is_unit = True

    @classmethod
    def from_knots(
        cls,
        ts,
        A_knots,
        interpolation: str = "cubic",
        max_degree: tp.Optional[int] = None,
    ) -> "SparseMatrixControl":
        """Build from dense adjacency snapshots ``A_knots (T, n, n)``."""
        A_knots = np.asarray(A_knots)
        n = A_knots.shape[-1]
        indices = union_ell_pattern([A_knots], max_degree)
        vals = _gather_pattern(A_knots, indices)  # (T, n, K)
        ts = jnp.asarray(ts)
        if interpolation == "linear":
            return cls(SparseLinearMatrixPath(ts, jnp.asarray(vals), jnp.asarray(indices), n))
        coeffs = backward_hermite_coefficients(ts, jnp.asarray(vals))
        return cls(SparseCubicMatrixPath(ts, tuple(coeffs), jnp.asarray(indices), n))

    @classmethod
    def from_stacked(
        cls,
        interpolation: str,
        ts,
        coeffs,
        max_degree: tp.Optional[int] = None,
    ) -> "SparseMatrixControl":
        """Build from reference-layout stacked (time, value) dense coefficients
        (the exact objects MatrixControl.from_stacked consumes): extracts the
        value channel, unions the nonzero pattern across planes and time, and
        gathers -- bit-identical to the dense path at every queried t.

        A leading batch axis (value-channel plane ndim 4, as the dyn
        trainer's vmapped
        ``train_graph_path_coeffs`` carry) is detected automatically: each
        element gets its own ELL pattern with one shared K (the batch max, so
        the stacked control vmaps), and leaves are stacked along axis 0.
        """
        ts = jnp.asarray(ts)
        if interpolation == "linear":
            planes = [np.asarray(coeffs)[..., -1]]  # (..., T, n, n)
        else:
            planes = [np.asarray(c)[..., -1] for c in coeffs]  # 4 x (..., T-1, n, n)

        if planes[0].ndim == 4:  # batched: (B, T(-1), n, n)
            B = planes[0].shape[0]
            per_elem_patterns = [
                union_ell_pattern([p[b] for p in planes], None) for b in range(B)
            ]
            K = max(pat.shape[1] for pat in per_elem_patterns)
            if max_degree is not None:
                K = max(K, max_degree)
            elems = [
                cls._build(interpolation, ts[b], [p[b] for p in planes], K)
                for b in range(B)
            ]
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *elems)
        return cls._build(interpolation, ts, planes, max_degree)

    @classmethod
    def _build(cls, interpolation, ts, planes, max_degree):
        n = planes[0].shape[-1]
        indices = union_ell_pattern(planes, max_degree)
        if interpolation == "linear":
            vals = _gather_pattern(planes[0], indices)
            return cls(SparseLinearMatrixPath(ts, jnp.asarray(vals), jnp.asarray(indices), n))
        gathered = tuple(jnp.asarray(_gather_pattern(p, indices)) for p in planes)
        return cls(SparseCubicMatrixPath(ts, gathered, jnp.asarray(indices), n))

    def adj(self, t) -> ELL:
        return self.path.evaluate(t)

    def dadj(self, t) -> ELL:
        return self.path.derivative(t)

    def evaluate(self, t) -> ELL:
        return self.path.evaluate(t)

    def derivative(self, t) -> ELL:
        return self.path.derivative(t)
