"""Control-path interpolation for matrix-valued signals.

Native replacement for the diffrax interpolation machinery the reference uses
(``diffrax.LinearInterpolation`` / ``CubicInterpolation`` /
``backward_hermite_coefficients`` / ``linear_interpolation``; reference:
src/models/graph_neural_cde.py:79-82, src/configs/dataset_configs.py:147-234).

Semantics:
  * ``linear_interpolation(ts, ys)`` fills NaNs (missing observations, used by
    the reference's ``padding_mode="none"`` graph paths) by linear
    interpolation between observed knots, then the path is piecewise linear.
  * ``backward_hermite_coefficients(ts, ys)`` produces Hermite-cubic
    coefficients with backward-difference derivatives at the knots (the
    "cubic hermite with backward differences" scheme of Morrill et al., which
    diffrax implements): on interval i, with h = t[i+1]-t[i],

        y(t[i]+tau) = a + b*tau + c*tau^2 + d*tau^3
        a = y[i], b = f[i]
        c = (3*(y[i+1]-y[i])/h - 2*f[i] - f[i+1]) / h
        d = (f[i] + f[i+1] - 2*(y[i+1]-y[i])/h) / h^2

    where f[i] = (y[i]-y[i-1])/(t[i]-t[i-1]) and f[0] = f[1].

Coefficients are laid out time-major ``(T-1, *channel_shape)`` so an
edge-sharded channel layout shards coefficients with it (SURVEY.md section 7.1
item 3).

Evaluation uses ``searchsorted`` over the (traced) query time; everything is
static-shape and jit/vmap/scan friendly.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ..nn.module import Module, static_field


def fill_nan_linear(ts: jax.Array, ys: jax.Array) -> jax.Array:
    """Replace NaNs along axis 0 by linear interpolation between finite knots.

    Leading/trailing NaNs are filled with the nearest finite value. Matches
    the observational-missingness semantics diffrax's linear_interpolation
    applies to NaN entries.
    """
    T = ys.shape[0]
    tshape = (T,) + (1,) * (ys.ndim - 1)
    tb = ts.reshape(tshape)
    finite = jnp.isfinite(ys)

    def fwd_scan(carry, x):
        prev_val, prev_t = carry
        val, t, ok = x
        new_val = jnp.where(ok, val, prev_val)
        new_t = jnp.where(ok, t, prev_t)
        return (new_val, new_t), (new_val, new_t)

    t_full = jnp.broadcast_to(tb, ys.shape)
    init = (jnp.full(ys.shape[1:], jnp.nan), jnp.full(ys.shape[1:], ts[0]))
    _, (prev_vals, prev_ts) = jax.lax.scan(fwd_scan, init, (ys, t_full, finite))
    # Backward pass: next finite value/time at or after each index.
    _, (next_vals, next_ts) = jax.lax.scan(
        fwd_scan,
        (jnp.full(ys.shape[1:], jnp.nan), jnp.full(ys.shape[1:], ts[-1])),
        (ys[::-1], t_full[::-1], finite[::-1]),
    )
    next_vals, next_ts = next_vals[::-1], next_ts[::-1]

    denom = next_ts - prev_ts
    w = jnp.where(denom == 0, 0.0, (t_full - prev_ts) / jnp.where(denom == 0, 1.0, denom))
    interp = prev_vals + w * (next_vals - prev_vals)
    # Edge handling: if no previous finite value, use next; if none after, use prev.
    interp = jnp.where(jnp.isnan(prev_vals), next_vals, interp)
    interp = jnp.where(jnp.isnan(next_vals), prev_vals, interp)
    return jnp.where(finite, ys, interp)


def linear_interpolation(ts: jax.Array, ys: jax.Array) -> jax.Array:
    """Coefficients for :class:`LinearInterpolation` (just NaN-filled knots)."""
    return fill_nan_linear(ts, ys)


def backward_hermite_coefficients(
    ts: jax.Array, ys: jax.Array
) -> tp.Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Hermite-cubic coefficients with backward differences.

    Returns ``(d, c, b, a)`` each of shape ``(T-1, *channels)`` (the diffrax
    ordering, so cached coefficient pickles stay layout-compatible).
    """
    ys = fill_nan_linear(ts, ys)
    tdiff = ts[1:] - ts[:-1]
    tshape = (-1,) + (1,) * (ys.ndim - 1)
    h = tdiff.reshape(tshape)
    # Zero-length intervals (repeated knots -- produced by pad-to-max window
    # batching, train/windowed.py:pad_windows) inherit the PREVIOUS
    # interval's slope: the padded path extends with the end value and the
    # end derivative, so an evaluation exactly at the (unchanged) final time
    # sees the same (value, derivative) as the unpadded path -- solver
    # trajectories are bit-equivalent under padding.
    safe_h = jnp.where(h == 0, 1.0, h)
    raw_slope = (ys[1:] - ys[:-1]) / safe_h  # (T-1, ...)
    valid = jnp.broadcast_to(h != 0, raw_slope.shape)

    def _ffill(carry, x):
        s, ok = x
        out = jnp.where(ok, s, carry)
        return out, out

    _, slope = jax.lax.scan(
        _ffill, jnp.zeros_like(raw_slope[0]),
        (jnp.where(valid, raw_slope, 0.0), valid),
    )
    h = safe_h
    # Knot derivatives: f[i] = slope[i-1] (backward difference), f[0] = slope[0].
    f = jnp.concatenate([slope[:1], slope], axis=0)  # (T, ...)
    f0 = f[:-1]
    f1 = f[1:]
    a = ys[:-1]
    b = f0
    c = (3.0 * slope - 2.0 * f0 - f1) / h
    d = (f0 + f1 - 2.0 * slope) / (h * h)
    return d, c, b, a


def _interval_index(ts: jax.Array, t: jax.Array) -> jax.Array:
    """Index i such that ts[i] <= t < ts[i+1], clipped to [0, T-2]."""
    idx = jnp.searchsorted(ts, t, side="right") - 1
    return jnp.clip(idx, 0, ts.shape[0] - 2)


class LinearInterpolation(Module):
    """Piecewise-linear control path (reference: graph_neural_cde.py:80)."""

    ts: jax.Array
    ys: jax.Array

    def __init__(self, ts: jax.Array, ys: jax.Array):
        self.ts = ts
        self.ys = ys

    @property
    def t0(self):
        return self.ts[0]

    @property
    def t1(self):
        return self.ts[-1]

    def _interval(self, t: jax.Array) -> jax.Array:
        """Interval index, stepping back over zero-length (repeated-knot)
        padding intervals so evaluations at the padded end reproduce the
        unpadded path's (value, derivative) exactly
        (train/windowed.py:pad_windows)."""
        i = _interval_index(self.ts, t)
        degenerate = self.ts[i + 1] == self.ts[i]
        i_back = _interval_index(
            self.ts, jnp.nextafter(self.ts[i], self.ts[i] - 1.0)
        )
        return jnp.where(degenerate, i_back, i)

    def evaluate(self, t: jax.Array) -> jax.Array:
        i = self._interval(t)
        t0 = self.ts[i]
        t1 = self.ts[i + 1]
        h = jnp.where(t1 == t0, 1.0, t1 - t0)  # all-equal-knot degenerate path
        w = jnp.where(t1 == t0, 0.0, (t - t0) / h)
        return self.ys[i] + w * (self.ys[i + 1] - self.ys[i])

    def derivative(self, t: jax.Array) -> jax.Array:
        i = self._interval(t)
        t0 = self.ts[i]
        t1 = self.ts[i + 1]
        h = jnp.where(t1 == t0, 1.0, t1 - t0)
        scale = jnp.where(t1 == t0, 0.0, 1.0 / h)
        return (self.ys[i + 1] - self.ys[i]) * scale


class MatrixControl(Module):
    """Slim adjacency control path with an implicit time channel.

    The reference stores the control as ``stack([t, A], -1)`` and evaluates
    BOTH channels each vf call even though the time channel is analytic
    (its value is t and its derivative is exactly 1 under both linear and
    backward-Hermite interpolation of a linear signal). This wrapper slices
    the adjacency channel out of reference-layout coefficients ONCE at model
    entry, halving coefficient gather traffic per solver step -- the hot-loop
    bottleneck is coefficient reads (SURVEY.md section 3.5).

    Duck-typed: vector fields probe for ``adj``/``dadj``/``tgrad_is_unit``.

    ``red`` optionally caches per-plane reduced stacks
    (:class:`gncde_tpu.ops.pallas.tiled.PlaneReductions`) so the tiled
    large-n kernel gets its O(n) row/col/diag sums without re-reading the
    full planes each vf eval; populated by ``models.continuous.make_control``
    for graphs above the whole-VMEM megakernel cap.
    """

    path: Module
    red: tp.Optional[tuple]
    tgrad_is_unit: bool = static_field()

    def __init__(self, path, red=None):
        self.path = path
        self.red = red
        self.tgrad_is_unit = True

    @classmethod
    def from_stacked(cls, interpolation: str, ts, coeffs):
        """Build from reference-layout stacked (time, value) coefficients."""
        if interpolation == "linear":
            return cls(LinearInterpolation(ts, coeffs[..., -1]))
        return cls(CubicInterpolation(ts, tuple(c[..., -1] for c in coeffs)))

    def adj(self, t):
        return self.path.evaluate(t)

    def dadj(self, t):
        return self.path.derivative(t)

    # Reference-compatible API (value channel only, no time channel).
    def evaluate(self, t):
        return self.path.evaluate(t)

    def derivative(self, t):
        return self.path.derivative(t)


class CubicInterpolation(Module):
    """Hermite-cubic control path (reference: graph_neural_cde.py:82).

    ``coeffs`` is the ``(d, c, b, a)`` tuple from
    :func:`backward_hermite_coefficients`.
    """

    ts: jax.Array
    coeffs: tuple

    def __init__(self, ts: jax.Array, coeffs):
        self.ts = ts
        self.coeffs = tuple(coeffs)

    @property
    def t0(self):
        return self.ts[0]

    @property
    def t1(self):
        return self.ts[-1]

    def evaluate(self, t: jax.Array) -> jax.Array:
        d, c, b, a = self.coeffs
        i = _interval_index(self.ts, t)
        tau = t - self.ts[i]
        return ((d[i] * tau + c[i]) * tau + b[i]) * tau + a[i]

    def derivative(self, t: jax.Array) -> jax.Array:
        d, c, b, a = self.coeffs
        i = _interval_index(self.ts, t)
        tau = t - self.ts[i]
        return (3.0 * d[i] * tau + 2.0 * c[i]) * tau + b[i]
