"""Collective-traffic accounting from jaxprs.

``collective_volume(fn, *args)`` traces ``fn`` and walks the jaxpr
(recursing into shard_map/pjit/scan/while/cond/custom-vjp sub-jaxprs)
collecting every collective primitive with its payload size. Scan bodies are
weighted by trip count; while-loop bodies are counted ONCE per iteration
flag (trip counts are data-dependent) -- callers auditing a solver step
should audit the vf apply, not the whole solve.

Used by the weak-scaling dress rehearsal (benchmarks/scaling.py) and the
halo-volume regression test: the banded halo path must move O(halo * H)
bytes per shard per layer where the all-gather path moves O(n * H)
(BASELINE.md north star: scaling rides ICI neighbour traffic).
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np

_COLLECTIVES = {
    "ppermute",
    "psum",
    "psum2",
    "all_gather",
    "all_to_all",
    "psum_scatter",
    "reduce_scatter",
    "pmin",
    "pmax",
    "pmean",
}


class CollectiveRecord(tp.NamedTuple):
    primitive: str
    shape: tuple
    bytes_per_device: int
    multiplier: int  # static trip-count weight (scan length product)


def _avals_bytes(avals) -> tp.Tuple[tuple, int]:
    total = 0
    shapes = []
    for a in avals:
        if hasattr(a, "shape") and hasattr(a, "dtype"):
            total += int(np.prod(a.shape, dtype=np.int64)) * a.dtype.itemsize
            shapes.append(tuple(a.shape))
    return (shapes[0] if len(shapes) == 1 else tuple(shapes)), total


def _walk(jaxpr, mult: int, out: tp.List[CollectiveRecord]) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _COLLECTIVES:
            # Payload = operand avals (what rides the interconnect).
            shape, nbytes = _avals_bytes([v.aval for v in eqn.invars])
            out.append(CollectiveRecord(name, shape, nbytes, mult))
        for pname, p in eqn.params.items():
            sub_mult = mult
            if name == "scan" and pname == "jaxpr":
                sub_mult = mult * int(eqn.params.get("length", 1))
            for sub in _sub_jaxprs(p):
                _walk(sub, sub_mult, out)


def _sub_jaxprs(p):
    if isinstance(p, jax.extend.core.Jaxpr):
        yield p
    elif isinstance(p, jax.extend.core.ClosedJaxpr):
        yield p.jaxpr
    elif isinstance(p, (tuple, list)):
        for x in p:
            yield from _sub_jaxprs(x)
    elif callable(p) and hasattr(p, "jaxpr"):  # lu.WrappedFun etc: skip
        return


def collective_volume(fn, *args, **kwargs) -> tp.List[CollectiveRecord]:
    """Trace ``fn(*args, **kwargs)`` and return every collective with its
    per-device payload bytes and static trip-count multiplier."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    out: tp.List[CollectiveRecord] = []
    _walk(jaxpr.jaxpr, 1, out)
    return out


def total_bytes(records: tp.Iterable[CollectiveRecord],
                primitives: tp.Optional[tp.Container[str]] = None) -> int:
    """Sum weighted payload bytes, optionally filtered by primitive name."""
    return sum(
        r.bytes_per_device * r.multiplier
        for r in records
        if primitives is None or r.primitive in primitives
    )
