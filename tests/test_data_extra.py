"""Counterparts of the remaining reference data-layer tests (SURVEY.md §4):
reordering isomorphism, disjoint-window invariants, rectangle sampling,
sliding-window dataset view."""

import networkx as nx
import numpy as np
import pytest

from gncde_tpu.data.graph_gen import networkx_reorder_nodes, generate_graphs
from gncde_tpu.data.misc_rect import sample_non_overlapping_rect, rects_overlap
from gncde_tpu.data.windows import (
    sample_disjoint_window_starts,
    SlidingWindowTemporalDataset,
    Snapshot,
)


def test_reordering_preserves_isomorphism():
    G = nx.erdos_renyi_graph(30, 0.2, seed=0)
    for kind in ("degree", "community", None):
        G2 = networkx_reorder_nodes(G, kind)
        assert nx.is_isomorphic(G, G2)
        assert G2.number_of_edges() == G.number_of_edges()


def test_degree_reordering_sorts_degrees():
    G = nx.barabasi_albert_graph(40, 3, seed=1)
    G2 = networkx_reorder_nodes(G, "degree")
    degs = [d for _, d in sorted(G2.degree)]
    assert all(degs[i] >= degs[i + 1] for i in range(len(degs) - 1))


def test_graph_families_shapes():
    for family in ("random", "power_law", "small_world", "community"):
        A = generate_graphs(family, 30, 2, seed=3, layout="degree")
        assert A.shape == (2, 30, 30)
        assert np.all(A >= 0)
    mixed = generate_graphs("mixed", 36, 2, seed=3)
    assert mixed.shape == (6, 36, 36)


def test_disjoint_windows_no_overlap():
    rng = np.random.default_rng(0)
    train, val, test = sample_disjoint_window_starts(50, 5, 5, [0.6, 0.2, 0.2], rng)
    all_starts = np.concatenate([train, val, test])
    assert len(set(all_starts.tolist())) == len(all_starts)
    # stride >= window => no snapshot shared between any two windows
    covered = [set(range(s, s + 5)) for s in all_starts]
    for i in range(len(covered)):
        for j in range(i + 1, len(covered)):
            assert covered[i].isdisjoint(covered[j])
    assert len(train) == int(len(all_starts) * 0.6)


def test_rect_sampling_non_overlapping():
    rng = np.random.default_rng(1)
    rects = []
    for _ in range(3):
        r = sample_non_overlapping_rect(20, 4, 4, rects, rng=rng)
        for prev in rects:
            assert not rects_overlap(r, prev)
        rects.append(r)


def test_rect_sampling_raises_when_full():
    rng = np.random.default_rng(2)
    full = [(0, 0, 10, 10)]
    with pytest.raises(RuntimeError):
        sample_non_overlapping_rect(10, 10, 10, full, max_attempts=5, rng=rng)


def test_sliding_window_dataset_view():
    snaps = [Snapshot(adj=np.zeros((2, 2)), t=float(i)) for i in range(10)]
    ds = SlidingWindowTemporalDataset(snaps, window_size=4, stride=2)
    assert len(ds) == 4
    w0 = ds[0]
    assert [s.t for s in w0] == [0.0, 1.0, 2.0, 3.0]
    w1 = ds[1]
    assert [s.t for s in w1] == [2.0, 3.0, 4.0, 5.0]
