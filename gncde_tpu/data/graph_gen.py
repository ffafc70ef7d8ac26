"""Graph generators and node-reordering utilities.

Reference: src/dataset/data_tools.py (grid_8_neighbor_graph, reorderings) and
src/dataset/ode_dataset.py:142-249 (per-type generators via networkx).
networkx is used for the random families exactly as the reference does; the
grid generator is vectorised numpy instead of a Python double loop.
"""

from __future__ import annotations

import typing as tp

import numpy as np
import networkx as nx
from networkx.algorithms import community


def grid_8_neighbor_graph(N: int) -> np.ndarray:
    """NxN grid, 8-neighbour connectivity; returns dense (N^2, N^2) floats.

    Matches reference data_tools.py:8-29 (vectorised).
    """
    N = int(N)
    n = N * N
    xs, ys = np.divmod(np.arange(n), N)
    A = np.zeros((n, n), dtype=float)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nxs, nys = xs + dx, ys + dy
            ok = (nxs >= 0) & (nxs < N) & (nys >= 0) & (nys < N)
            src = np.arange(n)[ok]
            dst = (nxs * N + nys)[ok]
            A[src, dst] = 1.0
    return A


def generate_node_mapping(G: nx.Graph, type: tp.Optional[str] = None):
    if type == "degree":
        s = sorted(G.degree, key=lambda x: x[1], reverse=True)
        return {s[i][0]: i for i in range(len(s))}
    if type == "community":
        cs = list(community.greedy_modularity_communities(G))
        order = [node for c in cs for node in c]
        return {order[i]: i for i in range(len(order))}
    return None


def networkx_reorder_nodes(G: nx.Graph, type: tp.Optional[str] = None) -> nx.Graph:
    mapping = generate_node_mapping(G, type)
    if mapping is None:
        return G
    import scipy.sparse as sp

    C = nx.to_scipy_sparse_array(G, format="coo")
    new_row = np.array([mapping[x] for x in C.row], dtype=np.int32)
    new_col = np.array([mapping[x] for x in C.col], dtype=np.int32)
    new_C = sp.coo_matrix((C.data, (new_row, new_col)), shape=C.shape)
    return nx.from_scipy_sparse_array(new_C)


def _nx_adj(G: nx.Graph, layout: str) -> np.ndarray:
    G = networkx_reorder_nodes(G, layout)
    return np.asarray(nx.to_numpy_array(G), dtype=float)


def generate_graphs(
    graph_type: str,
    num_nodes: int,
    batch_size: int,
    seed: int,
    layout: str = "community",
) -> np.ndarray:
    """Batch of adjacency matrices, one graph family (ode_dataset.py:142-235).

    For ``mixed``, returns 3*batch_size graphs (grid, power_law, community
    concatenated -- reference ode_dataset.py:223-233).
    """
    N = int(np.ceil(np.sqrt(num_nodes)))

    def grid():
        A = grid_8_neighbor_graph(N)
        return np.tile(A[None], (batch_size, 1, 1))

    def random_g():
        return np.stack(
            [
                _nx_adj(nx.erdos_renyi_graph(num_nodes, 0.1, seed=seed + i), layout)
                for i in range(batch_size)
            ]
        )

    def power_law():
        return np.stack(
            [
                _nx_adj(nx.barabasi_albert_graph(num_nodes, 5, seed=seed + i), layout)
                for i in range(batch_size)
            ]
        )

    def small_world():
        return np.stack(
            [
                _nx_adj(
                    nx.newman_watts_strogatz_graph(num_nodes, 5, 0.5, seed=seed + i),
                    layout,
                )
                for i in range(batch_size)
            ]
        )

    def community_g():
        n1 = num_nodes // 3
        n2 = num_nodes // 3
        n3 = num_nodes // 4
        n4 = num_nodes - n1 - n2 - n3
        return np.stack(
            [
                _nx_adj(
                    nx.random_partition_graph([n1, n2, n3, n4], 0.25, 0.01, seed=seed + i),
                    layout,
                )
                for i in range(batch_size)
            ]
        )

    if graph_type == "grid":
        return grid()
    if graph_type == "random":
        return random_g()
    if graph_type == "power_law":
        return power_law()
    if graph_type == "small_world":
        return small_world()
    if graph_type == "community":
        return community_g()
    if graph_type == "mixed":
        return np.concatenate([grid(), power_law(), community_g()], axis=0)
    raise ValueError(f"Graph type {graph_type!r} is not supported")


def degree_laplacian(A: np.ndarray) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Batched (D, L) for adjacency batch A: (B, n, n)."""
    deg = A.sum(axis=-1)
    D = np.zeros_like(A)
    idx = np.arange(A.shape[-1])
    D[..., idx, idx] = deg
    return D, D - A
