"""Numpy graph utilities.

Capability parity with the reference's graph toolbox
(/root/reference/utils/graphUtils/graphTools.py) — the host-side (dataset
generation / analysis) complement to the jit-able ops in ``ops.gso``:

- ``adjacency_to_laplacian`` (:43), ``normalize_adjacency`` (:64),
  ``normalize_laplacian``, ``compute_gft`` (:110), ``matrix_powers`` (:151),
  ``compute_neighborhood`` (:218), ``is_connected`` (:396 — here via exact
  boolean reachability instead of the eigendecomposition),
  ``sparsify_graph`` (:425), graph generators (:516 ``createGraph``: SBM,
  small-world, geometric), the ``Graph`` container class (:1027), node
  orderings ``perm_identity``/``perm_degree``/``perm_spectral_proxies``/
  ``perm_eds`` (:824-996), ``edge_fail_sampling`` (:997), and the
  graclus/metis multilevel coarsening pipeline ``coarsen``/
  ``perm_coarsening`` (:1171-1448) for graph-pooling experiments.
"""
from __future__ import annotations

import numpy as np


def adjacency_to_laplacian(w: np.ndarray) -> np.ndarray:
    return np.diag(w.sum(axis=1)) - w


def normalize_adjacency(w: np.ndarray) -> np.ndarray:
    """D^-1/2 W D^-1/2 with zero-degree guard."""
    deg = w.sum(axis=1)
    zero = np.abs(deg) < 1e-9
    inv = np.where(zero, 0.0, 1.0 / np.sqrt(np.where(zero, 1.0, deg)))
    return w * inv[:, None] * inv[None, :]


def normalize_laplacian(lap: np.ndarray) -> np.ndarray:
    deg = np.diag(lap)
    zero = np.abs(deg) < 1e-9
    inv = np.where(zero, 0.0, 1.0 / np.sqrt(np.where(zero, 1.0, deg)))
    return lap * inv[:, None] * inv[None, :]


def compute_gft(s: np.ndarray, order: str = "increasing"):
    """(eigenvalues, eigenvectors) of a symmetric GSO, ordered by
    ``increasing`` eigenvalue or by ``totalVariation`` (|λ - λ_max|)."""
    e, v = np.linalg.eigh(0.5 * (s + s.T))
    if order == "totalVariation":
        idx = np.argsort(np.abs(e - e.max()))
        e, v = e[idx], v[:, idx]
    return e, v


def matrix_powers(s: np.ndarray, k: int) -> np.ndarray:
    """[K, N, N] stack of S^0..S^{K-1}."""
    n = s.shape[0]
    out = np.zeros((k, n, n), s.dtype)
    out[0] = np.eye(n)
    for i in range(1, k):
        out[i] = out[i - 1] @ s
    return out


def compute_neighborhood(s: np.ndarray, k: int) -> list[list[int]]:
    """k-hop neighborhoods (including self) per node."""
    n = s.shape[0]
    reach = np.eye(n, dtype=bool)
    adj = s != 0
    acc = reach.copy()
    for _ in range(k):
        reach = adj @ reach
        acc |= reach
    return [sorted(np.nonzero(acc[:, i])[0].tolist()) for i in range(n)]


def is_connected(w: np.ndarray) -> bool:
    n = w.shape[0]
    if n <= 1:
        return True
    reach = ((w + w.T) > 0) | np.eye(n, dtype=bool)
    for _ in range(max(1, (n - 1).bit_length())):
        reach = reach @ reach
    return bool(reach[0].all())


def sparsify_graph(w: np.ndarray, kind: str, p: float) -> np.ndarray:
    """'threshold': drop |edges| below p; 'NN': keep each node's p strongest
    neighbors (symmetrized)."""
    w = w.copy()
    if kind == "threshold":
        w[np.abs(w) < p] = 0.0
    elif kind == "NN":
        k = int(p)
        keep = np.zeros_like(w, dtype=bool)
        for i in range(w.shape[0]):
            idx = np.argsort(-np.abs(w[i]))[:k]
            keep[i, idx] = True
        keep |= keep.T
        w[~keep] = 0.0
    else:
        raise ValueError(kind)
    return w


def create_graph(kind: str, n: int, rng: np.random.RandomState | None = None,
                 **kw) -> np.ndarray:
    """Graph generators (reference createGraph :516): 'SBM' (communities,
    p_intra/p_inter), 'smallWorld' (ring + rewiring p, k neighbors),
    'geometric' (2D radius graph, radius r)."""
    rng = rng or np.random.RandomState()
    if kind == "SBM":
        c = kw.get("communities", 2)
        p_in, p_out = kw.get("p_intra", 0.8), kw.get("p_inter", 0.1)
        labels = np.arange(n) % c
        same = labels[:, None] == labels[None, :]
        prob = np.where(same, p_in, p_out)
        w = (rng.rand(n, n) < prob).astype(np.float64)
        w = np.triu(w, 1)
        return w + w.T
    if kind == "smallWorld":
        k = kw.get("k", 2)
        p = kw.get("p", 0.1)
        w = np.zeros((n, n))
        for i in range(n):
            for j in range(1, k + 1):
                w[i, (i + j) % n] = 1
        w = np.maximum(w, w.T)
        for i, j in zip(*np.nonzero(np.triu(w, 1))):
            if rng.rand() < p:
                w[i, j] = w[j, i] = 0
                new = rng.randint(n)
                if new != i:
                    w[i, new] = w[new, i] = 1
        return w
    if kind == "geometric":
        r = kw.get("radius", 0.3)
        pts = rng.rand(n, 2)
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        w = (d < r).astype(np.float64)
        np.fill_diagonal(w, 0)
        return w
    raise ValueError(kind)


def _permute_gso(s: np.ndarray, order: np.ndarray) -> np.ndarray:
    """Apply a node ordering to a [N, N] or [E, N, N] GSO."""
    if s.ndim == 2:
        return s[np.ix_(order, order)]
    return s[:, order][:, :, order]


def _mean_gso(s: np.ndarray) -> np.ndarray:
    """Collapse an [E, N, N] multi-edge GSO to [N, N] (mean over E), the
    reference's convention for the score-based orderings."""
    return s if s.ndim == 2 else s.mean(axis=0)


def perm_identity(s: np.ndarray) -> tuple[np.ndarray, list[int]]:
    """Identity node ordering (graphTools.py:824)."""
    n = s.shape[-1]
    return s.copy(), list(range(n))


def perm_degree(s: np.ndarray) -> tuple[np.ndarray, list[int]]:
    """Order nodes by decreasing degree (graphTools.py:854)."""
    deg = _mean_gso(np.abs(s)).sum(axis=1)
    order = np.argsort(-deg, kind="stable")
    return _permute_gso(s, order), order.tolist()


def perm_spectral_proxies(s: np.ndarray, k: int = 8) -> tuple[np.ndarray, list[int]]:
    """Order nodes by the greedy spectral-proxies sampling score
    (graphTools.py:888): repeatedly pick the node with the largest squared
    entry of the minimum-eigenvalue eigenvector of ((S^T)^k S^k) restricted
    to the not-yet-chosen nodes."""
    simple = _mean_gso(s)
    n = simple.shape[0]
    sk = np.linalg.matrix_power(simple, k)
    m = np.linalg.matrix_power(simple.conj().T, k) @ sk  # (S^T)^k S^k
    chosen: list[int] = []
    remaining = list(range(n))
    while remaining:
        sub = m[np.ix_(remaining, remaining)]
        vals, vecs = np.linalg.eig(sub)
        phi = vecs[:, np.argmin(vals.real)]
        chosen.append(remaining.pop(int(np.argmax(np.abs(phi) ** 2))))
    return _permute_gso(s, np.asarray(chosen)), chosen


def perm_eds(s: np.ndarray) -> tuple[np.ndarray, list[int]]:
    """Order nodes by the experimentally-designed-sampling score
    (graphTools.py:948): descending max-|eigenvector-entry|^2 per node."""
    _, vecs = np.linalg.eig(_mean_gso(s))
    kappa2 = np.max(np.abs(vecs), axis=1) ** 2
    order = np.flip(np.argsort(kappa2))
    return _permute_gso(s, order), order.tolist()


def edge_fail_sampling(w: np.ndarray, p: float,
                       rng: np.random.RandomState | None = None) -> np.ndarray:
    """Delete each edge independently with probability ``p``
    (graphTools.py:997-1024 ``edgeFailSampling``): the keep mask covers the
    FULL matrix (diagonal included), directed edges fail independently, and
    an undirected input is re-symmetrized from its masked upper triangle
    (including the reference's quirk of summing the diagonal twice — moot
    for self-loop-free adjacencies)."""
    assert 0 <= p <= 1
    rng = rng or np.random.RandomState()
    n = w.shape[0]
    undirected = np.allclose(w, w.T, atol=1e-9)
    keep = (rng.rand(n, n) > p).astype(w.dtype)
    w = w * keep
    if undirected:
        w = np.triu(w)
        w = w + w.T
    return w


def _graclus_match(w: np.ndarray, visit: np.ndarray,
                   node_weights: np.ndarray) -> np.ndarray:
    """One greedy graclus matching pass over a dense weighted adjacency.

    Visits nodes in ``visit`` order; each unmatched node pairs with the
    unmatched neighbor maximizing the normalized-cut gain
    ``w_ij * (1/d_i + 1/d_j)`` (the reference's graclus weighting,
    graphTools.py:1322-1345), or stays a singleton if it has none.
    Returns [N] cluster ids, contiguous from 0; every cluster has 1-2 nodes.
    """
    n = w.shape[0]
    cluster = np.full(n, -1, np.int64)
    inv = np.where(node_weights > 1e-12, 1.0 / np.maximum(node_weights, 1e-12), 0.0)
    next_id = 0
    for i in visit:
        if cluster[i] >= 0:
            continue
        cluster[i] = next_id
        gains = w[i] * (inv[i] + inv)
        gains[cluster >= 0] = 0.0  # matched (incl. self) are unavailable
        j = int(np.argmax(gains))
        if gains[j] > 0.0:
            cluster[j] = next_id
        next_id += 1
    return cluster


def coarsen(w: np.ndarray, levels: int,
            rng: np.random.RandomState | None = None,
            self_connections: bool = False):
    """Multilevel graclus coarsening with binary-tree node ordering
    (capability parity with the reference ``coarsen``/``metis``/
    ``compute_perm``/``perm_adjacency``, graphTools.py:1171-1448).

    Returns ``(graphs, order)``:

    - ``graphs[l]`` is the level-``l`` adjacency (dense float64); level 0 is
      the input graph PADDED with isolated fake nodes and reordered so that
      nodes ``2i`` and ``2i+1`` at level ``l`` are the children of node ``i``
      at level ``l+1`` — i.e. graph pooling becomes a plain stride-2 1D max
      pool over the node axis. ``graphs[l]`` has ``M0 / 2**l`` nodes where
      ``M0 = len(order)``.
    - ``order`` is the level-0 node ordering: position ``k`` holds original
      node ``order[k]``, or a fake (``order[k] >= N``) zero-padded slot.

    Coarse edge weights are the sums of fine edge weights between clusters;
    self-loops created by contraction are dropped unless
    ``self_connections``.
    """
    rng = rng or np.random.RandomState()
    w = np.asarray(w, np.float64)
    fine = [w]
    parents: list[np.ndarray] = []
    visit = rng.permutation(w.shape[0])  # random first visit (graclus style)
    cur = w
    for _ in range(levels):
        deg = cur.sum(axis=0)
        cluster = _graclus_match(cur, visit, deg)
        parents.append(cluster)
        m = int(cluster.max()) + 1
        # contract: W'[a,b] = sum over i in a, j in b of W[i,j]
        pool = np.zeros((m, cur.shape[0]))
        pool[cluster, np.arange(cur.shape[0])] = 1.0
        nxt = pool @ cur @ pool.T
        if not self_connections:
            np.fill_diagonal(nxt, 0.0)
        fine.append(nxt)
        # next visit order: ascending coarse degree (reference :1286-1288)
        visit = np.argsort(nxt.sum(axis=0), kind="stable")
        cur = nxt

    # Binary-tree orderings, coarsest -> finest. At the coarsest level the
    # order is the identity; walking down, each coarse slot expands to its
    # <=2 children, topped up with fresh fake ids so every slot has exactly 2.
    orders: list[list[int]] = [list(range(fine[-1].shape[0]))]
    for parent in reversed(parents):
        n_real = len(parent)
        fake = n_real
        children: list[list[int]] = [[] for _ in range(int(parent.max()) + 1)]
        for node, p in enumerate(parent):
            children[p].append(node)
        layer: list[int] = []
        for slot in orders[-1]:
            kids = children[slot] if slot < len(children) else []
            while len(kids) < 2:
                kids = kids + [fake]
                fake += 1
            layer.extend(kids)
        orders.append(layer)
    orders.reverse()  # orders[l] now belongs to level l

    graphs: list[np.ndarray] = []
    for lvl, g in enumerate(fine):
        order = np.asarray(orders[lvl])
        n = g.shape[0]
        out = np.zeros((len(order), len(order)))
        slots = np.nonzero(order < n)[0]  # fake slots stay isolated zeros
        out[np.ix_(slots, slots)] = g[np.ix_(order[slots], order[slots])]
        graphs.append(out)
    return graphs, orders[0]


def perm_coarsening(x: np.ndarray, order: list[int] | np.ndarray,
                    node_axis: int = -1) -> np.ndarray:
    """Reorder (and fake-pad with zeros) a signal's node axis to match a
    ``coarsen`` ordering (reference ``permCoarsening``, graphTools.py:1420).
    Fake slots stay 0 so stride-2 max pooling picks the real singleton."""
    order = np.asarray(order)
    x = np.moveaxis(np.asarray(x), node_axis, -1)
    n = x.shape[-1]
    out = np.zeros(x.shape[:-1] + (len(order),), x.dtype)
    real = order < n
    out[..., np.nonzero(real)[0]] = x[..., order[real]]
    return np.moveaxis(out, -1, node_axis)


class Graph:
    """Container bundling a GSO with its derived operators (reference Graph
    class, graphTools.py:1027)."""

    def __init__(self, w: np.ndarray):
        self.W = np.asarray(w, np.float64)
        self.N = w.shape[0]
        self.A = (self.W != 0).astype(np.float64)
        self.L = adjacency_to_laplacian(self.W)
        self.S = normalize_adjacency(self.W)
        self.E, self.V = compute_gft(self.S)

    def degree(self) -> np.ndarray:
        return self.W.sum(axis=1)

    def is_connected(self) -> bool:
        return is_connected(self.W)
