"""Native graph algorithms for per-group (per-city) metrics.

The reference runs networkx inside each worker process
(arango_queries.py:161-167):

    g = nx.DiGraph(); g.add_weighted_edges_from(edges)   # weight = distance_m
    bc = nx.betweenness_centrality(g)                    # unweighted, normalized
    pg = nx.pagerank(g)                                  # alpha=.85, weight='weight'

networkx is not a dependency here; these are faithful reimplementations of
the exact algorithms + defaults the reference invokes, over plain numpy:

- :func:`pagerank` — power iteration on the weight-normalized transition
  matrix, uniform teleport, dangling mass redistributed uniformly,
  tol = 1e-6 * N on L1 error, max 100 iterations (networkx semantics).
- :func:`betweenness_centrality` — Brandes' algorithm, unweighted BFS,
  normalized by 1/((n-1)(n-2)) for directed graphs (networkx default
  ``normalized=True``; no endpoint counting).

Both operate on an edge list and are deterministic: nodes are processed in
sorted order, duplicate (src,dst) edges collapse last-wins exactly like
``DiGraph.add_weighted_edges_from``.

City subgraphs are small (hundreds of nodes), so O(V·E) Brandes inside an
Arrow-batched ``applyInPandas`` group is the right scale split: Spark
shuffles/groups the 100 TB edge set; Python only ever sees one city.
"""

from __future__ import annotations

import numpy as np


def _build(edges: list[tuple[str, str, float]]):
    """Collapse duplicate arcs last-wins and index nodes in first-seen order
    (networkx node order is insertion order; metrics are order-independent,
    we sort only for float determinism)."""
    arc_weight: dict[tuple[str, str], float] = {}
    nodes: dict[str, int] = {}
    for u, v, w in edges:
        if u not in nodes:
            nodes[u] = len(nodes)
        if v not in nodes:
            nodes[v] = len(nodes)
        arc_weight[(u, v)] = float(w)
    order = sorted(nodes)
    idx = {n: i for i, n in enumerate(order)}
    n = len(order)
    return order, idx, n, arc_weight


def pagerank(
    edges: list[tuple[str, str, float]],
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1.0e-6,
) -> dict[str, float]:
    """Weighted PageRank with networkx-default semantics."""
    order, idx, n, arc_weight = _build(edges)
    if n == 0:
        return {}
    src = np.fromiter((idx[u] for (u, v) in arc_weight), dtype=np.int64, count=len(arc_weight))
    dst = np.fromiter((idx[v] for (u, v) in arc_weight), dtype=np.int64, count=len(arc_weight))
    w = np.fromiter(arc_weight.values(), dtype=np.float64, count=len(arc_weight))
    # bincount is the fast scatter-add: np.add.at is unbuffered and ~10x
    # slower on the per-iteration hot path of these power iterations
    out_weight = np.bincount(src, weights=w, minlength=n)
    dangling = out_weight == 0.0
    # row-stochastic transition: weight / total out-weight of the source
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(out_weight[src] > 0, w / out_weight[src], 0.0)

    x = np.full(n, 1.0 / n)
    teleport = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        xlast = x
        contrib = np.bincount(dst, weights=alpha * xlast[src] * p, minlength=n)
        danglesum = alpha * xlast[dangling].sum()
        x = contrib + (danglesum + (1.0 - alpha)) * teleport
        if np.abs(x - xlast).sum() < n * tol:
            break
    return {node: float(x[idx[node]]) for node in order}


def betweenness_centrality(
    edges: list[tuple[str, str, float]],
    max_exact_nodes: int = 1500,
    sample_sources: int = 256,
) -> dict[str, float]:
    """Unweighted, normalized betweenness centrality (Brandes 2001) on the
    directed graph — exactly ``nx.betweenness_centrality(g)`` defaults for
    graphs up to ``max_exact_nodes``.

    Above that, the estimator of Brandes/Pich (2007): run the single-source
    phase from a deterministic stride-sample of ``sample_sources`` sources
    and scale by n/k.  Exact Brandes is O(V·E) — fine for the reference's
    hundreds-of-nodes city graphs, unbounded at 100 TB where one city can
    hold millions of vertices; sampling bounds per-group work at O(k·E)
    while keeping the estimate unbiased.  Deterministic sample -> stable
    hashes across runs.
    """
    order, idx, n, arc_weight = _build(edges)
    if n == 0:
        return {}
    src_arr = np.fromiter((idx[u] for (u, v) in arc_weight), dtype=np.int64, count=len(arc_weight))
    dst_arr = np.fromiter((idx[v] for (u, v) in arc_weight), dtype=np.int64, count=len(arc_weight))

    if n > max_exact_nodes:
        stride = max(1, n // sample_sources)
        sources = range(0, n, stride)
        scale_up = n / len(sources)
    else:
        sources = range(n)
        scale_up = 1.0

    # level-synchronous Brandes: per BFS level, process all frontier edges as
    # one vectorized mask over the edge arrays — O(E·diameter) numpy work per
    # source instead of per-edge Python.
    bc = np.zeros(n)
    for s in sources:
        sigma = np.zeros(n)
        sigma[s] = 1.0
        dist = np.full(n, -1, dtype=np.int64)
        dist[s] = 0
        level = 0
        while True:
            on_level = dist[src_arr] == level
            if not on_level.any():
                break
            tgt = dst_arr[on_level]
            fresh = tgt[dist[tgt] < 0]
            dist[fresh] = level + 1
            step = on_level & (dist[dst_arr] == level + 1)
            np.add.at(sigma, dst_arr[step], sigma[src_arr[step]])
            level += 1
        # reverse accumulation over the same level structure
        delta = np.zeros(n)
        for lv in range(level - 1, -1, -1):
            step = (dist[src_arr] == lv) & (dist[dst_arr] == lv + 1)
            sv, dv = src_arr[step], dst_arr[step]
            np.add.at(delta, sv, sigma[sv] / sigma[dv] * (1.0 + delta[dv]))
        delta[s] = 0.0
        mask = dist >= 0
        mask[s] = False
        bc[mask] += delta[mask]
    bc *= scale_up
    if n > 2:
        bc *= 1.0 / ((n - 1) * (n - 2))
    else:
        bc[:] = 0.0
    return {node: float(bc[idx[node]]) for node in order}


def hits(
    edges: list[tuple[str, str, float]],
    max_iter: int = 100,
    tol: float = 1.0e-8,
) -> tuple[dict[str, float], dict[str, float]]:
    """HITS hub/authority scores (J5 — the reference reserves the columns but
    leaves ``nx.algorithms.hits(g)`` commented out, arango_queries.py:168;
    implemented here so the capability exists).  Power iteration with
    networkx semantics: unweighted adjacency, per-iteration max-normalization,
    final sum-normalization, convergence on L1 hub error."""
    order, idx, n, arc_weight = _build(edges)
    if n == 0:
        return {}, {}
    src = np.fromiter((idx[u] for (u, v) in arc_weight), dtype=np.int64, count=len(arc_weight))
    dst = np.fromiter((idx[v] for (u, v) in arc_weight), dtype=np.int64, count=len(arc_weight))
    h = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        hlast = h
        a = np.bincount(dst, weights=hlast[src], minlength=n)
        amax = a.max()
        if amax > 0:
            a /= amax
        h = np.bincount(src, weights=a[dst], minlength=n)
        hmax = h.max()
        if hmax > 0:
            h /= hmax
        if np.abs(h - hlast).sum() < tol:
            break
    hsum, asum = h.sum(), a.sum()
    if hsum > 0:
        h /= hsum
    if asum > 0:
        a /= asum
    return (
        {node: float(h[idx[node]]) for node in order},
        {node: float(a[idx[node]]) for node in order},
    )
