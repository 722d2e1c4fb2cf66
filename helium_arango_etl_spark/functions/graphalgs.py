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
    out_weight = np.zeros(n)
    np.add.at(out_weight, src, w)
    dangling = out_weight == 0.0
    # row-stochastic transition: weight / total out-weight of the source
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(out_weight[src] > 0, w / out_weight[src], 0.0)

    x = np.full(n, 1.0 / n)
    teleport = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        xlast = x
        contrib = np.zeros(n)
        np.add.at(contrib, dst, alpha * xlast[src] * p)
        danglesum = alpha * xlast[dangling].sum()
        x = contrib + (danglesum + (1.0 - alpha)) * teleport
        if np.abs(x - xlast).sum() < n * tol:
            break
    return {node: float(x[idx[node]]) for node in order}


def betweenness_centrality(edges: list[tuple[str, str, float]]) -> dict[str, float]:
    """Unweighted, normalized betweenness centrality (Brandes 2001) on the
    directed graph — exactly ``nx.betweenness_centrality(g)`` defaults."""
    order, idx, n, arc_weight = _build(edges)
    if n == 0:
        return {}
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in arc_weight:
        adj[idx[u]].append(idx[v])
    for nbrs in adj:
        nbrs.sort()

    bc = np.zeros(n)
    for s in range(n):
        # single-source shortest paths (BFS)
        stack: list[int] = []
        preds: list[list[int]] = [[] for _ in range(n)]
        sigma = np.zeros(n)
        sigma[s] = 1.0
        dist = np.full(n, -1)
        dist[s] = 0
        queue = [s]
        head = 0
        while head < len(queue):
            v = queue[head]
            head += 1
            stack.append(v)
            for wv in adj[v]:
                if dist[wv] < 0:
                    dist[wv] = dist[v] + 1
                    queue.append(wv)
                if dist[wv] == dist[v] + 1:
                    sigma[wv] += sigma[v]
                    preds[wv].append(v)
        # accumulation
        delta = np.zeros(n)
        for v in reversed(stack):
            for u in preds[v]:
                delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
            if v != s:
                bc[v] += delta[v]
    if n > 2:
        bc *= 1.0 / ((n - 1) * (n - 2))
    else:
        bc[:] = 0.0
    return {node: float(bc[idx[node]]) for node in order}
