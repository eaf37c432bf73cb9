#!/usr/bin/env python3
"""Generate committed golden fixtures for the graph algorithms.

Oracle semantics = the reference's igraph call
(src/hipporag/HippoRAG.py:1736-1743: personalized_pagerank, undirected,
weighted, reset vector, all vertices), reproduced with networkx
`pagerank` (pure-python `_pagerank_python`; scipy absent in this sandbox).

The directed edge rows below replay the reference's `node_to_node_stats`
dict shape (HippoRAG.py:894-1017): fact edges appear in BOTH directions
(parallel undirected edges in igraph → summed weight), synonymy/passage
edges in one. The golden builder symmetrizes exactly like
graft.graph.Adjacency.symmetrize: W(u,v) = sum over all directed rows
between u and v, both orders.

Run: python3 scripts/gen_goldens.py   (writes src/test/resources/goldens/)
"""
import json
import os
import random

import networkx as nx

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "goldens")


def build_graph(n, directed_rows):
    W = {}
    for s, d, w in directed_rows:
        key = (min(s, d), max(s, d))
        W[key] = W.get(key, 0.0) + float(w)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    for (u, v), w in W.items():
        if u != v:
            G.add_edge(u, v, weight=w)
    return G


def ppr(G, damping, seeds):
    person = {v: 0.0 for v in G.nodes}
    for vid, w in seeds:
        # reference sanitize: NaN/negative -> 0 (HippoRAG.py:1735)
        if w > 0:
            person[vid] += w
    # nx.pagerank dispatches to scipy (absent here); call the pure-python
    # power iteration directly — same semantics, same convergence test.
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python
    return _pagerank_python(G, alpha=damping, personalization=person,
                            tol=1e-13, max_iter=10000, weight="weight")


def sync_lpa(G, n, max_iter=20):
    """Synchronous weighted LPA, tie-break = min label (engine contract)."""
    labels = list(range(n))
    for _ in range(max_iter):
        new = labels[:]
        changed = False
        for v in range(n):
            votes = {}
            for u in G.neighbors(v):
                w = G[u][v]["weight"]
                votes[labels[u]] = votes.get(labels[u], 0.0) + w
            if votes:
                best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                if best != labels[v]:
                    changed = True
                new[v] = best
        labels = new
        if not changed:
            break
    return labels


def components(G, n):
    comp = list(range(n))
    for c in nx.connected_components(G):
        m = min(c)
        for v in c:
            comp[v] = m
    return comp


def fixture(name, n, directed_rows, queries, dampings=(0.5, 0.85)):
    G = build_graph(n, directed_rows)
    out = {
        "name": name,
        "nVertices": n,
        "edges": [[int(s), int(d), float(w)] for s, d, w in directed_rows],
        "ppr": [],
        "cc": components(G, n),
        "lpa": sync_lpa(G, n),
        "triangles": {
            "total": int(sum(nx.triangles(G).values()) // 3),
            "perVertex": [int(nx.triangles(G, v)) for v in range(n)],
        },
    }
    for damping in dampings:
        for qid, seeds in enumerate(queries):
            scores = ppr(G, damping, seeds)
            out["ppr"].append({
                "qid": qid,
                "damping": damping,
                "seeds": [[int(v), float(w)] for v, w in seeds],
                "scores": [scores[v] for v in range(n)],
            })
    path = os.path.join(OUT, f"{name}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}: |V|={n} |E_directed|={len(directed_rows)} "
          f"queries={len(queries)} tri={out['triangles']['total']}")


def main():
    os.makedirs(OUT, exist_ok=True)

    # --- smoke: hand-written, exercises every edge case -------------------
    # fact edges both directions (parallel-edge weight doubling), a synonymy
    # one-direction edge, a passage edge, isolated vertices 7 (seeded) and
    # 8 (unseeded), a triangle 0-1-2.
    rows = [
        (0, 1, 1.0), (1, 0, 1.0),      # fact pair -> W(0,1)=2
        (0, 2, 2.0), (2, 0, 2.0),      # fact pair counted twice -> W=4
        (1, 2, 1.0),                   # synonymy-style single direction
        (3, 2, 1.0), (2, 3, 1.0),      # fact pair
        (4, 5, 0.8),                   # synonymy
        (6, 0, 1.0),                   # passage chunk 6 -> entity 0
    ]
    queries = [
        [(0, 1.0)],
        [(0, 0.5), (7, 0.5)],          # mass on isolated vertex: dangling path
        [(v, 1.0) for v in range(9)],  # uniform
        [(3, 0.2), (5, 0.05), (6, 1.5)],
    ]
    fixture("smoke", 9, rows, queries)

    # --- zipf: random power-law-ish graph, hub-heavy ----------------------
    rnd = random.Random(7)
    n = 120
    rows = []
    for _ in range(900):
        # Zipf-ish endpoint choice: favor small ids (hubs)
        u = min(int(rnd.paretovariate(1.1)) - 1, n - 1)
        v = rnd.randrange(n)
        if u == v:
            continue
        w = rnd.choice([1.0, 1.0, 2.0, 0.9])
        rows.append((u, v, w))
        if rnd.random() < 0.5:
            rows.append((v, u, w))     # some pairs doubled like fact edges
    queries = [
        [(0, 1.0)],
        [(5, 0.3), (17, 0.7)],
        [(v, 1.0 / 7) for v in range(0, n, 17)],
    ]
    fixture("zipf", n, rows, queries)

    # --- chain+clusters: long diameter for CC iteration depth -------------
    rows = []
    for i in range(0, 40 - 1):
        rows.append((i, i + 1, 1.0))
    # two cliques, disconnected from the chain
    for base in (40, 50):
        for i in range(base, base + 8):
            for j in range(i + 1, base + 8):
                rows.append((i, j, 1.0))
    queries = [[(0, 1.0)], [(45, 1.0)]]
    fixture("chain", 60, rows, queries)


if __name__ == "__main__":
    main()
