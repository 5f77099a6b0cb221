"""PageRank: numpy power-iteration equivalence on the real graph, mass
conservation, and behavior on shapes (dangling nodes, symmetry)."""

from __future__ import annotations

import numpy as np

from simplex_mapreduce_spark import registry
from simplex_mapreduce_spark.operators.graph_rank import DAMPING, N_ITERS, pagerank
from tests.conftest import SF_DIR


def _numpy_pagerank(edge_list, damping=DAMPING, n_iters=N_ITERS):
    verts = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out_deg = np.zeros(n)
    for u, _ in edge_list:
        out_deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        contrib = np.zeros(n)
        for u, v in edge_list:
            contrib[idx[v]] += r[idx[u]] / out_deg[idx[u]]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in verts}


def test_pagerank_matches_numpy_on_small_graph(spark):
    """Chain + dangling sink + cycle: exact power-method equivalence,
    dangling mass handled identically."""
    edge_list = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 4)]  # 4 is dangling
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["v"]: r["rank"] for r in pagerank(edges).collect()}
    want = _numpy_pagerank(edge_list)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_supplier_pagerank_matches_numpy(spark):
    """The registered bipartite trade-graph query must equal the same
    power iteration run in numpy on the same edges."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").selectExpr(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").selectExpr(
        "l_orderkey", "l_suppkey"
    )
    pairs = {
        (f"c:{r['o_custkey']}", f"s:{r['l_suppkey']}")
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"]).collect()
    }
    edge_list = list(pairs) + [(s, c) for c, s in pairs]
    want = _numpy_pagerank(edge_list)

    got = registry.QUERIES["supplier_pagerank"](spark, SF_DIR).toPandas()
    assert len(got) > 0
    for _, row in got.iterrows():
        w = want[f"s:{int(row['suppkey'])}"]
        assert abs(row["rank"] - round(w, 9)) < 2e-9
    # undirected bipartite graph: supplier-side mass is a proper share
    assert 0 < got["rank"].sum() < 1


def test_pagerank_symmetric_graph_uniform(spark):
    """On a vertex-transitive graph (directed 4-cycle) every vertex must
    get exactly rank 1/n."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    got = {r["v"]: r["rank"] for r in pagerank(edges).collect()}
    for v, r in got.items():
        assert abs(r - 0.25) < 1e-12
