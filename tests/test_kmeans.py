"""Spherical k-means: Lloyd's monotonicity, determinism, coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark import registry
from simplex_mapreduce_spark.operators.similarity import (
    KMEANS_K,
    _embeddings,
    kmeans_train,
)
from tests.conftest import SF_DIR


def test_kmeans_inertia_monotone_and_improves(spark):
    """Lloyd's guarantee: mean (1 - cos) never increases across
    iterations; and on the clustered testdata it strictly improves on
    the seed assignment."""
    _, _, hist = kmeans_train(_embeddings(spark, SF_DIR))
    assert len(hist) >= 2
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-12
    assert hist[-1] < hist[0]


def test_kmeans_assignment_coverage_and_determinism(spark):
    out1 = registry.QUERIES["kmeans_embeddings"](spark, SF_DIR).collect()
    n_vecs = _embeddings(spark, SF_DIR).count()
    assert len(out1) == n_vecs  # every vector assigned exactly once
    assert all(0 <= r["cell_id"] < KMEANS_K for r in out1)
    assert all(-1.0 - 1e-9 <= r["cos_to_centroid"] <= 1.0 + 1e-9 for r in out1)
    out2 = registry.QUERIES["kmeans_embeddings"](spark, SF_DIR).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]


def test_kmeans_assignment_is_actually_nearest(spark):
    """Cross-check a sample of final assignments against a brute-force
    nearest-centroid recomputation in Python."""
    import math

    assigned, centroids, _ = kmeans_train(_embeddings(spark, SF_DIR))
    vecs = {
        r["vec_id"]: list(r["e"])
        for r in _embeddings(spark, SF_DIR).limit(50).collect()
    }
    got = {
        r["vec_id"]: r["cell_id"]
        for r in assigned.filter(F.col("vec_id").isin(list(vecs))).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for vid, e in vecs.items():
        best = max(
            ((cos(e, ce), -cid) for cid, ce in centroids), key=lambda t: t
        )
        assert got[vid] == -best[1], vid


def test_semantic_dedup_matches_bruteforce_upper_triangle(spark):
    """SemDeDup's upper-triangle rule recomputed in plain Python from
    the SAME clustering: priority = (rounded centroid-cos DESC, vec_id),
    drop iff max cosine to any earlier cluster-mate >= eps.  Pins the
    self-join + groupBy(max) formulation to the paper semantics."""
    import math

    from simplex_mapreduce_spark.operators.similarity import SEMDEDUP_EPS

    assigned, _, _ = kmeans_train(_embeddings(spark, SF_DIR), keep_vectors=True)
    rows = assigned.collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell_id"], []).append(r)
    expect = {}
    for cell, members in by_cell.items():
        members.sort(key=lambda r: (-round(r["sim"], 4), r["vec_id"]))
        for i, r in enumerate(members):
            prior = [cos(r["e"], m["e"]) for m in members[:i]]
            mx = max(prior, default=None)
            status = (
                "dropped"
                if mx is not None and round(mx, 4) >= SEMDEDUP_EPS
                else "kept"
            )
            expect[r["vec_id"]] = (
                cell, status, round(mx if mx is not None else -1.0, 4)
            )

    got = registry.QUERIES["semantic_dedup"](spark, SF_DIR).collect()
    assert len(got) == len(expect)
    n_dropped = 0
    for r in got:
        cell, status, mx = expect[r["vec_id"]]
        assert r["cell_id"] == cell
        assert r["status"] == status, (r, expect[r["vec_id"]])
        assert abs(r["max_prior_sim"] - mx) < 1e-9
        n_dropped += r["status"] == "dropped"
    assert 0 < n_dropped < len(got)  # the eps genuinely bites here


def test_semantic_dedup_rep_collapse_exact_on_planted_clones(spark):
    """The rep-collapse rewrite must be output-exact on a corpus with
    exact duplicate vectors (the case it optimizes): plant clone groups
    of size 3-5, recompute the naive full upper-triangle in Python,
    compare every row.  Clones must all be dropped with
    max_prior_sim 1.0; reps must follow the rep-only triangle."""
    import math
    from unittest import mock

    from simplex_mapreduce_spark.operators import similarity as sim
    from simplex_mapreduce_spark.operators.similarity import SEMDEDUP_EPS

    base = [
        [math.sin(0.7 * i + j * j * 0.13) for j in range(8)] for i in range(12)
    ]
    rows, vid = [], 0
    for i, v in enumerate(base):
        for _ in range(1 + (i % 4)):  # groups of 1..4 exact clones
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    docs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    with mock.patch.object(sim, "load_table", lambda *a, **k: docs):
        got = {
            r["vec_id"]: r
            for r in sim.semantic_dedup(spark, "ignored").collect()
        }
        assigned, _, _ = sim.kmeans_train(
            sim._embeddings(spark, "ignored"), keep_vectors=True
        )
        arows = assigned.collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    by_cell: dict[int, list] = {}
    for r in arows:
        by_cell.setdefault(r["cell_id"], []).append(r)
    n_clone_drops = 0
    for members in by_cell.values():
        members.sort(key=lambda r: (-round(r["sim"], 4), r["vec_id"]))
        for i, r in enumerate(members):
            prior = [cos(r["e"], m["e"]) for m in members[:i]]
            mx = max(prior, default=None)
            status = (
                "dropped"
                if mx is not None and round(mx, 4) >= SEMDEDUP_EPS
                else "kept"
            )
            g = got[r["vec_id"]]
            assert g["cell_id"] == r["cell_id"]
            assert g["status"] == status, (g, r["vec_id"], mx)
            want_mx = round(mx if mx is not None else -1.0, 4)
            assert abs(g["max_prior_sim"] - want_mx) < 1e-9, (g, want_mx)
            if g["max_prior_sim"] == 1.0:
                n_clone_drops += 1
    assert n_clone_drops > 0  # the clone path genuinely fired


def test_embedding_outliers_consistent_with_kmeans(spark):
    """The outlier queue is exactly the distance-descending head of the
    kmeans assignment: same clustering, dist == 1 - cos, rnk total
    order with the vec_id tie-break."""
    from simplex_mapreduce_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    out = QUERIES["embedding_outliers"](spark, SF_DIR).collect()
    full = {
        r["vec_id"]: (r["cell_id"], r["cos_to_centroid"])
        for r in QUERIES["kmeans_embeddings"](spark, SF_DIR).collect()
    }
    assert [r["rnk"] for r in out] == list(range(1, len(out) + 1))
    assert len(out) == 20
    dists = [r["dist_to_centroid"] for r in out]
    assert dists == sorted(dists, reverse=True)
    for r in out:
        cell, cos = full[r["vec_id"]]
        assert r["cell_id"] == cell
        assert abs((1.0 - cos) - r["dist_to_centroid"]) < 2e-4  # both 4dp
    # the queue head dominates everything outside the queue
    outside = [1.0 - c for v, (_, c) in full.items()
               if v not in {r["vec_id"] for r in out}]
    assert not outside or max(outside) <= dists[-1] + 2e-4
