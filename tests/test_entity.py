"""Blocked fuzzy matching: equivalence against the UNBLOCKED naive
DuckDB join (proving the block loses no pairs), plan shape (hash join,
no cartesian product), and recall edge cases."""

from __future__ import annotations

from simplex_mapreduce_spark import registry
from simplex_mapreduce_spark.operators.entity import (
    FUZZY_SQL,
    blocked_fuzzy_self_join,
)
from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames


def test_fuzzy_matches_equal_naive_duckdb(spark, duck):
    """The blocked join must find EXACTLY the pairs the naive O(n^2)
    join finds — blocking is a pure optimization."""
    spark_pdf = registry.QUERIES["fuzzy_name_matches"](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(FUZZY_SQL).df()
    assert len(spark_pdf) > 0
    compare_frames(spark_pdf, duck_pdf, "fuzzy_name_matches")


def test_fuzzy_join_plan_is_hash_join_not_cartesian(spark):
    """The whole point: the similarity predicate must ride on an
    equi-join (block keys), never a CartesianProduct / BNL join."""
    out = registry.QUERIES["fuzzy_name_matches"](spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_length_band_recall(spark):
    """Pairs that differ by an insertion (length differs by 1) must be
    found — the deletion-neighborhood keys cover inserts,
    substitutions, and deletes alike."""
    df = spark.createDataFrame(
        [
            (1, "prefix###abc"),
            (2, "prefix###abcd"),   # one insertion from 1
            (3, "prefix###abxd"),   # distance 2 from 1 -> excluded
            (4, "different#abc"),   # far from all, never a result
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_fuzzy_self_join(
            df, "id", "name", max_distance=1
        ).collect()
    }
    assert (1, 2, 1) in got
    assert all(p[:2] != (1, 3) for p in got)
    assert all(4 not in p[:2] for p in got)
    # distance-1 substitution within same length also present
    assert (2, 3, 1) in got


def test_fuzzy_constant_prefix_blocks_are_small(spark):
    """The round-10 degeneracy regression test: on a constant-prefix
    corpus (every name starts with the same 9 literal chars) the
    symmetric-delete keys must NOT collapse into one giant block —
    pairs differing in one digit are found, and the largest block is
    bounded by the per-key candidate structure, not the corpus size."""
    from pyspark.sql import functions as F

    from simplex_mapreduce_spark.operators.entity import (
        _deletion_neighborhood_expr,
    )

    def corpus(n):
        return spark.range(1, n + 1).select(
            F.col("id"),
            F.concat(
                F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")
            ).alias("name"),
        )

    def max_block(frame):
        return (
            frame.select(
                F.explode(
                    F.expr(_deletion_neighborhood_expr("name", 1))
                ).alias("v")
            )
            .groupBy("v")
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]["m"]
        )

    # block-size audit: a deletion key of length L-1 is shared by at
    # most (L positions x alphabet) length-L names — a structural
    # constant independent of corpus size, NOT the old prefix block's
    # all-n collapse.  Pin both the constant and the n-independence.
    df = corpus(2000)
    m_small, m_big = max_block(df), max_block(corpus(8000))
    assert m_small <= 64, f"hot deletion block of size {m_small} on 2000"
    assert m_big <= 64, (
        f"hot block grew with corpus size: {m_small} -> {m_big}"
    )
    # recall: ids 1..9 are one substitution apart pairwise in the last
    # digit -> all 36 pairs present; also an exhaustive spot pair
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_fuzzy_self_join(df, "id", "name", max_distance=1)
        .filter(F.col("id_a") <= 9)
        .collect()
    }
    for i in range(1, 10):
        for j in range(i + 1, 10):
            assert (i, j) in got


def test_fuzzy_distance_two_neighborhood(spark):
    """max_distance=2 generalizes: two independent edits are found via
    the depth-2 deletion neighborhood; distance-3 stays excluded."""
    df = spark.createDataFrame(
        [
            (1, "abcdefgh"),
            (2, "abXdefgY"),   # two substitutions from 1
            (3, "abcdefghij"), # two insertions from 1
            (4, "Xbcdefgh"),   # one substitution from 1
            (5, "aWcXeYgh"),   # three substitutions from 1 -> excluded
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_fuzzy_self_join(
            df, "id", "name", max_distance=2
        ).collect()
    }
    assert (1, 2, 2) in got
    assert (1, 3, 2) in got
    assert (1, 4, 1) in got
    assert all(p[:2] != (1, 5) for p in got)


def test_fuzzy_two_table_join_matches_naive_duckdb(spark, duck):
    """blocked_fuzzy_join (record linkage between TWO tables): must
    equal the unblocked naive DuckDB cross-predicate join — the
    no-lost-pairs proof for the two-table shape (customer names
    matched against supplier names padded to the customer format so
    cross-table distance-1 pairs actually exist)."""
    from pyspark.sql import functions as F

    from simplex_mapreduce_spark.operators.entity import blocked_fuzzy_join
    from simplex_mapreduce_spark.sources.tables import load_table

    left = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    # a deterministic "dirty feed": customer names re-keyed under
    # s_suppkey ids with the SAME 'Customer#' prefix so distance-1
    # cross-table matches exist at corpus scale
    right = (
        load_table(spark, SF_DIR, "supplier")
        .select("s_suppkey")
        .withColumn(
            "s_name",
            F.concat(
                F.lit("Customer#"),
                F.lpad((F.col("s_suppkey") * 7).cast("string"), 9, "0"),
            ),
        )
    )
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_fuzzy_join(
            left, right, "c_custkey", "c_name", "s_suppkey", "s_name"
        ).collect()
    }
    naive = {
        tuple(r)
        for r in duck.sql(
            """
            WITH feed AS (
                SELECT s_suppkey,
                       'Customer#' || lpad(CAST(s_suppkey * 7 AS VARCHAR), 9, '0')
                           AS s_name
                FROM supplier)
            SELECT c.c_custkey, f.s_suppkey,
                   levenshtein(c.c_name, f.s_name) AS d
            FROM customer c JOIN feed f
              ON levenshtein(c.c_name, f.s_name) <= 1
            """
        ).fetchall()
    }
    assert len(naive) > 0, "fixture produced no cross-table matches"
    assert got == naive


def test_fuzzy_null_names_dropped_not_blocked(spark):
    """Round-12 advisory: null names must be FILTERED before the
    deletion-neighborhood explode.  Without the filter every null's
    variant array hashes to one constant key, so k nulls form a k^2
    candidate block on a dirty feed; with it, nulls produce no keyed
    rows at all (matching SQL null semantics — levenshtein(NULL, x)
    is never <= d) and the true pairs are unaffected."""
    from pyspark.sql import functions as F

    from simplex_mapreduce_spark.operators.entity import _deletion_keyed

    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, None), (4, None), (5, None)],
        "id long, name string",
    )
    keyed = _deletion_keyed(df, "id", "name", 1, "a")
    assert keyed.filter(F.col("name_a").isNull()).count() == 0
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_fuzzy_self_join(df, "id", "name", 1).collect()
    }
    assert got == {(1, 2, 1)}
