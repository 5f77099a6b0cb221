"""Planted hot-key skew: correctness on a corpus rep-collapse can't thin.

Every clone-quadratic defense in the engine (identical-text/-vector
rep-collapse, _capped_groups) keys on EXACT duplicates.  A crawl's
boilerplate — near-identical text with one varying token — collapses
nothing, yet floods one shingle/gram/fingerprint/k-means-cell key with
a large fraction of all distinct documents.  These tests pin that the
four skew-prone operators stay STRICTLY oracle-exact on such a corpus
(sources/scalegen.py ensure_hotkey: 50% of docs share a 37-token
boilerplate; the matching vec_ids get near-identical-never-equal
embeddings that all land in one cell).

The at-scale half of the drill — task-time distributions, the
single-task hot-cell straggler that motivated semantic_dedup's salted
in-cell join, AQE skew-split engagement — lives in
``scale_bench.py --skew`` (SCALING.json skew_run); correctness is
pinned here because it must hold in every round's test run, not only
when the drill is invoked.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from simplex_mapreduce_spark import registry
from tests.oracle_utils import compare_frames

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKEW_DIR = os.path.join(_HERE, ".scaledata", "skew_small")

SKEW_QUERIES = [
    "ngram_jaccard_neardup",
    "winnowing_overlap",
    "winnowing_overlap_stored",
    "duplicate_text_spans",
    "semantic_dedup",
]


@pytest.fixture(scope="module")
def skew_corpus(spark):
    from simplex_mapreduce_spark.sources.scalegen import ensure_hotkey

    return ensure_hotkey(
        spark, "/root/testdata/sf0.01", SKEW_DIR, replicate=1, hot_mod=2
    )


@pytest.fixture(scope="module")
def skew_duck(skew_corpus):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{skew_corpus}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SKEW_QUERIES)
def test_skew_prone_query_exact_on_hotkey_corpus(
    spark, skew_corpus, skew_duck, name
):
    spdf = registry.QUERIES[name](spark, skew_corpus).toPandas()
    assert len(spdf) > 0
    compare_frames(spdf, skew_duck.sql(registry.ORACLES[name]).df(), name)


def test_hotkey_corpus_has_no_exact_duplicates(spark, skew_corpus):
    """The drill's premise: the hot docs are DISTINCT (one varying
    token), so rep-collapse finds nothing to collapse — every group in
    the exact-dedup view is a singleton."""
    groups = registry.QUERIES["exact_dedup"](spark, skew_corpus)
    assert groups.filter("n_copies > 1").count() == 0


def test_hotkey_is_actually_hot(spark, skew_corpus):
    """~50% of docs share every boilerplate 15-gram: the planted keys'
    document frequency must dwarf the natural grams' (the corpus would
    otherwise not exercise the skew path at all)."""
    from pyspark.sql import functions as F

    from simplex_mapreduce_spark.functions.textfn import (
        shingles_col,
        tokens_col,
    )
    from simplex_mapreduce_spark.operators.text import PASSAGE_L

    d = spark.read.parquet(f"{skew_corpus}/documents.parquet")
    n_docs = d.count()
    df = (
        d.select(
            "doc_id",
            F.explode(
                shingles_col(tokens_col("text"), PASSAGE_L)
            ).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    hot_df = df.filter(F.col("gram").startswith("hk")).agg(
        F.max("df")
    ).first()[0]
    natural_df = df.filter(~F.col("gram").contains("hk")).agg(
        F.max("df")
    ).first()[0]
    assert hot_df >= 0.4 * n_docs
    assert hot_df > 10 * natural_df
