"""Dedup operators on *constructed* near-duplicates — the driver
testdata contains no real dups, so these prove the detectors actually
detect (and don't fire on unrelated docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark.operators.dedup import (
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    shingle_sets,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm stone wall near the old garden gate "
    "and the birds sing in the tall green trees above"
)
NEAR_DUP = BASE.replace("lazy dog", "sleepy dog")  # one-word edit
UNRELATED = (
    "completely different content about distributed query engines "
    "processing columnar parquet data with adaptive execution and "
    "broadcast joins at petabyte scale every single day"
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR_DUP), (3, UNRELATED), (4, BASE)],
        "doc_id long, text string",
    )


def test_ngram_jaccard_detects_near_dup(spark):
    sets = shingle_sets(_docs(spark))
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sets, threshold=0.5).collect()
    }
    sets.unpersist()
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0  # near dup
    assert not any(3 in p for p in pairs)  # unrelated never pairs


def test_minhash_lsh_finds_dup_candidates(spark):
    sets = shingle_sets(_docs(spark))
    cands = {(r["doc_a"], r["doc_b"]) for r in minhash_candidate_pairs(sets).collect()}
    sets.unpersist()
    assert (1, 4) in cands  # identical docs always share every band
    assert not any(3 in p for p in cands)


def test_minhash_signature_stability(spark):
    """Same text -> identical signatures regardless of doc order."""
    from simplex_mapreduce_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(10, BASE), (20, BASE)], "doc_id long, text string"
    )
    sets = shingle_sets(docs)
    rows = {r["doc_id"]: r for r in minhash_signatures(sets).collect()}
    sets.unpersist()
    for i in range(8):
        assert rows[10][f"mh_{i}"] == rows[20][f"mh_{i}"]
