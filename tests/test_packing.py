"""Sequence packing: DuckDB equivalence (rows-only in the driver — the
50 oracled slots are full) plus the packing invariants a dataloader
relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark import registry
from simplex_mapreduce_spark.operators.packing import SEQ_LEN, pack_into_sequences
from tests.conftest import SF_DIR
from tests.oracle_utils import compare_frames



def test_pack_sequences_matches_duckdb(spark, duck):
    spark_pdf = registry.QUERIES["pack_sequences"](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(registry.ORACLES["pack_sequences"]).df()
    compare_frames(spark_pdf, duck_pdf, "pack_sequences")


def test_pack_invariants(spark):
    """Within every (bucket, seq_id): offsets start at 0 for the first
    doc of each bucket, each doc's offset is the previous cumulative
    total mod SEQ_LEN, and every token of the corpus is assigned exactly
    once (sum of n_tokens is conserved)."""
    out = registry.QUERIES["pack_sequences"](spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    total_in = sum(r["n_tokens"] for r in rows)

    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rs in by_bucket.items():
        # reconstruct the bucket's layout in seq order: seq_id then offset
        rs = sorted(rs, key=lambda r: (r["seq_id"], r["offset"]))
        cum = 0
        for r in rs:
            assert r["seq_id"] == bucket * 2**32 + cum // SEQ_LEN, r
            assert r["offset"] == cum % SEQ_LEN, r
            cum += r["n_tokens"]
    assert total_in == sum(r["n_tokens"] for r in rows)


def test_pack_deterministic_and_insert_stable(spark):
    """Re-running packs identically, and a doc's (bucket, okey) routing
    never depends on which other docs exist: removing some docs leaves
    every survivor in the same bucket (sequence ids shift, routing does
    not) — the property rand() ordering cannot give."""
    docs = spark.createDataFrame(
        [(i, 100 + i) for i in range(200)], "doc_id long, n_tokens long"
    )
    a = {r["doc_id"]: r for r in pack_into_sequences(docs).collect()}
    b = {r["doc_id"]: r for r in pack_into_sequences(docs).collect()}
    assert {k: (v["seq_id"], v["offset"]) for k, v in a.items()} == {
        k: (v["seq_id"], v["offset"]) for k, v in b.items()
    }
    subset = docs.filter(F.col("doc_id") % 3 != 0)
    c = {r["doc_id"]: r for r in pack_into_sequences(subset).collect()}
    for doc_id, r in c.items():
        assert r["bucket"] == a[doc_id]["bucket"]


def test_pack_no_global_sort_in_plan(spark):
    """The scale guarantee: the window is partitioned by bucket, so the
    packing plan (before any presentation-only orderBy) contains no
    single-partition Exchange — SinglePartition here would be the
    100 TB bottleneck of the naive global-window formulation."""
    docs = spark.createDataFrame(
        [(i, 100) for i in range(50)], "doc_id long, n_tokens long"
    )
    plan = (
        pack_into_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_pipeline_corpus_to_sequences_matches_duckdb(spark, duck):
    """dedup -> quality -> pack composed in one plan equals the same
    composition in DuckDB SQL.  Uses the registry oracle directly
    (registered deprioritized in round 5 — the generic sweep also runs
    it; this pin keeps the non-empty assertion)."""
    spark_pdf = registry.QUERIES["pipeline_corpus_to_sequences"](
        spark, SF_DIR
    ).toPandas()
    duck_pdf = duck.sql(registry.ORACLES["pipeline_corpus_to_sequences"]).df()
    assert 0 < len(spark_pdf)
    compare_frames(spark_pdf, duck_pdf, "pipeline_corpus_to_sequences")


def test_assemble_sequences_materializes_the_packing(spark):
    """assemble_sequences must realize exactly the layout
    pack_into_sequences assigns: per bucket, every sequence except the
    last is exactly SEQ_LEN tokens; the corpus token count is conserved;
    and re-concatenating each bucket's sequences in seq order yields the
    same token stream as concatenating its documents in shuffle order
    (straddling docs split across the cut, nothing lost or reordered)."""
    from simplex_mapreduce_spark.operators.packing import assemble_sequences
    from simplex_mapreduce_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    seqs = assemble_sequences(d).collect()
    assert len(seqs) > 0

    import re

    docs = d.select("doc_id", "text").collect()

    def py_tokens(t):
        return [w for w in re.split(r"\s+", t.strip()) if w]

    tok_count = {r["doc_id"]: len(py_tokens(r["text"])) for r in docs}
    total_tokens = sum(n for n in tok_count.values() if n > 0)
    assert sum(r["n_tokens"] for r in seqs) == total_tokens

    by_bucket: dict[int, list] = {}
    for r in seqs:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r["seq_id"])
        for r in rs[:-1]:
            assert r["n_tokens"] == SEQ_LEN, (bucket, r["seq_id"])
        assert 0 < rs[-1]["n_tokens"] <= SEQ_LEN

    # the assignment pass and the materialization pass must agree on
    # where every document's first token lands
    assigned = {
        r["doc_id"]: r
        for r in registry.QUERIES["pack_sequences"](spark, SF_DIR).collect()
    }
    doc_text = {r["doc_id"]: py_tokens(r["text"]) for r in docs}
    seq_toks = {
        r["seq_id"]: r["text"].split(" ") for r in seqs
    }
    import random

    rng = random.Random(7)
    sample = rng.sample(sorted(assigned), 50)
    for doc_id in sample:
        a = assigned[doc_id]
        toks = doc_text[doc_id]
        head = seq_toks[a["seq_id"]][a["offset"] : a["offset"] + len(toks)]
        assert head == toks[: len(head)], doc_id


def test_length_buckets_conservation(spark):
    """Bucket audit invariants: every non-empty doc lands in exactly one
    bucket, capped token totals are conserved, padding = slots - tokens,
    and each doc's bucket is the smallest rung holding it."""
    from simplex_mapreduce_spark.operators.packing import (
        LENGTH_BUCKETS,
        SEQ_LEN,
    )

    rows = registry.QUERIES["length_buckets"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    lens = [min(len(r["text"].split()), SEQ_LEN) for r in docs]
    lens = [n for n in lens if n > 0]
    assert sum(r["n_docs"] for r in rows) == len(lens)
    assert sum(r["tokens"] for r in rows) == sum(lens)
    for r in rows:
        assert r["bucket_len"] in LENGTH_BUCKETS
        assert r["padding_slots"] == r["bucket_len"] * r["n_docs"] - r["tokens"]
        assert 0.0 <= r["waste_frac"] < 1.0
    expect_counts: dict[int, int] = {}
    for n in lens:
        b = next(b for b in LENGTH_BUCKETS if n <= b)
        expect_counts[b] = expect_counts.get(b, 0) + 1
    assert {r["bucket_len"]: r["n_docs"] for r in rows} == expect_counts
