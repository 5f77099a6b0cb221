"""corpus_diff: all four statuses on crafted frames; the registered
snapshot query's oracle runs in the uniform local gate."""

from __future__ import annotations


def test_corpus_diff_all_statuses(spark):
    from simplex_mapreduce_spark.operators.versioning import corpus_diff

    old = spark.createDataFrame(
        [
            (1, "kept exactly"),
            (2, "to be   Edited"),
            (3, "dropped in new"),
            (4, "whitespace  reflow\tonly"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "kept exactly"),
            (2, "to be really edited"),
            (4, "whitespace reflow only"),  # normalizes equal -> unchanged
            (5, "brand new doc"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",
        5: "added",
    }


def test_corpus_diff_hashes_carry_delta_identity(spark):
    """The changed row exposes both digests (what incremental stages key
    on); added/removed rows carry exactly one side."""
    from simplex_mapreduce_spark.operators.versioning import corpus_diff

    old = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    new = spark.createDataFrame([(2, "c"), (3, "d")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert rows[1]["old_hash"] and rows[1]["new_hash"] is None
    assert rows[3]["new_hash"] and rows[3]["old_hash"] is None
    assert rows[2]["old_hash"] != rows[2]["new_hash"]
