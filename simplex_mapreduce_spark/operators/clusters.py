"""Duplicate-cluster resolution: near-dup PAIRS → connected COMPONENTS
→ one canonical document per cluster.

Every near-dup detector in operators/dedup.py emits pairs
(doc_a, doc_b).  Pairs alone can't drive deletion: if A~B and B~C but
not A~C, dropping "the second of every pair" either keeps a duplicate
or drops the canonical twice.  The correct unit is the connected
component of the similarity graph — compute it, keep min(doc_id) per
component, drop the rest.  This is the standard last stage of a
web-scale dedup pipeline (the reference engine has no graph surface at
all; this is pure extension).

Algorithm: iterative min-label propagation on DataFrames —
``label(u) := min(label(u), min over neighbors v of label(v))`` until a
fixpoint, which is exact connected components in O(component diameter)
rounds.  Near-dup components are small and dense (duplicate families),
so the diameter is tiny; for adversarially long chain graphs at 100 TB
the round count grows and the alternating small-star/large-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) drops it to O(log n) — same per-round join/groupBy
shape, so the swap is local to this module.

Iterative-Spark hygiene: every round ends in ``localCheckpoint`` to cut
the lineage chain (without it, round k's plan nests k joins deep and
the driver's analysis time explodes); a production run on a real
cluster would use reliable ``checkpoint()`` to survive executor loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Exact connected components of the undirected pair graph.

    Returns (doc_id, cluster_id) for every node that appears in a pair;
    cluster_id is the component's minimum doc_id.  Nodes with no pair
    are their own singleton cluster by definition and are omitted (the
    output stays proportional to the duplicates found, not the corpus).
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))

    for _ in range(max_rounds):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("u").alias("v"), F.col("label").alias("vlabel")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlabel").alias("nbr_label"))
        )
        stepped = labels.join(nbr_min, "u", "left").select(
            "u",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            (
                F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")
            ).alias("changed"),
        )
        stepped = stepped.localCheckpoint(eager=True)
        n_changed = stepped.filter("changed").count()
        labels = stepped.select("u", "label")
        if n_changed == 0:
            break

    return labels.select(
        F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
    )


@register("neardup_clusters")  # rows-only: iterative fixpoint is not
# single-statement SQL; exactness is pinned against a driver-side
# union-find in tests/test_dedup_synthetic.py
def neardup_clusters(spark, sf_dir):
    """End-to-end duplicate-cluster resolution on the documents table:
    n-gram-Jaccard near-dup pairs (PPJoin candidate generation, exact
    verification — operators/dedup.py) fed through connected components,
    with the min-doc_id survivor rule marked per member.  The output is
    the delete-list a corpus-cleaning pass consumes."""
    from simplex_mapreduce_spark.operators.dedup import ngram_jaccard_neardup

    pairs = ngram_jaccard_neardup(spark, sf_dir)
    return canonical_members(pairs)


def canonical_members(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Cluster membership with the survivor rule applied: (doc_id,
    cluster_id, is_canonical) — is_canonical marks the one kept document
    (min doc_id) per duplicate cluster; every other member is the set a
    cleaning pass deletes."""
    cc = connected_components(pairs, src, dst)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


# ------------------------------------------------------------------ #
# Benchmark decontamination: n-gram overlap between a training corpus
# and an evaluation set.
# ------------------------------------------------------------------ #

CONTAM_NGRAM = 13  # the n used by GPT-3/PaLM-style decontamination


def contamination_check(
    train: DataFrame, eval_docs: DataFrame, n: int = CONTAM_NGRAM
) -> DataFrame:
    """Train/eval n-gram collision report: (train_doc_id, eval_doc_id,
    n_shared) for every pair sharing at least one word ``n``-gram — the
    standard "did a benchmark leak into the training set" check run
    before every serious LLM training job (13-grams following the
    GPT-3 appendix convention).

    Shape at 100 TB: shingle both sides (per-row HOFs, no shuffle),
    explode ONLY the eval side (benchmarks are tiny — thousands of
    docs), hash shingles to 64-bit on both sides so the join carries
    8-byte keys instead of raw 13-gram strings, and inner-join
    train-side exploded hashes against the eval hash set.  The train
    side explode is unavoidable (every train shingle must be probed)
    but feeds straight into one shuffle join on the hash; with the eval
    side small the join broadcasts and the train side never shuffles at
    all — AQE decides from observed size, no forced hint."""
    from simplex_mapreduce_spark.functions.textfn import shingles_col, tokens_col

    def hashed(docs, id_out):
        sh = F.explode(
            F.array_distinct(shingles_col(tokens_col("text"), n))
        ).alias("sh")
        return docs.select(F.col("doc_id").alias(id_out), sh).select(
            id_out, F.xxhash64("sh").alias("h")
        )

    t = hashed(train, "train_doc_id")
    e = hashed(eval_docs, "eval_doc_id")
    return (
        t.join(e, "h")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@register("contamination_report")  # rows-only: hash-join formulation is
# pinned vs a raw-string join + planted-leak detection in
# tests/test_dedup_synthetic.py (the driver corpus has no planted leaks,
# so the report is legitimately empty there — like embedding_neardup)
def contamination_report(spark, sf_dir):
    """Decontamination report over the documents table, using the
    deterministic md5 train/val/test split from ``doc_profile``: every
    13-gram collision between a train-split and a test-split document."""
    from simplex_mapreduce_spark.operators.text import _hash_bucket
    from simplex_mapreduce_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").withColumn(
        "_bucket", _hash_bucket()
    )
    train = d.filter(F.col("_bucket") < 90)
    eval_docs = d.filter(F.col("_bucket") >= 95)
    return contamination_check(train, eval_docs)
