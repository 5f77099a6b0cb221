"""Sequence packing: assign documents to fixed-token-budget training
sequences, the last batch-assembly step of an LLM training-data
pipeline (concat-then-chunk dataloader semantics).

The reference engine has no notion of this (it is a 2-closure MapReduce
kernel, src/mapreduce.go); this is pure north-star extension surface.

Scale design (the part that matters at 100 TB):

- A naive implementation orders the WHOLE corpus with one unpartitioned
  window (``Window.orderBy(...)`` with no partitionBy) — Spark executes
  that as a single-partition sort, a guaranteed driver-of-shame
  bottleneck at any real scale.
- Instead documents are first routed to one of ``n_buckets`` packing
  buckets by a deterministic md5 slice, and the running-token-count
  window is PARTITIONED by bucket: the only shuffle is one
  hash-partitioned exchange, every bucket packs independently, and
  parallelism is n_buckets regardless of corpus size.  Sequence ids are
  globally unique by construction (bucket << 32 | seq-in-bucket).
- The shuffle order inside a bucket is an md5 hash of the doc id —
  reproducible across re-runs, engines, and repartitioning (unlike
  rand()), which is what makes the packing auditable: the same corpus
  always packs into the same sequences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from simplex_mapreduce_spark.functions.textfn import tokens_col
from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table

SEQ_LEN = 2048
N_PACK_BUCKETS = 32


def _order_key(id_col: str) -> Column:
    """48-bit deterministic shuffle key from md5 of the id — identical
    in Spark (``conv`` base-16) and DuckDB (``'0x…'`` cast), so the
    packing is pinnable across engines."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))), 1, 12),
        16,
        10,
    ).cast("bigint")


def pack_into_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "n_tokens",
    seq_len: int = SEQ_LEN,
    n_buckets: int = N_PACK_BUCKETS,
) -> DataFrame:
    """Pack (id, n_tokens) rows into ``seq_len``-token sequences.

    Concat-then-chunk semantics: within a bucket, documents are laid
    end-to-end in shuffle order and the stream is cut every ``seq_len``
    tokens, so a document may straddle a cut (``offset + n_tokens >
    seq_len``) — exactly what a GPT-style packed dataloader does.
    Output: id, n_tokens, bucket, seq_id, offset (token position of the
    document's first token inside its sequence)."""
    okey = _order_key(id_col)
    with_key = df.select(
        id_col,
        F.col(tokens_col_name).cast("long").alias("n_tokens"),
        okey.alias("okey"),
        F.pmod(okey, F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("okey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return with_key.select(
        id_col,
        "n_tokens",
        "bucket",
        (
            F.col("bucket").cast("long") * F.lit(2**32)
            + F.floor(cum_before / F.lit(seq_len))
        ).alias("seq_id"),
        F.pmod(cum_before, F.lit(seq_len)).alias("offset"),
    )


PACK_SQL = f"""
WITH docs AS (
    SELECT doc_id,
           CAST(len({{tokens}}) AS BIGINT) AS n_tokens,
           CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 12)
                AS BIGINT) AS okey
    FROM documents),
nonempty AS (SELECT * FROM docs WHERE n_tokens > 0),
b AS (SELECT *, okey % {N_PACK_BUCKETS} AS bucket FROM nonempty),
c AS (SELECT *,
             coalesce(sum(n_tokens) OVER (
                 PARTITION BY bucket ORDER BY okey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM b)
SELECT doc_id, n_tokens, CAST(bucket AS INT) AS bucket,
       CAST(bucket * 4294967296 + cb // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(cb % {SEQ_LEN} AS BIGINT) AS "offset"
FROM c
"""
# (cb is a window sum of BIGINT => HUGEINT, which pandas surfaces as
# float — the CASTs back to BIGINT keep the driver's string-hash exact.
# No `--` comments inside the string: oracle SQL is whitespace-collapsed
# by the registry.)


def _pack_oracle() -> str:
    from simplex_mapreduce_spark.functions.textfn import duckdb_tokens

    return PACK_SQL.format(tokens=duckdb_tokens("text"))


def assemble_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = SEQ_LEN,
    n_buckets: int = N_PACK_BUCKETS,
) -> DataFrame:
    """Materialize the packed training sequences as actual text — the
    step after :func:`pack_into_sequences` that a dataloader consumes.

    Faithful concat-then-chunk semantics: within a bucket, documents
    are laid end-to-end in shuffle order and the token stream is cut
    every ``seq_len`` tokens, so a document that straddles a cut is
    SPLIT — its head tokens finish one sequence, its tail starts the
    next.  Output one row per sequence: ``(seq_id, bucket, n_docs,
    n_tokens, text)``; every sequence is exactly ``seq_len`` tokens
    except each bucket's last.

    Scale shape: the same single hash exchange as the assignment pass
    (window on bucket), then each doc explodes into the 1..k sequences
    it spans (k = ceil(n_tokens/seq_len) + 1 at most — almost always 1
    or 2 rows), token slices are per-row HOFs, and the final
    groupBy(seq_id) aggregates bounded state (~seq_len tokens per
    group, map-side combinable).  No global sort, no Python."""
    toks_all = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).withColumn("n_tokens", F.size("toks").cast("long"))
    okey = _order_key("doc_id")
    with_key = toks_all.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "toks",
        "n_tokens",
        okey.alias("okey"),
        F.pmod(okey, F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    assigned = with_key.select(
        "doc_id",
        "toks",
        "n_tokens",
        "bucket",
        cum.alias("cum"),
    )
    L = F.lit(seq_len)
    first_seq = (F.col("cum") / L).cast("long")
    last_seq = ((F.col("cum") + F.col("n_tokens") - 1) / L).cast("long")
    spans = assigned.select(
        "doc_id",
        "toks",
        "n_tokens",
        "bucket",
        "cum",
        F.explode(F.sequence(first_seq, last_seq)).alias("s"),
    )
    # token sub-range of this doc landing in sequence s (0-based)
    start = F.greatest(F.lit(0), F.col("s") * L - F.col("cum"))
    end = F.least(F.col("n_tokens"), (F.col("s") + 1) * L - F.col("cum"))
    pieces = spans.select(
        "bucket",
        "s",
        F.greatest(F.lit(0), F.col("cum") - F.col("s") * L).alias("off_in_seq"),
        F.slice(
            "toks", (start + 1).cast("int"), (end - start).cast("int")
        ).alias("piece"),
    )
    return (
        pieces.groupBy("bucket", "s")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("off_in_seq", "piece"))
                    ),
                    lambda x: x["piece"],
                )
            ).alias("all_toks"),
        )
        .select(
            (F.col("bucket").cast("long") * F.lit(2**32) + F.col("s")).alias(
                "seq_id"
            ),
            "bucket",
            "n_docs",
            F.size("all_toks").cast("long").alias("n_tokens"),
            F.array_join("all_toks", " ").alias("text"),
        )
    )


@register(
    "pack_sequences",
    oracle=_pack_oracle(),
    deprioritized=True,  # round-7 rotation: hash-green r4-r6; slot
    # yielded to the new corpus_snapshot_diff query
)  # promoted to the
# driver's oracled window in round 4 (slot freed by the tf_idf
# demotion); also pinned locally in tests/test_packing.py
def pack_sequences(spark, sf_dir):
    """Pack the documents table into 2048-token training sequences:
    tokenize (whitespace), md5-shuffle, route to 32 packing buckets,
    one bucket-partitioned running-sum window assigns each doc its
    sequence id and offset.  One scan, one hash exchange, no global
    sort."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    # no presentation orderBy: it would add a full range shuffle at
    # scale, and the driver's compare is order-insensitive
    return pack_into_sequences(docs)


ASSEMBLE_SQL = f"""
WITH docs AS (
    SELECT doc_id, {{tokens}} AS toks,
           CAST(len({{tokens}}) AS BIGINT) AS n_tokens,
           CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 12)
                AS BIGINT) AS okey
    FROM documents),
nonempty AS (SELECT * FROM docs WHERE n_tokens > 0),
b AS (SELECT *, okey % {N_PACK_BUCKETS} AS bucket FROM nonempty),
c AS (SELECT *,
             CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY bucket ORDER BY okey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cb
      FROM b),
spans AS (
    SELECT bucket, toks, n_tokens, cb,
           unnest(range(cb // {SEQ_LEN},
                        (cb + n_tokens - 1) // {SEQ_LEN} + 1)) AS s
    FROM c),
pieces AS (
    SELECT bucket, s,
           greatest(CAST(0 AS BIGINT), cb - s * {SEQ_LEN}) AS off_in_seq,
           toks[CAST(greatest(0, s * {SEQ_LEN} - cb) + 1 AS BIGINT)
                : CAST(least(n_tokens, (s + 1) * {SEQ_LEN} - cb) AS BIGINT)]
               AS piece
    FROM spans),
g AS (
    SELECT bucket, s, count(*) AS n_docs,
           flatten(list(piece ORDER BY off_in_seq)) AS all_toks
    FROM pieces GROUP BY bucket, s)
SELECT CAST(bucket * 4294967296 + s AS BIGINT) AS seq_id,
       CAST(bucket AS INT) AS bucket,
       n_docs,
       CAST(len(all_toks) AS BIGINT) AS n_tokens,
       array_to_string(all_toks, ' ') AS text
FROM g
"""
# (Same CTE chain as PACK_SQL through `c`, then each doc's span
# explodes over the sequences it crosses, list slices cut the exact
# token sub-ranges — DuckDB's l[a:b] is 1-based INCLUSIVE, matching
# F.slice(start+1, end-start) — and the per-sequence concat orders by
# the doc's offset inside the sequence, which is unique per doc.)


def _assemble_oracle() -> str:
    from simplex_mapreduce_spark.functions.textfn import duckdb_tokens

    return ASSEMBLE_SQL.format(tokens=duckdb_tokens("text"))


@register(
    "assemble_sequences",
    oracle=_assemble_oracle(),
    deprioritized=True,  # round-10 rotation: hash-green r7-r9; slot
    # yielded to the newborn winnow_maintenance_pairs
)
# driver-oracled since round 7 (VERDICT r6 item 2: the text
# materialization of the ORACLED pack_sequences assignment); layout
# equivalence (exact seq_len cuts, token conservation, per-doc landing
# positions) is also pinned in
# tests/test_packing.py::test_assemble_sequences_materializes
# _the_packing
def assemble_sequences_query(spark, sf_dir):
    """Materialized 2048-token training sequences over the documents
    table — the dataloader-ready output of the packing stage (see
    :func:`assemble_sequences`)."""
    return assemble_sequences(load_table(spark, sf_dir, "documents"))


def _pipeline_oracle() -> str:
    from simplex_mapreduce_spark.functions.textfn import (
        STOPWORD_RE,
        duckdb_tokens,
    )

    return f"""
    WITH hashed AS (
        SELECT doc_id, text,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
        FROM documents),
    keep AS (SELECT min(doc_id) AS doc_id FROM hashed GROUP BY h),
    scored AS (
        SELECT h.doc_id,
               CAST(len({duckdb_tokens('h.text')}) AS DOUBLE) AS n_tokens,
               CAST(len(regexp_extract_all(lower(h.text), '{STOPWORD_RE}'))
                    AS DOUBLE) AS stop_cnt
        FROM hashed h JOIN keep USING (doc_id)),
    cleaned AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM scored
        WHERE n_tokens > 0
          AND least(n_tokens, 200) / 200.0 * (1 - stop_cnt / n_tokens) >= 0.3),
    b AS (
        SELECT doc_id, n_tokens,
               CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 12)
                    AS BIGINT) AS okey
        FROM cleaned),
    bb AS (SELECT *, okey % {N_PACK_BUCKETS} AS bucket FROM b),
    c AS (SELECT *,
                 coalesce(sum(n_tokens) OVER (
                     PARTITION BY bucket ORDER BY okey, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM bb)
    SELECT doc_id, n_tokens, CAST(bucket AS INT) AS bucket,
           CAST(bucket * 4294967296 + cb // {SEQ_LEN} AS BIGINT) AS seq_id,
           CAST(cb % {SEQ_LEN} AS BIGINT) AS "offset"
    FROM c
    """


@register(
    "pipeline_corpus_to_sequences",
    oracle=_pipeline_oracle(),
    deprioritized=True,  # round-8 rotation: hash-green r6-r7; slot
    # yielded to the never-driver-hashed streaming_quality_gate
)
def pipeline_corpus_to_sequences(spark, sf_dir):
    """The whole training-data path in ONE declarative plan: exact
    dedup (normalized md5, keep min doc_id) -> quality filter (the
    pipeline_clean_corpus rule) -> sequence packing.  Catalyst fuses
    hash, semi-join, scoring and the packing window without
    materializing any intermediate — the composition a 100 TB corpus
    run executes nightly, expressed as a single DataFrame."""
    from simplex_mapreduce_spark.operators.text import _clean_corpus_plan
    from simplex_mapreduce_spark.sources.tables import load_table as _lt

    cleaned = _clean_corpus_plan(_lt(spark, sf_dir, "documents"))
    return pack_into_sequences(cleaned.select("doc_id", "n_tokens"))


# ------------------------------------------------------------------ #
# Length bucketing: the padding-waste audit behind batch planning.
# ------------------------------------------------------------------ #

LENGTH_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, SEQ_LEN]
# power-of-two rungs as INTEGER CASE rungs, not 2^ceil(log2 n): log2 of
# a power of two is exact in IEEE but Spark computes it as ln(x)/ln(2),
# whose quotient is NOT guaranteed exact — a doc of exactly 64 tokens
# could land in different buckets across engines.  Eight integer
# comparisons are codegen-trivial and boundary-exact everywhere.


def _length_bucket_case():
    n = F.least(F.size(tokens_col("text")).cast("long"), F.lit(SEQ_LEN))
    expr = F.lit(LENGTH_BUCKETS[-1])
    for b in reversed(LENGTH_BUCKETS[:-1]):
        expr = F.when(n <= b, F.lit(b)).otherwise(expr)
    return n, expr


def _length_buckets_oracle() -> str:
    from simplex_mapreduce_spark.functions.textfn import duckdb_tokens

    rungs = " ".join(
        f"WHEN n <= {b} THEN {b}" for b in LENGTH_BUCKETS[:-1]
    )
    return f"""
    WITH t AS (
        SELECT least(len({duckdb_tokens('text')}), {SEQ_LEN}) AS n
        FROM documents),
    b AS (
        SELECT n, CASE {rungs} ELSE {SEQ_LEN} END AS bucket_len
        FROM t WHERE n > 0)
    SELECT bucket_len,
           count(*)                                   AS n_docs,
           CAST(sum(n) AS BIGINT)                     AS tokens,
           CAST(count(*) * bucket_len - sum(n) AS BIGINT) AS padding_slots,
           round(1.0 - sum(n) / CAST(count(*) * bucket_len AS DOUBLE), 4)
               AS waste_frac
    FROM b GROUP BY bucket_len
    """


@register(
    "length_buckets",
    oracle=_length_buckets_oracle(),
    deprioritized=True,  # round-11 rotation: hash-green rounds 7-10;
    # slot yielded to the re-promoted fuzzy_name_matches, whose
    # blocking algorithm changed this round (VERDICT r10 item 1)
)  # driver-oracled from birth (round 7); conservation invariants
# pinned in tests/test_packing.py
def length_buckets(spark, sf_dir):
    """Per-bucket padding-waste audit for length-bucketed batching —
    the report a serving/training stack reads before choosing bucket
    boundaries: docs binned to the next power-of-two sequence length
    (capped at SEQ_LEN=2048), with token totals, the padding slots a
    rectangular batch of that bucket would burn, and the waste
    fraction.  The alternative consumers: pack_sequences eliminates
    padding by concatenation (training), length bucketing minimizes it
    while preserving doc boundaries (inference batching) — this query
    quantifies the trade.

    One scan, one map-side-combinable groupBy over at most
    len(LENGTH_BUCKETS)=8 groups: the aggregate is a few longs per
    bucket no matter the corpus size.  Bucket edges are integer CASE
    rungs, never floats (see LENGTH_BUCKETS note)."""
    d = load_table(spark, sf_dir, "documents")
    n, bucket = _length_bucket_case()
    rows = d.select(n.alias("n"), bucket.alias("bucket_len")).filter(
        F.col("n") > 0
    )
    return (
        rows.groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("tokens"),
            (F.count(F.lit(1)) * F.first("bucket_len") - F.sum("n")).alias(
                "padding_slots"
            ),
            F.round(
                F.lit(1.0)
                - F.sum("n")
                / (F.count(F.lit(1)) * F.first("bucket_len")).cast("double"),
                4,
            ).alias("waste_frac"),
        )
        .orderBy("bucket_len")
    )
