"""Deterministic corpus scaling: replicate a testdata sf directory N×
with referential-integrity-preserving key offsets, producing the
measured-scaling evidence the 100 TB design claims rest on.

The driver testdata tops out at sf0.1 (~17 MB); every "scale-safe"
argument in the operator docstrings was, until round 5, plan inspection
only.  This module turns sf0.1 into an sf1-equivalent (~170 MB) corpus
so BASELINE.md can publish wall-time scaling curves and tests can assert
the at-scale plan choices (AQE join strategy flips) on real data.

Design (pure replication, zero synthesis):

- Each replica ``i`` of a table is the source table with every KEY
  column shifted by ``i * stride(family)``, where the stride is the
  next power of ten above the family's max key across all tables that
  carry it — so replicas never collide and every foreign-key
  relationship (orders↔lineitem↔part/supplier, customer↔orders,
  events.user_id sessions, documents/embeddings ids) is preserved
  replica-internally.  Replica 0 is the identity.
- NON-key columns are byte-identical across replicas.  For documents
  this is deliberate: a 10× corpus where 90% of texts are exact mirrors
  is the crawl-duplication scenario the dedup operators exist for, and
  it stress-tests their hot-key posture (clone clusters of size N).
- Timestamp columns stay in their raw int64 epoch-nanos representation
  (read with ``convert_ts=False`` semantics, written as plain BIGINT),
  so ``load_table``'s self-heal and the raw-nanos pushdown idiom
  (tables.py) behave identically on generated directories.

Everything is a Spark job — at a real 100 TB this same code fans the
replication out across the cluster; nothing is driver-side but the
8 stride constants.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplex_mapreduce_spark.sources.tables import TABLES, load_table

# key families: every (table, column) carrying the family's id space
KEY_FAMILIES: dict[str, tuple[tuple[str, str], ...]] = {
    "orderkey": (("orders", "o_orderkey"), ("lineitem", "l_orderkey")),
    "custkey": (("customer", "c_custkey"), ("orders", "o_custkey")),
    "partkey": (("part", "p_partkey"), ("lineitem", "l_partkey")),
    "suppkey": (("supplier", "s_suppkey"), ("lineitem", "l_suppkey")),
    "user_id": (("events", "user_id"),),
    "event_id": (("events", "event_id"),),
    "doc_id": (("documents", "doc_id"),),
    "vec_id": (("embeddings", "vec_id"),),
}

# constant-size dimensions are never replicated (nation=25, region=5 at
# every scale factor — the broadcast-hint whitelist in operators/joins.py
# depends on exactly this invariant)
FIXED_TABLES = ("region", "nation")

_MARKER = "_SCALE_MANIFEST.json"


def _key_cols(table: str) -> dict[str, str]:
    """column -> family for one table."""
    return {
        col: fam
        for fam, cols in KEY_FAMILIES.items()
        for t, col in cols
        if t == table
    }


def compute_strides(spark: SparkSession, src_dir: str) -> dict[str, int]:
    """Per-family offset stride: next power of ten above the family max
    across every table carrying it (one tiny agg per table)."""
    maxes: dict[str, int] = {fam: 0 for fam in KEY_FAMILIES}
    for table in TABLES:
        cols = _key_cols(table)
        if not cols:
            continue
        df = load_table(spark, src_dir, table, convert_ts=False)
        row = df.agg(*[F.max(c).alias(c) for c in cols]).first()
        for col, fam in cols.items():
            maxes[fam] = max(maxes[fam], int(row[col]))
    return {
        fam: 10 ** math.ceil(math.log10(mx + 2)) for fam, mx in maxes.items()
    }


def scaled_table(
    spark: SparkSession,
    src_dir: str,
    table: str,
    factor: int,
    strides: dict[str, int],
) -> DataFrame:
    """The table at ``factor``× as a single DataFrame (keys offset per
    replica, everything else identical).  Dimensions pass through."""
    df = load_table(spark, src_dir, table, convert_ts=False)
    if table in FIXED_TABLES or factor <= 1:
        return df
    cols = _key_cols(table)
    replicas = [
        df.select(
            *[
                (F.col(c) + F.lit(i * strides[cols[c]])).alias(c)
                if c in cols
                else F.col(c)
                for c in df.columns
            ]
        )
        for i in range(factor)
    ]
    out = replicas[0]
    for r in replicas[1:]:
        out = out.unionByName(r)
    return out


def generate(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    factor: int,
    tables: tuple[str, ...] = TABLES,
) -> dict:
    """Write the scaled directory and its manifest; returns the manifest."""
    strides = compute_strides(spark, src_dir)
    os.makedirs(out_dir, exist_ok=True)
    rows: dict[str, int] = {}
    for table in tables:
        df = scaled_table(spark, src_dir, table, factor, strides)
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        rows[table] = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
    manifest = {
        "src": os.path.abspath(src_dir),
        "factor": factor,
        "strides": strides,
        "tables": list(tables),
        "rows": rows,
    }
    with open(os.path.join(out_dir, _MARKER), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def ensure_scaled(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    factor: int,
    tables: tuple[str, ...] = TABLES,
) -> str:
    """Build ``out_dir`` if absent or built with different parameters;
    returns ``out_dir``.  The manifest makes the cache self-validating —
    a factor or table-set change regenerates instead of silently reusing
    stale data."""
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        if (
            m.get("factor") == factor
            and m.get("src") == os.path.abspath(src_dir)
            and set(m.get("tables", [])) >= set(tables)
        ):
            return out_dir
    generate(spark, src_dir, out_dir, factor, tables)
    return out_dir


# ------------------------------------------------------------------ #
# Planted hot-key corpus (round-8, VERDICT r7 item 1): the one 100 TB
# hazard pure replication cannot produce.  Replicated mirrors are EXACT
# duplicates, which every clone-quadratic defense (rep-collapse,
# _capped_groups) collapses before any join; a real crawl's boilerplate
# — near-identical text with one varying token — collapses NOTHING,
# yet floods one shingle/gram/fingerprint/cell key with a large
# fraction of all DISTINCT documents.  This generator plants exactly
# that: a fixed two-run boilerplate with a per-doc varying token in the
# middle, appended to a configurable fraction of docs, plus
# near-identical (never equal) embeddings for the same ids.
# ------------------------------------------------------------------ #

# two fixed 18-token runs around the varying token: 18 >= PASSAGE_L(15)
# + NGRAM_N(3), so each run contributes shared 15-grams (span dedup)
# and 3-shingles (Jaccard/MinHash) and >100 chars of shared winnowing
# 16-char-gram material, while the varying token in the middle keeps
# every hot document DISTINCT (no exact-dup rep to collapse).  The hk*
# tokens are corpus-novel, so the hot keys are unambiguously the
# planted ones.
_HOT_RUN_A = " ".join(f"hk{i:02d}" for i in range(1, 19))
_HOT_RUN_B = " ".join(f"hk{i:02d}" for i in range(19, 37))


def hotkey_tables(
    spark: SparkSession,
    src_dir: str,
    replicate: int,
    hot_mod: int,
) -> dict[str, DataFrame]:
    """documents + embeddings with a planted hot key.

    - documents: ``replicate``× key-offset replicas; replica i>0 gets a
      trailing ``r{i}`` marker token so replicas are near-identical but
      DISTINCT (the crawl re-crawl, not the mirror).  Every doc with
      ``doc_id % hot_mod == 0`` then gets the boilerplate appended:
      RUN_A + ``v{doc_id}`` + RUN_B — so ~1/hot_mod of all distinct
      docs share every boilerplate gram/shingle/fingerprint.
      ``hot_mod=0`` plants NO boilerplate at all: the result is the
      MIRROR-FREE scaled corpus (every doc distinct, no planted hot
      key) — the measurement corpus for paths whose cost rep-collapse
      would otherwise hide (VERDICT r7 item 4).
    - embeddings: same replication; hot vec_ids get the near-identical
      vector [1, vec_id*1e-9, 0...] — all land in ONE k-means cell with
      cosine ~1.0 to each other, but no two are bit-equal (float32
      spacing at 1e-4 is ~6e-11 < the 1e-9 id step), so the
      identical-vector rep-collapse cannot fire.  The hot CELL is the
      skew target for semantic_dedup.
    """
    strides = compute_strides(spark, src_dir)

    docs = load_table(spark, src_dir, "documents", convert_ts=False)
    reps = []
    for i in range(replicate):
        r = docs.select(
            (F.col("doc_id") + F.lit(i * strides["doc_id"])).alias("doc_id"),
            (
                F.col("text")
                if i == 0
                else F.concat(F.col("text"), F.lit(f" r{i}"))
            ).alias("text"),
            "lang",
            "source",
        )
        reps.append(r)
    d = reps[0]
    for r in reps[1:]:
        d = d.unionByName(r)
    hot = (
        (F.col("doc_id") % hot_mod) == 0 if hot_mod else F.lit(False)
    )
    d = d.select(
        "doc_id",
        F.when(
            hot,
            F.concat(
                F.col("text"),
                F.lit(" " + _HOT_RUN_A + " v"),
                F.col("doc_id").cast("string"),
                F.lit(" " + _HOT_RUN_B),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text"))

    emb = load_table(spark, src_dir, "embeddings", convert_ts=False)
    ereps = []
    for i in range(replicate):
        ereps.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * strides["vec_id"])).alias(
                    "vec_id"
                ),
                "embedding",
                "label",
            )
        )
    e = ereps[0]
    for r in ereps[1:]:
        e = e.unionByName(r)
    dim = len(emb.select("embedding").first()[0])
    hot_vec = F.concat(
        F.array(
            F.lit(1.0).cast("float"),
            (F.col("vec_id").cast("double") * F.lit(1e-9)).cast("float"),
        ),
        F.array_repeat(F.lit(0.0).cast("float"), dim - 2),
    )
    e = e.select(
        "vec_id",
        F.when(
            (F.col("vec_id") % hot_mod) == 0 if hot_mod else F.lit(False),
            hot_vec,
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    )
    return {"documents": d, "embeddings": e}


# ------------------------------------------------------------------ #
# Unique-token-space corpus (round-9, VERDICT r8 item 1): the corpus
# shape for measuring the pair-generation ENGINES at 1000x.  Marker-
# token replication (hotkey hot_mod=0) keeps replicas near-identical,
# so every doc gains replicate-1 GENUINE near-dups and the pair OUTPUT
# itself grows quadratically in the replication factor — at 1000x that
# is ~2.5B true pairs, measuring output explosion, not the engine.  A
# real crawl's near-dup cluster size does NOT scale with corpus size.
# Here every replica's token space is made disjoint (each token
# prefixed with 'r{i}_'), so cross-replica similarity is exactly zero,
# cluster sizes stay at the source corpus's own (tiny) level, and the
# probe measures what actually dominates at 100 TB: shingling,
# signatures, index build, candidate generation — all of which must
# scale linearly in corpus size.  Layers compose: prefixing an already
# prefixed corpus with a fresh tag keeps all spaces disjoint, so the
# 1000x corpus builds as 10x of the 100x one.
# ------------------------------------------------------------------ #


def _doc_stride(spark: SparkSession, src_dir: str) -> int:
    """doc_id stride for documents-only derived corpora (unique /
    repetition modes): next power of ten above the table's max id —
    compute_strides needs every base table present, which derived
    directories deliberately are not."""
    mx = int(
        load_table(spark, src_dir, "documents", convert_ts=False)
        .agg(F.max("doc_id"))
        .first()[0]
    )
    return 10 ** math.ceil(math.log10(mx + 2))


def unique_tables(
    spark: SparkSession,
    src_dir: str,
    replicate: int,
    tag: str,
) -> dict[str, DataFrame]:
    """documents replicated with disjoint token spaces: replica 0 is
    the identity, replica i>0 prefixes every whitespace token with
    ``{tag}{i}_``."""
    stride = _doc_stride(spark, src_dir)
    docs = load_table(spark, src_dir, "documents", convert_ts=False)
    reps = []
    for i in range(replicate):
        txt = (
            F.col("text")
            if i == 0
            else F.regexp_replace("text", r"(\S+)", f"{tag}{i}_$1")
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                txt.alias("text"),
                "lang",
                "source",
            )
        )
    d = reps[0]
    for r in reps[1:]:
        d = d.unionByName(r)
    return {"documents": d.withColumn("n_chars", F.length("text"))}


def ensure_unique(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    replicate: int,
    tag: str,
) -> str:
    """Build the unique-token-space corpus at ``out_dir`` if absent or
    built with different parameters (manifest-validated)."""
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        if (
            m.get("kind") == "unique"
            and m.get("src") == os.path.abspath(src_dir)
            and m.get("replicate") == replicate
            and m.get("tag") == tag
        ):
            return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rows: dict[str, int] = {}
    for table, df in unique_tables(spark, src_dir, replicate, tag).items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        rows[table] = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
    manifest = {
        "kind": "unique",
        "src": os.path.abspath(src_dir),
        "replicate": replicate,
        "tag": tag,
        "tables": ["documents"],
        "rows": rows,
    }
    with open(marker, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return out_dir


# ------------------------------------------------------------------ #
# Within-doc repetition corpus (round-9, VERDICT r8 item 4): the one
# Gopher signal the synthetic corpus never exercises — dup_ngram_
# coverage is hash-green but vacuously all-pass because no document
# repeats a 5-gram internally.  This mode plants the repetition: each
# selected doc gets its OWN opening 8 tokens appended three times, so
# every n<=8-gram inside the phrase occurs >= 3 times within the doc
# and the covered-character fraction depends on the doc's length
# (short docs cross the 0.10-0.15 Gopher thresholds and flag; long
# docs stay under — a DISCRIMINATIVE, not constant, outcome).  Using
# the doc's own prefix keeps the corpus mirror-structure untouched
# (replicas of a doc plant the same phrase) and needs no vocabulary.
# ------------------------------------------------------------------ #


def repetition_tables(
    spark: SparkSession,
    src_dir: str,
    replicate: int,
    rep_mod: int,
) -> dict[str, DataFrame]:
    """documents with planted within-doc n-gram repetition: docs with
    ``doc_id % rep_mod == 0`` get their first 8 whitespace tokens
    appended three times, THEN the corpus is replicated ``replicate``x
    with byte-identical texts (the scaled_table shape, no markers).

    Plant-then-replicate, deliberately: the doc_id stride is a power of
    ten, so every replica keeps its source's ``doc_id % rep_mod``
    residue (rep_mod | stride) and replicas remain EXACT mirrors of
    planted or unplanted sources — the per-distinct-text rep-collapse
    inside dup_ngram_coverage keeps the 6-arm gram explosion sized by
    the DISTINCT corpus, not the replicated one.  (The first, marker-
    token variant of this generator made all 50k sf1 docs distinct and
    the 300M-row gram aggregation exhausted the 32-task execution
    memory pool — an honest reminder that the operator's own
    scalability rests on that collapse.)"""
    stride = _doc_stride(spark, src_dir)
    if stride % rep_mod != 0:
        # the residue-preservation argument above REQUIRES rep_mod to
        # divide the stride; a non-divisor would silently break the
        # planted-residue and mirror invariants that the strict gate's
        # planted-count arithmetic relies on (round-9 advisor flag).
        raise ValueError(
            f"rep_mod={rep_mod} must divide the doc_id stride {stride}: "
            "replicas would not preserve doc_id % rep_mod residues"
        )
    docs = load_table(spark, src_dir, "documents", convert_ts=False)
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
    phrase = F.array_join(F.slice(toks, 1, 8), " ")
    planted = F.concat(
        F.col("text"), F.lit(" "), phrase, F.lit(" "), phrase,
        F.lit(" "), phrase,
    )
    src = docs.select(
        "doc_id",
        F.when((F.col("doc_id") % rep_mod) == 0, planted)
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
    )
    reps = [
        src.select(
            (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
            "text",
            "lang",
            "source",
        )
        for i in range(replicate)
    ]
    d = reps[0]
    for r in reps[1:]:
        d = d.unionByName(r)
    return {"documents": d.withColumn("n_chars", F.length("text"))}


def ensure_repetition(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    replicate: int,
    rep_mod: int,
) -> str:
    """Build the repetition corpus at ``out_dir`` if absent or built
    with different parameters (manifest-validated)."""
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        if (
            m.get("kind") == "repeat_v2"
            and m.get("src") == os.path.abspath(src_dir)
            and m.get("replicate") == replicate
            and m.get("rep_mod") == rep_mod
        ):
            return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rows: dict[str, int] = {}
    for table, df in repetition_tables(
        spark, src_dir, replicate, rep_mod
    ).items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        rows[table] = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
    manifest = {
        "kind": "repeat_v2",
        "src": os.path.abspath(src_dir),
        "replicate": replicate,
        "rep_mod": rep_mod,
        "tables": ["documents"],
        "rows": rows,
    }
    with open(marker, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return out_dir


def richvocab_tables(
    spark: SparkSession,
    n_docs: int,
    words_per_doc: int = 120,
    vocab: int = 60_000,
    word_min: int = 4,
    word_max: int = 12,
) -> dict[str, DataFrame]:
    """documents over a production-shaped LEXICON (round-10, VERDICT r9
    item 4): the base synthetic corpus's short-word vocabulary exhausts
    BPE at 90 learnable merges, so the batched trainer's
    scans-per-vocab claim at realistic sizes was extrapolation.  This
    mode generates ``vocab`` distinct pseudo-random words of
    ``word_min``-``word_max`` letters over a 16-letter alphabet (md5
    hex digits translated to letters — fully deterministic, no RNG
    state), drawn per document with a QUADRATIC rank skew (rank =
    floor(vocab * u^2), u uniform from xxhash64 bits) so frequencies
    are zipf-ish like a real corpus: thousands of merges become
    learnable and early merges still interact.

    Everything is JVM-expression generation — no Python row funcs, no
    driver loops — so the corpus scales to any n_docs like the other
    derived modes."""
    span = word_max - word_min + 1
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))

    def word_text(rank):
        letters = F.translate(
            F.md5(F.concat(F.lit("rv"), rank.cast("string"))),
            "0123456789abcdef",
            "abcdefghijklmnop",
        )
        ln = (
            F.pmod(F.xxhash64(F.lit("rvlen"), rank), F.lit(span))
            + F.lit(word_min)
        ).cast("int")
        return letters.substr(F.lit(1), ln)

    u = lambda j: (  # noqa: E731 — uniform in [0, 1) from hash bits
        F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(1 << 20))
        / F.lit(float(1 << 20))
    )
    ranks = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_doc)),
        lambda j: F.floor(u(j) * u(j) * F.lit(vocab)).cast("long"),
    )
    text = F.array_join(F.transform(ranks, word_text), " ")
    d = ids.select(
        "doc_id",
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
    )
    return {"documents": d.withColumn("n_chars", F.length("text"))}


def ensure_richvocab(
    spark: SparkSession,
    out_dir: str,
    n_docs: int,
    words_per_doc: int = 120,
    vocab: int = 60_000,
) -> str:
    """Build the rich-vocabulary corpus at ``out_dir`` if absent or
    built with different parameters (manifest-validated)."""
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        if (
            m.get("kind") == "richvocab"
            and m.get("n_docs") == n_docs
            and m.get("words_per_doc") == words_per_doc
            and m.get("vocab") == vocab
        ):
            return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rows: dict[str, int] = {}
    for table, df in richvocab_tables(
        spark, n_docs, words_per_doc=words_per_doc, vocab=vocab
    ).items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        rows[table] = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
    manifest = {
        "kind": "richvocab",
        "n_docs": n_docs,
        "words_per_doc": words_per_doc,
        "vocab": vocab,
        "tables": ["documents"],
        "rows": rows,
    }
    with open(marker, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return out_dir


def ensure_hotkey(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    replicate: int,
    hot_mod: int,
) -> str:
    """Build the hot-key corpus at ``out_dir`` if absent or built with
    different parameters (manifest-validated like :func:`ensure_scaled`)."""
    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            m = json.load(fh)
        if (
            m.get("kind") == "hotkey"
            and m.get("src") == os.path.abspath(src_dir)
            and m.get("replicate") == replicate
            and m.get("hot_mod") == hot_mod
        ):
            return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rows: dict[str, int] = {}
    for table, df in hotkey_tables(spark, src_dir, replicate, hot_mod).items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        rows[table] = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
    manifest = {
        "kind": "hotkey",
        "src": os.path.abspath(src_dir),
        "replicate": replicate,
        "hot_mod": hot_mod,
        "tables": ["documents", "embeddings"],
        "rows": rows,
    }
    with open(marker, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return out_dir


def main() -> None:
    import argparse

    from simplex_mapreduce_spark import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src_dir")
    ap.add_argument("out_dir")
    ap.add_argument("factor", type=int)
    args = ap.parse_args()
    spark = get_spark("scalegen")
    spark.sparkContext.setLogLevel("ERROR")
    manifest = generate(spark, args.src_dir, args.out_dir, args.factor)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
