"""Deduplication operators over ``documents``: exact hash dedup, n-gram
Jaccard near-dup, MinHash+LSH candidate generation, SimHash bucketing,
and embedding-cosine near-dup (blocked).

The LLM-pipeline extension set (north star).  Design notes for 100 TB:

- exact dedup is a hash-groupBy on a 16-byte digest, not on the text
  itself — the shuffle carries digests, not documents;
- near-dup never does an all-pairs join: candidates come from an
  inverted shingle index (n-gram), LSH band buckets (MinHash), equal
  16-bit signatures (SimHash), or label blocks (embeddings), so the
  join fan-out is bounded by bucket sizes, and AQE's skew-join splits
  hot buckets;
- MinHash permutations are md5-based and engine-agnostic, which keeps
  the whole pipeline DuckDB-oracle-checkable (no reliance on Spark's
  murmur3 `hash()`, which DuckDB cannot reproduce).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark.functions.textfn import (
    duckdb_shingles,
    duckdb_tokens,
    shingles_col,
    tokens_col,
)
from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table

# near-dup knobs, shared by Spark impls and oracles
NGRAM_N = 3
JACCARD_THRESHOLD = 0.10
MINHASH_K = 8  # hash functions
MINHASH_BANDS = 4  # -> rows per band = K / BANDS = 2
SIMHASH_BITS = 16
COSINE_DUP_THRESHOLD = 0.90


@register(
    "exact_dedup",
    oracle="""
    SELECT content_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM (SELECT doc_id,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                     AS content_hash
          FROM documents)
    GROUP BY content_hash
    """,
)
def exact_dedup(spark, sf_dir):
    """Exact dedup on normalized content hash; keeps the smallest doc_id
    per group (the canonical survivor-selection rule)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.select("doc_id", F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# one persisted shingle-set table per (session, sf_dir): ngram-Jaccard
# and MinHash-LSH both consume it; rebuilding per query would re-shingle
# the corpus each time
_SETS_CACHE: dict = {}


def shingle_sets(docs):
    """(doc_id, shingles: array<string>) — distinct word-n-gram set per
    document, persisted.

    Persisted because every downstream consumer (both sides of the
    candidate self-join, set sizes, min-hash signatures) re-reads it,
    and Spark's exchange reuse does not fire across a broadcast/hash
    asymmetry — without materialization the tokenize+shingle subtree is
    recomputed per consumer (observed 3x).  At 100 TB this is the
    standard first stage of a dedup pipeline (the shingle table would be
    written to storage).  Keeping the *array* form cached means the
    min-hash path needs no groupBy at all (array_min projections) and
    the inverted index is just an explode of cached rows.

    ``docs``: DataFrame with (doc_id, text) — injectable for tests.
    Docs shorter than the shingle width are filtered *before* shingling
    so the expression needs no per-row CASE guard (see shingles_col)."""
    spark = docs.sparkSession
    # single-file tables scan as one split; fan the raw text out across
    # cores before the expensive per-doc shingling
    d = docs.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = d.select("doc_id", tokens_col("text").alias("toks")).filter(
        F.size("toks") >= NGRAM_N
    )
    return toks.select(
        "doc_id",
        F.array_distinct(
            shingles_col(F.col("toks"), NGRAM_N, guarded=False)
        ).alias("shingles"),
    ).persist()


def _cached_sets(spark, sf_dir):
    key = (id(spark), sf_dir)
    if key not in _SETS_CACHE:
        _SETS_CACHE[key] = shingle_sets(load_table(spark, sf_dir, "documents"))
    return _SETS_CACHE[key]


def ngram_jaccard_pairs(sets, threshold: float = JACCARD_THRESHOLD):
    """Candidate pairs via inverted shingle index + exact Jaccard.
    Core operator over any (doc_id, shingles) table."""
    index = sets.select("doc_id", F.explode("shingles").alias("sh"))
    sizes = sets.select("doc_id", F.size("shingles").alias("n_sh"))
    a, b = index.alias("a"), index.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    return (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


_DUCK_SHINGLE_INDEX = f"""
    shingle_sets AS (
        SELECT doc_id,
               list_distinct({duckdb_shingles(duckdb_tokens('text'), NGRAM_N)})
                   AS shingles
        FROM documents),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM shingle_sets),
    idx AS (SELECT doc_id, unnest(shingles) AS sh FROM shingle_sets)
"""


@register(
    "ngram_jaccard_neardup",
    oracle=f"""
    WITH {_DUCK_SHINGLE_INDEX},
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
          >= {JACCARD_THRESHOLD}
    """,
)
def ngram_jaccard_neardup(spark, sf_dir):
    """Word-{3}-gram Jaccard near-dup via inverted shingle index:
    candidates only for pairs sharing >=1 shingle (no all-pairs join),
    exact Jaccard from intersection counts + set sizes."""
    return ngram_jaccard_pairs(_cached_sets(spark, sf_dir))


def minhash_signatures(sets):
    """k md5-based min-hashes straight off the cached shingle arrays —
    pure projections (array_min over transform), no shuffle.  String-min
    over uniform hex digests is a valid random min-hash, and md5 is
    identical in Spark and DuckDB."""
    def mh(i: int):
        # factory keeps the lambda single-arg: F.transform dispatches on
        # the callable's arity (2 params would mean (element, index))
        return F.array_min(
            F.transform(
                F.col("shingles"), lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))
            )
        ).alias(f"mh_{i}")

    return sets.select("doc_id", *[mh(i) for i in range(MINHASH_K)])


def minhash_candidate_pairs(sets):
    """MinHash+LSH candidate pairs over any (doc_id, shingles) table."""
    mh = minhash_signatures(sets)
    r = MINHASH_K // MINHASH_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bnd).alias("band_id"),
                F.concat_ws(
                    "|", *[F.col(f"mh_{i}") for i in range(bnd * r, (bnd + 1) * r)]
                ).alias("sig"),
            )
            for bnd in range(MINHASH_BANDS)
        ]
    )
    bands = mh.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_id", "b.sig"
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "minhash_lsh_candidates",
    oracle=f"""
    WITH {_DUCK_SHINGLE_INDEX},
    mh AS (
        SELECT doc_id,
               {", ".join(f"min(md5('{i}|' || sh)) AS mh_{i}" for i in range(MINHASH_K))}
        FROM idx GROUP BY doc_id),
    bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band_id, "
            + " || '|' || ".join(
                f"mh_{i}" for i in range(
                    b * (MINHASH_K // MINHASH_BANDS),
                    (b + 1) * (MINHASH_K // MINHASH_BANDS),
                )
            )
            + " AS sig FROM mh"
            for b in range(MINHASH_BANDS)
        )})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def minhash_lsh_candidates(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs: shingle -> k min-hashes ->
    band signatures -> bucket self-join.  Probability a pair with
    Jaccard j collides: 1-(1-j^r)^b with r=2, b=4."""
    return minhash_candidate_pairs(_cached_sets(spark, sf_dir))


@register(
    "simhash_buckets",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct({duckdb_tokens('text')})) AS tok
        FROM documents),
    bits AS (
        SELECT doc_id, i,
               CASE WHEN substr(md5(tok), i + 1, 1) BETWEEN '8' AND 'f'
                    THEN 1 ELSE -1 END AS vote
        FROM toks, range({SIMHASH_BITS}) t(i)),
    sig AS (
        SELECT doc_id,
               string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY i)
                   AS simhash
        FROM (SELECT doc_id, i, sum(vote) AS s FROM bits GROUP BY doc_id, i)
        GROUP BY doc_id)
    SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc_id
    FROM sig GROUP BY simhash
    """,
)
def simhash_buckets(spark, sf_dir):
    """{16}-bit SimHash per document (per-bit majority vote over md5 bits
    of its distinct tokens), grouped into buckets — equal-signature docs
    are near-dup candidates.  Bit i is the high bit of hex digit i of
    md5(token), so Spark and DuckDB compute identical signatures."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("tok")
    )
    bits = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("i"),
        F.md5(F.col("tok")).alias("h"),
    ).select(
        "doc_id",
        "i",
        F.when(
            F.col("h").substr(F.col("i") + 1, F.lit(1)).between("8", "f"), F.lit(1)
        )
        .otherwise(-1)
        .alias("vote"),
    )
    votes = bits.groupBy("doc_id", "i").agg(F.sum("vote").alias("s"))
    sig = (
        votes.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", "s"))
                    ),
                    lambda x: F.when(x["s"] > 0, "1").otherwise("0"),
                ),
                "",
            ).alias("simhash")
        )
    )
    return sig.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


@register(
    "embedding_neardup",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) >= {COSINE_DUP_THRESHOLD}
    """,
)
def embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup with label blocking: pairs are only
    formed inside a block (at scale: LSH bucket / IVF cell), never
    all-pairs.  Dot products via JVM higher-order functions."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    a = emb.alias("a")
    b = emb.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (
        F.sqrt(dot(F.col("a.e"), F.col("a.e")))
        * F.sqrt(dot(F.col("b.e"), F.col("b.e")))
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= COSINE_DUP_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cos_sim"),
        )
    )
