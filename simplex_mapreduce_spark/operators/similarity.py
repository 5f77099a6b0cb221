"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (the exact baseline) and an IVF-style bucketed variant (the scale
path).

At 100 TB the brute-force scan is one pass over the corpus with a
per-partition top-k heap (TakeOrderedAndProject — no global sort); the
IVF variant prunes that scan to nprobe/ncells of the data after a
broadcast argmax assignment, which is how a real distributed ANN layout
(IVF cells as partition keys) would run.  Dot products use JVM
higher-order functions (zip_with + aggregate) — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table

QUERY_VEC_ID = 0
TOP_K = 10
IVF_CELLS = 8  # centroids = embeddings of vec_id 0..7 (deterministic "training")
IVF_NPROBE = 2

_DUCK_COS = (
    "list_dot_product(a.e, q.e) "
    "/ (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(q.e, q.e)))"
)


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


def _cos(x, y):
    return _dot(x, y) / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))


@register(
    "cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT e FROM v WHERE vec_id = {QUERY_VEC_ID})
    SELECT a.vec_id, round({_DUCK_COS}, 4) AS cos_sim
    FROM v a, q
    WHERE a.vec_id <> {QUERY_VEC_ID}
    ORDER BY {_DUCK_COS} DESC, a.vec_id
    LIMIT {TOP_K}
    """,
)
def cosine_topk(spark, sf_dir):
    """Brute-force cosine top-{10} against the query vector (vec_id 0):
    broadcast the 1-row query side, one scan, per-partition heap."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe")
    )
    cos = _cos(F.col("e"), F.col("qe"))
    return (
        v.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("_cos", 4).alias("cos_sim"))
    )


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cent AS (SELECT vec_id AS cell_id, e FROM v WHERE vec_id < {IVF_CELLS}),
    assigned AS (
        SELECT vec_id, cell_id FROM (
            SELECT a.vec_id, cent.cell_id,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_DUCK_COS.replace('q.e', 'cent.e')} DESC,
                                cent.cell_id) AS rn
            FROM v a, cent)
        WHERE rn = 1),
    q AS (SELECT e FROM v WHERE vec_id = {QUERY_VEC_ID}),
    probe AS (
        SELECT cell_id FROM (
            SELECT cent.cell_id,
                   row_number() OVER (
                       ORDER BY list_dot_product(cent.e, q.e)
                                / (sqrt(list_dot_product(cent.e, cent.e))
                                   * sqrt(list_dot_product(q.e, q.e))) DESC,
                                cent.cell_id) AS rn
            FROM cent, q)
        WHERE rn <= {IVF_NPROBE})
    SELECT a.vec_id, round({_DUCK_COS}, 4) AS cos_sim
    FROM v a
    JOIN assigned ON assigned.vec_id = a.vec_id
    JOIN probe    ON probe.cell_id = assigned.cell_id
    CROSS JOIN q
    WHERE a.vec_id <> {QUERY_VEC_ID}
    ORDER BY {_DUCK_COS} DESC, a.vec_id
    LIMIT {TOP_K}
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k: assign every vector to its nearest of
    {8} deterministic centroids (broadcast argmax — at scale this
    assignment is the partitioning key of the stored index), probe the
    {2} cells nearest the query, exact top-k inside the probed cells."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cent = v.filter(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("e").alias("ce")
    )
    # assignment: argmax cosine over broadcast centroids via max_by on
    # (sim, -cell_id) — same tie-break as the oracle's row_number
    # (sim DESC, cell_id ASC) without a window shuffle
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "e", "cell_id", _cos(F.col("e"), F.col("ce")).alias("_sim")
        )
        .groupBy("vec_id")
        .agg(
            F.first("e").alias("e"),
            F.max_by(
                "cell_id", F.struct(F.col("_sim"), (-F.col("cell_id")).alias("nc"))
            ).alias("cell_id"),
        )
    )
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("qe"))
    probe = (
        cent.crossJoin(F.broadcast(q))
        .select("cell_id", _cos(F.col("ce"), F.col("qe")).alias("_sim"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.col("_sim").desc(), "cell_id")))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("cell_id")
    )
    cos = _cos(F.col("e"), F.col("qe"))
    return (
        assigned.join(F.broadcast(probe), "cell_id")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("_cos", 4).alias("cos_sim"))
    )


@register(
    "embedding_dim_means",
    oracle="""
    SELECT i + 1 AS pos, round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) AS dim_mean
    FROM embeddings, range(64) t(i)
    GROUP BY pos
    """,
)
def embedding_dim_means(spark, sf_dir):
    """Dimension-wise mean across all vectors (the corpus centroid —
    the reduction an IVF trainer runs per cell at scale), via
    posexplode -> groupBy(position)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode(F.col("embedding").cast("array<double>")).alias("p", "v"))
        .groupBy((F.col("p") + 1).cast("long").alias("pos"))
        .agg(F.round(F.avg("v"), 6).alias("dim_mean"))
    )


LSH_PLANES = 12  # random-hyperplane signature bits


@register(
    "embedding_lsh_buckets",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id, i AS d, CAST(embedding[i + 1] AS DOUBLE) AS val
        FROM embeddings, range(64) t(i)),
    signed AS (
        SELECT vec_id, p.p,
               CASE WHEN substr(md5(p.p || '|' || d), 1, 1) BETWEEN '8' AND 'f'
                    THEN val ELSE -val END AS sval
        FROM dims, range({LSH_PLANES}) p(p)),
    sig AS (
        SELECT vec_id,
               string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
                   AS bucket
        FROM (SELECT vec_id, p, sum(sval) AS s FROM signed GROUP BY vec_id, p)
        GROUP BY vec_id)
    SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec_id
    FROM sig GROUP BY bucket
    """,
)
def embedding_lsh_buckets(spark, sf_dir):
    """Random-hyperplane (sign) LSH over embeddings: {12} deterministic
    +/-1 hyperplanes (sign of md5(plane|dim) high bit), bucket =
    sign-bit string of the projections.  Same-bucket vectors are ANN
    candidates — the blocking scheme that replaces label blocking when
    no labels exist.  At scale the bucket is the partition key of the
    stored index."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "val"),
    )
    planes = dims.select(
        "vec_id",
        "val",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(LSH_PLANES - 1))).alias("p"),
    )
    sval = F.when(
        F.md5(F.concat_ws("|", F.col("p"), F.col("d")))
        .substr(1, 1)
        .between("8", "f"),
        F.col("val"),
    ).otherwise(-F.col("val"))
    sums = (
        planes.select("vec_id", "p", sval.alias("sval"))
        .groupBy("vec_id", "p")
        .agg(F.sum("sval").alias("s"))
    )
    sig = sums.groupBy("vec_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "s"))),
                lambda x: F.when(x["s"] > 0, "1").otherwise("0"),
            ),
            "",
        ).alias("bucket")
    )
    return sig.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("min_vec_id")
    )
