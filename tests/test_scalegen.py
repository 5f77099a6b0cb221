"""Scale-generator integrity: the replicated corpus must preserve
referential integrity, multiply row counts exactly, keep dimensions
fixed, and be deterministic — the properties the published scaling
numbers (BASELINE.md round 5) rest on."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark.sources.scalegen import (
    FIXED_TABLES,
    compute_strides,
    ensure_scaled,
    generate,
    scaled_table,
)
from tests.conftest import SF_DIR

FACTOR = 3


def test_scaled_tables_multiply_and_preserve_foreign_keys(spark):
    strides = compute_strides(spark, SF_DIR)
    orders = scaled_table(spark, SF_DIR, "orders", FACTOR, strides)
    lineitem = scaled_table(spark, SF_DIR, "lineitem", FACTOR, strides)
    customer = scaled_table(spark, SF_DIR, "customer", FACTOR, strides)

    import duckdb

    n_orders_src = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchone()[0]
    assert orders.count() == FACTOR * n_orders_src

    # every scaled lineitem still references an existing scaled order,
    # and every scaled order an existing scaled customer — zero dangling
    dangling_li = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).count()
    assert dangling_li == 0
    dangling_o = orders.join(
        customer.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    ).count()
    assert dangling_o == 0

    # replicas never collide: key count multiplies exactly
    assert (
        orders.select("o_orderkey").distinct().count() == FACTOR * n_orders_src
    )

    # non-key columns are byte-identical across replicas: the per-replica
    # total order value is constant
    stride = strides["orderkey"]
    per_replica = (
        orders.groupBy((F.col("o_orderkey") / stride).cast("long").alias("r"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
        .collect()
    )
    assert len(per_replica) == FACTOR
    assert len({r["s"] for r in per_replica}) == 1


def test_dimensions_stay_fixed(spark):
    strides = compute_strides(spark, SF_DIR)
    for t in FIXED_TABLES:
        src_rows = sorted(
            map(tuple, scaled_table(spark, SF_DIR, t, 1, strides).collect())
        )
        scaled_rows = sorted(
            map(tuple, scaled_table(spark, SF_DIR, t, FACTOR, strides).collect())
        )
        assert src_rows == scaled_rows, t


def test_manifest_cache_is_self_validating(spark, tmp_path):
    out = str(tmp_path / "scaled")
    m1 = generate(spark, SF_DIR, out, 2, tables=("region", "nation", "documents"))
    assert m1["rows"]["documents"] == 2 * m1["rows"]["documents"] // 2
    # same parameters: reuse without regenerating (manifest mtime stable)
    import os

    marker = os.path.join(out, "_SCALE_MANIFEST.json")
    mtime = os.path.getmtime(marker)
    ensure_scaled(spark, SF_DIR, out, 2, tables=("region", "nation", "documents"))
    assert os.path.getmtime(marker) == mtime
    # factor change: regenerates
    ensure_scaled(spark, SF_DIR, out, 3, tables=("region", "nation", "documents"))
    import json

    assert json.load(open(marker))["factor"] == 3
