#!/usr/bin/env python
"""Scaling evidence: the headline query set plus the fused pipeline and
the full dedup chain, measured at sf0.1 (driver testdata) AND at the
generated sf1-equivalent (10× replication, sources/scalegen.py).

For each query and scale factor this records cold wall (first run, the
bench.py measurement), steady wall (second run, codegen amortized), and
— from a collect-backed third run — the executed plan's shuffle bytes
written, shuffle count, and rows scanned, so the sf1/sf0.1 ratios show
HOW the plan scales, not just how long it took.  Also records which join
strategy AQE picked for the customer-side join of revenue_by_region at
each scale (the no-hint-on-sf-linear-frames design lever).

Usage:  python scale_bench.py            # writes SCALING.json, prints table
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simplex_mapreduce_spark import get_spark, registry  # noqa: E402
from simplex_mapreduce_spark.plans.explain import (  # noqa: E402
    executed_metrics,
    simple_plan,
)
from simplex_mapreduce_spark.sources.scalegen import ensure_scaled  # noqa: E402

from bench import HEADLINE  # noqa: E402

EXTRA = [
    "pipeline_corpus_to_sequences", "neardup_keep_best",
    # round-5 late additions: the explode-heaviest and the two-pass
    # new text reports, curve-checked like the headline set
    "topgram_repetition", "vocab_coverage", "event_rate_anomalies",
]
SRC = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scaledata/sf1")


def run_noop(spark, name, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def run_metrics(spark, name, sf_dir):
    """collect-backed run: executed metrics attach to the frame's QE."""
    df = registry.QUERIES[name](spark, sf_dir)
    t0 = time.perf_counter()
    n = len(df.collect())
    wall = time.perf_counter() - t0
    m = executed_metrics(df)
    m["rows_out"] = n
    m["collect_wall"] = round(wall, 3)
    return m, df


ORACLE_CHECK_QUERIES = [
    "q1_pricing_summary", "revenue_by_region", "join_part_lineitem",
    "window_ranking", "sessionization", "events_windows", "exact_dedup",
    "funnel_steps", "weekly_retention", "part_margin_profile",
    "quality_histogram", "langid_confusion", "customer_order_stats",
    "grouping_analytics", "q3_shipping_priority", "topk_customer_orders",
    # round-5 additions
    "topgram_repetition", "vocab_coverage", "event_rate_anomalies",
    "q5_local_supplier_volume", "ann_recall_at_k",
    "q6_forecast_revenue", "embedding_quantization",
    "value_winsorization", "streaming_event_rate_anomalies",
    "quality_weighted_sample", "pit_priority_transitions",
    "q8_market_share", "q13_order_count_distribution",
]


def check_oracles_at_sf1(spark) -> None:
    """Correctness at scale, not just speed: run a representative oracled
    subset Spark-vs-DuckDB on the sf1 data with the driver gate's strict
    compare (29 queries incl. a ~950k-row sessionization frame and every
    late-round-5 addition).  Usage:
    ``python scale_bench.py --oracles``."""
    import duckdb

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracle_utils import compare_frames
    from simplex_mapreduce_spark.sources.tables import TABLES

    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF1_DIR}/{t}.parquet/*.parquet')"
        )
    fails = []
    for n in ORACLE_CHECK_QUERIES:
        try:
            spdf = registry.QUERIES[n](spark, SF1_DIR).toPandas()
            compare_frames(spdf, duck.sql(registry.ORACLES[n]).df(), n)
            print(f"PASS {n} ({len(spdf)} rows)")
        except Exception as e:  # noqa: BLE001 — report-and-continue harness
            fails.append(n)
            print(f"FAIL {n}: {e}")
    print(f"{len(ORACLE_CHECK_QUERIES) - len(fails)}/{len(ORACLE_CHECK_QUERIES)}"
          f" sf1 oracle pass; fails={fails}")


def main() -> None:
    registry.load_all()
    spark = get_spark("simplex-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_scaled(spark, SRC, SF1_DIR, factor=10)
    if "--oracles" in sys.argv:
        check_oracles_at_sf1(spark)
        spark.stop()
        return

    names = HEADLINE + EXTRA
    out: dict = {"queries": {}, "join_choice": {}}
    for label, sf_dir in [("sf0.1", SRC), ("sf1", SF1_DIR)]:
        # warm the scan path outside any timed region
        from simplex_mapreduce_spark.operators.dedup import ensure_dedup_ingest
        from simplex_mapreduce_spark.sources.tables import TABLES

        for t in TABLES:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        # at-ingest shingling pass (idempotent; see bench.py note)
        t0 = time.perf_counter()
        ensure_dedup_ingest(spark, sf_dir)
        out.setdefault("ingest_wall", {})[label] = round(
            time.perf_counter() - t0, 3
        )
        for name in names:
            rec = out["queries"].setdefault(name, {})
            rec[f"{label}_cold"] = round(run_noop(spark, name, sf_dir), 3)
            rec[f"{label}_steady"] = round(run_noop(spark, name, sf_dir), 3)
            m, df = run_metrics(spark, name, sf_dir)
            rec[f"{label}_shuffle_mb"] = round(
                m["shuffle_bytes_written"] / 1e6, 2
            )
            rec[f"{label}_n_shuffles"] = m["n_shuffles"]
            rec[f"{label}_rows_scanned"] = m["rows_scanned"]
            rec[f"{label}_rows_out"] = m["rows_out"]
            if name == "revenue_by_region":
                plan = simple_plan(df)
                out["join_choice"][label] = {
                    "broadcast_joins": plan.count("BroadcastHashJoin"),
                    "sortmerge_joins": plan.count("SortMergeJoin"),
                    "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
                }

    for name, rec in out["queries"].items():
        c01, c1 = rec["sf0.1_steady"], rec["sf1_steady"]
        rec["steady_ratio"] = round(c1 / c01, 2) if c01 else None

    with open("SCALING.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)

    # markdown table for BASELINE.md
    hdr = (
        "| query | sf0.1 cold | sf0.1 steady | sf1 cold | sf1 steady | "
        "steady ratio (10x data) | sf1 shuffle MB | sf1 rows scanned |"
    )
    print(hdr)
    print("|" + " --- |" * 8)
    for name in names:
        r = out["queries"][name]
        print(
            f"| {name} | {r['sf0.1_cold']} | {r['sf0.1_steady']} | "
            f"{r['sf1_cold']} | {r['sf1_steady']} | {r['steady_ratio']} | "
            f"{r['sf1_shuffle_mb']} | {r['sf1_rows_scanned']} |"
        )
    print(json.dumps(out["join_choice"]))
    spark.stop()


if __name__ == "__main__":
    main()
