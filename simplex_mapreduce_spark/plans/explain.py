"""Physical-plan introspection helpers.

The reference has no plan IR at all — its "plan" is a hardcoded phase
sequence (src/mapreduce.go:344-355).  Here the plan is Catalyst's; these
helpers let tests and the bench assert the plans we actually want at
scale: filters pushed to the parquet scan, pruned read schemas, wide
whole-stage-codegen spans, broadcast joins for dimension tables.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears inside a PushedFilters: [...] list."""
    plan = formatted_plan(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    return all(f in pushed for f in fragments)


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema (column-pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(p.split(":")[0].strip() for p in m.group(1).split(",") if p.strip())
    return cols


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (the ``*(n)`` operator prefix
    in simple mode).  With AQE, call after an action so the final plan
    is materialized."""
    return len(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))


def is_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def executed_metrics(df: DataFrame) -> dict[str, int]:
    """Aggregate SQL metrics off the EXECUTED physical plan: total
    shuffle bytes/records written, number of shuffle exchanges, and rows
    scanned from files.

    Call after an action that ran the DataFrame's OWN QueryExecution
    (``collect()`` / ``toPandas()``) — the ``write`` path executes a
    separate QueryExecution whose metrics never attach to ``df``.
    Traverses adaptive plans (AdaptiveSparkPlanExec → executedPlan,
    QueryStageExec → plan); reused exchanges are counted once."""
    totals = {
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "n_shuffles": 0,
        "rows_scanned": 0,
        # summed "spill size" across every operator exposing it (sorts,
        # hash aggregates, window buffers) — the spill-drill evidence
        "spill_bytes": 0,
    }
    seen: set[int] = set()

    def metric(node, key: str) -> int:
        m = node.metrics()
        opt = m.get(key)
        return int(opt.get().value()) if opt.isDefined() else 0

    def walk(node):
        node_id = node.id()
        if node_id in seen:
            return
        seen.add(node_id)
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if "QueryStageExec" in cls:
            walk(node.plan())
            return
        if "ShuffleExchange" in cls:
            totals["n_shuffles"] += 1
            totals["shuffle_bytes_written"] += metric(node, "shuffleBytesWritten")
            totals["shuffle_records_written"] += metric(
                node, "shuffleRecordsWritten"
            )
        if "FileSourceScan" in cls or "BatchScan" in cls:
            totals["rows_scanned"] += metric(node, "numOutputRows")
        totals["spill_bytes"] += metric(node, "spillSize")
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())  # type: ignore[attr-defined]
    return totals


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast hints in the ANALYZED logical plan.

    An explicit ``F.broadcast()`` overrides autoBroadcastJoinThreshold,
    so every hint is a scale liability unless the hinted frame is
    constant-size — tests whitelist the allowed count per query."""
    analyzed = df._jdf.queryExecution().analyzed().toString()  # type: ignore[attr-defined]
    return analyzed.count("ResolvedHint")


def main() -> None:
    """CLI: inspect any registered query's physical plan.

    python -m simplex_mapreduce_spark.plans.explain --list
    python -m simplex_mapreduce_spark.plans.explain <query> [sf_dir]
    """
    import argparse

    from simplex_mapreduce_spark import get_spark, registry

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--list", action="store_true", help="list registered queries"
    )
    args = ap.parse_args()
    registry.load_all()
    if args.list or not args.query:
        window = set(list(registry.ordered_queries())[:50])
        for n in registry.ordered_queries():
            tag = (
                "oracled(window)"
                if n in registry.ORACLES and n in window
                else "oracled(local)"
                if n in registry.ORACLES
                else "rows-only"
            )
            print(f"{n:40s} {tag}")
        return
    if args.query not in registry.QUERIES:
        raise SystemExit(f"unknown query {args.query!r} (use --list)")
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    print(formatted_plan(registry.QUERIES[args.query](spark, args.sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
