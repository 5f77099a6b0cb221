"""Query registry: the single source of truth for the driver contract.

Every operator/query the engine claims (SURVEY.md §2) registers here as

- a Spark callable ``(SparkSession, sf_dir) -> DataFrame``, and
- (when SQL-expressible) a DuckDB oracle SQL string over the same
  parquet tables, producing identical column names and identically
  rounded values.

``__spark_entry__.py`` re-exports these as ``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}
# Oracled queries rotated OUT of the driver's 50-slot hash window
# (round-5 rotation, VERDICT r4 item 2): they keep their oracle — the
# local gate (tests/test_oracle_queries.py) still checks them every run
# — but sort after the in-window oracled queries so newly promoted
# queries get the driver's hash rows instead.  Only multi-round-stable
# queries belong here.
DEPRIORITIZED: set[str] = set()

# Per-round window rotation (round 12): the decorator flags record each
# query's LONG-TERM priority; these two sets flip that default for the
# current round only, so a rotation is one reviewable edit here instead
# of dozens of scattered decorator changes.  Applied exactly once at the
# end of load_all().  Discipline: |PROMOTE| == |DEMOTE| keeps the window
# exactly full; promote the queries the driver has not hash-checked
# longest (plus anything whose implementation changed since the last
# driver window), demote only multi-round hash-green queries — the local
# 133-oracle pytest gate still verifies every demoted query each run.
#
# Round-12 rotation: the r9-r11 windows re-verified the LLM-pipeline and
# streaming families three rounds straight while the TPC-H q-series, the
# bench headliners, and the relational/window/join surface last saw a
# driver hash row in r8 or earlier — and the scan-width gate
# (sources/tables.py spread_scan, round-11 advisory fix) changed under
# ngram_counts/signature_buckets without a driver re-check.  Kept in the
# window regardless of tenure: everything whose implementation moved
# post-r11 (ngram_jaccard_neardup's verify-join strategy, the sidecar
# epoch stamps, the staged winnow/IVF streaming ingest, the fuzzy join's
# null guard) plus the two flagship parity queries (q1_pricing_summary,
# mr_wordcount).
ROTATION_PROMOTE: frozenset[str] = frozenset({
    # TPC-H q-series (last driver-checked r8)
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q10_returned_items", "q13_order_count_distribution", "q18_large_orders",
    "q19_disjunctive_revenue", "q22_idle_balances",
    # bench headliners not currently hash-checked by the driver
    "revenue_by_region", "join_part_lineitem", "window_order_seq",
    "sessionization", "events_windows", "ngram_counts", "exact_dedup",
    "minhash_lsh_candidates", "cosine_topk", "ann_ivf_topk",
    # relational / window / join / UDx surface (last driver-checked r8-)
    "scan_filter_project", "set_ops", "scalar_functions", "array_functions",
    "string_functions", "grouping_analytics", "topk_customer_orders",
    "asof_join", "range_join_bands", "scd2_customer_priority",
    "pit_priority_transitions", "weighted_avg_udaf", "doc_chunks_udtf",
    "variant_props", "pivot_events", "unpivot_events", "weekly_retention",
    "signature_buckets", "supplier_pagerank",
})
ROTATION_DEMOTE: frozenset[str] = frozenset({
    # text/BPE/span family: hash-green r9+r10+r11, implementation
    # untouched post-r11
    "winnowing_overlap", "winnowing_overlap_stored", "split_leakage_report",
    "cross_source_duplication", "bpe_pair_counts", "bpe_train",
    "bpe_train_batched", "bpe_encode", "bpe_encode_stored",
    "duplicate_text_spans", "duplicate_text_spans_keep_first",
    "strip_duplicate_spans", "doc_bigram_logprob", "memorization_risk",
    "vocab_growth", "nb_source_classifier", "gopher_quality_rules",
    # selection/mixture family: hash-green three rounds straight
    "mixture_report", "mixture_temperature", "dsir_importance",
    "dsir_resample", "domain_divergence",
    # cluster/embedding family: hash-green three rounds straight
    "neardup_clusters", "neardup_keep_best", "decontaminate_spans",
    "embedding_quantization", "semantic_dedup", "pca_top_component",
    "pca_top2_components", "embedding_outliers",
    # misc + streaming family: hash-green three rounds straight (the
    # dedup_stream-adjacent streaming_exact_dedup /
    # streaming_dedup_within_watermark stay in-window — that module
    # changed post-r11)
    "corpus_snapshot_diff", "format_roundtrip_nation",
    "streaming_quality_gate", "streaming_quality_filter",
    "streaming_enriched_by_nation", "streaming_click_purchase_join",
    "streaming_click_purchase_left_outer", "streaming_stateful_user_totals",
    "streaming_event_rate_anomalies", "stateful_user_activity",
})
_rotation_applied = False


def register(name: str, oracle: str | None = None, deprioritized: bool = False):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is ANSI SQL runnable by DuckDB against views named
    region/nation/customer/supplier/part/orders/lineitem/events/
    documents/embeddings.  Omit for non-SQL-expressible ops (the driver
    then records a weaker rows-only check).

    ``deprioritized=True`` keeps the oracle for the LOCAL equivalence
    gate but yields the query's driver-window slot to a newer query
    (the driver hash-checks only the first 50 entries of ``queries()``).
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        if deprioritized:
            if oracle is None:
                raise ValueError(f"{name}: deprioritized implies oracled")
            DEPRIORITIZED.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run,
    then apply the round's window rotation overrides (exactly once)."""
    global _rotation_applied
    import simplex_mapreduce_spark.operators  # noqa: F401
    import simplex_mapreduce_spark.sources.sinks  # noqa: F401 — registers
    # the driver-verified format roundtrip
    import simplex_mapreduce_spark.streaming  # noqa: F401

    if not _rotation_applied:
        # a promotion must name a query the decorators rotated out, a
        # demotion one they left active — a stale name (renamed or
        # removed query) fails loudly instead of silently shrinking or
        # draining the window.  Explicit raises (not assert): under
        # `python -O` asserts are stripped while the DEPRIORITIZED
        # mutations below would still run, which is exactly the silent
        # window-drain this guard exists to prevent.
        if not ROTATION_PROMOTE <= DEPRIORITIZED:
            raise ValueError(
                f"stale promote entries: {sorted(ROTATION_PROMOTE - DEPRIORITIZED)}"
            )
        if not ROTATION_DEMOTE <= set(ORACLES) - DEPRIORITIZED:
            raise ValueError(
                f"stale demote entries: "
                f"{sorted(ROTATION_DEMOTE - (set(ORACLES) - DEPRIORITIZED))}"
            )
        DEPRIORITIZED.difference_update(ROTATION_PROMOTE)
        DEPRIORITIZED.update(ROTATION_DEMOTE)
        _rotation_applied = True


def ordered_queries() -> dict[str, Callable[..., Any]]:
    """Registry in driver-contract order: every oracled query first (in
    registration order), rows-only queries last.

    The driver's correctness gate hash-checks the first 50 entries of
    ``queries()`` against the DuckDB oracles; emitting oracled queries
    first guarantees each one gets a hard hash-verified row, and the few
    genuinely non-SQL-expressible queries (approximate sketches, stubbed
    multimodal decode, Python custom-operator paths) — which would only
    ever get the weaker rows-only check — sit at the end.
    ``tests/test_registry_window.py`` pins the invariant that all
    oracled queries fit inside the 50-slot window.
    """
    ordered = {
        n: fn
        for n, fn in QUERIES.items()
        if n in ORACLES and n not in DEPRIORITIZED
    }
    # rotated-out oracled queries: still ahead of rows-only (a driver
    # that checks oracles beyond the window gets extra hash rows free)
    ordered.update(
        {n: fn for n, fn in QUERIES.items() if n in ORACLES and n in DEPRIORITIZED}
    )
    ordered.update({n: fn for n, fn in QUERIES.items() if n not in ORACLES})
    return ordered
