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
    """Import every operator module so registration side-effects run."""
    import simplex_mapreduce_spark.operators  # noqa: F401
    import simplex_mapreduce_spark.sources.sinks  # noqa: F401 — registers
    # the driver-verified format roundtrip
    import simplex_mapreduce_spark.streaming  # noqa: F401


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
