"""Driver-contract window invariants.

The driver's CORRECTNESS gate hash-checks only the FIRST 50 entries of
``queries()`` (registration order) against the DuckDB oracles.  These
tests pin the two structural guarantees that keep every oracled query
inside that window:

1. ``queries()`` emits all oracled queries before any rows-only query;
2. the oracled-query count is <= 50, so none falls off the end.

If (2) ever fails, consolidate another query family (see the
"[round-1 queries: ...]" merge notes across operators/) rather than
letting an oracled query silently lose its driver verification.
"""

from __future__ import annotations

DRIVER_WINDOW = 50


def test_all_oracled_queries_inside_driver_window():
    import __spark_entry__ as entry

    names = list(entry.queries())
    oracles = entry.oracle_sql()
    oracled_positions = [i for i, n in enumerate(names) if n in oracles]
    assert oracled_positions, "no oracled queries registered?"
    assert max(oracled_positions) < DRIVER_WINDOW, (
        f"{len(oracled_positions)} oracled queries but position "
        f"{max(oracled_positions)} >= {DRIVER_WINDOW}: "
        + ", ".join(
            n for i, n in enumerate(names) if n in oracles and i >= DRIVER_WINDOW
        )
    )


def test_oracled_before_rows_only():
    import __spark_entry__ as entry

    names = list(entry.queries())
    oracles = entry.oracle_sql()
    flags = [n in oracles for n in names]
    first_rows_only = flags.index(False) if False in flags else len(flags)
    assert all(not f for f in flags[first_rows_only:]), (
        "rows-only queries must come after every oracled query"
    )


def test_queries_and_oracles_consistent():
    import __spark_entry__ as entry

    names = set(entry.queries())
    assert set(entry.oracle_sql()) <= names
