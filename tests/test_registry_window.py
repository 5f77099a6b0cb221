"""Driver-contract window invariants.

The driver's CORRECTNESS gate hash-checks only the FIRST 50 entries of
``queries()`` (registration order) against the DuckDB oracles.  These
tests pin the two structural guarantees that keep every oracled query
inside that window:

1. ``queries()`` emits all oracled queries before any rows-only query;
2. every oracled query NOT consciously rotated out (registry.
   DEPRIORITIZED, round-5 rotation) sits inside the first 50 slots.

If (2) ever fails, consolidate another query family (see the
"[round-1 queries: ...]" merge notes across operators/) or rotate a
multi-round-stable query out, rather than letting an oracled query
silently lose its driver verification.
"""

from __future__ import annotations

DRIVER_WINDOW = 50


def test_all_active_oracled_queries_inside_driver_window():
    import __spark_entry__ as entry
    from simplex_mapreduce_spark import registry

    names = list(entry.queries())
    oracles = entry.oracle_sql()
    active = [
        i
        for i, n in enumerate(names)
        if n in oracles and n not in registry.DEPRIORITIZED
    ]
    assert active, "no oracled queries registered?"
    assert max(active) < DRIVER_WINDOW, (
        f"{len(active)} active oracled queries but position "
        f"{max(active)} >= {DRIVER_WINDOW}: "
        + ", ".join(
            n
            for i, n in enumerate(names)
            if n in oracles and n not in registry.DEPRIORITIZED
            and i >= DRIVER_WINDOW
        )
    )


def test_deprioritized_are_oracled_and_stable():
    """A rotated-out query must still carry its oracle (the local gate
    keeps checking it) — rotation never silently drops verification."""
    from simplex_mapreduce_spark import registry

    assert registry.DEPRIORITIZED <= set(registry.ORACLES)
    # rotation is deliberate and small: the window should be FULL of
    # hash-checked queries, not drained by over-rotation
    n_active = len(set(registry.ORACLES) - registry.DEPRIORITIZED)
    assert n_active == DRIVER_WINDOW, (
        f"{n_active} active oracled queries — keep the driver window "
        f"exactly full ({DRIVER_WINDOW})"
    )


def test_rotation_sets_well_formed():
    """The per-round rotation overrides (registry.ROTATION_PROMOTE /
    ROTATION_DEMOTE, round-12 centralization) must be disjoint, equal in
    size (the window stays exactly full), and resolve to real oracled
    queries — load_all() itself asserts the promote set names
    decorator-deprioritized queries and the demote set decorator-active
    ones, so a stale entry after any registry edit fails loudly here."""
    import __spark_entry__  # noqa: F401 — triggers load_all + its asserts
    from simplex_mapreduce_spark import registry

    assert not (registry.ROTATION_PROMOTE & registry.ROTATION_DEMOTE)
    assert len(registry.ROTATION_PROMOTE) == len(registry.ROTATION_DEMOTE)
    assert registry.ROTATION_PROMOTE <= set(registry.ORACLES)
    assert registry.ROTATION_DEMOTE <= set(registry.ORACLES)
    # post-rotation state: promoted queries are in-window, demoted out
    assert not (registry.ROTATION_PROMOTE & registry.DEPRIORITIZED)
    assert registry.ROTATION_DEMOTE <= registry.DEPRIORITIZED


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
