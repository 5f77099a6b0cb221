"""Skew-handling join utility: key salting.

AQE's skew-join split handles most skew at runtime; explicit salting is
the tool for *pathological* hot keys (one key = 30% of a 100 TB fact
table) where even split partitions overwhelm a single reducer's build
side.  Mechanics:

- fact side: append a uniform salt in [0, salt) to the key;
- dim side: replicate each row ``salt`` times (explode), so every
  (key, salt_i) bucket finds its match;
- join on (key, salt) — the hot key's rows now spread over ``salt``
  reducers.

Results are identical to the unsalted join (asserted in
tests/test_scale_utils.py); the salt uses a hash of the fact row's full tuple
(not rand()) so re-executed tasks salt deterministically — the same
exactly-once-output-under-retry property the reference gets from
idempotent file overwrite (src/mapreduce.go:195).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


@dataclass(frozen=True)
class SkewReport:
    """Driver-side skew diagnostic for one key column.  ``top`` holds
    (key_value, n, frac_of_total, skew_ratio) for the k heaviest keys;
    skew_ratio is n / mean-rows-per-key — the factor by which the key's
    reducer outweighs the average one."""

    key: str
    total_rows: int
    n_keys: int
    max_key_rows: int
    mean_key_rows: float
    top: list  # list[Row]

    @property
    def max_skew_ratio(self) -> float:
        return self.max_key_rows / self.mean_key_rows if self.mean_key_rows else 0.0


def key_skew_report(df: DataFrame, key: str, k: int = 20) -> SkewReport:
    """Measure, don't guess: before choosing salt/AQE/broadcast for a
    join or aggregation, quantify how skewed the key actually is.

    One scan + one partial-aggregated shuffle builds the per-key
    counts; the counts (one row per distinct key — small even when the
    input is 100 TB) are persisted so the summary aggregate and the
    top-k sort are memory-local second passes, then unpersisted.  This
    is a deliberately EAGER diagnostic (it returns numbers, not a
    plan); the k-row collect is the point, not an anti-pattern."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).persist()
    try:
        s = counts.agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
            F.count(F.lit(1)).alias("n_keys"),
            F.coalesce(F.max("n"), F.lit(0)).alias("mx"),
        ).first()
        mean = s["total"] / s["n_keys"] if s["n_keys"] else 0.0
        top = (
            counts.orderBy(F.desc("n"), F.col(key))
            .limit(k)
            .select(
                F.col(key).cast("string").alias("key_value"),
                "n",
                F.round(F.col("n") / F.lit(max(s["total"], 1)), 6).alias(
                    "frac_of_total"
                ),
                F.round(F.col("n") / F.lit(mean if mean else 1.0), 2).alias(
                    "skew_ratio"
                ),
            )
            .collect()
        )
    finally:
        counts.unpersist()
    return SkewReport(
        key=key,
        total_rows=s["total"],
        n_keys=s["n_keys"],
        max_key_rows=s["mx"],
        mean_key_rows=mean,
        top=top,
    )

# join types whose result is unchanged by replicating the dim side:
# inner/left only emit dim rows that matched a fact row, and semi/anti
# only test existence.  right/full_outer would emit every unmatched dim
# row `salt` times (duplicated null-extended rows) — put the preserved
# side on the fact and use `left` instead.
_SALT_SAFE_JOINS = frozenset({"inner", "left", "left_outer", "left_semi", "left_anti"})


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` with an n-way salted key.  ``dim`` is
    replicated ``salt`` times — keep it the small side.

    ``how`` is restricted to joins that preserve only the fact side
    (see _SALT_SAFE_JOINS): replication would duplicate unmatched dim
    rows under right/full_outer semantics."""
    if how not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_JOINS)}, got {how!r}: "
            "dim replication would duplicate unmatched dim rows under "
            f"{how!r} semantics (flip the join so the preserved side is "
            "the fact, or dedupe downstream)"
        )
    fact_salted = fact.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)),
    )
    dim_salted = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>")),
    )
    joined = fact_salted.join(
        dim_salted,
        (fact_salted[fact_key] == dim_salted[dim_key])
        & (fact_salted[SALT_COL] == dim_salted[SALT_COL]),
        how,
    )
    return joined.drop(SALT_COL)
