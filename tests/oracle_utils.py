"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count + schema (column names) + order-insensitive value comparison,
with column order normalized by name."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # canonical row order: stringify every cell (stable for mixed types),
    # floats rounded first so last-bit noise cannot reorder rows
    def key(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ""
        if isinstance(v, float):
            return f"{round(v, 6):.6f}"
        return str(v)

    sort_key = df.apply(lambda row: "|".join(key(v) for v in row), axis=1)
    return df.assign(_k=sort_key).sort_values("_k").drop(columns="_k").reset_index(
        drop=True
    )


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        # dtype-strict gate (r2 lesson): the driver hashes stringified
        # values, so an integer column on one side vs float on the other
        # ("-1" vs "-1.0", "8912" vs "8912.0") hash-mismatches even though
        # a tolerance compare passes. Fail fast on int-vs-float drift —
        # unless the float side is only float because nulls forced pandas
        # to float64 (nullable ints can't live in an int64 Series).
        kinds = {sv.dtype.kind, dv.dtype.kind}
        if "f" in kinds and kinds & {"i", "u"}:
            fl = sv if sv.dtype.kind == "f" else dv
            if not fl.isna().any():
                raise AssertionError(
                    f"{name}.{col}: dtype drift {sv.dtype} vs {dv.dtype} — "
                    "int-vs-float stringifies differently under the driver's "
                    "hash; cast one side (see VERDICT r2 items 1-2)"
                )
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sa = pd.to_numeric(sv, errors="coerce")
            da = pd.to_numeric(dv, errors="coerce")
            both_nan = sa.isna() & da.isna()
            close = ((sa - da).abs() <= 1e-6 + 1e-9 * da.abs()) | both_nan
            assert close.all(), (
                f"{name}.{col}: value mismatch\n"
                f"{pd.DataFrame({'spark': sv[~close], 'duck': dv[~close]}).head(10)}"
            )
        else:
            eq = sv.astype(str) == dv.astype(str)
            assert eq.all(), (
                f"{name}.{col}: value mismatch\n"
                f"{pd.DataFrame({'spark': sv[~eq], 'duck': dv[~eq]}).head(10)}"
            )


def check_query(spark, duck, name: str, sf_dir: str):
    from simplex_mapreduce_spark import registry

    spark_pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.sql(registry.ORACLES[name]).df()
    compare_frames(spark_pdf, duck_pdf, name)
    return spark_pdf
