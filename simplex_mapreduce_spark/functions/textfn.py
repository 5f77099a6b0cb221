"""Shared text primitives, defined once so the Spark implementations and
the DuckDB oracle SQL use literally the same regexes/constants.

Everything here stays JVM-side (built-in functions, higher-order array
functions) — no Python UDFs in any text hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whitespace tokenizer — Java regex and RE2 agree on this pattern
TOKEN_RE = r"\s+"

# function-word matcher for stopword stats (word-salad testdata uses a
# tiny vocabulary that includes 'the' and 'a')
STOPWORD_RE = r"\b(the|a)\b"


def tokens_col(text: Column | str) -> Column:
    """Non-empty whitespace tokens of a string column."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(col), TOKEN_RE), lambda t: t != "")


def shingles_col(tokens: Column, n: int, *, guarded: bool = True) -> Column:
    """Word n-gram shingles of a token array (JVM-side, no UDF):
    transform(sequence(1, size-n+1), i -> array_join(slice(tokens,i,n),' ')).

    ``guarded=True`` returns an empty array when the doc has fewer than
    n tokens (sequence(1, size-n+1) would be descending otherwise).
    Use ``guarded=False`` after an explicit ``size(tokens) >= n`` filter:
    the CASE guard gets duplicated by Catalyst's filter-inference below
    Generate nodes, multiplying evaluation cost (observed 4x)."""
    base = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    if not guarded:
        return base
    return F.when(F.size(tokens) >= n, base).otherwise(
        F.array().cast("array<string>")
    )


def duckdb_tokens(expr: str) -> str:
    """DuckDB SQL fragment: non-empty whitespace tokens of ``expr``."""
    return (
        f"list_filter(string_split_regex(trim({expr}), '{TOKEN_RE}'), t -> t <> '')"
    )


def duckdb_shingles(tokens_expr: str, n: int) -> str:
    """DuckDB SQL fragment mirroring :func:`shingles_col`."""
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(range(1, len({tokens_expr}) - {n - 2}), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {n - 1}), ' ')) "
        f"ELSE [] END"
    )
