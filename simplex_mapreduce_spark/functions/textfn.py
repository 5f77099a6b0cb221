"""Shared text primitives, defined once so the Spark implementations and
the DuckDB oracle SQL use literally the same regexes/constants.

Everything here stays JVM-side (built-in functions, higher-order array
functions) — no Python UDFs in any text hot path.
"""

from __future__ import annotations

import re as _re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


def pandas_shingles_udf(n: int):
    """Arrow-batched pandas UDF computing the distinct word-``n``-gram
    shingle set of a text column — byte-identical to
    ``array_distinct(shingles_col(tokens_col(text), n))`` (pinned by
    tests/test_dedup_synthetic.py::test_pandas_shingling_matches_hof).

    This is the pinned-equivalence ALTERNATIVE, not the default path:
    ``dedup.shingle_sets`` uses the JVM higher-order-function pipeline,
    which measured faster end-to-end on the corpus pass (0.29 s vs
    0.94 s — Arrow transfer + Python worker spin-up dominate at these
    batch sizes).  The UDF only wins on warm workers with high per-core
    Python throughput; keep the HOF path as the hot path.
    The regex is the ASCII whitespace class — exactly Java's ``\\s`` —
    so tokenization agrees with the JVM path and the DuckDB oracle.
    """
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def shingle(text: str) -> list[str]:
        toks = [t for t in ws.split(text) if t]
        if len(toks) < n:
            return []
        return list(
            dict.fromkeys(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
        )

    @pandas_udf("array<string>")
    def _shingles(text: pd.Series) -> pd.Series:
        return text.map(shingle)

    return _shingles


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


# --------------------------------------------------------------------- #
# PII redaction — a standard pre-training corpus-cleaning pass.
# --------------------------------------------------------------------- #

# Patterns kept to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookbehind.  Order matters: emails
# before phone numbers (an email's digits must not be half-eaten),
# URLs before IPs (a URL containing an IP redacts as one URL token).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"(?:\+?\d{1,2}[ .-])?(?:\(\d{3}\)[ .-]?|\d{3}[ .-])\d{3}[ .-]\d{4}\b", "<PHONE>"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CCNUM>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace emails, URLs, IPv4s, SSN-shaped, phone-shaped and
    card-shaped substrings with typed placeholder tokens.

    Pure chained ``regexp_replace`` — stays inside whole-stage codegen,
    no Python in the path, so it composes with the corpus-cleaning
    pipeline at full scan speed.  Pattern-based redaction is the
    industry-standard first pass (C4/RefinedWeb-style); it
    over-redacts (a 13-digit product code looks like a card) and
    under-redacts (obfuscated emails) by design — an NER pass is the
    model-based second stage and is out of scope for an engine."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return col
