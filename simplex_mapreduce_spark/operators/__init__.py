"""Operator modules. Importing this package registers every query."""

from simplex_mapreduce_spark.operators import (  # noqa: F401
    relational,
    relational_ext,
    joins,
    windows,
    events,
    text,
    dedup,
    similarity,
    multimodal,
    mr_parity,
    custom,
)
