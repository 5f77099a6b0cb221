"""Reference-API parity queries: the MapReduce facade run as a
registered query so the driver's oracle checks the *user-closure* path,
not just the DataFrame path.

Word count through ``MapReduceJob`` == the reference's one shipped query
(src/test_test.go:56-79) — same string-keyed, string-valued contract.
"""

from __future__ import annotations

from simplex_mapreduce_spark.functions.textfn import duckdb_tokens
from simplex_mapreduce_spark.mapreduce import (
    MapReduceJob,
    word_count_map,
    word_count_reduce,
)
from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table


@register(
    "mr_wordcount",
    oracle=f"""
    SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
    FROM (SELECT unnest({duckdb_tokens('text')}) AS word FROM documents)
    GROUP BY word
    """,
)
def mr_wordcount(spark, sf_dir):
    """Word count via the Map/Reduce closure facade over documents.text.
    Output is (key, value) string pairs, exactly the reference's record
    type (mapreduce.go:45-48)."""
    d = load_table(spark, sf_dir, "documents")
    job = MapReduceJob(word_count_map, word_count_reduce)
    return job.run_on_column(d, "text")
