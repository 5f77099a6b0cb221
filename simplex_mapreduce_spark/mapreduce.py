"""MapReduce parity facade — the reference's user-facing API, on Spark.

The reference engine (src/mapreduce.go) runs a fixed pipeline
``Split -> Map -> hash-partition -> Reduce(group+key-sort) -> Merge``:

- ``Split`` chunks one text file on line boundaries (mapreduce.go:72-110);
- ``DoMap`` feeds each whole chunk to a user ``Map(contents) -> [(k,v)]``
  closure (mapreduce.go:173-212);
- map output is hash-partitioned by key into nReduce buckets
  (FNV-32a % nReduce, mapreduce.go:167-171, 194-211);
- ``DoReduce`` groups each bucket by key, sorts keys lexicographically,
  and applies user ``Reduce(key, values) -> value`` (mapreduce.go:218-259);
- ``Merge`` produces one text file of ``"key: value"`` lines in global
  lexicographic key order (mapreduce.go:291-329).

This facade preserves the reference's *semantics contract* (SURVEY.md
§2.1) while delegating execution to Spark:

1. output ordering is lexicographic **string** sort of keys
   (``sort.Strings``: "10" < "2");
2. the reduce closure sees values grouped but in no guaranteed order
   (the reference only guarantees map-task order; commutative reducers
   are the contract);
3. exactly-once output via deterministic re-execution (Spark lineage ==
   the reference's idempotent file overwrite, mapreduce.go:195,249).

Deliberate non-replications (SURVEY.md §4.2): no JSON shuffle files on a
shared FS (Spark's sort-based binary shuffle is the same contract), no
single-node in-memory Merge (a distributed range-partitioned sort is
strictly better and required at 100 TB), no infinite task retry.

Scale note: ``groupByKey`` is appropriate here *only because* the API
contract hands the user's reduce closure the full value list, exactly
like the reference (mapreduce.go:255).  ``run_combinable`` is the
map-side-combine fast path for associative reducers — the optimization
the reference explicitly lacks (it shuffles every raw pair; self-noted
inefficiency at mapreduce.go:193).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

MapFn = Callable[[str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]

_KV_SCHEMA = "key string, value string"


class MapReduceJob:
    """``MapReduceJob(map_fn, reduce_fn).run(spark, path)``.

    ``map_fn(chunk_text)`` yields ``(key, value)`` string pairs for one
    whole input chunk (the reference's Map sees a whole split, not one
    line — mapreduce.go:186-192 reads the entire file into one string).
    ``reduce_fn(key, values)`` returns one string value.
    """

    def __init__(
        self,
        map_fn: MapFn,
        reduce_fn: ReduceFn,
        n_map: int | None = None,
        n_reduce: int | None = None,
    ):
        self.map_fn = map_fn
        self.reduce_fn = reduce_fn
        self.n_map = n_map
        self.n_reduce = n_reduce

    # -- phases ---------------------------------------------------------

    def _mapped(self, spark: SparkSession, input_path: str):
        """Split + Map: line-aligned chunks -> user map closure."""
        min_parts = self.n_map or spark.sparkContext.defaultParallelism
        lines = spark.sparkContext.textFile(input_path, minPartitions=min_parts)
        map_fn = self.map_fn
        # one whole chunk per partition, like DoMap (mapreduce.go:186-192)
        return lines.mapPartitions(lambda it: map_fn("\n".join(it)))

    def _mapped_from_df(self, df: DataFrame, column: str):
        map_fn = self.map_fn
        rdd = df.select(column).rdd.map(lambda r: r[0] or "")
        # a single-file table scans as one partition; spread the Python
        # map work across cores (mirrors Split's nMap fan-out,
        # mapreduce.go:84-97)
        want = self.n_map or df.sparkSession.sparkContext.defaultParallelism
        if rdd.getNumPartitions() < want:
            rdd = rdd.repartition(want)
        return rdd.mapPartitions(lambda it: map_fn("\n".join(it)))

    def _reduced(self, kv_rdd):
        """hash-partition -> group -> per-key reduce -> global string sort."""
        n_red = self.n_reduce
        reduce_fn = self.reduce_fn
        grouped = kv_rdd.groupByKey(numPartitions=n_red)
        reduced = grouped.map(lambda kv: (kv[0], reduce_fn(kv[0], list(kv[1]))))
        # lexicographic total order == sort.Strings at mapreduce.go:316
        return reduced.sortByKey()

    # -- entry points ---------------------------------------------------

    def run(self, spark: SparkSession, input_path: str) -> DataFrame:
        """Full pipeline over a text file; returns DataFrame[key, value]
        (globally string-sorted, like the reference's merged output)."""
        out = self._reduced(self._mapped(spark, input_path))
        return spark.createDataFrame(out, schema=_KV_SCHEMA)

    def run_on_column(self, df: DataFrame, column: str) -> DataFrame:
        """Same pipeline with a DataFrame string column as the 'file'."""
        spark = df.sparkSession
        out = self._reduced(self._mapped_from_df(df, column))
        return spark.createDataFrame(out, schema=_KV_SCHEMA)

    def run_combinable(
        self,
        spark: SparkSession,
        input_path: str,
        combine: Callable[[str, str], str],
    ) -> DataFrame:
        """Fast path for associative+commutative reducers: map-side
        combine via ``reduceByKey`` (partial aggregation — what Spark's
        hash-agg does for DataFrames automatically)."""
        out = self._mapped(spark, input_path).reduceByKey(
            combine, numPartitions=self.n_reduce
        ).sortByKey()
        return spark.createDataFrame(out, schema=_KV_SCHEMA)

    def save_text(
        self, result: DataFrame, output_path: str, single_file: bool = False
    ) -> None:
        """Merge-format sink: ``"key: value"`` lines (mapreduce.go:325).

        Default is the distributed shape (one part per reduce
        partition, globally ordered by part-file concatenation order) —
        at 100 TB a single merged file is the anti-pattern the
        reference's single-node ``Merge()`` embodies (it re-reads every
        reduce output on one machine, mapreduce.go:291-329).

        ``single_file=True`` opts into EXACT parity with that sink: one
        sorted text file of ``"key: value"`` lines, byte-identical to
        the reference's ``mr.out`` for the same input (golden-pinned in
        tests/test_mapreduce_parity.py).  The coalesce(1) funnels the
        already-sorted partitions through one writer task — correct for
        parity/debug output, deliberate bottleneck at scale."""
        from pyspark.sql import functions as F

        src = result
        if single_file:
            # sortWithinPartitions(key) after coalesce(1): the
            # range-sorted input collapses to one partition, and the
            # in-partition KEY sort re-establishes the reference's
            # sort.Strings order without a second exchange (sorting the
            # concatenated line instead would mis-order keys containing
            # ':' or ' ')
            src = result.coalesce(1).sortWithinPartitions("key")
        (
            src.select(F.concat_ws(": ", "key", "value").alias("value"))
            .write.mode("overwrite")
            .text(output_path)
        )


def word_count_map(chunk: str) -> Iterable[tuple[str, str]]:
    """The reference's golden-test Map closure (src/test_test.go:56-65):
    tokenize on whitespace, emit (word, "1")."""
    for w in chunk.split():
        yield (w, "1")


def word_count_reduce(_key: str, values: list[str]) -> str:
    """The reference's golden-test Reduce (src/test_test.go:68-79):
    sum integer-valued strings."""
    return str(sum(int(v) for v in values))
