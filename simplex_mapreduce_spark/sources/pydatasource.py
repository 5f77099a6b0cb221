"""Custom connector via the Spark 4 Python DataSource API: a
deterministic synthetic-events source.

This is the extension point a Spark-first engine offers where the
reference hard-codes its input plumbing (src/mapreduce.go reads
pre-split local files; the split step at mapreduce.go:160-171 IS its
only "connector").  A Python DataSource plugs an arbitrary external
system (REST pages, message queue snapshots, bespoke formats) into the
planner as a first-class table with real partitions: each
``InputPartition`` becomes one Spark task, so a 1000-partition source
fans out across a 1000-executor cluster with no driver bottleneck.

The synthetic generator here is the test double for such a connector —
and a useful load generator in its own right (pipeline tests that need
N events without shipping N rows of parquet).  Determinism comes from
md5 over (partition, row) — same options, same rows, on any cluster
layout, with no cross-partition coordination.

Scale notes: rows are generated INSIDE each task (nothing is
broadcast, collected, or shipped from the driver); Python-source rows
cross into the JVM through Arrow batches.  A Python source trades
per-row JVM speed for connectivity — right for ingestion edges, wrong
for hot inner loops (use the parquet tables for those).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

SYNTH_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
)


def _h(partition: int, i: int, salt: str) -> int:
    """Deterministic 48-bit value from md5(partition:i:salt)."""
    digest = hashlib.md5(f"{partition}:{i}:{salt}".encode()).hexdigest()
    return int(digest[:12], 16)


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows_per_partition = int(options.get("rowsperpartition", "100"))
        self.n_users = int(options.get("users", "50"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition):
        p = partition.value
        for i in range(self.rows_per_partition):
            event_id = p * self.rows_per_partition + i
            yield (
                event_id,
                BASE_TS + timedelta(seconds=_h(p, i, "ts") % 86_400),
                _h(p, i, "user") % self.n_users,
                EVENT_TYPES[_h(p, i, "type") % len(EVENT_TYPES)],
                round((_h(p, i, "value") % 10_000) / 100.0, 2),
            )


class SynthEventsDataSource(DataSource):
    """``spark.read.format("synth_events").option("partitions", 8)...``
    after ``register_synth_source(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)


def register_synth_source(spark) -> None:
    """Idempotent registration of the custom source AND sink on a session."""
    spark.dataSource.register(SynthEventsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


# --------------------------------------------------------------------- #
# The WRITER half of the connector extension point: a JSONL sink with
# the full commit protocol (task-side part writes, driver-side commit
# manifest) — what the reference's Merge step (src/mapreduce.go:291-329,
# a single-node file concat) looks like as a distributed, exactly-once
# sink.
# --------------------------------------------------------------------- #

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _PartCommit(WriterCommitMessage):
    part: int
    rows: int
    filename: str


class JsonlSinkWriter(DataSourceWriter):
    """Each Spark task serializes its partition to
    ``part-<job>-<id>.jsonl`` under the ``path`` option; the driver's
    ``commit`` writes the ``_SUCCESS`` manifest listing every part and
    its row count.  Exactly-once output via at-least-once execution:
    each ATTEMPT writes a private temp file and atomically renames it
    over the deterministic final name (os.replace), so sequential
    retries AND concurrent speculative attempts both leave exactly one
    whole file — stronger than the reference's truncating-create
    (mapreduce.go:195,249), which tolerates only sequential retry.
    The job-unique filename prefix (chosen driver-side, stable across
    retries) keeps append-mode writes from colliding with an earlier
    job's parts; readers trusting the manifest see exactly one job's
    output either way.

    Overwrite is commit-deferred (ADVICE r5): stale parts from earlier
    jobs are deleted inside ``commit()`` — after every task succeeded,
    immediately before the new manifest lands — never at job planning.
    A failed overwrite therefore aborts its own parts and leaves the
    previous committed output (parts AND ``_SUCCESS``) fully intact.

    DEPLOYMENT CONTRACT: ``path`` must be a filesystem shared between
    driver and executors (local[.] or NFS/fuse mounts — the reference's
    own data plane, worker.go writing to a shared dir).  An
    object-store deployment needs a rename-free commit protocol
    (upload parts, then publish the manifest) which this local-path
    sink deliberately does not implement."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        path = options.get("path")
        if not path:
            raise ValueError("pyjsonl sink requires a 'path' option")
        self.path = path
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self.path, exist_ok=True)
        filename = f"part-{self.job_id}-{pid:05d}.jsonl"
        tmp = os.path.join(
            self.path, f"_tmp-{self.job_id}-{pid:05d}-{ctx.taskAttemptId()}"
        )
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                # recursive asDict: nested structs become JSON objects,
                # not stringified Row reprs
                fh.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
                n += 1
        os.replace(tmp, os.path.join(self.path, filename))
        return _PartCommit(part=pid, rows=n, filename=filename)

    def commit(self, messages):
        if self.overwrite:
            # every task succeeded — NOW replace the previous job's
            # output: the job-unique prefix identifies this job's parts,
            # everything else goes.  Crash-before-commit leaves the old
            # parts and old _SUCCESS untouched.
            keep = {m.filename for m in messages}
            for f in os.listdir(self.path):
                if (
                    f.startswith("part-")
                    and f.endswith(".jsonl")
                    and f not in keep
                ):
                    os.remove(os.path.join(self.path, f))
        manifest = {
            "parts": sorted(
                ({"file": m.filename, "rows": m.rows} for m in messages),
                key=lambda p: p["file"],
            ),
            "total_rows": sum(m.rows for m in messages),
        }
        # temp + rename: the manifest flip is the atomic commit point
        tmp = os.path.join(self.path, f"_tmp-SUCCESS-{self.job_id}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, "_SUCCESS"))

    def abort(self, messages):
        # a failed task's slot arrives as None (DataSourceWriter.abort
        # contract) — only successful attempts left files to remove
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonlSinkDataSource(DataSource):
    """``df.write.format("pyjsonl").option("path", dir).save()`` —
    registered alongside the reader half by
    :func:`register_synth_source`."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)
