"""Custom connector via the Python DataSource API (Spark 4, SPIP
SPARK-44076) — the extension surface a user needs when their feed has
no built-in reader (an internal service, a bespoke file format, a
metering API). The source below is a deterministic synthetic feed so
the driver can hash-check the whole path: registration -> schema ->
partition planning -> per-partition generator -> DataFrame.

Scale posture: `partitions()` is the parallelism contract — each
InputPartition becomes one Spark task reading independently (here 8
disjoint id ranges; a real connector returns shards/splits/offset
ranges). The generator yields plain tuples that Arrow batches to the
JVM; nothing driver-side but the partition list. Predicate/column
pushdown hooks exist on the API for connectors that can use them —
this one materializes only its 3 declared columns.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from benchmark_spark.registry import register

SYNTH_ROWS = 10_000
SYNTH_PARTS = 8


class SynthRowsReader(DataSourceReader):
    """Deterministic feed: row k = (k, md5(k), k % 7) over disjoint
    id ranges per partition — content depends only on k, never on the
    partitioning, so any split count yields the same table."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", SYNTH_ROWS))
        self.parts = int(options.get("parts", SYNTH_PARTS))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        per = self.n // self.parts
        lo = i * per
        hi = (i + 1) * per if i < self.parts - 1 else self.n
        for k in range(lo, hi):
            yield (k, hashlib.md5(str(k).encode()).hexdigest(), k % 7)


class SynthRowsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthrows"

    def schema(self) -> str:
        return "id bigint, h string, grp bigint"

    def reader(self, schema) -> SynthRowsReader:
        return SynthRowsReader(self.options)


def read_synthrows(
    spark: SparkSession, n: int = SYNTH_ROWS, parts: int = SYNTH_PARTS
) -> DataFrame:
    spark.dataSource.register(SynthRowsSource)  # idempotent re-register
    return (
        spark.read.format("synthrows")
        .option("n", str(n))
        .option("parts", str(parts))
        .load()
    )


@register(
    "q_python_datasource",
    oracle="""
        SELECT i % 7 AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(md5(CAST(i AS VARCHAR))) AS min_h,
               CAST(SUM(CAST('0x' || substring(md5(CAST(i AS VARCHAR)), 1, 15)
                             AS BIGINT) % 1000003) AS BIGINT) AS fp
        FROM range(10000) t(i)
        GROUP BY i % 7
        ORDER BY grp
    """,
    doc=(
        "Custom connector through the Python DataSource API (Spark 4): a "
        "user-defined source registered with spark.dataSource.register, "
        "planned into 8 independent InputPartitions, each materialized by "
        "a per-task Python generator and Arrow-batched to the JVM — the "
        "path a team takes when their feed has no built-in reader. The "
        "feed is deterministic (row k = (k, md5(k), k % 7)), so the "
        "oracle regenerates it from range() and the driver hash checks "
        "the ENTIRE connector path: a row lost by partition-range "
        "arithmetic, a batch dropped in Arrow transfer, or a schema "
        "drift all break the md5 fingerprint. At scale: partitions() is "
        "the parallelism contract (splits/shards/offset ranges); the "
        "connector streams — nothing driver-side but the partition list."
    ),
    tags=("source", "extension"),
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_synthrows(spark)
    fp = (
        F.conv(F.substring(F.col("h"), 1, 15), 16, 10).cast("long") % 1000003
    )
    return (
        df.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("h").alias("min_h"),
            F.sum(fp).alias("fp"),
        )
        .orderBy("grp")
    )


FEED_TOTAL = 2_000
FEED_BATCH = 500


class SynthFeedReader(SimpleDataSourceStreamReader):
    """Deterministic offset-tracked stream: rows [pos, pos+batch) per
    micro-batch until FEED_TOTAL — the offset/commit contract every
    real streaming connector (queue consumer, CDC tail, metering API)
    implements. Content is a pure function of the row id, so replays
    after failure produce identical rows (exactly-once on top of
    checkpointed offsets)."""

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        if pos >= FEED_TOTAL:
            return iter([]), {"pos": pos}
        end = min(pos + FEED_BATCH, FEED_TOTAL)
        rows = [
            (k, hashlib.md5(str(k).encode()).hexdigest(), k % 7)
            for k in range(pos, end)
        ]
        return iter(rows), {"pos": end}


class SynthFeedSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthfeed"

    def schema(self) -> str:
        return "id bigint, h string, grp bigint"

    def simpleStreamReader(self, schema) -> SynthFeedReader:
        return SynthFeedReader()


@register(
    "q_python_stream_source",
    oracle="""
        SELECT i % 7 AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(md5(CAST(i AS VARCHAR))) AS min_h,
               CAST(SUM(CAST('0x' || substring(md5(CAST(i AS VARCHAR)), 1, 15)
                             AS BIGINT) % 1000003) AS BIGINT) AS fp
        FROM range(2000) t(i)
        GROUP BY i % 7
        ORDER BY grp
    """,
    doc=(
        "CUSTOM STREAMING connector through the Python DataSource API "
        "(the readStream side of q_python_datasource): a user-defined "
        "SimpleDataSourceStreamReader feeds 4 offset-tracked micro-"
        "batches of 500 rows into a complete-mode aggregation; offsets "
        "live in the checkpoint, so restart/replay semantics come from "
        "the engine, and the feed being a pure function of the offset "
        "is what turns replayed batches into exactly-once results — "
        "the contract every queue/CDC/API connector must meet. The "
        "driver hash proves no batch was lost, duplicated, or "
        "truncated across the offset hand-offs (same md5 fingerprint "
        "rule as the batch connector). The query polls the stream to "
        "completion and raises on timeout rather than returning a "
        "partial sink (await_done discipline)."
    ),
    tags=("source", "extension", "streaming"),
)
def q_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import time
    import uuid

    from pyspark.errors import AnalysisException

    from benchmark_spark.streaming.windows import pinned_start, scratch_dir

    spark.dataSource.register(SynthFeedSource)
    agg = (
        spark.readStream.format("synthfeed")
        .load()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("h").alias("min_h"),
            F.sum(
                F.conv(F.substring(F.col("h"), 1, 15), 16, 10).cast("long") % 1000003
            ).alias("fp"),
        )
    )
    sink = f"pyfeed_sink_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir()
    q = pinned_start(
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
    )
    try:
        done = None
        deadline = time.time() + 120
        while time.time() < deadline:
            # the memory sink's table registration can lag start() on a
            # slow first micro-batch — a missing table is "not yet", not
            # an error (ADVICE.md r5)
            try:
                done = spark.table(sink).agg(F.sum("n")).first()[0]
            except AnalysisException:
                done = None
            if done == FEED_TOTAL:
                break
            time.sleep(0.1)  # poll granularity: half the old 0.5 s wait tail (round 16)
        else:
            raise RuntimeError(
                f"synthfeed stream incomplete: {done}/{FEED_TOTAL} rows"
            )
    finally:
        q.stop()
        # offsets are only needed while the query runs; the memory sink
        # outlives stop(), the checkpoint need not (unbounded .scratch
        # growth otherwise — ADVICE.md r5)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink).orderBy("grp")


# --- Python DataSource WRITE path (round 11) -------------------------------

class _FileCommit(WriterCommitMessage):
    """Per-task commit message: the file this task staged."""

    def __init__(self, filename: str, rows: int) -> None:
        self.filename = filename
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    """Each write task stages its partition as one JSON-lines file
    under <path>/; commit() publishes the run ATOMICALLY by writing a
    _MANIFEST listing exactly the staged files (readers resolve the
    manifest, never the directory listing, so a failed/duplicate task
    attempt can leave orphan files without corrupting the dataset —
    the same commit discipline as the txlog tier, expressed through
    the DataSource write protocol)."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires a path option")

    def write(self, iterator):
        import json as _json
        import os
        import uuid as _uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(name, n)

    def commit(self, messages):
        import json as _json
        import os

        manifest = {
            "files": sorted(m.filename for m in messages),
            "rows": sum(m.rows for m in messages),
        }
        tmp = os.path.join(self.path, "._MANIFEST.tmp")
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST"))

    def abort(self, messages):
        import os

        for m in messages or []:
            try:
                os.unlink(os.path.join(self.path, m.filename))
            except FileNotFoundError:
                pass


class JsonlSinkSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def schema(self) -> str:  # write-only source; schema from the frame
        return "event_type string, value double"

    def writer(self, schema, overwrite) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


@register(
    "q_python_datasink",
    oracle="""
        SELECT event_type, COUNT(*) AS n,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100)
                   AS total
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc=(
        "Python DataSource WRITE path (round 11 — completes the SPIP "
        "SPARK-44076 surface next to the batch and stream READERS): "
        "events flow through df.write.format('jsonlsink') into a "
        "user-defined sink whose write() runs once per task (staging "
        "one JSON-lines file), returns a WriterCommitMessage, and "
        "whose driver-side commit() publishes the run atomically via "
        "a _MANIFEST naming exactly the staged files — the txlog "
        "commit discipline expressed through the DataSource write "
        "protocol (orphan files from failed attempts are invisible "
        "to manifest readers; abort() deletes staged files). The "
        "query then re-reads ONLY the manifest-listed files and "
        "re-aggregates per event_type — matching the direct batch "
        "aggregation over events, so a row dropped or doubled "
        "anywhere in the task/commit protocol breaks the hash. At "
        "100 TB this is how Spark writes to systems with no built-in "
        "sink (metering APIs, bespoke stores): per-task streaming "
        "writes, driver-side atomic publish, O(tasks) commit state."
    ),
    tags=("source", "extension"),
)
def q_python_datasink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import uuid as _uuid

    from benchmark_spark.catalog import load_table
    from benchmark_spark.operators.aggregates import dsum

    try:
        spark.dataSource.register(JsonlSinkSource)
    except Exception:
        pass  # already registered in this session
    out = os.path.join("/root/repo/.scratch", f"pysink_{_uuid.uuid4().hex[:8]}")
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    events.select("event_type", "value").write.format("jsonlsink").option(
        "path", out
    ).mode("append").save()
    with open(os.path.join(out, "_MANIFEST")) as f:
        manifest = _json.load(f)
    files = [os.path.join(out, n) for n in manifest["files"]]
    back = spark.read.schema("event_type string, value double").json(files)
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .orderBy("event_type")
    )
