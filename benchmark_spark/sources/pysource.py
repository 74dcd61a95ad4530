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
    InputPartition,
    SimpleDataSourceStreamReader,
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

    from benchmark_spark.streaming.windows import scratch_dir

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
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
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
            time.sleep(0.5)
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
