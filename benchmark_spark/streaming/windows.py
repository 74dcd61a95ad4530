"""Streaming operators over the `events` table (SURVEY.md §2.9 — all E;
the reference is batch-only [P]).

Correctness strategy per SURVEY.md §2.9: every streaming operator has
a batch-equivalent DataFrame form (same expression on the static
table) that IS oracle-checkable; the real `readStream` runs are
verified by convergence to the batch answer — here via
Trigger.AvailableNow into a memory sink inside the query itself
(q7_tumble_stream shares q7_tumble's oracle), and more broadly in
tests/test_streaming.py (watermarks, stateful dedup, stream-stream
join, applyInPandasWithState).

Scale posture: event-time windowed aggregation is the canonical
streaming shuffle (key = window x group); watermarks bound state.
Session windows keep per-key state until gap expiry — at 100 TB the
keys (user_id) must be well-distributed, which they are here and
which salting would fix otherwise.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import (
    EVENTS_RAW_SCHEMA,
    SCHEMAS,
    load_table,
    table_path,
    ts_unit,
)
from benchmark_spark.operators.aggregates import dsum
from benchmark_spark.registry import register

_TUMBLE_ORACLE = """
    SELECT date_trunc('hour', ts) AS w_start, event_type,
           COUNT(*) AS n,
           (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
"""


def _tumble(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
    )


@register(
    "q7_tumble",
    oracle=_TUMBLE_ORACLE,
    doc="Tumbling 1-hour event-time window aggregation, batch form (SURVEY.md §2.9 [Q:q7_tumble]); identical expression serves the stream.",
    tags=("extension", "streaming"),
)
def q7_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tumble(load_table(spark, sf_dir, "events", assert_schema=False))


def scratch_dir() -> str:
    d = os.path.join("/root/repo/.scratch", uuid.uuid4().hex)
    os.makedirs(d, exist_ok=True)
    return d


def pinned_start(writer):
    """Start a fixture micro-batch stream with FEW state partitions.

    A streaming aggregation creates one state-store partition — one
    task plus one checkpoint file group, EVERY micro-batch — per
    spark.sql.shuffle.partitions, and AQE never coalesces streaming
    shuffles, so the session's 32 meant 32 tasks + 32 fsync'd store
    files per batch for sinks that hold a handful of keys (measured:
    q_txlog_stream_source's drain 4.7 -> 2.7 s at 1 partition).
    StreamExecution CLONES the session inside .start(), so pinning the
    conf only around the start call is race-free: the stream keeps the
    pinned value for its whole life while the caller's session gets
    its batch-scale setting right back. The value is an env knob, not
    a constant: at production scale state partitioning is sized to
    key cardinality/state bytes, never to a fixture's sink size."""
    spark = writer._df.sparkSession
    n = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        return writer.start()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def await_done(q, timeout: int = 120) -> None:
    """Block until the AvailableNow query terminates; raise on timeout.

    awaitTermination(timeout) returns False (not an error) when the
    query is still running — silently reading the sink then yields a
    partial-but-plausible result. Every streaming query here funnels
    through this guard so a hung stream is an error, never wrong data.
    """
    if not q.awaitTermination(timeout):
        q.stop()
        raise RuntimeError(
            f"streaming query {q.name!r} did not terminate within {timeout}s"
        )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming source over the events table.

    The file stream source requires a DIRECTORY, while the fixture is
    a single parquet file — stage a symlink dir (no data copy). Same
    unit-sniffed read path as the batch catalog (catalog.load_table):
    nanos fixtures go through the nanos-as-long shim, micros fixtures
    read natively — so stream and batch plans see the identical
    logical schema either way.
    """
    src = table_path(sf_dir, "events")
    if os.path.isdir(src):
        # directory dataset (partitioned / multi-file fixture): already
        # the directory the file stream source wants — feed it directly,
        # each part file becomes its own discoverable input
        stage = src
    else:
        # single-file fixture: stage a symlink dir (no data copy)
        stage = os.path.join(
            "/root/repo/.scratch", f"stream_src_{os.path.basename(sf_dir.rstrip('/'))}"
        )
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "events.parquet")
        # re-create rather than reuse a stale link: the stage dir is
        # keyed by basename(sf_dir), so a link left by a run against a
        # different parent directory (or a since-removed fixture) would
        # silently feed the stream old data
        if os.path.islink(link) and os.readlink(link) != src:
            os.remove(link)
        if not os.path.exists(link):
            os.symlink(src, link)
    if ts_unit(src) != "ns":
        return spark.readStream.schema(SCHEMAS["events"]).parquet(stage)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(stage)
    return raw.select(
        "event_id",
        F.expr("timestamp_micros(ts div 1000)").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


@register(
    "q7_tumble_stream",
    oracle=_TUMBLE_ORACLE,
    doc=(
        "The SAME tumbling window executed as a real Structured Streaming job: "
        "readStream(parquet) -> window agg -> complete-mode memory sink, "
        "Trigger.AvailableNow; returns the sink table. Hash-matches the batch "
        "oracle — streaming-to-batch convergence checked by the driver itself."
    ),
    tags=("extension", "streaming"),
)
def q7_tumble_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    sink = f"tumble_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        _tumble(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return spark.table(sink)


@register(
    "q_sliding",
    oracle="""
        SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL 15 MINUTE AS w_start,
               event_type,
               COUNT(*) AS n,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM events, unnest([0, 1, 2, 3]) AS t(k)
        GROUP BY 1, 2
    """,
    doc=(
        "Sliding window (1 hour, 15-minute slide): each event lands in 4 "
        "overlapping windows (SURVEY.md §2.9). Oracle expands the overlap "
        "explicitly via unnest x time_bucket."
    ),
    tags=("extension", "streaming"),
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
    )


_SESSION_ORACLE = """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS s_start,
               MAX(ts) + INTERVAL 30 MINUTE AS s_end,
               COUNT(*) AS n,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM sessions
        GROUP BY user_id, session_id
"""


@register(
    "q_session",
    oracle=_SESSION_ORACLE,
    doc=(
        "Session windows (30-minute gap) per user, batch form via native "
        "session_window (SURVEY.md §2.9); oracle is the classical "
        "lag -> gap-flag -> cumulative-sum session-id rewrite. Session end is "
        "last-event + gap, matching Spark's semantics."
    ),
    tags=("extension", "streaming"),
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n",
            "total",
        )
    )


@register(
    "q_stream_dedup",
    oracle="""
        SELECT event_id, user_id, event_type
        FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        GROUP BY event_id, user_id, event_type
    """,
    doc=(
        "Stateful dedup, batch form: first-event-wins per event_id over a stream "
        "with every event delivered twice (at-least-once ingestion shape). The "
        "streaming twin — dropDuplicates + watermark so state is bounded — runs "
        "in tests/test_streaming.py."
    ),
    tags=("extension", "streaming"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    doubled = events.unionByName(events).select("event_id", "user_id", "event_type")
    return doubled.dropDuplicates(["event_id", "user_id", "event_type"])


@register(
    "q_stream_session",
    oracle=_SESSION_ORACLE,
    doc=(
        "Session windows executed as a REAL stream: readStream -> "
        "withWatermark(10 min) -> session_window agg -> complete-mode memory "
        "sink, Trigger.AvailableNow. The static source arrives as one "
        "microbatch, so complete-mode state equals the batch answer and the "
        "stream HASH-matches the same session oracle as q_session "
        "(streaming-to-batch convergence, the q7_tumble_stream pattern — "
        "upgraded from rows-only in round 2)."
    ),
    tags=("extension", "streaming"),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n",
            "total",
        )
    )
    sink = f"session_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return spark.table(sink)


@register(
    "q_funnel",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END)   AS s_ts,
                   MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_p
            FROM events
            GROUP BY user_id
        )
        SELECT COUNT(s_ts) AS n_signup,
               -- CAST: DuckDB count_if yields HUGEINT -> pandas float64,
               -- which the driver hash serializes as '150.0' vs Spark '150'
               CAST(count_if(last_p > s_ts) AS BIGINT) AS n_converted,
               (floor(count_if(last_p > s_ts) * 1.0 / COUNT(s_ts) * 1000000 + 0.5)
                / 1000000) AS conv_rate
        FROM per_user
    """,
    doc=(
        "Conversion funnel over the events table: users who signed up, users "
        "whose latest purchase follows their first signup, and the conversion "
        "rate — the canonical product-analytics two-step funnel as one grouped "
        "aggregation plus a global rollup (no self-join: per-user conditional "
        "MIN/MAX carry both funnel stages through a single shuffle)."
    ),
    tags=("extension", "streaming"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_p"),
    )
    converted = F.col("last_p") > F.col("s_ts")
    n_signup = F.count("s_ts")
    n_conv = F.count_if(converted)
    rate = F.floor(n_conv * 1.0 / n_signup * 1e6 + F.lit(0.5)) / 1e6
    return per_user.agg(
        n_signup.alias("n_signup"),
        n_conv.alias("n_converted"),
        rate.alias("conv_rate"),
    )


def _closed_windows(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Batch equivalence of withWatermark + tumbling window in APPEND
    mode: the final watermark is max(event time) - delay, and append
    emits exactly the windows the watermark has closed (window.end <=
    watermark). A single-batch AvailableNow run drops no individual
    rows (the watermark only advances between micro-batches), so the
    emitted counts equal the batch counts over closed windows — the
    stream twin in tests/test_streaming.py asserts exact equality."""
    mx = events.agg(F.max("ts").alias("mx"))
    win = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
    )
    return (
        win.crossJoin(F.broadcast(mx))
        .filter(F.col("w.end") <= F.col("mx") - F.expr(f"INTERVAL {delay}"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
    )


@register(
    "q_watermark",
    oracle="""
        WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
        SELECT date_trunc('hour', ts) AS w_start, event_type,
               COUNT(*) AS n,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
        HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM wm)
    """,
    doc=(
        "Watermark / late-data semantics, batch-equivalent form (SURVEY.md "
        "§2.9): tumbling 1-hour windows restricted to those CLOSED by the "
        "final watermark max(ts) - 10 minutes, i.e. exactly the append-mode "
        "output of withWatermark('ts','10 minutes') over the same stream. "
        "tests/test_streaming.py runs the real stream twin and asserts "
        "identical rows, plus that a genuinely late row injected in a second "
        "micro-batch is dropped. The watermark is computed as a broadcast "
        "1-row aggregate, not a literal — one extra scan-and-reduce stage, "
        "no shuffle of the fact."
    ),
    tags=("extension", "streaming"),
)
def q_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    return _closed_windows(events)


@register(
    "q_stream_join",
    oracle="""
        SELECT s.user_id,
               s.event_id AS signup_id,
               p.event_id AS purchase_id,
               CAST(epoch_us(p.ts) - epoch_us(s.ts) AS BIGINT) AS lag_us
        FROM events s
        JOIN events p
          ON s.user_id = p.user_id
         AND p.ts >= s.ts
         AND p.ts <= s.ts + INTERVAL 1 HOUR
        WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
    """,
    doc=(
        "Stream-stream interval join, batch-equivalent form (SURVEY.md §2.9): "
        "each signup joined to the purchases of the same user within the "
        "following hour — the canonical two-stream enrichment. The streaming "
        "twin (two filtered readStream branches, both watermarked, equi-key + "
        "time-range condition so state is boundable) runs in "
        "tests/test_streaming.py and must produce these exact rows. At 100 TB "
        "the equi-key (user_id) anchors the shuffle; the time bound only "
        "trims state, never drives a nested loop."
    ),
    tags=("extension", "streaming"),
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    s = events.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = s.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        "user_id",
        "signup_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("lag_us"),
    )


def events_stream_chunks(
    spark: SparkSession, sf_dir: str, nchunks: int = 4
) -> DataFrame:
    """Events as a MULTI-BATCH stream: a staged 4-file copy split by
    day-of-month range, read with maxFilesPerTrigger=1 so AvailableNow
    executes one deterministic micro-batch per file (ascending event
    time; mtimes set in order so the file source processes them
    oldest-first). This is what makes update/append output modes mean
    something — with a single batch they degenerate to complete mode.

    The staged copy is keyed by SF and mtime-invalidated against the
    source parquet (same contract as sources.readers.partitioned_orders),
    and holds the CONVERTED schema (ts as timestamp), so the stream
    needs no nanos shim.
    """
    stage = os.path.join(
        "/root/repo/.scratch",
        f"stream_chunks_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    marker = os.path.join(stage, "_SUCCESS")
    src_parquet = table_path(sf_dir, "events")
    stale = not os.path.exists(marker) or (
        os.path.exists(src_parquet)
        and os.path.getmtime(src_parquet) > os.path.getmtime(marker)
    )
    if stale:
        import glob
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        events = load_table(spark, sf_dir, "events", assert_schema=False)
        chunk = F.least(
            F.lit(nchunks - 1), ((F.dayofmonth("ts") - 1) / 8).cast("int")
        )
        for i in range(nchunks):
            tmp = os.path.join(stage, f"_tmp_{i}")
            events.filter(chunk == i).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(stage, f"chunk_{i}.parquet")
            shutil.move(part, dst)
            shutil.rmtree(tmp)
            os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
        with open(marker, "w"):
            pass
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(stage, "chunk_*.parquet"))
    )


@register(
    "q_stream_sliding",
    oracle="""
        SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL 15 MINUTE AS w_start,
               event_type,
               COUNT(*) AS n,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM events, unnest([0, 1, 2, 3]) AS t(k)
        GROUP BY 1, 2
    """,
    doc=(
        "Sliding window (1 hour / 15-minute slide) as a REAL stream: "
        "readStream -> overlapping-window agg -> complete-mode memory sink, "
        "Trigger.AvailableNow — every event feeds 4 concurrent windows' "
        "state, the canonical overlapping-state streaming shape. Shares "
        "q_sliding's batch oracle (streaming-to-batch convergence, "
        "hash-checked by the driver)."
    ),
    tags=("extension", "streaming"),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
    )
    sink = f"slide_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return spark.table(sink)


@register(
    "q_stream_topk",
    oracle="""
        SELECT user_id, COUNT(*) AS n
        FROM events
        GROUP BY user_id
        ORDER BY n DESC, user_id
        LIMIT 10
    """,
    doc=(
        "Streaming top-k: per-user event counts over a real 4-micro-batch "
        "stream (complete-mode memory sink re-emitted per trigger), then the "
        "top-10 most-active users with a deterministic user_id tiebreak — "
        "the live-leaderboard shape. Complete mode is what makes a global "
        "top-k well-defined mid-stream: each trigger's sink snapshot is the "
        "full current state, and the final snapshot equals the batch GROUP "
        "BY, which the driver hash-checks. The top-k itself is "
        "TakeOrderedAndProject over ~count(distinct user_id) sink rows, "
        "never a global sort."
    ),
    tags=("extension", "streaming"),
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream_chunks(spark, sf_dir)
    sink = f"topk_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        stream.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return (
        spark.table(sink)
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


@register(
    "q_stream_update",
    oracle="SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id",
    doc=(
        "UPDATE output mode over a real 4-micro-batch stream (SURVEY.md §2.9 "
        "output modes): per-user running counts into a memory sink — each "
        "batch re-emits only the keys it changed (~600 emissions for 150 "
        "keys at sf0.01, vs 150 x 4 for complete mode), and the final state "
        "per key (MAX of its monotone emissions) must equal the batch "
        "GROUP BY exactly, which the driver hash-checks. At 100 TB update "
        "mode is what makes continuous aggregation writable to a keyed sink: "
        "emitted rows are proportional to changed keys per trigger, not to "
        "total state."
    ),
    tags=("extension", "streaming"),
)
def q_stream_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream_chunks(spark, sf_dir)
    sink = f"upd_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        stream.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    # final state per key: counts only grow, so MAX picks each key's
    # last emission — the sink-side "current value" read
    return spark.table(sink).groupBy("user_id").agg(F.max("n").alias("n"))


@register(
    "q_stream_append",
    oracle="""
        WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
        SELECT date_trunc('hour', ts) AS w_start, event_type,
               COUNT(*) AS n,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
        HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM wm)
    """,
    doc=(
        "APPEND output mode with a watermark over a real 4-micro-batch "
        "stream (SURVEY.md §2.9 output modes): each 1-hour window is emitted "
        "EXACTLY ONCE, when the watermark (max event time - 10 min, advanced "
        "between micro-batches and by the final no-data batch) closes it. "
        "The chunk files ascend in event time, so nothing arrives late and "
        "the emitted set equals q_watermark's closed-window batch form — the "
        "shared oracle the driver hash-checks. Append mode is the 100 TB "
        "fact-table sink: immutable rows, no key-addressed rewrites."
    ),
    tags=("extension", "streaming"),
)
def q_stream_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream_chunks(spark, sf_dir)
    sink = f"app_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return spark.table(sink)


@register(
    "q_stream_foreach_batch",
    oracle="""
        SELECT event_type, COUNT(*) AS n, (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "foreachBatch sink — the production escape hatch for writing "
        "streams to arbitrary batch sinks: each of the 4 micro-batches "
        "lands its rows in a parquet directory via a batch-mode writer "
        "(append), tagged with its batch_id; the query then re-reads the "
        "directory and aggregates per event_type, which must equal the "
        "plain batch GROUP BY over events (exactly-once per AvailableNow "
        "run on a fresh checkpoint + sink). At 100 TB foreachBatch is how "
        "streams reach MERGE targets, JDBC, or any sink without a "
        "streaming writer, while keeping per-batch atomicity."
    ),
    tags=("extension", "streaming"),
)
def q_stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream_chunks(spark, sf_dir)
    out_dir = scratch_dir()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    q = pinned_start(
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
    )


@register(
    "q_stream_enrich",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM events
        JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    doc=(
        "STREAM-STATIC dimension enrichment, run as a real stream: the "
        "events readStream inner-joins the static customer dimension "
        "(broadcast — the stream never shuffles for the join) and aggregates "
        "per market segment into a complete-mode memory sink. The everyday "
        "production shape (enrich a firehose with account metadata) the "
        "stream-stream join does not cover: no watermark is needed because "
        "the static side never grows, and each micro-batch plans the join "
        "like any batch query. Converges to the batch join + GROUP BY, which "
        "the driver hash-checks; fixed-point dsum keeps the value sum exact."
    ),
    tags=("extension", "streaming"),
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer", assert_schema=False)
    enriched = stream.join(
        F.broadcast(customer), stream.user_id == customer.c_custkey
    )
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total")
    )
    sink = f"enrich_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return spark.table(sink)


@register(
    "q_outer_stream_join",
    oracle="""
        SELECT s.user_id,
               s.event_id AS signup_id,
               COALESCE(p.event_id, -1) AS purchase_id,
               COALESCE(CAST(epoch_us(p.ts) - epoch_us(s.ts) AS BIGINT),
                        -1) AS lag_us
        FROM events s
        LEFT JOIN events p
          ON s.user_id = p.user_id
         AND p.ts >= s.ts
         AND p.ts <= s.ts + INTERVAL 1 HOUR
         AND p.event_type = 'purchase'
        WHERE s.event_type = 'signup'
    """,
    doc=(
        "Stream-stream LEFT OUTER interval join, batch-equivalent form "
        "(SURVEY.md §2.9): every signup, enriched with the purchases of the "
        "same user in the following hour, OR a -1 sentinel row when none "
        "came — the funnel-with-dropouts query an inner join cannot "
        "express. The purchase-side predicate lives in the JOIN condition "
        "(not WHERE), so unmatched signups survive; sentinels replace "
        "NULLs to keep the hash engine-portable. The streaming twin "
        "(tests/test_streaming.py) runs leftOuter over two watermarked "
        "branches of the 4-micro-batch chunked stream: matches emit "
        "immediately, unmatched rows emit exactly when the watermark "
        "expires their join window — the test pins both populations. At "
        "100 TB the state store holds only the open interval per signup "
        "(watermark-bounded), and the equi-key (user_id) anchors the "
        "shuffle exactly as in the inner form."
    ),
    tags=("extension", "streaming"),
)
def q_outer_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    s = events.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        F.col("ts").alias("p_ts"),
    )
    joined = s.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.select(
        "user_id",
        "signup_id",
        F.coalesce(F.col("p_event"), F.lit(-1)).alias("purchase_id"),
        F.coalesce(
            F.unix_micros("p_ts") - F.unix_micros("s_ts"), F.lit(-1)
        ).alias("lag_us"),
    )


@register(
    "q_stream_dq",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE value < 0 OR value > 450)
                    AS BIGINT) AS out_of_range,
               CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS null_user,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100)
                   AS total
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "STREAMING data-quality gate, run as a real stream: the events "
        "readStream carries the q_dq_checks idea into flight — per "
        "event type, row counts, out-of-range values (value < 0 or "
        "> 450) and null user keys are counted in the SAME aggregation "
        "that computes the production value sum, complete-mode memory "
        "sink. This is the monitor a 100 TB ingest runs instead of a "
        "nightly batch audit: violations surface within one trigger "
        "interval of arriving, the conditional counters add zero extra "
        "state (they ride the existing groupBy state rows), and the "
        "per-type violation counts roll up by SUM across micro-batches "
        "exactly like the batch suite rolls up across partitions. "
        "Converges to the batch GROUP BY, which the driver hash-checks."
    ),
    tags=("extension", "streaming", "quality"),
)
def q_stream_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(
            (F.col("value") < 0) | (F.col("value") > 450)
        ).alias("out_of_range"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("null_user"),
        dsum(F.col("value"), 2).alias("total"),
    )
    sink = f"dq_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return spark.table(sink)


@register(
    "q_stream_dedup_wm",
    oracle="""
        SELECT DISTINCT user_id, event_type,
               date_trunc('hour', ts) AS w_hour
        FROM events
    """,
    doc=(
        "STREAMING STATEFUL DEDUP, real-stream form (round 11 — upgrades "
        "q_stream_dedup's batch twin to the actual streaming operator, "
        "closing the SURVEY.md §7 M4 'stateful dedup' row): "
        "dropDuplicatesWithinWatermark "
        "over a real 4-micro-batch stream, emitting each (user_id, "
        "event_type, hour) key exactly once in append mode. "
        "Determinism is by construction: the dedup key is HOUR-BUCKETED, "
        "so any two events sharing a key are < 1 h apart in event time, "
        "strictly inside the 2 h watermark delay — which is precisely "
        "the guarantee dropDuplicatesWithinWatermark gives (duplicates "
        "within the delay are dropped; only keys farther apart than the "
        "delay may re-emit, and the bucketing makes that impossible). "
        "Only the KEY columns are emitted, so which physical row "
        "survives a batch's partition race is invisible to the hash. "
        "The oracle is the batch DISTINCT. At 100 TB this is the "
        "at-least-once -> effectively-once repair stage after every "
        "replayed ingest, and the watermark is what BOUNDS the dedup "
        "state: unlike plain dropDuplicates (state grows with distinct "
        "keys forever), expired hours are evicted, so state holds only "
        "the watermark horizon's keys."
    ),
    tags=("extension", "streaming"),
)
def q_stream_dedup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream_chunks(spark, sf_dir)
    sink = f"dedup_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        stream.withColumn("w_hour", F.date_trunc("hour", F.col("ts")))
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "w_hour"])
        .select("user_id", "event_type", "w_hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return spark.table(sink)


def _stream_ewma_oracle() -> str:
    from benchmark_spark.operators.windows import _EWMA_D, _EWMA_LAGS, _EWMA_W

    p_expr = " + ".join(
        f"{w} * lag(y, {j}) OVER w" for j, w in enumerate(_EWMA_W, start=1)
    )
    return f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS y
            FROM events
            GROUP BY event_type, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        ), lagged AS (
            SELECT event_type, x, y,
                   {p_expr} AS p,
                   lag(y, {_EWMA_LAGS}) OVER w AS oldest
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY x)
        )
        SELECT event_type,
               CAST(x AS BIGINT) AS day,
               CAST(y AS BIGINT) AS y_cents,
               (floor((CAST(p AS DOUBLE) / {_EWMA_D}) * 100 + 0.5) / 100)
                   AS ewma_pred_cents,
               CAST({_EWMA_D} * y - p AS BIGINT) AS resid_scaled
        FROM lagged WHERE oldest IS NOT NULL
        ORDER BY event_type, day
    """


@register(
    "q_stream_ewma",
    oracle=_stream_ewma_oracle(),
    doc=(
        "STREAMING EWMA — the applyInPandasWithState twin the batch "
        "q_ewma_anomaly docstring promises (round 11): per event "
        "type, the group state carries the last 12 observed daily "
        "sums (integers), each arriving micro-batch folds its "
        "complete days into the buffer in event-time order, and "
        "every day with a full 12-day history emits its integer "
        "residual D*y - P exactly once (append mode). The 4-file "
        "staged stream is split on day-of-month ranges, so a "
        "calendar day NEVER straddles micro-batches — that alignment "
        "is what makes the stateful fold deterministic and the "
        "output hash-equal to the batch window-lag form (the oracle "
        "is q_ewma_anomaly's lag pipeline without the top-3 cut). "
        "State is bounded by construction: 12 longs + 12 day ids "
        "per event type, the '(one integer state per type)' claim "
        "made concrete — no watermark needed because the buffer, "
        "not time, bounds it. At 100 TB the pre-aggregation to "
        "(type, day) partial sums happens map-side per batch before "
        "the single per-type state shuffle."
    ),
    tags=("extension", "streaming", "timeseries"),
)
def q_stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from benchmark_spark.operators.windows import _EWMA_D, _EWMA_LAGS, _EWMA_W

    stream = events_stream_chunks(spark, sf_dir)
    prepped = stream.select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "day"
        ),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    lags, weights, dnorm = _EWMA_LAGS, list(_EWMA_W), _EWMA_D

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        days, ys = state.get if state.exists else ((), ())
        days, ys = list(days), list(ys)
        batch = pd.concat(list(pdf_iter))
        out = []
        daily = batch.groupby("day")["cents"].sum().sort_index()
        # The fold is only correct if batches arrive in event-time
        # order and no buffered day recurs. events_stream_chunks
        # splits on day-of-MONTH, which orders batches by time only
        # while the fixture spans a single month (it does: 30 days of
        # 2024-01). Corrupting the buffer silently would be worse
        # than failing the stream, so guard the assumption loudly.
        if len(days) and len(daily) and daily.index[0] <= days[-1]:
            raise ValueError(
                f"out-of-order day {daily.index[0]} after {days[-1]}: "
                "micro-batch split is not event-time-ordered "
                "(multi-month fixture?) — EWMA state would corrupt"
            )
        for day, y in daily.items():
            y = int(y)
            if len(ys) >= lags:
                p = sum(w * yy for w, yy in zip(weights, reversed(ys[-lags:])))
                pred = __import__("math").floor((float(p) / dnorm) * 100 + 0.5) / 100
                out.append(
                    (key[0], int(day), y, pred, dnorm * y - p)
                )
            days.append(int(day))
            ys.append(y)
        state.update((days[-lags:], ys[-lags:]))
        yield pd.DataFrame(
            out,
            columns=["event_type", "day", "y_cents", "ewma_pred_cents", "resid_scaled"],
        )

    folded = prepped.groupBy("event_type").applyInPandasWithState(
        fold,
        outputStructType=(
            "event_type string, day long, y_cents long, "
            "ewma_pred_cents double, resid_scaled long"
        ),
        stateStructType="days array<long>, ys array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"ewma_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        folded.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return spark.table(sink).orderBy("event_type", "day")


from benchmark_spark.operators.sketches import _hll_oracle as _hll_oracle_sql


@register(
    "q_stream_hll",
    oracle=_hll_oracle_sql("CAST(user_id AS VARCHAR)", "events"),
    doc=(
        "STREAMING HYPERLOGLOG (round 11) — the register-merge "
        "property q_hll_sketch's docstring claims, demonstrated as a "
        "real stream: each of the 4 micro-batches folds its events' "
        "user_id (bucket, rho) pairs into a complete-mode "
        "groupBy(bucket).max(rho) — 256 rows of state TOTAL, "
        "regardless of stream length, because MAX is commutative, "
        "associative, AND idempotent (replays cannot corrupt a "
        "register; this is why HLL is the sketch streaming engines "
        "actually ship). The sink's final register table feeds the "
        "same finalize stage as the batch query, so the streaming "
        "estimate hash-matches the batch oracle exactly — "
        "streaming-to-batch convergence on the SKETCH itself, not "
        "just on counts. At 100 TB the same 256-long state rides "
        "update-mode into a dashboard: a distinct-count-so-far that "
        "never shuffles distinct values."
    ),
    tags=("extension", "streaming", "sketch"),
)
def q_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from benchmark_spark.operators.sketches import hll_bucket_rho, hll_finalize

    stream = events_stream_chunks(spark, sf_dir)
    bucket, rho = hll_bucket_rho(F.col("user_id").cast("string"))
    regs = (
        stream.select(bucket.alias("bucket"), rho.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("mx"))
    )
    sink = f"hll_sink_{uuid.uuid4().hex[:8]}"
    q = pinned_start(
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    maxed = spark.table(sink)
    ex = load_table(spark, sf_dir, "events", assert_schema=False).agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return hll_finalize(spark, maxed, 256, ex)
