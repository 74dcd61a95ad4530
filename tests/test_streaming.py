"""Streaming correctness (SURVEY.md §2.9 strategy): every streaming
operator must converge to its batch-equivalent answer on the same
data — the oracle-checkable form IS the spec. Also covers the
stateful surfaces with no batch twin (watermarked dedup,
stream-stream join, applyInPandasWithState)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.aggregates import dsum
from benchmark_spark.registry import all_specs
from benchmark_spark.streaming.windows import events_stream, scratch_dir
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumble_stream_converges_to_batch(spark):
    batch = SPECS["q7_tumble"].fn(spark, SF_SMOKE)
    stream = SPECS["q7_tumble_stream"].fn(spark, SF_SMOKE)
    cols = ["w_start", "event_type", "n", "total"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_session_stream_converges_to_batch(spark):
    batch = SPECS["q_session"].fn(spark, SF_SMOKE)
    stream = SPECS["q_stream_session"].fn(spark, SF_SMOKE)
    cols = ["user_id", "s_start", "s_end", "n", "total"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_dedup_with_watermark(spark):
    """dropDuplicates on a stream that delivers every event twice
    (at-least-once shape) yields each event exactly once."""
    stream = events_stream(spark, SF_SMOKE)
    doubled = stream.union(stream)
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id")
    )
    sink = "dedup_sink_test"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(sink).count()
    want = load_table(spark, SF_SMOKE, "events").count()
    assert got == want


def test_stream_stream_time_bounded_join(spark):
    """Purchases within 10 min after a signup, joined stream-to-stream
    with watermarks — must equal the batch range join q_range_join."""
    s = events_stream(spark, SF_SMOKE)
    a = (
        s.filter(F.col("event_type") == "signup")
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts"))
    )
    b = (
        s.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    )
    joined = a.join(
        b,
        F.expr(
            "a_user = b_user AND b_ts > a_ts AND b_ts <= a_ts + INTERVAL 10 MINUTES"
        ),
    ).select("a_user")
    sink = "ssjoin_sink_test"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table(sink)
        .groupBy("a_user")
        .count()
        .withColumnRenamed("a_user", "user_id")
        .withColumnRenamed("count", "n_followups")
    )
    batch = SPECS["q_range_join"].fn(spark, SF_SMOKE)
    cols = ["user_id", "n_followups"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_watermark_stream_twin_matches_registered_batch(spark):
    """q_watermark's batch form (windows closed by max(ts) - 10 min)
    must equal the real append-mode withWatermark stream output."""
    stream = events_stream(spark, SF_SMOKE)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
    )
    sink = "wm_sink_test"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = SPECS["q_watermark"].fn(spark, SF_SMOKE)
    cols = ["w_start", "event_type", "n", "total"]
    assert _rows(spark.table(sink), cols) == _rows(batch, cols)


def test_watermark_drops_genuinely_late_row(spark, tmp_path):
    """A row older than the watermark, arriving in a SECOND micro-batch
    after the watermark has advanced past it, must be dropped from the
    windowed aggregation (the late-data semantics SURVEY §2.9 specs)."""
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    import datetime as dt
    import glob
    import os
    import shutil

    base = dt.datetime(2026, 1, 1, 0, 0, 0)

    def write_batch(rows, name):
        # the file stream source lists FILES in src, not subdirs: stage
        # the parquet write, then drop its part file in as <name>.parquet
        stage = f"{src}_stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        os.makedirs(src, exist_ok=True)
        (part,) = glob.glob(f"{stage}/part-*.parquet")
        shutil.copy(part, f"{src}/{name}.parquet")

    # batch 1: events up to 03:00 -> watermark after it = 02:50
    write_batch(
        [(base + dt.timedelta(hours=h), 1) for h in (0, 1, 2, 3)], "b1"
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("s"))
        .select(F.col("w.start").alias("w_start"), "s")
    )
    def run_once():
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2: one in-time row (04:00) and one LATE row (00:30, far
    # below the 02:50 watermark carried in the checkpoint) — the late
    # row must be dropped at input, not resurrect the 00:00 window.
    # (Append emission lags one batch: run 1 only advances the
    # watermark; run 2 emits the windows it closed.)
    write_batch(
        [(base + dt.timedelta(hours=4), 1),
         (base + dt.timedelta(minutes=30), 100)], "b2"
    )
    run_once()
    out_schema = T.StructType(
        [T.StructField("w_start", T.TimestampType()), T.StructField("s", T.LongType())]
    )
    rows = spark.read.schema(out_schema).parquet(out).collect()
    got = {r["w_start"]: r["s"] for r in rows}
    assert got, "no closed windows emitted after second batch"
    assert got[base] == 1, "late row leaked into an already-closed window"
    assert all(s == 1 for s in got.values())


def test_stream_join_twin_matches_registered_batch(spark):
    """q_stream_join's batch interval join == the watermarked
    stream-stream join over the same two event streams."""
    s = events_stream(spark, SF_SMOKE)
    a = (
        s.filter(F.col("event_type") == "signup")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("s_ts"),
        )
    )
    b = (
        s.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = a.join(
        b,
        F.expr(
            "a_user = b_user AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 1 HOUR"
        ),
    ).select(
        F.col("a_user").alias("user_id"),
        "signup_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("lag_us"),
    )
    sink = "sjoin_twin_sink_test"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    batch = SPECS["q_stream_join"].fn(spark, SF_SMOKE)
    cols = ["user_id", "signup_id", "purchase_id", "lag_us"]
    assert _rows(spark.table(sink), cols) == _rows(batch, cols)


def test_apply_in_pandas_with_state_running_count(spark):
    """Arbitrary stateful processing: per-user running event counter
    via applyInPandasWithState; final counts must equal batch groupBy."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def count_events(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    stream = events_stream(spark, SF_SMOKE)
    counted = stream.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = "state_sink_test"
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per user = final running count
    final = (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.max("n").alias("n"))
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cols = ["user_id", "n"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_drop_duplicates_within_watermark(spark):
    """dropDuplicatesWithinWatermark: dedup state expires with the
    watermark instead of growing forever — the unbounded-stream form."""
    stream = events_stream(spark, SF_SMOKE)
    doubled = stream.union(stream)
    deduped = (
        doubled.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    sink = "dedup_wm_sink_test"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = load_table(spark, SF_SMOKE, "events").count()
    assert spark.table(sink).count() == want


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch: arbitrary batch-DataFrame sink logic (e.g. upsert
    into parquet) — per-microbatch exactly-once with AvailableNow."""
    stream = events_stream(spark, SF_SMOKE)
    out = str(tmp_path / "fb_out")
    agg = stream.groupBy("event_type").count()

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_type"]: r["count"] for r in spark.read.parquet(out).collect()}
    want = {
        r["event_type"]: r["count"]
        for r in load_table(spark, SF_SMOKE, "events").groupBy("event_type").count().collect()
    }
    assert got == want


def test_sliding_stream_converges_to_batch(spark):
    """Sliding windows on a real stream == the batch q_sliding answer."""
    stream = events_stream(spark, SF_SMOKE)
    agg = (
        stream.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
    )
    sink = "slide_sink_test"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = SPECS["q_sliding"].fn(spark, SF_SMOKE)
    cols = ["w_start", "event_type", "n", "total"]
    assert _rows(spark.table(sink), cols) == _rows(batch, cols)



def test_transform_with_state_env_block_pinned(spark):
    """transformWithStateInPandas (Spark 4's successor state API) is
    env-blocked in this container: its state-server protocol imports
    google.protobuf in the Python worker, and no protobuf distribution
    exists anywhere on this host (round-8 sweep: only typeshed stubs;
    pip installs are not permitted — the r4 probe crashed at worker
    bootstrap with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE /
    `ImportError: cannot import name 'descriptor' from
    'google.protobuf'`). Arbitrary stateful processing is covered by
    the applyInPandasWithState test above.

    Round 8 (VERDICT r7 #7): the prose NOTE became this MACHINE-CHECKED
    pin — each round it re-probes the import (last manual re-probe:
    round 14, still ModuleNotFoundError). While blocked it skips
    with the exact failure; the moment the runtime ships an intact
    protobuf it FAILS loudly (xfail-strict style) telling us to add the
    real TWS test instead of silently staying skipped."""
    try:
        import google.protobuf  # noqa: F401
    except ModuleNotFoundError as e:
        assert e.name in ("google", "google.protobuf"), e
        pytest.skip(f"transformWithStateInPandas env-blocked: {e}")
    pytest.fail(
        "google.protobuf now imports — the TWS env-block is lifted; "
        "replace this pin with a real transformWithStateInPandas test"
    )


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Restarting an AvailableNow query on the SAME checkpoint must
    process nothing new (source offsets are committed): the
    exactly-once contract a 100 TB pipeline restarts rely on."""
    stream = events_stream(spark, SF_SMOKE)
    out = str(tmp_path / "eo_out")
    ckpt = str(tmp_path / "eo_ckpt")

    def run_once():
        q = (
            stream.select("event_id")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # same checkpoint: no new input -> no new rows
    n2 = spark.read.parquet(out).count()
    want = load_table(spark, SF_SMOKE, "events").count()
    assert n1 == want
    assert n2 == n1


def test_watermark_bounds_streaming_state(spark):
    """The watermark must EVICT closed windows between micro-batches:
    max in-flight state rows stay well below the total window-group
    count, and numRowsRemoved is nonzero. This pins the property the
    measured tools/curve_stream.py curve rests on (max state constant
    at 490 rows while input grew 100x) — a regression that stopped
    eviction (watermark dropped, output mode flipped to complete,
    chunking collapsed to one batch) fails here, in-suite."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from benchmark_spark.streaming.windows import events_stream_chunks

    stream = events_stream_chunks(spark, SF_SMOKE)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    sink = f"wm_bound_{_uuid.uuid4().hex[:8]}"
    from benchmark_spark.streaming.windows import await_done, scratch_dir

    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    state_max, removed, batches = 0, 0, 0
    for p in q.recentProgress:
        if p["numInputRows"]:
            batches += 1
        for so in p.get("stateOperators", []):
            state_max = max(state_max, so["numRowsTotal"])
            removed += so.get("numRowsRemoved", 0)
    emitted = spark.table(sink).count()
    assert batches >= 2, "source collapsed to a single micro-batch"
    assert removed > 0, "watermark never evicted state"
    # in-flight state must be a strict fraction of all window-groups —
    # complete-mode-like accumulation would hold ~all of them at once
    assert 0 < state_max < emitted * 0.8, (state_max, emitted)


def test_stream_update_really_multibatch(spark):
    """The update-mode sink must show per-batch re-emissions (more rows
    than keys) — otherwise the 4-chunk source collapsed to one batch
    and the query silently degenerated to complete mode."""
    import uuid as _uuid

    from benchmark_spark.streaming.windows import events_stream_chunks, scratch_dir

    stream = events_stream_chunks(spark, SF_SMOKE)
    sink = f"updtest_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emissions = spark.table(sink)
    keys = emissions.select("user_id").distinct().count()
    assert emissions.count() > keys, "expected >1 emission per key across batches"


def test_stream_append_emits_each_window_once(spark):
    from benchmark_spark.registry import all_specs

    out = all_specs()["q_stream_append"].fn(spark, SF_SMOKE).toPandas()
    assert len(out) == len(out.drop_duplicates(["w_start", "event_type"]))
    # strictly fewer than the full window set: the last windows stay
    # open behind the watermark
    full = all_specs()["q7_tumble"].fn(spark, SF_SMOKE).count()
    assert 0 < len(out) < full


def test_outer_stream_join_twin_matches_registered_batch(spark):
    """q_outer_stream_join's batch left join == the watermarked
    leftOuter stream-stream join over the 4-micro-batch chunked
    stream. Matched rows emit immediately (must agree exactly);
    unmatched (sentinel) rows emit only when the watermark expires
    their one-hour window, so the final chunk's tail can legitimately
    stay open — the test pins (a) no spurious streamed rows and (b)
    every batch row whose window closed before the last watermark
    advance was emitted."""
    from benchmark_spark.streaming.windows import events_stream_chunks

    stream = events_stream_chunks(spark, SF_SMOKE)
    a = (
        stream.filter(F.col("event_type") == "signup")
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("s_ts"),
        )
    )
    b = (
        stream.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("p_event"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = a.join(
        b,
        F.expr(
            "a_user = b_user AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 1 HOUR"
        ),
        "leftOuter",
    ).select(
        F.col("a_user").alias("user_id"),
        "signup_id",
        F.coalesce(F.col("p_event"), F.lit(-1)).alias("purchase_id"),
        F.coalesce(
            F.unix_micros("p_ts") - F.unix_micros("s_ts"), F.lit(-1)
        ).alias("lag_us"),
        "s_ts",
    )
    sink = "outer_sjoin_twin_sink_test"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    streamed = spark.table(sink)
    batch = SPECS["q_outer_stream_join"].fn(spark, SF_SMOKE)
    cols = ["user_id", "signup_id", "purchase_id", "lag_us"]

    # (a) matched rows agree exactly
    got_matched = _rows(streamed.filter(F.col("purchase_id") != -1), cols)
    want_matched = _rows(batch.filter(F.col("purchase_id") != -1), cols)
    assert got_matched == want_matched

    # (b) every streamed sentinel row is a real batch sentinel row ...
    got_unmatched = _rows(streamed.filter(F.col("purchase_id") == -1), cols)
    want_unmatched = _rows(batch.filter(F.col("purchase_id") == -1), cols)
    assert set(got_unmatched) <= set(want_unmatched)
    assert len(got_unmatched) == len(set(got_unmatched))  # emitted once

    # ... and every sentinel whose window closed before the final
    # watermark advance (driven by chunks 1-3: days <= 24) was emitted.
    events = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    wm_final = events.filter(F.dayofmonth("ts") <= 24).agg(
        F.max("ts").alias("m")
    ).collect()[0]["m"]
    import datetime

    closed_before = wm_final - datetime.timedelta(hours=1, minutes=20)
    signup_ts = {
        r["signup_id"]: r["ts"]
        for r in events.filter(F.col("event_type") == "signup")
        .select("event_id", "ts")
        .withColumnRenamed("event_id", "signup_id")
        .collect()
    }
    must_emit = {
        row for row in want_unmatched if signup_ts[row[1]] < closed_before
    }
    assert must_emit <= set(got_unmatched)
    assert len(must_emit) > 0  # the assertion is not vacuous


def test_stream_dq_runs_twice_and_matches_batch(spark):
    """The streaming DQ gate re-runs cleanly in one session (unique
    sinks) and equals the identical batch aggregation."""
    from benchmark_spark.streaming.windows import q_stream_dq

    a = {r["event_type"]: r for r in q_stream_dq(spark, SF_SMOKE).collect()}
    b = {r["event_type"]: r for r in q_stream_dq(spark, SF_SMOKE).collect()}
    assert set(a) == set(b) and all(a[k] == b[k] for k in a)
    ev = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    batch = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if((F.col("value") < 0) | (F.col("value") > 450)).alias(
                "out_of_range"
            ),
        )
        .collect()
    }
    for k, r in batch.items():
        assert a[k]["n"] == r["n"]
        assert a[k]["out_of_range"] == r["out_of_range"]


def test_checkpoint_restart_resumes_exactly_once(spark):
    """Exactly-once recovery: a file-source stream stopped after two
    chunks and RESTARTED (new query object, same checkpoint) over the
    grown directory processes only the unseen chunks — no re-emission,
    no gaps. This is the failure-and-redeploy contract a 100 TB
    streaming job survives on."""
    import glob
    import os
    import shutil

    from benchmark_spark.catalog import SCHEMAS
    from benchmark_spark.streaming.windows import (
        await_done,
        events_stream_chunks,
        scratch_dir,
    )

    # materialize the canonical 4-chunk staging, then build a growing
    # source dir: phase 1 sees chunks 0-1, phase 2 adds chunks 2-3
    events_stream_chunks(spark, SF_SMOKE)
    chunks_dir = os.path.join(
        "/root/repo/.scratch", f"stream_chunks_{os.path.basename(SF_SMOKE)}"
    )
    chunks = sorted(glob.glob(os.path.join(chunks_dir, "chunk_*.parquet")))
    assert len(chunks) == 4
    src = scratch_dir()
    sink = scratch_dir()
    ckpt = scratch_dir()

    def run_phase(upto):
        for c in chunks[:upto]:
            dst = os.path.join(src, os.path.basename(c))
            if not os.path.exists(dst):
                shutil.copy(c, dst)
        q = (
            spark.readStream.schema(SCHEMAS["events"])
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "chunk_*.parquet"))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_done(q)
        return spark.read.schema(SCHEMAS["events"]).parquet(sink)

    phase1 = run_phase(2).count()
    expected1 = sum(
        spark.read.schema(SCHEMAS["events"]).parquet(c).count() for c in chunks[:2]
    )
    assert phase1 == expected1

    total = sum(
        spark.read.schema(SCHEMAS["events"]).parquet(c).count() for c in chunks
    )
    phase2 = run_phase(4)
    assert phase2.count() == total  # chunks 0-1 NOT reprocessed
    # and specifically no duplicated event ids
    assert phase2.select("event_id").distinct().count() == total


def test_stateful_attribution_twin_matches_batch(spark):
    """The streaming twin q_attribution's docstring promises: per-user
    last_click held as ONE state row via applyInPandasWithState over
    the 4-chunk stream; cumulative attributed/unattributed purchase
    counts must equal the batch IGNORE-NULLS window form exactly."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from benchmark_spark.operators.windows import q_attribution
    from benchmark_spark.streaming.windows import events_stream_chunks

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_purch", T.LongType()),
            T.StructField("n_attr", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_click_us", T.LongType()),
            T.StructField("n_purch", T.LongType()),
            T.StructField("n_attr", T.LongType()),
        ]
    )

    def attribute(key, pdfs, state: GroupState):
        last_click, n_purch, n_attr = (
            state.get if state.exists else (None, 0, 0)
        )
        frames = [pdf for pdf in pdfs]
        rows = pd.concat(frames).sort_values(["ts", "event_id"])
        for _, r in rows.iterrows():
            ts_us = int(r["ts"].value // 1000)  # pandas ns -> us
            if r["event_type"] == "purchase":
                n_purch += 1
                if last_click is not None and ts_us - last_click <= 1_800_000_000:
                    n_attr += 1
            if r["event_type"] == "click":
                last_click = ts_us
        state.update((last_click, n_purch, n_attr))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_purch": [n_purch], "n_attr": [n_attr]}
        )

    stream = events_stream_chunks(spark, SF_SMOKE)
    counted = stream.groupBy("user_id").applyInPandasWithState(
        attribute,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = "attr_state_sink"
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    final = (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.max("n_purch").alias("np"), F.max("n_attr").alias("na"))
        .agg(F.sum("np").alias("n_purchases"), F.sum("na").alias("n_attr"))
        .collect()[0]
    )
    batch = {r["attributed"]: r for r in q_attribution(spark, SF_SMOKE).collect()}
    batch_total = sum(r["n_purchases"] for r in batch.values())
    batch_attr = batch.get(1, {"n_purchases": 0})["n_purchases"]
    assert final["n_purchases"] == batch_total
    assert final["n_attr"] == batch_attr


def test_stream_dedup_wm_emits_each_key_exactly_once(spark):
    """dropDuplicatesWithinWatermark with the hour-bucketed key: the
    append-mode sink must hold each (user, type, hour) key EXACTLY
    once (no re-emission across micro-batches — all duplicates fall
    inside the 2 h delay by construction) and the emitted key set must
    equal the batch DISTINCT."""
    sink = all_specs()["q_stream_dedup_wm"].fn(spark, "/root/testdata/sf0.001")
    rows = sink.collect()
    keys = [(r["user_id"], r["event_type"], r["w_hour"]) for r in rows]
    assert len(keys) == len(set(keys))  # exactly-once emission
    events = load_table(spark, "/root/testdata/sf0.001", "events", assert_schema=False)
    batch = {
        (r["user_id"], r["event_type"], r["h"])
        for r in events.select(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
        ).distinct().collect()
    }
    assert set(keys) == batch


def test_stream_ewma_state_is_bounded_and_matches_batch(spark):
    """The registered applyInPandasWithState EWMA converges to the
    batch lag-window form (same days, same integer residuals), emits
    each day exactly once across the 4 micro-batches, and only emits
    days with a full 12-day history."""
    from collections import Counter

    from benchmark_spark.operators.windows import _EWMA_LAGS
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_stream_ewma"].fn(spark, "/root/testdata/sf0.001").collect()
    keys = [(r["event_type"], r["day"]) for r in rows]
    assert len(keys) == len(set(keys))  # append mode: exactly-once per day
    per_type = Counter(r["event_type"] for r in rows)
    n_days = len({r["day"] for r in rows}) + _EWMA_LAGS
    assert all(v == n_days - _EWMA_LAGS for v in per_type.values())
    # convergence: the batch q_ewma_anomaly top-3 rows appear with
    # identical residuals in the streaming output
    batch = all_specs()["q_ewma_anomaly"].fn(spark, "/root/testdata/sf0.001").collect()
    stream_map = {(r["event_type"], r["day"]): r["resid_scaled"] for r in rows}
    for b in batch:
        assert stream_map[(b["event_type"], b["day"])] == b["resid_scaled"]


def test_stream_hll_register_merge_equals_batch(spark):
    """The streaming 4-micro-batch register merge yields the exact
    register table (and hence estimate) a single batch pass computes:
    MAX is order- and replay-insensitive, so chunked arrival cannot
    change any register."""
    from pyspark.sql import functions as F

    from benchmark_spark.catalog import load_table
    from benchmark_spark.operators.sketches import hll_bucket_rho
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_stream_hll"].fn(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_registers"] for r in rows) == 256
    events = load_table(spark, "/root/testdata/sf0.001", "events", assert_schema=False)
    bucket, rho = hll_bucket_rho(F.col("user_id").cast("string"))
    batch_regs = (
        events.select(bucket.alias("bucket"), rho.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("mx"))
        .collect()
    )
    batch_hist = {}
    seen = set()
    for r in batch_regs:
        batch_hist[r["mx"]] = batch_hist.get(r["mx"], 0) + 1
        seen.add(r["bucket"])
    if len(seen) < 256:  # only unhit buckets produce rho=0 rows
        batch_hist[0] = batch_hist.get(0, 0) + 256 - len(seen)
    assert {r["rho"]: r["n_registers"] for r in rows} == batch_hist
    assert rows[0]["exact_distinct"] == events.select("user_id").distinct().count()
