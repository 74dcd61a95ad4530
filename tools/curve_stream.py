#!/usr/bin/env python3
"""Streaming-tier scale curve: throughput and state-bound, MEASURED.

SCALE.md's streaming row claims "state size: watermark bounds it" —
until now that was prose backed by semantics tests (late-drop,
exactly-once restart), not by a measured curve. This tool runs the
engine's watermarked tumbling aggregation as a REAL multi-micro-batch
Structured Streaming job at x1/x10/x30 event volume (same 30-day
window carrying N x the traffic — tools/scale_curve.py's replica
model) and reports, straight from StreamingQueryProgress:

* rows/sec end-to-end (availableNow over K ascending file chunks,
  maxFilesPerTrigger=1 so every chunk is its own micro-batch);
* max/final state rows (stateOperators[].numRowsTotal) — the claim
  is that this stays ~CONSTANT as input grows 30x, because append
  mode + watermark evict every window the watermark has passed while
  complete-mode state would hold all 720x5 window-groups;
* rows removed from state (numRowsRemoved summed) — nonzero proves
  eviction actually ran, it isn't just small state;
* per-batch trigger latency.

The aggregation is the q7_tumble expression (1-hour window x
event_type) with a 1-hour watermark — the grouping is intentionally
NOT per-user, so state cardinality is (open windows x 5 types) and
any growth with the multiplier would falsify the bound.

Usage: python tools/curve_stream.py [multipliers...]  (default 1 10 30)
Prints one JSON line per scale and a final summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_curve import build  # noqa: E402

NCHUNKS = int(os.environ.get("SPARK_GRAFT_STREAM_CHUNKS", "8"))


def stage_chunks(spark, replica_dir: str, n: int) -> str:
    """Split the events replica into NCHUNKS files ascending in event
    time (day ranges), so maxFilesPerTrigger=1 replays the month as
    NCHUNKS in-order micro-batches — the shape a file-drop ingestion
    directory has in production. Idempotent per (scale, NCHUNKS)."""
    stage = os.path.join(REPO, ".scratch", f"stream_curve_x{n}_{NCHUNKS}")
    marker = os.path.join(stage, "_STAGED")
    if os.path.exists(marker):
        return stage
    if os.path.exists(stage):
        shutil.rmtree(stage)
    os.makedirs(stage)
    # duckdb-built replicas carry TIMESTAMP_NTZ and the replica index
    # column; watermarks need TIMESTAMP (session tz is UTC, so the
    # instant is unchanged) and the stream wants the table schema only
    events = spark.read.parquet(os.path.join(replica_dir, "events.parquet")).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    days_per_chunk = max(1, 31 // NCHUNKS + 1)
    chunk = F.least(
        F.lit(NCHUNKS - 1), ((F.dayofmonth("ts") - 1) / days_per_chunk).cast("int")
    )
    for i in range(NCHUNKS):
        tmp = os.path.join(stage, f"_tmp_{i}")
        events.filter(chunk == i).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
        )
        # chunk_N name order == event-time order: the file source picks
        # up files in discovery order within one listing, and one file
        # per trigger keeps batches time-ascending
        os.replace(os.path.join(tmp, part), os.path.join(stage, f"chunk_{i}.parquet"))
        shutil.rmtree(tmp)
    with open(marker, "w"):
        pass
    return stage


def run_scale(spark, n: int) -> dict:
    replica = os.path.join(REPO, ".scratch", f"curve_x{n}")
    build(replica, n, tables=("events",))
    stage = stage_chunks(spark, replica, n)

    schema = spark.read.parquet(os.path.join(stage, "chunk_0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(stage, "chunk_*.parquet"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total")
    )
    sink = f"curve_stream_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(REPO, ".scratch", f"ckpt_{sink}")
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(f"stream x{n} did not finish in 600s")
    wall = time.perf_counter() - t0

    input_rows, state_max, removed, batch_ms = 0, 0, 0, []
    state_final = 0
    for p in q.recentProgress:
        input_rows += p["numInputRows"]
        batch_ms.append(p["durationMs"].get("triggerExecution", 0))
        for so in p.get("stateOperators", []):
            state_max = max(state_max, so["numRowsTotal"])
            state_final = so["numRowsTotal"]
            removed += so.get("numRowsRemoved", 0)
    emitted = spark.table(sink).count()
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "scale": f"x{n}",
        "input_rows": input_rows,
        "batches": len([b for b in batch_ms if b]),
        "wall_sec": round(wall, 2),
        "rows_per_sec": int(input_rows / wall),
        "state_rows_max": state_max,
        "state_rows_final": state_final,
        "state_rows_removed": removed,
        "emitted_windows": emitted,
        "max_batch_ms": max(batch_ms) if batch_ms else 0,
    }


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    from benchmark_spark.session import get_spark

    spark = get_spark("stream-curve", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in mults:
        out[f"x{n}"] = run_scale(spark, n)
        print(json.dumps(out[f"x{n}"]), flush=True)
    print(json.dumps({"metric": "stream_curve", "base": "sf0.1", "curves": out}))


if __name__ == "__main__":
    main()
