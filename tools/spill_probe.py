#!/usr/bin/env python3
"""Spill survival probe: the engine completes under memory pressure.

SCALE.md's "Spill-aware" posture says partitions are sized so sorts
and aggregations fit executor memory — and when they don't, Spark's
external sort/aggregation spills to disk instead of failing. That
second half was prose. This probe MEASURES it:

* parent process: computes the expected answer (row count + checksum)
  of a sort-heavy shuffle over the x10 events replica with a roomy
  heap, then launches a child Spark with a deliberately small driver
  heap (local mode: driver == executor) and few, oversized shuffle
  partitions — each sort partition is far larger than the execution
  memory a task can get;
* child process: runs the same query, then reads its OWN task metrics
  through the local Spark UI REST API (/api/v1/.../stages) and
  reports memoryBytesSpilled / diskBytesSpilled alongside the answer.

PASS = child answer identical to the roomy-heap answer AND
diskBytesSpilled > 0 (the run actually exercised the spill path —
a tiny dataset that silently fits would prove nothing).

The workload is a forced sort-merge self-join of n x 100k event rows
padded to ~400 B each, in 2 shuffle partitions: each task must
externally sort two ~200 MB inputs through a heap an order of
magnitude smaller. The answer checksum is order-insensitive
(SUM of xxhash64 over joined rows), so it is identical under any
partitioning — the roomy parent and the starved child must agree
bit-for-bit.

Usage: python tools/spill_probe.py [multiplier]   (default 10)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MULT = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1] != "--child" else 10
PAD = 400  # bytes of deterministic padding per row — makes rows wide
HEAP = os.environ.get("SPARK_GRAFT_SPILL_HEAP", "700m")


def _query(spark, replica_dir: str):
    """Forced sort-merge self-join of padded rows, checksummed.

    Broadcast is off and AQE is off, so both sides shuffle on
    event_id and every task externally sorts its partition of both
    inputs — the spill path under test. The checksum is a SUM of
    per-row hashes over the join output: order- and
    partitioning-insensitive, but sensitive to any lost, duplicated,
    or corrupted row.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    events = spark.read.parquet(os.path.join(replica_dir, "events.parquet"))
    padded = events.select(
        "event_id",
        "value",
        F.repeat(F.md5(F.col("event_id").cast("string")), PAD // 32).alias("pad"),
    )
    left = padded.alias("l")
    right = padded.select(
        F.col("event_id").alias("r_event_id"),
        F.col("pad").alias("r_pad"),
    )
    joined = left.join(right, F.col("l.event_id") == F.col("r_event_id"))
    return joined.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not SUM: order/partitioning-insensitive and cannot
        # overflow under ANSI arithmetic
        F.expr("bit_xor(xxhash64(l.event_id, l.pad, r_pad))").alias("checksum"),
    ).collect()[0]


def child() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("spill-probe-child")
        .master("local[4]")
        .config("spark.driver.memory", HEAP)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    row = _query(spark, os.path.join(REPO, ".scratch", f"curve_x{MULT}"))

    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
    print(
        "SPILL_PROBE_RESULT "
        + json.dumps(
            {
                "n": row["n"],
                "checksum": row["checksum"],
                "memoryBytesSpilled": mem_spill,
                "diskBytesSpilled": disk_spill,
                "heap": HEAP,
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    from benchmark_spark.session import get_spark
    from tools.scale_curve import build

    replica = os.path.join(REPO, ".scratch", f"curve_x{MULT}")
    build(replica, MULT, tables=("events",))

    spark = get_spark("spill-probe-parent", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    expected = _query(spark, replica)
    spark.stop()

    env = dict(os.environ)
    env["SPARK_GRAFT_SPILL_MULT"] = str(MULT)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(MULT)],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    line = next(
        (
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("SPILL_PROBE_RESULT ")
        ),
        None,
    )
    if proc.returncode != 0 or line is None:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        raise SystemExit(f"child failed rc={proc.returncode}")
    got = json.loads(line[len("SPILL_PROBE_RESULT "):])
    ok_answer = got["n"] == expected["n"] and got["checksum"] == expected["checksum"]
    ok_spill = got["diskBytesSpilled"] > 0
    print(
        json.dumps(
            {
                "metric": "spill_probe",
                "mult": MULT,
                "rows": expected["n"],
                "heap": got["heap"],
                "answer_match": ok_answer,
                "diskBytesSpilled": got["diskBytesSpilled"],
                "memoryBytesSpilled": got["memoryBytesSpilled"],
                "pass": ok_answer and ok_spill,
            }
        )
    )
    if not (ok_answer and ok_spill):
        raise SystemExit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        MULT = int(sys.argv[2])
        child()
    else:
        main()
