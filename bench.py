#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Protocol mirrors the reference's "mem" runs (SURVEY.md §6 /
BASELINE.md): one long-lived SparkSession, input tables cached and
materialized before timing, plans built once and re-executed
(the harness re-runs identical SQL per trial), two global warm-up
rounds so JIT/codegen is steady-state, then median of N trials.

Bench-only configuration (documented, reference-mirroring — the
"mem" rows of SURVEY.md §4): AQE off (its per-stage re-planning
barrier is pure overhead on sub-100ms queries; correctness runs and
cluster scale keep it ON), 4 shuffle partitions, uncompressed
in-memory columnar cache, zero locality wait, Arrow collection.
Result at sf0.1 is ~1.1-1.3x the DuckDB oracle baseline
(BASELINE.md Tier 1; bar is 2x).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import all_specs
from benchmark_spark.session import get_spark

HEADLINE = [
    "q1_scan",
    "q2_agg",
    "q3_join",
    "q4_wordcount",
    "q5_pricing",
    "q6_window",
    "q7_tumble",
    "q8_knn",
]

CACHE_TABLES = ["orders", "lineitem", "events", "documents", "embeddings"]

WARMUP_ROUNDS = 3
TRIALS = 7  # interleaved rounds: each round times every query once

BENCH_CONF = {
    "spark.locality.wait": "0s",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.inMemoryColumnarStorage.compressed": "false",
    "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    # the reference reports separate "disk" (buffer cache cleared) and
    # "mem" (pre-cached) rows [P]; default mirrors its mem protocol,
    # SPARK_GRAFT_BENCH_MODE=disk skips the cache (parquet re-scanned
    # per trial — OS page cache still applies, as in any warm rerun)
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "mem")
    shuffle = int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "4"))
    spark = get_spark("bench", shuffle_partitions=shuffle, extra_conf=BENCH_CONF)
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "mem":
        # identical scans inside the queries hit the cached relation
        for t in CACHE_TABLES:
            load_table(spark, sf_dir, t, assert_schema=False).cache().count()

    specs = all_specs()
    dfs = {name: specs[name].fn(spark, sf_dir) for name in HEADLINE}
    # per-action fixed-cost probe: a one-row single-partition action
    # carries zero query work, so its time is pure py4j round-trip +
    # job/task scheduling + Arrow collection — the floor under every
    # headline number (see BENCH_NOTES.md)
    floor_df = spark.range(0, 1, 1, 1)

    # global warm-up: JIT/codegen/broadcasts reach steady state before
    # any measurement (first executions are 2-3x slower)
    for _ in range(WARMUP_ROUNDS):
        floor_df.toPandas()
        for df in dfs.values():
            df.toPandas()

    # interleaved rounds: one timed execution of every query per
    # round, median across rounds — drift (GC, JIT recompiles, OS
    # noise) hits all queries equally instead of one query's trials
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    floor_samples: list[float] = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        floor_df.toPandas()
        floor_samples.append(time.perf_counter() - t0)
        for name, df in dfs.items():
            t0 = time.perf_counter()
            df.toPandas()  # Arrow-batched result materialization
            samples[name].append(time.perf_counter() - t0)
    per_query = {n: round(statistics.median(ts), 4) for n, ts in samples.items()}

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_median_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "floor_sec": round(statistics.median(floor_samples), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
