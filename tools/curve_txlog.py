#!/usr/bin/env python3
"""Transaction-log snapshot-resolution curve: raw replay vs checkpoint.

The txlog design claim (SCALE.md item 20) is that Delta-style log
checkpoints bound snapshot resolution to O(commits since checkpoint)
— at streaming-ingest commit rates (one commit per micro-batch, tens
of thousands per day) a raw full-log replay per read would come to
dominate query planning. This tool MEASURES it: build a log of N
metadata commits (commit documents are the unit of replay cost; no
Spark needed), then time snapshot_adds() with and without a
checkpoint at the head.

Usage: python tools/curve_txlog.py [commit-counts...]  (default 100 1000 5000)
Prints one JSON line per scale and a summary line.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from benchmark_spark.sources.txlog import TxLogTable


def build_log(path: str, n_commits: int) -> TxLogTable:
    t = TxLogTable(path)
    for i in range(n_commits):
        actions = [{"add": f"f{i}.parquet", "rows": 100, "cols": {"k": {"min": i, "max": i}}}]
        if i % 3 == 2:  # every third commit also retires an older file
            actions.append({"remove": f"f{i - 2}.parquet"})
        t.commit(actions, op="append")
    return t


def median_resolution_ms(t: TxLogTable, trials: int = 7) -> float:
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        t.snapshot_adds()
        ts.append((time.perf_counter() - t0) * 1000)
    return round(statistics.median(ts), 2)


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [100, 1000, 5000]
    out = {}
    for n in counts:
        d = tempfile.mkdtemp(prefix="txlog-curve-")
        try:
            t = build_log(d, n)
            raw = median_resolution_ms(t)
            t.checkpoint()
            t.commit([{"add": "tail.parquet", "rows": 1, "cols": {}}], op="append")
            warm = median_resolution_ms(t)
            row = {
                "commits": n,
                "live_files": len(t.snapshot_adds()),
                "raw_replay_ms": raw,
                "from_checkpoint_ms": warm,
                "speedup": round(raw / warm, 1) if warm else None,
            }
            out[f"n{n}"] = row
            print(json.dumps(row))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"metric": "txlog_resolution_curve", "curves": out}))


def cdc_curve(mults: list[int]) -> None:
    """CDC cost vs TABLE size (--cdc mode): build a real txlog table of
    N x sf0.1 orders rows, apply one CONSTANT-size ranged delete, and
    time read_changes() against a full-table scan. The claim under
    test (q_txlog_cdc): CDC reads O(changed files), never O(table) —
    its wall time should stay flat while the table (and the full-scan
    denominator) grows."""
    from pyspark.sql import functions as F

    from benchmark_spark.catalog import load_table
    from benchmark_spark.session import get_spark
    from benchmark_spark.sources.txlog import TxLogTable

    spark = get_spark("txlog-cdc-curve", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "orders", assert_schema=False).select(
        "o_orderkey", "o_totalprice"
    )
    out = {}
    for n in mults:
        df = base
        for r in range(1, n):  # replicas with shifted keys
            df = df.unionByName(
                base.select(
                    (F.col("o_orderkey") + r * 10_000_000).alias("o_orderkey"),
                    "o_totalprice",
                )
            )
        d = tempfile.mkdtemp(prefix="txlog-cdc-")
        try:
            t = TxLogTable.create(spark, d, df, "o_orderkey", 8 * n, ("o_orderkey",))
            # constant-size change regardless of table size
            t.delete_where(spark, "o_orderkey", 1, 40_000, ("o_orderkey",))
            t0 = time.perf_counter()
            changed = t.read_changes(spark, 0, 1).count()
            cdc_s = time.perf_counter() - t0
            t1 = time.perf_counter()
            total = t.read(spark).count()
            full_s = time.perf_counter() - t1
            row = {
                "mult": n,
                "table_rows": total,
                "changed_rows": changed,
                "cdc_sec": round(cdc_s, 3),
                "full_scan_sec": round(full_s, 3),
            }
            out[f"x{n}"] = row
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"metric": "txlog_cdc_curve", "base": "sf0.1", "curves": out}))


def partition_curve(mults: list[int]) -> None:
    """Partition+stats prune vs TABLE size (--partition mode, round
    10): build a partitioned txlog table of N x sf0.1 orders, run a
    CONSTANT-selectivity (status='F' AND one-bucket key range)
    read_where, and record the composed counters plus wall time
    against a full scan. The claim under test (q_txlog_partition_prune):
    files_scanned stays ~FLAT while files_total grows ~linearly — the
    partition filter is O(1) per file from the log and the zone map
    bounds the remainder, so selective reads cost O(matching cells),
    never O(table)."""
    from pyspark.sql import functions as F

    from benchmark_spark.catalog import load_table
    from benchmark_spark.session import get_spark
    from benchmark_spark.sources.txlog import TxLogTable

    spark = get_spark("txlog-partition-curve", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "orders", assert_schema=False).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    blo, bhi = base.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    span = int(bhi) - int(blo) + 1  # dense shift: no gaps, so the
    out = {}                       # equal-width buckets stay occupied
    for n in mults:
        df = base
        for r in range(1, n):  # replicas with shifted keys, same statuses
            df = df.unionByName(
                base.select(
                    (F.col("o_orderkey") + r * span).alias("o_orderkey"),
                    "o_orderstatus",
                    "o_totalprice",
                )
            )
        d = tempfile.mkdtemp(prefix="txlog-part-")
        try:
            t = TxLogTable.create_partitioned(
                spark, d, df, "o_orderstatus", "o_orderkey", 8 * n, ("o_orderkey",)
            )
            lo, hi = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
            width = max(1, (int(hi) - int(lo) + 8 * n) // (8 * n))
            dlo, dhi = int(lo) + 3 * width, int(lo) + 3 * width + width // 2
            t0 = time.perf_counter()
            sel, c = t.read_where(
                spark, "o_orderkey", dlo, dhi, partition={"o_orderstatus": "F"}
            )
            n_sel = sel.count()
            sel_s = time.perf_counter() - t0
            t1 = time.perf_counter()
            total = t.read(spark).count()
            full_s = time.perf_counter() - t1
            row = {
                "mult": n,
                "table_rows": total,
                "selected_rows": n_sel,
                "files_total": c["files_total"],
                "files_in_partition": c["files_in_partition"],
                "files_scanned": c["files_scanned"],
                "selective_sec": round(sel_s, 3),
                "full_scan_sec": round(full_s, 3),
            }
            out[f"x{n}"] = row
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"metric": "txlog_partition_curve", "base": "sf0.1", "curves": out}))


if __name__ == "__main__":
    if "--cdc" in sys.argv:
        cdc_curve([int(a) for a in sys.argv[1:] if a != "--cdc"] or [1, 4, 10])
    elif "--partition" in sys.argv:
        partition_curve(
            [int(a) for a in sys.argv[1:] if a != "--partition"] or [1, 4, 10]
        )
    else:
        main()
