#!/usr/bin/env python3
"""Scale-convergence probe: Spark vs DuckDB on an N-times replica of sf0.1.

BENCH_NOTES.md argues the three floor-bound headline queries
(q2_agg / q7_tumble / q8_knn) are above 2x their DuckDB baseline only
because the ~30 ms per-action Spark floor exceeds the entire 2x budget
of an 8-17 ms baseline, and that the ratio converges to the
plan-quality ratio as data grows (the floor is per-action, not
per-row). This tool MEASURES that claim instead of asserting it:

  1. Materialize ``.scratch/sf{0.1*N}/`` — every fact table
     (orders, lineitem, events, documents, embeddings) replicated N
     times with shifted keys (join keys shifted consistently, event
     timestamps shifted by one 30-day span per replica so window
     cardinality scales too); dimension tables copied as-is.
  2. Run the 8 headline queries on BOTH engines under each engine's
     "mem" protocol (tables pre-loaded/cached, warm-ups, median of
     trials): Spark via the bench.py protocol, DuckDB on native
     tables created from the same parquet.
  3. Print one JSON line with per-query seconds for both engines and
     the ratio — the number BENCH_NOTES.md's convergence table cites.

Replica generation is DuckDB `* REPLACE` SQL except events, which
must stay physically TIMESTAMP(NANOS) for catalog.load_table's
nanosAsLong read path — DuckDB's writer coerces ns->us, so events is
replicated with pyarrow (preserves timestamp[ns]).

Usage: python tools/scale_probe.py [N]      (default N=20 -> sf2.0)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
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
# key shifts per replica index (keeps joins consistent, keys unique)
ORDERKEY_SHIFT = 1_000_000
EVENT_SHIFT = 1_000_000
DOC_SHIFT = 10_000
VEC_SHIFT = 10_000
EVENTS_SPAN_DAYS = 30

DIMS = ["region", "nation", "customer", "supplier", "part"]
WARMUP = 2
TRIALS = 5


def build(out_dir: str, n: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    rep = {
        "orders": f"* REPLACE (o_orderkey + i * {ORDERKEY_SHIFT} AS o_orderkey)",
        "lineitem": f"* REPLACE (l_orderkey + i * {ORDERKEY_SHIFT} AS l_orderkey)",
        "documents": f"* REPLACE (doc_id + i * {DOC_SHIFT} AS doc_id)",
        "embeddings": f"* REPLACE (vec_id + i * {VEC_SHIFT} AS vec_id)",
    }
    for table, select in rep.items():
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            continue
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{SRC}/{table}.parquet'), "
            f"range({n}) _(i)) TO '{dst}' (FORMAT PARQUET)"
        )
    for table in DIMS:
        dst = f"{out_dir}/{table}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    dst = f"{out_dir}/events.parquet"
    if not os.path.exists(dst):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        base = pq.read_table(f"{SRC}/events.parquet")
        span_ns = EVENTS_SPAN_DAYS * 86_400 * 1_000_000_000
        chunks = []
        for i in range(n):
            t = base.set_column(
                base.schema.get_field_index("event_id"),
                "event_id",
                pc.add(base.column("event_id"), i * EVENT_SHIFT),
            )
            ts_ns = pc.add(base.column("ts").cast(pa.int64()), i * span_ns)
            t = t.set_column(
                t.schema.get_field_index("ts"), "ts", ts_ns.cast(pa.timestamp("ns"))
            )
            chunks.append(t)
        pq.write_table(
            pa.concat_tables(chunks), dst, coerce_timestamps=None, store_schema=False
        )


def time_duckdb(sf_dir: str) -> dict[str, float]:
    import duckdb

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    tables = DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:  # mem protocol: native tables, not parquet re-scans
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # two materialization endpoints: fetchall() is BASELINE.md's own
    # protocol; fetchdf() (Arrow->pandas) is the apples-to-apples twin
    # of Spark's toPandas() and matters on wide results (q1: 3M rows)
    out: dict[str, dict[str, float]] = {"fetchall": {}, "fetchdf": {}}
    for q in HEADLINE:
        sql = oracles[q]
        for mode in ("fetchall", "fetchdf"):
            fetch = (lambda c: c.fetchall()) if mode == "fetchall" else (lambda c: c.fetchdf())
            for _ in range(WARMUP):
                fetch(con.execute(sql))
            samples = []
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                fetch(con.execute(sql))
                samples.append(time.perf_counter() - t0)
            out[mode][q] = round(statistics.median(samples), 4)
    return out


def time_spark(sf_dir: str) -> dict[str, float]:
    # reuse bench.py verbatim (same session conf, warm-up, interleaved
    # trials) so these numbers are protocol-identical to BENCH_r{N}
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_MODE="mem")
    proc = subprocess.run(
        [sys.executable, f"{REPO}/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    queries = dict(payload["queries"])
    queries["_floor"] = payload["floor_sec"]
    return queries


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf = round(0.1 * n, 1)
    out_dir = f"{REPO}/.scratch/sf{sf}"
    build(out_dir, n)
    spark_t = time_spark(out_dir)
    duck = time_duckdb(out_dir)
    floor = spark_t.pop("_floor")
    duck_t = duck["fetchall"]  # BASELINE.md protocol
    ratios = {q: round(spark_t[q] / duck_t[q], 2) if duck_t[q] else None for q in HEADLINE}
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "sf": sf,
                "replicas": n,
                "spark_sec": spark_t,
                "duckdb_sec": duck_t,
                "duckdb_fetchdf_sec": duck["fetchdf"],
                "ratio": ratios,
                "spark_floor_sec": floor,
                "spark_total": round(sum(spark_t.values()), 4),
                "duckdb_total": round(sum(duck_t.values()), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
