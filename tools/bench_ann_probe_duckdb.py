"""Tier-1 baseline twin for q_ann_index_probe (VERDICT r13 #4).

bench.py's `ann_probe_sec` times SERVING from the persisted IVFPQ
artifact (read kilobyte codebooks + partitioned postings, ADC-score,
exact-rerank — zero training). Its binding DuckDB twin must do the
same work: this tool builds (or reuses) the artifact via the
registered build path, then times a DuckDB query that reads the SAME
persisted parquet (coarse/pq codebooks, lid-partitioned postings) and
runs the probe-select SQL VERBATIM (_probe_select_sql is the oracle's
serving math — coarse-rank, ADC over the 48-bit codes, shortlist,
exact rerank, in_exact10) with the training CTEs replaced by artifact
reads. Median of 3 warm trials, same protocol as the q_knn_ivfpq
Tier-1 row. Prints one JSON line; the result is recorded in
BASELINE.md and compared against bench.py's ann_probe_sec in
BENCH_NOTES.md.

Usage: python tools/bench_ann_probe_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from benchmark_spark.llm import ann_index as ai  # noqa: E402
from benchmark_spark.llm.ann_index import _probe_select_sql  # noqa: E402
from benchmark_spark.session import get_spark  # noqa: E402


def artifact_probe_sql(sf_dir: str, path: str, meta: dict) -> str:
    """The serving twin: identical probe math (_probe_select_sql
    verbatim), inputs read from the persisted artifact instead of
    being re-derived by training CTEs."""
    emb = os.path.join(sf_dir, "embeddings.parquet")
    coarse = os.path.join(path, "coarse", "*.parquet")
    pq = os.path.join(path, "pq", "*.parquet")
    postings = os.path.join(path, "postings", "*", "*.parquet")
    return f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM read_parquet('{emb}')
    ),
    params AS (SELECT {int(meta["nprobe"])} AS nprobe),
    vm AS (
        SELECT vec_id, p.p AS p,
               CAST(floor(v[p.p + 1] * 1000000 + 0.5) AS BIGINT) AS xm
        FROM vecs, unnest(range(0, 64)) AS p(p)
    ),
    ccf AS (SELECT cid, i, cm FROM read_parquet('{coarse}')),
    rcf AS (SELECT s, cid, i, cm FROM read_parquet('{pq}')),
    post AS (
        SELECT vec_id, CAST(lid AS BIGINT) AS lid, codes
        FROM read_parquet('{postings}', hive_partitioning = true)
    ),
    lists AS (SELECT vec_id, lid FROM post),
    codes AS (
        SELECT vec_id, i.i AS s, codes[i.i + 1] AS cid
        FROM post, unnest(range(0, len(codes))) AS i(i)
    ){_probe_select_sql()}"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-ann-probe-duckdb", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    path, meta = ai.build_index(spark, sf_dir)  # reuse if persisted
    sql = artifact_probe_sql(sf_dir, path, meta)

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    rows = con.execute(sql).fetchall()  # warm-up (+ row-count sanity)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        trials.append(time.perf_counter() - t0)
    print(json.dumps({
        "metric": "duckdb_ann_index_probe",
        "value": round(statistics.median(trials), 4),
        "unit": "sec",
        "rows": len(rows),
        "trials": [round(t, 4) for t in trials],
        "sf_dir": sf_dir,
        "nprobe": meta["nprobe"],
        "nlist": meta["nlist"],
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
