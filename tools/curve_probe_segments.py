"""Probe cost vs segment count (round 14 — the measured basis for the
compaction claim).

q_ann_index_append/q_ann_stream_ingest leave the index segmented; the
module docstrings claim "probes pay one extra segment scan until
compaction". This tool measures that price: the corpus tail is
ingested as 1 / 2 / 4 / 8 frozen-codebook segments (the
stream_append_segment mechanics, batch ids assigned directly — the
segment layout is identical to what foreachBatch produces), the probe
is timed at each segment count, and once more against the compacted
single-segment generation. Every configuration serves the IDENTICAL
result set (verified in-loop), so the delta is pure segment overhead:
per-segment parquet reads + a wider union under the probe joins.

Each k runs against its OWN COPY of the base artifact so the shared
build/append artifacts (and q_ann_stream_ingest's ledger) are never
polluted. Median of 3 warm trials per point; one JSON line; recorded
into SCALE.md.

Usage: python tools/curve_probe_segments.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from benchmark_spark.llm import ann_index as ai  # noqa: E402
from benchmark_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("curve-probe-segments", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    n_all = ai._corpus_rows(sf_dir)
    base_n = (ai._BASE_NUM * n_all) // ai._BASE_DEN
    base_path, meta = ai.build_index(spark, sf_dir, base_n=base_n)
    tail = ai._vecs(spark, sf_dir).filter(F.col("vec_id") >= base_n).select(
        "vec_id", F.col("v").cast("array<float>").alias("embedding")
    )
    n_tail = n_all - base_n

    def timed_probe(path, segs):
        df = ai._probe_plan(spark, sf_dir, path, meta, extra_segments=segs)
        rows = sorted(df.collect())  # warm + result capture
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            ai._probe_plan(spark, sf_dir, path, meta,
                           extra_segments=segs).toPandas()
            trials.append(time.perf_counter() - t0)
        return rows, round(statistics.median(trials), 4)

    points = {}
    reference = None
    for k in (1, 2, 4, 8):
        # a CLEAN base clone per k (the registered _clone_index path:
        # codebooks + base postings only), so no append delta from the
        # shared artifact rides along into the fold
        path = ai._clone_index(base_path, f"-curve{k}")
        if len(ai.stream_ledger(path)) != k:
            width = max(1, (n_tail + k - 1) // k)
            for b in range(k):
                lo = base_n + b * width
                ai.stream_append_segment(
                    spark, path,
                    tail.filter((F.col("vec_id") >= lo)
                                & (F.col("vec_id") < lo + width)),
                    b,
                )
        rows, med = timed_probe(path, ai.stream_segments(path))
        if reference is None:
            reference = rows
        assert rows == reference, f"k={k} served a different result set"
        points[f"segments_{1 + k}"] = med  # base + k tail segments
    # compacted single-segment generation: the REGISTERED compaction
    # path folds base + the 1-segment tail (no hand-rolled twin — the
    # tool measures exactly what compact_index produces)
    one = f"{base_path}-curve1"
    cpath, _cmeta = ai.compact_index(spark, one, ai.load_manifest(one))
    rows, med = timed_probe(cpath, None)
    assert rows == reference, "compacted generation served a different result set"
    points["segments_1_compacted"] = med
    print(json.dumps({
        "curve": "probe_vs_segments",
        "sf_dir": sf_dir,
        "n": n_all,
        "tail": n_tail,
        "points": points,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
