#!/usr/bin/env python3
"""Round-7 scale curves — the VERDICT r5 item-5 batch, measured.

Four claims in SCALE.md / query docstrings that still rested on plan
shape rather than data get curves here, on the same x1/x10/x30
replica corpus tools/scale_curve.py builds (salted documents, shifted
embeddings/orders/events — see that module's docstring for why the
replica model keeps each query's work model honest):

1. q_graph_reachability A/B — WITH RECURSIVE (UnionLoop over a
   cached edge view) vs the explicit driver-side BFS loop with
   localCheckpoint per round (the connected-components machinery).
   The docstring claims the explicit loop is the 100 TB path and the
   recursive CTE is right while the frontier stays small; this
   measures both on the SAME materialized edge set at each scale.
2. q_skyline_grid prune fraction — the grid pre-filter's whole value
   is that the exact pass sees a shrinking fraction of a growing
   corpus. Reports survivors / total per scale, plus wall time.
3. q_ann_recall — does recall@3 hold as the corpus grows 30x? The
   LSH buckets get denser (more candidates per probe), so recall
   should hold or rise while the per-anchor candidate count grows;
   reports mean recall and wall time per scale.
4. q_conversion_lag / q_path_trigrams — window-state growth: same
   30-day event window carrying N x traffic (users shift per
   replica, so per-user state is constant and the shuffle grows
   linearly; these should scale like the other window-tier curves).

Usage: python tools/curve_round7.py [multipliers...]  (default 1 10 30)
Prints one JSON line per scale and a final summary line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from tools.scale_curve import build  # replica builder (marker-cached)  # noqa: E402

TRIALS = int(os.environ.get("SPARK_GRAFT_CURVE_TRIALS", "3"))


def _timed(thunk, trials: int = TRIALS) -> tuple[float, object]:
    """Median wall seconds of `thunk` plus its (last) result."""
    samples, result = [], None
    for _ in range(trials):
        t0 = time.perf_counter()
        result = thunk()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3), result


_REACH_SQL = """
    WITH RECURSIVE reach(node, hop) AS (
        SELECT CAST(0 AS BIGINT) AS node, 0 AS hop
        UNION ALL
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN curve7_edges e ON e.src = r.node
        WHERE r.hop < 8
    )
    SELECT node AS vec_id, CAST(MIN(hop) AS BIGINT) AS hops
    FROM reach GROUP BY node
"""


def reachability_ab(spark: SparkSession, d: str, n: int) -> dict:
    """WITH RECURSIVE (UnionLoop) vs explicit checkpointed BFS loop
    over the SAME pre-materialized edge table.

    Edge-growth model: the x1 kNN edge list replicated n times with
    shifted ids — disconnected copies, so the BFS frontier stays the
    x1 frontier while every iteration's join probes an n-times edge
    table. That is the '30x the edge count' question VERDICT r5
    item 5 asks; re-deriving kNN edges over the identical-vector
    embedding replicas would instead grow LSH bucket PAIRS
    quadratically (900x at x30) — a corpus-growth model nobody runs
    a similarity graph under. Edge materialization happens once
    OUTSIDE the timers for both variants, isolating loop machinery.
    """
    from benchmark_spark.llm.graph import knn_edges

    x1_dir = f"{REPO}/.scratch/curve_x1"
    build(x1_dir, 1)
    edge_dir = f"{REPO}/.scratch/curve7_edges_x{n}"
    if not os.path.exists(os.path.join(edge_dir, "_SUCCESS")):
        base = knn_edges(spark, x1_dir).localCheckpoint(eager=True)
        out = None
        for i in range(n):
            rep = base.select(
                (F.col("src") + F.lit(i * 10_000)).cast("long").alias("src"),
                (F.col("dst") + F.lit(i * 10_000)).cast("long").alias("dst"),
            )
            out = rep if out is None else out.union(rep)
        out.write.mode("overwrite").parquet(edge_dir)
    edges = spark.read.parquet(edge_dir).cache()
    n_edges = edges.count()  # materialized before any timer starts
    edges.createOrReplaceTempView("curve7_edges")

    def run_recursive():
        return spark.sql(_REACH_SQL).count()

    def run_explicit():
        frontier = spark.createDataFrame([(0, 0)], "node BIGINT, hop INT")
        reached = frontier.localCheckpoint(eager=True)
        for h in range(1, 9):
            frontier = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .select(F.col("dst").alias("node"), F.lit(h).alias("hop"))
                .join(reached.select("node"), "node", "left_anti")
                .dropDuplicates(["node"])
                .localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break
            reached = reached.union(frontier).localCheckpoint(eager=True)
        return reached.count()

    rec_sec, rec_rows = _timed(run_recursive)
    exp_sec, exp_rows = _timed(run_explicit)
    edges.unpersist()
    assert rec_rows == exp_rows, f"variant mismatch: {rec_rows} vs {exp_rows}"
    return {
        "edges": n_edges,
        "recursive_sec": rec_sec,
        "explicit_loop_sec": exp_sec,
        "reached_nodes": rec_rows,
    }


def skyline_prune(spark: SparkSession, d: str) -> dict:
    """Wall time plus the measured prune fraction (points the exact
    pass never sees). Mirrors q_skyline_grid's cell math exactly."""
    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    spec = all_specs()["q_skyline_grid"]
    sec, n_frontier = _timed(lambda: spec.fn(spark, d).count())

    orders = load_table(spark, d, "orders", assert_schema=False)
    agg = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "spend_cents"
        ),
    )
    SX, SY = 2, 2_000_000  # keep in lockstep with q_skyline_grid
    pts = agg.withColumn("gx", F.expr(f"n_orders div {SX}")).withColumn(
        "gy", F.expr(f"spend_cents div {SY}")
    )
    cells = pts.groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("npts"))
    c, dd = cells.alias("c"), cells.alias("d")
    doomed = c.join(
        F.broadcast(dd),
        (F.col("d.gx") > F.col("c.gx")) & (F.col("d.gy") > F.col("c.gy")),
        "left_semi",
    ).select(F.col("c.gx").alias("gx"), F.col("c.gy").alias("gy"))
    total = pts.count()
    survivors = pts.join(F.broadcast(doomed), ["gx", "gy"], "left_anti").count()
    return {
        "sec": sec,
        "points": total,
        "survivors": survivors,
        "pruned_frac": round(1 - survivors / total, 4),
        "frontier": n_frontier,
    }


def ann_recall(spark: SparkSession, d: str) -> dict:
    from benchmark_spark.registry import all_specs

    spec = all_specs()["q_ann_recall"]
    sec, rows = _timed(lambda: spec.fn(spark, d).collect())
    recalls = [float(r["recall"]) for r in rows]
    return {
        "sec": sec,
        "anchors": len(rows),
        "mean_recall": round(sum(recalls) / len(recalls), 4),
        "min_recall": round(min(recalls), 4),
    }


def window_tier(spark: SparkSession, d: str) -> dict:
    from benchmark_spark.registry import all_specs

    specs = all_specs()
    out = {}
    for q in ("q_conversion_lag", "q_path_trigrams"):
        sec, n = _timed(lambda q=q: specs[q].fn(spark, d).count())
        out[q] = {"sec": sec, "out_rows": n}
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    from benchmark_spark.session import get_spark

    spark = get_spark("curve-round7", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for n in mults:
        d = f"{REPO}/.scratch/curve_x{n}"
        build(d, n)
        res = {
            "reachability": reachability_ab(spark, d, n),
            "skyline_grid": skyline_prune(spark, d),
            "ann_recall": ann_recall(spark, d),
            "window_tier": window_tier(spark, d),
        }
        out[f"x{n}"] = res
        print(json.dumps({"scale": f"x{n}", **res}), flush=True)
    print(json.dumps({"metric": "curve_round7", "base": "sf0.1", "curves": out}))


if __name__ == "__main__":
    main()
