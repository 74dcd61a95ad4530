#!/usr/bin/env python3
"""Skew-join A/B curve: plain vs AQE skew-split vs salted, MEASURED.

SCALE.md's skew playbook ("first line: AQE skew-join splitting;
manual fallback: salted join") has correctness evidence
(q_salted_join's oracle asserts salted == plain) but no measured
demonstration that the rewrites actually remove the straggler. This
tool builds one: a join whose probe side is Zipf-extreme — HALF the
fact rows share a single join key — run three ways at x1/x10/x30
event volume on the scale_curve replica corpus:

* plain      — sort-merge join, AQE off: the hot key's rows land in
               one shuffle partition and serialize one task (the
               failure mode);
* aqe_skew   — AQE on with skew-join splitting, thresholds sized for
               the local data (the defaults target 256 MB cluster
               partitions); Spark splits the oversized partition at
               runtime;
* salted     — operators/skew.salted_join with 32 buckets: the
               explicit rewrite, hot key spread across 32 tasks.

Broadcast is disabled throughout: at 100 TB both sides of this join
are fact-sized, and a broadcast would hide the shuffle skew the tool
exists to measure. All three variants must agree on the aggregate
(asserted each run) — this is a performance A/B on equal semantics.

The workload: fact = events (n x 100k rows) padded to ~230 B with
key = 0 for even user_ids (50% of rows), user_id otherwise;
dim = the distinct keys with a per-key attribute. Join + count/sum
per key class. The dim grows linearly with the replica count (users
shift per replica), the hot key's share stays 50% — so at x30 the
plain variant's hot shuffle partition is a ~330 MB single-task sort
while the median task gets ~20 MB (a 16x straggler), which is the
shape AQE splitting and salting exist to fix. (An early cut of this
tool used narrow 16 B rows: the hot task finished inside the job's
fixed overhead and all three variants tied — the straggler only
bites once its partition is large relative to per-task cost, which
is exactly the 100 TB regime.)

Usage: python tools/curve_skew.py [multipliers...]  (default 1 10 30)
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

from benchmark_spark.operators.skew import salted_join  # noqa: E402
from tools.scale_curve import build  # noqa: E402

TRIALS = int(os.environ.get("SPARK_GRAFT_CURVE_TRIALS", "3"))
SALT_BUCKETS = 32

# Runtime-mutable conf per variant. Skew thresholds are sized for
# local data: defaults (256 MB / advisory 64 MB) would never fire on
# a <1 GB shuffle; the *mechanism* is what's under test, cluster
# sizes keep the defaults.
_VARIANTS = {
    "plain": {
        "spark.sql.adaptive.enabled": "false",
    },
    "aqe_skew": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    },
    "salted": {
        "spark.sql.adaptive.enabled": "false",
    },
}


def _fact_dim(spark, replica_dir: str, n: int):
    """Materialize both join sides once per scale so the timed section
    is the join + aggregate, not the skewed-key derivation."""
    stage = os.path.join(REPO, ".scratch", f"skew_curve_x{n}")
    marker = os.path.join(stage, "_STAGED")
    if not os.path.exists(marker):
        events = spark.read.parquet(os.path.join(replica_dir, "events.parquet"))
        fact = events.select(
            F.when(F.col("user_id") % 2 == 0, F.lit(0))
            .otherwise(F.col("user_id"))
            .alias("k"),
            "value",
            # ~200 B payload: the straggler penalty is bytes-sorted per
            # task, so rows must be wide enough that the hot partition
            # dwarfs per-task fixed cost (see module docstring)
            F.repeat(F.md5(F.col("event_id").cast("string")), 6).alias("pad"),
        )
        fact.write.mode("overwrite").parquet(os.path.join(stage, "fact"))
        (
            fact.select("k")
            .distinct()
            .withColumn("k_attr", F.pmod(F.col("k"), F.lit(97)))
            .withColumnRenamed("k", "dk")
            .write.mode("overwrite")
            .parquet(os.path.join(stage, "dim"))
        )
        with open(marker, "w"):
            pass
    return (
        spark.read.parquet(os.path.join(stage, "fact")),
        spark.read.parquet(os.path.join(stage, "dim")),
    )


def _result(joined):
    """Aggregate small enough to collect; hot vs cold key classes."""
    return (
        joined.groupBy((F.col("k") == 0).alias("hot"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k_attr")).alias("attr_sum"),
            # the payload must survive column pruning or the shuffle
            # carries 16 B rows and the straggler vanishes: hash it
            # into the answer (also makes the A/B equality byte-strict)
            F.expr("bit_xor(xxhash64(pad))").alias("pad_hash"),
        )
        .orderBy("hot")
        .collect()
    )


def run_scale(spark, n: int) -> dict:
    replica = os.path.join(REPO, ".scratch", f"curve_x{n}")
    build(replica, n, tables=("events",))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    secs, answers = {}, {}
    for name, conf in _VARIANTS.items():
        for k, v in conf.items():
            spark.conf.set(k, v)
        fact, dim = _fact_dim(spark, replica, n)
        if name == "salted":
            joined = salted_join(
                fact, dim, "k", "dk", fact_salt_source=["value"],
                buckets=SALT_BUCKETS,
            )
        else:
            joined = fact.join(dim, fact.k == dim.dk)
        _result(joined)  # warmup
        samples = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            answers[name] = _result(joined)
            samples.append(time.perf_counter() - t0)
        secs[name] = round(statistics.median(samples), 3)
        # restore variant conf to defaults before the next one
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for k in conf:
            if k != "spark.sql.adaptive.enabled":
                spark.conf.unset(k)

    base = [tuple(r) for r in answers["plain"]]
    for name, rows in answers.items():
        assert [tuple(r) for r in rows] == base, f"{name} disagrees with plain"
    return {
        "scale": f"x{n}",
        "fact_rows": n * 100_000,
        "hot_key_rows": None,  # filled by caller-visible answer below
        "sec": secs,
        "hot_rows": base[1][1] if len(base) > 1 else base[0][1],
    }


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    from benchmark_spark.session import get_spark

    spark = get_spark("skew-curve", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in mults:
        r = run_scale(spark, n)
        r.pop("hot_key_rows")
        out[f"x{n}"] = r
        print(json.dumps(r), flush=True)
    print(json.dumps({"metric": "skew_curve", "base": "sf0.1", "curves": out}))


if __name__ == "__main__":
    main()
