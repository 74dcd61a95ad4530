#!/usr/bin/env python3
"""Capped vs uncapped LSH under boilerplate crowds, MEASURED.

capped_lsh_candidates' docstring claims the plain bucket join goes
quadratic through the DATA (one giant identical-signature bucket)
while the capped variant stays linear. This tool measures both sides
of that claim: the x1/x10/x30 documents replicas each get a planted
boilerplate crowd of 3% of the corpus — identical text, identical
MinHash signatures, one shared bucket per band — and candidate
generation runs uncapped vs capped (bucket_cap=256) on the SAME
materialized signature table.

Expected shape (and what the numbers show): the uncapped join's
output grows with crowd^2 (every band re-derives the full crowd
clique), so its wall time bends super-linear in corpus size even
though the corpus itself only grows linearly; the capped variant
drops the unsplittable crowd buckets and tracks the organic
near-dup structure — linear, with pair counts ~crowd-free.

Signatures are materialized to parquet once per scale so the timed
section is candidate generation only, not shingling/minhashing
(which is shared by both variants and measured elsewhere).

Usage: python tools/curve_capped_lsh.py [multipliers...] (default 1 10 30)
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

from benchmark_spark.llm.dedup import (  # noqa: E402
    capped_lsh_candidates,
    lsh_candidates,
    minhash_signatures,
    shingles,
)
from tools.scale_curve import build  # noqa: E402

TRIALS = int(os.environ.get("SPARK_GRAFT_CURVE_TRIALS", "2"))
CROWD_FRACTION = 0.03
BUCKET_CAP = 256


def _sig_table(spark, n: int) -> tuple[str, int, int]:
    replica = os.path.join(REPO, ".scratch", f"curve_x{n}")
    build(replica, n, tables=("documents",))
    stage = os.path.join(REPO, ".scratch", f"capped_lsh_x{n}")
    marker = os.path.join(stage, "_STAGED")
    n_docs = n * 5000
    crowd = int(n_docs * CROWD_FRACTION)
    if not os.path.exists(marker):
        docs = spark.read.parquet(os.path.join(replica, "documents.parquet")).select(
            "doc_id", "text"
        )
        crowd_df = spark.range(crowd).select(
            (F.col("id") + 50_000_000).alias("doc_id"),
            F.lit(
                "standard legal boilerplate all rights reserved reproduced "
                "verbatim on every mirrored page of this particular crawl "
                "snapshot without any variation whatsoever"
            ).alias("text"),
        )
        corpus = docs.unionByName(crowd_df)
        corpus.write.mode("overwrite").parquet(os.path.join(stage, "corpus"))
        sig = minhash_signatures(shingles(corpus))
        sig.write.mode("overwrite").parquet(os.path.join(stage, "sig"))
        with open(marker, "w"):
            pass
    return stage, n_docs, crowd


def run_scale(spark, n: int, verify: bool = False) -> dict:
    stage, n_docs, crowd = _sig_table(spark, n)
    sig = spark.read.parquet(os.path.join(stage, "sig"))
    out = {"scale": f"x{n}", "docs": n_docs, "crowd": crowd, "sec": {}, "pairs": {}}
    if verify:
        # end-to-end: candidates -> exact-Jaccard verification. The
        # candidate count IS the verify stage's input volume, so this
        # is where the crowd's quadratic bill actually comes due —
        # ~N_pairs array intersections plus a 2-sided doclist join
        # that must move every pair.
        from benchmark_spark.llm.dedup import verify_jaccard

        corpus = spark.read.parquet(os.path.join(stage, "corpus"))
        sh = shingles(corpus)
        variants = (
            ("uncapped", lambda: verify_jaccard(sh, lsh_candidates(sig), 0.5)),
            (
                "capped",
                lambda: verify_jaccard(
                    sh, capped_lsh_candidates(sig, bucket_cap=BUCKET_CAP), 0.5
                ),
            ),
        )
    else:
        variants = (
            ("uncapped", lambda: lsh_candidates(sig)),
            ("capped", lambda: capped_lsh_candidates(sig, bucket_cap=BUCKET_CAP)),
        )
    for name, fn in variants:
        fn().count()  # warmup
        samples = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            out["pairs"][name] = fn().count()
            samples.append(time.perf_counter() - t0)
        out["sec"][name] = round(statistics.median(samples), 3)
    return out


def main() -> None:
    args = sys.argv[1:]
    verify = "--verify" in args
    mults = [int(a) for a in args if a != "--verify"] or [1, 10, 30]
    from benchmark_spark.session import get_spark

    spark = get_spark("capped-lsh-curve", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    curves = {}
    for n in mults:
        curves[f"x{n}"] = run_scale(spark, n, verify=verify)
        print(json.dumps(curves[f"x{n}"]), flush=True)
    print(
        json.dumps(
            {
                "metric": "capped_lsh_curve" + ("_e2e" if verify else ""),
                "base": "sf0.1",
                "curves": curves,
            }
        )
    )


if __name__ == "__main__":
    main()
