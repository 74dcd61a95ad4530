#!/usr/bin/env python3
"""A/B: md5-based vs xxhash64-based MinHash permutation family.

benchmark_spark/llm/dedup.py derives its MinHash permutations from an
md5 base hash so the DuckDB oracle can replay the pipeline
bit-identically; xxhash64 is the alternative (non-oracle-expressible)
base. This tool MEASURES the families' cost gap instead of asserting
it, on the same salted documents replicas the scale curves use
(tools/scale_curve.py build). Round-7 history this tool drove: the
original 16-independent-md5s form measured 2.1-2.6x slower e2e than
16 direct xxhash64 calls, which motivated rewriting the registered
md5 family to ONE base + 16 universal affine permutations — after
which the families tie (SCALE.md item 17a):

  * ``sig`` — the signature stage in isolation (shingle explode +
    one groupBy with 16 min-hash aggregates): the only stage whose
    cost the family changes. Measured through a checksum that
    consumes ALL 16 signature columns — a bare .count() on the
    aggregate lets Catalyst prune the unused min() aggregates and
    silently measures only the shingle shuffle (observed: both
    families "tie" under .count()).
  * ``e2e`` — the full q_dedup_minhash pipeline (shingles ->
    signatures -> banding -> bucket join -> exact-Jaccard verify)
    with the family swapped, to show how much of the end-to-end
    budget the hash base is.

Both families produce the same verified-pair output on the planted
corpus (pinned in tests/test_llm.py::test_minhash_xxhash64_family_parity);
this tool only measures cost.

Usage: python tools/ab_minhash_hash.py [multipliers...]  (default 1 10 30)
Prints one JSON line per scale and a final summary line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARMUP = int(os.environ.get("SPARK_GRAFT_CURVE_WARMUP", "1"))
TRIALS = int(os.environ.get("SPARK_GRAFT_CURVE_TRIALS", "3"))


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    from tools.scale_curve import build

    from benchmark_spark.llm.dedup import (
        doubled_corpus,
        lsh_candidates,
        minhash_signatures,
        shingles,
        verify_jaccard,
    )
    from benchmark_spark.session import get_spark

    spark = get_spark("ab-minhash-hash", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn, action: str = "count") -> tuple[float, int]:
        # sig returns a 1-row checksum and must be collect()ed:
        # count() over it prunes the checksum (and with it all 16
        # hash expressions) right back out of the plan.
        def do():
            df = fn()
            return len(df.collect()) if action == "collect" else df.count()

        for _ in range(WARMUP):
            do()
        samples, rows = [], 0
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            rows = do()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 3), rows

    out: dict[str, dict] = {}
    for n in mults:
        d = f"{REPO}/.scratch/curve_x{n}"
        build(d, n, tables=("documents",))
        sh = shingles(doubled_corpus(spark, d))

        def sig(fam: str):
            from pyspark.sql import functions as F

            def _run():
                s = minhash_signatures(sh, hash_family=fam)
                # consume every signature column (see module docstring);
                # bit_xor, not SUM — summing full-range 64-bit hashes
                # overflows LONG under ANSI mode
                cols = ",".join(c for c in s.columns if c.startswith("h"))
                return s.select(F.expr(f"bit_xor(xxhash64({cols}))").alias("chk"))

            return _run

        def e2e(fam: str):
            def _run():
                s = minhash_signatures(sh, hash_family=fam)
                return verify_jaccard(sh, lsh_candidates(s), 0.5)

            return _run

        families = [
            f
            for f in os.environ.get(
                "SPARK_GRAFT_AB_FAMILIES", "md5,xxhash64,md5x2"
            ).split(",")
            if f
        ]
        rec: dict[str, dict] = {"docs": n * 5000}
        for stage, mk, action in (("sig", sig, "collect"), ("e2e", e2e, "count")):
            times, rows = {}, {}
            for fam in families:
                times[f"{fam}_sec"], rows[fam] = run(mk(fam), action)
            base = times.get("md5_sec")
            rec[stage] = {
                **times,
                "vs_md5": {
                    f: round(base / times[f"{f}_sec"], 2)
                    for f in families
                    if f != "md5" and times[f"{f}_sec"]
                }
                if base
                else None,
                "out_rows": rows,
            }
        out[f"x{n}"] = rec
        print(json.dumps({"scale": f"x{n}", **rec}), flush=True)
    print(json.dumps({"metric": "ab_minhash_hash", "base": "sf0.1", "curves": out}))


if __name__ == "__main__":
    main()
