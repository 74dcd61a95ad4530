#!/usr/bin/env python3
"""Bloom-filter operating-point curve (round 11, SCALE evidence for
q_bloom_decontaminate).

The claim under test: the measured false-positive load tracks the
textbook prediction fp ~ fill^K (fill = fraction of the M bits set),
so the M=65536 / K=4 operating point is a CALCULATION, not a guess —
and at 100 TB you re-run this formula, not this fixture. The tool
grows the HOLDOUT N x (more grams -> more bits set -> higher fill)
while probing the same corpus, and prints measured vs predicted FP
per scale.

Usage: python tools/curve_bloom.py [multipliers...]  (default 1 4 10)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from benchmark_spark.llm.text import _BLOOM_K, _BLOOM_M


def main() -> None:
    from benchmark_spark.catalog import load_table
    from benchmark_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("bloom-curve", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents", assert_schema=False)

    def grams(df):
        t = F.split("text", " ")
        cols = [
            F.slice(t, off + 1, F.greatest(F.size(t) - 7, F.lit(0)))
            for off in range(8)
        ]
        ex = df.select("doc_id", F.explode(F.arrays_zip(*cols)).alias("g"))
        gram = F.concat_ws(" ", *[F.col(f"g.{i}") for i in range(8)])
        return ex.select("doc_id", F.md5(gram).alias("hex")).distinct()

    def pos(j):
        return (
            F.conv(F.substring("hex", 1 + 8 * j, 8), 16, 10).cast("long") % _BLOOM_M
        )

    fp_col = F.conv(F.substring("hex", 1, 15), 16, 10).cast("long")
    cg = grams(docs.select("doc_id", "text")).localCheckpoint(eager=True)
    corpus_grams = cg.count()

    out = {}
    for n in mults:
        # holdout grows n x: tail-trimmed copies with a per-replica salt
        # token prepended, so each replica contributes NEW grams (the
        # realistic case: a growing eval-suite collection)
        t = F.split("text", " ")
        trimmed = F.array_join(F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(1))), " ")
        ho = docs.filter(F.col("doc_id") % 7 == 0).select(trimmed.alias("text"))
        h = ho
        for r in range(1, n):
            h = h.unionByName(ho.select(F.concat(F.lit(f"s{r} "), "text").alias("text")))
        hg = grams(h.select(F.lit(0).alias("doc_id"), "text")).select("hex").distinct()
        bits = (
            hg.select(F.explode(F.array(*[pos(j) for j in range(_BLOOM_K)])).alias("p"))
            .distinct()
        )
        n_bits = bits.count()
        fill = n_bits / _BLOOM_M
        exact = hg.select(fp_col.alias("fp")).distinct().withColumn("e", F.lit(1))
        bset = bits.withColumn("m", F.lit(1))
        probe = (
            cg.select("doc_id", "hex", F.explode(
                F.array(*[pos(j) for j in range(_BLOOM_K)])).alias("p"))
            .join(F.broadcast(bset), "p", "left")
            .groupBy("doc_id", "hex")
            .agg(F.sum(F.coalesce("m", F.lit(0))).alias("hits"))
            .join(F.broadcast(exact), fp_col == F.col("fp"), "left")
            .agg(
                F.sum((F.col("hits") == _BLOOM_K).cast("long")).alias("bloom"),
                F.sum(F.coalesce("e", F.lit(0))).alias("exact"),
            )
            .collect()[0]
        )
        clean = corpus_grams - int(probe["exact"])
        fp_measured = (int(probe["bloom"]) - int(probe["exact"])) / max(clean, 1)
        fp_predicted = fill ** _BLOOM_K
        row = {
            "mult": n,
            "holdout_grams": hg.count(),
            "bits_set": n_bits,
            "fill": round(fill, 4),
            "fp_measured": round(fp_measured, 6),
            "fp_predicted_fill_pow_k": round(fp_predicted, 6),
            "ratio": round(fp_measured / fp_predicted, 2) if fp_predicted else None,
        }
        out[f"x{n}"] = row
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "metric": "bloom_fp_curve", "m_bits": _BLOOM_M, "k": _BLOOM_K,
        "corpus_grams": corpus_grams, "curves": out,
    }))


if __name__ == "__main__":
    main()
