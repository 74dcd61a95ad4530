#!/usr/bin/env python3
"""BPE training cost vs corpus size (round 10, SCALE evidence for
q_bpe_train/q_bpe_encode).

The design claim: after ONE corpus-wide pre-token shuffle, every merge
round runs on the VOCABULARY table, so training cost is governed by
DISTINCT pre-tokens (which grow sublinearly — Heaps' law) rather than
corpus rows. This tool measures it: events.props replicated N times
(corpus rows grow Nx; the vocabulary only gains the few new tokens
each replica's shifted digits introduce), then the full K-round
training loop is timed end-to-end.

Usage: python tools/curve_bpe.py [multipliers...]  (default 1 4 10)
Prints one JSON line per scale and a summary line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    from benchmark_spark.catalog import load_table
    from benchmark_spark.llm.text import _BPE_K, _BPE_REGEX, bpe_train
    from benchmark_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("bpe-curve", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "events", assert_schema=False).select(
        "props"
    )
    out = {}
    for n in mults:
        df = base
        for r in range(1, n):
            # shift digits so replicas add a few NEW tokens (realistic
            # sublinear vocab growth) instead of being byte-identical
            df = df.unionByName(
                base.select(F.concat(F.lit(f'{{"r{r}":1,'), F.expr("substring(props, 2)"))
                            .alias("props"))
            )
        toks = F.regexp_extract_all(F.col("props"), F.lit(_BPE_REGEX), F.lit(0))
        vocab = (
            df.select(F.explode(toks).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        t0 = time.perf_counter()
        corpus_rows = df.count()
        merges, words = bpe_train(spark, vocab, _BPE_K)
        vocab_rows = words.count()
        secs = time.perf_counter() - t0
        row = {
            "mult": n,
            "corpus_rows": corpus_rows,
            "vocab_rows": vocab_rows,
            "merges": len(merges),
            "train_sec": round(secs, 2),
        }
        out[f"x{n}"] = row
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "bpe_train_curve", "base": "sf0.1", "curves": out}))


if __name__ == "__main__":
    main()
