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

Round-11 extension (VERDICT r10 #3): `--rounds` runs the FULL K=32
training at sf0.1 and prints per-merge-round wall seconds. The claim
under test: localCheckpoint every 4 rounds keeps per-round time FLAT
in the round index (no O(K^2) lineage replay) — round 32 costs the
same as round 2.

Usage: python tools/curve_bpe.py [multipliers...]  (default 1 4 10)
       python tools/curve_bpe.py --rounds
Prints one JSON line per scale and a summary line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def rounds_mode() -> None:
    """Per-merge-round wall time at K=_BPE_K on sf0.1 — flat means the
    localCheckpoint lineage cut works (round i never replays i chained
    replaces)."""
    from benchmark_spark.llm.text import _BPE_K, _bpe_vocab, bpe_train
    from benchmark_spark.session import get_spark

    spark = get_spark("bpe-rounds", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    vocab = _bpe_vocab(spark, "/root/testdata/sf0.1")
    secs: list[float] = []
    merges, _words = bpe_train(spark, vocab, _BPE_K, round_secs=secs)
    head = sum(secs[1:5]) / 4  # rounds 2-5 (round 1 pays vocab build)
    tail = sum(secs[-4:]) / 4  # rounds K-3..K
    print(json.dumps({
        "metric": "bpe_round_flatness",
        "k": _BPE_K,
        "merges": len(merges),
        "round_secs": [round(s, 3) for s in secs],
        "head_avg_r2_r5": round(head, 3),
        "tail_avg_last4": round(tail, 3),
        "tail_over_head": round(tail / head, 2),
    }))


def main() -> None:
    from benchmark_spark.catalog import load_table
    from benchmark_spark.llm.text import _BPE_K, _BPE_REGEX, bpe_train
    from benchmark_spark.session import get_spark

    if "--rounds" in sys.argv:
        rounds_mode()
        return
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
