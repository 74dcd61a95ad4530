#!/usr/bin/env python3
"""End-to-end training-data curation walkthrough.

Chains the library's LLM-pipeline operators the way a real corpus
build does — each stage is a registered, oracle-checked query, so
this script is wiring, not logic:

    raw documents
      -> quality signals + language ID      (q_quality / q_langid logic)
      -> near-dup clusters (MinHash + LSH)  (q_dedup_minhash + CC)
      -> keep-best survivor per cluster     (q_dedup_keep_best)
      -> leakage-safe train/val/test split  (q_leakage_split)
      -> per-source token-budget mixture    (q_token_budget_mix logic)
      -> chunking for the retrieval index   (q_chunk_documents)

Run: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import get_query
from benchmark_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-pipeline", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    n_raw = docs.count()

    # 1. per-doc quality + fluency scoring (each a checked query)
    quality = get_query("q_quality").fn(spark, sf_dir)
    lm = get_query("q_unigram_lm").fn(spark, sf_dir)
    print(f"raw docs: {n_raw}; scored: {quality.count()} quality rows, "
          f"{lm.count()} LM rows")

    # 2. near-dup structure over the planted doubled corpus
    keep = get_query("q_dedup_keep_best").fn(spark, sf_dir)
    print(f"near-dup clusters resolved: {keep.count()} survivors "
          f"(cluster-aware, quality-argmax)")

    # 3. leakage-safe split: no near-dup pair straddles train/val/test
    split = get_query("q_leakage_split").fn(spark, sf_dir)
    print("split sizes:",
          {r["split"]: r["n"] for r in
           split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()})

    # 4. mixture: greedy per-source prefix under a token budget
    mix = get_query("q_token_budget_mix").fn(spark, sf_dir)
    kept = mix.agg(F.sum("tokens_kept")).collect()[0][0]
    print(f"mixture: {kept} tokens admitted across "
          f"{mix.count()} sources")

    # 5. retrieval index prep: overlapping chunks
    chunks = get_query("q_chunk_documents").fn(spark, sf_dir)
    print(f"chunks for the ANN index: {chunks.count()}")

    print("pipeline complete — every stage above is hash-checked "
          "against DuckDB in the oracle gate")


if __name__ == "__main__":
    main()
