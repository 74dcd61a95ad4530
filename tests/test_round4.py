"""Semantic invariants for the round-4 operators (beyond the oracle
gate in test_correctness.py, which already hash-checks each of these
against DuckDB): quota exactness for the samplers, leakage-freedom
for the cluster-aware split, argmax correctness for survivor
selection, and bound/identity checks on the TPC-H shapes."""

import math

from pyspark.sql import functions as F

from benchmark_spark.llm.corpus import (
    doc_quality,
    q_dedup_keep_best,
    q_leakage_split,
    q_reservoir_sample,
    q_stratified_sample,
    q_unigram_lm,
)
from benchmark_spark.llm.dedup import (
    connected_components,
    doubled_corpus,
    q_dedup_minhash,
)
from benchmark_spark.catalog import load_table
from benchmark_spark.operators.tpch_extra import (
    q_promo_share,
    q_small_qty,
    q_top_supplier,
)
from benchmark_spark.streaming.windows import q_stream_topk
from tests.conftest import SF_SMOKE


def test_reservoir_exact_k_per_source(spark):
    out = q_reservoir_sample(spark, SF_SMOKE)
    per_source = {r["source"]: r["n"] for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    totals = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    for src, total in totals.items():
        assert per_source.get(src, 0) == min(10, total)


def test_stratified_exact_quota_per_lang(spark):
    out = q_stratified_sample(spark, SF_SMOKE)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    totals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, total in totals.items():
        assert got.get(lang, 0) == math.ceil(0.2 * total)


def test_leakage_split_never_straddles_clusters(spark):
    out = q_leakage_split(spark, SF_SMOKE).cache()
    # each near-dup cluster lands in exactly one split
    spans = (
        out.groupBy("rep")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0
    # every planted pair (doc, doc+1M) shares a rep, hence a split
    a = out.filter(F.col("doc_id") < 1_000_000).select(
        F.col("doc_id").alias("k"), F.col("split").alias("s_a")
    )
    b = out.filter(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("k"), F.col("split").alias("s_b")
    )
    diff = a.join(b, "k").filter(F.col("s_a") != F.col("s_b")).count()
    assert diff == 0
    out.unpersist()


def test_keep_best_picks_cluster_quality_argmax(spark):
    out = q_dedup_keep_best(spark, SF_SMOKE).cache()
    rows = out.collect()
    assert rows and all(r["cluster_size"] >= 2 for r in rows)
    # reconstruct per-member qualities independently: the kept doc must
    # carry the cluster's MAX quality, and be the min doc_id among ties
    member_q = connected_components(
        q_dedup_minhash(spark, SF_SMOKE).select("a_id", "b_id")
    ).join(doc_quality(doubled_corpus(spark, SF_SMOKE)), "doc_id")
    best = member_q.groupBy("cluster_id").agg(F.max("q").alias("max_q"))
    argmax = (
        member_q.join(best, "cluster_id")
        .filter(F.col("q") == F.col("max_q"))
        .groupBy("cluster_id", "max_q")
        .agg(F.min("doc_id").alias("argmax_id"))
    )
    joined = out.join(argmax, "cluster_id").cache()
    assert joined.count() == len(rows)
    bad = joined.filter(
        (F.col("keep_quality") != F.col("max_q"))
        | (F.col("keep_id") != F.col("argmax_id"))
    ).count()
    assert bad == 0
    joined.unpersist()
    out.unpersist()


def test_unigram_lm_token_counts_and_positivity(spark):
    out = q_unigram_lm(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    joined = out.join(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("true_n")), "doc_id"
    )
    bad = joined.filter(
        (F.col("n_tokens") != F.col("true_n")) | (F.col("avg_nll") <= 0)
    ).count()
    assert bad == 0


def test_promo_share_bounded(spark):
    row = q_promo_share(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["promo_share"] <= 100.0


def test_small_qty_counts_subset(spark):
    row = q_small_qty(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem", assert_schema=False)
    assert 0 <= row["n_small"] <= li.count()


def test_top_supplier_hits_max_revenue(spark):
    rows = q_top_supplier(spark, SF_SMOKE).collect()
    assert rows
    assert len({r["total_rev"] for r in rows}) == 1  # all tied at the max


def test_stream_topk_matches_batch(spark):
    got = [
        (r["user_id"], r["n"]) for r in q_stream_topk(spark, SF_SMOKE).collect()
    ]
    events = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    want = [
        (r["user_id"], r["n"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
        .collect()
    ]
    assert got == want
