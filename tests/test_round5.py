"""Round-5 invariants (beyond the oracle gate in test_correctness.py):
pointer-jumping connected components (log-round chain convergence and
the non-convergence raise), bounded-error sketch verdicts, banded
char-gram near-dup recall, and stream-stream join state eviction."""

import pytest
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.llm.dedup import connected_components, q_chargram_minhash
from benchmark_spark.operators.aggregates import q_approx_stats_bounded
from benchmark_spark.streaming.windows import (
    await_done,
    events_stream_chunks,
    scratch_dir,
)
from tests.conftest import SF_SMOKE


def _chain_edges(spark, hops):
    """A planted path 0-1-2-...-hops: diameter = hops, the worst case
    for plain min-label propagation (needs `hops` rounds)."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(hops)], "a_id long, b_id long"
    )


def test_cc_chain_converges_in_log_rounds(spark):
    # 15-hop chain: plain propagation needs 15 rounds; pointer jumping
    # resolves it in 4 (+1 convergence probe). max_iters=6 only passes
    # because the jump step actually works.
    labels = connected_components(_chain_edges(spark, 15), max_iters=6)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(16)}


def test_cc_nonconvergence_raises_instead_of_returning(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_chain_edges(spark, 15), max_iters=2)


def _cc_oracle_labels(hops, unroll):
    """Run the round-12 UNROLLED oracle CTE chain (dedup._cc_labels_sql,
    the recursive-closure replacement) on a planted path graph."""
    import duckdb

    from benchmark_spark.llm.dedup import _cc_labels_sql

    edges = ", ".join(f"({i}, {i + 1})" for i in range(hops))
    sql = (
        f"WITH pairs AS (SELECT * FROM (VALUES {edges}) AS t(a_id, b_id)),\n"
        f"{_cc_labels_sql(unroll)}\n"
        "SELECT node, cluster_id FROM labels ORDER BY node"
    )
    return duckdb.connect().execute(sql).fetchall()


def test_cc_oracle_unroll_resolves_chain_in_log_rounds():
    # Same 15-hop worst case as the Spark twin: l0 + 4 prop/jump
    # rounds suffice; the committed depth (6) has headroom.
    assert _cc_oracle_labels(15, 4) == [(i, 0) for i in range(16)]


def test_cc_oracle_unroll_guard_errors_instead_of_wrong_fixpoint():
    # Under-unrolled (depth 1 covers diameter ~2-3, the chain needs
    # 15): the convergence probe must raise via error(), never hash a
    # non-fixpoint labeling.
    import duckdb

    with pytest.raises(duckdb.Error, match="did not reach the fixpoint"):
        _cc_oracle_labels(15, 1)


def test_approx_stats_bounds_hold(spark):
    rows = q_approx_stats_bounded(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["cd_within_3rsd"] for r in rows)
    assert all(r["p50_within_pct"] for r in rows)
    assert all(r["exact_custs"] > 0 for r in rows)


def test_chargram_minhash_recovers_every_planted_pair(spark):
    out = q_chargram_minhash(spark, SF_SMOKE).cache()
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    n_docs = docs.count()
    planted = out.filter(F.col("b_id") == F.col("a_id") + 1_000_000).count()
    assert planted == n_docs  # every (doc, mutant) pair found via banding
    assert out.filter(F.col("jaccard") < 0.6).count() == 0
    out.unpersist()


def test_stream_join_state_evicted_by_watermark(spark):
    """The watermarked stream-stream join must DROP state for expired
    intervals: across the 4 micro-batches the state store never holds
    all signup+purchase rows at once, and rows are actually removed."""
    s = events_stream_chunks(spark, SF_SMOKE)
    a = (
        s.filter(F.col("event_type") == "signup")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("s_ts"),
        )
    )
    b = (
        s.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = a.join(
        b,
        F.expr("a_user = b_user AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL 1 HOUR"),
    ).select("a_user", "signup_id", "purchase_id")
    sink = "sjoin_state_sink_test"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
        .start()
    )
    await_done(q, 180)
    states = [
        p["stateOperators"][0]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert len(states) >= 2, "expected multiple micro-batches with state"
    events = load_table(spark, SF_SMOKE, "events", assert_schema=False)
    relevant = events.filter(
        F.col("event_type").isin("signup", "purchase")
    ).count()
    max_state = max(s["numRowsTotal"] for s in states)
    assert 0 < max_state < relevant, (
        f"state ({max_state}) should stay below total joinable rows "
        f"({relevant}) — watermark must evict expired intervals"
    )
    assert sum(s.get("numRowsRemoved", 0) for s in states) > 0


def test_winnow_fingerprint_invariants(spark):
    from benchmark_spark.llm.text import q_winnow_fingerprint

    out = q_winnow_fingerprint(spark, SF_SMOKE).cache()
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    assert out.count() == docs.count()  # one digest row per doc
    bad = out.filter(
        (F.col("n_fp") < 1) | (F.col("min_fp") > F.col("max_fp"))
    ).count()
    assert bad == 0
    # winnowing compresses: never more fingerprints than windows (= grams-4)
    grams = docs.select(
        "doc_id",
        F.greatest(F.size(F.split("text", " ")) - 3, F.lit(1)).alias("n_grams"),
    )
    over = (
        out.join(grams, "doc_id")
        .filter(F.col("n_fp") > F.greatest(F.col("n_grams") - 4, F.lit(1)))
        .count()
    )
    assert over == 0
    out.unpersist()


def test_bpe_pretokenize_tokens_wellformed(spark):
    from benchmark_spark.llm.text import q_bpe_pretokenize

    rows = q_bpe_pretokenize(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    assert all(r["tok"] and " " not in r["tok"] for r in rows)
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_nation_volume_pairs_and_mkt_share_bounds(spark):
    from benchmark_spark.operators.tpch_extra import q_mkt_share, q_nation_volume
    from tests.conftest import SF_CORRECT

    # sf0.01: the two-nation intersection is empty at smoke scale
    vol = q_nation_volume(spark, SF_CORRECT).collect()
    assert vol
    for r in vol:
        assert {r["supp_nation"], r["cust_nation"]} == {"NATION_1", "NATION_2"}
        assert r["revenue"] > 0 and r["l_year"] in (1996, 1997)
    share = q_mkt_share(spark, SF_CORRECT).collect()
    assert share and all(0.0 <= r["mkt_share"] <= 1.0 for r in share)
