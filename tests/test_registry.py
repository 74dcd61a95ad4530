"""Driver-window invariants (SURVEY.md §2 coverage contract).

The external correctness harness hash-checks only the FIRST 50
registry entries, so the ordering in registry._PRIORITY IS part of
the driver contract. Round-5 cut (VERDICT.md r4 item 1): the 10
queries with zero driver evidence across rounds 1-4, the 2 round-5
additions, the 9 queries whose expression+oracle changed this round
(events.value aggregates migrated to the exact fixed-point dsum
form), then re-proof slots for the oldest-evidence greens (r1-only
rows first). Queries displaced from the window must all be
driver-green in some prior round.
"""

import json

from benchmark_spark.registry import _PRIORITY, all_specs

# zero driver evidence across rounds 1-4 (union of CORRECTNESS_r01-r04
# keys vs the registry before the round-5 additions)
NEVER_CHECKED = (
    "q_order_dist", "q_big_orders", "q_dormant_rich", "q_string_agg",
    "q_pmi_bigrams", "q_entropy", "q_hybrid_search",
    "q_importance_sample", "q_incremental_dedup", "q_stream_foreach_batch",
)

# first driver exposure this round
NEW_IN_R5 = (
    "q_approx_stats_bounded", "q_chargram_minhash",
    "q_nation_volume", "q_mkt_share", "q_brand_revenue",
    "q_winnow_fingerprint", "q_bpe_pretokenize", "q_stream_enrich",
    "q_gap_fill", "q_schema_evolution",
)

# Spark expression AND oracle changed in round 5 (dsum migration) —
# prior green evidence no longer covers the current form
RECHANGED_R5 = (
    "q7_tumble", "q7_tumble_stream", "q_sliding", "q_session",
    "q_watermark", "q_stream_session", "q_stream_sliding",
    "q_stream_append", "q_stream_update",
)

# added after the 50-slot window filled (the round-5 registry grew far
# past 50 unproven candidates): verified by the local gate at sf0.001
# AND sf0.01 + vanilla-session sim this round; FIRST candidates for
# the round-6 window re-cut
OVERFLOW_R5 = (
    "q_lateral_topn", "q_graph_reachability",
    # continuation session
    "q_dq_checks", "q_snapshot_diff", "q_latest_snapshot",
    "q_equidepth_hist", "q_corrupt_ingest", "q_zorder_layout",
    "q_ppr_seed_expand", "q_threshold_sweep", "q_cluster_sample",
    "q_fuzzy_join", "q_python_datasource", "q_stream_dq", "q_variant",
    "q_basket_lift", "q_trend_fit", "q_skyline", "q_attribution",
    "q_k_anonymity", "q_pit_join", "q_weighted_sample", "q_pseudonymize",
    "q_kl_novelty", "q_sql_script", "q_event_transitions", "q_ab_readout",
    "q_rfm_segments", "q_cusum_changepoint", "q_ltv_curve",
    "q_equidepth_twophase", "q_grouping_id", "q_salted_hotcold",
    "q_triangle_degree", "q_skyline_grid", "q_udtf_poly",
    "q_python_stream_source", "q_path_trigrams", "q_conversion_lag",
)


def _green(res):
    return bool(res) and (
        res.get("hash_match") is True
        or (res.get("err") == "no_oracle" and res.get("spark_rows") is not None)
    )


def _load(path):
    return json.load(open(path))


def test_priority_window_shape():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50


def test_priority_names_lead_registry_order():
    names = list(all_specs())
    assert names[:50] == list(_PRIORITY)


def test_window_carries_all_unproven_queries():
    window = set(_PRIORITY)
    missing = [
        n for n in NEVER_CHECKED + NEW_IN_R5 + RECHANGED_R5 if n not in window
    ]
    assert not missing, f"unproven queries outside the driver window: {missing}"


def test_displaced_queries_are_all_driver_green():
    """Anything pushed below position 50 must already be proven by the
    driver itself (green in r1-r4) — the window only spends slots on
    queries whose driver status is unknown, red, or stale (changed
    expression)."""
    rounds = [
        _load(f"/root/repo/CORRECTNESS_r0{i}.json") for i in (1, 2, 3, 4)
    ]
    window = set(_PRIORITY)
    skip = window | set(NEW_IN_R5) | set(OVERFLOW_R5)
    for name in all_specs():
        if name in skip:
            continue
        if name == "q_approx_stats":
            # rows-only by design: the driver records err=no_oracle, so
            # it can never be driver-green; its hashable companion
            # q_approx_stats_bounded sits inside the window instead,
            # and pytest bounds the sketch error directly.
            continue
        assert any(_green(r.get(name)) for r in rounds), (
            f"{name} displaced from the driver window without prior green proof"
        )


def test_rows_only_in_window_are_all_by_design():
    specs = all_specs()
    rows_only = {n for n in _PRIORITY if specs[n].oracle is None}
    # every query in the driver window carries a full hash oracle
    assert rows_only == set()
