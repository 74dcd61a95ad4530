"""Driver-window invariants (SURVEY.md §2 coverage contract).

The external correctness harness hash-checks only the FIRST 50
registry entries, so the ordering in registry._PRIORITY IS part of
the driver contract. Round-4 cut: headline bench 8 + the three
round-3 red rows (events ts-unit regression, fixed this round) +
every query with no driver evidence across rounds 1-3 + the 13
round-4 additions + 18 re-proof slots for r1-only greens that
predate the round-2 exact-float driver hash. Queries displaced
from the window must all be driver-green in some prior round.
"""

import json

from benchmark_spark.registry import _PRIORITY, all_specs

HEADLINE = (
    "q1_scan", "q2_agg", "q3_join", "q4_wordcount",
    "q5_pricing", "q6_window", "q7_tumble", "q8_knn",
)

# red in CORRECTNESS_r03 (the events timestamp-unit regression);
# q7_tumble was the fourth red row but already sits in HEADLINE
NEED_GREEN_PROOF = ("q_watermark", "q_stream_session", "q_stream_join")

# zero driver evidence across rounds 1-3 (union of CORRECTNESS_r01/
# r02/r03 keys vs the registry before the round-4 additions)
NEVER_CHECKED = (
    "q_smj_join", "q_shj_join", "q_bucket_join",
    "q_bm25", "q_pack_sequences", "q_pagerank",
    "q_stream_update", "q_stream_append",
)

# first driver exposure this round
NEW_IN_R4 = (
    "q_promo_share", "q_small_qty", "q_top_supplier", "q_order_returns",
    "q_reservoir_sample", "q_stratified_sample", "q_unigram_lm",
    "q_length_hist", "q_leakage_split", "q_dedup_keep_best",
    "q_bigram_counts", "q_stream_sliding", "q_stream_topk",
)

# round-4 additions that do NOT fit the full 50-slot window: first
# candidates for the round-5 re-cut (named overflow, not silent)
NEXT_WINDOW = (
    "q_order_dist", "q_big_orders", "q_dormant_rich",
    "q_pmi_bigrams", "q_entropy",
    "q_hybrid_search", "q_importance_sample", "q_incremental_dedup",
    "q_stream_foreach_batch", "q_string_agg",
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
    assert set(HEADLINE) <= window
    assert set(NEED_GREEN_PROOF) <= window
    missing = [n for n in NEVER_CHECKED + NEW_IN_R4 if n not in window]
    assert not missing, f"never-driver-checked queries outside window: {missing}"


def test_displaced_queries_are_all_driver_green():
    """Anything pushed below position 50 must already be proven by the
    driver itself (green in r1, r2, or r3) — the window only spends
    slots on queries whose driver status is unknown or red."""
    rounds = [
        _load(f"/root/repo/CORRECTNESS_r0{i}.json") for i in (1, 2, 3)
    ]
    window = set(_PRIORITY)
    skip = window | set(NEW_IN_R4) | set(NEXT_WINDOW)
    for name in all_specs():
        if name in skip:
            continue
        assert any(_green(r.get(name)) for r in rounds), (
            f"{name} displaced from the driver window without prior green proof"
        )


def test_rows_only_in_window_are_all_by_design():
    specs = all_specs()
    rows_only = {n for n in _PRIORITY if specs[n].oracle is None}
    # every query in the driver window carries a full hash oracle
    # (q_approx_stats, the one rows-only-by-design query, stays
    # displaced on its r1 green)
    assert rows_only == set()
