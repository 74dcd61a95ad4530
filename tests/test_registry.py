"""Driver-window invariants (SURVEY.md §2 coverage contract).

The external correctness harness hash-checks only the FIRST 50
registry entries, so the ordering in registry._PRIORITY IS part of
the driver contract. Rounds 5-6 spent the window completing coverage
(every registered query driver-green at least once across r1-r6);
from round 7 on the window rotates by EVIDENCE AGE: the 50 slots go
to the rows whose latest driver-green round is oldest, so fully
independent driver proof keeps refreshing instead of pooling on the
newest queries. These invariants are DERIVED from the committed
CORRECTNESS_r0N.json artifacts rather than hand-maintained lists, so
a future re-cut only has to update _PRIORITY and the round list
below.
"""

import glob
import json

from benchmark_spark.registry import _PRIORITY, all_specs

# Rounds whose CORRECTNESS artifacts existed when this window was cut.
ROUNDS_SEEN = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
# The round-12 cut (VERDICT r11 #1) continues the staleness rotation:
# the COMPLETE 42-row r6-evidence tier (every row whose latest driver
# proof is round 6), plus the oldest r7-evidence rows to fill the
# window; after CORRECTNESS_r12 the oldest driver evidence anywhere
# rises to r7. No slot may hold evidence newer than this...
WINDOW_MAX_LATEST_GREEN = 7
# ...EXCEPT a row whose fixture/plan AND-or oracle were rewritten this
# round: its old driver evidence validated a different query, so the
# rewrite re-enters the window regardless of evidence age (the
# q_apply_in_pandas precedent from the r10 cut).
REWRITTEN_IN_WINDOW = {
    "q_perplexity_filter",   # percentile cut -> integer rank cut (ADVICE r11)
    "q_random_projection",   # mean divisor: constant -> COUNT(*) OVER ()
}
# r7-evidence rows deferred to the r13 cut because the window holds
# only 50: gate-green every round, unchanged since their r7 proof.
# They are the ONLY rows allowed to sit outside the window at the
# boundary evidence age.
DEFERRED_R7 = {
    # displaced mid-round when the MJPEG video tier and the framed
    # MFCC front end entered the window (new rows must enter through
    # the window; the r11 precedent):
    "q_broadcast_join", "q_semi", "q_join_multi", "q_incremental_agg",
    "q_agg_funcs", "q_pred_mix",
    "q4_two_step", "q_ann_ivf", "q_ann_lsh", "q_array", "q_asof",
    "q_binary_meta", "q_cast", "q_cond", "q_curation_pipeline",
    "q_date", "q_dedup_clusters", "q_dedup_embed_lsh", "q_dedup_exact",
    "q_dedup_minhash", "q_dedup_minhash_capped", "q_dedup_simhash",
    "q_except", "q_except_all", "q_grouped_agg_udf", "q_hash",
    "q_intersect", "q_intersect_all", "q_json", "q_langid", "q_math",
    "q_multimodal_features", "q_outer", "q_pandas_udf",
    "q_pipe_wordcount", "q_range_join", "q_rank_funcs", "q_scalar_udf",
    "q_sliding_frame", "q_sort_multi", "q_stream_dedup", "q_string",
    "q_textstats", "q_topk", "q_udtf", "q_union", "q_union_all",
    "q_value_funcs",
}


def _green(res):
    return bool(res) and (
        res.get("hash_match") is True
        or (res.get("err") == "no_oracle" and res.get("spark_rows") is not None)
    )


def _evidence():
    """name -> latest round with any driver evidence (green or not)."""
    seen = {}
    for i in ROUNDS_SEEN:
        data = json.load(open(f"/root/repo/CORRECTNESS_r{i:02d}.json"))
        for name in data:
            seen[name] = i
    return seen


def _green_rounds():
    """name -> set of rounds where the driver recorded a green result."""
    greens = {}
    for i in ROUNDS_SEEN:
        data = json.load(open(f"/root/repo/CORRECTNESS_r{i:02d}.json"))
        for name, res in data.items():
            if _green(res):
                greens.setdefault(name, set()).add(i)
    return greens


def test_correctness_artifacts_present():
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    assert len(files) >= len(ROUNDS_SEEN)


def test_priority_window_shape():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50


def test_priority_names_lead_registry_order():
    names = list(all_specs())
    assert names[:50] == list(_PRIORITY)


def test_every_registered_query_has_driver_green_evidence():
    """The r5-r6 coverage program is complete: every registered query
    is driver-green in at least one round — which is what frees the
    window to rotate by staleness at all. A query with NO driver
    evidence yet is allowed only while it sits in the window (a new
    row must enter through the window so its first driver check lands
    the very next round)."""
    greens = _green_rounds()
    window = set(_PRIORITY)
    missing = [n for n in all_specs() if not greens.get(n) and n not in window]
    assert not missing, f"queries with zero driver-green evidence: {missing}"


def test_window_slots_go_to_stalest_evidence():
    """Every window row's latest driver-green round is at most
    WINDOW_MAX_LATEST_GREEN — no slot is wasted re-proving a row the
    driver confirmed recently."""
    greens = _green_rounds()
    for name in _PRIORITY:
        if name in REWRITTEN_IN_WINDOW:
            continue  # fixture+oracle rewritten: stale evidence is void
        # a never-checked row (no evidence at all) is the stalest
        # possible and always belongs in the window
        latest = max(greens.get(name) or [0])
        assert latest <= WINDOW_MAX_LATEST_GREEN, (
            f"window slot {name} already driver-green in r{latest} — slot wasted"
        )


def test_no_staler_row_left_outside_window():
    """Completeness of the staleness cut: any row whose evidence is
    STRICTLY staler than some window row must itself be in the window
    (i.e. the window contains ALL rows last green before the r3 tier)."""
    greens = _green_rounds()
    window = set(_PRIORITY)
    for name in all_specs():
        if name in window:
            continue
        latest = max(greens[name])
        assert latest >= WINDOW_MAX_LATEST_GREEN, (
            f"{name} last driver-green in r{latest} but left outside the window"
        )


def test_rows_only_in_window_are_all_by_design():
    specs = all_specs()
    rows_only = {n for n in _PRIORITY if specs[n].oracle is None}
    # Since round 8 the registry has ZERO rows-only entries anywhere:
    # q_approx_stats (the one deliberate rows-only row through r7) was
    # folded into the in-plan tolerance-verdict shape (VERDICT r7 #3),
    # so every window slot carries an oracle and can hash-match.
    assert rows_only == set()
    assert {n for n in specs if specs[n].oracle is None} == set()


def test_deferred_r7_rows_are_exactly_the_boundary_residue():
    """The deferred rows are precisely the r7-evidence rows NOT in
    the window — no silent extra deferral, no stale row forgotten."""
    greens = _green_rounds()
    window = set(_PRIORITY)
    boundary_outside = {
        n for n in all_specs()
        if n not in window and max(greens[n]) == WINDOW_MAX_LATEST_GREEN
    }
    assert boundary_outside == DEFERRED_R7
