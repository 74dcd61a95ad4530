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
ROUNDS_SEEN = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)
# The round-14 cut (VERDICT r13 #1) opens rotation lap 3: the 4
# rows the r13 cut deferred to r14 (last driver-proved in round
# 7) + the 46 oldest r8-evidence rows in registry order. The 2
# remaining r8-evidence rows (q_video_frames, q_funnel) stay in the
# pool as the boundary tier, first in line for the r15 cut. No slot
# may hold evidence newer than this...
WINDOW_MAX_LATEST_GREEN = 8
# ...EXCEPT a row whose fixture/plan AND-or oracle were rewritten this
# round: its old driver evidence validated a different query, so the
# rewrite re-enters the window regardless of evidence age (the
# q_apply_in_pandas precedent from the r10 cut). None yet in r14.
REWRITTEN_IN_WINDOW = set()
# Rows displaced mid-round when new r14 queries enter the window (new
# rows must enter through the window; the r11-r13 precedent). Only
# these rows may sit outside the window with evidence STALER than the
# boundary; they are first in line for the r15 cut. New r14 queries
# displace the window TAIL (r8-evidence rows), which rejoin the pool
# at exactly the boundary age — so unlike r13's r7-row displacements
# they need no deferral entry (the r13 q1_scan/q2_agg precedent).
DEFERRED_TO_R15 = set()


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
    STRICTLY staler than the boundary must itself be in the window —
    unless it was displaced mid-round by a new query entering the
    window (then it must be on the explicit r15 deferral list)."""
    greens = _green_rounds()
    window = set(_PRIORITY)
    for name in all_specs():
        if name in window or name in DEFERRED_TO_R15:
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


def test_deferred_rows_are_exactly_the_displaced_residue():
    """The r15 deferral list is precisely the set of rows outside the
    window whose evidence is staler than the boundary — no silent
    extra deferral, no stale row forgotten."""
    greens = _green_rounds()
    window = set(_PRIORITY)
    staler_outside = {
        n for n in all_specs()
        if n not in window and max(greens[n]) < WINDOW_MAX_LATEST_GREEN
    }
    assert staler_outside == DEFERRED_TO_R15
