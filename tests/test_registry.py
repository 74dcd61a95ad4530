"""Driver-window invariants (SURVEY.md §2 coverage contract).

The external correctness harness hash-checks only the FIRST 50
registry entries, so the ordering in registry._PRIORITY IS part of
the driver contract. Round-6 cut (VERDICT.md r5 item 1): the 40
queries with zero driver evidence across rounds 1-5 take the first
40 slots — a green CORRECTNESS_r06 completes driver evidence for
all 224 registered queries — and the remaining 10 re-prove rows
whose only driver evidence predates the round-2 exact-float hash.
These invariants are DERIVED from the committed CORRECTNESS_r0N.json
artifacts rather than hand-maintained lists, so a future re-cut only
has to update _PRIORITY and the round list below.
"""

import glob
import json

from benchmark_spark.registry import _PRIORITY, all_specs

# Rounds whose CORRECTNESS artifacts existed when this window was cut.
ROUNDS_SEEN = (1, 2, 3, 4, 5)


def _green(res):
    return bool(res) and (
        res.get("hash_match") is True
        or (res.get("err") == "no_oracle" and res.get("spark_rows") is not None)
    )


def _evidence():
    """name -> latest round with any driver evidence (green or not)."""
    seen = {}
    for i in ROUNDS_SEEN:
        data = json.load(open(f"/root/repo/CORRECTNESS_r0{i}.json"))
        for name in data:
            seen[name] = i
    return seen


def _green_rounds():
    """name -> set of rounds where the driver recorded a green result."""
    greens = {}
    for i in ROUNDS_SEEN:
        data = json.load(open(f"/root/repo/CORRECTNESS_r0{i}.json"))
        for name, res in data.items():
            if _green(res):
                greens.setdefault(name, set()).add(i)
    return greens


def test_correctness_artifacts_present():
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r0*.json"))
    assert len(files) >= len(ROUNDS_SEEN)


def test_priority_window_shape():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50


def test_priority_names_lead_registry_order():
    names = list(all_specs())
    assert names[:50] == list(_PRIORITY)


def test_window_carries_all_never_checked_queries():
    """Every registered query with zero driver evidence across the seen
    rounds must sit inside the 50-slot window this round."""
    seen = _evidence()
    never = [n for n in all_specs() if n not in seen]
    window = set(_PRIORITY)
    missing = [n for n in never if n not in window]
    assert not missing, f"never-driver-checked queries outside the window: {missing}"


def test_displaced_queries_are_all_driver_green():
    """Anything pushed below position 50 must already be proven by the
    driver itself (green in some prior round) — the window only spends
    slots on queries whose driver status is unknown or stale."""
    greens = _green_rounds()
    window = set(_PRIORITY)
    for name in all_specs():
        if name in window:
            continue
        assert greens.get(name), (
            f"{name} displaced from the driver window without prior green proof"
        )


def test_reproof_slots_go_to_oldest_evidence():
    """The non-never slots re-prove rows whose only driver evidence is
    r1 (before the round-2 exact-float driver hash)."""
    seen = _evidence()
    greens = _green_rounds()
    for name in _PRIORITY:
        if name not in seen:
            continue  # a never-checked slot
        assert greens.get(name) == {1}, (
            f"re-proof slot {name} has post-r1 evidence {greens.get(name)} — "
            "window slot wasted"
        )


def test_rows_only_in_window_are_all_by_design():
    specs = all_specs()
    rows_only = {n for n in _PRIORITY if specs[n].oracle is None}
    # q_approx_stats is the single deliberate rows-only row (sketch
    # output; its hashable error-bounded twin q_approx_stats_bounded is
    # driver-green r5 and pytest bounds the sketch error directly).
    assert rows_only == {"q_approx_stats"}
