"""Driver-window invariants (SURVEY.md §2 coverage contract).

The external correctness harness hash-checks only the FIRST 50
registry entries, so the ordering in registry._PRIORITY IS part of
the driver contract: every reference family, every previously
driver-untested §2 family, and every LLM component must sit inside
that window, and the headline bench queries must all be checked.
"""

from benchmark_spark.registry import _PRIORITY, all_specs

HEADLINE = (
    "q1_scan", "q2_agg", "q3_join", "q4_wordcount",
    "q5_pricing", "q6_window", "q7_tumble", "q8_knn",
)

# one representative per family that round 1 left driver-untested
FAMILY_REPS = {
    "udf": ("q_scalar_udf", "q_pandas_udf", "q_grouped_agg_udf", "q_udtf",
            "q_pipe_wordcount"),
    "sink": ("q4_two_step",),
    "scalars": ("q_string", "q_date", "q_math", "q_cond", "q_array",
                "q_json", "q_cast", "q_hash"),
    "setops": ("q_intersect", "q_except", "q_intersect_all", "q_except_all"),
    "streaming": ("q7_tumble_stream", "q_sliding", "q_session", "q_stream_dedup"),
    "dedup": ("q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash"),
    "similarity": ("q_ann_lsh", "q_ann_ivf"),
    "text": ("q_textstats", "q_langid"),
    "multimodal": ("q_binary_meta", "q_multimodal_features"),
}


def test_priority_window_shape():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50


def test_priority_names_lead_registry_order():
    names = list(all_specs())
    assert names[:50] == list(_PRIORITY)


def test_headline_and_families_inside_window():
    window = set(_PRIORITY)
    assert set(HEADLINE) <= window
    for family, reps in FAMILY_REPS.items():
        missing = [r for r in reps if r not in window]
        assert not missing, f"{family}: {missing} outside driver window"


def test_rows_only_in_window_are_all_by_design():
    specs = all_specs()
    rows_only = {n for n in _PRIORITY if specs[n].oracle is None}
    # the one remaining rows-only query is genuinely iterative (k-means
    # index construction — no closed-form SQL); everything else in the
    # window, including the approximate dedup/ANN pipelines, carries a
    # full DuckDB oracle (md5-derived hashing + fixed-point bucketing)
    assert rows_only == {"q_ann_ivf"}
