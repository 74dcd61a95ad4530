"""Driver-window invariants (SURVEY.md §2 coverage contract).

The external correctness harness hash-checks only the FIRST 50
registry entries, so the ordering in registry._PRIORITY IS part of
the driver contract. Round-3 cut: headline bench 8 + the two
round-2 red rows + every query with no driver evidence across
rounds 1-2 (the late-r2 LLM tier, skew/stream extras, and the six
round-3 additions) + q_ann_ivf + 8 re-proof slots. Queries
displaced from the window must all be double-green in
CORRECTNESS_r01+r02.
"""

import json

from benchmark_spark.registry import _PRIORITY, all_specs

HEADLINE = (
    "q1_scan", "q2_agg", "q3_join", "q4_wordcount",
    "q5_pricing", "q6_window", "q7_tumble", "q8_knn",
)

# every query with zero driver evidence after rounds 1-2 (union of
# CORRECTNESS_r01+r02 keys vs the registry), plus the round-3 additions
NEVER_CHECKED = (
    "q_salted_join", "q_salted_agg",
    "q_dedup_fingerprint", "q_jaccard_pairs", "q_jaccard_chargram",
    "q_dedup_clusters", "q_chunk_dedup",
    "q_knn_batch", "q_knn_sq8", "q_knn_graph",
    "q_dedup_embed", "q_dedup_embed_lsh", "q_centroid",
    "q_quality", "q_token_regex", "q_tfidf", "q_fingerprint",
    "q_langid_chargram", "q_split_sample", "q_mixture_sample",
    "q_curation_pipeline",
    "q_frame_sample", "q_stream_session", "q_funnel", "q_apply_in_pandas",
    "q_map_funcs", "q_watermark", "q_stream_join",
    "q_csv_source", "q_json_source", "q_format_text",
    "q_repetition", "q_decontaminate", "q_pii_redact", "q_merge_upsert",
    "q_orc_source", "q_partition_prune", "q_scd2", "q_incremental_agg",
)

# Unproven queries that do NOT fit the full 50-slot round-3 window:
# first candidates for the round-4 re-cut once this window goes green.
NEXT_WINDOW = (
    "q_pagerank", "q_bm25", "q_pack_sequences",
    "q_stream_update", "q_stream_append", "q_bucket_join",
    "q_smj_join", "q_shj_join",
)

NEED_GREEN_PROOF = ("q_bool_agg", "q_multimodal_features")


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
    missing = [n for n in NEVER_CHECKED if n not in window]
    assert not missing, f"never-driver-checked queries outside window: {missing}"
    # the window is full: overflow is named, not silent
    assert len(set(NEXT_WINDOW) & window) == 0


def test_displaced_queries_are_all_driver_green():
    """Anything pushed below position 50 must already be proven by the
    driver itself (green in r1 or r2) — the window only spends slots
    on queries whose driver status is unknown or red."""
    r1 = json.load(open("/root/repo/CORRECTNESS_r01.json"))
    r2 = json.load(open("/root/repo/CORRECTNESS_r02.json"))

    def green(res):
        return bool(res) and (
            res.get("hash_match") is True
            or (res.get("err") == "no_oracle" and res.get("spark_rows") is not None)
        )

    window = set(_PRIORITY)
    for name in all_specs():
        if name in window or name in NEVER_CHECKED or name in NEXT_WINDOW:
            continue
        assert green(r1.get(name)) or green(r2.get(name)), (
            f"{name} displaced from the driver window without prior green proof"
        )


def test_rows_only_in_window_are_all_by_design():
    specs = all_specs()
    rows_only = {n for n in _PRIORITY if specs[n].oracle is None}
    # round 3 determinized the k-means|| seeding (md5 uniforms +
    # fixed-point cost sums), so even the iterative IVF index build
    # unrolls into a DuckDB WITH chain — EVERY query in the driver
    # window now carries a full hash oracle
    assert rows_only == set()
