"""Empty-input robustness: at 100 TB, empty partitions, freshly
truncated tables, and zero-match filters are routine — a relational
operator that throws on empty input is a production incident. Every
representative operator family must return an EMPTY (or well-defined
scalar) result, never raise."""

import os

import pytest

from benchmark_spark.catalog import SCHEMAS
from benchmark_spark.registry import all_specs

SPECS = all_specs()

# one representative per §2 family whose inputs are all relational
# tables (streaming/staged-source queries manage their own I/O and
# LLM tiers assert non-empty corpora by design)
EMPTY_SAFE = [
    "q1_scan",          # scan + filter
    "q2_agg",           # group-by agg
    "q5_pricing",       # wide agg battery
    "q3_join",          # join + top-1
    "q_join_multi",     # star join
    "q_outer",          # outer join
    "q_semi", "q_anti",  # existence joins
    "q6_window",        # window function
    "q_topk",           # global top-k
    "q_union", "q_intersect", "q_except",  # set ops
    "q_grouping_sets",  # multi-grouping
    "q_having",
    "q_dq_checks",      # the quality gate itself
    "q_snapshot_diff",
    "q_latest_snapshot",
    "q_equidepth_hist",
    "q_trend_fit",
    # round 10: the iterative/sketch/codec tiers also short-circuit —
    # BPE training stops at round 1 with no pairs, the CMS top-20 of
    # nothing is nothing, the media fixtures generate zero payloads
    "q_bpe_train",
    "q_bpe_encode",
    "q_heavy_hitters_cms",
    "q_audio_filterbank",
    "q_decode_jpeg_420",
    "q_apply_in_pandas",
    # round 11: drift monitors + featurizer (the PSI/Benford spines
    # legally emit their full bin/digit table with zero counts)
    "q_benford",
    "q_psi",
    "q_ks_drift",
    "q_feature_hash",
    # round 11 sketch/timeseries tier: HLL collapses to one all-zero
    # register bucket (linear-counting branch reads estimate 0), the
    # KMV measure table keeps its 4 rows with NULL estimates (no kth
    # hash exists), the Bloom join reports one row of zero counters,
    # and the EWMA/MAD monitors are legally empty (no days, no groups)
    "q_hll_sketch",
    "q_kmv_theta",
    "q_bloom_join",
    "q_ewma_anomaly",
    "q_mad_outliers",
    # round 12: empty documents -> zero media payloads -> empty frame/
    # feature tables; the planted 2-D layout classifies nothing; the
    # planted k-center emits only its literal step-1 seed row (mind
    # table empty -> null final radius, never a raise)
    "q_video_mjpeg",
    "q_video_mjpeg_scenecut",
    "q_mfcc_frames",
    "q_dbscan_planted",
    "q_kcenter_planted",
]

# spine queries: empty input yields the FULL dimension table with
# zeroed counts (that IS the empty-input contract for a monitor —
# a dashboard reads "all bins zero", not "no data rows")
SPINE_ROWS = {"q_benford": 9, "q_psi": 40, "q_kmv_theta": 4}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for table, schema in SCHEMAS.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            os.path.join(d, f"{table}.parquet")
        )
    return d


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_operator_survives_empty_tables(spark, empty_sf, name):
    rows = SPECS[name].fn(spark, empty_sf).collect()
    # global aggregates may legally emit one all-null/zero row and
    # spine queries their full zeroed dimension table; everything
    # else must be empty — but never raise
    assert len(rows) <= SPINE_ROWS.get(name, 6)
    if name in SPINE_ROWS:
        assert len(rows) == SPINE_ROWS[name]
