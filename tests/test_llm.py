"""LLM-pipeline operators: planted-duplicate recovery for the
near-dup detectors, recall for LSH-bucketed ANN, multimodal
plumbing determinism."""

from pyspark.sql import functions as F

from benchmark_spark.llm.dedup import doubled_corpus, lsh_candidates, minhash_signatures, shingles
from benchmark_spark.llm.multimodal import fake_features
from benchmark_spark.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def test_minhash_recovers_all_planted_near_dups(spark):
    """Every doc has a planted near-dup at doc_id+1_000_000 (last
    token dropped). The full MinHash+LSH+verify pipeline must emit
    every planted pair (docs with >=4 tokens; shorter ones can lose
    most of their shingles to the mutation)."""
    pairs = SPECS["q_dedup_minhash"].fn(spark, SF_SMOKE)
    found = {
        (r["a_id"], r["b_id"]) for r in pairs.collect()
    }
    docs = doubled_corpus(spark, SF_SMOKE).filter(F.col("doc_id") < 1_000_000)
    eligible = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
        if r["n"] >= 8
    }
    missing = {d for d in eligible if (d, d + 1_000_000) not in found}
    assert not missing, f"planted near-dups missed: {sorted(missing)[:10]}"


def test_minhash_jaccard_is_high_for_planted_pairs(spark):
    pairs = SPECS["q_dedup_minhash"].fn(spark, SF_SMOKE)
    planted = pairs.filter(F.col("b_id") == F.col("a_id") + 1_000_000)
    row = planted.agg(F.min("jaccard").alias("mn"), F.count(F.lit(1)).alias("n")).first()
    assert row["n"] > 0
    assert row["mn"] >= 0.5


def test_minhash_xxhash64_family_parity(spark):
    """The production hash family (seeded xxhash64, not oracle-
    expressible) must lose nothing on the planted corpus: 100% recall
    of the eligible planted pairs, and any disagreement with the md5
    family confined to borderline organic pairs (exact-Jaccard verify
    makes precision identical by construction, so families can only
    differ on which near-threshold pairs become candidates — planted
    and high-similarity pairs must never be among them). Also pins
    that the fast path really skips the md5 hex round-trip: no md5
    appears anywhere in its plan."""
    sh = shingles(doubled_corpus(spark, SF_SMOKE))
    from benchmark_spark.llm.dedup import verify_jaccard

    sig_xx = minhash_signatures(sh, hash_family="xxhash64")
    assert "md5" not in sig_xx._jdf.queryExecution().analyzed().toString().lower()
    by_family = {
        fam: {
            (r["a_id"], r["b_id"]): r["jaccard"]
            for r in verify_jaccard(
                sh, lsh_candidates(minhash_signatures(sh, hash_family=fam)), 0.5
            ).collect()
        }
        for fam in ("md5", "xxhash64", "md5x2")
    }
    eligible = {
        r["doc_id"]
        for r in doubled_corpus(spark, SF_SMOKE)
        .filter(F.col("doc_id") < 1_000_000)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
        if r["n"] >= 8
    }
    # every non-default family must keep 100% planted-pair recall
    for fam in ("xxhash64", "md5x2"):
        missing = {d for d in eligible if (d, d + 1_000_000) not in by_family[fam]}
        assert not missing, f"{fam} missed planted pairs: {sorted(missing)[:10]}"
        diff = set(by_family["md5"]) ^ set(by_family[fam])
        high_sim_diff = {
            p: max(by_family["md5"].get(p, 0), by_family[fam].get(p, 0))
            for p in diff
            if max(by_family["md5"].get(p, 0), by_family[fam].get(p, 0)) >= 0.8
        }
        assert not high_sim_diff, f"md5 vs {fam} disagree on high-sim pairs: {high_sim_diff}"
    # two-base coefficients really are overflow-safe: max |term sum|
    from benchmark_spark.llm.dedup import perm_coeffs2

    for a, b, c in perm_coeffs2():
        assert (a * 0x7FFFFFFF + b * 0x7FFFFFFF + c) < 2**62


def test_lsh_bucketing_is_deterministic(spark):
    sig1 = minhash_signatures(shingles(doubled_corpus(spark, SF_SMOKE)))
    c1 = lsh_candidates(sig1).count()
    sig2 = minhash_signatures(shingles(doubled_corpus(spark, SF_SMOKE)))
    c2 = lsh_candidates(sig2).count()
    assert c1 == c2 > 0


def test_capped_lsh_is_identity_without_oversized_buckets(spark):
    """With the cap above every bucket's occupancy the capped variant
    must emit exactly lsh_candidates' pairs (the q_dedup_minhash_capped
    oracle asserts the same end-to-end; this pins the candidate set)."""
    from benchmark_spark.llm.dedup import capped_lsh_candidates

    sig = minhash_signatures(shingles(doubled_corpus(spark, SF_SMOKE)))
    plain = {(r["a_id"], r["b_id"]) for r in lsh_candidates(sig).collect()}
    capped = {
        (r["a_id"], r["b_id"])
        for r in capped_lsh_candidates(sig, bucket_cap=10_000).collect()
    }
    assert capped == plain and plain


def test_capped_lsh_bounds_boilerplate_buckets(spark):
    """Planted boilerplate crowd: 400 docs with IDENTICAL text share
    every band bucket. Uncapped LSH owes 400*399/2 = 79800 pairs for
    the crowd alone; with bucket_cap=64 the crowd's buckets survive
    secondary banding unsplit (identical signatures) and are dropped,
    so the crowd contributes ZERO pairs while genuine near-dups from
    the normal corpus are still found. This is the deliberate
    recall-for-boundedness trade documented in capped_lsh_candidates:
    identical-text crowds belong to exact dedup, not pair enumeration."""
    from benchmark_spark.llm.dedup import capped_lsh_candidates

    corpus = doubled_corpus(spark, SF_SMOKE)
    crowd = spark.range(400).select(
        (F.col("id") + 5_000_000).alias("doc_id"),
        F.lit("the same boilerplate license header text repeated verbatim "
              "across every mirrored page of the crawl").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("crawl").alias("source"),
        F.lit(100).cast("bigint").alias("n_chars"),
    )
    sig = minhash_signatures(shingles(corpus.unionByName(crowd)))
    pairs = capped_lsh_candidates(sig, bucket_cap=64)
    crowd_pairs = pairs.filter(F.col("a_id") >= 5_000_000).count()
    assert crowd_pairs == 0
    # the normal corpus's planted near-dups are unaffected by the crowd
    normal = pairs.filter(
        (F.col("a_id") < 5_000_000) & (F.col("b_id") == F.col("a_id") + 1_000_000)
    ).count()
    assert normal > 0


def test_capped_lsh_secondary_banding_splits_near_crowds(spark):
    """Deterministic split mechanics on a synthetic signature table:
    200 docs share h0..h13 (bands 0-6 are one oversized bucket each)
    while h14 = h15 = doc_id // 2 pairs the docs up. Band 7's raw
    buckets are already the size-2 pairs. Band 6's oversized bucket
    has extension row h14 (the next signature row), which splits it
    into those same size-2 sub-buckets — SURVIVING the cap. Bands
    0-5 extend with h2..h13 (still shared), stay oversized, and are
    dropped. Exactly the 100 planted pairs must come out; the
    uncapped join on the same signatures owes 7 * 19900 + 100
    bucket-pairs, which is the quadratic bill the cap refuses."""
    from benchmark_spark.llm.dedup import capped_lsh_candidates, lsh_candidates

    sig = spark.range(200).select(
        F.col("id").alias("doc_id"),
        *[F.lit(1000 + i).cast("long").alias(f"h{i}") for i in range(14)],
        (F.col("id") / 2).cast("long").alias("h14"),
        (F.col("id") / 2).cast("long").alias("h15"),
    )
    capped = capped_lsh_candidates(sig, bucket_cap=64)
    got = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    assert got == {(2 * i, 2 * i + 1) for i in range(100)}
    assert lsh_candidates(sig).count() == 200 * 199 // 2


def test_simhash_places_planted_pairs_within_threshold(spark):
    pairs = SPECS["q_dedup_simhash"].fn(spark, SF_SMOKE)
    planted = pairs.filter(F.col("b_id") == F.col("a_id") + 1_000_000)
    # mutated docs differ by one token -> tiny Hamming distance; at the
    # Manku-standard emit threshold (3) the planted distribution at this
    # SF puts 80% of pairs inside (the rest sit at h=4..11: dropping one
    # token from a SHORT doc shifts many vote signs at once)
    assert planted.count() >= 390  # of 500
    assert planted.agg(F.max("hamming")).first()[0] <= 3


def test_ann_lsh_recall_vs_brute_force(spark):
    """Multi-probe LSH ANN (8 tables x 4 bits, 5 probes/table) must
    recover most of the true top-3 for the probe anchors;
    deterministic planes, so the measured recall (1.0 at this SF,
    0.93 at sf0.01) is stable."""
    truth = {
        (r["a_id"], r["neighbor_id"])
        for r in SPECS["q_knn_batch"].fn(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["a_id"], r["neighbor_id"])
        for r in SPECS["q_ann_lsh"].fn(spark, SF_SMOKE).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.8, f"recall={recall}"


def test_fake_features_deterministic_and_shaped():
    b = b"hello world payload"
    f1 = fake_features(b)
    f2 = fake_features(b)
    assert f1 == f2
    assert len(f1) == 4
    assert all(0.0 <= x <= 1.0 for x in f1)
    assert fake_features(b"") == [0.0, 0.0, 0.0, 0.0]


def test_multimodal_features_match_metadata(spark):
    from benchmark_spark.llm.multimodal import features_frame, media_table

    feats = features_frame(media_table(spark, SF_SMOKE))
    meta = SPECS["q_binary_meta"].fn(spark, SF_SMOKE)
    joined = feats.alias("f").join(meta.alias("m"), "doc_id")
    assert joined.filter(F.col("f.n_bytes") != F.col("m.n_bytes")).count() == 0
    assert feats.filter(F.size("feature") != 4).count() == 0
    # registered (driver) form: fixed-point string, 4 comma-joined dims
    reg = SPECS["q_multimodal_features"].fn(spark, SF_SMOKE)
    assert dict(reg.dtypes)["feature"] == "string"
    assert reg.filter(F.size(F.split("feature", ",")) != 4).count() == 0


def test_fake_resize_contract():
    from benchmark_spark.llm.multimodal import fake_resize

    out = fake_resize(b"abcdef", 8, 4)
    assert len(out) == 32
    assert out[:6] == b"abcdef"
    assert fake_resize(b"", 2, 2) == b"\x00" * 4


def test_frame_sample_plumbing(spark):
    from benchmark_spark.llm.multimodal import frames_frame, media_table

    frames = frames_frame(media_table(spark, SF_SMOKE))
    assert frames.count() == 500 * 3
    assert frames.filter(F.col("frame_bytes") != F.length("frame")).count() == 0
    per_doc = frames.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") != 3).count() == 0
    # registered (driver) form: hex string, 2 chars per byte
    reg = SPECS["q_frame_sample"].fn(spark, SF_SMOKE)
    assert dict(reg.dtypes)["frame_hex"] == "string"
    assert reg.filter(F.length("frame_hex") != 2 * F.col("frame_bytes")).count() == 0


def test_real_decode_kernels_are_real():
    """Round 8: the formerly-stubbed kernels execute for real (stdlib
    PPM/BMP/PNG codecs); unknown magic raises ValueError, not
    NotImplementedError. Full round-trip properties: tests/test_codecs.py."""
    import pytest as _pytest

    from benchmark_spark.llm import codecs
    from benchmark_spark.llm.multimodal import decode_image, resize_image, sample_frames

    rgb = bytes(range(36))
    for fmt in ("ppm", "bmp", "png"):
        assert decode_image(codecs.encode_image(fmt, 4, 3, rgb)) == (fmt, 4, 3, rgb)
    resized = resize_image(codecs.encode_image("bmp", 4, 3, rgb), 8, 6)
    assert decode_image(resized)[:3] == ("ppm", 8, 6)
    vid = codecs.encode_ppm_video([(4, 3, rgb), (4, 3, rgb[::-1])])
    assert [decode_image(f)[3] for f in sample_frames(vid, 2)] == [rgb, rgb[::-1]]
    with _pytest.raises(ValueError):
        decode_image(b"not an image")


def test_dedup_clusters_group_planted_pairs(spark):
    """Every planted (doc, doc+1M) near-dup pair must land in one
    cluster with keep_id == the original doc (or a smaller doc merged
    into the same component)."""
    from benchmark_spark.llm.dedup import connected_components

    clusters = SPECS["q_dedup_clusters"].fn(spark, SF_SMOKE)
    rows = clusters.collect()
    assert len(rows) > 0
    assert all(r["cluster_size"] >= 2 for r in rows)
    assert all(r["keep_id"] < 1_000_000 for r in rows)
    # labels of both endpoints of a planted pair agree
    pairs = SPECS["q_dedup_minhash"].fn(spark, SF_SMOKE).select("a_id", "b_id")
    labels = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    planted = [r for r in pairs.collect() if r["b_id"] == r["a_id"] + 1_000_000]
    assert planted
    for r in planted:
        assert labels[r["a_id"]] == labels[r["b_id"]]


def test_kmeans_lite_improves_assignment_similarity(spark):
    """One Lloyd iteration must not decrease the mean max-dot
    similarity of vectors to their assigned centroid."""
    from benchmark_spark.catalog import load_table
    from benchmark_spark.llm.similarity import _assign, dot, kmeans_lite

    emb = load_table(spark, SF_SMOKE, "embeddings")
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))

    def mean_sim(centroids):
        a = _assign(vecs, centroids)
        joined = (
            a.join(vecs, "vec_id")
            .join(centroids, "cid")
            .select(dot(F.col("v"), F.col("cvec")).alias("s"))
        )
        return joined.agg(F.avg("s")).first()[0]

    c0 = kmeans_lite(emb, k=10, iters=0)
    c2 = kmeans_lite(emb, k=10, iters=2)
    assert mean_sim(c2) >= mean_sim(c0) - 1e-9


def test_kmeans_parallel_init_is_deterministic_and_spread(spark):
    """k-means|| seeding must reproduce bit-identically across runs
    (hash-derived sampling, no RNG state) and pick k distinct,
    non-clumped seeds: pairwise dot < 1 means no duplicate vectors."""
    from benchmark_spark.catalog import load_table
    from benchmark_spark.llm.similarity import dot, kmeans_parallel_init

    emb = load_table(spark, SF_SMOKE, "embeddings")
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    c1 = kmeans_parallel_init(vecs, k=10)
    c2 = kmeans_parallel_init(vecs, k=10)
    ids1 = sorted(r["cid"] for r in c1.collect())
    ids2 = sorted(r["cid"] for r in c2.collect())
    assert ids1 == ids2
    assert len(ids1) == len(set(ids1)) == 10
    a, b = c1.alias("a"), c1.alias("b")
    max_pair = (
        a.join(b, F.col("a.cid") < F.col("b.cid"))
        .select(dot(F.col("a.cvec"), F.col("b.cvec")).alias("s"))
        .agg(F.max("s"))
        .first()[0]
    )
    assert max_pair < 0.999


def test_ann_ivf_recall_vs_brute_force(spark):
    """IVF with nprobe=4 of 10 k-means||-seeded lists must recover a
    solid share of the true top-3 (deterministic index -> stable
    measured recall)."""
    truth = {
        (r["a_id"], r["neighbor_id"])
        for r in SPECS["q_knn_batch"].fn(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["a_id"], r["neighbor_id"])
        for r in SPECS["q_ann_ivf"].fn(spark, SF_SMOKE).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.4, f"recall={recall}"


def test_chunk_dedup_surfaces_planted_passage_dups(spark):
    """Docs longer than one 32-token chunk share their leading chunks
    with their planted mutant (only the final chunk differs), so the
    chunk-level dedup must surface a healthy share of the corpus and
    every group must name a pre-mutation survivor."""
    groups = SPECS["q_chunk_dedup"].fn(spark, SF_SMOKE).collect()
    assert len(groups) > 100
    assert all(r["n_docs"] >= 2 for r in groups)
    # most groups pair an original with its mutant; a small tail is
    # mutant-only (two mutants' truncated FINAL chunks can coincide
    # while the originals' longer final chunks differ)
    with_original = sum(1 for r in groups if r["keep_doc"] < 1_000_000)
    assert with_original / len(groups) > 0.8


def test_knn_sq8_matches_exact_topk(spark):
    """The int8-shortlist + exact-rerank pipeline must return the same
    top-10 as the full-precision brute-force scan at this SF (the 3x
    shortlist gives the re-rank enough slack)."""
    exact = [(r["vec_id"], r["score"]) for r in SPECS["q8_knn"].fn(spark, SF_SMOKE).collect()]
    sq8 = [(r["vec_id"], r["score"]) for r in SPECS["q_knn_sq8"].fn(spark, SF_SMOKE).collect()]
    assert sorted(sq8) == sorted(exact)


def test_dedup_embed_lsh_recovers_blocked_pairs(spark):
    """Every pair the label-blocked variant finds above threshold whose
    vectors collide in >= 1 LSH bucket must appear; in practice the
    bucket recall on >0.3-cosine pairs is high — assert the LSH-blocked
    result covers most of the label-blocked truth without requiring the
    label key."""
    labeled = {(r["a_id"], r["b_id"]) for r in SPECS["q_dedup_embed"].fn(spark, SF_SMOKE).collect()}
    lsh = {(r["a_id"], r["b_id"]) for r in SPECS["q_dedup_embed_lsh"].fn(spark, SF_SMOKE).collect()}
    assert labeled, "label-blocked variant found nothing — fixture drift"
    recall = len(labeled & lsh) / len(labeled)
    assert recall >= 0.6, f"recall={recall}"


def test_curation_pipeline_properties(spark):
    """Survivors are unique docs above the quality bar with a valid
    deterministic split; pipeline output is stable across runs."""
    out1 = SPECS["q_curation_pipeline"].fn(spark, SF_SMOKE).collect()
    assert len(out1) > 0
    assert all(r["quality"] >= 0.5 for r in out1)
    assert {r["split"] for r in out1} <= {"train", "val", "test"}
    ids = [r["doc_id"] for r in out1]
    assert len(ids) == len(set(ids))
    out2 = SPECS["q_curation_pipeline"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_mixture_sample_tracks_rates(spark):
    """Kept fraction per source must track its configured rate (hash
    uniforms are ~uniform; 25 docs/source at this SF -> loose bound),
    and the draw must be reproducible."""
    from benchmark_spark.llm.text import MIXTURE_RATES

    rates = dict(MIXTURE_RATES)
    out = SPECS["q_mixture_sample"].fn(spark, SF_SMOKE)
    kept = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # high-rate sources keep far more than low-rate ones
    assert kept.get("src19", 0) > kept.get("src0", 0)
    for s, n in kept.items():
        assert n <= 25
        assert rates[s] > 0.0
    c1 = out.count()
    c2 = SPECS["q_mixture_sample"].fn(spark, SF_SMOKE).count()
    assert c1 == c2


def test_pagerank_mass_and_centrality(spark):
    from benchmark_spark.llm.graph import MASS, knn_edges, q_pagerank

    ranks = q_pagerank(spark, SF_SMOKE).toPandas()
    n = len(ranks)
    assert n == 500
    # teleport mass alone is (1-d)*MASS; total never exceeds full mass
    # (dangling leak means <= MASS, integer floor loses at most 1/node/round)
    total = ranks["rank_fp"].sum()
    assert 0.15 * MASS * 0.99 < total <= MASS
    # every node holds at least the teleport floor
    assert (ranks["rank_fp"] >= (15 * MASS) // (100 * n) - 1).all()
    # nodes with in-edges must outrank the teleport-only floor
    edges = knn_edges(spark, SF_SMOKE).toPandas()
    floor_rank = (15 * MASS) // (100 * n)
    with_in = set(edges["dst"])
    ranked = dict(zip(ranks["vec_id"], ranks["rank_fp"]))
    assert all(ranked[v] > floor_rank for v in with_in)


def test_pagerank_is_deterministic_across_runs(spark):
    from benchmark_spark.llm.graph import q_pagerank

    a = q_pagerank(spark, SF_SMOKE).toPandas().sort_values("vec_id").reset_index(drop=True)
    b = q_pagerank(spark, SF_SMOKE).toPandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_bm25_ranks_term_rich_docs(spark):
    from benchmark_spark.llm.text import BM25_TERMS, q_bm25

    top = q_bm25(spark, SF_SMOKE).toPandas()
    assert len(top) == 10
    assert (top["bm25_fp"] > 0).all()
    # scores are sorted and the winner really is term-dense: it must
    # contain at least one query term more often than the corpus median
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    counts = sorted(
        sum(t.count(q) for q in BM25_TERMS) for t in docs.values()
    )
    median = counts[len(counts) // 2]
    winner_count = sum(docs[top["doc_id"].iloc[0]].count(q) for q in BM25_TERMS)
    assert winner_count > median
    assert list(top["bm25_fp"]) == sorted(top["bm25_fp"], reverse=True)


def test_pack_sequences_offsets_are_contiguous(spark):
    from benchmark_spark.llm.text import PACK_SEQ_LEN, q_pack_sequences

    pdf = q_pack_sequences(spark, SF_SMOKE).toPandas()
    assert (pdf["n_seqs"] >= 1).all()
    for _, grp in pdf.groupby("source"):
        g = grp.sort_values("doc_id").reset_index(drop=True)
        # token offsets tile the per-source stream with no gaps
        expect = 0
        for _, row in g.iterrows():
            assert row["tok_start"] == expect
            assert row["seq_first"] == expect // PACK_SEQ_LEN
            assert row["seq_last"] == (expect + row["n_tok"] - 1) // PACK_SEQ_LEN
            expect += row["n_tok"]


def test_pq_recall_meter_and_code_width(spark):
    """PQ tier invariants: 10 results per anchor, the in-plan recall
    flag is real data (0 < recall < 1 at this codebook size — a flag
    stuck at 1 would mean the shortlist is degenerate, stuck at 0 a
    broken encoder), and every vector encodes to exactly 4 subspace
    codes drawn from the 16-entry codebooks."""
    from benchmark_spark.registry import get_query

    out = get_query("q_knn_pq").fn(spark, SF_SMOKE).cache()
    assert out.count() == 50  # 5 anchors x top-10
    per_anchor = {r["a_id"]: r["n"] for r in out.groupBy("a_id").count().withColumnRenamed("count", "n").collect()}
    assert set(per_anchor) == {0, 1, 2, 3, 4} and all(n == 10 for n in per_anchor.values())
    hits = out.agg(F.sum("in_exact10")).first()[0]
    assert 0 < hits < 50
    assert out.filter("rank < 1 OR rank > 10").count() == 0
    out.unpersist()

def test_pq_trained_recall_beats_untrained(spark):
    """VERDICT r8 #1 acceptance: the Lloyd-trained, proportional-shortlist
    PQ tier must hold recall@10 >= 0.9 (measured 0.96 at sf0.01/sf0.1)
    and strictly beat the untrained fixed-shortlist baseline on the same
    corpus. Also pins the training determinism contract: two plan builds
    collect the same sample and must produce identical top-10 sets."""
    from benchmark_spark.registry import get_query

    trained = get_query("q_knn_pq_trained").fn(spark, SF_SMOKE).cache()
    assert trained.count() == 50
    hits = trained.agg(F.sum("in_exact10")).first()[0]
    assert hits >= 45, f"trained recall@10 {hits/50} < 0.9"
    base_hits = (
        get_query("q_knn_pq").fn(spark, SF_SMOKE).agg(F.sum("in_exact10")).first()[0]
    )
    assert hits >= base_hits
    again = get_query("q_knn_pq_trained").fn(spark, SF_SMOKE)
    assert sorted(map(tuple, trained.collect())) == sorted(map(tuple, again.collect()))
    trained.unpersist()

def test_ivfpq_probes_bound_the_scan_and_recall_holds(spark):
    """IVFPQ invariants: 10 results per anchor, recall@10 >= 0.85 at
    fixture scale (measured 0.92), and the candidate set is genuinely
    list-bounded — fewer ADC candidates than the corpus (the probe
    filter does real work, unlike a flat PQ scan)."""
    from benchmark_spark.registry import get_query

    out = get_query("q_knn_ivfpq").fn(spark, SF_SMOKE).cache()
    assert out.count() == 50
    hits = out.agg(F.sum("in_exact10")).first()[0]
    assert hits >= 42, f"ivfpq recall@10 {hits/50} < 0.85"
    assert out.filter("rank < 1 OR rank > 10").count() == 0
    out.unpersist()


def test_bpe_train_merge_semantics_and_shape(spark):
    """The padded-separator replace IS the greedy left-to-right
    non-overlapping BPE merge: consecutive occurrences share a
    separator and the scan resumes after each replacement. Plus the
    learned table's shape: K sequential ranks, each merged symbol the
    concatenation of its pair, and re-merges of merged symbols are
    possible (the property a one-shot pair count cannot produce)."""
    # semantics pin, engine-side (the exact expression the query uses):
    # double-space separators + single flanks = classic greedy BPE
    row = spark.createDataFrame(
        [(" a  a  a ",), (" a  a  a  a ",), (" a  a  a  a  a ",),
         (" b  a  a  b ",), (" ba  a ",)],
        "ws string",
    ).select(F.replace(F.col("ws"), F.lit(" a  a "), F.lit(" aa ")).alias("ws")).collect()
    assert [r["ws"] for r in row] == [
        " aa  a ", " aa  aa ", " aa  aa  a ", " b  aa  b ", " ba  a ",
    ]

    # hand-computed classic trajectory on a crafted vocabulary:
    # round 1: (a,a) in 'aaaa' counts OVERLAPPING positions (3x5=15)
    # round 2: (a,b) = 2x4 + 1x3 = 11
    # round 3: the rank-1 MERGED symbol re-merges with itself (aa,aa)=5
    # round 4: ditto for ab; round 5 finds no pair left -> early stop
    from benchmark_spark.llm.text import _BPE_K, bpe_train, q_bpe_train

    vocab = spark.createDataFrame(
        [("aaaa", 5), ("abab", 4), ("ab", 3)], "tok string, n long"
    )
    merges, words = bpe_train(spark, vocab, 8)
    assert merges == [
        (1, "a", "a", 15),
        (2, "a", "b", 11),
        (3, "aa", "aa", 5),
        (4, "ab", "ab", 4),
    ]
    # the post-merge state encodes each crafted word to ONE symbol —
    # the q_bpe_encode contract on a fully-learnable corpus
    enc = {(r["ws"], r["n"]) for r in words.collect()}
    assert enc == {(" aaaa ", 5), (" abab ", 4), (" ab ", 3)}

    table = q_bpe_train(spark, SF_SMOKE).collect()
    assert [r["merge_rank"] for r in table] == list(range(1, _BPE_K + 1))
    assert all(r["cnt"] > 0 for r in table)
    merged = [r["lhs"] + r["rhs"] for r in table]
    assert len(set(merged)) == _BPE_K  # merges are distinct symbols


def test_ivfpq_train_clamped_to_nlist_past_cap():
    """ADVICE r10 #2: when ceil(sqrt(N)) crosses the 4096 training cap
    (N > ~16.7M), train clamps UP to nlist so first-nlist-rows init
    still yields nlist centroids; the DuckDB params CTE replays the
    same arithmetic."""
    import duckdb

    from benchmark_spark.llm.similarity import (
        _IVFPQ_TRAIN_CAP,
        _ivfpq_params,
    )

    for n in (1, 50, 512, 100_000, 16_800_000, 20_000_000, 10**9):
        nlist, _nprobe, train = _ivfpq_params(n)
        assert train >= min(n, nlist), (n, nlist, train)
        assert train <= max(n and n, max(nlist, _IVFPQ_TRAIN_CAP))
        sql_train = duckdb.sql(
            f"""SELECT LEAST(n, GREATEST(nlist, LEAST({_IVFPQ_TRAIN_CAP},
                       GREATEST(512, 16 * nlist))))
                FROM (SELECT GREATEST(16, CAST(CEIL(SQRT({n})) AS BIGINT)) AS nlist,
                             CAST({n} AS BIGINT) AS n)"""
        ).fetchone()[0]
        assert sql_train == train, (n, sql_train, train)
    # the advertised failure point: 20M vectors -> nlist 4473 > cap
    nlist, _, train = _ivfpq_params(20_000_000)
    assert nlist > _IVFPQ_TRAIN_CAP and train == nlist


def test_bpe_train_handles_duplicate_vocab_toks(spark):
    """ADVICE r10 #3: the exported bpe_train helpers must count pairs
    correctly even when the input vocabulary has DUPLICATE toks (the
    old lead()-over-partitionBy('ws') window interleaved rows sharing
    a ws). Two 'ab' rows weighted 2 and 3 -> pair (a,b) counts 5."""
    from benchmark_spark.llm.text import bpe_train_merges

    vocab = spark.createDataFrame(
        [("ab", 2), ("ab", 3), ("ba", 1)], "tok string, n long"
    )
    merges = bpe_train_merges(spark, vocab, 1)
    assert merges == [(1, "a", "b", 5)]


def test_bpe_tokenize_chain_is_consistent(spark):
    """The train->tokenize->pack chain agrees with itself (VERDICT r13
    #3): per-doc BPE token counts from the SEQUENCE materialization
    (q_bpe_tokenize) equal the counts the packing variant derives from
    the symbol-length join (q_pack_sequences_bpe), doc for doc; every
    doc is tokenized; and the order-sensitive checksum is genuinely
    order-sensitive (differs from the unweighted id sum whenever a doc
    has >1 token). Packing output must also be structurally valid:
    tok_start strictly increasing per source, seq bounds consistent."""
    tok = {r["doc_id"]: r for r in SPECS["q_bpe_tokenize"].fn(spark, SF_SMOKE).collect()}
    pack = {r["doc_id"]: r for r in SPECS["q_pack_sequences_bpe"].fn(spark, SF_SMOKE).collect()}
    assert set(tok) == set(pack) and len(tok) == 500
    for d, t in tok.items():
        assert pack[d]["n_tok"] == t["n_tok"]
        assert t["n_distinct"] <= t["n_tok"]
        if t["n_tok"] > 1:
            assert t["seq_fp"] > t["id_sum"]  # position weights applied
    by_src: dict = {}
    for r in pack.values():
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["tok_start"] == cum
            assert r["seq_first"] == r["tok_start"] // 512
            assert r["seq_last"] == (r["tok_start"] + r["n_tok"] - 1) // 512
            assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
            cum += r["n_tok"]


def test_bloom_decontaminate_is_one_sided(spark):
    """The Bloom probe may false-positive but never false-negative:
    every doc flags one_sided_ok, every long-enough planted holdout
    source (doc_id % 7 == 0, >= 9 tokens so the tail-trimmed copy
    still shares an 8-gram) is BOTH exact- and bloom-flagged, and the
    bloom hit count per doc is >= the exact hit count row by row."""
    rows = SPECS["q_bloom_decontaminate"].fn(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["one_sided_ok"] == 1 for r in rows)
    assert all(r["n_bloom"] >= r["n_exact"] for r in rows)
    from benchmark_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    long_holdout = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
        if r["doc_id"] % 7 == 0 and r["n"] >= 9
    }
    flagged_exact = {r["doc_id"] for r in rows if r["exact_hit"] == 1}
    flagged_bloom = {r["doc_id"] for r in rows if r["bloom_hit"] == 1}
    assert long_holdout <= flagged_exact
    assert flagged_exact <= flagged_bloom


def test_label_propagation_forms_real_communities(spark):
    """LPA output: one row per vector, labels drawn from vec_id space,
    and the planted near-duplicate structure must produce at least one
    multi-member community (near-dup vectors share kNN neighborhoods)
    while NOT collapsing everything into one block — the granularity
    claim that separates LPA from connected components."""
    rows = SPECS["q_label_propagation"].fn(spark, SF_SMOKE).collect()
    n = len(rows)
    assert n == len({r["vec_id"] for r in rows})
    from collections import Counter

    sizes = Counter(r["community"] for r in rows)
    assert max(sizes.values()) > 1  # communities actually form
    assert len(sizes) > 1  # ...but not one giant blob


def test_mmr_rerank_is_diverse_and_deterministic(spark):
    """MMR output: 5 ranks, first pick is the plain cosine top-1, and
    the selection must run twice to the identical table (integer
    scores make the greedy argmax partition-order-proof)."""
    a = [(r["rank"], r["vec_id"], r["score"])
         for r in SPECS["q_mmr_rerank"].fn(spark, SF_SMOKE).collect()]
    b = [(r["rank"], r["vec_id"], r["score"])
         for r in SPECS["q_mmr_rerank"].fn(spark, SF_SMOKE).collect()]
    assert a == b
    assert [r[0] for r in a] == [1, 2, 3, 4, 5]
    top1 = SPECS["q8_knn"].fn(spark, SF_SMOKE).collect()[0]["vec_id"]
    assert a[0][1] == top1


def test_video_scenecut_flags_exactly_the_planted_cut(spark):
    """Every fixture video has ONE scene change (frames 2 -> 3): the
    pair table must flag pair_idx 2 and only pair_idx 2, with the
    closed-form diff sums (12/pixel drift, 304/pixel at the cut)."""
    rows = SPECS["q_video_scenecut"].fn(spark, SF_SMOKE).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, pairs in by_doc.items():
        assert sorted(p["pair_idx"] for p in pairs) == [0, 1, 2, 3, 4]
        for p in pairs:
            want_cut = 1 if p["pair_idx"] == 2 else 0
            assert p["is_cut"] == want_cut, (doc_id, p)
            want_diff = p["npix"] * (304 if want_cut else 12)
            assert p["diff_sum"] == want_diff, (doc_id, p)


def test_gopher_keep_bit_is_conjunction_of_rules(spark):
    """The composite keep bit must equal the AND of the four Gopher
    rules recomputed from the emitted per-rule columns with the
    registered thresholds. Rows whose 4dp-snapped display metrics sit
    within 1e-3 of a float threshold are skipped (keep is computed
    from RAW integer ratios; the snap can land on the other side)."""
    from benchmark_spark.llm.text import (
        _GOPHER_MAX_LEN1, _GOPHER_MAX_MWL, _GOPHER_MAX_WORDS,
        _GOPHER_MIN_MWL, _GOPHER_MIN_STOPS, _GOPHER_MIN_WORDS,
    )

    rows = SPECS["q_gopher_quality"].fn(spark, SF_SMOKE).collect()
    assert rows
    checked = 0
    for r in rows:
        near = (
            abs(r["mean_wlen"] - _GOPHER_MIN_MWL) < 1e-3
            or abs(r["mean_wlen"] - _GOPHER_MAX_MWL) < 1e-3
            or abs(r["frac_len1"] - _GOPHER_MAX_LEN1) < 1e-3
        )
        if near:
            continue
        want = int(
            _GOPHER_MIN_WORDS <= r["n_words"] <= _GOPHER_MAX_WORDS
            and _GOPHER_MIN_MWL <= r["mean_wlen"] <= _GOPHER_MAX_MWL
            and r["frac_len1"] <= _GOPHER_MAX_LEN1
            and r["stop_distinct"] >= _GOPHER_MIN_STOPS
        )
        assert r["keep"] == want, r
        checked += 1
    assert checked > len(rows) // 2  # the skip rule cannot eat the test


def test_ngram_span_dedup_flags_planted_copies(spark):
    """doc_id % 10 == 2 documents have a planted near-copy in the
    fixture family; any doc whose frac_dup > 0 must actually share an
    8-gram with another doc — cross-check n_dup <= n_grams and the
    heavy bit's 0.5 threshold."""
    rows = SPECS["q_ngram_span_dedup"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup"] <= r["n_grams"], r
        assert r["heavy"] == int(r["frac_dup"] > 0.5), r
    assert any(r["heavy"] == 1 for r in rows)  # planted copies exist


def test_semdedup_keeps_lowest_id_per_cluster(spark):
    """The survivor rule: within every cluster the LOWEST vec_id can
    never be marked duplicate (dups need a lower-id >= 0.3 neighbor),
    and dup flags only ever point within a cluster."""
    rows = SPECS["q_semdedup"].fn(spark, SF_SMOKE).collect()
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r["cid"], []).append(r)
    for cid, members in by_cid.items():
        lowest = min(m["vec_id"] for m in members)
        for m in members:
            if m["vec_id"] == lowest:
                assert m["is_dup"] == 0, (cid, m)


def test_audio_mel_and_mfcc_agree_on_dominant_bin(spark):
    """The mel filterbank and the MFCC front end decode the same WAV
    fixtures: their dominant-bin columns must agree row for row, and
    the mel centroid must sit inside the filter index range."""
    mel = {r["doc_id"]: r for r in SPECS["q_audio_mel"].fn(spark, SF_SMOKE).collect()}
    mfcc = {r["doc_id"]: r for r in SPECS["q_mfcc"].fn(spark, SF_SMOKE).collect()}
    assert mel.keys() == mfcc.keys()
    for d in mel:
        assert mel[d]["dom_bin"] == mfcc[d]["dom_bin"], d
        assert 0.0 <= mel[d]["mel_centroid"] <= mel[d]["n_filters"] - 1, d


def test_mfcc_frames_framing_and_per_frame_cepstra(spark):
    """The framed front end emits exactly n_frames rows per doc; frame
    0's cepstrum equals the single-clip q_mfcc construction replayed at
    the frame's tone bin, and frames with different bins get different
    dominant bins (the framing is real, not a broadcast of one value)."""
    import math

    from benchmark_spark.llm.multimodal import (
        _MEL_N,
        _MFCC_FRAME_N,
        _mel_weight,
    )

    rows = SPECS["q_mfcc_frames"].fn(spark, SF_SMOKE).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, frames in by_doc.items():
        assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == list(
            range(_MFCC_FRAME_N)
        )
        for r in frames:
            k = 1 + (d + 7 * r["frame_idx"]) % 31
            assert r["dom_bin"] == k, (d, r["frame_idx"])
            # analytic replay: e_f = w_f(k) exactly (single-line frame)
            for n in (1, 2, 3):
                c = 0.0
                for f in range(_MEL_N):
                    c += math.cos(math.pi * n * (f + 0.5) / _MEL_N) * math.log(
                        1.0 + _mel_weight(f, k)
                    )
                assert abs(r[f"mfcc{n}"] - math.floor(c * 1e4 + 0.5) / 1e4) <= 1e-4
    # at least one doc must have non-constant dominant bins across frames
    assert any(
        len({r["dom_bin"] for r in frames}) > 1 for frames in by_doc.values()
    )


def test_kcenter_matches_numpy_greedy(spark):
    """The declarative farthest-point traversal reproduces the numpy
    greedy reference exactly (same seed, same int-micro quantization,
    same vec_id tiebreak), selection distances are non-increasing,
    and the final covering radius is <= the last selection distance."""
    import numpy as np

    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_coreset_kcenter"].fn(spark, "/root/testdata/sf0.001").collect()
    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings", assert_schema=False)
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in emb])
    vm = np.floor(
        np.array([r["embedding"] for r in emb], dtype="float64") * 1e6 + 0.5
    ).astype("int64")
    chosen = [int(np.nonzero(ids == 0)[0][0])]
    mind = ((vm - vm[chosen[0]]) ** 2).sum(axis=1)
    expect = [(1, 0, 0)]
    for t in range(2, 9):
        best = np.lexsort((ids, -mind))[0]
        expect.append((t, int(ids[best]), int(mind[best])))
        mind = np.minimum(mind, ((vm - vm[best]) ** 2).sum(axis=1))
    got = [(r["step"], r["vec_id"], r["sel_d2"]) for r in rows]
    assert got == expect
    d2s = [r["sel_d2"] for r in rows][1:]
    assert d2s == sorted(d2s, reverse=True)
    assert rows[0]["final_r2"] == int(mind.max())
    assert all(r["final_r2"] == rows[0]["final_r2"] for r in rows)


def test_kcenter_planted_recovers_cluster_structure(spark):
    """On the derived planted mixture the greedy traversal matches a
    numpy replay OF THE SAME DERIVATION (fixture synthesis included),
    and the trajectory exhibits recovery: chosen labels are distinct
    planted clusters and every selection distance sits on the
    cross-cluster plateau, far above the raw table's radii."""
    import numpy as np

    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_kcenter_planted"].fn(spark, "/root/testdata/sf0.001").collect()
    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings", assert_schema=False)
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in emb])
    raw = np.array([r["embedding"] for r in emb], dtype="float64")
    center = np.where(
        (ids[:, None] % 10 != 9) & (np.arange(64)[None, :] % 8 == ids[:, None] % 8),
        1.0,
        0.0,
    )
    scale = np.where(ids % 10 == 9, 1.5, 0.5)[:, None]
    vm = np.floor((center + scale * raw) * 1e6 + 0.5).astype("int64")
    chosen = [int(np.nonzero(ids == 0)[0][0])]
    mind = ((vm - vm[chosen[0]]) ** 2).sum(axis=1)
    expect = [(1, 0, 0)]
    for t in range(2, 9):
        best = np.lexsort((ids, -mind))[0]
        expect.append((t, int(ids[best]), int(mind[best])))
        mind = np.minimum(mind, ((vm - vm[best]) ** 2).sum(axis=1))
    assert [(r["step"], r["vec_id"], r["sel_d2"]) for r in rows] == expect
    assert rows[0]["final_r2"] == int(mind.max())
    # recovery: labels distinct (one pick per planted cluster) and the
    # emitted label column equals the derivation's label
    labels = [r["label"] for r in rows]
    assert labels == [(-1 if v % 10 == 9 else v % 8) for v in (r["vec_id"] for r in rows)]
    assert len(set(labels)) == len(labels)
    # every selection hop crosses clusters: d >= center separation
    # (4.0) minus the within-cluster diameter (1.0), in micro^2 units
    assert all(r["sel_d2"] >= int((3.0e6) ** 2) for r in rows[1:])


def test_dbscan_planted_recovery_is_clean(spark):
    """On the planted 2-D star layout, EVERY clustered row classifies
    core (blob noise 0.01x is far inside eps) and every border/noise
    row comes from the unclustered shell — the hash-checked recovery
    claim in the q_dbscan_planted docstring."""
    rows = SPECS["q_dbscan_planted"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["label"] == (-1 if r["vec_id"] % 10 == 9 else r["vec_id"] % 8)
        if r["label"] >= 0:
            assert r["cls"] == "core", r
    shell = [r for r in rows if r["label"] == -1]
    assert shell and any(r["cls"] == "noise" for r in shell)


def test_semdedup_planted_dup_rate_near_total(spark):
    """On the planted mixture SemDeDup's verdict flips to near-total:
    same-cluster pairs are semantic dups by construction, so almost
    every vector is flagged (each cluster keeps ~one survivor), the
    per-cluster minimum vec_id is never a dup of itself, and the label
    column equals the derivation."""
    rows = SPECS["q_semdedup_planted"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["label"] == (-1 if r["vec_id"] % 10 == 9 else r["vec_id"] % 8)
    rate = sum(r["is_dup"] for r in rows) / len(rows)
    assert rate >= 0.9
    # keep-lowest survivor: the global minimum vec_id can never be a dup
    lowest = min(rows, key=lambda r: r["vec_id"])
    assert lowest["is_dup"] == 0


def test_perplexity_filter_holdout_semantics(spark):
    """The LM never sees score docs: every scored doc_id is odd,
    exactly 5% (ceil) are dropped, and oov tokens cost the UNK
    surprisal (avg_nll of an all-OOV doc would be the max possible) —
    spot-check one doc's avg_nll from a hand-built python LM."""
    import math
    from collections import Counter

    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_perplexity_filter"].fn(spark, "/root/testdata/sf0.001").collect()
    assert all(r["doc_id"] % 2 == 1 for r in rows)
    # round-12 rank cut (ADVICE r11 #1): the kept count is INTEGER-exact
    # (100*rank <= 95*n), and the dropped set is exactly the rank tail
    # under the (avg_nll, doc_id) order — no float-threshold tie risk.
    kept = [r for r in rows if r["kept"] == 1]
    assert len(kept) == (95 * len(rows)) // 100
    order = sorted(rows, key=lambda r: (r["avg_nll"], r["doc_id"]))
    assert {r["doc_id"] for r in kept} == {
        r["doc_id"] for r in order[: (95 * len(rows)) // 100]
    }
    docs = load_table(spark, "/root/testdata/sf0.001", "documents", assert_schema=False).collect()
    cnt = Counter()
    for d in docs:
        if d["doc_id"] % 2 == 0:
            cnt.update(d["text"].split(" "))
    n, v = sum(cnt.values()), len(cnt) + 1
    target = next(d for d in docs if d["doc_id"] == rows[0]["doc_id"])
    toks = target["text"].split(" ")

    def snap(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    ssum = sum(
        round(snap(-math.log((cnt[t] + 1.0) / (n + v)) if t in cnt else -math.log(1.0 / (n + v))) * 1e6)
        for t in toks
    )
    assert abs(rows[0]["avg_nll"] - (ssum / 1e6) / len(toks)) < 1e-9
    assert rows[0]["n_tokens"] == len(toks)
    assert rows[0]["oov_cnt"] == sum(1 for t in toks if t not in cnt)


def test_vocab_coverage_deciles_partition_docs(spark):
    """Decile rows partition the odd-doc population; oov_tokens +
    covered == tokens per row; coverage ratios sit in [0, 1] and are
    monotone-consistent with the decile key."""
    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_vocab_coverage"].fn(spark, "/root/testdata/sf0.001").collect()
    docs = load_table(spark, "/root/testdata/sf0.001", "documents", assert_schema=False)
    n_odd = docs.where("doc_id % 2 = 1").count()
    assert sum(r["n_docs"] for r in rows) == n_odd
    for r in rows:
        assert 0 <= r["decile"] <= 10
        assert 0 <= r["oov_tokens"] <= r["tokens"]
        assert 0.0 <= r["avg_coverage"] <= 1.0
        assert r["decile"] / 10 - 0.11 <= r["avg_coverage"] <= r["decile"] / 10 + 0.11


def test_dbscan_grid_matches_bruteforce(spark):
    """The grid-bucketed classification equals brute-force DBSCAN
    core/border/noise computed in python over the same int-micro
    projection, and all three classes are populated at sf0.001."""
    import numpy as np

    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_dbscan_grid"].fn(spark, "/root/testdata/sf0.001").collect()
    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings", assert_schema=False)
        .orderBy("vec_id")
        .collect()
    )
    pts = np.floor(
        np.array([[r["embedding"][0], r["embedding"][1]] for r in emb], dtype="float64")
        * 1e6
        + 0.5
    ).astype("int64")
    ids = [r["vec_id"] for r in emb]
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    nbr = d2 <= 20000 * 20000
    deg = nbr.sum(axis=1)
    is_core = deg >= 5
    has_core = (nbr & is_core[None, :]).any(axis=1)
    expect = {
        ids[i]: (
            int(deg[i]),
            "core" if is_core[i] else ("border" if has_core[i] else "noise"),
        )
        for i in range(len(ids))
    }
    got = {r["vec_id"]: (r["n_neighbors"], r["cls"]) for r in rows}
    assert got == expect
    classes = {r["cls"] for r in rows}
    assert classes == {"core", "border", "noise"}


def test_rrf_fusion_is_rank_consistent(spark):
    """RRF invariants: every output doc appears in at least one
    shortlist (rank > 0), rrf_fp equals the recomputed
    floor(1e9/(60+r)) terms, the output is sorted by fused score,
    and a doc in BOTH shortlists outranks one with the same single
    rank alone."""
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_rrf_fusion"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10

    def term(r):
        return int(1e9 / (60 + r) + 0.5) if r > 0 else 0

    for r in rows:
        assert r["rank_lex"] > 0 or r["rank_vec"] > 0
        assert r["rrf_fp"] == term(r["rank_lex"]) + term(r["rank_vec"])
    fps = [r["rrf_fp"] for r in rows]
    assert fps == sorted(fps, reverse=True)
    both = [r for r in rows if r["rank_lex"] > 0 and r["rank_vec"] > 0]
    assert both, "top-10 should contain at least one doc ranked by both lists"


def test_random_projection_matches_numpy_and_preserves_distance(spark):
    """The in-engine md5-derived sign matrix and projected distances
    equal a numpy/hashlib replay, and the mean distortion ratio sits
    near 100% (JL: E[d16^2] = 16 * d64^2 for a sign matrix)."""
    import hashlib

    import numpy as np

    from benchmark_spark.catalog import load_table
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_random_projection"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 64
    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings", assert_schema=False)
        .where("vec_id <= 64")
        .orderBy("vec_id")
        .collect()
    )
    xm = np.floor(
        np.array([r["embedding"] for r in emb], dtype="float64") * 1e6 + 0.5
    ).astype("int64")
    signs = np.array(
        [
            [
                1 - 2 * (int(hashlib.md5(f"rp{j}_{i}".encode()).hexdigest()[0], 16) % 2)
                for i in range(64)
            ]
            for j in range(16)
        ],
        dtype="int64",
    )
    proj = xm @ signs.T
    d16 = ((proj[1:] - proj[0]) ** 2).sum(axis=1)
    d64 = ((xm[1:] - xm[0]) ** 2).sum(axis=1)
    got = {r["vec_id"]: (r["d64_sq"], r["d16_sq"]) for r in rows}
    ids = [r["vec_id"] for r in emb][1:]
    for n, v in enumerate(ids):
        assert got[v] == (int(d64[n]), int(d16[n]))
    assert 60 <= rows[0]["avg_ratio_pct"] <= 140  # JL band at 16 dims
    assert all(abs(r["avg_ratio_pct"] - rows[0]["avg_ratio_pct"]) < 1e-9 for r in rows)
    # ADVICE r11 #2: the mean divides by the ACTUAL emitted pair count
    # (self-consistent with the returned rows), not a constant.
    mean = sum(round(r["ratio_pct"] * 10000) for r in rows) / (10000.0 * len(rows))
    assert abs(rows[0]["avg_ratio_pct"] - mean) < 1e-12


def test_containment_catches_planted_snippets_jaccard_misses(spark):
    """Every emitted pair has containment >= 0.9; the planted
    (snippet, source) pairs that surface carry containment ~1.0; and
    at least some of them sit BELOW the 0.5 Jaccard cut (the whole
    point: jaccard_missed = 1 rows exist and are consistent)."""
    from benchmark_spark.registry import all_specs

    rows = all_specs()["q_dedup_containment"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    planted = [r for r in rows if abs(r["a_id"] - r["b_id"]) == 1_000_000]
    assert planted, "no planted snippet pair surfaced through the bands"
    for r in rows:
        assert r["containment"] >= 0.9
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert r["jaccard_missed"] == (1 if r["jaccard"] < 0.5 else 0)
    assert any(r["jaccard_missed"] == 1 for r in planted), (
        "planted snippets should include pairs a Jaccard threshold keeps"
    )
    for r in planted:
        assert r["containment"] >= 0.97  # snippet shingles ~all contained


def test_mfcc_stft_leakage_bounds_pinned():
    """VERDICT r12 #4: the Hann-STFT verdict bounds are PINNED against
    a fresh numpy recompute over a doc_id sweep — measured max
    deviations sit well under the registered tolerances, and the
    rectangular-window reference sits far OUTSIDE the dev bound (a
    wrong window cannot pass the verdict)."""
    import math

    import numpy as np

    from benchmark_spark.llm.multimodal import (
        _MEL_N,
        _STFT_DEV_TOL,
        _STFT_FRAMES,
        _STFT_HOP,
        _STFT_LEAK_TOL,
        _STFT_WIN,
        _hann_mfcc_reference,
        _mel_weight,
        synth_tone_continuous,
    )

    n = np.arange(_STFT_WIN)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / _STFT_WIN)
    w = [[_mel_weight(f, k) for k in range(33)] for f in range(_MEL_N)]
    worst_leak = worst_dev = 0.0
    worst_rect = 1e9
    for d in range(0, 203, 7):  # covers every k residue (29 | sweep)
        _r, _c, samples = synth_tone_continuous(d)
        x = np.asarray(samples, dtype=np.float64)
        k = 2 + d % 29
        ref = _hann_mfcc_reference(k)
        rect = [
            sum(
                math.cos(math.pi * ni * (f + 0.5) / _MEL_N)
                * math.log(1.0 + _mel_weight(f, k))
                for f in range(_MEL_N)
            )
            for ni in (1, 2, 3)
        ]
        for fr in range(_STFT_FRAMES):
            seg = x[fr * _STFT_HOP : fr * _STFT_HOP + _STFT_WIN]
            power = np.abs(np.fft.rfft(hann * seg)) ** 2
            dom = int(np.argmax(power[1:]) + 1)
            assert dom == k
            p = float(power[dom])
            worst_leak = max(
                worst_leak,
                abs(power[dom - 1] / p - 0.25),
                abs(power[dom + 1] / p - 0.25),
            )
            loge = [
                math.log(1.0 + sum(w[f][kk] * power[kk] for kk in range(33)) / p)
                for f in range(_MEL_N)
            ]
            frame_rect = 0.0  # dev_ok is a MAX over the 3 coefficients
            for ni in (1, 2, 3):
                c = sum(
                    math.cos(math.pi * ni * (f + 0.5) / _MEL_N) * loge[f]
                    for f in range(_MEL_N)
                )
                worst_dev = max(worst_dev, abs(c - ref[ni - 1]))
                frame_rect = max(frame_rect, abs(c - rect[ni - 1]))
            worst_rect = min(worst_rect, frame_rect)
    assert worst_leak <= _STFT_LEAK_TOL / 10  # 1.8e-5 measured vs 2e-3
    assert worst_dev <= _STFT_DEV_TOL / 10  # 1.2e-5 measured vs 5e-4
    assert worst_rect > 10 * _STFT_DEV_TOL  # rect reference is detectable


def test_mfcc_stft_verdicts_all_green(spark):
    from benchmark_spark.llm.multimodal import _STFT_FRAMES

    rows = SPECS["q_mfcc_stft"].fn(spark, SF_SMOKE).collect()
    n_docs = len({r["doc_id"] for r in rows})
    assert len(rows) == n_docs * _STFT_FRAMES
    assert all(r["leak_ok"] == 1 and r["dev_ok"] == 1 for r in rows)
    assert all(r["dom_bin"] == 2 + r["doc_id"] % 29 for r in rows)


def test_dbscan_scheduled_is_scale_stable(spark):
    """VERDICT r12 #8: the eps ~ N^(-1/2) schedule keeps the planted
    shell NOISE-dominated where fixed eps reclassifies it core, and
    every blob point stays core. The derived eps_u must match the
    driver-side schedule."""
    from benchmark_spark.llm.selection import _dbscan_sched_eps

    rows = SPECS["q_dbscan_scheduled"].fn(spark, SF_SMOKE).collect()
    n = len(rows)
    assert all(r["eps_u"] == _dbscan_sched_eps(n) for r in rows)
    blob = [r for r in rows if r["label"] >= 0]
    shell = [r for r in rows if r["label"] == -1]
    assert all(r["cls"] == "core" for r in blob)
    noise = sum(r["cls"] == "noise" for r in shell)
    assert noise / len(shell) >= 0.85  # measured 44/50 (sf0.001), 50/50 (sf0.01)
