"""Semantic invariants for the late-round-5 LLM-pipeline queries,
beyond the oracle gate: budget-prefix maximality, bigram-count
consistency, Zipf negativity, and range-vs-top-k agreement."""

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.llm.corpus import (
    _md5_rank,
    q_bigram_lm,
    q_token_budget_mix,
    q_zipf_slope,
)
from benchmark_spark.llm.similarity import q8_knn, q_cosine_range
from tests.conftest import SF_SMOKE


def test_token_budget_is_respected_and_maximal(spark):
    out = {r["source"]: r for r in q_token_budget_mix(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    n_tok = F.size(F.split("text", " "))
    per_doc = docs.select(
        "source", n_tok.alias("n_tok"), _md5_rank(F.col("doc_id")).alias("rk")
    ).collect()
    by_source: dict[str, list] = {}
    for r in per_doc:
        by_source.setdefault(r["source"], []).append((r["rk"], r["n_tok"]))
    for source, rows in by_source.items():
        rows.sort()
        kept = out.get(source)
        if kept is None:
            # first doc alone blows the budget
            assert rows[0][1] > 1000
            continue
        assert kept["tokens_kept"] <= 1000
        # prefix property + maximality: the (n+1)-th doc would overflow
        n = kept["n_docs_kept"]
        assert sum(t for _, t in rows[:n]) == kept["tokens_kept"]
        if n < len(rows):
            assert kept["tokens_kept"] + rows[n][1] > 1000


def test_bigram_lm_counts_and_positivity(spark):
    out = q_bigram_lm(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    joined = out.join(
        docs.select("doc_id", (F.size(F.split("text", " ")) - 1).alias("want")),
        "doc_id",
    )
    bad = joined.filter(
        (F.col("n_bigrams") != F.col("want")) | (F.col("avg_nll") < 0)
    ).count()
    assert bad == 0
    assert out.count() == docs.filter(F.size(F.split("text", " ")) >= 2).count()


def test_zipf_slope_is_negative_over_full_vocab(spark):
    row = q_zipf_slope(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("t")).distinct().count()
    )
    assert row["vocab_size"] == vocab
    assert row["zipf_slope"] < 0


def test_cosine_range_agrees_with_topk(spark):
    rng = {r["vec_id"]: r["score"] for r in q_cosine_range(spark, SF_SMOKE).collect()}
    assert all(s >= 0.2 for s in rng.values())
    # every top-k hit above the radius must be a range hit with equal score
    for r in q8_knn(spark, SF_SMOKE).collect():
        if r["score"] >= 0.2:
            assert rng[r["vec_id"]] == r["score"]


def test_heaps_law_curve_is_monotone_and_ends_at_totals(spark):
    from benchmark_spark.llm.corpus import q_heaps_law

    rows = q_heaps_law(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    assert len(rows) == docs.count()
    prev_t, prev_v = 0, 0
    for r in rows:
        assert r["cum_tokens"] > prev_t  # every doc has >= 1 token
        assert r["vocab_size"] >= prev_v
        prev_t, prev_v = r["cum_tokens"], r["vocab_size"]
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    vocab = docs.select(F.explode(F.split("text", " "))).distinct().count()
    assert rows[-1]["cum_tokens"] == total_tokens
    assert rows[-1]["vocab_size"] == vocab


def test_triangle_count_matches_python_bruteforce(spark):
    from itertools import combinations

    from benchmark_spark.llm.graph import knn_edges, q_triangle_count

    edges = knn_edges(spark, SF_SMOKE).collect()
    und = {tuple(sorted((r["src"], r["dst"]))) for r in edges}
    adj: dict[int, set] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want: dict[int, int] = {}
    for u, v in und:
        for w in adj[u] & adj[v]:
            for node in (u, v, w):
                want[node] = want.get(node, 0) + 1
    # each triangle is seen once per edge (3x per member node)
    want = {n: c // 3 for n, c in want.items() if c}
    got = {r["node"]: r["n_tri"] for r in q_triangle_count(spark, SF_SMOKE).collect()}
    assert got == want
    assert sum(got.values()) % 3 == 0
    assert len(got) > 0


def test_chunking_covers_every_token_with_overlap(spark):
    from benchmark_spark.llm.text import q_chunk_documents

    chunks = q_chunk_documents(spark, SF_SMOKE).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_SMOKE, "documents", assert_schema=False)
        .select("doc_id", "text")
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        toks = docs[doc_id]
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        covered = 0
        for r in rows:
            start = r["chunk_idx"] * 24
            assert r["n_tokens"] == min(32, len(toks) - start)
            covered = max(covered, start + r["n_tokens"])
            if r["chunk_idx"] > 0:
                assert start < covered  # stride < size: overlap exists
        assert covered == len(toks)  # the tail is never dropped


def test_ann_recall_is_bounded_and_consistent(spark):
    from benchmark_spark.llm.similarity import q_ann_lsh, q_ann_recall

    rows = q_ann_recall(spark, SF_SMOKE).collect()
    assert [r["a_id"] for r in rows] == [0, 1, 2, 3, 4]
    ann = q_ann_lsh(spark, SF_SMOKE).collect()
    ann_by_anchor: dict[int, int] = {}
    for r in ann:
        ann_by_anchor[r["a_id"]] = ann_by_anchor.get(r["a_id"], 0) + 1
    for r in rows:
        assert r["n_exact"] == 3
        assert 0 <= r["n_hit"] <= min(3, ann_by_anchor.get(r["a_id"], 0))
        assert abs(r["recall"] - round(r["n_hit"] / 3, 4)) < 1e-3


def test_ppr_concentrates_mass_on_and_around_seeds(spark):
    from benchmark_spark.llm.graph import SEED_MOD, SEED_RESIDUE, q_ppr_seed_expand

    rows = q_ppr_seed_expand(spark, SF_SMOKE).collect()
    assert rows and all(r["rank_fp"] > 0 for r in rows)
    # the flag matches the seed-set definition row by row
    assert all(
        r["is_seed"] == int(r["vec_id"] % SEED_MOD == SEED_RESIDUE) for r in rows
    )
    # teleport restarts at seeds every round, so the top-ranked node is a seed
    assert rows[0]["is_seed"] == 1
    # expansion actually expands: non-seed neighbors carry rank too
    assert any(r["is_seed"] == 0 for r in rows)


def test_threshold_sweep_is_monotone_and_conserves_positives(spark):
    from benchmark_spark.llm.text import q_threshold_sweep

    rows = q_threshold_sweep(spark, SF_SMOKE).collect()
    assert [r["threshold_pct"] for r in rows] == list(range(10, 100, 10))
    # raising the cut never retrieves more: tp and recall non-increasing
    tps = [r["tp"] for r in rows]
    assert tps == sorted(tps, reverse=True)
    recalls = [r["recall_bp"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    # tp + fn is the (constant) positive population at every threshold
    assert len({r["tp"] + r["fn"] for r in rows}) == 1
    # the sweep covers both regimes: a keep-everything and a selective cut
    assert rows[0]["recall_bp"] == 10000
    assert rows[-1]["tp"] < rows[0]["tp"]


def test_cluster_sample_draws_full_quota_from_every_cluster(spark):
    from benchmark_spark.llm.similarity import (
        _CLUSTER_SAMPLE_QUOTA,
        _assign,
        kmeans_lite,
        q_cluster_sample,
    )

    rows = q_cluster_sample(spark, SF_SMOKE).collect()
    emb = load_table(spark, SF_SMOKE, "embeddings", assert_schema=False)
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    sizes = {
        r["cid"]: r["n"]
        for r in _assign(vecs, kmeans_lite(emb, k=10, iters=2))
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {}
    for r in rows:
        got.setdefault(r["cid"], []).append(r)
        assert r["cluster_size"] == sizes[r["cid"]]
    # every non-empty cluster contributes exactly min(quota, size) rows
    assert set(got) == set(sizes)
    for cid, members in got.items():
        assert len(members) == min(_CLUSTER_SAMPLE_QUOTA, sizes[cid])
        assert sorted(m["rk"] for m in members) == list(range(1, len(members) + 1))


def test_weighted_sample_is_biased_toward_high_weight_docs(spark):
    from benchmark_spark.llm.corpus import q_weighted_sample

    sample = q_weighted_sample(spark, SF_SMOKE)
    rows = sample.collect()
    assert len(rows) == 50
    keys = [r["aes_key"] for r in rows]
    assert keys == sorted(keys)  # smallest keys win
    assert all(0 < r["weight"] <= 1 for r in rows)
    # A-ES inclusion probability rises with weight: the sampled docs'
    # mean weight must exceed the corpus mean (deterministic draw, so
    # this is a fixed fact of the fixture, not a flaky expectation)
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    toks = F.split("text", " ")
    w = F.size(F.array_distinct(toks)) / F.size(toks)
    corpus_mean = docs.select(F.avg(w)).first()[0]
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_kl_novelty_is_nonnegative_and_zero_free_only_for_typical_docs(spark):
    from benchmark_spark.llm.corpus import q_kl_novelty

    rows = q_kl_novelty(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents", assert_schema=False)
    assert len(rows) == docs.count()
    # Gibbs' inequality: KL(doc || corpus) >= 0 (up to the 6dp snap)
    assert all(r["kl_nats"] >= -1e-4 for r in rows)
    # the corpus is not degenerate: scores spread, not constant
    vals = sorted(r["kl_nats"] for r in rows)
    assert vals[-1] > vals[0] + 0.1


def test_degree_oriented_triangles_equal_id_oriented(spark):
    from benchmark_spark.llm.graph import q_triangle_count, q_triangle_degree

    a = {r["node"]: r["n_tri"] for r in q_triangle_count(spark, SF_SMOKE).collect()}
    b = {r["node"]: r["n_tri"] for r in q_triangle_degree(spark, SF_SMOKE).collect()}
    assert a == b  # orientation changes enumeration order, never counts
    assert sum(a.values()) % 3 == 0  # each triangle counted at 3 nodes
