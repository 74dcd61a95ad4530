"""Deduplication operators for large-scale training-data pipelines.

Four families (BASELINE.json north star; SURVEY.md §2.10):
  * exact dedup          — full-row / content-hash distinct (oracle-checked)
  * n-gram Jaccard       — exact pairwise set similarity (oracle-checked)
  * MinHash + LSH        — near-dup at scale: shingle -> k minhashes ->
                           band -> bucket join -> verify candidates only
                           (oracle-checked end-to-end: md5-derived hashes
                           are bit-identical in DuckDB)
  * SimHash              — 60-bit signatures + Manku d<=3 banded
                           Hamming pairs (oracle-checked end-to-end)

The fixtures' 500 documents are all distinct (FIXTURES.md), so dup
and near-dup structure is CONSTRUCTED deterministically: the corpus
under test is documents UNION ALL a mutated copy (last token
dropped, doc_id offset by 1_000_000) — every original therefore has
exactly one planted near-duplicate, which tests assert is found.

Scale posture (the whole point of MinHash/SimHash): brute-force
pairwise Jaccard is O(n²) and dead at 100 TB. The LSH pipeline is
linear in corpus size: one explode over shingles, one groupBy for
signatures, one groupBy per band for buckets, and the quadratic
verify join runs only inside buckets (tiny by construction). All
stages are native Spark expressions — no Python boundary.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table, table_rows
from benchmark_spark.operators.aggregates import rnd, rnd_sql
from benchmark_spark.registry import register

# 16 minhashes banded 8x2: P(candidate) = 1-(1-j^2)^8 — 0.89 at
# jaccard 0.7, 0.985 at 0.8 (vs 0.57/0.88 for 4x4). Wider bands
# trade more false candidates (killed by the exact-Jaccard verify
# join) for near-dup recall, the right trade for dedup.
NUM_HASHES = 16
BANDS = 8
ROWS_PER_BAND = 2

_DOUBLED_SQL = "(SELECT * FROM documents UNION ALL SELECT * FROM documents)"


@register(
    "q_dedup_exact",
    oracle=f"SELECT DISTINCT doc_id, text, lang, source, n_chars FROM {_DOUBLED_SQL}",
    doc="Exact full-row dedup: DISTINCT over a corpus with every row duplicated (SURVEY.md §2.10 [Q:q_dedup_exact]). One hash-distinct shuffle; at 100 TB, dedup on a content hash instead of the full row (q_dedup_fingerprint).",
    tags=("extension", "dedup"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    return docs.unionByName(docs).distinct()


@register(
    "q_dedup_fingerprint",
    oracle=f"""
        SELECT md5(text) AS fp,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM {_DOUBLED_SQL}
        GROUP BY md5(text)
    """,
    doc=(
        "Content-hash dedup with deterministic survivor selection (keep MIN doc_id). "
        "The 100 TB form of exact dedup: shuffle a 16-byte fingerprint, not the document."
    ),
    tags=("extension", "dedup"),
)
def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    corpus = docs.unionByName(docs)
    return corpus.groupBy(F.md5(F.col("text").cast("binary")).alias("fp")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


@register(
    "q_jaccard_pairs",
    oracle="""
        WITH toks AS (
            SELECT DISTINCT doc_id, source,
                   unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents WHERE doc_id % 4 = 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS isect
            FROM toks a JOIN toks b
              ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT a_id, b_id,
               round(isect * 1.0 / (sa.n + sb.n - isect), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE isect * 1.0 / (sa.n + sb.n - isect) >= 0.8
    """,
    doc=(
        "Exact token-set Jaccard similarity for doc pairs, blocked by `source` "
        "(SURVEY.md §2.10 n-gram Jaccard). Blocking keeps the pair join from going "
        "quadratic over the corpus — the same trick scales to 100 TB only when the "
        "blocking key is selective; otherwise use q_dedup_minhash. The fixture is "
        "CAPPED to doc_id %% 4 = 3 (VERDICT r10 wrong #1, the q_apply_in_pandas "
        "precedent): this row is the quadratic PEDAGOGY twin of the registered "
        "linear replacement (q_dedup_minhash), so its gate cost should not scale "
        "with the demo corpus — the cap cuts the within-block pair join 16x."
    ),
    tags=("extension", "dedup"),
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False).filter(
        F.col("doc_id") % 4 == 3
    )
    toks = docs.select(
        "doc_id", "source", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).distinct()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("isect"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("isect") / (F.col("sa.n") + F.col("sb.n") - F.col("isect"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("a_id"))
        .join(sb, F.col("sb.doc_id") == F.col("b_id"))
        .filter(jac >= 0.8)
        .select("a_id", "b_id", F.round(jac, 4).alias("jaccard"))
    )


def doubled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a mutated copy (last token dropped, id offset):
    a deterministic corpus where every original has one planted near-dup."""
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    mutated = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1)))).alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    return docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(mutated)


def shingles(corpus: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (native, no UDF).

    Round 10: arrays_zip of n shifted slices -> posexplode ->
    concat_ws, instead of the interpreted transform(sequence, slice)
    HOF — same rewrite the r9 winnow sweep proved (concat_ws skips
    the nulls arrays_zip pads at doc end, reproducing the clamped
    slice exactly); the gram stage is whole-stage codegen and the
    final .distinct() subsumes the old array_distinct. Measured on
    the char-gram twin at sf0.1: 3.5 -> 2.1 s warm, identical rows."""
    toks = F.split("text", " ")
    length = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, off + 1, length) for off in range(n)])
    # repartition before the gram explode (round 16, guide §2.5): the
    # corpus fixture is ONE parquet row group, so the explode + gram
    # concat + map-side distinct fused into the scan ran as 1-2 tasks.
    spread = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    ex = spread.select("doc_id", F.explode(zipped).alias("g"))
    gram = F.concat_ws(" ", *[F.col("g")[str(i)] for i in range(n)])
    return ex.select("doc_id", gram.alias("shingle")).distinct()


# k-permutation MinHash via ONE base hash + k universal affine
# permutations: perm_i(s) = (a_i * base(s) + b_i) mod (2^31 - 1) —
# the same construction Spark MLlib's MinHashLSH uses. Round-7
# measurement replaced the previous 16-independent-hashes form: the
# per-shingle hash work was ~93% of the whole dedup pipeline, and
# deriving the permutations from one base cut the signature stage
# ~2.3x with bit-identical planted-pair output (SCALE.md item 17a).
# Constraints that make the affine form EXACT in both engines'
# 64-bit signed arithmetic: base < 2^32 (8 hex chars of md5), a,b <
# 2^31 => a*base + b < 2^63 (no overflow, no ANSI error), and the
# modulus wraps the product ~2^32 times (a modulus near the product's
# magnitude would leave every permutation monotone in the base —
# argmin identical across all k, LSH silently degenerate; caught in
# the round-7 spike).
PERM_P = (1 << 31) - 1  # Mersenne prime 2147483647


def perm_coeffs(num_hashes: int = NUM_HASHES) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, identical for the Spark exprs
    and the DuckDB oracle SQL (single source of truth): 31-bit values
    derived from md5 of the coefficient's name, a_i forced odd."""
    import hashlib

    def h31(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF

    return [((h31(f"a{i}") | 1), h31(f"b{i}")) for i in range(num_hashes)]


def perm_coeffs2(num_hashes: int = NUM_HASHES) -> list[tuple[int, int, int]]:
    """30-bit (a_i, b_i, c_i) triples for the TWO-BASE family (md5x2):
    sig_i = (a_i*hb1 + b_i*hb2 + c_i) mod p with 31-bit bases keeps
    every product under 2^61 and the sum under 2^62 — no BIGINT
    overflow. a_i forced odd (same reproducible md5-of-name derivation
    as perm_coeffs)."""
    import hashlib

    def h30(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) & 0x3FFFFFFF

    return [
        ((h30(f"a2{i}") | 1), h30(f"b2{i}") | 1, h30(f"c2{i}"))
        for i in range(num_hashes)
    ]


def minhash_signatures(
    sh: DataFrame, num_hashes: int = NUM_HASHES, hash_family: str = "md5"
) -> DataFrame:
    """k-permutation MinHash: sig_i = min over shingles of
    (a_i * base(shingle) + b_i) mod 2^31-1. Two base hashes, same
    permutations:

    * ``md5`` (default, the registered-query base): base(s) = the
      first 32 bits of md5(s) as a BIGINT. md5 (not xxhash64) so the
      ENTIRE pipeline is expressible identically in the DuckDB
      oracle — cross-engine hash-verified, not rows-only.
    * ``xxhash64`` (the alternative production base): hash_i(s) =
      xxhash64(i, s), k direct seeded hashes — measured FASTER than
      deriving from one xxhash64 base (the affine+pmod overhead
      exceeds the savings when the base hash is already cheap; A/B
      in SCALE.md), which is why the families are asymmetric:
      derive-from-one-base pays exactly when the base is expensive.
      Not oracle-expressible (DuckDB has no xxhash64), so it is a
      library path rather than a registered query; tests/test_llm.py
      pins planted-pair recall parity with the md5 family on the
      doubled corpus. Since the round-7 derivation rewrite the md5
      family ties it — the production default is now simply the
      registered md5 form.

    Either way: one groupBy, k min aggregates, all JVM-side LONG
    codegen. Downstream stages (banding, bucket join, exact-Jaccard
    verify) are family-agnostic — the verify step makes precision
    exact, so the family only moves candidate recall, which the LSH
    parameters (not the hash quality) dominate.

    Known tradeoff of the one-base md5 construction (ADVICE r7): the
    base is 32 bits and all 16 permutations are affine in it mod
    p=2^31-1, so two distinct shingles whose bases are congruent mod p
    collide on the ENTIRE signature — expected fully-indistinguishable
    shingle pairs ~ C(n,2)/p: ~0.5 at n=50k distinct shingles (sf0.1),
    a few hundred at n=1.5M (x200), ~2.3M at n=10^8. Precision is
    UNAFFECTED (exact-Jaccard verify rejects false candidates); the
    cost is a vanishing recall haircut — a colliding shingle pair
    makes two documents' signatures agree slightly more often than
    their true Jaccard warrants, which can only ADD candidates, and
    the only loss is the (collision-rate-sized) chance that a doc's
    true min-shingle is displaced consistently across a full band.
    The pre-r7 16-independent-60-bit-hash family had no such bound but
    cost 2.15x on the oracle-checked pipeline. The upgrade for corpora
    approaching ~10^8 distinct shingles is BUILT (round 9, VERDICT r8
    #8): ``md5x2`` derives a SECOND 31-bit base from md5 chars 9-16
    (same md5 call, different substring) and uses sig_i = (a_i*hb1 +
    b_i*hb2 + c_i) mod p with 30-bit coefficients (every term under
    2^61, sum under 2^62 — no BIGINT overflow); full-signature
    collisions then need BOTH bases congruent (~C(n,2)/p^2, negligible
    at any realistic n), at the cost of one extra multiply-add per
    shingle per permutation. Planted-pair output parity with the md5
    family is pinned in tests/test_llm.py and A/B'd at x200 in
    SCALE.md; still DuckDB-expressible (two substrings of one md5), so
    a registered query could adopt it without losing the oracle."""
    if hash_family == "md5":
        base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
        pre = sh.select("doc_id", base.alias("hb"))
        aggs = [
            F.min((F.lit(a) * F.col("hb") + F.lit(b)) % F.lit(PERM_P)).alias(f"h{i}")
            for i, (a, b) in enumerate(perm_coeffs(num_hashes))
        ]
        return pre.groupBy("doc_id").agg(*aggs)
    if hash_family == "md5x2":
        md = F.md5(F.col("shingle"))
        base1 = F.conv(F.substring(md, 1, 8), 16, 10).cast("long") % F.lit(0x80000000)
        base2 = F.conv(F.substring(md, 9, 8), 16, 10).cast("long") % F.lit(0x80000000)
        pre = sh.select("doc_id", base1.alias("hb1"), base2.alias("hb2"))
        aggs = [
            F.min(
                (F.lit(a) * F.col("hb1") + F.lit(b) * F.col("hb2") + F.lit(c))
                % F.lit(PERM_P)
            ).alias(f"h{i}")
            for i, (a, b, c) in enumerate(perm_coeffs2(num_hashes))
        ]
        return pre.groupBy("doc_id").agg(*aggs)
    if hash_family == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
        return sh.groupBy("doc_id").agg(*aggs)
    raise ValueError(f"unknown minhash hash_family: {hash_family!r}")


def lsh_candidates(
    sig: DataFrame, bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND
) -> DataFrame:
    """Band the signature, bucket-join within a band on the RAW row
    values (portable join key — no engine hash in the bucket id):
    only documents agreeing on a full band meet, so the quadratic
    step never sees the whole corpus."""
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            *[
                F.col(f"h{j * rows_per_band + r}").alias(f"r{r}")
                for r in range(rows_per_band)
            ],
        )
        for j in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id",
        F.col("b.band").alias("band"),
        *[F.col(f"b.r{r}").alias(f"r{r}") for r in range(rows_per_band)],
    )
    x = banded.alias("x")
    y = banded.alias("y")
    cond = (F.col("x.band") == F.col("y.band")) & (F.col("x.doc_id") < F.col("y.doc_id"))
    for r in range(rows_per_band):
        cond = cond & (F.col(f"x.r{r}") == F.col(f"y.r{r}"))
    return (
        x.join(y, cond)
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )


def verify_jaccard(sh: DataFrame, cand: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs via per-doc
    shingle-ARRAY intersection (round 6 scale fix): the previous
    cand -> sh(pa) -> sh(pb) join expanded every candidate pair by its
    shingle count (~1.3B intermediate rows at sf0.1's 6.5M candidates,
    which AQE coalesced into a near-single-task grind — measured ~25
    min for the char-gram tier). Collapsing the shingle table to one
    array row per doc makes verification two small-side joins (the doc
    lists broadcast at these sizes; at cluster scale they hash-join on
    doc_id) plus a map-side array_intersect per candidate — no
    pair x shingle expansion exists in the plan at all. Same output:
    pairs with exact shingle-Jaccard >= threshold, 4dp floor-rounded.
    (The DuckDB oracle counts the same intersections with a hash join
    since round 16 — set algebra identical, carrier per-engine.)

    The explicit repartition is load-bearing: the candidate set is
    byte-SMALL (6.5M pairs ~ 100 MB at sf0.1) but compute-HEAVY
    (~100 us of string-set intersection per pair), and AQE's
    size-based coalescing collapsed it to ONE partition — the whole
    verify ran in a single task (measured 627 s; 32-way it's ~20 s).
    Byte-based partition sizing is the wrong cost model whenever
    per-row CPU dominates; pin the fan-out by hand."""
    scored = candidate_overlap(sh, cand)
    jac = F.col("isect") / (F.col("na") + F.col("nb") - F.col("isect"))
    return scored.filter(jac >= threshold).select(
        "a_id", "b_id", rnd(jac, 4).alias("jaccard")
    )


def candidate_overlap(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact shingle-overlap counts (a_id, b_id, isect, na, nb) for a
    candidate pair set — the shared verification scaffolding behind
    verify_jaccard and q_dedup_containment; see verify_jaccard's
    docstring for why the array-collapse and the explicit repartition
    are both load-bearing."""
    lists = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shset"))
    la = lists.alias("la")
    lb = lists.alias("lb")
    width = cand.sparkSession.sparkContext.defaultParallelism
    return (
        cand.repartition(width, "a_id", "b_id")
        .join(la, F.col("la.doc_id") == F.col("a_id"))
        .join(lb, F.col("lb.doc_id") == F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("la.shset", "lb.shset")).alias("isect"),
            F.size("la.shset").alias("na"),
            F.size("lb.shset").alias("nb"),
        )
    )


# The oracle replays the ENTIRE pipeline in DuckDB: the md5-derived
# base hash is bit-identical across engines (32-bit hex prefix ->
# BIGINT) and the affine permutations are plain 64-bit integer
# arithmetic, so signatures, banding, candidate pairs, and the
# exact-Jaccard verdict all hash-match — a full cross-engine proof of
# an approximate-dedup pipeline, not a rows-only count.
_MINHASH_SIG_COLS = ",\n               ".join(
    f"MIN(({a} * hb + {b}) % {PERM_P}) AS h{i}"
    for i, (a, b) in enumerate(perm_coeffs(NUM_HASHES))
)
def _band_selects(bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND) -> str:
    return "\n        UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, "
        + ", ".join(f"h{rows_per_band * j + r} AS r{r}" for r in range(rows_per_band))
        + " FROM sigs"
        for j in range(bands)
    )
# CTE body + final select split so q_dedup_clusters can extend the
# same pipeline with a recursive connected-components closure, and
# parameterized over the shingle definition so the char-5-gram variant
# (q_chargram_minhash) reuses the identical signature/band/verify SQL.
#
# Round-6 rewrite (VERDICT.md r5 item 2 — the sf0.1 oracle failure):
# the original `inter` verified candidates by joining the shingle
# table to itself (cand -> pa -> pb ON pa.shingle = pb.shingle). At
# sf0.1, with no stats for CTE outputs, DuckDB's join-order optimizer
# built pa JOIN pb on the skewed shingle key FIRST — a frequency-
# squared blowup (>47 GB temp spill, never finished) even though the
# streamed cand->pa->pb order runs in ~10 s. The oracle now
# intersects per-doc shingle LISTS on the candidate pairs instead
# (len(list_intersect(la, lb)) with the set sizes folded in): no
# shingle-equality self-join exists in any order the optimizer can
# pick, so the plan is structurally immune to the blowup.
# Deliberately NO "AS MATERIALIZED" anywhere: DuckDB 1.0's
# materialized-CTE scans serialize the downstream intersect join
# (measured: same query >540 s with the fan-out CTEs materialized vs
# 206 s fully inlined at sf0.1, where the recomputed shingle
# explosion costs only ~3 s per extra reader).
_DOUBLED_CORPUS_SQL = """
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(list_slice(string_split(text, ' '), 1,
                   greatest(len(string_split(text, ' ')) - 1, 1)), ' ') AS text
        FROM documents
    """

# Snippet corpus: each doc's FIRST HALF planted as a separate document
# (doc_id + 1M) — containment(snippet, original) ~= 1.0 while Jaccard
# sits near 0.5, the doc-in-doc case a Jaccard threshold misses.
_SNIPPET_CORPUS_SQL = """
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(list_slice(string_split(text, ' '), 1,
                   greatest(CAST(ceil(len(string_split(text, ' ')) * 1.0 / 2)
                                 AS BIGINT), 3)), ' ') AS text
        FROM documents
    """


def _lsh_ctes(
    shingle_select: str,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    corpus_sql: str = _DOUBLED_CORPUS_SQL,
) -> str:
    # Verify-intersect shape (round 16): COUNT the matching shingles
    # with a three-way hash join (cand × sh × sh on the shingle
    # itself) instead of building per-doc shingle LISTS and running
    # list_intersect per candidate pair. Measured fresh at sf0.1:
    # char-gram oracle 6.4 -> 2.7 s (the list walk was ~10k compares
    # per pair x 140k pairs), word-gram unchanged at ~1.0 s; rows
    # identical. This also retires the round-14 40-bit shingle encode
    # — the hash join needs no integer carrier. sh stays DISTINCT, so
    # COUNT(*) per (a_id, b_id) IS |shingle-set intersection|; pairs
    # with an EMPTY intersection drop out of the inner join, which is
    # row-identical for every consumer because all of them filter on
    # a jaccard/containment threshold > 0 (isect >= 1 required).
    # Materialization matrix (re-measured round 16): sigs MATERIALIZED
    # is a pure win (one row per doc, 16 ints; recomputed through the
    # whole shingle+md5 pass by every reference otherwise); sh/cand
    # MATERIALIZED hurt (char-gram 2.7 -> 7.4 s with sh materialized —
    # the round-6 "inline the fan-out CTEs" warning still holds).
    return f"""corpus AS (
        {corpus_sql}
    ),
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            {shingle_select}
        )
    ),
    sigs AS MATERIALIZED (
        SELECT doc_id,
               {_MINHASH_SIG_COLS}
        FROM (
            SELECT doc_id,
                   CAST('0x' || substring(md5(shingle), 1, 8) AS BIGINT) AS hb
            FROM sh
        ) GROUP BY doc_id
    ),
    banded AS (
        {_band_selects(bands, rows_per_band)}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM banded x JOIN banded y
          ON x.band = y.band
         AND {" AND ".join(f"x.r{r} = y.r{r}" for r in range(rows_per_band))}
         AND x.doc_id < y.doc_id
    ),
    isect0 AS (
        SELECT c.a_id, c.b_id, COUNT(*) AS isect
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.a_id
        JOIN sh sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
        GROUP BY c.a_id, c.b_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT i.a_id, i.b_id, i.isect, za.n AS na, zb.n AS nb
        FROM isect0 i
        JOIN sizes za ON za.doc_id = i.a_id
        JOIN sizes zb ON zb.doc_id = i.b_id
    )"""


def _jaccard_final(threshold: float) -> str:
    # na/nb ride along inside `inter` (see _lsh_ctes: separate `sizes`
    # joins here put 5 relations back in the final select's optimizer
    # scope — the exact shape that cross-produced at sf0.1), so the
    # final pass is a pure scan + filter.
    return f"""
    SELECT a_id, b_id,
           {rnd_sql("isect * 1.0 / (na + nb - isect)", 4)} AS jaccard
    FROM inter
    WHERE isect * 1.0 / (na + nb - isect) >= {threshold}
"""


_WORD_SHINGLE_SELECT = """SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                       i -> array_to_string(
                           list_slice(string_split(text, ' '), i, i + 2), ' ')
                   ))) AS shingle
            FROM corpus"""

_MINHASH_CTES = _lsh_ctes(_WORD_SHINGLE_SELECT)

_MINHASH_FINAL = _jaccard_final(0.5)

_MINHASH_ORACLE = f"WITH {_MINHASH_CTES}{_MINHASH_FINAL}"

# Connected components over the verified minhash pairs. Round 12
# (VERDICT r11 #2): the round-2 oracle computed the min-reachable
# label through a RECURSIVE transitive-closure CTE — reach(node, lab)
# enumerates every (node, reachable node) pair, which is
# O(sum cluster_size^2) rows and re-scans sym every recursion step;
# at sf0.1 that was 80/73/61 s of ORACLE time for the three consumers
# (29% of the whole 730 s gate, GATE_sf01_r11.json) while their Spark
# sides finish in <1 s. The replacement below unrolls the SAME
# min-label-propagation + pointer-jumping schedule the Spark side runs
# (_cc_loop) as bounded MATERIALIZED CTEs — the Lloyd-unroll trick
# that cut the IVFPQ oracle 216 s -> 1.4 s (SCALE.md):
#   l0(v)   = MIN(dst) over sym edges (v, dst)      -- incl. self-loop
#   p_t(v)  = MIN(l_{t-1}(dst)) over edges (v, dst) -- propagate
#   l_t(v)  = LEAST(p_t(v), p_t(p_t(v)))            -- pointer jump
# Labels only decrease and always name a reachable node, so l_T is the
# min-reachable fixpoint for any graph of label-chain depth <= ~2^T
# (prop+jump at least doubles the horizon per round; T=6 covers
# diameter ~64, far beyond the planted corpus's pair/chain clusters).
# Convergence is NOT assumed: one extra propagation pass feeds
# error() — a fixture whose diameter ever exceeded the unroll would
# fail the gate loudly instead of hashing a wrong fixpoint.
# Result: identical labels -> identical query output (hash unchanged;
# re-proved against the recursive oracle at sf0.01 + sf0.1), oracle
# cost collapses to ~the pair pipeline itself.
_CC_UNROLL_T = 6


def _cc_labels_sql(unroll: int = _CC_UNROLL_T) -> str:
    """CTE chain from a `pairs(a_id, b_id)` CTE to `labels(node,
    cluster_id)` — the unrolled min-label + pointer-jump fixpoint."""
    parts = [
        "nodes AS (SELECT a_id AS doc_id FROM pairs UNION SELECT b_id FROM pairs)",
        """sym AS MATERIALIZED (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION SELECT b_id, a_id FROM pairs
        UNION SELECT doc_id, doc_id FROM nodes
    )""",
        "l0 AS MATERIALIZED (SELECT src AS node, MIN(dst) AS lab "
        "FROM sym GROUP BY src)",
    ]
    prev = "l0"
    for t in range(1, unroll + 1):
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT s.src AS node, MIN(l.lab) AS lab "
            f"FROM sym s JOIN {prev} l ON l.node = s.dst GROUP BY s.src)"
        )
        parts.append(
            f"l{t} AS MATERIALIZED (SELECT p.node, LEAST(p.lab, q.lab) AS lab "
            f"FROM p{t} p JOIN p{t} q ON q.node = p.lab)"
        )
        prev = f"l{t}"
    parts.append(
        "cc_unconverged AS (SELECT COUNT(*) AS n "
        f"FROM (SELECT s.src, MIN(l.lab) AS m FROM sym s "
        f"JOIN {prev} l ON l.node = s.dst GROUP BY s.src) x "
        f"JOIN {prev} f ON f.node = x.src WHERE x.m <> f.lab)"
    )
    parts.append(
        f"labels AS (SELECT node, CASE WHEN (SELECT n FROM cc_unconverged) = 0 "
        f"THEN lab ELSE error('connected-components oracle: unroll depth "
        f"{unroll} did not reach the fixpoint') END AS cluster_id FROM {prev})"
    )
    return ",\n    ".join(parts)


CC_LABELS_SQL = _cc_labels_sql()

_CLUSTERS_ORACLE = f"""
    WITH {_MINHASH_CTES},
    pairs AS MATERIALIZED ({_MINHASH_FINAL}),
    {CC_LABELS_SQL}
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           MIN(node) AS keep_id
    FROM labels GROUP BY cluster_id HAVING COUNT(*) >= 2
"""


@register(
    "q_dedup_minhash",
    oracle=_MINHASH_ORACLE,
    doc=(
        "MinHash+LSH near-dup detection over the planted-near-dup corpus: "
        "3-gram shingles -> one md5 base hash + 16 universal affine "
        "permutations (MLlib's MinHashLSH construction; round 7 cut the "
        "hash work ~16x) -> 8 bands x 2 rows -> bucket join -> exact-Jaccard "
        "verification of candidates only; emits pairs with verified "
        "shingle-Jaccard >= 0.5. The md5 base + integer permutations make "
        "every stage bit-identical in DuckDB, so the driver HASH-checks "
        "the whole approximate pipeline (upgraded from rows-only in round 2). "
        "tests/test_llm.py asserts every planted pair (doc, doc+1M) is "
        "recovered."
    ),
    tags=("extension", "dedup"),
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = doubled_corpus(spark, sf_dir)
    sh = shingles(corpus)
    sig = minhash_signatures(sh)
    cand = lsh_candidates(sig)
    # verify candidates with exact shingle Jaccard (array intersection
    # on candidate pairs only — see verify_jaccard)
    return verify_jaccard(sh, cand, 0.5)


def capped_lsh_candidates(
    sig: DataFrame,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    bucket_cap: int = 256,
) -> DataFrame:
    """lsh_candidates with a hard per-bucket occupancy cap — the
    "cap bucket size, secondary banding" relief valve SCALE.md's dedup
    row documents for boilerplate-heavy corpora.

    The plain bucket join is linear in corpus size only while bucket
    occupancy is O(1): a web-scale corpus has boilerplate crowds
    (license headers, navigation chrome, empty templates) whose
    members agree on every band, and ONE such bucket of a million
    docs is 10^12 pairs — the quadratic blowup comes back through the
    data, not the plan. Two-stage defense, all native expressions:

    1. *Secondary banding*: buckets over `bucket_cap` get their key
       extended with the next signature row (taken modulo the
       signature, so it always lies outside the band). Near-but-not-
       identical crowds split; true near-dups still collide with
       probability ~ their similarity, so recall degrades gracefully
       exactly where the corpus is densest.
    2. *Hard cap*: buckets STILL over the cap after extension are
       identical-signature crowds no hash can split — they are
       dropped from pair generation. That is a deliberate recall
       trade: members of such a crowd are mutual near-dups of some
       boilerplate; the downstream pipeline handles them by exact-
       hash dedup (q_dedup_exact) an order of magnitude cheaper than
       enumerating the crowd's O(cap^2) pairs per bucket.

    Pair cost is therefore bounded by cap^2/2 per surviving bucket —
    linear in bucket count, hence in corpus size, REGARDLESS of the
    duplicate structure of the data. With no oversized buckets the
    output is exactly lsh_candidates' (asserted by the registered
    twin's shared oracle and tests/test_llm.py).

    The cap is the ONLY defense that applies here, not merely the
    cheaper one: AQE skew-join splitting decides from INPUT partition
    bytes, and a crowded bucket is small on the way in — a 1,500-doc
    bucket is ~300 KB of banded rows, indistinguishable from its
    neighbors — while owing 1.1M pairs on the way out. Output
    multiplicity is invisible to AQE; we verified directly that the
    uncapped pair join over that hot bucket executes with no
    skew=true anywhere in its plan. Only a rule that reasons about
    occupancy (pairs ~ n^2), like this cap, can bound it.
    """
    num_hashes = bands * rows_per_band
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            *[
                F.col(f"h{j * rows_per_band + r}").alias(f"r{r}")
                for r in range(rows_per_band)
            ],
            # extension row: the next signature row after the band,
            # wrapped modulo the signature — never one of the band's
            # own rows, so it adds independent split power
            F.col(f"h{(j * rows_per_band + rows_per_band) % num_hashes}").alias("ext"),
        )
        for j in range(bands)
    ]
    key1 = ["band"] + [f"r{r}" for r in range(rows_per_band)]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id",
        F.col("b.band").alias("band"),
        *[F.col(f"b.r{r}").alias(f"r{r}") for r in range(rows_per_band)],
        F.col("b.ext").alias("ext"),
    )
    # stage 1: occupancy per raw bucket; oversized buckets switch to
    # the extended key (kext = ext), everyone else keeps kext = -1 so
    # small buckets are untouched. Occupancies are WINDOW counts, not
    # groupBy+join-back: each window is one shuffle on its bucket key
    # over the same stream, so the banded rows flow scan -> count1 ->
    # count2 -> filter without ever re-deriving the signature lineage
    # (the first cut used two count-then-join stages and tripled the
    # plan's exchange count, 10 -> 28; this form measures 13).
    from pyspark.sql import Window

    key2 = key1 + ["kext"]
    survivors = (
        banded.withColumn("_n1", F.count(F.lit(1)).over(Window.partitionBy(*key1)))
        .withColumn(
            "kext",
            F.when(F.col("_n1") > bucket_cap, F.col("ext")).otherwise(F.lit(-1)),
        )
        .withColumn("_n2", F.count(F.lit(1)).over(Window.partitionBy(*key2)))
        .filter(F.col("_n2") <= bucket_cap)
        .select("doc_id", *key2)
    )
    x = survivors.alias("x")
    y = survivors.alias("y")
    cond = F.col("x.doc_id") < F.col("y.doc_id")
    for c in key2:
        cond = cond & (F.col(f"x.{c}") == F.col(f"y.{c}"))
    return (
        x.join(y, cond)
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
    )


@register(
    "q_dedup_minhash_capped",
    oracle=_MINHASH_ORACLE,
    doc=(
        "q_dedup_minhash through capped_lsh_candidates (bucket_cap=256, "
        "secondary banding + boilerplate-bucket drop): on this corpus no "
        "bucket exceeds the cap, so the output must EQUAL the uncapped "
        "pipeline's — the shared oracle hash-checks that the capping "
        "machinery is a no-op exactly when it should be. The capping "
        "behavior itself (split, drop, bounded pair count) is pinned on "
        "planted boilerplate in tests/test_llm.py."
    ),
    tags=("extension", "dedup"),
)
def q_dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = doubled_corpus(spark, sf_dir)
    sh = shingles(corpus)
    sig = minhash_signatures(sh)
    cand = capped_lsh_candidates(sig)
    return verify_jaccard(sh, cand, 0.5)


# DuckDB replay of the whole SimHash pipeline: the 60-bit token hash
# is the same md5 prefix trick as the minhash oracle, and every later
# stage (votes, sign, banding, Hamming) is integer arithmetic both
# engines evaluate identically.
_SIMHASH_BAND_SELECTS = "\n        UNION ALL ".join(
    f"SELECT doc_id, simhash, {i} AS band,"
    f" (simhash >> {15 * i}) & 32767 AS band_val FROM sigs"
    for i in range(4)
)
_SIMHASH_ORACLE = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(list_slice(string_split(text, ' '), 1,
                   greatest(len(string_split(text, ' ')) - 1, 1)), ' ') AS text
        FROM documents
    ),
    toks AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM corpus
    ),
    votes AS (
        SELECT doc_id, b.bit,
               ((CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) >> b.bit) & 1)
                 * 2 - 1 AS vote
        FROM toks, (SELECT unnest(range(0, 60)) AS bit) b
    ),
    sigs AS (
        SELECT doc_id,
               SUM(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
                 AS simhash
        FROM (SELECT doc_id, bit, SUM(vote) AS v FROM votes GROUP BY doc_id, bit)
        GROUP BY doc_id
    ),
    banded AS (
        {_SIMHASH_BAND_SELECTS}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
               x.simhash AS sig_a, y.simhash AS sig_b
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.band_val = y.band_val
         AND x.doc_id < y.doc_id
    )
    SELECT a_id, b_id, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= 3
"""


@register(
    "q_dedup_simhash",
    oracle=_SIMHASH_ORACLE,
    doc=(
        "SimHash near-dup: 60-bit signature per doc (sign of per-bit vote over "
        "md5-derived token hashes), candidate pairs blocked on SIGNATURE BANDS "
        "(Manku-style block permutation): the 60 bits split into 4 disjoint "
        "15-bit bands; any pair at Hamming distance <= 3 flips bits in at most "
        "3 bands, so by pigeonhole it collides on at least one band — EXACT "
        "recall at the emit threshold (3), with the join touching only "
        "same-band-value buckets rather than all pairs in a `source` block "
        "(the round-1 blocking, quadratic when source cardinality is low). "
        "Emits (a_id, b_id, hamming) for distance <= 3; the md5 hash base "
        "makes the pipeline bit-identical in DuckDB, so the driver HASH-checks "
        "it end-to-end (upgraded from rows-only in round 2). tests/test_llm.py "
        "asserts the planted near-dups land within threshold. At 100 TB: hot "
        "buckets (boilerplate-heavy corpora) skew the band join — AQE "
        "skew-join handles moderate skew; beyond that, widen bands and add "
        "rotated-signature probes (multi-probe) to keep buckets selective."
    ),
    tags=("extension", "dedup"),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition before the token explode (round 16, guide §2.5): the
    # documents fixture is ONE parquet row group, so the explode + md5
    # + 61-column partial aggregation fused into the scan stage ran as
    # a single task; round-robin over default parallelism spreads it.
    corpus = doubled_corpus(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = corpus.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    # Round 8 (the q8_knn lesson applied): the signature stage used to
    # posexplode every (doc, token) row into 60 (bit, vote) rows and
    # shuffle them through groupBy(doc_id, bit) — a 60x row blowup
    # (~120M shuffled rows at sf0.1; measured 62 s Spark-side in
    # GATE_sf01_r08 cold). Same votes, WIDE instead of TALL: one
    # groupBy(doc_id) with 60 conditional-sum columns (ones_b = count
    # of tokens with bit b set) — single shuffle of 61-column partials,
    # zero row multiplication, whole-stage codegen. Bit b is set in the
    # signature iff vote v = ones_b - (n - ones_b) >= 0, i.e.
    # 2*ones_b >= n — exact integer arithmetic, so signatures are
    # bit-identical to the tall form and the oracle is unchanged
    # (hash-green at sf0.01 after the swap). Measured end-to-end at
    # sf0.1: 10.2 s vs the tall form's 62.3 s in the same-round gate
    # (~6x); at corpus scale the win grows — the shuffle shrinks from
    # 60 rows per (doc, token) to one 61-column partial per doc.
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    per_tok = toks.select("doc_id", h.alias("h"))
    ones = [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"o{b}")
        for b in range(60)
    ]
    wide = per_tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *ones)
    sig_bits = [
        F.when(2 * F.col(f"o{b}") >= F.col("n"), F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(60)
    ]
    sigs = wide.select(
        "doc_id", reduce(operator.add, sig_bits).alias("simhash")
    )
    # 4 disjoint 15-bit bands over the 60-bit signature (Manku-style
    # d=3 blocking: 4 blocks, any pair at Hamming <= 3 shares >= 1).
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr("transform(sequence(0, 3), i -> shiftright(simhash, i * 15) & 32767)")
        ).alias("band", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    # First-band accounting (round 16, the lsh_undirected_pairs trick):
    # a pair colliding in several bands used to be deduplicated by
    # shuffling the whole quadratic pair set through `.distinct()`.
    # Every band value is a pure function of the carried signature
    # (band i = shiftright(simhash, i*15) & 32767), so each pair is
    # instead emitted ONLY in the first band where the two signatures
    # agree — a codegen'd OR-chain over the earlier bands suppresses
    # later duplicates and the join output IS the distinct pair set.
    earlier = None
    for i in range(3):
        clash = (F.col("a.band") > i) & (
            F.shiftright(F.col("a.simhash"), i * 15).bitwiseAND(F.lit(32767))
            == F.shiftright(F.col("b.simhash"), i * 15).bitwiseAND(F.lit(32767))
        )
        earlier = clash if earlier is None else (earlier | clash)
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & ~earlier,
    ).select(
        F.col("a.doc_id").alias("a_id"),
        F.col("b.doc_id").alias("b_id"),
        F.col("a.simhash").alias("sig_a"),
        F.col("b.simhash").alias("sig_b"),
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    # eager checkpoint (round 15): the gate's level-2 dtype-mimic
    # re-materializes the result; shuffle reuse skips the map stages
    # but the band self-join + distinct + filter final stage re-ran in
    # full (~2.7 s at sf0.1) — materialize once, serve both passes.
    return cand.filter(hamming <= 3).select(
        "a_id", "b_id", hamming.cast("long").alias("hamming")
    ).localCheckpoint(eager=True)


def connected_components(
    edges: DataFrame, max_iters: int = 10
) -> DataFrame:
    """Connected components by min-label propagation WITH pointer
    jumping: each round a node adopts (a) the smallest label among its
    neighbors, then (b) its own label's label (path halving). Returns
    (doc_id, cluster_id) where cluster_id = min doc_id in the component.

    This is the standard large-graph CC (Pregel-style supersteps as
    driver-coordinated join rounds — the one sanctioned driver loop in
    the engine, because iterative algorithms ARE supersteps). The jump
    step is what makes convergence O(log(diameter)) rounds instead of
    O(diameter) for plain propagation: labels hop 2^k edges after k
    rounds, so even chain-shaped clusters (the worst case for dedup
    graphs; tests/test_round5.py plants a 16-node path) resolve in a
    handful of rounds. Each round is one checkpointed job (neighbor-min
    agg + label-of-label self-join) plus a scan-only convergence probe
    over the checkpointed result; localCheckpoint cuts lineage per
    superstep. If the label assignment still changes after
    ``max_iters`` rounds the function RAISES — unconverged labels split
    one true cluster into several, a silent correctness bug in a dedup
    pipeline, never an acceptable partial answer.
    """
    # One-pass input materialization (round 16, second cut): the loop
    # state is exactly ONE table — the symmetric edge list with a
    # self-loop per node (self-loops keep singletons stable AND make
    # the src set the node set, so the initial labels need no separate
    # nodes frame). Exploding each input pair into its four incidences
    # ((a,b),(b,a),(a,a),(b,b)) and running ONE distinct replaces the
    # old nodes-distinct + 3-way-union + distinct chain (two chained
    # shuffles, plus an un-checkpointed `nodes` that round 0's plan
    # recomputed) — and the upstream LSH verify pipeline now executes
    # exactly once, inside this job, so the separate edges checkpoint
    # is gone too. Measured (sf0.1, warm): setup 1.0 -> 0.44 s and
    # round 0 1.87 -> 0.65 s; CC after the edge pipeline 3.8 -> 1.5 s.
    # Edge lists are O(pairs) rows of two longs.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("a_id").alias("src"), F.col("b_id").alias("dst")),
                    F.struct(F.col("b_id").alias("src"), F.col("a_id").alias("dst")),
                    F.struct(F.col("a_id").alias("src"), F.col("a_id").alias("dst")),
                    F.struct(F.col("b_id").alias("src"), F.col("b_id").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Labels/edges are CORPUS-SIZED: broadcasting them is wrong at any
    # real scale, and letting AQE try piles one driver-held broadcast
    # per superstep until the driver OOMs (measured at 30x sf0.1 by
    # tools/scale_curve.py — 8 broadcast-build failures, round 5).
    # Pin every CC-internal join to shuffle plans for the loop's
    # duration; safe to restore after because each round materializes
    # eagerly (localCheckpoint) inside the loop, so nothing built here
    # executes after the conf flips back.
    conf = edges.sparkSession.conf
    _BCAST_KEYS = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {}
    for k in _BCAST_KEYS:
        try:
            saved[k] = conf.get(k)
        except Exception:  # noqa: BLE001 - unset key
            saved[k] = None
        conf.set(k, "-1")
    try:
        return _cc_loop(sym, max_iters)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def _cc_loop(sym: DataFrame, max_iters: int) -> DataFrame:
    # initial labels: self-loops make sym's diagonal the node set
    labels = sym.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("doc_id"), F.col("src").alias("cluster_id")
    )
    for _ in range(max_iters):
        # (a) candidate label per node: min over neighbors' current labels
        prop = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("new_id"))
        )
        merged = (
            labels.join(prop, labels.doc_id == prop.src)
            .select(
                "doc_id",
                F.col("cluster_id").alias("old_id"),
                F.least(F.col("cluster_id"), F.col("new_id")).alias("cluster_id"),
            )
        )
        # (b) pointer jump: follow my label's label. Labels are node
        # ids, so the lookup is a self-join; left + coalesce keeps
        # nodes whose label has no own row (cannot happen here, but
        # cheap insurance) on their current label.
        lut = merged.select(
            F.col("doc_id").alias("lab_id"), F.col("cluster_id").alias("lab_lab")
        )
        jumped = (
            merged.join(lut, merged.cluster_id == lut.lab_id, "left")
            .select(
                "doc_id",
                "old_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("lab_lab"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # checkpoint FIRST (cut lineage per superstep), then probe
        # convergence on the materialized result — otherwise the whole
        # superstep plan executes twice per round. The round-start
        # label rides along as old_id, so the probe is a filter over
        # the checkpointed RDD instead of a join against the previous
        # round (round 16: the probe was ~0.7 s of the 1.87 s round).
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (
            new_labels.filter(F.col("cluster_id") != F.col("old_id")).limit(1).count()
        )
        labels = new_labels.select("doc_id", "cluster_id")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_iters} rounds; "
        "raise max_iters (rounds needed ~ log2(graph diameter))"
    )


@register(
    "q_dedup_clusters",
    oracle=_CLUSTERS_ORACLE,
    doc=(
        "Near-dup CLUSTERING: MinHash+LSH pairs -> connected components "
        "(iterative min-label propagation, Pregel-style supersteps) -> one "
        "row per cluster with the kept representative (min doc_id) and size. "
        "The step that turns pairwise near-dup hits into actual dedup decisions "
        "in a training-data pipeline; planted pairs make every original+mutant "
        "pair share a cluster (tests/test_llm.py). The oracle reaches the same "
        "fixpoint with a recursive transitive-closure CTE over the (already "
        "hash-verified) pair pipeline, so even this iterative operator is "
        "hash-checked (upgraded from rows-only in round 2)."
    ),
    tags=("extension", "dedup"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q_dedup_minhash(spark, sf_dir).select("a_id", "b_id")
    labels = connected_components(pairs)
    return (
        labels.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("cluster_size") >= 2)
    )


@register(
    "q_jaccard_chargram",
    oracle="""
        WITH grams AS (
            SELECT DISTINCT doc_id, source,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(length(text) - 4, 1) + 1),
                       i -> substring(text, CAST(i AS INT), 5)))) AS g
            FROM documents WHERE doc_id % 4 = 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS isect
            FROM grams a JOIN grams b
              ON a.g = b.g AND a.source = b.source AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT a_id, b_id,
               (floor(isect * 1.0 / (sa.n + sb.n - isect) * 10000 + 0.5) / 10000)
                 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE isect * 1.0 / (sa.n + sb.n - isect) >= 0.6
    """,
    doc=(
        "CHARACTER 5-gram Jaccard near-dup pairs, blocked by `source` — the "
        "char-level complement of the token-set q_jaccard_pairs (robust to "
        "tokenization differences; standard for code/CJK-ish text where word "
        "boundaries lie). Same scale posture: the pair join runs only inside "
        "blocks; at corpus scale swap the block for MinHash banding over the "
        "same 5-gram shingles (q_chargram_minhash, the registered linear "
        "replacement). Fixture CAPPED to doc_id %% 4 = 3 (VERDICT r10 wrong "
        "#1): the quadratic demo twin should not dominate the gate."
    ),
    tags=("extension", "dedup"),
)
def q_jaccard_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False).filter(
        F.col("doc_id") % 4 == 3
    )
    # codegen n-gram shape (round 10, same as char_shingles): measured
    # 9.9 -> 2.9 s cold / 3.5 -> 2.1 s warm for the gram stage at sf0.1
    chars = F.split(F.col("text"), "")
    length = F.greatest(F.size(chars) - 4, F.lit(1))
    zipped = F.arrays_zip(*[F.slice(chars, off + 1, length) for off in range(5)])
    ex = docs.select("doc_id", "source", F.explode(zipped).alias("g"))
    gram = F.concat_ws("", *[F.col("g")[str(i)] for i in range(5)])
    # Pair generation by INVERTED LISTS, not a gram self-join (round
    # 13, VERDICT r12 #3 — the third ≤3 s ask): collect_set builds
    # each (source, gram) posting straight from the doc-local rows
    # (dedup folded into the one exchange — no separate distinct
    # pass), sort it, and emit the C(k,2) ordered pairs with a
    # codegen nested-transform; per-doc sizes fall out of the same
    # checkpointed posting table by re-exploding it. Identical pair
    # multiset and sizes (each shared gram contributes exactly one
    # (a<b) hit; |postings containing d| = |distinct grams of d|), so
    # isect, jaccard, and the hash are unchanged vs the r12 self-join
    # form. The posting table is checkpointed (two consumers in one
    # plan) and the 2-ROW RESULT is checkpointed eagerly, so the
    # whole pipeline executes exactly ONCE per query call — the
    # gate's collect and dtype-mimic both read the materialized
    # rows instead of re-running the pipeline (measured single-shot
    # at sf0.1: 5.7 -> ~4 s end-to-end; steady-state warm ~1.8 s vs
    # 3.0 s for the r12 self-join). A pathological hot gram still
    # costs |list|^2 either way — the LSH twin (q_chargram_minhash)
    # is the corpus-scale answer, this is the exact small-block
    # verifier.
    ds = (
        ex.select("doc_id", "source", gram.alias("g"))
        .repartition(16, "source", "g")
        .groupBy("source", "g")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .localCheckpoint(eager=True)
    )
    sizes = (
        ds.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        ds.filter(F.size("ds") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ds",
                        lambda x, i: F.transform(
                            F.slice("ds", i + 2, F.size("ds")),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a_id"), F.col("p.b").alias("b_id"))
    )
    inter = pairs.groupBy("a_id", "b_id").agg(F.count(F.lit(1)).alias("isect"))
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    # Broadcast the per-doc sizes only while they are broadcast-SIZED
    # (ADVICE r13: sizes is one row per document, so an unconditional
    # hint grows linearly with the corpus and trades the shuffle
    # join's scalability for driver/executor memory pressure). The
    # gate reads the fixture's parquet FOOTER row count (ADVICE r14:
    # the old docs.count() was an extra scheduled action per plan
    # build — the same per-action floor the probe path removes via
    # footers) — an upper bound on sizes' rows; past the bound the
    # two joins degrade to shuffle joins on the pair keys, the plan
    # that scaled before the r13 hint. 1M (doc_id, n) rows ~= 16 MB.
    if table_rows(sf_dir, "documents") <= 1_000_000:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    jac = F.col("isect") / (F.col("sa.n") + F.col("sb.n") - F.col("isect"))
    out = (
        inter.join(sa, F.col("sa.doc_id") == F.col("a_id"))
        .join(sb, F.col("sb.doc_id") == F.col("b_id"))
        .filter(jac >= 0.6)
        .select("a_id", "b_id", rnd(jac, 4).alias("jaccard"))
    )
    return out.localCheckpoint(eager=True)


def char_shingles(corpus: DataFrame, n: int = 5) -> DataFrame:
    """Distinct character n-gram shingles per document (native, no UDF).

    Same codegen n-gram shape as shingles() (round 10): split to a
    char array, arrays_zip n shifted slices, explode, concat_ws —
    null-skipping concat reproduces substring's clamp at doc end.
    Measured at sf0.1: 3.5 -> 2.1 s warm, identical 1,021,477 rows."""
    chars = F.split(F.col("text"), "")
    length = F.greatest(F.size(chars) - (n - 1), F.lit(1))
    zipped = F.arrays_zip(*[F.slice(chars, off + 1, length) for off in range(n)])
    # repartition before the gram explode (round 16, guide §2.5): same
    # single-row-group-scan spread as shingles() above.
    spread = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    ex = spread.select("doc_id", F.explode(zipped).alias("g"))
    gram = F.concat_ws("", *[F.col("g")[str(i)] for i in range(n)])
    return ex.select("doc_id", gram.alias("shingle")).distinct()


_CHARGRAM_SHINGLE_SELECT = """SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(length(text) - 4, 1) + 1),
                       i -> substring(text, CAST(i AS INT), 5)))) AS shingle
            FROM corpus"""

# Char-gram banding runs at 4 bands x 4 rows, NOT the word-gram 8x2
# (round 8): char 5-grams of natural-language docs overlap heavily, so
# the 8x2 threshold (~(1/8)^(1/2) = 0.35) admitted nearly everything —
# 6.86M candidate pairs from 10k docs at sf0.1, 42 s of exact-Jaccard
# verify, and a candidate count that grows ~quadratically with corpus
# size (the thing LSH exists to prevent). 4x4 puts the S-curve
# threshold at (1/4)^(1/4) = 0.71, right above the 0.6 verify bar.
# Measured at sf0.1: candidates 6.86M -> 140,451 (49x), end-to-end
# 48.4 s -> 9.5 s (5x), planted-pair recall 4996/5000 (99.92% — the
# four misses are short docs whose mutant char-gram j sits near the
# threshold; every planted pair at the sf0.001 test fixture is
# recovered, deterministic md5 hashes, pinned in tests/test_round5.py).
# Pairs with 0.6 <= j < ~0.7 now surface with the S-curve probability
# instead of near-certainty — the standard LSH operating-point trade,
# shared bit-identically by the oracle.
CHARGRAM_BANDS = 4
CHARGRAM_ROWS_PER_BAND = 4

# The round-14 40-bit shingle encode (an integer carrier for
# list_intersect) is retired: the round-16 verify counts matches with
# a hash join on the shingle itself (see _lsh_ctes), so no injective
# encode — and no latin-1 precondition guard — is needed anymore.
_CHARGRAM_MINHASH_ORACLE = (
    f"WITH {_lsh_ctes(_CHARGRAM_SHINGLE_SELECT, CHARGRAM_BANDS, CHARGRAM_ROWS_PER_BAND)}"
    f"{_jaccard_final(0.6)}"
)


@register(
    "q_chargram_minhash",
    oracle=_CHARGRAM_MINHASH_ORACLE,
    doc=(
        "The SCALE-SAFE form of q_jaccard_chargram: character 5-gram "
        "shingles -> 16-minhash LSH at the 4x4 banding operating point "
        "(S-curve threshold 0.71; see CHARGRAM_BANDS note — the word-gram "
        "8x2 banding admitted 6.86M candidates from 10k docs because char "
        "grams overlap heavily) -> exact char-gram Jaccard verification of "
        "candidates only (threshold 0.6), over the planted-near-dup corpus. "
        "Replaces q_jaccard_chargram's `source`-blocked pair join (quadratic "
        "within a block, dead when block cardinality is low) with banding "
        "that is linear in corpus size — the swap its docstring promises for "
        "100 TB. The md5 base + integer affine permutations keep every stage "
        "bit-identical in DuckDB, so the driver hash-checks the whole banded "
        "pipeline."
    ),
    tags=("extension", "dedup"),
)
def q_chargram_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = doubled_corpus(spark, sf_dir)
    sh = char_shingles(corpus)
    sig = minhash_signatures(sh)
    cand = lsh_candidates(sig, CHARGRAM_BANDS, CHARGRAM_ROWS_PER_BAND)
    # eager checkpoint (round 16, the q_jaccard_chargram precedent):
    # the exact-verify stage runs ~1000 string-set intersections per
    # candidate pair — the char-gram lists are ~10x the word-gram ones
    # — and the gate's level-2 dtype mimic re-ran that final stage in
    # full (~3 s); the 6 k result rows materialize once, both passes
    # read them. Word-gram verify stays lazy (its re-run is ~0.1 s).
    return verify_jaccard(sh, cand, 0.6).localCheckpoint(eager=True)


# Repeated n-gram SPAN detection (round 11): the fixed-width-window
# approximation of exact substring deduplication (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better" — the
# suffix-array pass production pipelines run to excise verbatim
# repeated spans). A position's 8-token window is "duplicated" when
# the same 8-gram occurs in >= 2 DISTINCT documents; the per-document
# duplicated-position fraction is the excision signal.
_SPAN_N = 8


@register(
    "q_ngram_span_dedup",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT doc_id, array_to_string(t[k + 1:k + {_SPAN_N}], ' ') AS g
            FROM tok,
                 unnest(range(0, greatest(len(t) - {_SPAN_N - 1}, 0))) AS r(k)
        ),
        dup AS (
            SELECT g FROM grams GROUP BY g
            HAVING COUNT(DISTINCT doc_id) >= 2
        ),
        agg AS (
            SELECT doc_id, COUNT(*) AS n_grams,
                   SUM(CASE WHEN g IN (SELECT g FROM dup)
                            THEN 1 ELSE 0 END) AS n_dup
            FROM grams GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(n_dup AS BIGINT) AS n_dup,
               {rnd_sql('n_dup * 1.0 / n_grams', 4)} AS frac_dup,
               CAST(CASE WHEN n_dup * 1.0 / n_grams > 0.5
                         THEN 1 ELSE 0 END AS BIGINT) AS heavy
        FROM agg
    """,
    doc=(
        "Repeated 8-gram span detection (round 11) — the fixed-window "
        "form of exact-substring dedup (Lee et al. 2022): every token "
        "position opens an 8-gram window, a window is DUPLICATED when "
        "its 8-gram occurs in >= 2 distinct documents, and each doc "
        "reports its duplicated-position fraction (the signal used to "
        "excise verbatim repeated spans from a training corpus). "
        "Plan: the codegen shifted-slices n-gram shape (no HOFs), "
        "positions keyed by md5(gram) — at 100 TB the shuffle carries "
        "16-byte fingerprints instead of 8-token strings, the dup-gram "
        "side is aggregated BEFORE the join back (distinct-doc count "
        "per gram, map-side partial), and hot grams (boilerplate) are "
        "the classic skew case AQE's skew-join handles. The oracle "
        "groups raw grams; md5 collisions are absent at fixture scale "
        "and the emitted columns are per-doc counts, not hashes."
    ),
    tags=("extension", "dedup"),
)
def q_ngram_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    width = F.size(toks) - (_SPAN_N - 1)  # full windows only
    zipped = F.arrays_zip(
        *[F.slice(toks, off + 1, F.greatest(width, F.lit(0))) for off in range(_SPAN_N)]
    )
    gram = F.concat_ws(" ", *[F.col("g")[str(i)] for i in range(_SPAN_N)])
    grams = docs.select("doc_id", F.explode(zipped).alias("g")).select(
        "doc_id", F.md5(gram.cast("binary")).alias("h")
    )
    dup = (
        grams.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("d"))
    )
    agg = (
        grams.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("d"), F.lit(0))).alias("n_dup"),
        )
    )
    frac = F.col("n_dup") / F.col("n_grams")
    return agg.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_dup").cast("long").alias("n_dup"),
        rnd(frac, 4).alias("frac_dup"),
        (frac > 0.5).cast("long").alias("heavy"),
    )


# --- Containment dedup (round 11) -------------------------------------
_CONTAINMENT_TAU = 0.9  # max-direction containment cut
_CONTAINMENT_ORACLE = f"""WITH {_lsh_ctes(_WORD_SHINGLE_SELECT,
                                          corpus_sql=_SNIPPET_CORPUS_SQL)}
    SELECT a_id, b_id,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(isect AS BIGINT) AS n_common,
           {rnd_sql("isect * 1.0 / (na + nb - isect)", 4)} AS jaccard,
           {rnd_sql("isect * 1.0 / least(na, nb)", 4)} AS containment,
           CAST(CASE WHEN isect * 1.0 / (na + nb - isect) < 0.5
                     THEN 1 ELSE 0 END AS BIGINT) AS jaccard_missed
    FROM inter
    WHERE isect * 1.0 / least(na, nb) >= {_CONTAINMENT_TAU}
"""


def snippet_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a FIRST-HALF snippet copy of each (id offset 1M):
    a planted doc-in-doc corpus where the snippet's shingles are
    (almost) all contained in its source, but Jaccard hovers near the
    0.5 threshold — the asymmetric case containment dedup exists for."""
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    half = F.greatest(F.ceil(F.size(toks) * 1.0 / 2).cast("int"), F.lit(3))
    snippets = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, half)).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        snippets
    )


@register(
    "q_dedup_containment",
    oracle=_CONTAINMENT_ORACLE,
    doc=(
        "CONTAINMENT DEDUP (round 11) — the doc-in-doc detector: "
        "Jaccard treats a snippet quoted inside a larger document as "
        "DISSIMILAR (|A intersect B| / |A union B| shrinks with the "
        "size gap), so symmetric near-dup passes keep exactly the "
        "redundant fragments a containment cut C = |A intersect B| / "
        "min(|A|, |B|) >= 0.9 catches. The planted corpus makes the "
        "asymmetry measurable: each doc's first half rides along as "
        "its own document, giving C ~= 1.0 at Jaccard ~= 0.5 — the "
        "jaccard_missed output column counts the pairs a 0.5 Jaccard "
        "threshold would have kept. Same scale shape as "
        "q_dedup_minhash (one shingle pass, 16 affine signatures, "
        "8x2 band bucket join, exact array-intersect verify on "
        "candidates only) — candidate RECALL is still governed by "
        "the Jaccard-tuned bands (P ~ 1-(1-J^2)^8 ~ 0.87 at J=0.47), "
        "which is the documented production caveat: containment-"
        "oriented LSH re-bands against the SMALLER set's signature "
        "(or uses q_chargram_minhash's char grams) when snippets "
        "shrink further. All comparisons are integer counts and "
        "4dp floor-snapped ratios; the oracle replays the entire "
        "pipeline including the planted-snippet corpus."
    ),
    tags=("extension", "dedup"),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = snippet_corpus(spark, sf_dir)
    sh = shingles(corpus)
    sig = minhash_signatures(sh)
    cand = lsh_candidates(sig)
    scored = candidate_overlap(sh, cand)  # shared verify scaffolding
    isect, na, nb = F.col("isect"), F.col("na"), F.col("nb")
    return (
        scored
        # filter on the RAW ratio exactly like the oracle's WHERE —
        # cutting on the rounded column would flip pairs whose raw
        # containment rounds up across the threshold
        .where(isect * 1.0 / F.least(na, nb) >= _CONTAINMENT_TAU)
        .select(
            "a_id",
            "b_id",
            na.cast("long").alias("n_a"),
            nb.cast("long").alias("n_b"),
            isect.cast("long").alias("n_common"),
            rnd(isect * 1.0 / (na + nb - isect), 4).alias("jaccard"),
            rnd(isect * 1.0 / F.least(na, nb), 4).alias("containment"),
            (isect * 1.0 / (na + nb - isect) < 0.5).cast("long").alias("jaccard_missed"),
        )
    )
