"""Corpus sampling, language-model scoring, and leakage-safe splits
(north-star LLM-pipeline extensions; SURVEY.md §2.10 E-tier).

These operators close the loop from "detect duplicates / score
quality" (llm/dedup.py, llm/text.py) to the decisions a 100 TB
training-data build actually ships: which rows enter the sample,
which copy of a near-dup group survives, and how train/val/test are
split WITHOUT leaking near-duplicates across the boundary.

Determinism discipline (shared with the rest of the tier): every
sampling decision is a pure function of a KEY through md5 —
reproducible across runs, engines, partitionings, and corpus growth —
never rand(). Every float that reaches the driver hash is an exact
fixed-point sum (dsum) or a floor-form 6dp snap (rnd), both with
DuckDB twins, so all six queries here are full hash-checks.

Scale posture per operator is in each docstring; the common shape is
one corpus scan -> narrow per-doc work -> at most one shuffle on a
well-distributed key (source / lang / cluster rep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.llm.dedup import (
    _MINHASH_CTES,
    _MINHASH_FINAL,
    CC_LABELS_SQL,
    connected_components,
    doubled_corpus,
    q_dedup_minhash,
)
from benchmark_spark.llm.text import STOPWORDS, _STOP_SQL
from benchmark_spark.operators.aggregates import dsum, dsum_sql, rnd, rnd_sql
from benchmark_spark.registry import register

# md5-derived uniform bucket in [0, 100) of an integer key — the
# engine-portable "random" (identical in Spark / DuckDB / hashlib).
_BUCKET_SQL = (
    "CAST('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 15) AS BIGINT) % 100"
)


def _md5_rank(key: F.Column) -> F.Column:
    """Deterministic uniform order key: md5 of the row key as a hex string.

    Ordering by it is equivalent in distribution to a uniform random
    shuffle, but reproducible everywhere md5 exists. String comparison
    of fixed-width lowercase hex agrees between Spark and DuckDB."""
    return F.md5(key.cast("string"))


@register(
    "q_reservoir_sample",
    oracle="""
        SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents
        )
        WHERE rk <= 10
    """,
    doc=(
        "Distributed reservoir-style sampling: exactly k=10 docs per source, "
        "chosen by ranking on md5(doc_id) — the same uniform-without-"
        "replacement result a per-partition reservoir merge produces, but as "
        "a pure windowed top-k, deterministic across engines and runs. At "
        "100 TB this is one shuffle on `source`; Catalyst runs the rank as "
        "a partial top-k per input partition before the exchange when k is "
        "small (WindowGroupLimit pushdown), so no partition ever "
        "materializes more than k rows per key."
    ),
    tags=("extension", "text", "sampling"),
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    w = Window.partitionBy("source").orderBy(_md5_rank(F.col("doc_id")), "doc_id")
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "q_stratified_sample",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
                   COUNT(*) OVER (PARTITION BY lang) AS n_lang
            FROM documents
        )
        SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        FROM ranked
        WHERE rk <= CAST(ceil(0.2 * n_lang) AS BIGINT)
    """,
    doc=(
        "Stratified sampling with EXACT per-stratum quotas: ceil(20%) of each "
        "language, selected by md5 rank — unlike Bernoulli sampling (md5 "
        "bucket < threshold), the quota is met exactly per stratum, which is "
        "what a data-mixture contract requires. One shuffle on lang; rank "
        "and stratum size come out of the same window exchange."
    ),
    tags=("extension", "text", "sampling"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    w = Window.partitionBy("lang").orderBy(_md5_rank(F.col("doc_id")), "doc_id")
    wn = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wn).alias("n_lang"),
        )
        .filter(F.col("rk") <= F.ceil(0.2 * F.col("n_lang")).cast("long"))
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "q_unigram_lm",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        freq AS (
            SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
        ),
        total AS (SELECT SUM(cnt) AS n FROM freq),
        surprisal AS (
            SELECT token, {rnd_sql('-ln(cnt * 1.0 / n)', 6)} AS s
            FROM freq, total
        )
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               ({dsum_sql('s', 6)} / COUNT(*)) AS avg_nll
        FROM tok JOIN surprisal USING (token)
        GROUP BY doc_id
    """,
    doc=(
        "Unigram language-model scoring (the cheap KenLM stand-in every "
        "corpus filter starts with): corpus token frequencies -> per-token "
        "surprisal -ln p(t), snapped to 6dp fixed point -> per-doc mean "
        "negative log-likelihood. High avg_nll = rare-token-heavy docs "
        "(gibberish candidates). Two narrow aggs (token freq, per-doc mean) "
        "plus a broadcast of the vocabulary table (31 rows here; at 100 TB "
        "a vocab of millions still broadcasts); the per-token snap makes "
        "the float pipeline engine-exact, the BM25 precedent."
    ),
    tags=("extension", "text"),
)
def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n"))
    surprisal = freq.crossJoin(F.broadcast(total)).select(
        "token", rnd(-F.log(F.col("cnt") * 1.0 / F.col("n")), 6).alias("s")
    )
    return (
        tok.join(F.broadcast(surprisal), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (dsum(F.col("s"), 6) / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


@register(
    "q_length_hist",
    oracle="""
        SELECT CAST(floor(len(string_split(text, ' ')) / 10) AS BIGINT) AS bucket,
               COUNT(*) AS n_docs,
               CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_len,
               CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_len
        FROM documents
        GROUP BY 1
    """,
    doc=(
        "Token-length histogram (width-10 bins) with per-bin extrema — the "
        "first diagnostic run on any new crawl snapshot, and the input to "
        "length-filter threshold choices. Pure map-side arithmetic + one "
        "tiny aggregation; at 100 TB the partial agg collapses each "
        "executor's billions of rows to a handful of bins before the "
        "exchange."
    ),
    tags=("extension", "text"),
)
def q_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    n = F.size(F.split("text", " "))
    return (
        docs.select(F.floor(n / 10).cast("long").alias("bucket"), n.alias("len"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("len").cast("long").alias("min_len"),
            F.max("len").cast("long").alias("max_len"),
        )
    )


# Per-doc cluster label over the planted-near-dup corpus: every doc of
# the doubled corpus labeled with min reachable doc_id (singletons keep
# their own id). Shares the UNROLLED min-label/pointer-jump CTEs with
# q_dedup_clusters (dedup.CC_LABELS_SQL — round 12 replaced the
# recursive transitive closure, which billed 73 + 61 s of oracle time
# here and in q_leakage_split; same fixpoint, hash unchanged).
_LABELS_CTES = f"""
    WITH {_MINHASH_CTES},
    pairs AS MATERIALIZED ({_MINHASH_FINAL}),
    {CC_LABELS_SQL},
    members AS (
        SELECT c.doc_id, coalesce(l.cluster_id, c.doc_id) AS rep
        FROM corpus c LEFT JOIN labels l ON l.node = c.doc_id
    )
"""


@register(
    "q_leakage_split",
    oracle=f"""
        {_LABELS_CTES}
        SELECT doc_id, rep,
               CASE WHEN {_BUCKET_SQL.format(key='rep')} < 80 THEN 'train'
                    WHEN {_BUCKET_SQL.format(key='rep')} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM members
    """,
    doc=(
        "Leakage-safe train/val/test split: the md5 split bucket is computed "
        "on the near-dup CLUSTER REPRESENTATIVE (min doc_id of the connected "
        "component; the doc itself when unclustered), so a document and its "
        "near-duplicates can NEVER straddle the train/test boundary — the "
        "failure q_split_sample's per-doc hashing cannot prevent and the one "
        "that silently inflates eval scores at 100 TB. Composes the "
        "hash-verified MinHash+LSH pair pipeline, the iterative components, "
        "and the keyed-hash split into one plan; the recursive-CTE oracle "
        "hash-checks the whole thing per doc."
    ),
    tags=("extension", "dedup", "sampling"),
)
def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = doubled_corpus(spark, sf_dir).select("doc_id")
    pairs = q_dedup_minhash(spark, sf_dir).select("a_id", "b_id")
    labels = connected_components(pairs).withColumnRenamed("doc_id", "node")
    rep = F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep")
    members = (
        corpus.join(labels, corpus.doc_id == labels.node, "left")
        .select("doc_id", rep)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("rep").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    return members.select(
        "doc_id",
        "rep",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


def doc_quality(corpus: DataFrame) -> DataFrame:
    """Per-doc composite quality score (doc_id, q): type-token ratio,
    non-stopword share, length saturation — the keep-best ranking key.
    Module-level so tests can verify the argmax against it directly."""
    toks = F.split("text", " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n
    q = rnd(
        0.5 * ttr + 0.3 * (1 - stop) + 0.2 * F.least(n / F.lit(50.0), F.lit(1.0))
    )
    return corpus.select("doc_id", q.alias("q"))


@register(
    "q_dedup_keep_best",
    oracle=f"""
        {_LABELS_CTES},
        quality AS (
            SELECT doc_id,
                   {rnd_sql(
                       "0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0"
                       "       / len(string_split(text, ' ')))"
                       " + 0.3 * (1 - len(list_filter(string_split(text, ' '),"
                       f"                             t -> t IN ({_STOP_SQL}))) * 1.0"
                       "          / len(string_split(text, ' ')))"
                       " + 0.2 * least(len(string_split(text, ' ')) / 50.0, 1.0)")} AS q
            FROM corpus
        )
        SELECT rep AS cluster_id,
               CAST(COUNT(*) AS BIGINT) AS cluster_size,
               MIN(doc_id) FILTER (WHERE best_rk = 1) AS keep_id,
               MAX(q) FILTER (WHERE best_rk = 1) AS keep_quality
        FROM (
            SELECT m.doc_id, m.rep, q.q,
                   row_number() OVER (PARTITION BY m.rep
                                      ORDER BY q.q DESC, m.doc_id) AS best_rk
            FROM members m JOIN quality q USING (doc_id)
        )
        GROUP BY rep
        HAVING COUNT(*) >= 2
    """,
    doc=(
        "Survivor selection for near-dup groups: within each MinHash+LSH "
        "connected component, keep the HIGHEST-QUALITY copy (floor-snapped "
        "composite of type-token ratio, stopword share, length; ties to the "
        "smallest doc_id) instead of the arbitrary min-id that plain dedup "
        "keeps — the policy step between 'found duplicates' and 'wrote the "
        "training set'. One window over clusters joined to per-doc scalar "
        "scores; emits cluster id, size, kept doc and its quality, "
        "hash-checked through the same recursive-closure oracle as "
        "q_dedup_clusters."
    ),
    tags=("extension", "dedup"),
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = doubled_corpus(spark, sf_dir)
    quality = doc_quality(corpus)
    pairs = q_dedup_minhash(spark, sf_dir).select("a_id", "b_id")
    labels = connected_components(pairs).withColumnRenamed("doc_id", "node")
    members = (
        corpus.select("doc_id")
        .join(labels, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep")
        )
    )
    w = Window.partitionBy("rep").orderBy(F.desc("q"), F.asc("doc_id"))
    ranked = (
        members.join(quality, "doc_id")
        .withColumn("best_rk", F.row_number().over(w))
    )
    return (
        ranked.groupBy(F.col("rep").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min(F.when(F.col("best_rk") == 1, F.col("doc_id"))).alias("keep_id"),
            F.max(F.when(F.col("best_rk") == 1, F.col("q"))).alias("keep_quality"),
        )
        .filter(F.col("cluster_size") >= 2)
    )


@register(
    "q_bigram_counts",
    oracle="""
        SELECT bg, COUNT(*) AS cnt
        FROM (
            SELECT t[i] || ' ' || t[i + 1] AS bg
            FROM (SELECT string_split(text, ' ') AS t FROM documents),
                 UNNEST(range(1, len(t))) AS r(i)
        )
        GROUP BY bg
        ORDER BY cnt DESC, bg
        LIMIT 20
    """,
    doc=(
        "Corpus-wide bigram frequency (top-20): per-doc bigrams built "
        "entirely inside the array domain (zip_with of two shifted slices — "
        "no explode until the n-gram strings exist), then one count "
        "aggregation and a TakeOrderedAndProject top-k. The raw material for "
        "collocation stats and tokenizer-merge candidates; at 100 TB the "
        "map-side partial agg absorbs the per-doc explosion before the "
        "single shuffle on the bigram key, and hot bigrams (stopword pairs) "
        "collapse map-side instead of skewing the exchange."
    ),
    tags=("extension", "text"),
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bg"))
        .limit(20)
    )


@register(
    "q_pmi_bigrams",
    oracle=f"""
        WITH bg AS (
            SELECT t[i] AS a, t[i + 1] AS b
            FROM (SELECT string_split(text, ' ') AS t FROM documents),
                 UNNEST(range(1, len(t))) AS r(i)
        ),
        pair_cnt AS (
            SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY a, b
        ),
        tok_cnt AS (
            SELECT a AS tok, COUNT(*) AS c FROM bg GROUP BY a
        ),
        total AS (SELECT COUNT(*) AS n FROM bg)
        SELECT a, b, c_ab,
               {rnd_sql('ln(c_ab * 1.0 * n / (ca.c * cb.c))', 6)} AS pmi
        FROM pair_cnt
        JOIN tok_cnt ca ON ca.tok = a
        JOIN tok_cnt cb ON cb.tok = b
        CROSS JOIN total
        WHERE c_ab >= 5
        ORDER BY pmi DESC, a, b
        LIMIT 20
    """,
    doc=(
        "Pointwise mutual information over corpus bigrams (min count 5, "
        "top-20): PMI = ln(c_ab * N / (c_a * c_b)) from exact integer "
        "counts, snapped to 6dp — the collocation detector behind phrase "
        "mining and tokenizer-merge scoring. Left-position unigram "
        "marginals double as both sides' denominators (one token-count agg, "
        "broadcast back onto the pair table); the only wide exchange is the "
        "pair count itself, and hot pairs collapse map-side."
    ),
    tags=("extension", "text"),
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bg = docs.select(F.explode(pairs).alias("p")).select("p.a", "p.b")
    pair_cnt = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    tok_cnt = bg.groupBy(F.col("a").alias("tok")).agg(F.count(F.lit(1)).alias("c"))
    total = bg.agg(F.count(F.lit(1)).alias("n"))
    ca = tok_cnt.select(F.col("tok").alias("a_tok"), F.col("c").alias("c_a"))
    cb = tok_cnt.select(F.col("tok").alias("b_tok"), F.col("c").alias("c_b"))
    return (
        pair_cnt.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(ca), F.col("a") == F.col("a_tok"))
        .join(F.broadcast(cb), F.col("b") == F.col("b_tok"))
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "c_ab",
            rnd(
                F.log(F.col("c_ab") * 1.0 * F.col("n") / (F.col("c_a") * F.col("c_b"))),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@register(
    "q_entropy",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        per_tok AS (
            SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
        ),
        per_doc AS (
            SELECT doc_id, SUM(c) AS n FROM per_tok GROUP BY doc_id
        )
        SELECT p.doc_id,
               CAST(d.n AS BIGINT) AS n_tokens,
               {dsum_sql('floor((c * 1.0 / d.n) * ln(d.n * 1.0 / c) * 1000000 + 0.5) / 1000000', 6)} AS entropy
        FROM per_tok p JOIN per_doc d ON p.doc_id = d.doc_id
        GROUP BY p.doc_id, d.n
    """,
    doc=(
        "Per-document token (Shannon) entropy in nats: sum over distinct "
        "tokens of (c/n) ln(n/c), each term floor-snapped to 6dp before the "
        "exact fixed-point sum — low entropy flags repetitive/templated "
        "docs, the complement of q_repetition's n-gram view. One shuffle on "
        "(doc, token) then a per-doc rollup; the (c, n) inputs are exact "
        "integers on both engines."
    ),
    tags=("extension", "text"),
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    per_tok = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_tok.groupBy("doc_id").agg(F.sum("c").alias("n"))
    term = (
        F.floor(
            (F.col("c") * 1.0 / F.col("n"))
            * F.log(F.col("n") * 1.0 / F.col("c"))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        per_tok.join(per_doc, "doc_id")
        .groupBy("doc_id", "n")
        .agg(dsum(term, 6).alias("entropy"))
        .select("doc_id", F.col("n").cast("long").alias("n_tokens"), "entropy")
    )


_QUALITY_SQL = (
    "0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0"
    "       / len(string_split(text, ' ')))"
    " + 0.3 * (1 - len(list_filter(string_split(text, ' '),"
    f"                             t -> t IN ({_STOP_SQL}))) * 1.0"
    "          / len(string_split(text, ' ')))"
    " + 0.2 * least(len(string_split(text, ' ')) / 50.0, 1.0)"
)


@register(
    "q_importance_sample",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {rnd_sql(_QUALITY_SQL)} AS quality,
                   (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT) % 10000) / 10000.0 AS u
            FROM documents
        )
        SELECT doc_id, lang, quality
        FROM scored
        WHERE u < quality
    """,
    doc=(
        "Importance (quality-weighted) sampling: each doc is kept with "
        "probability equal to its floor-snapped quality score, decided by "
        "comparing an md5-derived uniform in [0,1) against the weight — "
        "deterministic Bernoulli thinning that upsamples high-quality text "
        "exactly the way curated pre-training mixtures do, yet is "
        "reproducible across engines, runs, and corpus growth (rand() is "
        "none of those). Pure map-side: no shuffle at all; the decision "
        "travels with the row."
    ),
    tags=("extension", "text", "sampling"),
)
def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n
    quality = rnd(
        0.5 * ttr + 0.3 * (1 - stop) + 0.2 * F.least(n / F.lit(50.0), F.lit(1.0))
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 10000
    ) / 10000.0
    return (
        docs.select("doc_id", "lang", quality.alias("quality"), u.alias("u"))
        .filter(F.col("u") < F.col("quality"))
        .select("doc_id", "lang", "quality")
    )


@register(
    "q_incremental_dedup",
    oracle=f"""
        WITH {_MINHASH_CTES},
        pairs AS ({_MINHASH_FINAL}),
        incoming AS (SELECT doc_id FROM corpus WHERE doc_id >= 1000000),
        linked AS (
            SELECT DISTINCT b_id AS doc_id, max(jaccard) AS link_j
            FROM pairs WHERE a_id < 1000000 GROUP BY b_id
        )
        SELECT i.doc_id,
               CAST(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END AS INT)
                   AS admitted,
               coalesce(l.link_j, 0.0) AS link_jaccard
        FROM incoming i LEFT JOIN linked l ON l.doc_id = i.doc_id
    """,
    doc=(
        "Incremental (batch-vs-corpus) dedup — the nightly-increment shape: "
        "each document of an incoming batch (the planted mutants, id >= 1M) "
        "gets an ADMIT/REJECT decision based on whether MinHash+LSH finds a "
        "verified near-dup link (Jaccard >= 0.5, the strongest link "
        "reported) against the EXISTING corpus. Unlike the full-corpus "
        "clustering, cost scales with the increment: signatures are "
        "computed for the batch, the band join probes the corpus's "
        "(persisted) band index, and the decision join is keyed — the "
        "corpus itself is never re-shuffled. At sf0.01 all 500 mutants are "
        "correctly rejected with their evidence Jaccard, and the decision "
        "column is hash-checked per incoming doc."
    ),
    tags=("extension", "dedup"),
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = doubled_corpus(spark, sf_dir)
    incoming = corpus.filter(F.col("doc_id") >= 1_000_000).select("doc_id")
    pairs = q_dedup_minhash(spark, sf_dir)
    linked = (
        pairs.filter(F.col("a_id") < 1_000_000)
        .groupBy(F.col("b_id").alias("link_id"))
        .agg(F.max("jaccard").alias("link_j"))
    )
    return (
        incoming.join(linked, incoming.doc_id == linked.link_id, "left")
        .select(
            "doc_id",
            F.when(F.col("link_id").isNull(), 1).otherwise(0).cast("int").alias("admitted"),
            F.coalesce(F.col("link_j"), F.lit(0.0)).alias("link_jaccard"),
        )
    )


@register(
    "q_token_budget_mix",
    oracle="""
        WITH ranked AS (
            SELECT source,
                   len(string_split(text, ' ')) AS n_tok,
                   SUM(len(string_split(text, ' '))) OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tok
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
        FROM ranked
        WHERE cum_tok <= 1000
        GROUP BY source
        ORDER BY source
    """,
    doc=(
        "Token-budget data mixing: each source contributes docs (in "
        "deterministic md5 order — a reproducible uniform shuffle) until "
        "its token budget (1000) is exhausted; report what each source "
        "actually contributed. This is how training mixtures are built "
        "when the recipe says 'X billion tokens of source S': a greedy "
        "prefix under a per-source cumulative token window. One shuffle "
        "on source; the running sum and the admit decision come out of "
        "the same window exchange, and the final per-source rollup "
        "re-uses that partitioning (zero extra shuffles)."
    ),
    tags=("extension", "text", "sampling"),
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("source")
        .orderBy(_md5_rank(F.col("doc_id")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = docs.select(
        "source", n_tok.alias("n_tok"), F.sum(n_tok).over(w).alias("cum_tok")
    )
    return (
        ranked.filter(F.col("cum_tok") <= 1000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tok").cast("long").alias("tokens_kept"),
        )
        .orderBy("source")
    )


@register(
    "q_bigram_lm",
    oracle=f"""
        WITH bg AS (
            SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 UNNEST(range(1, len(t))) AS r(i)
        ),
        pair_cnt AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
        prefix_cnt AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
        surprisal AS (
            SELECT w1, w2, {rnd_sql('-ln(c2 * 1.0 / c1)', 6)} AS s
            FROM pair_cnt JOIN prefix_cnt USING (w1)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ({dsum_sql('s', 6)} / COUNT(*)) AS avg_nll
        FROM bg JOIN surprisal USING (w1, w2)
        GROUP BY doc_id
    """,
    doc=(
        "Bigram language-model scoring, the next rung above q_unigram_lm's "
        "KenLM stand-in: corpus bigram counts give P(w2|w1) = c(w1 w2) / "
        "c(w1 ·); each doc scores the mean -ln P over its bigram positions. "
        "Docs full of common transitions score low; docs with improbable "
        "word sequences (boilerplate keyword stuffing, shuffled text) score "
        "high even when every unigram is common — exactly why fluency "
        "filters use conditional, not marginal, probabilities. Per-bigram "
        "surprisal snaps to 6dp fixed point before the per-doc fixed-point "
        "mean, so the double pipeline is engine-exact. Plan: bigrams stay "
        "in the array domain until one explode; the bigram-type table "
        "(vocab^2 bounded) broadcasts back onto the positions; two narrow "
        "aggregations shuffle on bigram key and doc_id."
    ),
    tags=("extension", "text"),
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = docs.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    pair_cnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    prefix_cnt = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    surprisal = pair_cnt.join(F.broadcast(prefix_cnt), "w1").select(
        "w1", "w2", rnd(-F.log(F.col("c2") * 1.0 / F.col("c1")), 6).alias("s")
    )
    return (
        bg.join(F.broadcast(surprisal), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (dsum(F.col("s"), 6) / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


@register(
    "q_zipf_slope",
    oracle=f"""
        WITH freq AS (
            SELECT token, COUNT(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY token
        ),
        ranked AS (
            SELECT {rnd_sql('ln(row_number() OVER (ORDER BY cnt DESC, token))', 6)} AS x,
                   {rnd_sql('ln(cnt)', 6)} AS y
            FROM freq
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {dsum_sql('x', 6)} AS sx, {dsum_sql('y', 6)} AS sy,
                   {dsum_sql(rnd_sql('x * y', 6), 6)} AS sxy,
                   {dsum_sql(rnd_sql('x * x', 6), 6)} AS sxx
            FROM ranked
        )
        SELECT n AS vocab_size,
               {rnd_sql('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 4)} AS zipf_slope
        FROM sums
    """,
    doc=(
        "Zipf rank-frequency slope: OLS fit of ln(freq) against ln(rank) "
        "over the whole vocabulary — natural text sits near slope -1, and "
        "a corpus that drifts far from it (template spam: too flat; "
        "boilerplate dominance: too steep) fails the diversity gate. "
        "Ranks come from a deterministic (cnt DESC, token) ordering; each "
        "(x, y) term snaps to 6dp fixed point, the five OLS sums are exact "
        "fixed-point BIGINTs, and the closed-form slope is one IEEE "
        "expression over identical doubles — bit-equal across engines. "
        "Plan: one token-count shuffle, a vocab-sized global window (the "
        "vocabulary fits one partition even at 100 TB corpus scale — it "
        "grows with Heaps' law, not corpus size), one scalar-row reduce."
    ),
    tags=("extension", "text"),
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = freq.select(
        rnd(F.log(F.row_number().over(w)), 6).alias("x"),
        rnd(F.log(F.col("cnt")), 6).alias("y"),
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("x"), 6).alias("sx"),
        dsum(F.col("y"), 6).alias("sy"),
        # products of two 6dp-snapped values are NOT on the 6dp grid, so
        # floor-snap them (engine-agnostic on ties) before the exact sum
        dsum(rnd(F.col("x") * F.col("y"), 6), 6).alias("sxy"),
        dsum(rnd(F.col("x") * F.col("x"), 6), 6).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    return sums.select(
        n.alias("vocab_size"),
        rnd((n * sxy - sx * sy) / (n * sxx - sx * sx), 4).alias("zipf_slope"),
    )


@register(
    "q_heaps_law",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        first_doc AS (
            SELECT token, MIN(doc_id) AS fd FROM tok GROUP BY token
        ),
        per_doc AS (
            SELECT d.doc_id,
                   len(string_split(d.text, ' ')) AS n_tok,
                   (SELECT COUNT(*) FROM first_doc f WHERE f.fd = d.doc_id)
                       AS new_types
            FROM documents d
        )
        SELECT doc_id,
               CAST(SUM(n_tok) OVER (ORDER BY doc_id) AS BIGINT)
                   AS cum_tokens,
               CAST(SUM(new_types) OVER (ORDER BY doc_id) AS BIGINT)
                   AS vocab_size
        FROM per_doc
        ORDER BY doc_id
    """,
    doc=(
        "Heaps'-law vocabulary growth curve: after ingesting docs 0..i (in "
        "doc_id order), how many total tokens and how many DISTINCT types "
        "has the corpus seen? Natural corpora grow as vocab ~ K * "
        "tokens^beta (beta ~ 0.5); a flat curve means near-duplicate "
        "content, a linear one means noise/IDs — it is the companion "
        "diagnostic to q_zipf_slope. The trick is attributing each type "
        "to its FIRST document (one min-agg over the token stream) so the "
        "cumulative distinct count becomes an ordinary prefix sum — no "
        "distinct-over-window needed. Plan: token-min shuffle + per-doc "
        "count + two prefix-sum windows; the global window is doc-count "
        "sized, and at 100 TB becomes a two-pass range-bucketed prefix "
        "sum (per-bucket totals broadcast back) — same algebra."
    ),
    tags=("extension", "text"),
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    first_doc = tok.groupBy("token").agg(F.min("doc_id").alias("fd"))
    new_types = first_doc.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("new_types")
    )
    per_doc = (
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
        .join(new_types, "doc_id", "left")
        .fillna(0, ["new_types"])
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_doc.select(
            "doc_id",
            F.sum("n_tok").over(w).cast("long").alias("cum_tokens"),
            F.sum("new_types").over(w).cast("long").alias("vocab_size"),
        )
        .orderBy("doc_id")
    )


_AES_DEN = float((1 << 60) + 1)  # md5 60-bit uniform -> u in (0, 1]


@register(
    "q_weighted_sample",
    oracle=f"""
        WITH weighted AS (
            SELECT doc_id,
                   (floor(len(list_distinct(string_split(text, ' '))) * 1.0
                          / len(string_split(text, ' ')) * 10000 + 0.5) / 10000)
                       AS weight
            FROM documents
        ), keyed AS (
            SELECT doc_id, weight,
                   floor((-ln((CAST('0x' || substring(md5('aes|' ||
                               CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1)
                              / {_AES_DEN!r})
                          / weight) * 1000000000 + 0.5) / 1000000000 AS aes_key
            FROM weighted
        )
        SELECT doc_id, weight, aes_key
        FROM keyed
        ORDER BY aes_key, doc_id
        LIMIT 50
    """,
    doc=(
        "Weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
        "A-ES): each doc draws a reproducible md5 uniform u and the "
        "sample is the top-k by u^(1/w) — equivalently the SMALLEST "
        "-ln(u)/w, computed here to spend one libm call instead of a "
        "pow — with w = the doc's type-token ratio, so higher-quality "
        "docs are proportionally likelier but any doc CAN be drawn "
        "(the property the q_importance_sample Bernoulli filter and "
        "the q_reservoir_sample uniform draw each lack). The exp-key "
        "trick makes weighted-without-replacement a plain "
        "TakeOrderedAndProject: one scan, no sequential state, "
        "mergeable across any partitioning — the 100 TB property. "
        "Keys are floor-snapped to 9dp (grid >> last-ulp libm noise, "
        "<< key spacing) with doc_id tiebreaks, so the top-50 boundary "
        "is bit-stable across engines and the driver hash checks the "
        "actual sampled ids."
    ),
    tags=("extension", "text", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    weight = F.floor(
        F.size(F.array_distinct(toks)) / F.size(toks) * 10000 + F.lit(0.5)
    ) / 10000
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("aes|"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (h + 1) / F.lit(_AES_DEN)
    key = F.floor((-F.log(u)) / F.col("weight") * 1e9 + F.lit(0.5)) / 1e9
    return (
        docs.select("doc_id", weight.alias("weight"))
        .select("doc_id", "weight", key.alias("aes_key"))
        .orderBy("aes_key", "doc_id")
        .limit(50)
    )


@register(
    "q_kl_novelty",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        per_tok AS (
            SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
        ),
        per_doc AS (
            SELECT doc_id, SUM(c) AS n FROM per_tok GROUP BY doc_id
        ),
        corpus AS (
            SELECT token, COUNT(*) AS cw FROM tok GROUP BY token
        ),
        total AS (SELECT COUNT(*) AS big_n FROM tok)
        SELECT p.doc_id,
               CAST(d.n AS BIGINT) AS n_tokens,
               {dsum_sql(
                   'floor((p.c * 1.0 / d.n) * ln((p.c * 1.0 / d.n) '
                   '/ (co.cw * 1.0 / t.big_n)) * 1000000 + 0.5) / 1000000', 6)}
                   AS kl_nats
        FROM per_tok p
        JOIN per_doc d ON p.doc_id = d.doc_id
        JOIN corpus co ON p.token = co.token
        CROSS JOIN total t
        GROUP BY p.doc_id, d.n
    """,
    doc=(
        "Per-document KL divergence from the corpus unigram "
        "distribution (nats) — the domain-shift / novelty score: high "
        "KL flags documents whose vocabulary usage departs from the "
        "corpus (new domain, different language register, spam); near "
        "zero means the doc is distributionally typical. The "
        "directed-KL complement of q_entropy (self-information) and "
        "q_unigram_lm (corpus-model surprisal): surprisal weights by "
        "the CORPUS model, KL by the DOC's own frequencies, so a doc "
        "repeating one rare word scores high here but middling there. "
        "Every input (c, n, cw, N) is an exact integer on both "
        "engines; each term is floor-snapped to 6dp before the exact "
        "fixed-point sum (negative terms snap identically — floor(x + "
        "0.5) is total-ordered, no half-tie roulette). One (doc, "
        "token) shuffle + a broadcast-sized vocabulary join; at "
        "100 TB the vocabulary table is Heaps-law sublinear in the "
        "corpus, so this stays a broadcast."
    ),
    tags=("extension", "text"),
)
def q_kl_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    per_tok = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_tok.groupBy("doc_id").agg(F.sum("c").alias("n"))
    corpus = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cw"))
    total = tok.agg(F.count(F.lit(1)).alias("big_n"))
    p_doc = F.col("c") * 1.0 / F.col("n")
    p_corpus = F.col("cw") * 1.0 / F.col("big_n")
    term = F.floor(p_doc * F.log(p_doc / p_corpus) * 1e6 + F.lit(0.5)) / 1e6
    return (
        per_tok.join(per_doc, "doc_id")
        .join(F.broadcast(corpus), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "n")
        .agg(dsum(term, 6).alias("kl_nats"))
        .select("doc_id", F.col("n").cast("long").alias("n_tokens"), "kl_nats")
    )


_FH_DIMS = 32  # hashed feature space


@register(
    "q_feature_hash",
    oracle=f"""
        WITH feats AS (
            SELECT user_id, 'ty=' || event_type AS f FROM events
            UNION ALL
            SELECT user_id,
                   'vb=' || CAST(CAST(floor(value / 50) AS BIGINT) AS VARCHAR)
            FROM events
        ),
        hashed AS (
            SELECT user_id,
                   CAST('0x' || substring(md5(f), 1, 8) AS BIGINT)
                       % {_FH_DIMS} AS dim,
                   CAST('0x' || substring(md5(f), 9, 1) AS BIGINT) % 2 * 2 - 1
                       AS sign
            FROM feats
        )
        SELECT user_id, dim, CAST(SUM(sign) AS BIGINT) AS weight
        FROM hashed
        GROUP BY user_id, dim
        ORDER BY user_id, dim
    """,
    doc=(
        "HASHING-TRICK featurization (round 11; Weinberger et al. "
        "2009 — the stateless featurizer tabular training pipelines "
        "use when the category vocabulary is unbounded): every event "
        "contributes two feature tokens (categorical 'ty=<event_type>' "
        "and bucketed-numeric 'vb=<value//50>'), each hashed into a "
        f"{_FH_DIMS}-dim space by md5 %% dims with a +-1 sign drawn "
        "from an independent md5 nibble (the signed variant keeps "
        "collision noise zero-mean — the property that makes the "
        "trick statistically sound), then summed per (user, dim) into "
        "the sparse feature vector. STATELESS is the 100 TB story: no "
        "vocabulary build pass, no dictionary broadcast, no refit "
        "when new categories appear — one scan, one shuffle keyed by "
        "(user_id, dim), integer weights bit-identical on both "
        "engines through the shared md5."
    ),
    tags=("extension", "text"),
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", assert_schema=False)
    feats = ev.select(
        "user_id", F.concat(F.lit("ty="), F.col("event_type")).alias("f")
    ).unionByName(
        ev.select(
            "user_id",
            F.concat(
                F.lit("vb="),
                F.floor(F.col("value") / 50).cast("long").cast("string"),
            ).alias("f"),
        )
    )
    h = F.md5("f")
    dim = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _FH_DIMS
    sign = F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 * 2 - 1
    return (
        feats.select("user_id", dim.alias("dim"), sign.alias("sign"))
        .groupBy("user_id", "dim")
        .agg(F.sum("sign").alias("weight"))
        .orderBy("user_id", "dim")
    )


@register(
    "q_perplexity_filter",
    oracle=f"""
        WITH train_tok AS (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id % 2 = 0
        ),
        vocab AS (
            SELECT token, COUNT(*) AS cnt FROM train_tok GROUP BY token
        ),
        tot AS (
            SELECT SUM(cnt) AS n, COUNT(*) + 1 AS v FROM vocab
        ),
        surprisal AS (
            SELECT token,
                   {rnd_sql('-ln((cnt + 1.0) / (n + v))', 6)} AS s
            FROM vocab, tot
        ),
        unk AS (
            SELECT {rnd_sql('-ln(1.0 / (n + v))', 6)} AS s_unk FROM tot
        ),
        score_tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id % 2 = 1
        ),
        scored AS (
            SELECT t.doc_id,
                   COUNT(*) AS n_tokens,
                   SUM(CASE WHEN sv.token IS NULL THEN 1 ELSE 0 END) AS oov_cnt,
                   ({dsum_sql('COALESCE(sv.s, u.s_unk)', 6)} / COUNT(*)) AS avg_nll
            FROM score_tok t
            LEFT JOIN surprisal sv USING (token)
            CROSS JOIN unk u
            GROUP BY t.doc_id
        ),
        ranked AS (
            SELECT doc_id, n_tokens, oov_cnt, avg_nll,
                   row_number() OVER (ORDER BY avg_nll, doc_id) AS rk,
                   COUNT(*) OVER () AS n_docs
            FROM scored
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(oov_cnt AS BIGINT) AS oov_cnt,
               avg_nll,
               CAST(CASE WHEN 100 * rk <= 95 * n_docs THEN 1 ELSE 0 END
                    AS BIGINT) AS kept
        FROM ranked
        ORDER BY doc_id
    """,
    doc=(
        "PERPLEXITY FILTER (round 11) — the CCNet-shaped curation "
        "gate: train a unigram LM with add-1 smoothing on the EVEN "
        "half of the corpus, score the ODD half it has never seen, "
        "and drop the top-5% highest mean-NLL documents (the "
        "gibberish tail). The held-out split is what separates this "
        "from q_unigram_lm's in-corpus diagnostic: a filter trained "
        "on what it scores is leakage, so p(tok) = (cnt+1)/(N+V) "
        "comes only from train docs and unseen tokens cost the "
        "explicit UNK surprisal -ln(1/(N+V)) (emitted per doc as "
        "oov_cnt). Per-token surprisals snap to 6dp fixed point and "
        "sum through dsum, so avg_nll is engine-exact; the 95% cut "
        "is a pure INTEGER rank verdict (ADVICE r11 #1 — Spark's "
        "percentile() and DuckDB's quantile_cont use different "
        "interpolation formulas, so a value-threshold cut was one "
        "ulp from flipping on ties): kept = 100*rank <= 95*n over "
        "(avg_nll, doc_id) order, integer-exact like q_mad_outliers. "
        "Since perplexity = exp(avg_nll) is monotone, the rank cut "
        "on avg_nll is the perplexity cut — no engine exp() in any "
        "compared value. Plan: vocab agg + one broadcast join over "
        "score tokens + one rank window over the per-doc aggregate "
        "(tiny relative to the corpus; at true scale the same cut "
        "ships as approx_percentile + a margin re-rank); vocab "
        "tables of millions of rows still broadcast at 100 TB (the "
        "KenLM-filter deployment shape)."
    ),
    tags=("extension", "text", "quality"),
)
def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    train_tok = docs.where(F.col("doc_id") % 2 == 0).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    vocab = train_tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(
        F.sum("cnt").alias("n"), (F.count(F.lit(1)) + 1).alias("v")
    )
    surprisal = vocab.crossJoin(F.broadcast(tot)).select(
        "token",
        rnd(-F.log((F.col("cnt") + 1.0) / (F.col("n") + F.col("v"))), 6).alias("s"),
    )
    unk = tot.select(rnd(-F.log(1.0 / (F.col("n") + F.col("v"))), 6).alias("s_unk"))
    score_tok = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    scored = (
        score_tok.join(F.broadcast(surprisal), "token", "left")
        .crossJoin(F.broadcast(unk))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("s").isNull(), 1).otherwise(0)).alias("oov_cnt"),
            (dsum(F.coalesce(F.col("s"), F.col("s_unk")), 6) / F.count(F.lit(1))).alias(
                "avg_nll"
            ),
        )
    ).localCheckpoint(eager=True)  # feeds the rank cut + the verdict
    w_rank = Window.orderBy("avg_nll", "doc_id")
    w_all = Window.partitionBy()
    return (
        scored.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("oov_cnt").cast("long").alias("oov_cnt"),
            "avg_nll",
            F.when(
                100 * F.row_number().over(w_rank)
                <= 95 * F.count(F.lit(1)).over(w_all),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("kept"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_vocab_coverage",
    oracle=f"""
        WITH train_tok AS (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id % 2 = 0
        ),
        top_vocab AS (
            SELECT token FROM (
                SELECT token, COUNT(*) AS cnt FROM train_tok GROUP BY token
                ORDER BY cnt DESC, token LIMIT 16
            )
        ),
        score_tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id % 2 = 1
        ),
        per_doc AS (
            SELECT doc_id,
                   COUNT(*) AS n_tokens,
                   SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END) AS covered
            FROM score_tok t LEFT JOIN top_vocab v USING (token)
            GROUP BY doc_id
        )
        SELECT CAST(floor((covered * 10) / n_tokens) AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens,
               CAST(SUM(n_tokens - covered) AS BIGINT) AS oov_tokens,
               {rnd_sql('SUM(covered) * 1.0 / SUM(n_tokens)', 6)} AS avg_coverage
        FROM per_doc
        GROUP BY floor((covered * 10) / n_tokens)
        ORDER BY decile
    """,
    doc=(
        "VOCABULARY COVERAGE / OOV-RATE AUDIT (round 11) — the "
        "tokenizer-fit question every pretraining run asks before "
        "committing a vocab: what fraction of held-out text does a "
        "size-V vocabulary cover? Top-16 train-half tokens by "
        "frequency (count-desc, token-asc deterministic cut) form "
        "the vocab; each odd doc reports covered/n_tokens, rolled "
        "into coverage deciles with token-weighted OOV totals. The "
        "decile key floor(covered*10/n) is integer-exact; the only "
        "float is the per-decile coverage ratio through the rnd "
        "floor grid. Plan: one train-side agg with a "
        "TakeOrderedAndProject vocab cut, then a broadcast LEFT "
        "join over score tokens — the fact table never shuffles on "
        "token; a million-entry production vocab still broadcasts."
    ),
    tags=("extension", "text", "quality"),
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    train_tok = docs.where(F.col("doc_id") % 2 == 0).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    top_vocab = (
        train_tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(16)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    score_tok = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    per_doc = (
        score_tok.join(F.broadcast(top_vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("in_vocab"), F.lit(0))).alias("covered"),
        )
    )
    return (
        per_doc.groupBy(
            F.floor((F.col("covered") * 10) / F.col("n_tokens")).cast("long").alias(
                "decile"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
            F.sum(F.col("n_tokens") - F.col("covered")).cast("long").alias("oov_tokens"),
            rnd(F.sum("covered") * 1.0 / F.sum("n_tokens"), 6).alias("avg_coverage"),
        )
        .orderBy("decile")
    )
