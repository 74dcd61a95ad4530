"""Probabilistic distinct-count sketches + runtime-filter join reduction.

Round 11 additions (SURVEY.md §2.4 / §2.3 extension rows). Three
operators a 100 TB engine cannot live without, each built from scratch
on the portable md5 base hash (the q_dedup_minhash construction,
llm/dedup.py: `conv(substr(md5(s), ...), 16, 10)` == DuckDB
`CAST('0x' || substring(md5(s), ...) AS BIGINT)`) so the WHOLE sketch —
bucketing, register updates, estimator arithmetic — replays bit-for-bit
in the DuckDB oracle and the gate hash-checks the estimate itself, not
just row counts:

  * q_hll_sketch  — HyperLogLog distinct-count registers + estimate
  * q_kmv_theta   — KMV (k-minimum-values / theta) sketch with UNION
                    and INTERSECTION estimates across two segments
  * q_bloom_join  — Bloom-filter semi-join reduction of a fact scan
                    before the exact join (the runtime-filter pattern),
                    with the measured false-positive rate in the output

Scale posture (the reason these exist): COUNT(DISTINCT x) at 100 TB is
a full shuffle of every distinct value; an HLL register table is 256
BIGINTs per partition, merged with MAX — a broadcast-sized commutative
reduction. KMV adds what HLL cannot: set algebra (union/intersect
estimates between segment sketches) without re-scanning. The Bloom
pattern is what Spark's own runtime row-group filtering does inside
AQE: build a compact filter on the small (dimension) side, apply it
map-side on the fact scan so the shuffle carries only probable
matches, then let the exact join delete the false positives — at a
2% selective dimension this drops the fact shuffle ~50x for ~16 KiB
of broadcast state.

Determinism contract (house rules, registry.py header): every
floating-point term that feeds a comparison or a hash is either exact
integer arithmetic (register terms are powers of two summed as BIGINT;
KMV ranks are 60-bit integer hashes) or a single double expression
evaluated on identical operands by both engines, rounded through
rnd/rnd_sql's tie-deterministic floor formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.aggregates import dsum, dsum_sql, rnd, rnd_sql
from benchmark_spark.registry import register

# --- HLL parameters -------------------------------------------------
# p = 8 -> m = 256 registers: bucket = first 2 md5 hex chars, the next
# 13 hex chars form the 52-bit register word. alpha_m is the standard
# Flajolet bias constant for m >= 128; injected as the SAME Python
# float repr into the Spark plan and the oracle SQL.
_HLL_M = 256
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_W_BITS = 52  # 13 hex chars
_HLL_SCALE = 1 << 53  # register term 2^(53-M) stays integral for M in [0,53]
# alpha * m^2 * 2^53 as ONE double literal on both sides: the m^2 and
# 2^53 factors are powers of two, so the product is an EXACT scaling of
# alpha regardless of association order — and a single scientific-
# notation literal keeps DuckDB's parser in DOUBLE (a bare decimal
# literal parses as DECIMAL(18) and overflows at this magnitude).
_HLL_NUMER = _HLL_ALPHA * float(_HLL_M * _HLL_M) * float(_HLL_SCALE)

# --- KMV parameters -------------------------------------------------
_KMV_K = 64  # small enough that every fixture segment has >= k keys
_KMV_HASH_SPACE = float(1 << 60)  # 15 md5 hex chars

# --- Bloom parameters -----------------------------------------------
_BLOOM_M = 1 << 17  # bits in the filter
_BLOOM_CUTOFF = 489000.0  # o_totalprice > cutoff ~= top 2% of orders


def _hash60(col):
    """Portable 60-bit base hash (15 md5 hex chars) of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash60_sql(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def _hll_oracle(key_sql: str, table: str) -> str:
    """The m=256 HLL oracle, parameterized by key expression and
    table — shared by q_hll_sketch (lineitem orderkeys) and the
    streaming register-merge twin q_stream_hll (events user_ids)."""
    return f"""
        WITH h AS (
            SELECT md5({key_sql}) AS md FROM {table}
        ),
        rho AS (
            SELECT CAST('0x' || substring(md, 1, 2) AS BIGINT) AS bucket,
                   CASE WHEN CAST('0x' || substring(md, 3, 13) AS BIGINT) = 0
                        THEN {_HLL_W_BITS + 1}
                        ELSE {_HLL_W_BITS + 1}
                             - length(bin(CAST('0x' || substring(md, 3, 13)
                                               AS BIGINT)))
                   END AS r
            FROM h
        ),
        regs AS (
            SELECT s.bucket, COALESCE(mx, 0) AS m
            FROM (SELECT unnest(range(0, {_HLL_M})) AS bucket) s
            LEFT JOIN (SELECT bucket, MAX(r) AS mx FROM rho GROUP BY bucket) g
              USING (bucket)
        ),
        summ AS (
            SELECT SUM(CAST(power(2, {_HLL_W_BITS + 1} - m) AS BIGINT))
                       AS sum_scaled,
                   SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS n_zero
            FROM regs
        ),
        est AS (
            SELECT sum_scaled, n_zero,
                   {_HLL_NUMER!r} / CAST(sum_scaled AS DOUBLE) AS raw
            FROM summ
        ),
        fin AS (
            SELECT sum_scaled, n_zero,
                   CASE WHEN raw <= {2.5 * _HLL_M!r} AND n_zero > 0
                        THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / n_zero)
                        ELSE raw END AS est
            FROM est
        ),
        ex AS (SELECT COUNT(DISTINCT {key_sql}) AS exact_distinct FROM {table})
        SELECT CAST(r.m AS BIGINT) AS rho,
               CAST(COUNT(*) AS BIGINT) AS n_registers,
               CAST(f.n_zero AS BIGINT) AS n_zero,
               CAST(f.sum_scaled AS BIGINT) AS sum_scaled,
               {rnd_sql("f.est", 2)} AS est_hll,
               ex.exact_distinct,
               CASE WHEN ex.exact_distinct = 0 THEN NULL ELSE
               {rnd_sql("100.0 * (f.est - ex.exact_distinct)"
                        " / ex.exact_distinct", 2)} END AS rel_err_pct
        FROM regs r CROSS JOIN fin f CROSS JOIN ex
        GROUP BY r.m, f.n_zero, f.sum_scaled, f.est, ex.exact_distinct
        ORDER BY rho
    """


@register(
    "q_hll_sketch",
    oracle=_hll_oracle("CAST(l_orderkey AS VARCHAR)", "lineitem"),
    doc=(
        "HYPERLOGLOG from scratch (round 11) — the mergeable distinct-"
        "count sketch, built entirely from the portable md5 base hash "
        "so the oracle replays every register. Bucket = first 2 hex "
        "chars (m=256); register word = next 13 hex chars (52 bits); "
        "rho = position of the highest set bit, computed EXACTLY as "
        "53 - length(bin(w)) — a string op both engines define "
        "identically, no float log2. Registers aggregate with MAX "
        "(commutative + idempotent: at 100 TB this is a per-partition "
        "256-long array merged with elementwise max, no distinct "
        "shuffle). The indicator sum uses integer terms 2^(53-M) "
        "summed as BIGINT — order-independent, unlike a double sum — "
        "and the bias-corrected estimate + linear-counting small-range "
        "branch evaluate on identical doubles in both engines. Output "
        "is the register-value histogram plus the estimate vs exact "
        "COUNT(DISTINCT) and the signed relative error: at sf0.1 "
        "(147k distinct orderkeys) the 256-register estimate lands "
        "within ~6.5% (1.04/sqrt(m)), hash-pinned by the gate."
    ),
    tags=("extension", "sketch", "agg"),
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_sketch_stats(spark, sf_dir, bucket_chars=2)


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constants (Flajolet et al. 2007, Fig. 3)."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_bucket_rho(col, bucket_chars: int = 2):
    """(bucket, rho) expression pair of the portable HLL: bucket =
    first `bucket_chars` md5 hex chars, rho = highest-set-bit
    position of the next 13 hex chars via the exact length(bin(w))
    string op. Shared by the batch query, the m-sweep tool, and the
    streaming register-merge twin."""
    md = F.md5(col)
    w = F.conv(F.substring(md, bucket_chars + 1, 13), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(_HLL_W_BITS + 1)).otherwise(
        F.lit(_HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    bucket = F.conv(F.substring(md, 1, bucket_chars), 16, 10).cast("long")
    return bucket, rho


def hll_finalize(
    spark: SparkSession, maxed: DataFrame, m_regs: int, ex: DataFrame
) -> DataFrame:
    """Turn a (bucket, mx) max-merged register table + a 1-row exact
    count frame into the output shape: register histogram x estimate
    columns. `maxed` may omit never-hit buckets — the spine join
    zero-fills them."""
    numer = _hll_alpha(m_regs) * float(m_regs * m_regs) * float(_HLL_SCALE)
    spine = spark.range(m_regs).select(F.col("id").alias("bucket"))
    regs = (
        F.broadcast(spine)
        .join(maxed, "bucket", "left")
        .select("bucket", F.coalesce("mx", F.lit(0)).alias("m"))
        .localCheckpoint(eager=True)  # m_regs rows; feeds summary + histogram
    )
    summ = regs.agg(
        F.sum(F.pow(F.lit(2.0), F.lit(_HLL_W_BITS + 1) - F.col("m")).cast("long")).alias(
            "sum_scaled"
        ),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("n_zero"),
    )
    raw = F.lit(numer) / F.col("sum_scaled").cast("double")
    fin = summ.select(
        "sum_scaled",
        "n_zero",
        F.when(
            (raw <= F.lit(2.5 * m_regs)) & (F.col("n_zero") > 0),
            F.lit(float(m_regs)) * F.log(F.lit(float(m_regs)) / F.col("n_zero")),
        )
        .otherwise(raw)
        .alias("est"),
    )
    hist = regs.groupBy(F.col("m").cast("long").alias("rho")).agg(
        F.count("*").alias("n_registers")
    )
    return (
        hist.crossJoin(F.broadcast(fin))
        .crossJoin(F.broadcast(ex))
        .select(
            "rho",
            "n_registers",
            F.col("n_zero").cast("long").alias("n_zero"),
            F.col("sum_scaled").cast("long").alias("sum_scaled"),
            rnd(F.col("est"), 2).alias("est_hll"),
            "exact_distinct",
            F.when(  # empty-input contract: no exact count, no ratio
                F.col("exact_distinct") > 0,
                rnd(
                    F.lit(100.0)
                    * (F.col("est") - F.col("exact_distinct"))
                    / F.col("exact_distinct"),
                    2,
                ),
            ).alias("rel_err_pct"),
        )
        .orderBy("rho")
    )


def hll_sketch_stats(
    spark: SparkSession, sf_dir: str, bucket_chars: int
) -> DataFrame:
    """q_hll_sketch's body with the register count as a parameter
    (m = 16^bucket_chars; the registered query is bucket_chars=2,
    m=256) — tools/curve_sketch.py sweeps m for the measured
    accuracy table in SCALE.md. The register word is always the 13
    hex chars after the bucket prefix (52 bits)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket, rho = hll_bucket_rho(F.col("l_orderkey").cast("string"), bucket_chars)
    maxed = (
        li.select(bucket.alias("bucket"), rho.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("mx"))
    )
    ex = li.agg(F.countDistinct("l_orderkey").alias("exact_distinct"))
    return hll_finalize(spark, maxed, 16**bucket_chars, ex)


_KMV_KEY_SQL = "CAST(l_orderkey AS VARCHAR)"


@register(
    "q_kmv_theta",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT l_returnflag AS seg,
                   {_hash60_sql(_KMV_KEY_SQL)} AS h,
                   l_orderkey AS k
            FROM lineitem WHERE l_returnflag IN ('A', 'R')
        ),
        kth_a AS (SELECT MAX(h) AS kth FROM (
            SELECT h FROM keys WHERE seg = 'A'
            ORDER BY h LIMIT {_KMV_K})),
        kth_b AS (SELECT MAX(h) AS kth FROM (
            SELECT h FROM keys WHERE seg = 'R'
            ORDER BY h LIMIT {_KMV_K})),
        kth_u AS (SELECT MAX(h) AS kth FROM (
            SELECT h FROM (SELECT DISTINCT h FROM keys)
            ORDER BY h LIMIT {_KMV_K})),
        ex AS (
            SELECT COUNT(DISTINCT CASE WHEN seg = 'A' THEN k END) AS xa,
                   COUNT(DISTINCT CASE WHEN seg = 'R' THEN k END) AS xb,
                   COUNT(DISTINCT k) AS xu
            FROM keys
        ),
        ex_i AS (
            SELECT COUNT(*) AS xi FROM (
                SELECT k FROM keys GROUP BY k HAVING COUNT(DISTINCT seg) = 2)
        ),
        est AS (
            SELECT {float(_KMV_K - 1)!r} * {_KMV_HASH_SPACE!r}
                       / CAST(kth_a.kth AS DOUBLE) AS ea,
                   {float(_KMV_K - 1)!r} * {_KMV_HASH_SPACE!r}
                       / CAST(kth_b.kth AS DOUBLE) AS eb,
                   {float(_KMV_K - 1)!r} * {_KMV_HASH_SPACE!r}
                       / CAST(kth_u.kth AS DOUBLE) AS eu
            FROM kth_a, kth_b, kth_u
        )
        SELECT measure, {rnd_sql("est", 2)} AS est_distinct,
               exact_distinct,
               {rnd_sql("100.0 * (est - exact_distinct)"
                        " / exact_distinct", 2)} AS rel_err_pct
        FROM (
            SELECT 'seg_a' AS measure, ea AS est,
                   CAST(xa AS BIGINT) AS exact_distinct FROM est, ex
            UNION ALL
            SELECT 'seg_b', eb, CAST(xb AS BIGINT) FROM est, ex
            UNION ALL
            SELECT 'union', eu, CAST(xu AS BIGINT) FROM est, ex
            UNION ALL
            SELECT 'intersect', ea + eb - eu, CAST(xi AS BIGINT)
            FROM est, ex_i
        )
        ORDER BY measure
    """,
    doc=(
        "KMV / THETA SKETCH (round 11) — the k-minimum-values distinct "
        "sketch, the one sketch family that supports SET ALGEBRA: "
        "union and intersection estimates between already-built "
        "segment sketches with no re-scan. Segments = orderkeys seen "
        "under l_returnflag 'A' vs 'R' (overlapping sets: an order's "
        "lines can carry both flags). Per segment keep the k=64 "
        "smallest 60-bit portable hashes; estimate = (k-1) * 2^60 / "
        "kth_smallest (the classic KMV estimator); union sketch = k "
        "smallest of the combined hash sets; intersection by "
        "inclusion-exclusion. The k-smallest step is orderBy(h)."
        "limit(k) — Spark plans TakeOrderedAndProject, a per-partition "
        "partial top-k merged at the driver: 64 longs per partition "
        "cross the wire, never the key set, which is exactly how the "
        "sketch behaves on a 1000-executor corpus. Ranks are integer "
        "hashes (no float order sensitivity); estimates divide "
        "identical doubles in both engines and round through the "
        "tie-deterministic floor grid. Output: est vs exact vs signed "
        "rel-err for seg_a / seg_b / union / intersect."
    ),
    tags=("extension", "sketch", "agg", "setop"),
)
def q_kmv_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        li.where(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.col("l_returnflag").alias("seg"),
            _hash60(F.col("l_orderkey").cast("string")).alias("h"),
            F.col("l_orderkey").alias("k"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds 3 top-k + 2 exact branches
    )

    def kth(df: DataFrame, dedup: bool = False) -> DataFrame:
        # keys is distinct on (seg, h, k): within a segment, duplicate
        # h values can exist only as 60-bit hash COLLISIONS of two
        # keys (~2^-60 per pair). Both engines rank the identical
        # multiset (the oracle's segment CTEs carry no inner
        # DISTINCT), so a collision shifts kth identically on both
        # sides — estimator parity by construction, and skipping the
        # per-segment dedup saves 2 exchanges (plan advisor, round
        # 11). Only the union re-dedups: the SAME key legitimately
        # appears under both flags there.
        h = df.select("h").distinct() if dedup else df.select("h")
        return h.orderBy("h").limit(_KMV_K).agg(F.max("h").alias("kth"))

    kth_a = kth(keys.where(F.col("seg") == "A"))
    kth_b = kth(keys.where(F.col("seg") == "R"))
    kth_u = kth(keys, dedup=True)
    ex = keys.agg(
        F.countDistinct(F.when(F.col("seg") == "A", F.col("k"))).alias("xa"),
        F.countDistinct(F.when(F.col("seg") == "R", F.col("k"))).alias("xb"),
        F.countDistinct("k").alias("xu"),
    )
    ex_i = (
        keys.groupBy("k")
        .agg(F.countDistinct("seg").alias("nseg"))
        .where(F.col("nseg") == 2)
        .agg(F.count("*").alias("xi"))
    )
    scale = F.lit(float(_KMV_K - 1)) * F.lit(_KMV_HASH_SPACE)
    one = (
        kth_a.select(F.col("kth").alias("ka"))
        .crossJoin(kth_b.select(F.col("kth").alias("kb")))
        .crossJoin(kth_u.select(F.col("kth").alias("ku")))
        .crossJoin(ex)
        .crossJoin(ex_i)
        .select(
            (scale / F.col("ka").cast("double")).alias("ea"),
            (scale / F.col("kb").cast("double")).alias("eb"),
            (scale / F.col("ku").cast("double")).alias("eu"),
            F.col("xa").cast("long").alias("xa"),
            F.col("xb").cast("long").alias("xb"),
            F.col("xu").cast("long").alias("xu"),
            F.col("xi").cast("long").alias("xi"),
        )
    )
    rows = one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("seg_a").alias("measure"),
                    F.col("ea").alias("est"),
                    F.col("xa").alias("exact_distinct"),
                ),
                F.struct(
                    F.lit("seg_b").alias("measure"),
                    F.col("eb").alias("est"),
                    F.col("xb").alias("exact_distinct"),
                ),
                F.struct(
                    F.lit("union").alias("measure"),
                    F.col("eu").alias("est"),
                    F.col("xu").alias("exact_distinct"),
                ),
                F.struct(
                    F.lit("intersect").alias("measure"),
                    (F.col("ea") + F.col("eb") - F.col("eu")).alias("est"),
                    F.col("xi").alias("exact_distinct"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "measure",
        rnd(F.col("est"), 2).alias("est_distinct"),
        "exact_distinct",
        rnd(
            F.lit(100.0) * (F.col("est") - F.col("exact_distinct")) / F.col("exact_distinct"),
            2,
        ).alias("rel_err_pct"),
    ).orderBy("measure")


@register(
    "q_bloom_join",
    oracle=f"""
        WITH dim AS (
            SELECT o_orderkey FROM orders WHERE o_totalprice > {_BLOOM_CUTOFF!r}
        ),
        bits AS (
            SELECT DISTINCT bit FROM (
                SELECT CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                                              1, 8) AS BIGINT) % {_BLOOM_M} AS bit
                FROM dim
                UNION
                SELECT CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                                              9, 8) AS BIGINT) % {_BLOOM_M} AS bit
                FROM dim
            )
        ),
        probe AS (
            SELECT l_orderkey, l_extendedprice, l_discount,
                   CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
                                          1, 8) AS BIGINT) % {_BLOOM_M} AS b1,
                   CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
                                          9, 8) AS BIGINT) % {_BLOOM_M} AS b2
            FROM lineitem
        ),
        pass AS (
            SELECT * FROM probe
            WHERE b1 IN (SELECT bit FROM bits) AND b2 IN (SELECT bit FROM bits)
        ),
        matched AS (
            SELECT p.l_extendedprice, p.l_discount
            FROM pass p JOIN dim d ON p.l_orderkey = d.o_orderkey
        )
        SELECT (SELECT COUNT(*) FROM probe) AS probe_rows,
               (SELECT COUNT(*) FROM bits) AS bits_set,
               (SELECT COUNT(*) FROM pass) AS bloom_pass,
               (SELECT COUNT(*) FROM matched) AS true_match,
               (SELECT COUNT(*) FROM pass) -
                   (SELECT COUNT(*) FROM matched) AS false_pass,
               CASE WHEN (SELECT COUNT(*) FROM probe)
                         - (SELECT COUNT(*) FROM matched) = 0 THEN NULL ELSE
               {rnd_sql("CAST((SELECT COUNT(*) FROM pass)"
                        " - (SELECT COUNT(*) FROM matched) AS DOUBLE)"
                        " / ((SELECT COUNT(*) FROM probe)"
                        " - (SELECT COUNT(*) FROM matched))", 6)} END AS fp_rate,
               (SELECT {dsum_sql("l_extendedprice * (1 - l_discount)", 2)}
                FROM matched) AS revenue
    """,
    doc=(
        "BLOOM-FILTER SEMI-JOIN REDUCTION (round 11) — the runtime-"
        "filter pattern behind every modern engine's selective-join "
        "path (Spark injects these itself under AQE as "
        "InSubqueryExec/bloom runtime filters; this row makes the "
        "mechanism first-class and MEASURES its operating point). "
        "Build: the ~2% of orders above the price cutoff hash into a "
        "2^17-bit Bloom filter via two independent 32-bit halves of "
        "one md5 (k=2); the filter ships as a distinct bit-position "
        "table small enough to BROADCAST (~6k longs at sf0.1, 16 KiB "
        "as a real bitset). Probe: every lineitem row computes its "
        "two bit positions map-side and passes only if BOTH are set — "
        "two broadcast left-semi hash joins, zero shuffle of the fact "
        "table. The exact inner join afterwards deletes the false "
        "positives, so the RESULT is identical to the plain join (the "
        "oracle proves it) — the Bloom stage only moves WORK: at "
        "100 TB the shuffle after the pre-filter carries ~2% of rows "
        "plus the measured fp_rate (output column, ~0.2% at these "
        "parameters: (1 - e^(-2n/m))^2). Output is one row: probe/"
        "pass/match/false-pass counts, fp_rate, and the joined "
        "revenue aggregate."
    ),
    tags=("extension", "join", "sketch"),
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_join_stats(spark, sf_dir, _BLOOM_M)


def bloom_join_stats(spark: SparkSession, sf_dir: str, m: int) -> DataFrame:
    """q_bloom_join's body with the filter size as a parameter —
    tools/curve_bloomjoin.py sweeps m to chart the measured
    false-positive operating curve committed in SCALE.md."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    dim = orders.where(F.col("o_totalprice") > _BLOOM_CUTOFF).select("o_orderkey")
    dmd = F.md5(F.col("o_orderkey").cast("string"))
    bits = (
        dim.select(
            (F.conv(F.substring(dmd, 1, 8), 16, 10).cast("long") % m).alias("bit")
        )
        .union(
            dim.select(
                (F.conv(F.substring(dmd, 9, 8), 16, 10).cast("long") % m).alias(
                    "bit"
                )
            )
        )
        .distinct()
        .localCheckpoint(eager=True)  # the broadcast filter state, built once
    )
    pmd = F.md5(F.col("l_orderkey").cast("string"))
    probe = li.select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        (F.conv(F.substring(pmd, 1, 8), 16, 10).cast("long") % m).alias("b1"),
        (F.conv(F.substring(pmd, 9, 8), 16, 10).cast("long") % m).alias("b2"),
    )
    passed = probe.join(
        F.broadcast(bits.withColumnRenamed("bit", "b1")), "b1", "left_semi"
    ).join(F.broadcast(bits.withColumnRenamed("bit", "b2")), "b2", "left_semi")
    matched = passed.join(
        F.broadcast(dim), passed.l_orderkey == dim.o_orderkey, "inner"
    )
    probe_n = probe.agg(F.count("*").alias("probe_rows"))
    bits_n = bits.agg(F.count("*").alias("bits_set"))
    pass_n = passed.agg(F.count("*").alias("bloom_pass"))
    match_agg = matched.agg(
        F.count("*").alias("true_match"),
        # dsum, not a double SUM: partial-agg order must not move cents
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
    )
    return (
        probe_n.crossJoin(F.broadcast(bits_n))
        .crossJoin(F.broadcast(pass_n))
        .crossJoin(F.broadcast(match_agg))
        .select(
            "probe_rows",
            "bits_set",
            "bloom_pass",
            "true_match",
            (F.col("bloom_pass") - F.col("true_match")).alias("false_pass"),
            F.when(  # empty-input contract: zero probes, no rate
                F.col("probe_rows") - F.col("true_match") > 0,
                rnd(
                    (F.col("bloom_pass") - F.col("true_match")).cast("double")
                    / (F.col("probe_rows") - F.col("true_match")),
                    6,
                ),
            ).alias("fp_rate"),
            "revenue",
        )
    )
