"""Scalar-function batteries (SURVEY.md §2.8).

Reference-exercised scalars: SUBSTR (Query 2), date comparison
(Query 3), regex extraction (Query 4's url_count.py) [P]; the rest
is completeness required by the testdata shape.

Dialect-parity rules (SURVEY.md §5.2): engine-generated integers are
cast to BIGINT on the Spark side (DuckDB's length/strpos/year/...
return BIGINT); TIMESTAMP literals, never DATE casts, for the
ms/ns-granular timestamp columns; doubles rounded on both sides.
BOOLEAN outputs are cast to INT and bare DATE outputs to STRING on
BOTH engines — values are identical but the external harness's
value-hash serializes those types engine-specifically (the round-1
q_bool_agg failure mode; the computation under the cast is unchanged).
All functions here run JVM-side inside whole-stage codegen — no
Python boundary anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import register


@register(
    "q_string",
    oracle="""
        SELECT n_nationkey,
               lower(n_name)                          AS lo,
               upper(concat(n_name, '_X'))            AS up,
               CAST(length(n_name) AS BIGINT)         AS len,
               substr(n_name, 1, 3)                   AS pre,
               trim(concat('  ', n_name, '  '))       AS tr,
               regexp_replace(n_name, '[AEIOU]', '_', 'g') AS vowelless,
               CAST(strpos(n_name, 'A') AS BIGINT)    AS a_pos,
               lpad(n_name, 12, '*')                  AS padded,
               reverse(n_name)                        AS rev,
               CAST(n_name LIKE '%A%' AS INTEGER)     AS has_a
        FROM nation
    """,
    doc="String battery: substr (reference Q2 surface) + lower/upper/length/trim/concat/regexp/instr/lpad/reverse/LIKE.",
    tags=("completeness", "scalar"),
)
def q_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation", assert_schema=False)
    return nation.select(
        "n_nationkey",
        F.lower("n_name").alias("lo"),
        F.upper(F.concat(F.col("n_name"), F.lit("_X"))).alias("up"),
        F.length("n_name").cast("long").alias("len"),
        F.substring("n_name", 1, 3).alias("pre"),
        F.trim(F.concat(F.lit("  "), F.col("n_name"), F.lit("  "))).alias("tr"),
        F.regexp_replace("n_name", "[AEIOU]", "_").alias("vowelless"),
        F.instr(F.col("n_name"), "A").cast("long").alias("a_pos"),
        F.lpad("n_name", 12, "*").alias("padded"),
        F.reverse("n_name").alias("rev"),
        F.col("n_name").like("%A%").cast("int").alias("has_a"),
    )


@register(
    "q_date",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT)    AS yr,
               CAST(month(o_orderdate) AS BIGINT)   AS mo,
               CAST(day(o_orderdate) AS BIGINT)     AS dom,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since,
               o_orderdate + INTERVAL 30 DAY        AS due,
               epoch_us(o_orderdate)                AS us,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d
        FROM orders
        WHERE o_orderkey < 500
    """,
    doc="Date/time battery over the ms-granular o_orderdate: extract/trunc/diff/add/epoch/cast (SURVEY.md §2.8 [Q:q_date]).",
    tags=("completeness", "scalar"),
)
def q_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        )
        .cast("long")
        .alias("days_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due"),
        F.unix_micros("o_orderdate").alias("us"),
        F.col("o_orderdate").cast("date").cast("string").alias("d"),
    )


@register(
    "q_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 1)                    AS r1,
               CAST(floor(l_extendedprice) AS BIGINT)       AS fl,
               CAST(ceil(l_extendedprice) AS BIGINT)        AS ce,
               abs(l_discount - 0.05)                       AS ab,
               round(sqrt(l_quantity), 6)                   AS sq,
               round(ln(l_extendedprice), 6)                AS lg,
               round(exp(l_discount), 6)                    AS ex,
               round(power(l_quantity, 2), 2)               AS p2,
               CAST(sign(l_discount - 0.05) AS DOUBLE)      AS sg,
               l_linenumber % 3                             AS m3,
               round(l_extendedprice * (1 - l_discount), 4) AS net
        FROM lineitem
        WHERE l_orderkey < 100
    """,
    doc="Math battery incl. the reference's revenue arithmetic l_extendedprice*(1-l_discount) (Q3 shape).",
    tags=("completeness", "scalar"),
)
def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", assert_schema=False)
    return li.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_extendedprice").cast("long").alias("fl"),
        F.ceil("l_extendedprice").cast("long").alias("ce"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        F.round(F.log("l_extendedprice"), 6).alias("lg"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.pow("l_quantity", 2), 2).alias("p2"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("sg"),
        (F.col("l_linenumber") % 3).alias("m3"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
    )


@register(
    "q_cond",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 400000 THEN 'high'
                    WHEN o_totalprice > 200000 THEN 'mid'
                    ELSE 'low' END                                   AS tier,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING')       AS status2,
               least(o_totalprice, 250000.0)                         AS capped,
               greatest(o_totalprice, 250000.0)                      AS floored
        FROM orders
        WHERE o_orderkey < 1000
    """,
    doc="Conditional battery: CASE WHEN / coalesce / nullif / least / greatest (SURVEY.md §2.8 [Q:q_cond]).",
    tags=("completeness", "scalar"),
)
def q_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 400000, "high")
        .when(F.col("o_totalprice") > 200000, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status2"
        ),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("floored"),
    )


@register(
    "q_array",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT)                       AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)        AS n_uniq,
               CAST(list_contains(string_split(text, ' '), 'data') AS INTEGER)    AS has_data,
               string_split(text, ' ')[1]                                         AS first_tok,
               array_to_string(list_sort(string_split(text, ' '))[1:3], '|')      AS sorted3,
               CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS BIGINT) AS n_long
        FROM documents
    """,
    doc=(
        "Array battery over tokenized text: size/distinct/contains/indexing/slice/"
        "sort_array + higher-order filter (SURVEY.md §2.8 [Q:q_array]). Vector-array "
        "(embedding) higher-order fns are exercised by q8_knn."
    ),
    tags=("completeness", "scalar"),
)
def q_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.array_contains(toks, "data").cast("int").alias("has_data"),
        F.element_at(toks, 1).alias("first_tok"),
        # serialized (not a raw array) so the cross-engine hash compares
        # scalars rather than engine-specific array renderings
        F.concat_ws("|", F.slice(F.sort_array(toks), 1, 3)).alias("sorted3"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("long").alias("n_long"),
    )


@register(
    "q_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k2
        FROM events
        WHERE event_id < 2000
    """,
    doc="JSON battery: path extraction from the props column + typed cast (SURVEY.md §2.8 [Q:q_json]); from_json/map functions tested in tests/test_scalars.py.",
    tags=("completeness", "scalar"),
)
def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    k = F.get_json_object("props", "$.k").cast("int")
    return events.filter(F.col("event_id") < 2000).select(
        "event_id", k.alias("k"), (k * 2).alias("k2")
    )


@register(
    "q_map_funcs",
    oracle="""
        SELECT event_id,
               CAST(len(json_keys(props)) AS BIGINT)            AS n_keys,
               array_to_string(json_keys(props), ',')           AS keys_csv,
               array_to_string(list_transform(json_keys(props),
                   kk -> json_extract_string(props, '$.' || kk)), ',') AS vals_csv,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
               CAST(json_extract(props, '$.k') IS NOT NULL AS INTEGER) AS has_k
        FROM events
        WHERE event_id < 2000
    """,
    doc=(
        "Map-function battery (SURVEY.md §2.8 Map row): from_json(props, "
        "'map<string,int>') then map_keys / map_values / element_at / "
        "map_contains_key / size, the map-typed column surface. Array-valued "
        "keys/values are serialized to CSV strings (driver canonicalizer "
        "cannot sort list cells); DuckDB replays via json_keys/json_extract. "
        "map_from_entries/to_json round-trips stay in tests/test_scalars.py."
    ),
    tags=("completeness", "scalar"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    m = F.from_json("props", "map<string,int>")
    return (
        events.filter(F.col("event_id") < 2000)
        .select("event_id", m.alias("m"))
        .select(
            "event_id",
            F.size("m").cast("long").alias("n_keys"),
            F.concat_ws(",", F.map_keys("m")).alias("keys_csv"),
            F.concat_ws(
                ",", F.transform(F.map_values("m"), lambda v: v.cast("string"))
            ).alias("vals_csv"),
            F.element_at("m", "k").alias("k_val"),
            F.map_contains_key("m", "k").cast("int").alias("has_k"),
        )
    )


@register(
    "q_cast",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR)                        AS key_str,
               CAST(substr(o_orderpriority, 1, 1) AS INTEGER)     AS prio_num,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR)         AS date_str,
               CAST(o_custkey AS DOUBLE)                          AS cust_dbl
        FROM orders
        WHERE o_orderkey < 1000
    """,
    doc="Cast battery across the catalog's types (SURVEY.md §2.8): int<->string, string->int, timestamp->date->string, int->double.",
    tags=("completeness", "scalar"),
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", assert_schema=False)
    return orders.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.col("o_custkey").cast("double").alias("cust_dbl"),
    )


@register(
    "q_hash",
    oracle="SELECT doc_id, md5(text) AS fp FROM documents",
    doc=(
        "Cross-engine-stable content hash (md5) — the dedup fingerprint primitive "
        "(SURVEY.md §2.8). Engine-specific hashes (xxhash64/hash) power minhash/LSH "
        "internally (rows-only surfaces) and are tested in tests/test_scalars.py."
    ),
    tags=("extension", "scalar"),
)
def q_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", assert_schema=False)
    return docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("fp"))


@register(
    "q_variant",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max,
               CAST(COUNT(*) FILTER (WHERE props->>'$.missing' IS NULL)
                    AS BIGINT) AS n_missing
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc=(
        "Semi-structured VARIANT column (Spark 4, SURVEY.md §2.8 JSON "
        "family): events.props is parsed ONCE into the binary VARIANT "
        "encoding (parse_json), then fields are extracted with typed "
        "variant_get path access — the lakehouse pattern that replaces "
        "per-access JSON string re-parsing (get_json_object re-parses "
        "the string on EVERY extraction; variant_get navigates the "
        "decoded binary). try_variant_get on an absent path yields NULL "
        "rather than an error, counted here to pin the missing-field "
        "contract. At 100 TB the parse cost is paid once at ingest and "
        "the variant column is stored shredded, so this is also the "
        "write-path recommendation for the props-style grab-bag column. "
        "Oracle replays with DuckDB JSON path extraction."
    ),
    tags=("extension", "scalar", "json"),
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events", assert_schema=False)
    v = events.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "long")
    missing = F.try_variant_get(F.col("v"), "$.missing", "long")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("k_sum"),
            F.max(k).alias("k_max"),
            F.count_if(missing.isNull()).alias("n_missing"),
        )
        .orderBy("event_type")
    )
