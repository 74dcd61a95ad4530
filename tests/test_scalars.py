"""Null semantics + function surfaces the fixtures can't exercise
(no NULLs anywhere in testdata — FIXTURES.md), via constructed
literals; plus JSON/map round-trips and engine-hash determinism."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_null_semantics_three_valued_logic(spark):
    df = spark.createDataFrame(
        [Row(x=1, s="a"), Row(x=None, s=None), Row(x=3, s="b")]
    )
    # NULL comparisons are UNKNOWN -> filtered out, not matched
    assert df.filter(F.col("x") > 0).count() == 2
    assert df.filter(~(F.col("x") > 0)).count() == 0
    assert df.filter(F.col("x").isNull()).count() == 1
    # null-safe equality
    assert df.filter(F.col("x").eqNullSafe(None)).count() == 1
    # aggregates skip nulls; count(*) doesn't
    row = df.agg(
        F.count(F.lit(1)).alias("all"),
        F.count("x").alias("nn"),
        F.sum("x").alias("s"),
        F.avg("x").alias("a"),
    ).first()
    assert (row["all"], row["nn"], row["s"], row["a"]) == (3, 2, 4, 2.0)


def test_null_joins_and_coalesce(spark):
    left = spark.createDataFrame([Row(k=1), Row(k=None)])
    right = spark.createDataFrame([Row(k=1), Row(k=None)])
    # NULL keys never match in equi joins
    assert left.join(right, "k").count() == 1
    out = left.select(F.coalesce(F.col("k"), F.lit(-1)).alias("k2")).collect()
    assert sorted(r["k2"] for r in out) == [-1, 1]


def test_from_json_map_functions(spark):
    from benchmark_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    parsed = events.select(
        "event_id",
        F.from_json("props", "map<string,int>").alias("m"),
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
    ).select(
        "event_id",
        F.map_keys("m").alias("keys"),
        F.element_at("m", "k").alias("k_map"),
        "k_path",
    )
    bad = parsed.filter(
        (F.col("k_map") != F.col("k_path")) | ~F.array_contains("keys", "k")
    )
    assert bad.count() == 0


def test_to_json_round_trip(spark):
    df = spark.createDataFrame([Row(m={"k": 7})])
    s = df.select(F.to_json(F.col("m")).alias("j")).first()["j"]
    assert s == '{"k":7}'
    back = (
        spark.createDataFrame([Row(j=s)])
        .select(F.from_json("j", "map<string,int>").alias("m"))
        .first()["m"]
    )
    assert back == {"k": 7}


def test_engine_hashes_are_deterministic(spark):
    df = spark.createDataFrame([Row(s="abc")])
    cols = df.select(
        F.xxhash64("s").alias("xx"),
        F.hash("s").alias("h"),
        F.md5(F.col("s").cast("binary")).alias("m"),
        F.sha2(F.col("s").cast("binary"), 256).alias("sh"),
    ).first()
    # stable across runs/sessions (documented Spark seeds)
    assert cols["m"] == "900150983cd24fb0d6963f7d28e17f72"
    assert (
        cols["sh"]
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    again = df.select(F.xxhash64("s").alias("xx"), F.hash("s").alias("h")).first()
    assert (cols["xx"], cols["h"]) == (again["xx"], again["h"])


def test_row_at_a_time_udf_matches_native(spark):
    """The slow-path scalar UDF surface exists and agrees with the
    native expression (kept out of all hot paths by design)."""
    from benchmark_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").limit(200)

    @F.udf("double")
    def net_py(p, d):
        return p * (1.0 - d)

    both = li.select(
        net_py("l_extendedprice", "l_discount").alias("u"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("n"),
    )
    assert both.filter(F.abs(F.col("u") - F.col("n")) > 1e-9).count() == 0
