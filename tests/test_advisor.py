"""Plan-advisor rules: each anti-pattern rule must fire on a plan
that exhibits it and stay silent on the clean twin."""

from pyspark.sql import functions as F
from pyspark.sql.functions import udf

from benchmark_spark.catalog import load_table
from benchmark_spark.plans.advisor import advise
from benchmark_spark.registry import get_query
from tests.conftest import SF_SMOKE


def _rules(findings):
    return {f.rule for f in findings}


def test_flags_cartesian_product(spark):
    a = load_table(spark, SF_SMOKE, "nation", assert_schema=False)
    b = load_table(spark, SF_SMOKE, "region", assert_schema=False)
    bad = a.crossJoin(b.hint("shuffle_replicate_nl"))
    assert "cartesian-product" in _rules(advise(bad))


def test_flags_row_python_udf_but_not_pandas(spark):
    orders = load_table(spark, SF_SMOKE, "orders", assert_schema=False)
    slow = udf(lambda x: x * 2.0, "double")
    bad = orders.select(slow(F.col("o_totalprice")).alias("d"))
    assert "row-python-udf" in _rules(advise(bad))
    good = orders.select((F.col("o_totalprice") * 2.0).alias("d"))
    assert "row-python-udf" not in _rules(advise(good))


def test_headline_queries_are_clean(spark):
    for name in ("q1_scan", "q2_agg", "q3_join", "q5_pricing", "q6_window"):
        findings = advise(get_query(name).fn(spark, SF_SMOKE))
        errors = [f for f in findings if f.severity == "error"]
        assert not errors, (name, errors)


def test_flags_wide_read_narrow_output(spark):
    # Catalyst prunes through filters and even Python UDFs (verified:
    # a UDF filter still narrows ReadSchema), so the wide-read flag
    # fires only when the expressions genuinely consume every column —
    # e.g. serializing whole rows to emit one value. The advisor warns
    # so the user confirms the full-width read is intended.
    orders = load_table(spark, SF_SMOKE, "orders", assert_schema=False)
    wide = orders.select(
        F.length(F.to_json(F.struct(*orders.columns))).alias("n")
    )
    assert "column-pruning" in _rules(advise(wide))
    narrow = orders.select((F.col("o_totalprice") * 2).alias("d"))
    assert "column-pruning" not in _rules(advise(narrow))


def test_flags_skew_split_blocked_join(spark):
    """A shuffle join whose dim is derived via distinct() of the fact
    cannot be AQE-skew-split (the distinct's aggregate sits between
    shuffle and join — measured, see test_plans skew pin); the rule
    must fire there and stay silent when both sides read the shuffle
    directly."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
        blocked = fact.join(fact.selectExpr("k AS dk").distinct(), F.expr("k = dk"))
        assert "skew-split-blocked" in _rules(advise(blocked))
        direct = fact.join(
            spark.range(7).selectExpr("id AS dk"), F.expr("k = dk")
        )
        assert "skew-split-blocked" not in _rules(advise(direct))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_flags_partition_consuming_agg_above_skew_join(spark):
    """distinct() directly above a shuffle join consumes the join's
    hash partitioning (partial+final agg pair, no exchange between),
    which blocks AQE skew splitting (measured); a groupBy on
    UNRELATED keys leaves only the requirement-free partial agg above
    the join and must stay silent."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
        dim = spark.range(7).selectExpr("id AS dk", "id % 3 AS attr")
        joined = fact.join(dim, F.expr("k = dk"))
        blocked = joined.select("k", "dk", "v").distinct()
        assert "skew-split-blocked" in _rules(advise(blocked))
        fine = joined.groupBy("attr").count()
        assert "skew-split-blocked" not in _rules(advise(fine))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_flags_interpreted_hof_feeding_topk(spark):
    """The q8_knn round-8 lesson: a CodegenFallback higher-order
    function evaluated in (or directly beneath) TakeOrderedAndProject
    is flagged; the shipped explode/partial-sum rewrite and ordinary
    map-side HOF use are not."""
    emb = load_table(spark, SF_SMOKE, "embeddings", assert_schema=False)

    def dot_zip(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    anchor = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("anchor_emb"))
    bad = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(anchor))
        .select("vec_id", F.round(dot_zip(F.col("embedding"), F.col("anchor_emb")), 4).alias("score"))
        .orderBy(F.desc("score"))
        .limit(10)
    )
    assert "interpreted-hof-in-topk" in _rules(advise(bad))
    # shipped q8_knn computes the score in a codegen aggregate first
    assert "interpreted-hof-in-topk" not in _rules(advise(get_query("q8_knn").fn(spark, SF_SMOKE)))
    # map-side HOF with no top-k sort on the lambda output stays clean
    assert "interpreted-hof-in-topk" not in _rules(
        advise(get_query("q_winnow_fingerprint").fn(spark, SF_SMOKE))
    )
