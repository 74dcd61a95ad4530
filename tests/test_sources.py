"""Source/sink round-trips (SURVEY.md §2.1): CSV/JSON ingest with
declared schemas, partitioned parquet sink, bucketed tables that
eliminate the join shuffle."""

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.plans.inspect import count_exchanges
from benchmark_spark.sources.readers import read_csv, read_json, write_bucketed, write_parquet
from tests.conftest import SF_SMOKE


def test_csv_round_trip_with_declared_schema(spark, tmp_path):
    nation = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, "nation")
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )
    assert back.schema == nation.schema


def test_json_round_trip_with_declared_schema(spark, tmp_path):
    cust = load_table(spark, SF_SMOKE, "customer")
    path = str(tmp_path / "customer_json")
    cust.write.mode("overwrite").json(path)
    back = read_json(spark, path, "customer")
    assert back.count() == cust.count()
    assert back.agg(F.sum("c_custkey")).first()[0] == cust.agg(F.sum("c_custkey")).first()[0]


def test_partitioned_parquet_sink(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_part")
    write_parquet(
        orders.withColumn("status", F.col("o_orderstatus")), path, partition_by=["status"]
    )
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(r["status"] for r in back.select("status").distinct().collect()) == {
        "F",
        "O",
        "P",
    }


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Pre-bucketing both sides by the join key removes the join's
    Exchange — the 100 TB co-located-join strategy (SURVEY.md §4)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    write_bucketed(li, "li_b", 4, ["l_orderkey"], str(tmp_path / "li_b"))
    write_bucketed(orders, "ord_b", 4, ["o_orderkey"], str(tmp_path / "ord_b"))
    joined = (
        spark.table("li_b")
        .hint("merge")
        .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "o_totalprice")
    )
    assert count_exchanges(joined) == 0, "bucketed join must not shuffle"
    assert joined.count() == li.count()


def test_compaction_reduces_files_without_shuffle(spark):
    from benchmark_spark.sources.readers import _stage_path, q_compaction

    out = q_compaction(spark, SF_SMOKE)
    assert out.count() == 3  # O/F/P statuses
    import glob

    frag_files = glob.glob(
        _stage_path(SF_SMOKE, "fragmented", "orders") + "/*.parquet"
    )
    comp_files = glob.glob(
        _stage_path(SF_SMOKE, "compacted", "orders") + "/*.parquet"
    )
    assert len(frag_files) == 32
    assert 1 <= len(comp_files) <= 2
    # coalesce is a narrow dependency: the rewrite plans no Exchange
    frag_df = spark.read.parquet(_stage_path(SF_SMOKE, "fragmented", "orders"))
    plan = frag_df.coalesce(2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_targeted_delete_erases_exactly_the_victims(spark):
    from benchmark_spark.sources.readers import q_targeted_delete

    rows = q_targeted_delete(spark, SF_SMOKE).collect()
    assert all(r["leftover"] == 0 for r in rows)
    orders = load_table(spark, SF_SMOKE, "orders", assert_schema=False)
    survivors = orders.filter(F.col("o_custkey") % 97 != 0).count()
    assert sum(r["n"] for r in rows) == survivors
    assert orders.count() > survivors  # the deletion list was non-empty


def test_python_datasink_manifest_commit_is_atomic(spark, tmp_path):
    """The write protocol's load-bearing property: readers resolve the
    _MANIFEST, never the directory listing — an orphan file from a
    failed/duplicate task attempt must be invisible, and abort() must
    unstage. Also: manifest row count equals the frame row count."""
    import json
    import os

    from benchmark_spark.sources.pysource import JsonlSinkSource, JsonlSinkWriter

    try:
        spark.dataSource.register(JsonlSinkSource)
    except Exception:
        pass
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr(
        "CAST(id % 3 AS STRING) AS event_type", "CAST(id AS DOUBLE) AS value"
    )
    df.write.format("jsonlsink").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["rows"] == 100
    # plant an orphan (a failed attempt's leftover): manifest readers
    # must not see its rows
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write('{"event_type": "x", "value": 1.0}\n')
    files = [os.path.join(out, n) for n in manifest["files"]]
    back = spark.read.schema("event_type string, value double").json(files)
    assert back.count() == 100
    assert back.filter("event_type = 'x'").count() == 0
    # abort() unstages exactly the staged files
    w = JsonlSinkWriter({"path": out})
    msgs = [type("M", (), {"filename": manifest["files"][0]})()]
    w.abort(msgs)
    assert not os.path.exists(files[0])
