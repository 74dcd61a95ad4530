"""Round-trip the reference's four storage-format variants
(text / text-deflate / sequence / sequence-snappy, SURVEY.md §1.1)."""

import pytest

from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.sources.formats import FORMATS, read_format, write_format
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("fmt", FORMATS)
def test_orders_round_trip(spark, fmt, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    write_format(orders, path, fmt)
    back = read_format(spark, path, "orders", fmt)
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in orders.schema.fields
    ]
    a = orders.agg(
        F.count(F.lit(1)), F.sum("o_orderkey"), F.sum("o_totalprice"), F.max("o_orderdate")
    ).first()
    b = back.agg(
        F.count(F.lit(1)), F.sum("o_orderkey"), F.sum("o_totalprice"), F.max("o_orderdate")
    ).first()
    assert tuple(a) == tuple(b)


def test_text_round_trip_is_row_exact(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "lineitem_text")
    write_format(li, path, "text")
    back = read_format(spark, path, "lineitem", "text")
    assert back.exceptAll(li).count() == 0
    assert li.exceptAll(back).count() == 0
