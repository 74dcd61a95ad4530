"""Regression tests for the driver-serialization mimic in testing.py.

The driver compares Spark toPandas() against DuckDB fetchdf() after a
sort-by-all-columns canonicalization, hashing the dtyped string form of
every cell. Two failure classes slipped past the old fetchall()-based
gate (r1 q_agg_funcs, r2 q_bool_agg, r2 q_multimodal_features):

  1. dtype divergence — DuckDB HUGEINT materializes as float64
     ('2487.0') while Spark emits int64 ('2487'); plain fetchall()
     yields a Python int on both sides and compares equal.
  2. canonicalizer crash — array-typed cells are unhashable, so the
     driver's sort_values dies before any comparison happens.

These tests pin that the hardened gate catches both WITHOUT Spark —
pure pandas frames stand in for toPandas() output.
"""

import duckdb
import pandas as pd

from benchmark_spark.testing import _pandas_mimic_mismatches


def test_hugeint_float64_vs_int64_is_caught():
    con = duckdb.connect()
    # count_if returns HUGEINT -> pandas float64: the exact r2 q_bool_agg bug
    oracle_pdf = con.execute(
        "SELECT count_if(i > 2) AS n_big FROM range(10) t(i)"
    ).fetchdf()
    assert str(oracle_pdf["n_big"].dtype) == "float64", "HUGEINT no longer float64?"
    spark_pdf = pd.DataFrame({"n_big": pd.array([7], dtype="int64")})
    mismatches = _pandas_mimic_mismatches(spark_pdf, oracle_pdf)
    assert mismatches, "gate must flag int64 vs float64 serialization"
    assert any("dtype" in m or "differs" in m for m in mismatches)


def test_hugeint_cast_bigint_passes():
    con = duckdb.connect()
    oracle_pdf = con.execute(
        "SELECT CAST(count_if(i > 2) AS BIGINT) AS n_big FROM range(10) t(i)"
    ).fetchdf()
    spark_pdf = pd.DataFrame({"n_big": pd.array([7], dtype="int64")})
    assert _pandas_mimic_mismatches(spark_pdf, oracle_pdf) == []


def test_unsortable_array_column_is_caught():
    pdf = pd.DataFrame({"k": [2, 1], "feature": [[0.1, 0.2], [0.3, 0.4]]})
    mismatches = _pandas_mimic_mismatches(pdf, pdf.copy())
    assert mismatches and "CRASH" in mismatches[0]


def test_identical_typed_frames_pass():
    pdf = pd.DataFrame(
        {
            "k": pd.array([1, 2, 3], dtype="int64"),
            "v": pd.array([0.5, 1.5, float("nan")], dtype="float64"),
            "s": ["a", "b", None],
        }
    )
    shuffled = pdf.iloc[[2, 0, 1]].reset_index(drop=True)
    assert _pandas_mimic_mismatches(pdf, shuffled) == []
