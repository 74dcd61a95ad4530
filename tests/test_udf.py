"""UDF surfaces agree with their native twins (SURVEY.md §2.10)."""

from pyspark.sql import functions as F

from benchmark_spark.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def _counts(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_pipe_fidelity_matches_idiomatic_wordcount(spark):
    """The external-script (RDD.pipe) Query-4 fidelity mode produces
    exactly the idiomatic explode/groupBy counts."""
    pipe = _counts(SPECS["q_pipe_wordcount"].fn(spark, SF_SMOKE), "word", "cnt")
    native = _counts(SPECS["q4_wordcount"].fn(spark, SF_SMOKE), "word", "cnt")
    assert pipe == native


def test_udtf_matches_posexplode(spark):
    udtf_rows = SPECS["q_udtf"].fn(spark, SF_SMOKE)
    from benchmark_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    native = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", "word", F.col("pos").cast("long").alias("pos"))
    assert udtf_rows.count() == native.count()
    assert udtf_rows.exceptAll(native.select("doc_id", "word", "pos")).count() == 0


def test_two_step_wordcount_equals_fused(spark):
    fused = _counts(SPECS["q4_wordcount"].fn(spark, SF_SMOKE), "word", "cnt")
    two_step = _counts(SPECS["q4_two_step"].fn(spark, SF_SMOKE), "word", "total")
    assert fused == two_step


def test_polymorphic_udtf_schema_tracks_argument(spark):
    """The analyze() contract: the same UDTF plans different schemas
    for different argument values."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NG:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                T.StructType(
                    [T.StructField(f"w{i + 1}", T.StringType()) for i in range(n.value)]
                )
            )

        def eval(self, text, n):
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    spark.udtf.register("ng_schema_probe", NG)
    two = spark.sql("SELECT * FROM ng_schema_probe('a b c d', 2)")
    four = spark.sql("SELECT * FROM ng_schema_probe('a b c d', 4)")
    assert two.columns == ["w1", "w2"]
    assert four.columns == ["w1", "w2", "w3", "w4"]
    assert two.count() == 3 and four.count() == 1
