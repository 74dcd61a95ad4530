"""Task-retry resilience: exactly-once results under transient failures.

On a 1000-executor cluster, task retries (and speculative re-execution)
are routine; a pipeline is only correct at that scale if every stage is
a pure function of its input rows. That's why the engine derives ALL
sampling/ordering randomness from content hashes (md5/xxhash64 of row
keys — llm/corpus.py house rule), never rand() or partition-local RNG
state.

This test MEASURES the property instead of asserting it: it runs a
content-hash sampling pipeline (the q_reservoir_sample shape) with a
Python stage in the middle, plants a transient task failure on the
first attempt (master ``local[4,2]`` = 2 task attempts), and asserts
the retried run is row-identical to a failure-free run — Spark's
lineage recomputation plus deterministic operators gives exactly-once
results even through a failed task.

The injection needs ``spark.task.maxFailures`` > 1, which is fixed at
SparkContext construction — impossible to change on the shared session
fixture — so this runs in a subprocess with its own short-lived
local[4,2] session.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys

repo, flag_dir, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

spark = (
    SparkSession.builder.master("local[4,2]")  # 4 threads, 2 task attempts
    .appName("retry-resilience")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
FLAG = os.path.join(flag_dir, "injected")


def flaky(inject):
    # Executor-side pass-through stage; on the FIRST task attempt that
    # reaches it (cross-task coordination via an O_EXCL flag file on
    # the shared local filesystem) it dies mid-stream, so Spark must
    # retry that task from its shuffle input.
    def gen(it):
        armed = inject
        for pdf in it:
            if armed:
                armed = False
                try:
                    os.close(os.open(FLAG, os.O_CREAT | os.O_EXCL))
                except FileExistsError:
                    pass  # another task already injected the failure
                else:
                    raise RuntimeError("planted transient task failure")
            yield pdf
    return gen


def pipeline(inject):
    # q_reservoir_sample's shape with a Python stage in the middle:
    # shuffle -> mapInPandas -> window rank by content hash -> filter.
    base = docs.repartition(4, "doc_id").mapInPandas(flaky(inject), schema=docs.schema)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        base.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
    )


clean = sorted(map(tuple, pipeline(False).collect()))
flaked = sorted(map(tuple, pipeline(True).collect()))
assert clean, "pipeline returned no rows"
assert os.path.exists(FLAG), "the transient failure was never injected"
assert clean == flaked, "task retry changed the sampled rows"
print("RETRY_OK", len(clean))
spark.stop()
"""


def test_transient_task_failure_is_exactly_once(tmp_path):
    script = tmp_path / "retry_probe.py"
    script.write_text(_SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script), REPO, str(tmp_path), "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"probe failed:\n{proc.stdout}\n{proc.stderr}"
    assert "RETRY_OK" in proc.stdout
    # the planted failure really happened: the FLAG file is written by
    # the failing UDF invocation itself, so its existence proves the
    # injection fired. (ADVICE r7: the old stderr grep for the
    # exception text depended on Spark logging the Python worker
    # traceback at ERROR level in local mode — version/log4j-config
    # dependent — so it is advisory-only now.)
    assert (tmp_path / "injected").exists()
    if "planted transient task failure" not in proc.stderr:
        print("[advisory] planted-failure traceback not in stderr (log config dependent)")
