#!/usr/bin/env python3
"""Wall-time-vs-rows scaling curves for the heavy LLM-tier operators.

SCALE.md claims the dedup/ANN/high-card-agg tiers are LINEAR in corpus
size (bucketed LSH instead of all-pairs, two-phase agg, per-anchor
probes). This tool MEASURES those claims (VERDICT.md r4 item 3): build
N-times replicas of the sf0.1 inputs, run each query at x1 / x10 / x30,
and print one JSON line of median seconds per scale so SCALE.md can
cite a curve instead of a plan shape.

Replica construction keeps each query's WORK model honest:

* documents — replica i's tokens are rewritten to md5(token|i) prefixes
  (i=0 keeps the original text). Verbatim copies would make every doc
  an exact near-dup of its 2N-1 siblings, growing true-positive pairs
  (and any correct tool's output) QUADRATICALLY — a corpus-growth model
  nobody dedups under. Salting keeps the near-dup structure constant
  per replica (each doc + its planted mutant from doubled_corpus),
  which is the linear-growth model the 100 TB claim is about.
* embeddings — vec_id shifted per replica, vectors kept: candidate
  generation per anchor grows linearly with bucket occupancy.
* orders — o_orderkey AND o_custkey shifted per replica so the
  (custkey, month) group count scales with rows — the point of the
  high-cardinality agg.

Usage: python tools/scale_curve.py [multipliers...]   (default 1 10 30)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
QUERIES = [
    q
    for q in os.environ.get(
        "SPARK_GRAFT_CURVE_QUERIES",
        "q2_agg_highcard,q_dedup_minhash,q_ann_lsh,q_dedup_clusters,"
        "q_waiting_suppliers,q_bigram_lm",
    ).split(",")
    if q
]
# compact stride (= per-replica doc count): keeps replica ids inside
# the <1,000,000 space doubled_corpus reserves below its planted-
# mutant offset through x200 (the old 10,000 stride halved that range)
DOC_SHIFT = 5_000
VEC_SHIFT = 10_000
ORDER_SHIFT = 1_000_000
CUST_SHIFT = 1_000_000
WARMUP = int(os.environ.get("SPARK_GRAFT_CURVE_WARMUP", "1"))
TRIALS = int(os.environ.get("SPARK_GRAFT_CURVE_TRIALS", "3"))


# Per-table replica SELECTs (see module docstring for why each table
# shifts/salts the way it does). {n} is the replica count.
_SALTED_TEXT = (
    "array_to_string(list_transform(string_split(text, ' '), "
    "t -> substring(md5(t || '|' || CAST(i AS VARCHAR)), 1, 6)), ' ')"
)
_TABLE_SQL = {
    # documents: tokens md5-salted per replica (near-dup structure
    # constant per replica — the linear corpus-growth model)
    "documents": f"""
        SELECT doc_id + i * {DOC_SHIFT} AS doc_id,
               CASE WHEN i = 0 THEN text ELSE {_SALTED_TEXT} END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text ELSE {_SALTED_TEXT} END)
                    AS BIGINT) AS n_chars
        FROM read_parquet('{SRC}/documents.parquet'), range({{n}}) _(i)
    """,
    "embeddings": f"""
        SELECT vec_id + i * {VEC_SHIFT} AS vec_id, embedding, label
        FROM read_parquet('{SRC}/embeddings.parquet'), range({{n}}) _(i)
    """,
    "orders": f"""
        SELECT * REPLACE (o_orderkey + i * {ORDER_SHIFT} AS o_orderkey,
                          o_custkey + i * {CUST_SHIFT} AS o_custkey)
        FROM read_parquet('{SRC}/orders.parquet'), range({{n}}) _(i)
    """,
    # lineitem rides the same orderkey shift as orders (FKs stay
    # orphan-free per replica); partkey/suppkey are NOT shifted, so
    # per-part and per-supplier line counts grow linearly — the
    # corpus-growth model q_waiting_suppliers' self-joins care about.
    "lineitem": f"""
        SELECT * REPLACE (l_orderkey + i * {ORDER_SHIFT} AS l_orderkey)
        FROM read_parquet('{SRC}/lineitem.parquet'), range({{n}}) _(i)
    """,
    "supplier": f"SELECT * FROM read_parquet('{SRC}/supplier.parquet')",
    # customer rides the same custkey shift as orders, so the DQ
    # referential-integrity check stays orphan-free per replica and
    # the anti-join's build side grows linearly with the fact
    "customer": f"""
        SELECT * REPLACE (c_custkey + i * {CUST_SHIFT} AS c_custkey)
        FROM read_parquet('{SRC}/customer.parquet'), range({{n}}) _(i)
    """,
    # events: ids and users shift per replica, timestamps stay — the
    # same 30-day window carries N x the traffic (the growth model
    # windowed/attribution analytics face); part is a constant dim
    "events": f"""
        SELECT * REPLACE (event_id + i * 10000000 AS event_id,
                          user_id + i * {CUST_SHIFT} AS user_id)
        FROM read_parquet('{SRC}/events.parquet'), range({{n}}) _(i)
    """,
    "part": f"SELECT * FROM read_parquet('{SRC}/part.parquet')",
}
ALL_TABLES = tuple(_TABLE_SQL)


def build(out_dir: str, n: int, tables: tuple[str, ...] = ALL_TABLES) -> None:
    """Build the requested replica tables, per-table incrementally: a
    table already marked complete (per-table _SUCCESS_<t> marker, or
    the pre-round-7 whole-dir _SUCCESS legacy marker plus the file) is
    kept, missing ones are (re)copied. Large-multiplier runs can build
    only the tables their query set reads (x100 documents+embeddings
    is 3 orders of magnitude cheaper than x100 lineitem)."""
    import duckdb

    if "documents" in tables and n * DOC_SHIFT > 1_000_000:
        # Replica ids cross into the +1,000,000 id space doubled_corpus
        # reserves for its planted mutants; past that the dedup-family
        # queries silently merge colliding doc_ids (measured at x300
        # under the old 10k stride: 127k output pairs vs the linear
        # model's ~1.8M) — their numbers are OUT OF MODEL. Queries
        # that don't double the corpus (ANN, aggs, LM) are unaffected.
        print(
            f"WARNING: documents x{n} exceeds the doubled-corpus id space "
            f"(safe through x{1_000_000 // DOC_SHIFT}); dedup-family "
            "measurements are invalid",
            file=sys.stderr,
        )
    os.makedirs(out_dir, exist_ok=True)
    legacy = os.path.exists(os.path.join(out_dir, "_SUCCESS"))
    con = None
    for t in tables:
        f = os.path.join(out_dir, f"{t}.parquet")
        # ADVICE r7: the marker must encode the replica-id stride —
        # documents built under the old DOC_SHIFT=10,000 layout would
        # otherwise be silently reused after the stride changed to
        # 5,000, reviving exactly the silent-id-collision failure the
        # stride change fixed. A stride-less marker (or the legacy
        # _SUCCESS) on a stride-bearing table forces a rebuild.
        stride_tag = f"_s{DOC_SHIFT}" if t == "documents" else ""
        marker = os.path.join(out_dir, f"_SUCCESS_{t}{stride_tag}")
        if os.path.exists(marker):
            continue
        # legacy all-in-one _SUCCESS only vouches for stride-less tables
        if not stride_tag and legacy and os.path.exists(f):
            continue
        if con is None:
            con = duckdb.connect()
        if os.path.exists(f):
            os.remove(f)  # incomplete earlier copy or stale-stride layout
        con.execute(
            f"COPY ({_TABLE_SQL[t].format(n=n)}) TO '{f}' (FORMAT PARQUET)"
        )
        with open(marker, "w"):
            pass


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    from benchmark_spark.registry import all_specs
    from benchmark_spark.session import get_spark

    spark = get_spark("scale-curve", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out: dict[str, dict] = {}
    for n in mults:
        d = f"{REPO}/.scratch/curve_x{n}"
        tables = tuple(
            t
            for t in os.environ.get(
                "SPARK_GRAFT_CURVE_TABLES", ",".join(ALL_TABLES)
            ).split(",")
            if t
        )
        build(d, n, tables)
        rows = {
            "documents": n * 5000,
            "embeddings": n * 5000,
            "orders": n * 150_000,
            "lineitem": n * 600_000,
        }
        secs: dict[str, float] = {}
        outrows: dict[str, int] = {}
        for q in QUERIES:
            fn = specs[q].fn
            for _ in range(WARMUP):
                fn(spark, d).count()
            samples = []
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                outrows[q] = fn(spark, d).count()
                samples.append(time.perf_counter() - t0)
            secs[q] = round(statistics.median(samples), 3)
        out[f"x{n}"] = {"input_rows": rows, "sec": secs, "out_rows": outrows}
        print(json.dumps({"scale": f"x{n}", **out[f"x{n}"]}), flush=True)
    print(json.dumps({"metric": "scale_curve", "base": "sf0.1", "curves": out}))


if __name__ == "__main__":
    main()
