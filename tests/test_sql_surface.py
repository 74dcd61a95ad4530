"""The SQL-string surface must agree with the DataFrame builders —
two authoring paths, one engine (SURVEY.md §3.2)."""

import pytest

from benchmark_spark.registry import all_specs
from benchmark_spark.sql_surface import SQL_QUERIES, run_sql
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_matches_dataframe_builder(spark, name):
    sql_df = run_sql(spark, SF_SMOKE, name)
    df = SPECS[name].fn(spark, SF_SMOKE)
    assert sorted(sql_df.columns) == sorted(df.columns)
    assert _rows(sql_df) == _rows(df)


def test_lateral_topn_equals_window_topn(spark):
    """The LATERAL ... LIMIT form and the row_number form are the same
    operator: identical rows out."""
    from benchmark_spark.operators.sqltext import q_lateral_topn
    from benchmark_spark.registry import all_specs

    lateral = {
        (r["c_custkey"], r["o_orderkey"])
        for r in q_lateral_topn(spark, SF_SMOKE).collect()
    }
    # q6_window: top-2 orders per customer by (price DESC, orderkey)
    win = {
        (r["o_custkey"], r["o_orderkey"])
        for r in all_specs()["q6_window"].fn(spark, SF_SMOKE).collect()
    }
    assert lateral == win


def test_graph_reachability_hops_are_bfs_consistent(spark):
    from benchmark_spark.llm.graph import knn_edges
    from benchmark_spark.operators.sqltext import q_graph_reachability

    got = {r["vec_id"]: r["hops"] for r in q_graph_reachability(spark, SF_SMOKE).collect()}
    # python BFS over the same edges, same hop cap
    adj: dict[int, list] = {}
    for r in knn_edges(spark, SF_SMOKE).collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    want, frontier = {0: 0}, [0]
    for hop in range(1, 9):
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in want:
                    want[v] = hop
                    nxt.append(v)
        frontier = nxt
    assert got == want


def test_graph_reachability_construction_is_lazy_and_edge_view_cached(spark):
    """Round-7 contract (ADVICE r6): building the q_graph_reachability
    DataFrame must run ZERO jobs (localCheckpoint — even eager=False —
    executed the full kNN pipeline at construction under AQE), and the
    edge view must be cache-backed so the UnionLoop's 8 iterations hit
    one materialization instead of re-deriving the LSH pipeline."""
    from benchmark_spark.operators.sqltext import q_graph_reachability

    sc = spark.sparkContext
    group = "reachability-lazy-probe"
    sc.setJobGroup(group, "construction must not run jobs")
    try:
        q_graph_reachability(spark, SF_SMOKE)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert not jobs, f"spec construction ran {len(jobs)} Spark job(s)"
    lvl = spark.table("knn_edges_view").storageLevel
    assert lvl.useMemory, "knn_edges_view is not cache-backed"
