"""SQL-text-surface operators (SURVEY.md §3.2 entry point 3).

The reference's user interface is SQL strings fed to an engine CLI
[P]; most of this repo expresses operators through the DataFrame
builder API (same Catalyst plans). This module covers the two SQL
constructs that have NO DataFrame equivalent — they exist only in
the parser — proving the SQL-string surface is a first-class entry
point, not a demo:

* LATERAL correlated subquery with ORDER BY ... LIMIT — the standard
  SQL form of per-group top-n (the alternative to window row_number).
* WITH RECURSIVE — fixpoint iteration inside one statement (Spark 4
  UnionLoop), the construct DuckDB oracles have used against this
  repo's Pregel loops since round 2; here Spark runs it natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from benchmark_spark.catalog import load_table, load_tables
from benchmark_spark.llm.graph import MASS, _EDGES_CTE, knn_edges
from benchmark_spark.registry import register


@register(
    "q_lateral_topn",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
    """,
    doc=(
        "Per-customer top-2 orders via a correlated LATERAL subquery with "
        "ORDER BY ... LIMIT — the pure-SQL form of per-group top-n, and a "
        "construct the DataFrame API cannot express (it exists only in "
        "the parser; Catalyst decorrelates it into the same "
        "partition-ranked plan q6_window builds explicitly with "
        "row_number). Registering both forms pins that the two entry "
        "points produce identical answers AND identical asymptotics: "
        "one shuffle on the correlation key, per-key heap, no "
        "per-customer re-scan of orders despite what the correlated "
        "syntax suggests. Every customer has >= 1 order in the fixtures, "
        "so inner lateral loses no one."
    ),
    tags=("completeness", "join", "sql"),
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        """
    )


@register(
    "q_graph_reachability",
    oracle=(
        "WITH RECURSIVE "
        + _EDGES_CTE.format(mass=MASS)
        + """,
        reach(node, hop) AS (
            SELECT CAST(0 AS BIGINT) AS node, 0 AS hop
            UNION ALL
            SELECT e.dst, r.hop + 1
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.hop < 8
        )
        SELECT node AS vec_id, CAST(MIN(hop) AS BIGINT) AS hops
        FROM reach
        GROUP BY node
        ORDER BY vec_id
    """
    ),
    doc=(
        "Shortest-hop reachability from vector 0 over the kNN similarity "
        "graph via WITH RECURSIVE — Spark 4's native fixpoint operator "
        "(UnionLoop), the same construct this repo's DuckDB oracles have "
        "used to replay Pregel loops since round 2, now exercised "
        "ENGINE-SIDE. BFS frontier expansion with a hop cap of 8 on both "
        "engines (UNION ALL + MIN(hop) = shortest path; the cap bounds "
        "cycle re-expansion identically, so results match row-for-row). "
        "Semantically: 'which docs sit within k semantic hops of this "
        "one' — the neighborhood-expansion primitive retrieval re-rankers "
        "use. At 100 TB prefer the explicit checkpointed loop "
        "(llm/dedup.py connected_components) whose per-round state is "
        "under your control; the recursive CTE is the right tool when "
        "the frontier stays small (hop-capped ego networks, org charts)."
    ),
    tags=("extension", "similarity", "graph", "sql"),
)
def q_graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialize the edges ONCE before the recursion (round 6; same
    # lineage-replay fix round 5 applied to the Pregel loops): the
    # UnionLoop re-derives every view it references on EACH of the 8
    # iterations, so the LSH bucket join + top-k behind knn_edges ran
    # 8x (measured 86 s at sf0.1; the loop itself is milliseconds once
    # edges are a materialized scan). Round 7 (ADVICE r6): .cache()
    # instead of localCheckpoint — localCheckpoint runs the full kNN
    # pipeline at DataFrame-construction time even with eager=False
    # (AQE executes stages when the plan is converted to an RDD,
    # measured 15 s at sf0.1 before any action), whereas the cached
    # view is truly lazy: iteration 1 populates the InMemoryRelation
    # and iterations 2..8 read it (measured: first action ~= ONE
    # pipeline run, re-collect 0.08 s), so instantiating the registry
    # spec does zero cluster work and the 8x replay win is unchanged.
    knn_edges(spark, sf_dir).cache().createOrReplaceTempView("knn_edges_view")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, hop) AS (
            SELECT CAST(0 AS BIGINT) AS node, 0 AS hop
            UNION ALL
            SELECT e.dst, r.hop + 1
            FROM reach r JOIN knn_edges_view e ON e.src = r.node
            WHERE r.hop < 8
        )
        SELECT node AS vec_id, CAST(MIN(hop) AS BIGINT) AS hops
        FROM reach
        GROUP BY node
        ORDER BY vec_id
        """
    )


@register(
    "q_sql_script",
    oracle="""
        WITH ks AS (SELECT unnest(range(0, 21)) AS k),
        counts AS (
            SELECT k, 512000.0 / power(2, k) AS thr,
                   (SELECT COUNT(*) FROM orders o
                    WHERE o.o_totalprice > 512000.0 / power(2, k)) AS n
            FROM ks
        )
        SELECT thr AS threshold,
               CAST(n AS BIGINT) AS n_orders,
               CAST(k AS BIGINT) AS iters
        FROM counts
        WHERE n >= 1000 OR k = 20
        ORDER BY k
        LIMIT 1
    """,
    doc=(
        "SQL scripting (Spark 4 BEGIN/DECLARE/WHILE): a data-DEPENDENT "
        "control loop entirely inside one SQL statement — halve a price "
        "threshold until at least 1000 orders qualify, returning the "
        "final threshold, count, and iteration tally. This is the "
        "procedural surface (migration path for stored-procedure "
        "workloads) the DataFrame API covers with a driver-side Python "
        "loop (connected_components, kmeans_lite): here the LOOP STATE "
        "LIVES IN SQL VARIABLES and each iteration plans one count "
        "query. The oracle replays the loop declaratively (thresholds "
        "are exact powers-of-two divisions of 2^9*1000, so the doubles "
        "agree bit-exactly and 'first k meeting the condition' is the "
        "loop's fixpoint). Scale: per-iteration cost is one pruned "
        "aggregate; at 100 TB you'd replace the linear halving with the "
        "same loop over a pre-computed q_equidepth_hist (one scan total) "
        "— the script surface is the orchestration, not the algorithm."
    ),
    tags=("completeness", "sql", "agg"),
)
def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 512000.0;
          DECLARE n BIGINT DEFAULT 0;
          DECLARE iters INT DEFAULT 0;
          SET n = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
          WHILE n < 1000 AND iters < 20 DO
            SET thr = thr / 2;
            SET n = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
            SET iters = iters + 1;
          END WHILE;
          SELECT CAST(thr AS DOUBLE) AS threshold,
                 CAST(n AS BIGINT) AS n_orders,
                 CAST(iters AS BIGINT) AS iters;
        END
        """
    )
