"""Graph analytics over the similarity graph — iterative PageRank.

The kNN graph (llm/similarity.py q_knn_graph) gives every vector its
approximate top-3 cosine neighbors; PageRank over that graph is the
classic "centrality of a document inside its semantic neighborhood"
signal (SemDeDup/D4-style pipelines rank cluster members by exactly
this kind of score to pick which near-duplicate to KEEP — the most
central one — instead of an arbitrary member).

Determinism across engines (SURVEY.md §5.2): a floating PageRank is
NOT reproducible — Σ contributions is order-sensitive, and Spark's
partial aggregation order differs run to run, let alone engine to
engine. All rank mass here is integer fixed-point: total mass 1e12,
teleport term (15 * 1e12) div (100 * N), per-edge contribution
(85 * rank) div (100 * outdeg). Integer sums are associative, so the
result is bit-identical on Spark, DuckDB, and any partitioning — the
same trick as the fixed-point plane dots in llm/similarity.py.

Scale posture (100 TB): each iteration is ONE shuffle — edges
pre-joined with out-degrees once (the join key is the graph's write
partition key), then join ranks on src + groupBy dst. The rank table
is O(corpus) rows of 16 bytes, orders of magnitude smaller than the
corpus payload; 3 static iterations unroll into one Catalyst plan
with no driver-side loop state. The edge+degree table is
localCheckpoint-ed once before the loop — each unrolled iteration
joins it, and without the materialization every iteration replays
the whole LSH candidate pipeline (measured: 22 exchanges -> 12).
Dangling-node mass leaks (the standard simplified variant), which
keeps the oracle replay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.llm.similarity import lsh_scored_pairs, topk_per_anchor
from benchmark_spark.registry import register

MASS = 1_000_000_000_000  # total rank mass, fixed-point units
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85
ITERATIONS = 3
TOP_K_NEIGHBORS = 3


def knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) edges: q_knn_graph's exact candidate + top-3 logic.

    Round 10 shape: the candidate stage moves ONLY id pairs — the
    512-byte embedding arrays never cross the candidate shuffles —
    and the vectors re-attach via two BROADCAST joins (the embedding
    table is corpus-row-sized, tiny next to the quadratic candidate
    set) before the dot product. Round 16: first-band accounting +
    one cosine per unordered pair (lsh_scored_pairs) removed the
    pair-set dropDuplicates exchange and halved the HOF dots —
    measured 2.9 -> 1.9 s at sf0.1, identical 6000 edges. At 100 TB
    the same rule holds harder: candidate pairs outnumber vectors
    quadratically within buckets, so the payload must ride the SMALL
    side. (An unrolled 64-term codegen dot was also measured: 22 s —
    the element_at chain loses to the HOF here; BENCH_NOTES round-1
    finding still stands.)"""
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    scored = lsh_scored_pairs(spark, emb)
    return topk_per_anchor(scored, TOP_K_NEIGHBORS).select(
        F.col("a_id").alias("src"), F.col("neighbor_id").alias("dst")
    )


# DuckDB replay: the edge CTEs mirror the q_knn_graph oracle (same md5
# planes, fixed-point plane dots, top-3 window), then the iterations
# unroll as integer CTEs r1..r3 — bit-exact by construction.
_EDGES_CTE = """
    rfix AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 10000000.0 + 0.5) AS BIGINT)) AS r
        FROM embeddings
    ),
    planes AS (
        SELECT pp.p AS p,
               list_transform(range(0, 64),
                   d -> (CAST('0x' || substring(md5(pp.p || '|' || d), 1, 15)
                         AS BIGINT) & 1) * 2 - 1) AS s
        FROM (SELECT unnest(range(0, 32)) AS p) pp
    ),
    sgn AS (
        SELECT r.vec_id, pl.p,
               CASE WHEN list_sum(list_transform(range(1, 65),
                                                 i -> r.r[i] * pl.s[i])) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM rfix r, planes pl
    ),
    buckets AS (
        SELECT vec_id, p // 4 AS t,
               SUM(CASE WHEN bit = 1
                        THEN CAST(1 AS BIGINT) << (p % 4) ELSE 0 END) AS bucket
        FROM sgn GROUP BY vec_id, p // 4
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS vec_id
        FROM buckets a JOIN buckets b
          ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    scored AS (
        SELECT c.a_id, c.vec_id,
               list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                                CAST(eb.embedding AS DOUBLE[])) AS raw
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.a_id
        JOIN embeddings eb ON eb.vec_id = c.vec_id
    ),
    edges AS MATERIALIZED (
        SELECT a_id AS src, vec_id AS dst
        FROM (SELECT a_id, vec_id,
                     row_number() OVER (PARTITION BY a_id
                                        ORDER BY raw DESC, vec_id) AS rn
              FROM scored)
        WHERE rn <= 3
    ),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    n AS MATERIALIZED (SELECT COUNT(*) AS n FROM embeddings),
    r0 AS (
        SELECT vec_id, CAST({mass} // n.n AS BIGINT) AS rank
        FROM embeddings CROSS JOIN n
    )
"""

_ITER_CTE = """
    r{i} AS (
        SELECT v.vec_id,
               {tel_num} // ({damp_den} * ANY_VALUE(n.n)) -- (1-d)*mass / N
               + COALESCE(SUM(({damp_num} * p.rank) // ({damp_den} * d.outdeg)), 0)
               AS rank
        FROM embeddings v
        CROSS JOIN n
        LEFT JOIN edges e ON e.dst = v.vec_id
        LEFT JOIN r{prev} p ON p.vec_id = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY v.vec_id
    )
"""


def _pagerank_oracle() -> str:
    parts = [_EDGES_CTE.format(mass=MASS)]
    tel_num = (DAMP_DEN - DAMP_NUM) * MASS  # (1-d)*mass, scaled by damp_den
    for i in range(1, ITERATIONS + 1):
        parts.append(
            _ITER_CTE.format(
                i=i,
                prev=i - 1,
                tel_num=tel_num,
                damp_num=DAMP_NUM,
                damp_den=DAMP_DEN,
            )
        )
    return (
        "WITH "
        + ",".join(parts)
        # SUM(BIGINT) is HUGEINT in DuckDB -> float64 under the driver's
        # pandas canonicalizer (the q_bool_agg failure class): cast back.
        + f" SELECT vec_id, CAST(rank AS BIGINT) AS rank_fp FROM r{ITERATIONS}"
    )


@register(
    "q_pagerank",
    oracle=_pagerank_oracle(),
    doc=(
        "Iterative PageRank (3 unrolled iterations, d=0.85) over the LSH-kNN "
        "similarity graph — the semantic-centrality signal SemDeDup-style "
        "pruning keeps the most central near-duplicate with. All rank mass is "
        "integer fixed-point (1e12 units), so the result is bit-identical "
        "across engines and partitionings; one shuffle per iteration "
        "(join ranks on src, re-aggregate on dst), rank state is O(N) longs."
    ),
    tags=("extension", "graph"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    nodes = emb.select("vec_id")
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    edges = knn_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # attach out-degree once and MATERIALIZE: all 3 unrolled
    # iterations join this table, and without the checkpoint each one
    # replays the whole LSH edge pipeline (22 exchanges measured -> 8)
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)

    teleport_num = (DAMP_DEN - DAMP_NUM) * MASS
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "vec_id", F.expr(f"{MASS} div n").cast("long").alias("rank")
    )
    for _ in range(ITERATIONS):
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.vec_id)
            .select(
                F.col("dst"),
                F.expr(f"({DAMP_NUM} * rank) div ({DAMP_DEN} * outdeg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n))
            .join(contribs, nodes.vec_id == contribs.dst, "left")
            .select(
                nodes.vec_id,
                (
                    F.expr(f"({teleport_num}) div ({DAMP_DEN} * n)")
                    + F.coalesce(F.col("in_mass"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks.select("vec_id", F.col("rank").alias("rank_fp"))


_TRIANGLE_ORACLE = (
    "WITH "
    + _EDGES_CTE.format(mass=MASS)
    + """,
    und AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        FROM edges
    ),
    tri AS MATERIALIZED (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM und e1
        JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY node
    ORDER BY node
"""
)


@register(
    "q_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    doc=(
        "Per-node triangle counting over the kNN similarity graph — the "
        "numerator of the local clustering coefficient, the standard "
        "'is this node inside a dense semantic clique?' signal (dense "
        "triangles around a doc = a paraphrase cluster; PageRank "
        "centrality without triangles = a hub bridging topics). "
        "Algorithm: orient each undirected edge low-id -> high-id, then "
        "one join to enumerate wedges (a<b<c with a-b, b-c) and one join "
        "to close them against a-c — every triangle found exactly once, "
        "no direction double-count. Two shuffle joins on vertex keys over "
        "an edge table that is O(corpus x k), never the corpus payload. "
        "At 100 TB the id-orientation is replaced by DEGREE orientation "
        "(low-degree endpoint first — the Ortmann/Brandes trick): wedge "
        "fan-out is then bounded by sqrt-degeneracy and hub skew "
        "disappears; id order is kept here because it makes the oracle "
        "replay bit-exact. Reuses q_knn_graph's edge builder (same md5 "
        "planes, fixed-point plane dots, top-3 window)."
    ),
    tags=("extension", "similarity", "graph"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = knn_edges(spark, sf_dir)
    # materialize the edge list once: the three self-join legs would
    # otherwise each replay the full LSH candidate pipeline (measured:
    # 38 exchanges -> 5 with the checkpoint)
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
            "left_semi",
        )
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
        )
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
        .orderBy("node")
    )


SEED_MOD, SEED_RESIDUE = 101, 7  # deterministic trusted-seed set
PPR_TOP = 25

_PPR_ITER_CTE = """
    s{i} AS (
        SELECT v.vec_id,
               CASE WHEN v.vec_id % {seed_mod} = {seed_res}
                    THEN {tel_num} // ({damp_den} * ANY_VALUE(ns.ns))
                    ELSE 0 END
               + COALESCE(SUM(({damp_num} * p.rank) // ({damp_den} * d.outdeg)), 0)
               AS rank
        FROM embeddings v
        CROSS JOIN ns
        LEFT JOIN edges e ON e.dst = v.vec_id
        LEFT JOIN s{prev} p ON p.vec_id = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY v.vec_id
    )
"""


def _ppr_oracle() -> str:
    parts = [
        _EDGES_CTE.format(mass=MASS),
        f"""
    ns AS MATERIALIZED (SELECT COUNT(*) AS ns FROM embeddings
           WHERE vec_id % {SEED_MOD} = {SEED_RESIDUE}),
    s0 AS (
        SELECT vec_id,
               CASE WHEN vec_id % {SEED_MOD} = {SEED_RESIDUE}
                    THEN CAST({MASS} // ns.ns AS BIGINT) ELSE 0 END AS rank
        FROM embeddings CROSS JOIN ns
    )""",
    ]
    tel_num = (DAMP_DEN - DAMP_NUM) * MASS
    for i in range(1, ITERATIONS + 1):
        parts.append(
            _PPR_ITER_CTE.format(
                i=i,
                prev=i - 1,
                tel_num=tel_num,
                damp_num=DAMP_NUM,
                damp_den=DAMP_DEN,
                seed_mod=SEED_MOD,
                seed_res=SEED_RESIDUE,
            )
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT vec_id, CAST(rank AS BIGINT) AS rank_fp,
               CAST(vec_id % {SEED_MOD} = {SEED_RESIDUE} AS INT) AS is_seed
        FROM s{ITERATIONS}
        WHERE rank > 0
        ORDER BY rank_fp DESC, vec_id
        LIMIT {PPR_TOP}
        """
    )


@register(
    "q_ppr_seed_expand",
    oracle=_ppr_oracle(),
    doc=(
        "Personalized PageRank seed expansion — the 'more like this' "
        "curation primitive (LESS/DSIR-style targeted selection): all "
        "teleport mass restarts at a small TRUSTED SEED set (vec_id ≡ "
        f"{SEED_RESIDUE} mod {SEED_MOD}) instead of uniformly, so after 3 "
        "damped iterations rank concentrates on vectors reachable from "
        "the seeds through the kNN similarity graph — a transitive "
        "semantic neighborhood, wider than 1-hop kNN but still local. "
        "Returns the top-25 by rank (the expanded selection) with seed "
        "flags. Same fixed-point integer mass as q_pagerank (bit-exact "
        "replay; the WHERE rank > 0 cut drops the unreachable mass-zero "
        "nodes deterministically). Scale: identical per-iteration cost to "
        "global PageRank — one shuffle per round over O(N) long state — "
        "but the useful output is the top slice, so at 100 TB the final "
        "TakeOrderedAndProject replaces any global sort."
    ),
    tags=("extension", "graph", "similarity"),
)
def q_ppr_seed_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    nodes = emb.select("vec_id")
    is_seed = (F.col("vec_id") % SEED_MOD) == SEED_RESIDUE
    n_seeds = nodes.filter(is_seed).agg(F.count(F.lit(1)).alias("ns"))
    edges = knn_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # materialized once for the 3 iterations (same fix as q_pagerank)
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)

    teleport_num = (DAMP_DEN - DAMP_NUM) * MASS
    ranks = nodes.crossJoin(F.broadcast(n_seeds)).select(
        "vec_id",
        F.when(is_seed, F.expr(f"{MASS} div ns")).otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for _ in range(ITERATIONS):
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.vec_id)
            .select(
                F.col("dst"),
                F.expr(f"({DAMP_NUM} * rank) div ({DAMP_DEN} * outdeg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_seeds))
            .join(contribs, nodes.vec_id == contribs.dst, "left")
            .select(
                nodes.vec_id,
                (
                    F.when(is_seed, F.expr(f"({teleport_num}) div ({DAMP_DEN} * ns)"))
                    .otherwise(F.lit(0))
                    + F.coalesce(F.col("in_mass"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return (
        ranks.filter(F.col("rank") > 0)
        .select(
            "vec_id",
            F.col("rank").alias("rank_fp"),
            is_seed.cast("int").alias("is_seed"),
        )
        .orderBy(F.col("rank_fp").desc(), "vec_id")
        .limit(PPR_TOP)
    )


@register(
    "q_triangle_degree",
    oracle=_TRIANGLE_ORACLE,
    doc=(
        "Per-node triangle counting under DEGREE orientation — the "
        "Ortmann/Brandes skew fix q_triangle_count's docstring "
        "promises, implemented and hash-proven: each undirected edge "
        "is oriented from its lower-(degree, id) endpoint to the "
        "higher one, so a hub of degree d fans out wedges only toward "
        "HIGHER-degree nodes — wedge count drops from O(d^2) at the "
        "hub to the arboricity-bounded total, which is what makes "
        "triangle counting survive power-law graphs at 100 TB (the "
        "id orientation keeps a hub's wedges whenever its id is low). "
        "Per-node triangle counts are orientation-invariant, so this "
        "query shares q_triangle_count's oracle verbatim: the driver "
        "hash proves the skew-safe enumeration finds exactly the same "
        "triangles. Same two joins; one extra degree aggregation "
        "(node-sized) broadcast onto the edge list."
    ),
    tags=("extension", "similarity", "graph"),
)
def q_triangle_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = knn_edges(spark, sf_dir)
    # one materialization serves the degree agg AND all three join
    # legs (without it each leg replays the LSH pipeline: 167
    # exchanges measured -> 7 with the checkpoint)
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    with_deg = und.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    # orient lower-(degree, id) -> higher-(degree, id): a DAG, so each
    # triangle is enumerated exactly once, and hubs fan out only upward
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
            "left_semi",
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
        .orderBy("node")
    )


_LPA_ROUNDS = 3

_LPA_SETUP_CTE = """
    sym AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM edges
            UNION ALL
            SELECT dst AS src, src AS dst FROM edges
        )
    ),
    l0 AS (SELECT vec_id, vec_id AS lbl FROM embeddings)
"""

_LPA_ITER_CTE = """
    c{i} AS MATERIALIZED (
        SELECT e.dst AS vec_id, p.lbl, COUNT(*) AS cnt
        FROM sym e JOIN l{prev} p ON p.vec_id = e.src
        GROUP BY e.dst, p.lbl
    ),
    l{i} AS MATERIALIZED (
        SELECT v.vec_id, COALESCE(w.lbl, v.vec_id) AS lbl
        FROM embeddings v
        LEFT JOIN (
            SELECT vec_id, lbl FROM (
                SELECT vec_id, lbl,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cnt DESC, lbl) AS rn
                FROM c{i}
            ) WHERE rn = 1
        ) w ON w.vec_id = v.vec_id
    )
"""


def _lpa_oracle() -> str:
    parts = [_EDGES_CTE.format(mass=MASS), _LPA_SETUP_CTE]
    for i in range(1, _LPA_ROUNDS + 1):
        parts.append(_LPA_ITER_CTE.format(i=i, prev=i - 1))
    return (
        "WITH "
        + ",".join(parts)
        + f" SELECT vec_id, CAST(lbl AS BIGINT) AS community FROM l{_LPA_ROUNDS}"
    )


@register(
    "q_label_propagation",
    oracle=_lpa_oracle(),
    doc=(
        "Synchronous LABEL PROPAGATION community detection (round 11; "
        "Raghavan et al. 2007, the near-linear community algorithm) over "
        "the symmetrized LSH-kNN similarity graph — communities are the "
        "semantic-neighborhood granularity BETWEEN q_dedup_clusters' "
        "connected components (which merge through any single spurious "
        "edge) and per-node kNN lists: each of 3 unrolled rounds every "
        "node adopts its neighbors' MOST FREQUENT label, ties broken by "
        "smallest label id — the tie rule plus synchronous (not "
        "sequential-random) updates is what makes LPA deterministic and "
        "engine-replayable, where textbook asynchronous LPA is seeded. "
        "Labels init to vec_id; isolated nodes keep their own label "
        "(COALESCE, mirrored in SQL). Scale: each round is one "
        "join-on-src + groupBy(dst, lbl) + per-node top-1 window — all "
        "shuffles keyed by node id carrying 16-byte rows, label state "
        "O(N), the symmetrized edge table localCheckpoint-ed once "
        "before the loop (the q_pagerank lineage rule). The oracle "
        "unrolls the same rounds as MATERIALIZED CTEs over the "
        "identical md5-derived edge set."
    ),
    tags=("extension", "graph"),
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    nodes = emb.select("vec_id")
    edges = knn_edges(spark, sf_dir)
    sym = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    lbl = nodes.withColumn("lbl", F.col("vec_id"))
    top1 = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("lbl"))
    for _ in range(_LPA_ROUNDS):
        winner = (
            sym.join(lbl.select(F.col("vec_id").alias("src"), "lbl"), "src")
            .groupBy("dst", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("vec_id"), F.col("lbl").alias("new_lbl"))
        )
        lbl = (
            nodes.join(winner, "vec_id", "left")
            .select("vec_id", F.coalesce("new_lbl", F.col("vec_id")).alias("lbl"))
            # O(N) 16-byte rows; cuts lineage so round i+1's plan does
            # not re-run rounds 1..i, and lets AQE plan each round's
            # joins on real sizes. The remaining per-round shuffles are
            # keyed by vec_id / (dst,lbl) — vec_id is UNIQUE per node,
            # so the advisor's skew-split-blocked warning on the
            # Window-fed winner join has no skewed key to split.
            .localCheckpoint(eager=True)
        )
    return lbl.select("vec_id", F.col("lbl").cast("long").alias("community"))
