"""Data-selection operators: diverse-subset (coreset) construction.

Round 11. Training-data curation does not just FILTER (quality gates,
dedup) — it also SELECTS: given a budget of n examples, pick the
subset that covers the data distribution best. The classic primitive
is the greedy k-center (farthest-point traversal): start from a seed,
repeatedly add the point FARTHEST from the current set. It is a
2-approximation of the optimal k-center cover (Gonzalez 1985, public)
and the standard seed for coreset pipelines and k-means++ style
initialization.

Determinism contract: embeddings snap to exact int-micro vectors
(floor(x*1e6 + 0.5), the llm/similarity.py convention), so every
squared distance is an exact BIGINT (<= 64 * (2e6)^2 ~ 2.6e14, far
inside both BIGINT and the double-exact integer range the DuckDB
oracle computes in), every argmax has a vec_id tiebreak, and the
whole greedy trajectory replays bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.registry import register

_KCENTER_K = 8
_KCENTER_SEED = 0  # vec_id of the deterministic starting point


def _d2(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance of two long-array columns."""
    diffs = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, x: acc + x)


# int-micro snap of the raw embeddings — the default k-center corpus
_VM_SQL = (
    "SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), "
    "x -> floor(x * 1000000 + 0.5)) AS v FROM embeddings"
)


def _kcenter_oracle(k: int, vm_sql: str = _VM_SQL, label_sql: str | None = None) -> str:
    lpd = "list_dot_product"

    def d2(a: str, b: str) -> str:
        return f"({lpd}({a},{a}) - 2*{lpd}({a},{b}) + {lpd}({b},{b}))"

    parts = [
        f"vm AS MATERIALIZED ({vm_sql})",
        f"s1 AS MATERIALIZED (SELECT v FROM vm WHERE vec_id = {_KCENTER_SEED})",
        f"m1 AS MATERIALIZED (SELECT a.vec_id, a.v, {d2('a.v', 'b.v')} AS mind "
        "FROM vm a, s1 b)",
    ]
    selects = [f"SELECT 1 AS step, CAST({_KCENTER_SEED} AS BIGINT) AS vec_id, "
               "CAST(0 AS BIGINT) AS sel_d2"]
    for t in range(2, k + 1):
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT vec_id, v, mind FROM m{t - 1} "
            "ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT a.vec_id, a.v, "
            f"LEAST(a.mind, {d2('a.v', 'c.v')}) AS mind FROM m{t - 1} a, c{t} c)"
        )
        selects.append(
            f"SELECT {t} AS step, CAST(vec_id AS BIGINT), CAST(mind AS BIGINT) "
            f"FROM c{t}"
        )
    parts.append(f"fin AS (SELECT CAST(MAX(mind) AS BIGINT) AS final_r2 FROM m{k})")
    union = " UNION ALL ".join(selects)
    label = f", {label_sql} AS label" if label_sql else ""
    return (
        "WITH " + ",\n".join(parts)
        + f" SELECT s.step, s.vec_id, s.sel_d2, f.final_r2{label} FROM ({union}) s "
        "CROSS JOIN fin f ORDER BY s.step"
    )


@register(
    "q_coreset_kcenter",
    oracle=_kcenter_oracle(_KCENTER_K),
    doc=(
        "GREEDY K-CENTER CORESET (round 11) — farthest-point "
        "traversal (Gonzalez 1985): seed at vec 0, then 7 rounds of "
        "'add the point with the largest min-distance to the chosen "
        "set'. The output trajectory (step, chosen vec_id, the "
        "selection distance sel_d2 = the chosen point's distance to "
        "the previous set == the previous set's covering radius, and "
        "the final covering radius of all 8 centers) is the "
        "2-approximate k-center cover — the diverse-subset selection "
        "primitive under coreset sampling and k-means++ seeding. "
        "FULLY DECLARATIVE iteration: each round is orderBy(mind "
        "DESC).limit(1) (TakeOrderedAndProject — per-partition "
        "partial top-1, only ONE row per partition crosses the wire) "
        "cross-joined back as a broadcast 1-row frame to tighten the "
        "running min-distance column; no driver-side collect "
        "anywhere, and localCheckpoint per round caps lineage depth "
        "at O(1) (the SCALE.md item-9 discipline). Distances are "
        "exact BIGINTs on int-micro vectors with vec_id tiebreaks, "
        "so the greedy trajectory — every argmax of it — replays "
        "bit-identically in the DuckDB oracle's unrolled CTE chain. "
        "Scale: k full scans of the corpus (k=8 here); at 100 TB one "
        "runs the same traversal over a uniform pre-sample (k-center "
        "is 2-approx on the sample with high probability) or batches "
        "multiple additions per scan (the k-means|| oversampling "
        "trick, q_ann_ivf)."
    ),
    tags=("extension", "similarity", "sample"),
)
def q_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    vm = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000.0 + F.lit(0.5)).cast("long"),
        ).alias("v"),
    ).localCheckpoint(eager=True)
    return _kcenter_trajectory(spark, vm, _KCENTER_K)


def _kcenter_trajectory(spark: SparkSession, vm: DataFrame, k: int) -> DataFrame:
    """Greedy farthest-point traversal over an int-micro (vec_id, v)
    frame — shared by the raw-corpus and planted-cluster variants."""
    seed = vm.where(F.col("vec_id") == _KCENTER_SEED).select(F.col("v").alias("cv"))
    state = (
        vm.crossJoin(F.broadcast(seed))
        .select("vec_id", "v", _d2(F.col("v"), F.col("cv")).alias("mind"))
        .localCheckpoint(eager=True)
    )
    chosen = [
        spark.range(1).select(
            F.lit(1).cast("long").alias("step"),
            F.lit(_KCENTER_SEED).cast("long").alias("vec_id"),
            F.lit(0).cast("long").alias("sel_d2"),
        )
    ]
    for t in range(2, k + 1):
        far = (
            state.orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .localCheckpoint(eager=True)  # 1 row; reused by emit + update
        )
        chosen.append(
            far.select(
                F.lit(t).cast("long").alias("step"),
                F.col("vec_id").cast("long").alias("vec_id"),
                F.col("mind").cast("long").alias("sel_d2"),
            )
        )
        state = (
            state.crossJoin(F.broadcast(far.select(F.col("v").alias("cv"))))
            .select(
                "vec_id",
                "v",
                F.least(F.col("mind"), _d2(F.col("v"), F.col("cv"))).alias("mind"),
            )
            .localCheckpoint(eager=True)
        )
    fin = state.agg(F.max("mind").cast("long").alias("final_r2"))
    out = chosen[0]
    for c in chosen[1:]:
        out = out.unionByName(c)
    return out.crossJoin(F.broadcast(fin)).orderBy("step")


# --- Planted-cluster embedding fixture (round 12, VERDICT r11 #4) ----
# Every cluster-structured operator (SemDeDup, DBSCAN, k-center,
# IVFPQ) was validated only on the near-uniform unit-sphere embeddings
# (SCALE.md: k-center radius there ~ chance). This fixture DERIVES a
# deterministic well-separated mixture from the same table, in-plan on
# both engines, so cluster recovery becomes hash-checkable:
#   planted(vec)[d] = C * [d % 8 == vec_id % 8]          (its center)
#                   + 0.5 * embedding[d]                  (noise)
# for the 90% clustered points (label = vec_id % 8), and
#   planted(vec)[d] = 1.5 * embedding[d]                  (label -1)
# for the 10% unclustered points (vec_id % 10 == 9). Geometry (unit-
# norm inputs): center separation sqrt(2*8*C^2) = 4.0, within-cluster
# diameter <= 2*0.5 = 1.0, noise points at radius 1.5 between the
# centers (norm 2.83) — separated 4:1, not a toy with zero noise.
# Identical double arithmetic on both sides ((center + scale*x) *
# 1e6 + 0.5, floored), so the int-micro planted coordinates are
# engine-exact like every similarity fixture.

_PLANTED_C = 1.0
_PLANTED_NOISE = 0.5
_PLANTED_FAR = 1.5

PLANTED_VM_SQL = (
    "SELECT vec_id, list_transform(range(0, 64), i -> "
    "CAST(floor(((CASE WHEN vec_id % 10 <> 9 AND i % 8 = vec_id % 8 "
    f"THEN {_PLANTED_C} ELSE 0.0 END) + "
    f"(CASE WHEN vec_id % 10 = 9 THEN {_PLANTED_FAR} ELSE {_PLANTED_NOISE} END) "
    "* CAST(embedding[i + 1] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS v "
    "FROM embeddings"
)

_PLANTED_LABEL_SQL = (
    "CAST(CASE WHEN s.vec_id % 10 = 9 THEN -1 ELSE s.vec_id % 8 END AS BIGINT)"
)


PLANTED_EMB_SQL = (
    "SELECT vec_id, list_transform(range(0, 64), i -> "
    "(CASE WHEN vec_id % 10 <> 9 AND i % 8 = vec_id % 8 "
    f"THEN {_PLANTED_C} ELSE 0.0 END) + "
    f"(CASE WHEN vec_id % 10 = 9 THEN {_PLANTED_FAR} ELSE {_PLANTED_NOISE} END) "
    "* CAST(embedding[i + 1] AS DOUBLE)) AS v FROM embeddings"
)

PLANTED_LABEL_COL_SQL = (
    "CAST(CASE WHEN l.vec_id % 10 = 9 THEN -1 ELSE l.vec_id % 8 END AS BIGINT)"
)


def planted_embedding(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding array<double>) planted mixture PRE-snap —
    for consumers that work on raw doubles (SemDeDup's cosine tier);
    the int-micro twin below snaps the same values."""
    is_far = F.col("vec_id") % 10 == 9

    def coord(x: Column, i: Column) -> Column:
        center = (
            F.when((~is_far) & (i % 8 == F.col("vec_id") % 8), F.lit(_PLANTED_C))
            .otherwise(F.lit(0.0))
        )
        scale = F.when(is_far, F.lit(_PLANTED_FAR)).otherwise(F.lit(_PLANTED_NOISE))
        return center + scale * x.cast("double")

    return emb.select("vec_id", F.transform("embedding", coord).alias("embedding"))


def planted_vm(emb: DataFrame) -> DataFrame:
    """Int-micro planted-mixture vectors derived from the embeddings
    table — the Spark twin of PLANTED_VM_SQL."""
    is_far = F.col("vec_id") % 10 == 9

    def coord(x: Column, i: Column) -> Column:
        center = (
            F.when((~is_far) & (i % 8 == F.col("vec_id") % 8), F.lit(_PLANTED_C))
            .otherwise(F.lit(0.0))
        )
        scale = F.when(is_far, F.lit(_PLANTED_FAR)).otherwise(F.lit(_PLANTED_NOISE))
        return F.floor(
            (center + scale * x.cast("double")) * 1000000.0 + F.lit(0.5)
        ).cast("long")

    return emb.select("vec_id", F.transform("embedding", coord).alias("v"))


@register(
    "q_kcenter_planted",
    oracle=_kcenter_oracle(_KCENTER_K, vm_sql=PLANTED_VM_SQL,
                           label_sql=_PLANTED_LABEL_SQL),
    doc=(
        "K-CENTER ON THE PLANTED MIXTURE (round 12, VERDICT r11 #4) — "
        "the greedy farthest-point traversal re-run over the derived "
        "planted-cluster table, with each chosen point's PLANTED "
        "LABEL in the hash-checked output: on a well-separated "
        "mixture the trajectory must hop between distinct regions "
        "instead of wandering a uniform sphere. Measured at sf0.01: "
        "the 8 chosen points cover ALL 8 planted labels exactly once "
        "(labels 0,7,2,4,3,1,5,6 in selection order), every "
        "selection distance sits on the cross-cluster plateau "
        "(sel_d2 1.68-1.80e13 micro^2, r ~ 4.2 = the planted center "
        "separation), and the final covering radius drops below the "
        "plateau to 1.08e13 (r ~ 3.3 — the uncovered 10% noise "
        "shell); the raw-table twin q_coreset_kcenter is flat at "
        "r ~ 1.4 with no structure to find (SCALE.md round-12 "
        "entry; the trajectory is pinned against a numpy greedy "
        "replay in tests). Same declarative iteration as "
        "q_coreset_kcenter (TakeOrderedAndProject top-1 per round, "
        "broadcast 1-row tighten, no driver collect); the mixture "
        "derivation is one map expression on both engines, so the "
        "whole thing — fixture synthesis INCLUDED — replays "
        "bit-identically in the oracle."
    ),
    tags=("extension", "similarity", "sample"),
)
def q_kcenter_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    vm = planted_vm(emb).localCheckpoint(eager=True)
    traj = _kcenter_trajectory(spark, vm, _KCENTER_K)
    label = (
        F.when(F.col("vec_id") % 10 == 9, -1)
        .otherwise(F.col("vec_id") % 8)
        .cast("long")
        .alias("label")
    )
    return traj.select("step", "vec_id", "sel_d2", "final_r2", label).orderBy("step")


# --- Grid-bucketed DBSCAN (round 11) ---------------------------------
_DBSCAN_EPS_U = 20000  # eps = 0.02 in int-micro units
_DBSCAN_MINPTS = 5  # includes the point itself (the DBSCAN convention)


_DBSCAN_POINTS_SQL = """SELECT vec_id,
                   floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5) AS x,
                   floor(CAST(embedding[2] AS DOUBLE) * 1000000 + 0.5) AS y
            FROM embeddings"""


def _dbscan_oracle(points_sql: str, label_sql: str | None = None) -> str:
    """Grid-DBSCAN classification SQL over a points subquery
    (vec_id, x, y int-micro) — shared by the raw-embedding query and
    the planted-layout recovery query."""
    label = f",\n               {label_sql} AS label" if label_sql else ""
    return f"""
        WITH p AS MATERIALIZED (
            {points_sql}
        ),
        cells AS MATERIALIZED (
            SELECT vec_id, x, y,
                   CAST(floor(x / {float(_DBSCAN_EPS_U)!r}) AS BIGINT) AS cx,
                   CAST(floor(y / {float(_DBSCAN_EPS_U)!r}) AS BIGINT) AS cy
            FROM p
        ),
        pairs AS MATERIALIZED (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM cells a
            JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox ON true
            JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy ON true
            JOIN cells b ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy
            WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                  <= {_DBSCAN_EPS_U * _DBSCAN_EPS_U}
        ),
        deg AS MATERIALIZED (
            SELECT a_id AS vec_id, COUNT(*) AS n_neighbors FROM pairs GROUP BY a_id
        ),
        core AS MATERIALIZED (
            SELECT vec_id FROM deg WHERE n_neighbors >= {_DBSCAN_MINPTS}
        )
        SELECT d.vec_id,
               CAST(d.n_neighbors AS BIGINT) AS n_neighbors,
               CASE WHEN d.n_neighbors >= {_DBSCAN_MINPTS} THEN 'core'
                    WHEN EXISTS (SELECT 1 FROM pairs pr JOIN core c
                                 ON pr.b_id = c.vec_id
                                 WHERE pr.a_id = d.vec_id) THEN 'border'
                    ELSE 'noise' END AS cls{label}
        FROM deg d
        ORDER BY d.vec_id
    """


@register(
    "q_dbscan_grid",
    oracle=_dbscan_oracle(_DBSCAN_POINTS_SQL),
    doc=(
        "GRID-BUCKETED DBSCAN (round 11) — density classification "
        "(Ester et al. 1996) over the first two embedding "
        "dimensions: a point is CORE if its eps-ball holds >= "
        "minPts points (self included), BORDER if it is within eps "
        "of a core point, NOISE otherwise. The scale move is the "
        "grid: cells of side eps mean every eps-neighbor lives in "
        "the 3x3 adjacent cells, so candidate generation is an "
        "EQUI-join on (cx+dx, cy+dy) after a 9-way offset explode — "
        "never an all-pairs theta join; pair work is "
        "density-bounded per cell (the same blocking argument as "
        "q_dedup_minhash's bands). Coordinates are int-micro, so "
        "the distance cut d2 <= eps2 compares BIGINTs and the "
        "class verdicts replay exactly in the oracle. At 100 TB the "
        "grid inherits DBSCAN's caveat: cell occupancy grows with "
        "density, so eps shrinks (or the grid refines recursively) "
        "with corpus growth, and the pair frame — built once, "
        "reused for both the degree count and the border probe — is "
        "the thing to checkpoint. The full-dimension variant swaps "
        "the 2-D grid for LSH buckets (q_dedup_embed_lsh's planes)."
    ),
    tags=("extension", "similarity", "quality"),
)
def q_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    p = emb.select(
        "vec_id",
        F.floor(F.col("embedding")[0].cast("double") * 1000000.0 + F.lit(0.5)).alias("x"),
        F.floor(F.col("embedding")[1].cast("double") * 1000000.0 + F.lit(0.5)).alias("y"),
    )
    return _dbscan_classify(p)


def _dbscan_classify(p: DataFrame, eps_u: int = _DBSCAN_EPS_U) -> DataFrame:
    """Grid-bucketed DBSCAN core/border/noise over (vec_id, x, y)
    int-micro points — the Spark twin of _dbscan_oracle's CTE chain.
    eps_u parameterized (round 13) for the density-scheduled variant."""
    eps = float(eps_u)
    cells = p.select(
        "vec_id",
        "x",
        "y",
        F.floor(F.col("x") / eps).cast("long").alias("cx"),
        F.floor(F.col("y") / eps).cast("long").alias("cy"),
    ).localCheckpoint(eager=True)  # both join sides + the probe reuse it

    offsets = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    a = cells.select(
        F.col("vec_id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        "cx",
        "cy",
        offsets.alias("o"),
    ).select(
        "a_id",
        "ax",
        "ay",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = cells.select(
        F.col("vec_id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    pairs = (
        a.join(b, ["jx", "jy"])
        .where(d2 <= F.lit(eps_u * eps_u))
        .select("a_id", "b_id")
        .localCheckpoint(eager=True)  # reused: degree count + border probe
    )
    deg = pairs.groupBy(F.col("a_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_neighbors")
    )
    core = deg.where(F.col("n_neighbors") >= _DBSCAN_MINPTS).select(
        F.col("vec_id").alias("core_id")
    )
    near_core = (
        pairs.join(F.broadcast(core), pairs.b_id == F.col("core_id"), "left_semi")
        .select(F.col("a_id"))
        .distinct()
        .withColumnRenamed("a_id", "vec_id")
        .withColumn("has_core", F.lit(1))
    )
    return (
        deg.join(near_core, "vec_id", "left")
        .select(
            "vec_id",
            F.col("n_neighbors").cast("long").alias("n_neighbors"),
            F.when(F.col("n_neighbors") >= _DBSCAN_MINPTS, F.lit("core"))
            .when(F.col("has_core") == 1, F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("cls"),
        )
        .orderBy("vec_id")
    )


# --- DBSCAN cluster recovery on a planted 2-D layout (round 12) ------
# The planted-mixture companion for the density tier: q_dbscan_grid
# reads dims 0-1 only, and the canonical one-hot centers are
# indistinguishable in any 2-plane, so this variant lays the SAME
# labels (vec_id % 8; shell at vec_id % 10 == 9) onto an 8-point star
# of EXACT DECIMAL-LITERAL 2-D centers (no trig: cos/sin differ in the
# last ulp across libms, literals parse to identical doubles in both
# engines). Geometry vs the committed eps = 0.02: blob noise 0.01x
# (per-dim std 1/8 -> blob std 0.00125, everything core), adjacent
# center gap ~0.076 (blobs never merge), shell 0.4x (std 0.05,
# locally sparse -> noise, except strays that land within eps of a
# blob -> border). Recovery is HASH-CHECKED: the output carries the
# planted label next to the density class.

_DBSCAN_STAR_X = ("0.1", "0.07", "0.0", "-0.07", "-0.1", "-0.07", "0.0", "0.07")
_DBSCAN_STAR_Y = ("0.0", "0.07", "0.1", "0.07", "0.0", "-0.07", "-0.1", "-0.07")


def _star_coord_sql(dim: int, centers: tuple[str, ...]) -> str:
    cases = " ".join(f"WHEN {c} THEN {lit}" for c, lit in enumerate(centers))
    return (
        f"floor((CASE WHEN vec_id % 10 = 9 "
        f"THEN 0.4 * CAST(embedding[{dim}] AS DOUBLE) "
        f"ELSE (CASE vec_id % 8 {cases} END) "
        f"+ 0.01 * CAST(embedding[{dim}] AS DOUBLE) END) * 1000000 + 0.5)"
    )


_DBSCAN_PLANTED_POINTS_SQL = f"""SELECT vec_id,
                   {_star_coord_sql(1, _DBSCAN_STAR_X)} AS x,
                   {_star_coord_sql(2, _DBSCAN_STAR_Y)} AS y
            FROM embeddings"""

_DBSCAN_PLANTED_LABEL_SQL = (
    "CAST(CASE WHEN d.vec_id % 10 = 9 THEN -1 ELSE d.vec_id % 8 END AS BIGINT)"
)


def _star_coord(dim: int, centers: tuple[str, ...]) -> Column:
    e = F.col("embedding")[dim].cast("double")
    center = F.col("vec_id") % 8
    cx = F.when(center == 0, F.lit(float(centers[0])))
    for c in range(1, 8):
        cx = cx.when(center == c, F.lit(float(centers[c])))
    planted = F.when(F.col("vec_id") % 10 == 9, F.lit(0.4) * e).otherwise(
        cx + F.lit(0.01) * e
    )
    return F.floor(planted * 1000000.0 + F.lit(0.5))


@register(
    "q_dbscan_planted",
    oracle=_dbscan_oracle(_DBSCAN_PLANTED_POINTS_SQL,
                          label_sql=_DBSCAN_PLANTED_LABEL_SQL),
    doc=(
        "DBSCAN CLUSTER RECOVERY on the planted 2-D star layout "
        "(round 12, the density-tier companion of q_kcenter_planted): "
        "the same planted labels laid onto 8 exact-literal 2-D "
        "centers (gap ~0.076 >> eps 0.02) with 0.01x blob noise and a "
        "0.4x unclustered shell, classified by the SAME grid-DBSCAN "
        "machinery as q_dbscan_grid (shared _dbscan_classify / "
        "_dbscan_oracle after the round-12 refactor). The output "
        "carries the planted label next to the density class, so "
        "cluster RECOVERY — blobs all core, the noise class drawn "
        "from the shell — is driver-hash-checked, not just measured "
        "in a tool (measured at sf0.01: 450/450 clustered rows core; "
        "every border/noise row from the shell). Centers are decimal "
        "literals, never trig: cos/sin differ in the last ulp across "
        "libms, literals parse identically. Same scale shape as the "
        "parent: 9-offset equi-join candidate generation, never a "
        "theta join."
    ),
    tags=("extension", "similarity"),
)
def q_dbscan_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    p = emb.select(
        "vec_id",
        _star_coord(0, _DBSCAN_STAR_X).alias("x"),
        _star_coord(1, _DBSCAN_STAR_Y).alias("y"),
    )
    label = (
        F.when(F.col("vec_id") % 10 == 9, -1)
        .otherwise(F.col("vec_id") % 8)
        .cast("long")
        .alias("label")
    )
    return _dbscan_classify(p).select("vec_id", "n_neighbors", "cls", label)


# --- density-scheduled eps (round 13, VERDICT r12 #8) -----------------
# SCALE.md's planted table measured the fixed-eps caveat live: at the
# sf0.1 density the 0.4x shell packs ~4x more points into every
# eps=0.02 ball, reclassifying 161/200 shell points CORE (vs 15/50 at
# the sf0.01 reference). The textbook fix is the d-dimensional density
# schedule eps ~ N^(-1/d): in 2-D, eps_u(N) = floor(eps0 * sqrt(N0/N)
# + 0.5) holds the expected eps-ball occupancy N*eps^2 constant, so
# the classification profile — blobs all core, shell noise — is
# scale-STABLE instead of density-dependent. Calibration eps0 = 0.012
# at N0 = 500 (measured sweep: blobs 100% core at every SF; shell
# noise 50/50 at sf0.01 and 196/200 at sf0.1, vs 18/200 under fixed
# eps). sqrt and floor are correctly-rounded IEEE ops, so the Spark
# driver-side schedule and the oracle's eps CTE derive the SAME
# integer at any corpus size.

_DBSCAN_SCHED_EPS0_U = 12000  # eps0 = 0.012 at the N0 = 500 reference
_DBSCAN_SCHED_N0 = 500


def _dbscan_sched_eps(n: int) -> int:
    import math

    return int(math.floor(
        _DBSCAN_SCHED_EPS0_U * math.sqrt(_DBSCAN_SCHED_N0 / float(n)) + 0.5
    ))


def _dbscan_scheduled_oracle(points_sql: str, label_sql: str) -> str:
    """Grid-DBSCAN with the eps ~ N^(-1/2) schedule derived IN-SQL
    from the corpus count — the scheduled twin of _dbscan_oracle."""
    eps_sql = (
        f"CAST(floor({_DBSCAN_SCHED_EPS0_U} * "
        f"sqrt({_DBSCAN_SCHED_N0} / CAST(COUNT(*) AS DOUBLE)) + 0.5) AS BIGINT)"
    )
    return f"""
        WITH p AS MATERIALIZED (
            {points_sql}
        ),
        eps AS MATERIALIZED (SELECT {eps_sql} AS u FROM p),
        cells AS MATERIALIZED (
            SELECT vec_id, x, y,
                   CAST(floor(x / CAST((SELECT u FROM eps) AS DOUBLE)) AS BIGINT) AS cx,
                   CAST(floor(y / CAST((SELECT u FROM eps) AS DOUBLE)) AS BIGINT) AS cy
            FROM p
        ),
        pairs AS MATERIALIZED (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM cells a
            JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox ON true
            JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy ON true
            JOIN cells b ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy
            WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                  <= (SELECT u * u FROM eps)
        ),
        deg AS MATERIALIZED (
            SELECT a_id AS vec_id, COUNT(*) AS n_neighbors FROM pairs GROUP BY a_id
        ),
        core AS MATERIALIZED (
            SELECT vec_id FROM deg WHERE n_neighbors >= {_DBSCAN_MINPTS}
        )
        SELECT d.vec_id,
               CAST(d.n_neighbors AS BIGINT) AS n_neighbors,
               CASE WHEN d.n_neighbors >= {_DBSCAN_MINPTS} THEN 'core'
                    WHEN EXISTS (SELECT 1 FROM pairs pr JOIN core c
                                 ON pr.b_id = c.vec_id
                                 WHERE pr.a_id = d.vec_id) THEN 'border'
                    ELSE 'noise' END AS cls,
               {label_sql} AS label,
               (SELECT u FROM eps) AS eps_u
        FROM deg d
        ORDER BY d.vec_id
    """


@register(
    "q_dbscan_scheduled",
    oracle=_dbscan_scheduled_oracle(_DBSCAN_PLANTED_POINTS_SQL,
                                    _DBSCAN_PLANTED_LABEL_SQL),
    doc=(
        "DENSITY-SCHEDULED DBSCAN on the planted star (round 13, "
        "VERDICT r12 #8 — the fix for the fixed-eps caveat SCALE.md "
        "measured live): eps follows the d-dimensional density "
        "schedule eps ~ N^(-1/d) — in 2-D, eps_u(N) = floor(12000 * "
        "sqrt(500/N) + 0.5) int-micro — holding the expected eps-ball "
        "occupancy N*eps^2 constant as the corpus grows. Same planted "
        "labels, same grid machinery (_dbscan_classify, cells sized "
        "to the SCHEDULED eps); the derived eps_u is emitted as a "
        "hash-checked column and the oracle re-derives it in an eps "
        "CTE (sqrt/floor are correctly-rounded IEEE ops — both "
        "engines compute the identical integer). Measured: under "
        "fixed eps the sf0.1 shell collapses to 161/200 core; under "
        "the schedule it stays 196/200 noise while every blob point "
        "stays core at every SF — density classification is now "
        "scale-stable, which is the 100 TB requirement the caveat "
        "documented."
    ),
    tags=("extension", "similarity"),
)
def q_dbscan_scheduled(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    p = emb.select(
        "vec_id",
        _star_coord(0, _DBSCAN_STAR_X).alias("x"),
        _star_coord(1, _DBSCAN_STAR_Y).alias("y"),
    )
    eps_u = _dbscan_sched_eps(p.count())  # one bounded action, replayed in-SQL
    label = (
        F.when(F.col("vec_id") % 10 == 9, -1)
        .otherwise(F.col("vec_id") % 8)
        .cast("long")
        .alias("label")
    )
    return _dbscan_classify(p, eps_u=eps_u).select(
        "vec_id", "n_neighbors", "cls", label,
        F.lit(eps_u).cast("long").alias("eps_u"),
    )


# --- Random sign projection (round 11) --------------------------------
_RP_OUT = 16  # projected dimensions (64 -> 16)
_RP_PAIRS = 64  # anchor pairs measured: (0, k) for k in 1.._RP_PAIRS


@register(
    "q_random_projection",
    oracle=f"""
        WITH signs AS MATERIALIZED (
            SELECT j, i,
                   1 - 2 * (CAST('0x' || substring(
                       md5('rp' || CAST(j AS VARCHAR) || '_'
                                 || CAST(i AS VARCHAR)), 1, 1) AS BIGINT) % 2)
                       AS s
            FROM (SELECT unnest(range(0, {_RP_OUT})) AS j),
                 (SELECT unnest(range(0, 64)) AS i)
        ),
        xm AS MATERIALIZED (
            SELECT vec_id, i.i AS i,
                   CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000
                              + 0.5) AS BIGINT) AS x
            FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i
            WHERE vec_id <= {_RP_PAIRS}
        ),
        proj AS MATERIALIZED (
            SELECT xm.vec_id, sg.j, SUM(xm.x * sg.s) AS y
            FROM xm JOIN signs sg USING (i)
            GROUP BY xm.vec_id, sg.j
        ),
        d16 AS (
            SELECT a.vec_id, SUM((a.y - b.y) * (a.y - b.y)) AS d16_sq
            FROM proj a JOIN proj b ON a.j = b.j AND b.vec_id = 0
            WHERE a.vec_id <> 0
            GROUP BY a.vec_id
        ),
        d64 AS (
            SELECT a.vec_id, SUM((a.x - b.x) * (a.x - b.x)) AS d64_sq
            FROM xm a JOIN xm b ON a.i = b.i AND b.vec_id = 0
            WHERE a.vec_id <> 0
            GROUP BY a.vec_id
        ),
        pairs AS (
            SELECT d64.vec_id, CAST(d64.d64_sq AS BIGINT) AS d64_sq,
                   CAST(d16.d16_sq AS BIGINT) AS d16_sq,
                   (floor(CAST(d16.d16_sq AS DOUBLE)
                          / ({_RP_OUT} * CAST(d64.d64_sq AS DOUBLE))
                          * 100 * 10000 + 0.5) / 10000) AS ratio_pct
            FROM d64 JOIN d16 USING (vec_id)
        )
        SELECT vec_id, d64_sq, d16_sq, ratio_pct,
               (CAST(SUM(CAST(round(ratio_pct * 10000, 0) AS BIGINT))
                     OVER () AS DOUBLE)
                / CAST(10000 * COUNT(*) OVER () AS DOUBLE))
                   AS avg_ratio_pct
        FROM pairs
        ORDER BY vec_id
    """,
    doc=(
        "RANDOM SIGN PROJECTION (round 11) — the Johnson-"
        "Lindenstrauss / Achlioptas-2003 dimensionality reduction "
        "that precedes ANN at scale: project 64-dim embeddings to "
        "16 dims through a +/-1 sign matrix and MEASURE the distance "
        "distortion on 64 anchor pairs (E[||Rx||^2] = 16 ||x||^2 for "
        "a sign matrix, so ratio_pct = d16^2 / (16 * d64^2) * 100 "
        "should straddle 100%). The sign matrix is DERIVED IN-ENGINE "
        "on both sides — s(j,i) = 1 - 2*(first md5 hex nibble of "
        "'rp{j}_{i}' mod 2) — so no literal matrix ships in either "
        "plan and the projection replays bit-identically: projected "
        "coordinates are exact BIGINT sums of micro-int products. "
        "Plan: the 1024-entry sign table broadcasts onto the "
        "posexploded coordinates (one groupBy(vec_id, j) shuffle of "
        "16 rows per vector); per-pair distortion snaps to 4dp fixed "
        "point and the cross-pair mean is an order-independent "
        "fixed-point window sum. At 100 TB this is the standard "
        "pre-ANN bandwidth cut: 4x fewer bytes per vector into "
        "IVF/LSH while pairwise ordering survives within the "
        "measured distortion band."
    ),
    tags=("extension", "similarity"),
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", assert_schema=False)
    signs = (
        spark.range(_RP_OUT)
        .select(F.col("id").alias("j"))
        .crossJoin(spark.range(64).select(F.col("id").alias("i")))
        .select(
            "j",
            "i",
            (
                1
                - 2
                * (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("rp"),
                                    F.col("j").cast("string"),
                                    F.lit("_"),
                                    F.col("i").cast("string"),
                                )
                            ),
                            1,
                            1,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2
                )
            ).alias("s"),
        )
        .localCheckpoint(eager=True)  # 1024 rows, broadcast onto coordinates
    )
    xm = (
        emb.where(F.col("vec_id") <= _RP_PAIRS)
        .select("vec_id", F.posexplode("embedding").alias("i", "xe"))
        .select(
            "vec_id",
            "i",
            F.floor(F.col("xe").cast("double") * 1000000.0 + F.lit(0.5))
            .cast("long")
            .alias("x"),
        )
        .localCheckpoint(eager=True)  # reused: projection + exact d64
    )
    proj = (
        xm.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("x") * F.col("s")).alias("y"))
        .localCheckpoint(eager=True)  # reused: both sides of the d16 join
    )
    p0 = proj.where(F.col("vec_id") == 0).select("j", F.col("y").alias("y0"))
    d16 = (
        proj.where(F.col("vec_id") != 0)
        .join(F.broadcast(p0), "j")
        .groupBy("vec_id")
        .agg(F.sum((F.col("y") - F.col("y0")) * (F.col("y") - F.col("y0"))).alias("d16_sq"))
    )
    x0 = xm.where(F.col("vec_id") == 0).select("i", F.col("x").alias("x0"))
    d64 = (
        xm.where(F.col("vec_id") != 0)
        .join(F.broadcast(x0), "i")
        .groupBy("vec_id")
        .agg(F.sum((F.col("x") - F.col("x0")) * (F.col("x") - F.col("x0"))).alias("d64_sq"))
    )
    ratio = F.floor(
        F.col("d16_sq").cast("double")
        / (F.lit(float(_RP_OUT)) * F.col("d64_sq").cast("double"))
        * 100
        * 10000
        + F.lit(0.5)
    ) / F.lit(10000.0)
    from pyspark.sql import Window as W

    pairs = d64.join(d16, "vec_id").select(
        "vec_id",
        F.col("d64_sq").cast("long").alias("d64_sq"),
        F.col("d16_sq").cast("long").alias("d16_sq"),
        ratio.alias("ratio_pct"),
    )
    # ADVICE r11 #2: divide by the ACTUAL number of emitted pairs, not
    # the _RP_PAIRS constant — on a fixture missing some of vec_ids
    # 1.._RP_PAIRS the constant silently understated the mean (both
    # engines repeated the same mislabeled value, so the gate stayed
    # green while the column lied). 10000 * count is exact in DOUBLE.
    avg = (
        F.sum(F.round(F.col("ratio_pct") * 10000, 0).cast("long")).over(
            W.partitionBy()
        )
        / (F.lit(10000.0) * F.count(F.lit(1)).over(W.partitionBy()).cast("double"))
    ).cast("double")
    return pairs.select(
        "vec_id", "d64_sq", "d16_sq", "ratio_pct", avg.alias("avg_ratio_pct")
    ).orderBy("vec_id")
