"""Property-based tests (hypothesis) for the engine's numeric and
rewrite invariants — inputs the fixtures never produce."""

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from benchmark_spark.operators.aggregates import dsum

# money-like: up to 2 decimal digits, the catalog's value shape
money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(st.lists(money, min_size=1, max_size=40))
@_SETTINGS
def test_dsum_equals_exact_decimal_sum(spark, xs):
    """dsum over doubles == the exact Decimal sum, for ANY 2dp inputs
    (the double-sum would drift; the fixed-point sum may not)."""
    exact = float(sum(xs))
    df = spark.createDataFrame([(float(x),) for x in xs], ["x"])
    got = df.agg(dsum(F.col("x")).alias("s")).first()["s"]
    assert got == exact


@given(
    st.lists(
        st.integers(min_value=0, max_value=3_600 * 6), min_size=1, max_size=25
    )
)
@_SETTINGS
def test_session_window_equals_lag_cumsum_rewrite(spark, offsets):
    """Native session_window == the lag/gap-flag/cumsum rewrite (the
    oracle formulation of q_session) for arbitrary event times."""
    from pyspark.sql import Window

    rows = [(1, f"2024-01-01 00:00:00", s) for s in sorted(set(offsets))]
    df = (
        spark.createDataFrame(rows, ["user_id", "base", "off"])
        .select(
            "user_id",
            (F.col("base").cast("timestamp") + F.make_interval(secs=F.col("off"))).alias(
                "ts"
            ),
        )
    )
    native = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("s_start"), "n")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = df.withColumn(
        "new_s",
        F.when(
            F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800, 1
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rewritten = (
        flagged.withColumn("sid", F.sum("new_s").over(run))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.count(F.lit(1)).alias("n"))
        .select("user_id", "s_start", "n")
    )
    key = lambda d: sorted((r["user_id"], r["s_start"], r["n"]) for r in d.collect())
    assert key(native) == key(rewritten)


@given(st.data())
@_SETTINGS
def test_minhash_lsh_candidates_respect_similarity(spark, data):
    """High-overlap shingle sets collide in at least one LSH band far
    more often than disjoint sets: planted pair (j~0.9) must be a
    candidate, disjoint pair must not."""
    from benchmark_spark.llm.dedup import lsh_candidates, minhash_signatures

    base = data.draw(
        st.lists(
            st.text(alphabet="abcdefg", min_size=3, max_size=6),
            min_size=20,
            max_size=30,
            unique=True,
        )
    )
    near = base[:-1]  # drop one shingle -> jaccard ~0.95
    disjoint = [s + "zz" for s in base]  # no shared shingles
    rows = (
        [(0, s) for s in base]
        + [(1, s) for s in near]
        + [(2, s) for s in disjoint]
    )
    sh = spark.createDataFrame(rows, ["doc_id", "shingle"])
    cand = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidates(minhash_signatures(sh)).collect()
    }
    assert (0, 1) in cand
    assert (0, 2) not in cand


@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
            width=64,
        ),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_rnd_matches_duckdb_floor_form_bitwise(spark, xs):
    """The floor-form snap produces the IDENTICAL double in Spark and
    DuckDB for arbitrary inputs — the claim every hash-checked ratio
    in the repo rests on. repr(x) round-trips the double exactly, so
    both engines evaluate the same bits."""
    import duckdb

    from benchmark_spark.operators.aggregates import rnd, rnd_sql

    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    got = [r["y"] for r in df.select(rnd(F.col("x"), 4).alias("y")).collect()]
    con = duckdb.connect()
    # CAST to DOUBLE: bare decimal literals parse as DECIMAL in DuckDB,
    # but every production oracle applies rnd_sql to DOUBLE expressions
    want = [
        con.execute(f"SELECT {rnd_sql(f'CAST({x!r} AS DOUBLE)', 4)}").fetchone()[0]
        for x in xs
    ]
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=15))
@_SETTINGS
def test_md5_rank_matches_hashlib_everywhere(spark, keys):
    """md5(CAST(key AS STRING)) — the repo's portable 'random' — agrees
    bit-for-bit with hashlib (and therefore with DuckDB, itself pinned
    in the oracle gate) for arbitrary integer keys."""
    import hashlib

    df = spark.createDataFrame([(k,) for k in set(keys)], ["k"])
    got = {
        r["k"]: r["h"]
        for r in df.select("k", F.md5(F.col("k").cast("string")).alias("h")).collect()
    }
    for k in set(keys):
        assert got[k] == hashlib.md5(str(k).encode()).hexdigest()


def _pareto(points):
    """Brute-force 2-D Pareto frontier (maximize both): the NOT-EXISTS
    definition the skyline oracles state."""
    return {
        (x, y)
        for x, y in points
        if not any(
            (a >= x and b >= y and (a > x or b > y)) for a, b in points
        )
    }


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_skyline_2d_equals_brute_force(spark, pts):
    """skyline_2d (two windows, zero self-joins) == the O(n^2)
    NOT-EXISTS definition for arbitrary points incl. ties on either
    or both dimensions."""
    from benchmark_spark.operators.windows import skyline_2d

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], ["id", "x", "y"]
    )
    got = {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()}
    assert got == _pareto(pts)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=1, max_value=30_000),
)
@_SETTINGS
def test_grid_prune_never_drops_a_frontier_point(spark, pts, sx, sy):
    """q_skyline_grid's safety invariant, generically: a cell doomed
    because some strictly-up-and-right cell is occupied cannot contain
    a Pareto point — for ANY point set and ANY cell sizes. (The grid
    only changes how much work the exact pass sees, never the answer;
    the fixture pin in test_plans checks it fires, this checks it can
    never misfire.)"""
    frontier = _pareto(pts)
    cells = {(x // sx, y // sy) for x, y in pts}
    doomed = {
        (gx, gy)
        for gx, gy in cells
        if any(ox > gx and oy > gy for ox, oy in cells)
    }
    survivors = {(x, y) for x, y in pts if (x // sx, y // sy) not in doomed}
    assert frontier <= survivors
    # and pruning is sound end-to-end: frontier of survivors is the
    # frontier of the full set
    assert _pareto(list(survivors)) == frontier


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # a_id: few anchors
            st.integers(min_value=0, max_value=50),  # vec_id
            st.integers(min_value=-5, max_value=5),  # coarse score: ties likely
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(min_value=1, max_value=5),
)
@_SETTINGS
def test_topk_per_anchor_matches_sorted_reference(spark, rows, k):
    """topk_per_anchor (the shared tail of every ANN tier) == the
    python sort[(-score, vec_id)][:k] reference for arbitrary scores
    INCLUDING duplicates — the tiebreak is what keeps every ANN oracle
    hash-stable, so it must hold for any score distribution."""
    from collections import defaultdict

    from benchmark_spark.llm.similarity import topk_per_anchor

    df = spark.createDataFrame(
        [(a, v, float(s)) for a, v, s in rows], ["a_id", "vec_id", "raw"]
    )
    got = defaultdict(list)
    out = topk_per_anchor(df, k).orderBy("a_id", F.desc("score"), "neighbor_id")
    for r in out.collect():
        got[r["a_id"]].append(r["neighbor_id"])
    ref = defaultdict(list)
    by_anchor = defaultdict(list)
    for a, v, s in rows:
        by_anchor[a].append((v, s))
    for a, items in by_anchor.items():
        ref[a] = [v for v, _ in sorted(items, key=lambda t: (-t[1], t[0]))[:k]]
    assert {a: sorted(vs) for a, vs in got.items()} == {
        a: sorted(vs) for a, vs in ref.items()
    }


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=30),  # ts (days)
            st.integers(min_value=0, max_value=1000),  # unique id
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[2],
    ),
    st.integers(min_value=0, max_value=30),
)
@_SETTINGS
def test_asof_rewrite_matches_latest_per_key_reference(spark, rows, cutoff):
    """The q_asof rewrite (filter + row_number()=1 over ts DESC, id
    DESC) == 'latest row per key as of the cutoff' for arbitrary data,
    including duplicate timestamps per key (the id tiebreak decides)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, ["k", "ts", "id"])
    w = Window.partitionBy("k").orderBy(F.desc("ts"), F.desc("id"))
    got = {
        (r["k"], r["ts"], r["id"])
        for r in df.filter(F.col("ts") <= cutoff)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .collect()
    }
    ref = {}
    for k, ts, rid in rows:
        if ts <= cutoff and (k not in ref or (ts, rid) > (ref[k][0], ref[k][1])):
            ref[k] = (ts, rid)
    assert got == {(k, ts, rid) for k, (ts, rid) in ref.items()}


def _ref_lsh_pairs(rows, cap=None, bands=8, rpb=2):
    """Python reference of (capped_)lsh_candidates' semantics: band
    buckets on exact row values; with a cap, oversized buckets split
    once on the next signature row and sub-buckets still over the cap
    are dropped. `rows` is [(doc_id, [h0..h15])]."""
    from collections import defaultdict

    num_hashes = bands * rpb
    pairs = set()
    for j in range(bands):
        buckets = defaultdict(list)
        for doc, hs in rows:
            key = tuple(hs[j * rpb:(j + 1) * rpb])
            buckets[key].append((doc, hs[(j * rpb + rpb) % num_hashes]))
        for members in buckets.values():
            if cap is not None and len(members) > cap:
                sub = defaultdict(list)
                for doc, ext in members:
                    sub[ext].append(doc)
                groups = [g for g in sub.values() if len(g) <= cap]
            else:
                groups = [[d for d, _ in members]]
            for g in groups:
                g = sorted(g)
                for i in range(len(g)):
                    for k in range(i + 1, len(g)):
                        pairs.add((g[i], g[k]))
    return pairs


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),  # doc_id
            st.lists(
                st.integers(min_value=0, max_value=3), min_size=16, max_size=16
            ),
        ),
        min_size=2,
        max_size=22,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5),
)
@_SETTINGS
def test_capped_lsh_matches_reference_semantics(spark, rows, cap):
    """capped_lsh_candidates == the Python reference for ARBITRARY
    signature tables and caps: small buckets untouched, oversized ones
    split exactly once on the next signature row, still-oversized
    sub-buckets dropped. Hash values 0..3 force heavy bucket
    collisions the fixtures never produce. (Signature values are
    non-negative in production — md5-derived — so the kext=-1
    sentinel cannot collide; the strategy mirrors that.)"""
    from benchmark_spark.llm.dedup import capped_lsh_candidates

    df = spark.createDataFrame(
        [(doc, *hs) for doc, hs in rows],
        ["doc_id"] + [f"h{i}" for i in range(16)],
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in capped_lsh_candidates(df, bucket_cap=cap).collect()
    }
    assert got == _ref_lsh_pairs(rows, cap=cap)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # join key (collisions)
            st.integers(min_value=0, max_value=100),  # payload
        ),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),    # dim key (some unmatched)
            st.integers(min_value=0, max_value=100),  # dim attr
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=5),
)
@_SETTINGS
def test_salted_join_equals_plain_join(spark, fact_rows, dim_rows, buckets):
    """salted_join == the plain equi-join as a MULTISET for arbitrary
    data (duplicate keys on both sides, unmatched keys, any salt
    bucket count) — the rewrite the skew playbook leans on when AQE's
    splitter is blocked must be result-identical, not just on the
    oracle fixtures."""
    from collections import Counter

    from benchmark_spark.operators.skew import salted_join

    fact = spark.createDataFrame(fact_rows, ["k", "v"])
    dim = spark.createDataFrame(dim_rows, ["dk", "attr"])
    got = Counter(
        (r["k"], r["v"], r["dk"], r["attr"])
        for r in salted_join(
            fact, dim, "k", "dk", fact_salt_source=["v"], buckets=buckets
        ).collect()
    )
    want = Counter(
        (k, v, dk, attr)
        for (k, v) in fact_rows
        for (dk, attr) in dim_rows
        if k == dk
    )
    assert got == want


def test_samplers_invariant_to_shuffle_partitioning(spark):
    """Retry/speculation/cluster-shape safety of the sampling tier:
    every sampler derives its randomness from content hashes (md5 of
    row keys), never rand() or partition-local RNG, so the selected
    rows must be BYTE-IDENTICAL under different shuffle-partition
    counts. rand(seed) fails this exact test — it seeds per partition
    index, so re-planning (AQE), retries onto different splits, or a
    different cluster size silently changes the sample."""
    from tests.conftest import SF_SMOKE
    from benchmark_spark.registry import all_specs

    specs = all_specs()
    samplers = [
        "q_reservoir_sample",
        "q_stratified_sample",
        "q_weighted_sample",
        "q_importance_sample",
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_shuffle in ("32", "5"):
            spark.conf.set("spark.sql.shuffle.partitions", n_shuffle)
            results[n_shuffle] = {
                q: sorted(map(tuple, specs[q].fn(spark, SF_SMOKE).collect()))
                for q in samplers
            }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for q in samplers:
        assert results["32"][q] == results["5"][q], (
            f"{q} sampled different rows under a different shuffle width"
        )
        assert results["32"][q], f"{q} returned no rows"


@given(st.lists(st.text(alphabet="abcdef0123456789xyz_", min_size=1, max_size=24),
                min_size=1, max_size=24, unique=True))
@_SETTINGS
def test_hll_rho_matches_hashlib_bit_scan(spark, keys):
    """The engine's rho = 53 - length(bin(w)) string trick equals the
    definitional first-set-bit scan over hashlib's md5, for arbitrary
    key strings (including ones the fixtures never produce)."""
    import hashlib

    df = spark.createDataFrame([(k,) for k in keys], ["s"])
    md = F.md5(F.col("s"))
    w = F.conv(F.substring(md, 3, 13), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(w)))
    got = {
        r["s"]: (r["bucket"], r["rho"])
        for r in df.select(
            "s",
            F.conv(F.substring(md, 1, 2), 16, 10).cast("long").alias("bucket"),
            rho.alias("rho"),
        ).collect()
    }
    for k in keys:
        hx = hashlib.md5(k.encode()).hexdigest()
        bucket = int(hx[:2], 16)
        w_py = int(hx[2:15], 16)
        rho_py = 53 if w_py == 0 else 52 - w_py.bit_length() + 1
        assert got[k] == (bucket, rho_py)


@given(st.lists(st.integers(0, 10**9), min_size=8, max_size=40, unique=True))
@_SETTINGS
def test_kmv_kth_matches_hashlib_ranking(spark, keys):
    """The engine's k-smallest-hash selection (orderBy + limit + max)
    equals a hashlib recomputation of the same 60-bit portable hash
    ranking, for arbitrary integer key sets."""
    import hashlib

    from benchmark_spark.operators.sketches import _hash60

    k = 8
    df = spark.createDataFrame([(x,) for x in keys], ["key"])
    got = (
        df.select(_hash60(F.col("key").cast("string")).alias("h"))
        .orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("kth"))
        .first()["kth"]
    )
    ranks = sorted(int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16) for x in keys)
    assert got == ranks[min(k, len(keys)) - 1]
