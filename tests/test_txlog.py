"""Protocol tests for the transaction-log table format
(benchmark_spark/sources/txlog.py): commit atomicity and conflict
retry, snapshot isolation, time travel, footer-stats pruning, and the
registered queries' fixture invariants.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from benchmark_spark.sources.txlog import CommitConflict, TxLogTable

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return TxLogTable.create(
        spark, str(tmp_path / "t"), df, "k", n_files=4, stats_cols=("k",)
    )


def test_create_splits_files_with_footer_stats(table):
    adds = table.snapshot_adds()
    assert len(adds) == 4
    assert sum(a["rows"] for a in adds) == 1000
    ranges = sorted((a["cols"]["k"]["min"], a["cols"]["k"]["max"]) for a in adds)
    # equal-width slices over 0..999 (width 250), stats from real footers
    assert ranges == [(0, 249), (250, 499), (500, 749), (750, 999)]


def test_commit_conflict_retries_to_next_version(table):
    # plant a racer: claim version 1 before the table's own commit
    racer = os.path.join(table.log_dir, "00000001.json")
    with open(racer, "w") as f:
        json.dump({"version": 1, "op": "racer", "actions": []}, f)
    v = table.commit([{"add": "probe.parquet", "rows": 1, "cols": {}}], op="probe")
    assert v == 2  # lost version 1, retried, claimed 2
    assert [c["op"] for c in table.history()] == ["create", "racer", "probe"]
    # bounded retries: exhaust every slot the committer would try
    for nxt in range(3, 9):
        with open(os.path.join(table.log_dir, f"{nxt:08d}.json"), "w") as f:
            json.dump({"version": nxt, "op": "racer", "actions": []}, f)

    class Stuck(TxLogTable):
        def versions(self):  # stale view: always sees only up to v2
            return [0, 1, 2]

    with pytest.raises(CommitConflict):
        Stuck(table.path).commit([], op="never", retries=3)
    # no temp litter left behind by the losing attempts
    assert not [f for f in os.listdir(table.log_dir) if f.startswith(".tmp")]


def test_snapshot_isolation_under_concurrent_commit(spark, table):
    files_before = table.snapshot_files()  # reader resolves its snapshot
    df_before = spark.read.parquet(*files_before)
    n_before = df_before.count()
    # a writer deletes half the table AFTER the reader resolved
    table.delete_where(spark, "k", 0, 499, ("k",))
    assert spark.read.parquet(*files_before).count() == n_before  # unchanged
    assert table.read(spark).count() == 500  # new snapshot sees the delete


def test_time_travel_reads_any_version(spark, table):
    table.append(spark, spark.range(1000, 1100).select(F.col("id").alias("k"), F.lit(0).alias("v")), ("k",))
    table.delete_where(spark, "k", 0, 999, ("k",))
    assert table.read(spark, version=0).count() == 1000
    assert table.read(spark, version=1).count() == 1100
    assert table.read(spark).count() == 100


def test_delete_prunes_by_footer_stats(spark, table):
    counters = table.delete_where(spark, "k", 300, 399, ("k",))
    # only the 250-499 slice overlaps [300, 399]
    assert counters == {"files_total": 4, "files_rewritten": 1}
    assert table.read(spark).count() == 900
    # untouched files are still the original objects (copy-on-write)
    names = {os.path.basename(f) for f in table.snapshot_files()}
    orig = {a["add"] for a in TxLogTable(table.path).snapshot_adds(version=0)}
    assert len(names & orig) == 3


def test_merge_rewrites_strict_subset_and_upserts(spark, table):
    updates = spark.range(240, 260).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    )
    counters = table.merge(spark, updates, "k", ("k",))
    # [240,259] spans the 0-249 and 250-499 slices only
    assert counters == {"files_total": 4, "files_rewritten": 2}
    got = {r["k"]: r["v"] for r in table.read(spark).collect()}
    assert len(got) == 1000
    assert all(got[k] == -1 for k in range(240, 260))
    assert got[0] == 0 and got[999] == 1998
    # inserts: keys beyond every file's range go in without a rewrite
    ins = spark.range(5000, 5010).select(F.col("id").alias("k"), F.lit(7).alias("v"))
    counters = table.merge(spark, ins, "k", ("k",))
    assert counters["files_rewritten"] == 0
    assert table.read(spark).count() == 1010


def test_compact_is_one_commit_and_loses_nothing(spark, table):
    before = sorted(r["k"] for r in table.read(spark).collect())
    v = table.compact(spark, ("k",))
    assert len(table.snapshot_files()) == 1
    assert sorted(r["k"] for r in table.read(spark).collect()) == before
    assert table.read(spark, version=v - 1).count() == 1000  # pre-compact view intact


def test_empty_snapshot_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="empty table snapshot"):
        TxLogTable(str(tmp_path / "nope")).read(spark)


def test_registered_merge_prunes(spark):
    """The q_txlog_merge fixture must exercise pruning for real: its
    banded update batch rewrites a strict subset of the 6 files."""
    from benchmark_spark.sources.txlog import _scenario

    # the scenario helper's counters are what q_txlog_prune_stats emits
    t, counters, dlo, dhi = _scenario(spark, SF_SMOKE)
    assert 0 < counters["files_rewritten"] < counters["files_total"]
    ops = [c["op"] for c in t.history()]
    assert ops == ["create", "append", "delete"]


def test_checkpoint_equals_full_replay_and_bounds_resolution(spark, table):
    table.append(spark, spark.range(1000, 1100).select(F.col("id").alias("k"), F.lit(0).alias("v")), ("k",))
    table.delete_where(spark, "k", 0, 249, ("k",))
    full = sorted(os.path.basename(f) for f in table.snapshot_files())
    cp_v = table.checkpoint()
    assert cp_v == 2
    # post-checkpoint resolution must agree with the raw replay
    assert sorted(os.path.basename(f) for f in table.snapshot_files()) == full
    # commits after the checkpoint layer on top of it
    table.append(spark, spark.range(2000, 2010).select(F.col("id").alias("k"), F.lit(1).alias("v")), ("k",))
    # 1000 base + 100 appended - 250 deleted + 10 appended post-cp
    assert table.read(spark).count() == 860
    # time travel BEFORE the checkpoint still replays the raw log
    assert table.read(spark, version=0).count() == 1000
    # a reader that starts from the checkpoint never opens commits 0-2
    class CountingTable(TxLogTable):
        opened = []
        def _read_commit(self, version):
            self.opened.append(version)
            return super()._read_commit(version)
    t2 = CountingTable(table.path)
    t2.snapshot_adds()
    assert t2.opened == [3]


def test_vacuum_respects_retention_and_breaks_old_travel(spark, table):
    table.delete_where(spark, "k", 0, 499, ("k",))
    table.compact(spark, ("k",))
    removed = table.vacuum(retain_versions=0, grace_secs=0)
    # all four originals: two were rewritten away by the delete (whose
    # survivor set was empty, so no replacement file), two by compact
    assert len(removed) == 4
    assert table.read(spark).count() == 500  # latest snapshot intact
    with pytest.raises(Exception):  # pre-vacuum version lost its files
        table.read(spark, version=0).count()


def test_vacuum_grace_window_spares_inflight_writes(spark, table):
    """ADVICE r8 (medium): data files land under their final names
    BEFORE the owning commit, so a vacuum racing an in-flight write
    must not delete young unreferenced files — under the default grace
    window they survive, and the writer's later commit references
    intact data. grace_secs=0 (single-writer exclusivity) still
    deletes them."""
    # stage uncommitted data exactly like a racing writer would
    actions = table._write_files(
        spark, [spark.range(5000, 5010).select(F.col("id").alias("k"), F.lit(9).alias("v"))], ("k",)
    )
    staged = {a["add"] for a in actions}
    removed = set(table.vacuum(retain_versions=0))  # default 1h grace
    assert not (removed & staged), "vacuum deleted an in-flight writer's files"
    table.commit(actions, op="late-append")  # the racing commit lands
    assert table.read(spark).count() == 1010  # nothing corrupted
    # with the guard explicitly off and the files unreferenced, they go
    table.delete_where(spark, "k", 5000, 5009, ("k",))
    removed2 = set(table.vacuum(retain_versions=0, grace_secs=0))
    assert staged <= removed2


def _hammer_commits(args):
    """Worker (module-level for pickling): N commits against one log."""
    path, worker_id, n = args
    t = TxLogTable(path)
    got = []
    for i in range(n):
        got.append(t.commit([{"add": f"w{worker_id}-{i}.parquet", "rows": 1, "cols": {}}],
                            op=f"w{worker_id}", retries=200))
    return got


def test_concurrent_writers_serialize_without_loss(table):
    """REAL multi-process contention: 4 processes hammer 12 commits
    each against the same log directory. The link+unlink version claim
    must serialize them — every commit gets a unique version, nothing
    is lost or overwritten, and the log replays to exactly the union
    of all writers' files."""
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(_hammer_commits, [(table.path, w, 12) for w in range(4)]))
    versions = [v for worker in results for v in worker]
    assert len(versions) == 48
    assert len(set(versions)) == 48, "two writers claimed the same version"
    assert sorted(versions) == list(range(1, 49))  # dense, after create=0
    live = {a["add"] for a in table.snapshot_adds()}
    expected = {f"w{w}-{i}.parquet" for w in range(4) for i in range(12)}
    assert expected <= live
    # every commit document is intact JSON with its own op stamp
    ops = [c["op"] for c in table.history()]
    assert sorted(ops[1:]) == sorted(f"w{w}" for w in range(4) for _ in range(12))


def test_read_where_skips_files_and_loses_nothing(spark, table):
    df, counters = table.read_where(spark, "k", 300, 399)
    assert counters == {"files_total": 4, "files_scanned": 1}
    got = sorted(r["k"] for r in df.collect())
    assert got == list(range(300, 400))
    # disjoint range: zero files opened, empty (but schema-correct) result
    df2, c2 = table.read_where(spark, "k", 10_000, 10_100)
    assert c2["files_scanned"] == 0 and df2.count() == 0
    assert df2.columns == ["k", "v"]


def test_stale_remove_raises_concurrent_modification(spark, table):
    """Lost-update protection: writer A resolves a snapshot and plans
    to rewrite a file; writer B rewrites that same file first. A's
    commit must raise ConcurrentModification (not blindly retry at the
    next version — that would drop B's replacement rows)."""
    from benchmark_spark.sources.txlog import ConcurrentModification

    victim = table.snapshot_adds()[0]["add"]  # A plans to remove this
    # B gets there first: rewrites the same file via a ranged delete
    lo = table.snapshot_adds()[0]["cols"]["k"]["min"]
    table.delete_where(spark, "k", lo, lo + 10, ("k",))
    assert victim not in {a["add"] for a in table.snapshot_adds()}
    with pytest.raises(ConcurrentModification, match=victim):
        table.commit(
            [{"add": "a-replacement.parquet", "rows": 1, "cols": {}},
             {"remove": victim}],
            op="stale-writer",
        )
    # the table is untouched by the failed commit
    assert [c["op"] for c in table.history()][-1] == "delete"


def test_stream_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """A foreachBatch retry (same batch_id) must not double-ingest:
    stream_commit_batch skips batch_ids already in the log."""
    from benchmark_spark.sources.txlog import stream_commit_batch

    t = TxLogTable(str(tmp_path / "s"))
    os.makedirs(t.path, exist_ok=True)
    batch = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    assert stream_commit_batch(t, batch, 0, ("k",)) is True
    assert stream_commit_batch(t, batch, 1, ("k",)) is True
    n_commits = len(t.versions())
    # replays of both batches: skipped, log unchanged, no new files
    assert stream_commit_batch(t, batch, 0, ("k",)) is False
    assert stream_commit_batch(t, batch, 1, ("k",)) is False
    assert len(t.versions()) == n_commits
    assert t.read(spark).count() == 200
    assert [c["batch_id"] for c in t.history()] == [0, 1]


def test_schema_evolution_time_travel_returns_old_schema(spark):
    """The logged schema is authoritative: time travel to v0 must NOT
    show the column added at v1, even though mergeSchema over the v0
    files would happily union whatever exists."""
    from benchmark_spark.sources.txlog import (
        TxLogTable, _schema_fields, read_with_schema,
    )

    import uuid as _uuid
    path = f"/root/repo/.scratch/txlog-schema-{_uuid.uuid4().hex}"
    os.makedirs(path, exist_ok=True)
    t = TxLogTable(path)
    v0 = spark.range(0, 50).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    t.commit(t._write_files(spark, [v0], ("k",)), op="create",
             extra={"metaData": {"schema": _schema_fields(v0)}})
    v1 = spark.range(50, 60).select(
        F.col("id").alias("k"), F.lit(2).alias("v"), F.lit("x").alias("tag"))
    t.commit(t._write_files(spark, [v1], ("k",)), op="append-evolve",
             extra={"metaData": {"schema": _schema_fields(v1)}})
    latest = read_with_schema(spark, t)
    assert latest.columns == ["k", "v", "tag"]
    assert latest.filter("tag IS NULL").count() == 50  # old files null-filled
    old = read_with_schema(spark, t, version=0)
    assert old.columns == ["k", "v"]  # pre-evolution schema, no tag
    assert old.count() == 50


def _pa_merge_actions(path: str, k_lo: int, k_hi: int, new_v: int):
    """Resolve-snapshot + stage a merge rewrite with pyarrow (workers
    run without Spark): rewrite the file(s) overlapping [k_lo, k_hi]
    with v=new_v for that band. Returns (staged actions, staged name)."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as _pq
    import pandas as pd

    t = TxLogTable(path)
    touched = [
        a for a in t.snapshot_adds()
        if a["cols"]["k"]["min"] <= k_hi and a["cols"]["k"]["max"] >= k_lo
    ]
    df = pd.concat(
        [_pq.read_table(os.path.join(path, a["add"])).to_pandas() for a in touched]
    )
    df.loc[(df.k >= k_lo) & (df.k <= k_hi), "v"] = new_v
    name = f"part-{_uuid.uuid4().hex}.parquet"
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(path, name))
    actions = [{"add": name, "rows": len(df),
                "cols": {"k": {"min": int(df.k.min()), "max": int(df.k.max())}}}]
    actions += [{"remove": a["add"]} for a in touched]
    return actions, name


def _wait_for(path: str, timeout: float = 60.0) -> None:
    import time as _time

    deadline = _time.time() + timeout
    while not os.path.exists(path):
        if _time.time() > deadline:
            raise TimeoutError(path)
        _time.sleep(0.01)


def _merge_loser(args):
    """Worker A: resolves its snapshot, stages its rewrite, then lets
    worker B commit a conflicting merge FIRST. Its own commit must
    raise ConcurrentModification; it must then RECOMPUTE against the
    new snapshot and succeed — the lost-update recovery a real writer
    needs (VERDICT r8 #7)."""
    path, sync = args
    from benchmark_spark.sources.txlog import ConcurrentModification

    actions, staged = _pa_merge_actions(path, 0, 9, 1111)
    open(os.path.join(sync, "A_STAGED"), "w").close()
    _wait_for(os.path.join(sync, "B_DONE"))
    t = TxLogTable(path)
    conflict_seen = False
    try:
        t.commit(actions, op="merge-A-stale")
    except ConcurrentModification:
        conflict_seen = True
        os.unlink(os.path.join(path, staged))  # abandon the stale rewrite
        actions, _ = _pa_merge_actions(path, 0, 9, 1111)  # recompute
        t.commit(actions, op="merge-A-retry")
    return conflict_seen


def _merge_winner(args):
    path, sync = args
    _wait_for(os.path.join(sync, "A_STAGED"))
    actions, _ = _pa_merge_actions(path, 10, 19, 2222)
    TxLogTable(path).commit(actions, op="merge-B")
    open(os.path.join(sync, "B_DONE"), "w").close()
    return True


def test_merge_losing_race_recomputes_and_matches_serial(spark, table, tmp_path):
    """End-to-end OCC recovery across REAL processes (VERDICT r8 #7):
    two writers merge into the same hot file; the file-based handshake
    forces writer A to commit AFTER writer B rewrote the file A's
    remove set references, so A's first commit deterministically raises
    ConcurrentModification; A recomputes against the new snapshot and
    retries. The final table must equal the SERIAL execution (B then
    A) row for row — B's update is not lost, A's lands exactly once."""
    from concurrent.futures import ProcessPoolExecutor

    sync = str(tmp_path / "sync")
    os.makedirs(sync)
    with ProcessPoolExecutor(max_workers=2) as ex:
        fa = ex.submit(_merge_loser, (table.path, sync))
        fb = ex.submit(_merge_winner, (table.path, sync))
        assert fb.result(timeout=120) is True
        assert fa.result(timeout=120) is True, "the planted conflict never fired"
    got = {r["k"]: r["v"] for r in spark.read.parquet(*table.snapshot_files()).collect()}
    expected = {k: (1111 if k < 10 else 2222 if k < 20 else 2 * k) for k in range(1000)}
    assert got == expected
    ops = [c["op"] for c in table.history()]
    assert ops == ["create", "merge-B", "merge-A-retry"]


def test_restore_moves_head_back_as_new_commit(spark, table):
    table.delete_where(spark, "k", 0, 249, ("k",))
    assert table.read(spark).count() == 750
    v = table.restore(0)
    assert v == 2  # the rollback is itself a commit
    assert table.read(spark).count() == 1000  # head shows the old state
    assert table.read(spark, version=1).count() == 750  # undone delete
    assert [c["op"] for c in table.history()] == ["create", "delete", "restore"]
    assert table._read_commit(2)["restored_version"] == 0
    # restoring past the vacuum horizon refuses instead of corrupting
    table.delete_where(spark, "k", 500, 999, ("k",))
    table.vacuum(retain_versions=0, grace_secs=0)
    with pytest.raises(ValueError):
        table.restore(1)


def test_cdc_rewrite_carryover_rows_cancel(spark, table):
    """Change data feed: a copy-on-write delete rewrites a whole file,
    but only the logically deleted rows may appear in the feed — the
    carried-over survivors in the rewritten file must cancel under
    exceptAll. An update (delete+reinsert under MERGE) shows as a
    delete+insert pair for the changed row only."""
    table.delete_where(spark, "k", 100, 149, ("k",))  # half of file 0
    changes = table.read_changes(spark, 0, 1)
    rows = changes.collect()
    assert all(r["change_type"] == "delete" for r in rows)
    assert sorted(r["k"] for r in rows) == list(range(100, 150))
    # merge-as-update: one row changes value -> one delete + one insert
    upd = spark.createDataFrame([(300, 999_999)], "k long, v long")
    table.merge(spark, upd, "k", ("k",))
    delta = table.read_changes(spark, 1, 2).collect()
    by_type = {r["change_type"]: r for r in delta}
    assert len(delta) == 2
    assert by_type["delete"]["k"] == 300 and by_type["delete"]["v"] == 600
    assert by_type["insert"]["k"] == 300 and by_type["insert"]["v"] == 999_999
    with pytest.raises(ValueError):
        table.read_changes(spark, 2, 2)  # no file changes in an empty span


def test_stream_source_offsets_and_append_only_contract(spark, table, tmp_path):
    """The txlog streaming source: version-capped batches produce
    multiple offset hand-offs (5 commits / cap 2 -> 3 reads), the
    union of batches equals the log's content exactly, and a remove
    action in the consumed range raises (append-only contract)."""
    from benchmark_spark.sources.txlog import (
        TxLogStreamReader,
        _STREAM_SRC_VERSIONS_PER_BATCH,
    )

    # table fixture has 1 create commit (4 adds); add 4 more appends
    for i in range(4):
        table.append(
            spark,
            spark.range(2000 + 10 * i, 2010 + 10 * i).select(
                F.col("id").alias("k"), F.lit(i).alias("v")
            ),
            ("k",),
        )
    r = TxLogStreamReader({"path": table.path})
    offset = r.initialOffset()
    seen, hops = [], 0
    while True:
        rows, nxt = r.read(offset)
        rows = list(rows)
        if not rows and nxt == offset:
            break
        hops += 1
        seen.extend(rows)
        offset = nxt
    assert hops == -(-5 // _STREAM_SRC_VERSIONS_PER_BATCH)  # 3 hand-offs
    assert len(seen) == 1000 + 40
    assert offset == {"version": 4}
    # a delete (remove actions) poisons the next read
    table.delete_where(spark, "k", 0, 99, ("k",))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="append-only"):
        rows, _ = r.read(offset)
        list(rows)


def test_stream_source_read_between_offsets_replays_committed_batch(
    spark, table, tmp_path
):
    """Failure recovery (ADVICE r9): a restarted stream replaying a
    committed batch via readBetweenOffsets(start, end) gets EXACTLY
    the rows the original read() returned for that offset range —
    and only those (neither earlier nor later commits leak in)."""
    from benchmark_spark.sources.txlog import TxLogStreamReader

    for i in range(4):
        table.append(
            spark,
            spark.range(2000 + 10 * i, 2010 + 10 * i).select(
                F.col("id").alias("k"), F.lit(i).alias("v")
            ),
            ("k",),
        )
    r = TxLogStreamReader({"path": table.path})
    # drive read() forward recording each (start, end, rows) hop
    hops = []
    offset = r.initialOffset()
    while True:
        rows, nxt = r.read(offset)
        rows = sorted(rows)
        if not rows and nxt == offset:
            break
        hops.append((offset, nxt, rows))
        offset = nxt
    assert len(hops) == 3
    # replay every hop through the recovery path
    for start, end, rows in hops:
        replay = sorted(r.readBetweenOffsets(start, end))
        assert replay == rows
    # a mid-log range replays only its own commits
    mid = sorted(r.readBetweenOffsets({"version": 0}, {"version": 2}))
    assert len(mid) == 20  # appends v1 and v2, 10 rows each
    assert all(2000 <= k < 2020 for k, _v in mid)


def test_vacuum_sweeps_aged_stage_dirs_but_not_fresh_ones(spark, table):
    """A crashed writer's leaked .stage-* dir is swept by vacuum once
    it ages past the grace window, is spared inside it, and never
    pollutes the returned data-file ledger (ADVICE r9)."""
    stale = os.path.join(table.path, ".stage-deadbeef")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-x.parquet"), "w") as f:
        f.write("junk")
    old = 1_000_000.0
    os.utime(stale, (old, old))
    fresh = os.path.join(table.path, ".stage-cafebabe")
    os.makedirs(fresh)
    removed = table.vacuum(retain_versions=0, grace_secs=3600)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # inside the grace window: spared
    assert all(f.endswith(".parquet") for f in removed)  # ledger is data-only
    os.rmdir(fresh)


def test_delete_vectors_merge_on_read(spark, table):
    """Point delete via deletion vectors: no file is rewritten, readers
    anti-merge the positions, and a SECOND dv on the same file merges
    cumulatively."""
    before_files = {a["add"] for a in table.snapshot_adds()}
    c = table.delete_keys(spark, "k", [5, 300, 301], ("k",))
    assert c["files_rewritten"] == 0
    assert c["dv_files"] == 2  # keys 5 and 300/301 live in two bucket files
    assert {a["add"] for a in table.snapshot_adds()} == before_files
    got = {r[0] for r in table.read(spark).select("k").collect()}
    assert got == set(range(1000)) - {5, 300, 301}
    # cumulative: a second dv commit on an already-vectored file
    table.delete_keys(spark, "k", [6], ("k",))
    got = {r[0] for r in table.read(spark).select("k").collect()}
    assert got == set(range(1000)) - {5, 6, 300, 301}


def test_delete_vectors_time_travel_resolves_pre_dv_snapshot(spark, table):
    """Time travel to a version BEFORE the dv commit sees the deleted
    rows (VERDICT r9 #2 'Done =' pin); the dv'd version does not."""
    v0 = table.versions()[-1]
    table.delete_keys(spark, "k", [42], ("k",))
    assert table.read(spark, version=v0).filter(F.col("k") == 42).count() == 1
    assert table.read(spark).filter(F.col("k") == 42).count() == 0


def test_delete_vectors_fold_in_and_read_where(spark, table):
    """read_where's pruned path honors dv state, and compaction folds
    vectors into plain files (no dv survives, no row lost)."""
    table.delete_keys(spark, "k", [10, 11], ("k",))
    df, counters = table.read_where(spark, "k", 0, 20)
    assert {r[0] for r in df.select("k").collect()} == set(range(21)) - {10, 11}
    assert counters["files_scanned"] == 1
    table.compact(spark, ("k",))
    assert not any(a.get("dv") for a in table.snapshot_adds())
    assert table.read(spark).count() == 998


def test_delete_vectors_restore_resets_dv_state(spark, table):
    """RESTORE to a pre-DV version brings the vectored rows back even
    though the file SET never changed (dv-state drift is part of the
    restore diff)."""
    v0 = table.versions()[-1]
    table.delete_keys(spark, "k", [7], ("k",))
    assert table.read(spark).count() == 999
    table.restore(v0)
    assert table.read(spark).count() == 1000
    # and the undone dv remains time-travelable below the restore
    assert table.read(spark, version=v0 + 1).count() == 999


def test_delete_vectors_conflict_with_concurrent_rewrite(spark, table):
    """A dv commit whose target was concurrently rewritten must raise
    ConcurrentModification (it would resurrect replaced rows
    otherwise), exactly like a stale remove."""
    from benchmark_spark.sources.txlog import ConcurrentModification

    target = table.snapshot_adds()[0]["add"]
    # dv action staged against the current snapshot...
    stale = [{"dv": target, "positions": [0]}]
    # ...but the file is rewritten (compacted away) first
    table.compact(spark, ("k",))
    with pytest.raises(ConcurrentModification):
        table.commit(stale, op="delete_dv")


def test_delete_vectors_cdc_emits_row_level_deletes(spark, table):
    """CDC across a dv commit yields exactly the vectored rows as
    'delete' with NO file-set diff."""
    v0 = table.versions()[-1]
    table.delete_keys(spark, "k", [17, 400], ("k",))
    changes = table.read_changes(spark, v0, v0 + 1)
    rows = {(r["k"], r["change_type"]) for r in changes.collect()}
    assert rows == {(17, "delete"), (400, "delete")}


@pytest.fixture()
def ptable(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    return TxLogTable.create_partitioned(
        spark, str(tmp_path / "pt"), df, "p", "k", n_files=4, stats_cols=("k",)
    )


def test_partitioned_create_layout_and_full_read(spark, ptable):
    """One file per (partition, bucket) cell, partition value in the
    add action (not the data file), re-injected on read."""
    adds = ptable.snapshot_adds()
    assert len(adds) == 8  # 2 partitions x 4 buckets
    assert all(a["partition"]["p"] in ("a", "b") for a in adds)
    # the data files themselves do NOT contain p
    import pyarrow.parquet as pq

    f = ptable.snapshot_files()[0]
    assert "p" not in pq.ParquetFile(f).schema_arrow.names
    got = ptable.read(spark)
    assert got.count() == 1000
    assert got.filter((F.col("p") == "a") & (F.col("k") % 3 != 0)).count() == 0
    assert got.filter(F.col("p") == "a").count() == 334  # 0,3,...,999


def test_partition_prune_composes_with_stats(spark, ptable):
    """partition-first prune, then the zone map: counters compose and
    the surviving rows are exact."""
    df, c = ptable.read_where(spark, "k", 300, 399, partition={"p": "a"})
    assert c["files_total"] == 8
    assert c["files_in_partition"] == 4
    assert c["files_scanned"] == 1  # bucket [250, 499] only
    ks = sorted(r[0] for r in df.select("k").collect())
    assert ks == [k for k in range(300, 400) if k % 3 == 0]
    assert df.filter(F.col("p") != "a").count() == 0


def test_partitioned_delete_keeps_attribution(spark, ptable):
    """Copy-on-write delete bounded to one partition rewrites only that
    partition's overlapping files, and the survivors stay attributed —
    a later partition read still sees them."""
    c = ptable.delete_where(spark, "k", 0, 249, ("k",), partition={"p": "a"})
    assert c == {"files_total": 8, "files_rewritten": 1}
    # partition b untouched; partition a lost its first bucket's rows
    assert ptable.read(spark).filter(F.col("p") == "b").count() == 666
    got_a = {r[0] for r in ptable.read(spark).filter(F.col("p") == "a").select("k").collect()}
    assert got_a == {k for k in range(250, 1000) if k % 3 == 0}
    # an UNpartitioned delete across both partitions keeps attribution too
    ptable.delete_where(spark, "k", 500, 599, ("k",))
    df, c2 = ptable.read_where(spark, "k", 400, 700, partition={"p": "b"})
    ks = sorted(r[0] for r in df.select("k").collect())
    assert ks == [k for k in range(400, 701) if k % 3 != 0 and not (500 <= k <= 599)]


def test_partitioned_dv_and_compose(spark, ptable):
    """Deletion vectors work on partitioned files (the dv rides the
    add action next to the partition value)."""
    c = ptable.delete_keys(spark, "k", [3, 6, 501], ("k",))
    assert c["files_rewritten"] == 0
    got = ptable.read(spark).filter(F.col("p") == "a").count()
    assert got == 334 - 3  # 3 and 6 and 501 are all %3==0
    df, _ = ptable.read_where(spark, "k", 0, 10, partition={"p": "a"})
    assert sorted(r[0] for r in df.select("k").collect()) == [0, 9]


def test_partitioned_stream_reader_protocol(spark, table, tmp_path):
    """The partitioned streaming source's planner contract: offsets
    step at most versionsperbatch per latestOffset, each added FILE in
    the consumed range is one InputPartition, read(partition) yields
    that file's rows, and a remove in the range raises at PLAN time."""
    from benchmark_spark.sources.txlog import (
        _txlog_partitioned_stream_source_cls,
    )

    for i in range(4):
        table.append(
            spark,
            spark.range(2000 + 10 * i, 2010 + 10 * i).select(
                F.col("id").alias("k"), F.lit(i).alias("v")
            ),
            ("k",),
        )
    src = _txlog_partitioned_stream_source_cls()({"path": table.path})
    r = src.streamReader(None)
    offset = r.initialOffset()
    seen_rows, hops = 0, 0
    while True:
        end = r.latestOffset()
        if end == offset:
            break
        parts = r.partitions(offset, end)
        hops += 1
        for p in parts:
            seen_rows += sum(1 for _ in r.read(p))
        r.commit(end)
        offset = end
    assert hops == 3  # 5 commits / cap 2
    assert seen_rows == 1000 + 40
    # the create commit alone contributed 4 partitions (4 bucket files)
    parts0 = r.partitions({"version": -1}, {"version": 0})
    assert len(parts0) == 4
    # a remove poisons planning, not execution
    table.delete_where(spark, "k", 0, 99, ("k",))
    with pytest.raises(ValueError, match="append-only"):
        r.partitions(offset, {"version": offset["version"] + 1})


def test_checkpoint_preserves_deletion_vector_state(spark, table):
    """A checkpoint stores the MERGED dv state, and a reader starting
    from it (never opening the raw dv commits) resolves the same live
    rows; dv commits AFTER the checkpoint layer on top."""
    table.delete_keys(spark, "k", [5, 6], ("k",))
    table.checkpoint()
    table.delete_keys(spark, "k", [7], ("k",))

    class CountingTable(TxLogTable):
        opened: list = []

        def _read_commit(self, version):
            self.opened.append(version)
            return super()._read_commit(version)

    t2 = CountingTable(table.path)
    adds = t2.snapshot_adds()
    assert t2.opened == [2]  # only the post-checkpoint dv commit
    dv = {p for a in adds if a.get("dv") for p in a["dv"]}
    assert len(dv) == 3
    got = {r[0] for r in t2.read(spark).select("k").collect()}
    assert got == set(range(1000)) - {5, 6, 7}


def test_partitioned_compact_preserves_attribution(spark, ptable):
    """Compaction on a partitioned table rewrites PER PARTITION GROUP:
    attribution survives (partition-filtered reads still see all rows)
    and the layout collapses to one file per partition."""
    ptable.delete_keys(spark, "k", [3], ("k",))  # a dv to fold in, too
    ptable.compact(spark, ("k",))
    adds = ptable.snapshot_adds()
    assert len(adds) == 2  # one compacted file per partition
    assert {a["partition"]["p"] for a in adds} == {"a", "b"}
    assert not any(a.get("dv") for a in adds)
    df, c = ptable.read_where(spark, "k", 0, 999, partition={"p": "a"})
    assert c == {"files_total": 2, "files_in_partition": 1, "files_scanned": 1}
    assert df.count() == 334 - 1


def test_unattributed_files_stay_visible_to_partition_reads(spark, ptable):
    """A merge (or plain append) writes files WITHOUT partition
    metadata; the partition filter must keep them conservatively and
    rely on the row filter — rows must never vanish from partition
    reads just because a writer didn't attribute them."""
    ups = spark.createDataFrame([(3, "a", -1), (5000, "a", 7)], "k long, p string, v long")
    ptable.merge(spark, ups, "k", ("k",))
    # k=3 (updated, %3==0 so partition a) and k=5000 (insert) live in
    # unattributed files now; both must appear under the 'a' filter
    df, c = ptable.read_where(spark, "k", 0, 5000, partition={"p": "a"})
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got[3] == -1 and got[5000] == 7
    assert df.filter(F.col("p") != "a").count() == 0  # row filter exact
    # and the b partition does NOT see them
    df_b, _ = ptable.read_where(spark, "k", 0, 5000, partition={"p": "b"})
    assert 5000 not in {r["k"] for r in df_b.select("k").collect()}


def test_concurrent_dv_writers_serialize_or_conflict(spark, table):
    """Two point-delete writers: if their dv commits land on different
    versions they BOTH apply (cumulative union — neither is lost); a
    dv staged against a snapshot whose target was compacted away
    raises ConcurrentModification instead of resurrecting rows."""
    from benchmark_spark.sources.txlog import ConcurrentModification

    t2 = TxLogTable(table.path)  # second writer, same table
    table.delete_keys(spark, "k", [1], ("k",))
    t2.delete_keys(spark, "k", [2], ("k",))
    got = {r[0] for r in table.read(spark).select("k").collect()}
    assert got == set(range(1000)) - {1, 2}
    # stage a dv against the current head, then compact underneath it
    target = table.snapshot_adds()[0]["add"]
    table.compact(spark, ("k",))
    with pytest.raises(ConcurrentModification):
        t2.commit([{"dv": target, "positions": [3]}], op="delete_dv")
    # recompute against the NEW snapshot succeeds (the recovery path)
    t2.delete_keys(spark, "k", [3], ("k",))
    assert table.read(spark).count() == 997


def test_partition_delete_bounded_with_unattributed_file(spark, tmp_path):
    """ADVICE r10 #1 + #5: an INT-partitioned table plus an
    unattributed append spanning both partitions. (a) read() unions the
    injected-literal group with the native-typed group — the ptype cast
    must make both sides int; (b) a partition-scoped delete_where whose
    range covers the unattributed file deletes ONLY that partition's
    rows from it."""
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("int").alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    t = TxLogTable.create_partitioned(
        spark, str(tmp_path / "pt_int"), df, "p", "k", n_files=2, stats_cols=("k",)
    )
    assert all(a["ptype"] == {"p": "int"} for a in t.snapshot_adds())
    extra = spark.range(1000, 1010).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("int").alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    t.append(spark, extra, ("k",))
    got = t.read(spark)
    assert dict(got.dtypes)["p"] == "int"  # not string: ptype cast applied
    assert got.count() == 110
    # read_where with a NATIVE int partition value prunes + filters right
    dfw, c = t.read_where(spark, "k", 1000, 2000, partition={"p": 1})
    assert sorted(r["k"] for r in dfw.collect()) == [1001, 1003, 1005, 1007, 1009]
    # partition-scoped delete over the unattributed rows: p=1 survives
    t.delete_where(spark, "k", 1000, 1009, ("k",), partition={"p": 0})
    rest = t.read(spark).filter(F.col("k") >= 1000).collect()
    assert sorted(r["k"] for r in rest) == [1001, 1003, 1005, 1007, 1009]
    assert all(r["p"] == 1 for r in rest)
    assert t.read(spark).count() == 105  # the attributed base untouched


def test_occ_commit_safe_across_processes():
    """Scaled-down pin of tools/occ_stress.py (round 11): 3 spawn
    worker PROCESSES x 6 commits against one table — the link+unlink
    version-slot claim is a kernel guarantee, so it must hold without
    any shared interpreter state. Zero lost updates, contiguous
    single-writer log. The 200/400-commit runs live in SCALE.md."""
    import multiprocessing as mp
    import sys
    import tempfile

    sys.path.insert(0, "/root/repo/tools")
    from occ_stress import append_worker

    from benchmark_spark.sources.txlog import TxLogTable

    ctx = mp.get_context("spawn")
    with tempfile.TemporaryDirectory() as d:
        with ctx.Pool(3) as pool:
            pool.map(append_worker, [(d, w, 6) for w in range(3)])
        t = TxLogTable(d)
        assert t.versions() == list(range(18))
        adds = {a["add"] for a in t.snapshot_adds()}
        assert adds == {f"w{w:02d}-{j:04d}.parquet" for w in range(3) for j in range(6)}


def test_clone_is_zero_copy_and_independent(spark, tmp_path):
    """Three clone contracts (round 11): (1) zero-copy — the clone dir
    holds NO parquet before divergence, yet reads byte-identically to
    the source; (2) log independence — a clone append never changes
    the source's live set and vice versa; (3) vacuum safety — the
    clone's vacuum sweeps only its OWN directory, so the source's
    files survive even when the clone drops them from its live set."""
    import os

    from benchmark_spark.sources.txlog import TxLogTable

    df = spark.range(100).selectExpr("id AS o_orderkey")
    src = TxLogTable.create(
        spark, str(tmp_path / "src"), df, "o_orderkey", 4, ("o_orderkey",)
    )
    clone = src.clone_to(str(tmp_path / "clone"))
    assert not [f for f in os.listdir(clone.path) if f.endswith(".parquet")]
    assert sorted(r["o_orderkey"] for r in clone.read(spark).collect()) == list(
        range(100)
    )
    # divergence: clone-only append
    clone.append(
        spark, spark.range(100, 110).selectExpr("id AS o_orderkey"), ("o_orderkey",)
    )
    assert src.read(spark).count() == 100  # source untouched
    assert clone.read(spark).count() == 110
    # source-side append stays invisible to the clone
    src.append(
        spark, spark.range(200, 205).selectExpr("id AS o_orderkey"), ("o_orderkey",)
    )
    assert clone.read(spark).count() == 110
    # vacuum on the clone (even with zero retention/grace) must not
    # unlink the source files its log references
    clone.compact(spark, ("o_orderkey",))  # clone now owns its own files
    removed = clone.vacuum(retain_versions=0, grace_secs=0)
    assert all(os.path.dirname(os.path.join(clone.path, r)) != src.path for r in removed)
    assert src.read(spark).count() == 105  # source fully intact


def test_clone_refuses_deletion_vector_sources(spark, tmp_path):
    """DV actions reference file names the clone would have to
    rewrite; clone_to must refuse rather than silently mis-resolve."""
    import pytest as _pytest

    from benchmark_spark.sources.txlog import TxLogTable

    df = spark.range(50).selectExpr("id AS o_orderkey")
    src = TxLogTable.create(
        spark, str(tmp_path / "dvsrc"), df, "o_orderkey", 2, ("o_orderkey",)
    )
    adds = src.snapshot_adds()
    src.commit([{"dv": adds[0]["add"], "positions": [1, 2]}], op="dv")
    with _pytest.raises(ValueError, match="deletion-vector"):
        src.clone_to(str(tmp_path / "dvclone"))


# --- column mapping (round 13, VERDICT r12 #5) ------------------------------


@pytest.fixture()
def mapped_table(spark, tmp_path):
    """3-column table with logical->physical mapping, through the full
    rename/drop/append scenario: v0 create, v1 rename v->val, v2 drop
    w, v3 post-drop append."""
    from benchmark_spark.sources.txlog import (
        mapped_fields, mapped_schema_meta, to_physical,
    )

    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 7).alias("w"),
    )
    physical = {"k": "c0", "v": "c1", "w": "c2"}
    f0 = mapped_fields(df, physical)
    path = str(tmp_path / "cm")
    os.makedirs(path)
    t = TxLogTable(path)
    t.commit(
        t._write_files(spark, [to_physical(df, f0)], ("c0",)),
        op="create",
        extra={"metaData": mapped_schema_meta(t, f0)},
    )
    f1 = [dict(c, name="val") if c["name"] == "v" else c for c in f0]
    t.commit([], op="rename-column", extra={"metaData": mapped_schema_meta(t, f1)})
    f2 = [c for c in f1 if c["name"] != "w"]
    t.commit([], op="drop-column", extra={"metaData": mapped_schema_meta(t, f2)})
    post = spark.range(500, 600).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    t.commit(
        t._write_files(spark, [to_physical(post, f2)], ("c0",)),
        op="append",
        extra={"metaData": mapped_schema_meta(t, f2)},
    )
    return t


def test_colmap_rename_and_drop_are_metadata_only(mapped_table):
    """Rename/drop commits carry ZERO add/remove actions and move no
    data: the physical file set (names, sizes, mtimes) is identical
    before and after both commits."""
    c1 = mapped_table._read_commit(1)
    c2 = mapped_table._read_commit(2)
    assert c1["op"] == "rename-column" and c1["actions"] == []
    assert c2["op"] == "drop-column" and c2["actions"] == []
    assert mapped_table.snapshot_files(0) == mapped_table.snapshot_files(2)


def test_colmap_physical_names_stable_in_footers(mapped_table):
    """Every data file's parquet footer carries ONLY physical names —
    before and after the rename — so no rename ever rewrites a file."""
    import pyarrow.parquet as pq

    for f in mapped_table.snapshot_files(0):
        names = set(pq.ParquetFile(f).schema_arrow.names)
        assert names == {"c0", "c1", "c2"}
    post_files = set(mapped_table.snapshot_files(3)) - set(
        mapped_table.snapshot_files(2)
    )
    for f in post_files:
        names = set(pq.ParquetFile(f).schema_arrow.names)
        assert names == {"c0", "c1"}  # post-drop segment lacks c2


def test_colmap_time_travel_returns_old_names(spark, mapped_table):
    from benchmark_spark.sources.txlog import read_with_mapping

    v0 = read_with_mapping(spark, mapped_table, version=0)
    assert v0.columns == ["k", "v", "w"]  # pre-rename, pre-drop
    v1 = read_with_mapping(spark, mapped_table, version=1)
    assert v1.columns == ["k", "val", "w"]  # renamed, not yet dropped
    assert v1.filter(F.col("val") != 2 * F.col("k")).count() == 0


def test_colmap_old_files_read_correctly_after_rename(spark, mapped_table):
    """The final mapped read serves old (pre-rename, 3-physical-col)
    and new (post-drop, 2-physical-col) segments under ONE logical
    schema, values intact and the dropped column invisible."""
    from benchmark_spark.sources.txlog import read_with_mapping

    cur = read_with_mapping(spark, mapped_table)
    assert cur.columns == ["k", "val"]
    assert cur.count() == 600
    assert cur.filter(F.col("val") != 2 * F.col("k")).count() == 0


def test_colmap_physical_id_high_water_mark(mapped_table):
    """ADVICE r13: metaData tracks the max physical-name id ever
    assigned (Delta's column-mapping maxColumnId analog), and the mark
    survives the drop — the current schema's ids alone would forget
    that c2 was ever used."""
    from benchmark_spark.sources.txlog import txlog_physical_max_id

    assert txlog_physical_max_id(mapped_table) == 2
    # the drop (v2) did not lower the mark even though c2 left the schema
    assert txlog_physical_max_id(mapped_table, version=2) == 2


def test_colmap_reusing_dropped_physical_name_is_rejected(mapped_table):
    """Adding a new logical column under a previously-assigned physical
    name must fail AT COMMIT TIME: mergeSchema unions files by physical
    name, so a reused c2 would silently resurrect the dropped column's
    bytes from pre-drop files (ADVICE r13)."""
    from benchmark_spark.sources.txlog import (
        mapped_schema_meta, txlog_schema_at,
    )

    cur = txlog_schema_at(mapped_table)
    with pytest.raises(ValueError, match="reuses an already-assigned"):
        mapped_schema_meta(
            mapped_table,
            cur + [{"name": "region", "physical": "c2", "type": "bigint"}],
        )
    # a FRESH id is accepted and advances the mark
    meta = mapped_schema_meta(
        mapped_table,
        cur + [{"name": "region", "physical": "c3", "type": "bigint"}],
    )
    assert meta["physicalMaxId"] == 3


def test_colmap_duplicate_and_retyped_physical_names_rejected(mapped_table):
    """Code-review round 14: two fields mapping one physical name, or a
    live physical name changing type, are schema corruption accepted
    nowhere — both would make mergeSchema serve one column's bytes
    under another contract."""
    from benchmark_spark.sources.txlog import (
        mapped_schema_meta, txlog_schema_at,
    )

    cur = txlog_schema_at(mapped_table)
    dup = cur + [{"name": "region", "physical": cur[0]["physical"],
                  "type": cur[0]["type"]}]
    with pytest.raises(ValueError, match="mapped by two fields"):
        mapped_schema_meta(mapped_table, dup)
    retyped = [dict(c, type="double") if c is cur[0] else c for c in cur]
    with pytest.raises(ValueError, match="changes type"):
        mapped_schema_meta(mapped_table, retyped)


def test_colmap_guard_covers_legacy_logs_without_recorded_mark(spark, tmp_path):
    """Code-review round 14: a mapped table whose history predates the
    recorded physicalMaxId (raw metaData commits) must still refuse to
    reuse a dropped physical name — the mark is re-derived from every
    historical schema's physical ids."""
    from benchmark_spark.sources.txlog import (
        mapped_fields, mapped_schema_meta, to_physical,
        txlog_physical_max_id,
    )

    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    f0 = mapped_fields(df, {"k": "c0", "v": "c1"})
    path = str(tmp_path / "legacy")
    os.makedirs(path)
    t = TxLogTable(path)
    # legacy-style commits: schema recorded WITHOUT the high-water mark
    t.commit(
        t._write_files(spark, [to_physical(df, f0)], ("c0",)),
        op="create",
        extra={"metaData": {"schema": f0}},
    )
    f1 = [c for c in f0 if c["name"] != "v"]  # drop v (frees c1 — or not)
    t.commit([], op="drop-column", extra={"metaData": {"schema": f1}})
    assert txlog_physical_max_id(t) == 1  # re-derived from history
    with pytest.raises(ValueError, match="reuses an already-assigned"):
        mapped_schema_meta(
            t, f1 + [{"name": "w", "physical": "c1", "type": "bigint"}]
        )
