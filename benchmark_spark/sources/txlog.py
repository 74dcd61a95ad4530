"""A minimal transaction-log table format (Delta-lite), for real.

Round 7's verdict ranked "open table format" the top ask a production
user would hit: MERGE/SCD2/compaction were semantically proven but
hand-rolled per query over bare parquet, with no commit protocol, no
snapshot isolation, and no time travel. This module implements the
core of the public log-structured table design (Delta Lake paper /
Iceberg spec, both public):

* **Commit log**: ``<table>/_txlog/{version:08d}.json`` — one JSON
  document per commit holding ``add`` / ``remove`` file actions, the
  operation name, and per-file column stats (min/max/rows) read from
  the REAL parquet footers via pyarrow at write time.
* **Atomic commits**: a commit is staged to a temp file and
  ``os.rename``-ed to its version path. Rename is atomic on POSIX, so
  readers never observe a partial commit; a version file that already
  exists means another writer won — the committer re-reads the log
  and retries at the next version (optimistic concurrency, bounded
  retries). tests/test_txlog.py exercises a planted conflict.
* **Snapshot isolation / time travel**: a reader resolves the live
  file set by replaying the log up to a version (latest by default)
  and reads exactly those parquet files — concurrent commits cannot
  change a snapshot already resolved, and any historical version
  remains readable until vacuumed.
* **Stats-based file pruning**: ``delete_where`` / ``merge`` consult
  the footer min/max recorded in each add action and REWRITE ONLY the
  files whose range overlaps the predicate — the copy-on-write
  behavior that makes targeted mutation affordable at 100 TB
  (q_txlog_prune_stats emits the files_total/files_rewritten counts
  as hash-checked DATA).
* **Compaction**: replace many small files with few, as one commit —
  readers see either the old layout or the new, never a mix.

Scale posture: the log holds file-level metadata only (O(files), not
O(rows)); data moves through ordinary distributed parquet writes.
Table CREATE uses the production write path (round 9, VERDICT r8 #4):
one distributed partitionBy job over a computed range-bucket column —
one scan + one shuffle for the whole layout — with per-file boundaries
READ BACK from the parquet footers it produced (the pruning logic
consumes footer stats, never assumed layout). Single-slice commits
(delete survivors, merge outputs, stream batches) still stage via the
one-file writer. Vacuum physically deletes unreferenced data files
behind an age-based grace window (Delta-VACUUM style, ADVICE r8) so a
concurrent in-flight writer's staged files survive; multi-table
transactions are intentionally out of scope.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchmark_spark.catalog import load_table
from benchmark_spark.operators.aggregates import dsum, dsum_sql
from benchmark_spark.registry import register

LOG_DIR = "_txlog"


class CommitConflict(RuntimeError):
    """Another writer committed this version (after bounded retries)."""


class ConcurrentModification(RuntimeError):
    """The commit's remove set references a file that is no longer
    live: another writer rewrote or deleted it after this writer
    resolved its snapshot. Retrying blindly would LOSE that writer's
    update (the classic lost-update anomaly), so the operation must be
    recomputed against the current snapshot instead."""


def _file_stats(path: str, stats_cols: tuple[str, ...]) -> dict:
    """Read per-column min/max/rows from the REAL parquet footer."""
    md = pq.ParquetFile(path).metadata
    stats: dict[str, dict] = {}
    schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
    for col in stats_cols:
        idx = schema_names.index(col)
        lo = hi = None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx).statistics
            if s is None or not s.has_min_max:
                lo = hi = None
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            stats[col] = {"min": lo, "max": hi}
    return {"rows": md.num_rows, "cols": stats}


class TxLogTable:
    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, LOG_DIR)

    # ----- log plumbing ----------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.endswith(".checkpoint.json")
        )

    def checkpoints(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".checkpoint.json")
        )

    def _read_commit(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, f"{version:08d}.json")) as f:
            return json.load(f)

    def commit(
        self, actions: list[dict], op: str, retries: int = 5, extra: dict | None = None
    ) -> int:
        """Atomically publish one commit; optimistic-concurrency retry.

        The staged temp file is fully written and fsynced before the
        rename, and os.rename onto the version path is atomic, so a
        reader either sees the whole commit or none of it. A losing
        racer (version file appeared between choosing the version and
        renaming) re-reads the log and retries at the next version.
        """
        os.makedirs(self.log_dir, exist_ok=True)
        removes = [a["remove"] for a in actions if "remove" in a]
        # a DV commit mutates its target file's live row set, so it
        # conflicts with a concurrent rewrite exactly like a remove
        removes += [a["dv"] for a in actions if "dv" in a]
        for _ in range(retries):
            version = (self.versions() or [-1])[-1] + 1
            if removes:
                # Semantic conflict detection (the Delta/Iceberg OCC
                # core): every file this commit removes must still be
                # live at the current head. A miss means a concurrent
                # writer already rewrote/deleted it — committing anyway
                # would silently drop that writer's replacement rows
                # (lost update), and retrying at the next version would
                # commit the SAME stale actions; the caller must
                # recompute against the new snapshot.
                live = {a["add"] for a in self.snapshot_adds(version - 1)}
                gone = [r for r in removes if r not in live]
                if gone:
                    raise ConcurrentModification(
                        f"remove set references files not live at v{version - 1}: {gone}"
                    )
            target = os.path.join(self.log_dir, f"{version:08d}.json")
            tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
            doc = {"version": version, "op": op, "actions": actions, **(extra or {})}
            with open(tmp, "w") as f:
                json.dump(doc, f)
                f.flush()
                os.fsync(f.fileno())
            if os.path.exists(target):  # lost the race before renaming
                os.unlink(tmp)
                continue
            try:
                # os.rename does not clobber-check atomically on POSIX
                # (it replaces); use link+unlink which FAILS if target
                # exists — the true atomic claim of a version slot.
                os.link(tmp, target)
                os.unlink(tmp)
                return version
            except FileExistsError:
                os.unlink(tmp)
                continue
        raise CommitConflict(f"could not claim a version after {retries} attempts")

    def snapshot_files(self, version: int | None = None) -> list[str]:
        """Live data-file paths at `version` (latest by default)."""
        return [os.path.join(self.path, a["add"]) for a in self.snapshot_adds(version)]

    def snapshot_adds(self, version: int | None = None) -> list[dict]:
        """Live add-actions (with their footer stats) at a version.

        Replay starts from the newest checkpoint at-or-before the
        requested version (Delta-style log checkpointing): resolution
        cost is O(commits since checkpoint), not O(all commits) — at
        streaming-ingest commit rates the raw log grows unboundedly
        and a full replay per read would dominate planning time."""
        live: dict[str, dict] = {}
        start = 0
        usable = [c for c in self.checkpoints() if version is None or c <= version]
        if usable:
            cp = usable[-1]
            with open(os.path.join(self.log_dir, f"{cp:08d}.checkpoint.json")) as f:
                live = {a["add"]: a for a in json.load(f)["adds"]}
            start = cp + 1
        for v in self.versions():
            if v < start:
                continue
            if version is not None and v > version:
                break
            for a in self._read_commit(v)["actions"]:
                if "add" in a:
                    live[a["add"]] = a  # a re-add resets any prior DV
                elif "remove" in a:
                    live.pop(a["remove"], None)
                elif "dv" in a:
                    # deletion vector (merge-on-read point delete): the
                    # file stays live; its row-position delete set grows
                    # cumulatively. Stored on a COPY of the add dict so
                    # earlier snapshots' resolved adds are not mutated.
                    prev = live[a["dv"]]
                    live[a["dv"]] = {
                        **prev,
                        "dv": sorted(set(prev.get("dv", ())) | set(a["positions"])),
                    }
        return list(live.values())

    def checkpoint(self) -> int:
        """Write a checkpoint of the CURRENT live add-set next to the
        log (atomic rename; readers that don't see it yet just replay
        more commits — checkpoints are an optimization, never a
        correctness dependency). Returns the checkpointed version."""
        v = (self.versions() or [-1])[-1]
        if v < 0:
            raise ValueError("cannot checkpoint an empty log")
        doc = {"version": v, "adds": self.snapshot_adds(version=v)}
        tmp = os.path.join(self.log_dir, f".tmp-cp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.log_dir, f"{v:08d}.checkpoint.json"))
        return v

    def vacuum(self, retain_versions: int = 0, grace_secs: float = 3600.0) -> list[str]:
        """Physically delete data files no snapshot >= (latest -
        retain_versions) references. Time travel OLDER than the
        retention horizon stops working — that is vacuum's contract
        (the reason it is separate from delete/compact, which only
        edit the log).

        ``grace_secs`` is the Delta-VACUUM-style retention guard
        (ADVICE r8): data files land under their final part-*.parquet
        names BEFORE their owning commit, so a vacuum racing an
        in-flight write would otherwise delete the uncommitted files
        and the subsequent commit would reference missing data. Files
        younger than the grace window are never deleted; pass 0 only
        under known single-writer exclusivity (the fixture queries)."""
        import time as _time

        vs = self.versions()
        horizon = vs[-1] - retain_versions
        keep: set[str] = set()
        for v in vs:
            if v >= horizon:
                keep.update(a["add"] for a in self.snapshot_adds(version=v))
        removed = []
        now = _time.time()
        for f in os.listdir(self.path):
            p = os.path.join(self.path, f)
            if f.startswith(".stage-"):
                # a writer that crashed between the stage write and its
                # cleanup leaks the whole stage dir (ADVICE r9); sweep
                # aged stages behind the same grace window
                try:
                    if grace_secs > 0 and now - os.path.getmtime(p) < grace_secs:
                        continue
                except OSError:
                    continue
                # swept silently: the return value is the DATA-file
                # ledger (q_txlog_vacuum hash-checks its length)
                shutil.rmtree(p, ignore_errors=True)
                continue
            if not f.endswith(".parquet") or f in keep:
                continue
            try:
                if grace_secs > 0 and now - os.path.getmtime(p) < grace_secs:
                    continue  # possibly an in-flight writer's staged file
            except OSError:
                continue  # already gone (concurrent vacuum)
            os.unlink(p)
            removed.append(f)
        return removed

    def history(self) -> list[dict]:
        return [self._read_commit(v) for v in self.versions()]

    # ----- data writes -----------------------------------------------------

    def _write_files(
        self, spark: SparkSession, slices: list[DataFrame], stats_cols: tuple[str, ...]
    ) -> list[dict]:
        """Write each slice as one data file; return its add action with
        REAL footer stats. (Driver-loop per slice: deterministic file
        boundaries for the oracle; see module docstring for the
        single-write production shape.)"""
        actions = []
        for df in slices:
            tmp = os.path.join(self.path, f".stage-{uuid.uuid4().hex}")
            try:
                df.coalesce(1).write.mode("overwrite").parquet(tmp)
                part = next(
                    f
                    for f in os.listdir(tmp)
                    if f.endswith(".parquet") and not f.startswith(".")
                )
                name = f"part-{uuid.uuid4().hex}.parquet"
                os.replace(os.path.join(tmp, part), os.path.join(self.path, name))
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            st = _file_stats(os.path.join(self.path, name), stats_cols)
            if st["rows"] == 0:
                os.unlink(os.path.join(self.path, name))
                continue
            actions.append({"add": name, **st})
        return actions

    def _write_files_ranged(
        self,
        spark: SparkSession,
        df: DataFrame,
        split_col: str,
        lo: int,
        width: int,
        stats_cols: tuple[str, ...],
    ) -> list[dict]:
        """Production write path (VERDICT r8 #4): ONE distributed write
        replaces the driver-side loop of coalesce(1) slice jobs.

        The range bucket is computed as a column ((split_col - lo) div
        width — the same deterministic equal-width arithmetic the oracle
        replays), the frame is repartitioned ON that column (hash — each
        bucket lands wholly in one task; two buckets sharing a task is
        fine because partitionBy still splits them into separate files),
        and written once with partitionBy. Per-file boundaries are then
        READ BACK from the parquet footers the write produced — the
        pruning logic consumes footer stats, never assumed layout. One
        scan + one shuffle instead of n_files scans."""
        stage = os.path.join(self.path, f".stage-{uuid.uuid4().hex}")
        # integer floor division end-to-end (ADVICE r9): the oracle
        # replays (col - lo) DIV width on integers; routing through
        # double division + cast-truncate was value-equal at these
        # magnitudes but a needless float dependency
        bucket = F.expr(
            f"(CAST(`{split_col}` AS BIGINT) - {int(lo)}L) DIV {int(width)}L"
        )
        try:
            (
                df.withColumn("_bucket", bucket)
                .repartition(F.col("_bucket"))
                .write.partitionBy("_bucket")
                .mode("overwrite")
                .parquet(stage)
            )
            actions = []
            for d in sorted(os.listdir(stage)):
                if not d.startswith("_bucket="):
                    continue
                for part in sorted(os.listdir(os.path.join(stage, d))):
                    if not part.endswith(".parquet") or part.startswith("."):
                        continue
                    name = f"part-{uuid.uuid4().hex}.parquet"
                    os.replace(os.path.join(stage, d, part), os.path.join(self.path, name))
                    st = _file_stats(os.path.join(self.path, name), stats_cols)
                    if st["rows"] == 0:
                        os.unlink(os.path.join(self.path, name))
                        continue
                    actions.append({"add": name, **st})
        finally:
            # a crash between write and cleanup must not leak staged
            # data forever (ADVICE r9); vacuum also sweeps aged stages
            shutil.rmtree(stage, ignore_errors=True)
        return actions

    # ----- table operations -------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        df: DataFrame,
        split_col: str,
        n_files: int,
        stats_cols: tuple[str, ...],
    ) -> "TxLogTable":
        """Create a table from df, split into n_files equal-width range
        slices of split_col (bounds from one bounded driver-side agg),
        written as ONE distributed partitionBy job (_write_files_ranged)
        rather than a per-slice driver loop."""
        t = TxLogTable(path)
        os.makedirs(path, exist_ok=True)
        lo, hi = df.agg(F.min(split_col), F.max(split_col)).first()
        width = max(1, (int(hi) - int(lo) + n_files) // n_files)
        t.commit(
            t._write_files_ranged(spark, df, split_col, int(lo), width, stats_cols),
            op="create",
        )
        return t

    @staticmethod
    def create_partitioned(
        spark: SparkSession,
        path: str,
        df: DataFrame,
        part_col: str,
        split_col: str,
        n_files: int,
        stats_cols: tuple[str, ...],
    ) -> "TxLogTable":
        """Create a PARTITIONED table (VERDICT r9 #9): one distributed
        partitionBy(part_col, bucket) write; each add action records
        its partition value alongside the footer stats, so reads can
        prune partition-first (exact, O(1) per file) and THEN by the
        range zone map — the two bounds compose multiplicatively, like
        Delta partition columns over per-file stats. The bucket width
        derives from the GLOBAL split_col range (same arithmetic as
        create), so the oracle can replay which (partition, bucket)
        files exist. Partition values are logged as strings (Hive dir
        layout) TOGETHER with the column's data type (`ptype` — ADVICE
        r10 #5), so read-time re-injection casts back to the native
        type and unions cleanly with unattributed appends that carry
        the column natively; the column is NOT stored in the data
        files."""
        t = TxLogTable(path)
        os.makedirs(path, exist_ok=True)
        ptype = df.schema[part_col].dataType.simpleString()
        lo, hi = df.agg(F.min(split_col), F.max(split_col)).first()
        width = max(1, (int(hi) - int(lo) + n_files) // n_files)
        stage = os.path.join(path, f".stage-{uuid.uuid4().hex}")
        bucket = F.expr(
            f"(CAST(`{split_col}` AS BIGINT) - {int(lo)}L) DIV {int(width)}L"
        )
        actions = []
        try:
            (
                df.withColumn("_bucket", bucket)
                .repartition(F.col(part_col), F.col("_bucket"))
                .write.partitionBy(part_col, "_bucket")
                .mode("overwrite")
                .parquet(stage)
            )
            for pdir in sorted(os.listdir(stage)):
                if not pdir.startswith(f"{part_col}="):
                    continue
                pval = pdir.split("=", 1)[1]
                for bdir in sorted(os.listdir(os.path.join(stage, pdir))):
                    if not bdir.startswith("_bucket="):
                        continue
                    for part in sorted(os.listdir(os.path.join(stage, pdir, bdir))):
                        if not part.endswith(".parquet") or part.startswith("."):
                            continue
                        name = f"part-{uuid.uuid4().hex}.parquet"
                        os.replace(
                            os.path.join(stage, pdir, bdir, part),
                            os.path.join(path, name),
                        )
                        st = _file_stats(os.path.join(path, name), stats_cols)
                        if st["rows"] == 0:
                            os.unlink(os.path.join(path, name))
                            continue
                        actions.append(
                            {
                                "add": name,
                                **st,
                                "partition": {part_col: pval},
                                "ptype": {part_col: ptype},
                            }
                        )
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        t.commit(actions, op="create")
        return t

    @staticmethod
    def _partition_match(a: dict, partition: dict | None) -> bool:
        """Can this file contain rows of `partition`? Files WITHOUT
        partition metadata (e.g. appended or merged in unattributed)
        must answer YES — they can contain anything, so a partition
        filter keeps them and relies on the row-level filter for
        exactness (read_where applies it)."""
        if not partition:
            return True
        have = a.get("partition")
        if have is None:
            return True  # unattributed: conservatively in every partition
        return all(have.get(k) == str(v) for k, v in partition.items())

    def _partition_pred(self, partition: dict, version: int | None = None):
        """Row-level predicate `partition-columns == partition-values`
        with each literal cast to the column's LOGGED data type (ADVICE
        r10 #5: an unattributed file carries the column natively, so
        'F' == F string-compares are wrong for non-string columns).
        The type is looked up across the WHOLE snapshot (the touched
        file itself may be the unattributed one, which records no
        ptype); falls back to string when nothing recorded one."""
        ptypes: dict = {}
        for a in self.snapshot_adds(version):
            ptypes.update(a.get("ptype") or {})
        pred = F.lit(True)
        for k, v in partition.items():
            pred = pred & (F.col(k) == F.lit(str(v)).cast(ptypes.get(k, "string")))
        return pred

    def _read_adds(self, spark: SparkSession, adds: list[dict]) -> DataFrame:
        """Materialize the LIVE rows of a set of add actions.

        Partition handling (Delta/Hive-style): a partitioned file does
        NOT store its partition column — the value lives in the add
        action and is re-injected as a literal per partition group.
        The literal is CAST to the column's logged data type (`ptype`
        in the add action, recorded by create_partitioned — ADVICE
        r10 #5): Hive dir names stringify the value, but an
        unattributed append carries the column with its native type,
        and unionByName across the two groups must agree on one type.
        Deletion vectors: files with one are read with parquet row
        positions (_metadata.row_index) and the deleted (file,
        position) pairs anti-joined away — merge-on-read, broadcast
        because a DV is small by the format's contract (a large delete
        takes the copy-on-write path instead)."""
        groups: dict[tuple, list[dict]] = {}
        for a in adds:
            key = tuple(sorted((a.get("partition") or {}).items()))
            groups.setdefault(key, []).append(a)
        parts = []
        for pitems in sorted(groups):
            df = self._read_group(spark, groups[pitems])
            ptypes = next(
                (a["ptype"] for a in groups[pitems] if a.get("ptype")), {}
            )
            for c, v in pitems:
                df = df.withColumn(c, F.lit(v).cast(ptypes.get(c, "string")))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _read_group(self, spark: SparkSession, adds: list[dict]) -> DataFrame:
        plain = [a for a in adds if not a.get("dv")]
        dvd = [a for a in adds if a.get("dv")]
        parts = []
        if plain:
            parts.append(
                spark.read.parquet(*[os.path.join(self.path, a["add"]) for a in plain])
            )
        if dvd:
            deleted = spark.createDataFrame(
                [(a["add"], int(p)) for a in dvd for p in a["dv"]],
                "_dv_file string, _dv_pos long",
            )
            with_pos = (
                spark.read.parquet(*[os.path.join(self.path, a["add"]) for a in dvd])
                .withColumn("_dv_file", F.col("_metadata.file_name"))
                .withColumn("_dv_pos", F.col("_metadata.row_index"))
            )
            parts.append(
                with_pos.join(
                    F.broadcast(deleted), ["_dv_file", "_dv_pos"], "left_anti"
                ).drop("_dv_file", "_dv_pos")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def clone_to(self, dest: str, version: int | None = None) -> "TxLogTable":
        """SHALLOW (zero-copy) clone — the Delta CLONE shape: ONE commit
        in a fresh log whose add actions reference the SOURCE's live
        data files by absolute path (footer stats carried over), so the
        clone costs O(live files) of metadata and zero data bytes. The
        logs are independent afterwards: appends/deletes/compaction on
        either side never touch the other (divergent files land in each
        table's own directory; the source's files are only ever REMOVED
        from the clone's live set, never unlinked by the clone's vacuum
        — pinned in tests/test_txlog.py). Clones resolve the live set
        AFTER copy-on-write deletes; a source using deletion vectors
        would need its dv references rewritten too (not supported —
        raises)."""
        adds = self.snapshot_adds(version)
        if any("dv" in a for a in adds):
            raise ValueError("clone_to does not support deletion-vector sources")
        c = TxLogTable(dest)
        os.makedirs(dest, exist_ok=True)
        c.commit(
            [dict(a, add=os.path.join(self.path, a["add"])) for a in adds],
            op="clone",
            extra={"source": self.path, "source_version": version},
        )
        return c

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        adds = self.snapshot_adds(version)
        if not adds:
            raise ValueError(f"empty table snapshot at version {version}")
        return self._read_adds(spark, adds)

    def append(
        self, spark: SparkSession, df: DataFrame, stats_cols: tuple[str, ...]
    ) -> int:
        return self.commit(self._write_files(spark, [df], stats_cols), op="append")

    def read_where(
        self,
        spark: SparkSession,
        col: str,
        lo,
        hi,
        version: int | None = None,
        partition: dict | None = None,
    ) -> tuple[DataFrame, dict]:
        """Data-skipping read: open ONLY the files whose footer min/max
        overlap [lo, hi] (then apply the row filter for exactness) —
        the log doubles as a file-level zone map, so a selective
        predicate touches O(overlapping files) instead of O(table),
        before parquet row-group pruning even starts. With `partition`,
        files are pruned partition-FIRST (exact dictionary match on
        the logged partition values — VERDICT r9 #9), then the range
        zone map applies to the survivors; the two bounds compose.
        Returns the DataFrame plus skip counters."""
        touched, kept = self.prune(col, lo, hi, version, partition=partition)
        counters = {"files_total": len(touched) + len(kept), "files_scanned": len(touched)}
        if partition is not None:
            adds = self.snapshot_adds(version)
            counters["files_total"] = len(adds)
            counters["files_in_partition"] = sum(
                1 for a in adds if self._partition_match(a, partition)
            )
        if not touched:
            # fully-pruned range: an EMPTY frame, but with the schema
            # derived exactly as read() derives it (ADVICE r9 — one
            # arbitrary footer can predate schema evolution, and an
            # empty snapshot must raise the same clear ValueError as
            # read(), not IndexError). Schema resolution is lazy
            # driver-side footer work; the RETURNED plan carries no
            # file list (VERDICT r8 audit).
            empty = spark.createDataFrame([], self.read(spark, version).schema)
            return empty, counters
        df = self._read_adds(spark, touched).filter((F.col(col) >= lo) & (F.col(col) <= hi))
        if partition:
            # row-level partition filter: exactness for unattributed
            # files (attributed groups inject the literal, so for them
            # this predicate is constant-folded true by Catalyst);
            # literals are cast to the logged partition type
            df = df.filter(self._partition_pred(partition, version))
        return df, counters

    def prune(
        self,
        col: str,
        lo,
        hi,
        version: int | None = None,
        partition: dict | None = None,
    ) -> tuple[list[dict], list[dict]]:
        """Split live files into (overlapping, disjoint) against
        [lo, hi] using the footer stats recorded in the log; with
        `partition`, files outside the partition are disjoint by
        definition (checked FIRST — no stats needed)."""
        touched, kept = [], []
        for a in self.snapshot_adds(version):
            if not self._partition_match(a, partition):
                kept.append(a)
                continue
            s = a["cols"].get(col)
            if s is None or (s["min"] <= hi and s["max"] >= lo):
                touched.append(a)
            else:
                kept.append(a)
        return touched, kept

    def delete_where(
        self,
        spark: SparkSession,
        col: str,
        lo,
        hi,
        stats_cols: tuple[str, ...],
        partition: dict | None = None,
    ) -> dict:
        """Copy-on-write ranged delete: rewrite ONLY footer-overlapping
        files, one commit. With `partition`, the partition filter
        prunes FIRST (and bounds the delete to that partition); the
        rewritten survivors keep their partition attribution. Returns
        pruning counters (hash-checked as data by
        q_txlog_prune_stats)."""
        touched, kept = self.prune(col, lo, hi, partition=partition)
        actions: list[dict] = []
        if touched:
            # rewrite per partition group so survivors KEEP their
            # partition attribution (the column lives in the log, not
            # the data file — injected at read, dropped before write)
            groups: dict[tuple, list[dict]] = {}
            for a in touched:
                key = tuple(sorted((a.get("partition") or {}).items()))
                groups.setdefault(key, []).append(a)
            for pitems in sorted(groups):
                survivors = self._read_adds(spark, groups[pitems])
                in_range = (F.col(col) >= lo) & (F.col(col) <= hi)
                if partition and not pitems:
                    # ADVICE r10 #1: an UNATTRIBUTED file can hold rows
                    # of every partition, so a partition-scoped delete
                    # must be bounded row-level — delete only rows that
                    # are BOTH in range AND in the target partition,
                    # not every in-range row the file happens to hold.
                    survivors = survivors.filter(
                        ~(in_range & self._partition_pred(partition))
                    )
                else:
                    survivors = survivors.filter(~in_range)
                if pitems:
                    survivors = survivors.drop(*[k for k, _v in pitems])
                writes = self._write_files(spark, [survivors], stats_cols)
                if pitems:
                    writes = [{**w, "partition": dict(pitems)} for w in writes]
                actions += writes
            actions += [{"remove": a["add"]} for a in touched]
            self.commit(actions, op="delete")
        return {
            "files_total": len(touched) + len(kept),
            "files_rewritten": len(touched),
        }

    def delete_keys(
        self, spark: SparkSession, col: str, keys: list, stats_cols: tuple[str, ...]
    ) -> dict:
        """Merge-on-read POINT delete (deletion vectors, VERDICT r9
        #2): instead of rewriting every file that contains a matching
        row (copy-on-write — O(touched file bytes) for a handful of
        rows), record each file's deleted ROW POSITIONS as a `dv`
        action. files_rewritten is 0 by construction; readers
        anti-merge the positions (O(dv) extra work), and compaction
        folds the vectors back into plain files. The classic
        read/write amplification trade, chosen per-operation exactly
        as in Delta/Iceberg v2.

        `stats_cols` is unused (no files are written) but kept for
        signature symmetry with delete_where — the copy-on-write twin."""
        if not keys:
            return {"files_total": len(self.snapshot_adds()), "files_rewritten": 0,
                    "dv_files": 0}
        touched, kept = self.prune(col, min(keys), max(keys))
        actions: list[dict] = []
        if touched:
            df = (
                spark.read.parquet(*[os.path.join(self.path, a["add"]) for a in touched])
                .withColumn("_f", F.col("_metadata.file_name"))
                .withColumn("_p", F.col("_metadata.row_index"))
            )
            already = [
                (a["add"], int(p)) for a in touched if a.get("dv") for p in a["dv"]
            ]
            if already:  # rows a prior DV deleted cannot be re-deleted
                df = df.join(
                    F.broadcast(
                        spark.createDataFrame(already, "_f string, _p long")
                    ),
                    ["_f", "_p"],
                    "left_anti",
                )
            hits = (
                df.filter(F.col(col).isin(list(keys)))
                .groupBy("_f")
                .agg(F.sort_array(F.collect_list("_p")).alias("_ps"))
                .collect()
            )
            actions = [
                {"dv": row["_f"], "positions": [int(p) for p in row["_ps"]]}
                for row in sorted(hits, key=lambda r: r["_f"])
            ]
        if actions:
            self.commit(actions, op="delete_dv")
        return {
            "files_total": len(touched) + len(kept),
            "files_rewritten": 0,
            "dv_files": len(actions),
        }

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str,
        stats_cols: tuple[str, ...],
    ) -> dict:
        """MERGE (upsert): footer-prune live files to those whose key
        range can contain any update key, rewrite them with matched
        rows replaced, append unmatched updates — one atomic commit."""
        klo, khi = updates.agg(F.min(key), F.max(key)).first()
        if klo is None:  # empty updates: a no-op MERGE, no commit (ADVICE r8)
            return {"files_total": len(self.snapshot_adds()), "files_rewritten": 0}
        touched, kept = self.prune(key, klo, khi)
        actions: list[dict] = []
        if touched:
            base = self._read_adds(spark, touched)
            untouched_rows = base.join(F.broadcast(updates.select(key)), key, "left_anti")
            matched_keys = base.select(key).distinct()
            rewritten = untouched_rows.unionByName(
                updates.join(F.broadcast(matched_keys), key, "left_semi")
            )
            inserts = updates.join(F.broadcast(matched_keys), key, "left_anti")
            actions += self._write_files(spark, [rewritten, inserts], stats_cols)
            actions += [{"remove": a["add"]} for a in touched]
        else:
            actions += self._write_files(spark, [updates], stats_cols)
        self.commit(actions, op="merge")
        return {"files_total": len(touched) + len(kept), "files_rewritten": len(touched)}

    def read_changes(
        self, spark: SparkSession, v_from: int, v_to: int
    ) -> DataFrame:
        """Change data feed (the Delta CDF / Iceberg changelog analog):
        row-level inserts and deletes between two versions, derived
        from the copy-on-write file diff — only files ADDED or REMOVED
        in (v_from, v_to] are read, so CDC costs O(changed files),
        never O(table). Rows carried over by a rewrite appear in both
        the removed and added file sets and cancel under exceptAll;
        what survives is exactly the logical change set. Returns the
        table columns plus `change_type` ('insert' | 'delete')."""
        from_adds = {a["add"]: a for a in self.snapshot_adds(v_from)}
        to_adds = {a["add"]: a for a in self.snapshot_adds(v_to)}
        new = [to_adds[n] for n in sorted(set(to_adds) - set(from_adds))]
        gone = [from_adds[n] for n in sorted(set(from_adds) - set(to_adds))]
        # deletion-vector growth on carried-over files = row-level
        # deletes with NO file-set diff; read exactly those positions
        dv_pairs = []
        for n in sorted(set(from_adds) & set(to_adds)):
            grown = set(to_adds[n].get("dv", ())) - set(from_adds[n].get("dv", ()))
            dv_pairs += [(n, int(p)) for p in sorted(grown)]
        # both sides read through their snapshot's dv state, so rows a
        # fold-in compaction dropped do not masquerade as deletes
        new_rows = self._read_adds(spark, new) if new else None
        old_rows = self._read_adds(spark, gone) if gone else None
        dv_rows = None
        if dv_pairs:
            pairs = spark.createDataFrame(dv_pairs, "_dv_file string, _dv_pos long")
            dv_rows = (
                spark.read.parquet(
                    *[os.path.join(self.path, n) for n in sorted({n for n, _ in dv_pairs})]
                )
                .withColumn("_dv_file", F.col("_metadata.file_name"))
                .withColumn("_dv_pos", F.col("_metadata.row_index"))
                .join(F.broadcast(pairs), ["_dv_file", "_dv_pos"], "left_semi")
                .drop("_dv_file", "_dv_pos")
            )
        if new_rows is None and old_rows is None and dv_rows is None:
            raise ValueError(f"no file changes between v{v_from} and v{v_to}")
        if old_rows is None:
            inserts, deletes = new_rows, None
        elif new_rows is None:
            inserts, deletes = None, old_rows
        else:
            inserts = new_rows.exceptAll(old_rows)
            deletes = old_rows.exceptAll(new_rows)
        if dv_rows is not None:
            deletes = dv_rows if deletes is None else deletes.unionByName(dv_rows)
        parts = []
        if inserts is not None:
            parts.append(inserts.withColumn("change_type", F.lit("insert")))
        if deletes is not None:
            parts.append(deletes.withColumn("change_type", F.lit("delete")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def restore(self, version: int) -> int:
        """RESTORE (rollback) the table to a historical version AS A NEW
        COMMIT (the Delta RESTORE semantic): the target snapshot's file
        set becomes live again by adding back its files and removing
        everything currently live that it lacks. History is preserved —
        the rollback is itself an auditable commit, and the rolled-back
        versions remain time-travelable. Requires the old files to
        still exist physically (i.e. not vacuumed past the horizon)."""
        target = {a["add"]: a for a in self.snapshot_adds(version)}
        current = {a["add"]: a for a in self.snapshot_adds()}
        missing = [
            n for n in target
            if not os.path.exists(os.path.join(self.path, n))
        ]
        if missing:
            raise ValueError(f"cannot restore v{version}: files vacuumed: {missing}")
        # re-add any file that is missing OR whose deletion-vector state
        # drifted (the emitted add carries the target's dv, and an add
        # resets dv state on replay — so restoring past a DV undoes it)
        actions: list[dict] = [a for n, a in target.items() if current.get(n) != a]
        actions += [{"remove": n} for n in current if n not in target]
        return self.commit(actions, op="restore", extra={"restored_version": version})

    def compact(
        self, spark: SparkSession, stats_cols: tuple[str, ...], target_files: int = 1
    ) -> int:
        """Replace the live file set with target_files files, one commit."""
        adds = self.snapshot_adds()
        # compact per partition group (round 10): rewritten files must
        # KEEP their partition attribution or partition-filtered reads
        # lose them; deletion vectors fold back in via _read_adds
        groups: dict[tuple, list[dict]] = {}
        for a in adds:
            key = tuple(sorted((a.get("partition") or {}).items()))
            groups.setdefault(key, []).append(a)
        actions: list[dict] = []
        for pitems in sorted(groups):
            df = self._read_adds(spark, groups[pitems])
            if pitems:
                df = df.drop(*[k for k, _v in pitems])
            slices = [df.coalesce(1)] if target_files == 1 else [df.coalesce(target_files)]
            writes = self._write_files(spark, slices, stats_cols)
            if pitems:
                writes = [{**w, "partition": dict(pitems)} for w in writes]
            actions += writes
        actions += [{"remove": a["add"]} for a in adds]
        return self.commit(actions, op="compact")


# ---------------------------------------------------------------------------
# Registered queries: the deterministic fixture scenario
#
# Table = orders' (key, custkey, status, price) split into 8 equal-width
# o_orderkey range slices (v0 create), then: v1 append (+1e8-keyed 'A'
# rows for key%37), v2 ranged delete of [lo+3w, lo+3w+w/2] (stats-pruned
# copy-on-write), v3 compact. Every bound derives from min/max(o_orderkey)
# by integer arithmetic the DuckDB oracle replays exactly, and every
# rollup carries an md5 60-bit key fingerprint + fixed-point money sum,
# so one row lost/duplicated/mangled by the commit protocol breaks the
# hash. A fresh scratch table is built per call (same pattern as the
# streaming sinks); tests/test_txlog.py covers the protocol directly
# (atomicity, conflict retry, snapshot isolation, pruning counters).
# ---------------------------------------------------------------------------


def _fresh_table_dir(prefix: str = "t") -> str:
    """Scratch dir for a fixture table, with opportunistic GC: fixture
    tables are write-once per query call, so any sibling untouched for
    2h cannot belong to a live run — repeated gate/bench invocations
    would otherwise accumulate one dir per call (75 observed in one
    round before this GC)."""
    import time as _time

    root = "/root/repo/.scratch/txlog"
    os.makedirs(root, exist_ok=True)
    now = _time.time()
    for d in os.listdir(root):
        p = os.path.join(root, d)
        try:
            if now - os.path.getmtime(p) > 7200:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    return os.path.join(root, f"{prefix}-{uuid.uuid4().hex}")


_STATS_COLS = ("o_orderkey",)
_N_FILES = 8


def _orders_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders", assert_schema=False).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _append_key_slices(t: TxLogTable, base: DataFrame, n: int = 5) -> None:
    """The five key-sliced append commits both txlog stream queries
    start from, produced by ONE distributed write (round 16).

    Commit i's data is ``base WHERE o_orderkey % 50 == 10*i`` — exactly
    the frame the old per-commit ``append`` path wrote — but instead of
    five sequential coalesce(1) jobs (each re-running the filter scan;
    ~0.6 s apiece at sf0.1) the slice index becomes a partitionBy
    bucket of a single job (the q_txlog _write_files_ranged shape).
    Hash-repartitioning on the bucket lands each slice wholly in one
    task, so every slice is still exactly ONE data file, and the log
    still gains five separate versions = five offset steps for the
    stream. Aggregate-identical: same rows per file, and every
    consumer (footer stats, stream read, md5 fingerprint rollup) is
    row-order-free."""
    stage = os.path.join(t.path, f".stage-{uuid.uuid4().hex}")
    try:
        (
            base.withColumn(
                "_bucket", F.expr("CAST((o_orderkey % 50) DIV 10 AS INT)")
            )
            .repartition(F.col("_bucket"))
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(stage)
        )
        for i in range(n):
            d = os.path.join(stage, f"_bucket={i}")
            parts = (
                [p for p in os.listdir(d) if p.endswith(".parquet") and not p.startswith(".")]
                if os.path.isdir(d)
                else []
            )
            actions = []
            for part in sorted(parts):
                name = f"part-{uuid.uuid4().hex}.parquet"
                os.replace(os.path.join(d, part), os.path.join(t.path, name))
                st = _file_stats(os.path.join(t.path, name), ("o_orderkey",))
                if st["rows"] == 0:
                    os.unlink(os.path.join(t.path, name))
                    continue
                actions.append({"add": name, **st})
            t.commit(actions, op="append")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _appended(base: DataFrame, offset: int) -> DataFrame:
    """Append batch shifted past the live key range. The offset is
    max(o_orderkey)+1 (ADVICE r8): derived, not a fixed +1e8, so the
    append file's footer range NEVER overlaps the delete/query ranges
    (which live inside [lo, hi]) at ANY scale factor — the invariant
    the prune/skip oracles assume (files_total = buckets + 1)."""
    return base.filter(F.col("o_orderkey") % 37 == 0).select(
        (F.col("o_orderkey") + F.lit(offset)).alias("o_orderkey"),
        "o_custkey",
        F.lit("A").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1.5).alias("o_totalprice"),  # dyadic: IEEE-exact
    )


def _scenario(spark: SparkSession, sf_dir: str) -> tuple[TxLogTable, dict, int, int]:
    """create -> append -> ranged delete; returns (table, prune counters,
    delete lo, delete hi). Compaction is applied by the queries that
    read the FINAL state (so time travel reads pre-compact files)."""
    base = _orders_base(spark, sf_dir)
    lo, hi = base.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    width = max(1, (int(hi) - int(lo) + _N_FILES) // _N_FILES)
    path = _fresh_table_dir()
    t = TxLogTable.create(spark, path, base, "o_orderkey", _N_FILES, _STATS_COLS)
    t.append(spark, _appended(base, int(hi) + 1), _STATS_COLS)
    dlo = int(lo) + 3 * width
    dhi = dlo + width // 2
    counters = t.delete_where(spark, "o_orderkey", dlo, dhi, _STATS_COLS)
    return t, counters, dlo, dhi


def _rollup(df: DataFrame) -> DataFrame:
    fp = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000003
    )
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(fp).alias("fp"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    )


_BOUNDS_CTE = f"""
    w AS (
        SELECT min(o_orderkey) AS lo,
               (max(o_orderkey) - min(o_orderkey) + {_N_FILES}) // {_N_FILES} AS width
        FROM orders
    ),
    del AS (
        SELECT lo + 3 * width AS dlo, lo + 3 * width + width // 2 AS dhi FROM w
    ),
    v1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        UNION ALL
        SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders), 'A',
               o_totalprice + 1.5
        FROM orders WHERE o_orderkey % 37 = 0
    )
"""

_ROLLUP_SQL = f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                         AS BIGINT) % 1000003) AS BIGINT) AS fp,
           {dsum_sql('o_totalprice', 2)} AS total
"""


@register(
    "q_txlog_snapshot",
    oracle=f"""
        WITH {_BOUNDS_CTE}
        {_ROLLUP_SQL}
        FROM v1, del
        WHERE o_orderkey NOT BETWEEN dlo AND dhi
        GROUP BY o_orderstatus
    """,
    doc=(
        "Transaction-log table format, end to end (sources/txlog.py — the "
        "Delta-lite commit protocol): create orders as 8 range-sliced files "
        "with REAL parquet-footer stats in the log, append a +1e8-keyed "
        "batch, stats-prune a ranged copy-on-write delete (only footer-"
        "overlapping files rewritten), compact to one file, read the LATEST "
        "snapshot by replaying the JSON commit log. The per-status rollup "
        "carries an md5 60-bit key fingerprint + exact fixed-point money "
        "sum, so any row lost or duplicated across the four commits breaks "
        "the hash vs the oracle's pure-SQL replay of the same arithmetic. "
        "Atomic rename commits / conflict retry / snapshot isolation are "
        "pinned in tests/test_txlog.py."
    ),
    tags=("source", "sink", "maintenance", "txlog"),
)
def q_txlog_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, _counters, _dlo, _dhi = _scenario(spark, sf_dir)
    t.compact(spark, _STATS_COLS)
    return _rollup(t.read(spark))


@register(
    "q_txlog_time_travel",
    oracle=f"""
        WITH {_BOUNDS_CTE}
        {_ROLLUP_SQL}
        FROM v1
        GROUP BY o_orderstatus
    """,
    doc=(
        "Time travel on the transaction log: after create/append/delete/"
        "compact, read VERSION 1 (post-append, pre-delete) by replaying the "
        "log only up to that commit — the deleted rows are visible again "
        "and the rollup hash-matches the oracle's pre-delete state. "
        "Historical snapshots stay readable because remove actions only "
        "drop files from LATER snapshots' live sets (no physical delete "
        "until vacuum)."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, _counters, _dlo, _dhi = _scenario(spark, sf_dir)
    t.compact(spark, _STATS_COLS)
    return _rollup(t.read(spark, version=1))


@register(
    "q_txlog_prune_stats",
    oracle=f"""
        WITH {_BOUNDS_CTE},
        fb AS (
            SELECT (o.o_orderkey - w.lo) // w.width AS b,
                   min(o.o_orderkey) AS fmin, max(o.o_orderkey) AS fmax
            FROM orders o, w
            GROUP BY 1
        )
        SELECT CAST((SELECT COUNT(*) FROM fb) + 1 AS BIGINT) AS files_total,
               CAST((SELECT COUNT(*) FROM fb, del
                     WHERE fmin <= dhi AND fmax >= dlo) AS BIGINT) AS files_rewritten,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM v1, del
                WHERE o_orderkey NOT BETWEEN dlo AND dhi) AS n_rows
    """,
    doc=(
        "File-pruning honesty meter for the transaction log: the ranged "
        "delete consults per-file min/max recorded from REAL parquet "
        "footers and rewrites ONLY overlapping files. files_total / "
        "files_rewritten / surviving row count are emitted as DATA; the "
        "oracle recomputes all three from the same range arithmetic "
        "(per-bucket actual min/max over orders, +1 for the append file), "
        "so the hash proves the copy-on-write touched exactly the files it "
        "had to — the property that makes targeted mutation affordable at "
        "100 TB (rewrite O(overlap), not O(table))."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, counters, dlo, dhi = _scenario(spark, sf_dir)
    n_rows = t.read(spark).count()
    return spark.createDataFrame(
        [(counters["files_total"], counters["files_rewritten"], n_rows)],
        "files_total long, files_rewritten long, n_rows long",
    )


@register(
    "q_txlog_skip_scan",
    oracle=f"""
        WITH {_BOUNDS_CTE},
        fb AS (
            SELECT (o.o_orderkey - w.lo) // w.width AS b,
                   min(o.o_orderkey) AS fmin, max(o.o_orderkey) AS fmax
            FROM orders o, w
            GROUP BY 1
        ),
        q AS (SELECT lo + 5 * width AS qlo, lo + 5 * width + width // 3 AS qhi FROM w)
        SELECT CAST((SELECT COUNT(*) FROM fb) + 1 AS BIGINT) AS files_total,
               CAST((SELECT COUNT(*) FROM fb, q
                     WHERE fmin <= qhi AND fmax >= qlo) AS BIGINT) AS files_scanned,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders, q
                WHERE o_orderkey BETWEEN qlo AND qhi) AS n_rows,
               (SELECT {dsum_sql('o_totalprice', 2)} FROM orders, q
                WHERE o_orderkey BETWEEN qlo AND qhi) AS total
    """,
    doc=(
        "Data-skipping READ through the transaction log: the footer "
        "min/max stats recorded per add action double as a file-level "
        "zone map, so a selective range predicate opens only the "
        "overlapping files — O(overlap) scan cost before parquet "
        "row-group pruning even starts (the same mechanism Delta/Iceberg "
        "data skipping uses). The query range is the sixth width-slice's "
        "first third: files_total / files_scanned / matching row count / "
        "fixed-point revenue are all emitted as data, and the oracle "
        "recomputes every one from the bucket arithmetic plus a plain "
        "filter over orders — the hash proves both the skip decision AND "
        "that skipping lost no qualifying row."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_skip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _orders_base(spark, sf_dir)
    lo, hi = base.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    width = max(1, (int(hi) - int(lo) + _N_FILES) // _N_FILES)
    path = _fresh_table_dir()
    t = TxLogTable.create(spark, path, base, "o_orderkey", _N_FILES, _STATS_COLS)
    t.append(spark, _appended(base, int(hi) + 1), _STATS_COLS)
    qlo = int(lo) + 5 * width
    qhi = qlo + width // 3
    df, counters = t.read_where(spark, "o_orderkey", qlo, qhi)
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"), dsum(F.col("o_totalprice"), 2).alias("total")
    ).first()
    return spark.createDataFrame(
        [(counters["files_total"], counters["files_scanned"], agg["n_rows"], agg["total"])],
        "files_total long, files_scanned long, n_rows long, total double",
    )


@register(
    "q_txlog_merge",
    oracle="""
        WITH w AS (
            SELECT min(c_custkey) AS lo,
                   (max(c_custkey) - min(c_custkey) + 6) // 6 AS width
            FROM customer
        ),
        band AS (
            SELECT lo + 2 * width AS blo, lo + 3 * width - 1 AS bhi FROM w
        ),
        upd AS (
            SELECT c_custkey, c_name,
                   c_acctbal + 100.0 AS c_acctbal,
                   'UPDATED' AS c_mktsegment
            FROM customer, band
            WHERE c_custkey BETWEEN blo AND bhi AND c_custkey % 10 = 0
        )
        SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment
        FROM customer c
        WHERE c.c_custkey NOT IN (SELECT c_custkey FROM upd)
        UNION ALL
        SELECT * FROM upd
    """,
    doc=(
        "MERGE through the transaction log (the commit-protocol upgrade of "
        "q_merge_upsert's bare-parquet semantics): customer becomes a "
        "6-file range-sliced txlog table; a key-banded update batch "
        "(band = the third width slice, keys %10, balance +100.0 "
        "IEEE-exact) merges in ONE atomic commit that footer-prunes to the "
        "overlapping files, rewrites matched rows, and appends nothing "
        "here (all keys match). The full row set is returned — every "
        "carried column hash-checked. tests/test_txlog.py asserts the "
        "prune counters (rewrote a strict subset of files)."
    ),
    tags=("source", "sink", "maintenance", "txlog"),
)
def q_txlog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer", assert_schema=False).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    lo, hi = cust.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    width = max(1, (int(hi) - int(lo) + 6) // 6)
    blo, bhi = int(lo) + 2 * width, int(lo) + 3 * width - 1
    path = _fresh_table_dir()
    t = TxLogTable.create(spark, path, cust, "c_custkey", 6, ("c_custkey",))
    updates = cust.filter(
        (F.col("c_custkey").between(blo, bhi)) & (F.col("c_custkey") % 10 == 0)
    ).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    t.merge(spark, updates, "c_custkey", ("c_custkey",))
    return t.read(spark)


def stream_commit_batch(
    table: TxLogTable, batch_df: DataFrame, batch_id: int, stats_cols: tuple[str, ...]
) -> bool:
    """foreachBatch writer with per-batch idempotence: the micro-batch's
    files land as ONE commit carrying its batch_id; a batch_id already
    in the log is skipped, so a foreachBatch retry (task failure after
    a successful commit, checkpoint replay after an unclean stop)
    cannot double-ingest. Returns whether a commit was made."""
    if any(c.get("batch_id") == batch_id for c in table.history()):
        return False
    actions = table._write_files(None, [batch_df], stats_cols)
    table.commit(actions, op="stream-append", extra={"batch_id": batch_id})
    return True


@register(
    "q_txlog_stream_ingest",
    oracle="""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               (CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100) AS total
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "Streaming ingest INTO the transaction-log table, exactly-once: "
        "each of the stream's micro-batches (AvailableNow over ascending "
        "file chunks) commits atomically via foreachBatch with its "
        "batch_id recorded in the commit document — a replayed batch "
        "(foreachBatch retry or checkpoint replay) is detected and "
        "skipped, so the table cannot double-ingest (stream_commit_batch; "
        "replay idempotence pinned in tests/test_txlog.py). The final "
        "snapshot's per-type rollup must equal the plain batch GROUP BY "
        "over events — proving no batch was lost, duplicated, or torn "
        "across the commit protocol. This is the production shape for "
        "'streams land in a governed table': per-batch atomicity from the "
        "log, idempotence from the batch-id dedup, and downstream readers "
        "get snapshot isolation while ingest runs."
    ),
    tags=("extension", "streaming", "txlog"),
)
def q_txlog_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from benchmark_spark.streaming.windows import (
        await_done,
        events_stream_chunks,
        pinned_start,
        scratch_dir,
    )

    stream = events_stream_chunks(spark, sf_dir)
    path = _fresh_table_dir("stream")
    os.makedirs(path, exist_ok=True)
    t = TxLogTable(path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        stream_commit_batch(
            t, batch_df.select("event_id", "event_type", "value"), batch_id, ("event_id",)
        )

    q = pinned_start(
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", scratch_dir())
        .trigger(availableNow=True)
    )
    await_done(q)
    return t.read(spark).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total")
    )


def _schema_fields(df: DataFrame) -> list[dict]:
    return [{"name": f.name, "type": f.dataType.simpleString()} for f in df.schema.fields]


def txlog_schema_at(table: TxLogTable, version: int | None = None) -> list[dict] | None:
    """The authoritative column set at a version: the newest metaData
    action at-or-before it (Delta-style schema-in-log — time travel
    returns the OLD schema, not whatever the files happen to union to)."""
    schema = None
    for v in table.versions():
        if version is not None and v > version:
            break
        md = table._read_commit(v).get("metaData")
        if md is not None:
            schema = md["schema"]
    return schema


def read_with_schema(
    spark: SparkSession, table: TxLogTable, version: int | None = None
) -> DataFrame:
    """Snapshot read honoring the logged schema: files written before a
    column existed are null-filled for it (mergeSchema union), and the
    projection is pinned to the schema live AT THAT VERSION — so a
    pre-evolution time travel does NOT show the later column."""
    schema = txlog_schema_at(table, version)
    df = (
        spark.read.option("mergeSchema", "true").parquet(*table.snapshot_files(version))
        if table.snapshot_files(version)
        else None
    )
    if df is None:
        raise ValueError(f"empty table snapshot at version {version}")
    if schema is None:
        return df
    cols = [
        F.col(c["name"]) if c["name"] in df.columns else F.lit(None).cast(c["type"]).alias(c["name"])
        for c in schema
    ]
    return df.select(*cols)


@register(
    "q_txlog_schema_evolution",
    oracle=f"""
        WITH evolved AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   CAST(NULL AS VARCHAR) AS channel
            FROM orders
            UNION ALL
            SELECT o_orderkey + 50000000, o_orderstatus, o_totalprice, 'WEB'
            FROM orders WHERE o_orderkey % 41 = 0
        )
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(channel) AS BIGINT) AS n_with_channel,
               CAST(SUM(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                             AS BIGINT) % 1000003) AS BIGINT) AS fp,
               {dsum_sql('o_totalprice', 2)} AS total
        FROM evolved
        GROUP BY o_orderstatus
    """,
    doc=(
        "Schema evolution THROUGH the transaction log: the create commit "
        "records the table schema as a metaData action; a later append adds "
        "a `channel` column in the same commit that updates the schema. The "
        "latest snapshot reads old files null-filled for the new column "
        "(mergeSchema union pinned to the LOGGED projection), while time "
        "travel to v0 returns the ORIGINAL schema without the column — the "
        "log, not the file union, is authoritative (pinned in "
        "tests/test_txlog.py). The rollup counts rows carrying the new "
        "column plus the usual key fingerprint + fixed-point sum, so the "
        "evolution misclassifying a single row breaks the hash."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _orders_base(spark, sf_dir).select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = _fresh_table_dir()
    os.makedirs(path, exist_ok=True)
    t = TxLogTable(path)
    lo, hi = base.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    width = max(1, (int(hi) - int(lo) + 4) // 4)
    slices = [
        base.filter(
            (F.col("o_orderkey") >= int(lo) + i * width)
            & (F.col("o_orderkey") < int(lo) + (i + 1) * width)
        )
        for i in range(4)
    ]
    t.commit(
        t._write_files(spark, slices, _STATS_COLS),
        op="create",
        extra={"metaData": {"schema": _schema_fields(base)}},
    )
    evolved_batch = base.filter(F.col("o_orderkey") % 41 == 0).select(
        (F.col("o_orderkey") + 50_000_000).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
        F.lit("WEB").alias("channel"),
    )
    t.commit(
        t._write_files(spark, [evolved_batch], _STATS_COLS),
        op="append-evolve",
        extra={"metaData": {"schema": _schema_fields(evolved_batch)}},
    )
    fp = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000003
    )
    return read_with_schema(spark, t).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("channel").alias("n_with_channel"),
        F.sum(fp).alias("fp"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    )


# --- column mapping (round 13, VERDICT r12 #5) -----------------------------
# Delta-column-mapping analog: every logical column owns a STABLE
# physical name ("c0", "c1", ... assigned at create), data files are
# written under physical names only, and the metaData schema carries
# the logical->physical map. Rename and drop are then METADATA-ONLY
# commits (no add/remove actions, zero data movement — the property
# that makes schema evolution affordable at 100 TB), time travel
# returns the logical names live AT THAT VERSION, and files written
# before a rename read correctly after it because nothing about them
# changed.


def mapped_fields(df: DataFrame, physical: dict[str, str]) -> list[dict]:
    """metaData schema entries with logical->physical indirection."""
    return [
        {"name": f.name, "physical": physical[f.name],
         "type": f.dataType.simpleString()}
        for f in df.schema.fields
    ]


def to_physical(df: DataFrame, fields: list[dict]) -> DataFrame:
    """Project logical columns to their physical names for writing."""
    return df.select(
        *[F.col(c["name"]).alias(c["physical"]) for c in fields]
    )


def _physical_id(name: str) -> int:
    """Numeric id of a generated physical name ('c7' -> 7)."""
    if not (name.startswith("c") and name[1:].isdigit()):
        raise ValueError(f"not a generated physical column name: {name!r}")
    return int(name[1:])


def txlog_physical_max_id(table: TxLogTable, version: int | None = None) -> int:
    """Highest physical-name id EVER ASSIGNED at-or-before `version`
    (Delta's column-mapping maxColumnId analog). Tracked explicitly in
    metaData because the current schema alone cannot reveal ids freed
    by a drop — and reusing one would make mergeSchema's name-based
    union silently resurrect the dropped column's bytes from old files
    (ADVICE r13). Besides the recorded field, every historical mapped
    schema's physical ids are folded in, so the guard also covers
    tables whose early commits predate the recorded high-water mark
    (a legacy log would otherwise report -1 and accept any reuse)."""
    max_id = -1
    for v in table.versions():
        if version is not None and v > version:
            break
        md = table._read_commit(v).get("metaData")
        if md is not None:
            max_id = max(max_id, md.get("physicalMaxId", -1))
            for c in md.get("schema") or []:
                if "physical" in c:
                    max_id = max(max_id, _physical_id(c["physical"]))
    return max_id


def mapped_schema_meta(table: TxLogTable, fields: list[dict]) -> dict:
    """metaData payload for a column-mapping commit: validates that
    every physical name NEW to this table (not live in the current
    schema) has an id ABOVE every id ever assigned — a dropped
    column's physical name can never come back — and records the new
    high-water mark. Also rejects two fields sharing one physical
    name and a LIVE physical name changing type (both would make
    mergeSchema serve one column's bytes under another's contract).
    Raise loudly at commit time; the alternative is a reader quietly
    unioning resurrected or mis-cast bytes. Known limit (Delta solves
    it with per-field ids): a drop + re-add of a different logical
    column onto the SAME live physical name within one commit is
    structurally indistinguishable from a rename and is accepted as
    one — split such changes across commits so the drop retires the
    physical name first."""
    prev_max = txlog_physical_max_id(table)
    current = txlog_schema_at(table) or []
    live = {c["physical"]: c for c in current}
    seen: set[str] = set()
    ids = []
    for c in fields:
        pid = _physical_id(c["physical"])
        if c["physical"] in seen:
            raise ValueError(
                f"physical name {c['physical']!r} mapped by two fields in "
                "one schema — mergeSchema would serve one column's bytes "
                "under both logical names"
            )
        seen.add(c["physical"])
        if c["physical"] not in live and pid <= prev_max:
            raise ValueError(
                f"physical name {c['physical']!r} reuses an already-assigned "
                f"id (max ever assigned: c{prev_max}); reuse would resurrect "
                "dropped bytes via mergeSchema — assign a fresh physical name"
            )
        if c["physical"] in live and c["type"] != live[c["physical"]]["type"]:
            raise ValueError(
                f"physical name {c['physical']!r} changes type "
                f"{live[c['physical']]['type']!r} -> {c['type']!r}; old files' "
                "bytes would be read under the wrong type — assign a fresh "
                "physical name instead"
            )
        ids.append(pid)
    return {"schema": fields, "physicalMaxId": max([prev_max, *ids])}


def read_with_mapping(
    spark: SparkSession, table: TxLogTable, version: int | None = None
) -> DataFrame:
    """Snapshot read honoring the logical->physical map at `version`:
    files (physical names; mergeSchema unions segments written before
    a column was dropped with ones written after) are projected to the
    LOGICAL schema live at that version — a pre-rename time travel
    returns the old names, a post-drop read cannot see the dropped
    column even though its bytes are still in the old files."""
    schema = txlog_schema_at(table, version)
    files = table.snapshot_files(version)
    if not files:
        raise ValueError(f"empty table snapshot at version {version}")
    df = spark.read.option("mergeSchema", "true").parquet(*files)
    return df.select(
        *[F.col(c["physical"]).alias(c["name"]) for c in schema]
    )


@register(
    "q_txlog_column_mapping",
    oracle=f"""
        WITH mx AS (SELECT max(o_orderkey) + 1 AS off FROM orders),
        v1rows AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            UNION ALL
            SELECT o_orderkey + off, 'A', o_totalprice + 1.5
            FROM orders, mx WHERE o_orderkey % 43 = 0
        ),
        finalrows AS (
            SELECT o_orderkey, o_totalprice FROM v1rows
            UNION ALL
            SELECT o_orderkey + 2 * off, o_totalprice + 2.25
            FROM orders, mx WHERE o_orderkey % 47 = 0
        ),
        fin AS (
            SELECT CAST(o_orderkey % 5 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                                 AS BIGINT) % 1000003) AS BIGINT) AS fp,
                   {dsum_sql('o_totalprice', 2)} AS total
            FROM finalrows GROUP BY 1
        ),
        v1 AS (
            SELECT CAST(o_orderkey % 5 AS BIGINT) AS bucket,
                   {dsum_sql('o_totalprice', 2)} AS total_v1,
                   CAST(SUM(CAST('0x' || substring(md5(o_orderstatus), 1, 15)
                                 AS BIGINT) % 1000003) AS BIGINT) AS status_fp_v1
            FROM v1rows GROUP BY 1
        )
        SELECT fin.bucket, fin.n, fin.fp, fin.total,
               v1.total_v1, v1.status_fp_v1,
               CAST(2 AS BIGINT) AS n_cols_final,
               CAST(3 AS BIGINT) AS n_cols_v1
        FROM fin JOIN v1 USING (bucket)
    """,
    doc=(
        "COLUMN MAPPING through the transaction log (round 13, VERDICT "
        "r12 #5 — the Delta column-mapping / Iceberg field-ID analog "
        "that makes rename/drop safe under readers of old snapshots): "
        "v0 creates the table with logical->physical indirection "
        "(o_orderkey->c0, o_orderstatus->c1, o_totalprice->c2; data "
        "files carry ONLY physical names), v1 appends, v2 RENAMES "
        "o_totalprice to price and v3 DROPS o_orderstatus — both "
        "metadata-only commits with zero add/remove actions and zero "
        "data movement — then v4 appends a post-drop segment whose "
        "files physically lack c1. The output joins the FINAL mapped "
        "read (logical o_orderkey/price over mixed pre- and post-drop "
        "files) with a TIME TRAVEL to v1 (pre-rename names, dropped "
        "column readable, its value fingerprint hashed) and carries "
        "both logical column counts as data — a rename that rewrote "
        "files, a drop that leaked, or a time travel that showed the "
        "new names would each break the hash. Pinned structurally in "
        "tests/test_txlog.py (physical footers stable across rename, "
        "metadata-only commit actions)."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _orders_base(spark, sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    physical = {"o_orderkey": "c0", "o_orderstatus": "c1", "o_totalprice": "c2"}
    fields_v0 = mapped_fields(base, physical)
    path = _fresh_table_dir("colmap")
    os.makedirs(path, exist_ok=True)
    t = TxLogTable(path)
    lo, hi = base.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    off = int(hi) + 1
    width = max(1, (int(hi) - int(lo) + 2) // 2)
    slices = [
        to_physical(
            base.filter(
                (F.col("o_orderkey") >= int(lo) + i * width)
                & (F.col("o_orderkey") < int(lo) + (i + 1) * width)
            ),
            fields_v0,
        )
        for i in range(2)
    ]
    t.commit(
        t._write_files(spark, slices, ("c0",)),
        op="create",
        extra={"metaData": mapped_schema_meta(t, fields_v0)},
    )
    append1 = base.filter(F.col("o_orderkey") % 43 == 0).select(
        (F.col("o_orderkey") + off).alias("o_orderkey"),
        F.lit("A").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1.5).alias("o_totalprice"),  # dyadic: IEEE-exact
    )
    t.commit(
        t._write_files(spark, [to_physical(append1, fields_v0)], ("c0",)),
        op="append",
        extra={"metaData": mapped_schema_meta(t, fields_v0)},
    )
    # v2: RENAME o_totalprice -> price. Metadata-only: logical name
    # changes, physical c2 (and every data file) untouched.
    fields_v2 = [
        dict(c, name="price") if c["name"] == "o_totalprice" else c
        for c in fields_v0
    ]
    t.commit([], op="rename-column", extra={"metaData": mapped_schema_meta(t, fields_v2)})
    # v3: DROP o_orderstatus. Metadata-only: c1's bytes stay in the old
    # files, invisible to mapped reads from here on.
    fields_v3 = [c for c in fields_v2 if c["name"] != "o_orderstatus"]
    t.commit([], op="drop-column", extra={"metaData": mapped_schema_meta(t, fields_v3)})
    # v4: post-drop append — its files physically lack c1 entirely.
    append2 = base.filter(F.col("o_orderkey") % 47 == 0).select(
        (F.col("o_orderkey") + 2 * off).alias("o_orderkey"),
        (F.col("o_totalprice") + 2.25).alias("price"),  # dyadic: IEEE-exact
    )
    t.commit(
        t._write_files(spark, [to_physical(append2, fields_v3)], ("c0",)),
        op="append",
        extra={"metaData": mapped_schema_meta(t, fields_v3)},
    )

    fp_key = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000003
    )
    fin = (
        read_with_mapping(spark, t)
        .groupBy((F.col("o_orderkey") % 5).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(fp_key).alias("fp"),
            dsum(F.col("price"), 2).alias("total"),
        )
    )
    fp_status = (
        F.conv(F.substring(F.md5(F.col("o_orderstatus")), 1, 15), 16, 10)
        .cast("long")
        % 1000003
    )
    v1 = (
        read_with_mapping(spark, t, version=1)
        .groupBy((F.col("o_orderkey") % 5).alias("bucket"))
        .agg(
            dsum(F.col("o_totalprice"), 2).alias("total_v1"),
            F.sum(fp_status).alias("status_fp_v1"),
        )
    )
    n_cols_final = len(txlog_schema_at(t))
    n_cols_v1 = len(txlog_schema_at(t, 1))
    return fin.join(v1, "bucket").select(
        "bucket",
        "n",
        "fp",
        "total",
        "total_v1",
        "status_fp_v1",
        F.lit(n_cols_final).cast("long").alias("n_cols_final"),
        F.lit(n_cols_v1).cast("long").alias("n_cols_v1"),
    )


@register(
    "q_txlog_vacuum",
    oracle=f"""
        WITH {_BOUNDS_CTE},
        fb AS (
            SELECT (o.o_orderkey - w.lo) // w.width AS b,
                   min(o.o_orderkey) AS fmin, max(o.o_orderkey) AS fmax
            FROM orders o, w
            GROUP BY 1
        ),
        counts AS (
            -- physical files ever written: create buckets + 1 append
            -- + 1 delete-survivor rewrite + 1 compact; live after
            -- compact = 1; vacuum(retain 0) deletes the rest
            SELECT (SELECT COUNT(*) FROM fb) + 3 AS files_written,
                   1 AS files_live
        )
        SELECT CAST(files_written - files_live AS BIGINT) AS files_deleted,
               CAST(files_live AS BIGINT) AS files_live,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM v1, del
                WHERE o_orderkey NOT BETWEEN dlo AND dhi) AS n_rows,
               (SELECT {dsum_sql('o_totalprice', 2)} FROM v1, del
                WHERE o_orderkey NOT BETWEEN dlo AND dhi) AS total
        FROM counts
    """,
    doc=(
        "VACUUM through the transaction log (VERDICT r8 #4: retention is "
        "now driver-hash-checked, not just pytest-pinned): after create/"
        "append/delete/compact, checkpoint the log and vacuum with zero "
        "retained versions (grace window explicitly 0 — the fixture is "
        "single-writer; production defaults to a 1h age guard so an "
        "in-flight writer's staged files survive, ADVICE r8). The oracle "
        "recomputes the exact physical-file ledger from the bucket "
        "arithmetic (create buckets + append + delete-rewrite + compact, "
        "minus the single live compacted file), and the post-vacuum "
        "snapshot's row count + fixed-point revenue prove deletion touched "
        "ONLY unreferenced files. Time travel past the horizon correctly "
        "dies (pinned in tests/test_txlog.py)."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, _counters, dlo, dhi = _scenario(spark, sf_dir)
    t.compact(spark, _STATS_COLS)
    t.checkpoint()
    files_before = sum(
        1 for f in os.listdir(t.path) if f.endswith(".parquet")
    )
    deleted = t.vacuum(retain_versions=0, grace_secs=0)
    live = files_before - len(deleted)
    agg = t.read(spark).agg(
        F.count(F.lit(1)).alias("n_rows"), dsum(F.col("o_totalprice"), 2).alias("total")
    ).first()
    return spark.createDataFrame(
        [(len(deleted), live, agg["n_rows"], agg["total"])],
        "files_deleted long, files_live long, n_rows long, total double",
    )


@register(
    "q_txlog_restore",
    oracle=f"""
        WITH {_BOUNDS_CTE}
        {_ROLLUP_SQL}
        FROM v1
        GROUP BY o_orderstatus
    """,
    doc=(
        "RESTORE (rollback) through the transaction log: after create/"
        "append/ranged-delete, roll the table back to the post-append "
        "version AS A NEW COMMIT (the Delta RESTORE semantic — history "
        "stays intact and auditable, unlike a log truncation): the "
        "deleted rows are live again in the LATEST snapshot, and the "
        "rollup hash-matches the pre-delete state. Differs from "
        "q_txlog_time_travel, which READS an old version without "
        "changing the table: here the head itself moves back, the "
        "rollback is one atomic commit, and the undone delete remains "
        "time-travelable below it (op sequence pinned in "
        "tests/test_txlog.py, including the vacuumed-files refusal)."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, _counters, _dlo, _dhi = _scenario(spark, sf_dir)
    t.restore(1)  # undo the ranged delete, head moves back to v1's files
    return _rollup(t.read(spark))


@register(
    "q_txlog_cdc",
    oracle=f"""
        WITH {_BOUNDS_CTE},
        changes AS (
            -- v0 -> v1: the append commit = pure inserts
            SELECT 'insert' AS change_type,
                   o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders)
                       AS o_orderkey,
                   o_totalprice + 1.5 AS o_totalprice
            FROM orders WHERE o_orderkey % 37 = 0
            UNION ALL
            -- v1 -> v2: the ranged copy-on-write delete = pure deletes
            SELECT 'delete', o_orderkey, o_totalprice
            FROM orders, del
            WHERE o_orderkey BETWEEN dlo AND dhi
        )
        SELECT change_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                             AS BIGINT) % 1000003) AS BIGINT) AS fp,
               {dsum_sql('o_totalprice', 2)} AS total
        FROM changes
        GROUP BY change_type
    """,
    doc=(
        "Change data feed through the transaction log (the Delta CDF / "
        "Iceberg changelog analog — what a downstream incremental "
        "consumer reads instead of re-scanning the table): row-level "
        "inserts and deletes between versions, derived from the "
        "copy-on-write FILE diff, so CDC reads O(changed files), never "
        "O(table). Rows a rewrite merely carried over appear in both the "
        "removed and added file sets and cancel under exceptAll; what "
        "survives is exactly the logical change set. The fixture emits "
        "the v0->v1 changes (the append: pure inserts) and the v1->v2 "
        "changes (the ranged delete: pure deletes, and the carried-over "
        "survivor rows provably CANCEL — an extra or missing row breaks "
        "the md5 fingerprint sum), rolled up per change_type with the "
        "usual key fingerprint + fixed-point money sum."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, _counters, _dlo, _dhi = _scenario(spark, sf_dir)
    fp = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000003
    )
    changes = t.read_changes(spark, 0, 1).unionByName(t.read_changes(spark, 1, 2))
    return changes.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(fp).alias("fp"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    )


_FP_SQL = """CAST(SUM(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                          AS BIGINT) % 1000003) AS BIGINT)"""


@register(
    "q_txlog_partition_prune",
    oracle=f"""
        WITH w AS (
            SELECT min(o_orderkey) AS lo,
                   (max(o_orderkey) - min(o_orderkey) + {_N_FILES}) // {_N_FILES}
                       AS width
            FROM orders
        ),
        del AS (
            SELECT lo + 3 * width AS dlo, lo + 3 * width + width // 2 AS dhi FROM w
        ),
        fb AS (
            SELECT o_orderstatus AS s, (o_orderkey - lo) // width AS b,
                   min(o_orderkey) AS mn, max(o_orderkey) AS mx
            FROM orders, w GROUP BY 1, 2
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS files_total,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM fb WHERE s = 'F')
                   AS files_in_partition,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM fb, del
                WHERE s = 'F' AND mn <= dhi AND mx >= dlo) AS files_scanned,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders, del
                WHERE o_orderstatus = 'F' AND o_orderkey BETWEEN dlo AND dhi)
                   AS n_rows,
               (SELECT {_FP_SQL} FROM orders, del
                WHERE o_orderstatus = 'F' AND o_orderkey BETWEEN dlo AND dhi)
                   AS fp,
               (SELECT {dsum_sql('o_totalprice', 2)} FROM orders, del
                WHERE o_orderstatus = 'F' AND o_orderkey BETWEEN dlo AND dhi)
                   AS total
    """,
    doc=(
        "PARTITION pruning composed with stats pruning (VERDICT r9 #9): "
        "orders is created PARTITIONED by o_orderstatus with the usual "
        "global-range o_orderkey buckets inside each partition, so every "
        "file is one (status, bucket) cell whose partition value lives "
        "in its add action (Hive-style: NOT in the data file — "
        "re-injected at read). A predicate `status = 'F' AND key IN "
        "[dlo, dhi]` prunes partition-FIRST (exact, no stats), then by "
        "the footer zone map; files_total / files_in_partition / "
        "files_scanned are emitted as DATA and hash-checked against the "
        "oracle's replay of the (status, bucket) grid — the two bounds "
        "provably COMPOSE (files_scanned < files_in_partition < "
        "files_total), like IVFPQ's probe x shortlist. The rollup of "
        "the surviving rows (count + md5 key fingerprint + fixed-point "
        "revenue) proves pruning lost nothing. At 100 TB this is the "
        "difference between scanning a day's partition and scanning the "
        "lake: partition prune is O(1) per file from the log, and the "
        "zone map cuts the remainder by ~buckets x."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _orders_base(spark, sf_dir)
    lo, hi = base.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    width = max(1, (int(hi) - int(lo) + _N_FILES) // _N_FILES)
    dlo = int(lo) + 3 * width
    dhi = dlo + width // 2
    path = _fresh_table_dir("part")
    t = TxLogTable.create_partitioned(
        spark, path, base, "o_orderstatus", "o_orderkey", _N_FILES, _STATS_COLS
    )
    df, c = t.read_where(
        spark, "o_orderkey", dlo, dhi, partition={"o_orderstatus": "F"}
    )
    fp = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000003
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(fp).alias("fp"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    ).first()
    return spark.createDataFrame(
        [
            (
                c["files_total"], c["files_in_partition"], c["files_scanned"],
                agg["n"], agg["fp"], agg["total"],
            )
        ],
        "files_total long, files_in_partition long, files_scanned long, "
        "n_rows long, fp long, total double",
    )


@register(
    "q_txlog_delete_vectors",
    oracle=f"""
        WITH w AS (
            SELECT min(o_orderkey) AS lo,
                   (max(o_orderkey) - min(o_orderkey) + {_N_FILES}) // {_N_FILES}
                       AS width
            FROM orders
        ),
        hits AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 701 = 0),
        surv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, {_FP_SQL} AS fp,
                   {dsum_sql('o_totalprice', 2)} AS total
            FROM orders WHERE o_orderkey % 701 <> 0
        )
        SELECT CAST(0 AS BIGINT) AS files_rewritten,
               (SELECT CAST(COUNT(DISTINCT (o_orderkey - lo) // width) AS BIGINT)
                FROM hits, w) AS dv_files,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_deleted,
               n AS n_rows, fp, total,
               CAST(0 AS BIGINT) AS post_compact_dvs,
               n AS n_rows2, fp AS fp2, total AS total2
        FROM surv
    """,
    doc=(
        "DELETION VECTORS (merge-on-read point deletes, VERDICT r9 #2): "
        "create the 8-file orders table, then point-delete the "
        "o_orderkey % 701 keys via delete_keys — ONE commit of per-file "
        "row-position `dv` actions, files_rewritten = 0 BY CONSTRUCTION "
        "(hash-checked as data, vs delete_where's copy-on-write "
        "rewrite). Readers anti-merge the (file, row_index) pairs "
        "(parquet _metadata.row_index — the physical positions, not a "
        "key re-derivation), so the post-delete rollup (count + md5 key "
        "fingerprint + fixed-point revenue) matches the oracle's plain "
        "survivor aggregate exactly; dv_files hash-checks WHICH bucket "
        "files carry a vector against the oracle's replay of the "
        "create-time bucket arithmetic. A compaction then FOLDS the "
        "vectors back into copy-on-write files (post_compact_dvs = 0) "
        "with the identical rollup — the read-amplification debt paid "
        "off in one background commit. Time-travel to pre-DV snapshots, "
        "cumulative DV merges, restore-past-DV, and DV-vs-rewrite "
        "commit conflicts are pinned in tests/test_txlog.py."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _orders_base(spark, sf_dir)
    path = _fresh_table_dir("dv")
    t = TxLogTable.create(spark, path, base, "o_orderkey", _N_FILES, _STATS_COLS)
    keys = [
        r[0]
        for r in base.filter(F.col("o_orderkey") % 701 == 0)
        .select("o_orderkey")
        .collect()
    ]
    c = t.delete_keys(spark, "o_orderkey", keys, _STATS_COLS)
    fp = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000003
    )

    def rollup(df: DataFrame):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(fp).alias("fp"),
            dsum(F.col("o_totalprice"), 2).alias("total"),
        ).first()

    post = rollup(t.read(spark))
    t.compact(spark, _STATS_COLS)
    dvs_after = sum(1 for a in t.snapshot_adds() if a.get("dv"))
    post2 = rollup(t.read(spark))
    return spark.createDataFrame(
        [
            (
                c["files_rewritten"], c["dv_files"], len(keys),
                post["n"], post["fp"], post["total"],
                dvs_after, post2["n"], post2["fp"], post2["total"],
            )
        ],
        "files_rewritten long, dv_files long, n_deleted long, n_rows long, "
        "fp long, total double, post_compact_dvs long, n_rows2 long, "
        "fp2 long, total2 double",
    )


# ---------------------------------------------------------------------------
# Streaming OUT of the governed table (round 9): the Delta-streaming-
# source analog, completing the loop with q_txlog_stream_ingest
# (streams INTO the table). Offsets are LOG VERSIONS; each micro-batch
# reads the files ADDED by the next commits.
# ---------------------------------------------------------------------------

_STREAM_SRC_VERSIONS_PER_BATCH = 2  # cap -> multiple offset hand-offs


class TxLogStreamReader:
    """SimpleDataSourceStreamReader over a txlog commit log: offset =
    last-consumed version; read() returns the rows of files ADDED in
    the next (up to cap) commits. Append-only contract: a remove
    action in the consumed range raises, exactly like Delta's
    streaming source refuses non-append commits without
    ignoreChanges. The simple API materializes through the driver —
    right for a tailing consumer; a bulk backfill would implement the
    partitioned streamReader where each added FILE is an
    InputPartition (the files are the natural splits)."""

    def __init__(self, options) -> None:
        self.path = options["path"]

    def initialOffset(self):
        return {"version": -1}

    def _rows_of_versions(self, versions: list[int]):
        """Materialize the rows of the files ADDED by `versions` (the
        shared loop of read() and readBetweenOffsets()); enforces the
        append-only contract."""
        import pyarrow.parquet as _pq

        t = TxLogTable(self.path)
        rows: list[tuple] = []
        for v in versions:
            commit = t._read_commit(v)
            for a in commit["actions"]:
                if "remove" in a:
                    raise ValueError(
                        f"append-only stream saw a remove at v{v}; "
                        "reprocess from a snapshot instead"
                    )
                if "add" in a:
                    tbl = _pq.read_table(os.path.join(self.path, a["add"]))
                    rows.extend(zip(*[tbl.column(c).to_pylist() for c in tbl.column_names]))
        return rows

    def read(self, start):
        t = TxLogTable(self.path)
        pending = [v for v in t.versions() if v > start["version"]]
        batch = pending[:_STREAM_SRC_VERSIONS_PER_BATCH]
        if not batch:
            return iter([]), dict(start)
        return iter(self._rows_of_versions(batch)), {"version": batch[-1]}

    def readBetweenOffsets(self, start, end):
        """Deterministic replay of a previously-committed batch (the
        SimpleDataSourceStreamReader recovery path, ADVICE r9): a
        restarted stream whose checkpoint committed offsets (start,
        end] re-reads exactly the adds of the versions in that range —
        same loop as read(), explicit upper bound, NO offset advance
        (Spark supplies both endpoints)."""
        t = TxLogTable(self.path)
        versions = [v for v in t.versions() if start["version"] < v <= end["version"]]
        return iter(self._rows_of_versions(versions))


def _txlog_stream_source_cls():
    """Build the DataSource subclass lazily (the datasource module is
    a Spark-4 surface; keep import at call time like pysource.py)."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    # TxLogStreamReader FIRST in the MRO: the base class's default
    # initialOffset/read raise NotImplementedError and would shadow ours
    class _Reader(TxLogStreamReader, SimpleDataSourceStreamReader):
        def __init__(self, options):
            TxLogStreamReader.__init__(self, options)

    class TxLogStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "txlogstream"

        def schema(self) -> str:
            return "o_orderkey bigint, o_totalprice double"

        def simpleStreamReader(self, schema):
            return _Reader(self.options)

    return TxLogStreamSource


def _txlog_partitioned_stream_source_cls():
    """PARTITIONED streaming source over the txlog (round 10 — the
    scale path the simple reader's docstring promised): offsets are
    still log versions, but each file ADDED in the consumed version
    range becomes one InputPartition, so the data bytes are read BY
    EXECUTORS in parallel — the driver only plans (reads the commit
    JSONs). This is the Delta-source execution shape: a 1000-file
    ingest batch fans out as 1000 tasks, and the driver never touches
    a data byte."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _FilePart(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class _Reader(DataSourceStreamReader):
        def __init__(self, options):
            self.path = options["path"]
            self.versions_per_batch = int(options.get("versionsperbatch", "2"))
            # last version this reader has handed out: advanced by
            # partitions() (planning) and commit(); latestOffset must
            # never step more than versions_per_batch past it
            self._consumed = -1

        def initialOffset(self) -> dict:
            return {"version": -1}

        def latestOffset(self) -> dict:
            head = (TxLogTable(self.path).versions() or [-1])[-1]
            # cap versions per micro-batch so a multi-commit backlog
            # exercises several offset hand-offs through the checkpoint
            return {"version": min(head, self._consumed + self.versions_per_batch)}

        def partitions(self, start: dict, end: dict):
            self._consumed = max(self._consumed, end["version"])
            t = TxLogTable(self.path)
            parts = []
            for v in t.versions():
                if not (start["version"] < v <= end["version"]):
                    continue
                for a in t._read_commit(v)["actions"]:
                    if "remove" in a:
                        raise ValueError(
                            f"append-only stream saw a remove at v{v}; "
                            "reprocess from a snapshot instead"
                        )
                    if "add" in a:
                        parts.append(_FilePart(os.path.join(self.path, a["add"])))
            return parts

        def read(self, partition):
            # runs ON THE EXECUTOR: one task per added file
            import pyarrow.parquet as _pq

            tbl = _pq.read_table(partition.path)
            return iter(zip(*[tbl.column(c).to_pylist() for c in tbl.column_names]))

        def commit(self, end: dict) -> None:
            self._consumed = max(self._consumed, end["version"])

    class TxLogPartitionedStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "txlogstreampart"

        def schema(self) -> str:
            return "o_orderkey bigint, o_totalprice double"

        def streamReader(self, schema):
            return _Reader(self.options)

    return TxLogPartitionedStreamSource


@register(
    "q_txlog_stream_source",
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                             AS BIGINT) % 1000003) AS BIGINT) AS fp,
               {dsum_sql('o_totalprice', 2)} AS total
        FROM orders WHERE o_orderkey % 10 = 0
    """,
    doc=(
        "STREAMING SOURCE over the transaction log (the Delta streaming-"
        "source analog; the read-side twin of q_txlog_stream_ingest): a "
        "custom Python DataSource whose offsets are LOG VERSIONS — each "
        "micro-batch consumes the files added by the next commits (capped "
        "at 2 versions/batch so the 5-commit fixture exercises multiple "
        "offset hand-offs through the checkpoint), and a remove action in "
        "the consumed range raises (append-only contract, as Delta's "
        "source without ignoreChanges). The fixture appends orders "
        "(o_orderkey % 10 = 0) in five key-sliced commits, then the "
        "stream drains the log into a complete-mode rollup that must "
        "equal the plain batch aggregate — the md5 key fingerprint breaks "
        "if any commit is lost, duplicated, or torn across offsets. At "
        "scale the files added per commit are the natural InputPartitions "
        "of the partitioned API; the log is the offset ledger either way."
    ),
    tags=("source", "extension", "streaming", "txlog"),
)
def q_txlog_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time
    import uuid

    from pyspark.errors import AnalysisException

    from benchmark_spark.streaming.windows import pinned_start, scratch_dir

    # materialize the filtered base once (round 16): count + the
    # five-slice write then read memory instead of re-scanning orders
    base = (
        _orders_base(spark, sf_dir)
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_totalprice")
        .localCheckpoint(eager=True)
    )
    expected = base.count()
    path = _fresh_table_dir("streamsrc")
    os.makedirs(path, exist_ok=True)
    t = TxLogTable(path)
    _append_key_slices(t, base)  # five append commits = five offset steps

    spark.dataSource.register(_txlog_stream_source_cls())
    agg = (
        spark.readStream.format("txlogstream")
        .option("path", path)
        .load()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
                ).cast("long")
                % 1000003
            ).alias("fp"),
            dsum(F.col("o_totalprice"), 2).alias("total"),
        )
    )
    sink = f"txlog_src_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir()
    q = pinned_start(
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
    )
    try:
        done = None
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                done = spark.table(sink).agg(F.sum("n")).first()[0]
            except AnalysisException:
                done = None
            if done == expected:
                break
            time.sleep(0.1)  # poll granularity: half the old 0.5 s wait tail (round 16)
        else:
            raise RuntimeError(f"txlog stream incomplete: {done}/{expected} rows")
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink)


@register(
    "q_txlog_stream_partitioned",
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                             AS BIGINT) % 1000003) AS BIGINT) AS fp,
               {dsum_sql('o_totalprice', 2)} AS total
        FROM orders WHERE o_orderkey % 10 = 0
    """,
    doc=(
        "PARTITIONED streaming source over the transaction log (round "
        "10 — the scale path the simple q_txlog_stream_source "
        "documents): same version offsets, but each file ADDED in the "
        "consumed range becomes one InputPartition, so the data bytes "
        "are read BY EXECUTORS in parallel tasks — the driver only "
        "plans from the commit JSONs and never touches a data byte "
        "(the Delta-source execution shape: a 1000-file ingest batch "
        "fans out as 1000 tasks). latestOffset caps 2 versions per "
        "micro-batch so the 5-commit fixture still exercises multiple "
        "offset hand-offs through the checkpoint; the append-only "
        "contract raises on a remove in the consumed range at PLAN "
        "time. Same md5-fingerprint complete-mode rollup equal to the "
        "batch aggregate — a lost, duplicated, or torn partition "
        "breaks the hash."
    ),
    tags=("source", "extension", "streaming", "txlog"),
)
def q_txlog_stream_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time
    import uuid

    from pyspark.errors import AnalysisException

    from benchmark_spark.streaming.windows import pinned_start, scratch_dir

    # materialize the filtered base once (round 16): count + the
    # five-slice write then read memory instead of re-scanning orders
    base = (
        _orders_base(spark, sf_dir)
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_totalprice")
        .localCheckpoint(eager=True)
    )
    expected = base.count()
    path = _fresh_table_dir("streampart")
    os.makedirs(path, exist_ok=True)
    t = TxLogTable(path)
    _append_key_slices(t, base)  # five append commits = five offset steps

    spark.dataSource.register(_txlog_partitioned_stream_source_cls())
    agg = (
        spark.readStream.format("txlogstreampart")
        .option("path", path)
        .load()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
                ).cast("long")
                % 1000003
            ).alias("fp"),
            dsum(F.col("o_totalprice"), 2).alias("total"),
        )
    )
    sink = f"txlog_part_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir()
    q = pinned_start(
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
    )
    try:
        done = None
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                done = spark.table(sink).agg(F.sum("n")).first()[0]
            except AnalysisException:
                done = None
            if done == expected:
                break
            time.sleep(0.1)  # poll granularity: half the old 0.5 s wait tail (round 16)
        else:
            raise RuntimeError(f"txlog stream incomplete: {done}/{expected} rows")
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink)


@register(
    "q_txlog_clone",
    oracle=f"""
        WITH {_BOUNDS_CTE},
        base AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM v1, del
            WHERE o_orderkey NOT BETWEEN dlo AND dhi
        ),
        diverged AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM base
            UNION ALL
            SELECT o_orderkey + 2 * (SELECT max(o_orderkey) + 1 FROM orders),
                   'Z', o_totalprice + 2.25
            FROM orders WHERE o_orderkey % 41 = 0
        ),
        both_sides AS (
            SELECT 'source' AS side, * FROM base
            UNION ALL
            SELECT 'clone' AS side, * FROM diverged
        )
        SELECT side, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                             AS BIGINT) % 1000003) AS BIGINT) AS fp,
               {dsum_sql('o_totalprice', 2)} AS total
        FROM both_sides
        GROUP BY side, o_orderstatus
    """,
    doc=(
        "ZERO-COPY SHALLOW CLONE (round 11 — the Delta CLONE shape, "
        "the dev/test-sandbox primitive of every lakehouse): after "
        "create/append/delete, clone_to writes ONE commit whose adds "
        "reference the source's live files by absolute path — O(live "
        "files) metadata, zero data bytes moved — then the clone "
        "DIVERGES with its own append (status-Z rows keyed past both "
        "ranges) while the source stays untouched. The rollup reads "
        "BOTH sides: the source side must equal the plain post-delete "
        "state (cloning mutated nothing) and the clone side that state "
        "plus exactly the divergence rows — a shared-file read error "
        "or a log bleed in either direction breaks the hash. Log "
        "independence, the zero-copy property (no parquet in the "
        "clone dir before divergence), and vacuum safety are pinned "
        "in tests/test_txlog.py. At 100 TB clone cost is the metadata "
        "commit; the divergent delta is the only storage the clone "
        "ever owns."
    ),
    tags=("source", "maintenance", "txlog"),
)
def q_txlog_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, _counters, _dlo, _dhi = _scenario(spark, sf_dir)
    c = t.clone_to(_fresh_table_dir("clone"))
    base = _orders_base(spark, sf_dir)
    hi = base.agg(F.max("o_orderkey")).first()[0]
    divergence = base.filter(F.col("o_orderkey") % 41 == 0).select(
        (F.col("o_orderkey") + 2 * (int(hi) + 1)).alias("o_orderkey"),
        "o_custkey",
        F.lit("Z").alias("o_orderstatus"),
        (F.col("o_totalprice") + 2.25).alias("o_totalprice"),  # dyadic
    )
    c.append(spark, divergence, _STATS_COLS)
    src = _rollup(t.read(spark)).withColumn("side", F.lit("source"))
    cl = _rollup(c.read(spark)).withColumn("side", F.lit("clone"))
    return src.unionByName(cl).select("side", "o_orderstatus", "n", "fp", "total")
