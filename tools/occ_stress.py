#!/usr/bin/env python3
"""Multi-PROCESS OCC stress for the transaction log (VERDICT r10 #6).

The in-process concurrent-writer pins (tests/test_txlog.py, commit
7d4cc54) exercise the optimistic-concurrency protocol under Python
threads — but the atomicity claim is `os.link` + `os.unlink` FAILING
when the version slot exists, which is a KERNEL guarantee that only
means something across separate processes (threads share the CPython
GIL and an fd table; a cluster's concurrent writers do not). This
probe drives N independent worker PROCESSES (spawn, no shared interpreter
state) each publishing M append commits against ONE table directory
and then checks the only three facts that matter:

  1. no lost update — every one of the N*M adds is live in the final
     snapshot (a torn/overwritten version file would drop one);
  2. no duplicate or skipped version — the log is exactly the
     contiguous range 0..N*M-1, one commit file per version;
  3. every version file parses and carries exactly one worker's
     actions — no interleaved/partial JSON (fsync-before-link means a
     reader never observes a half-written commit).

A second phase stresses the CONFLICT path: all N processes race to
remove the SAME live file; exactly one must win, the rest must raise
ConcurrentModification (the lost-update guard), never CommitConflict
retry-loops that silently re-commit stale removes.

Usage: python tools/occ_stress.py [N_workers] [M_commits]
Defaults 8 x 25 = 200 contended commits. Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys

sys.path.insert(0, "/root/repo")

from benchmark_spark.sources.txlog import ConcurrentModification, TxLogTable


def append_worker(args: tuple[str, int, int]) -> int:
    path, wid, m = args
    t = TxLogTable(path)
    for j in range(m):
        # high retry budget: with N processes racing, a worker can lose
        # many consecutive slots; the protocol's liveness is retry-based
        t.commit(
            [{"add": f"w{wid:02d}-{j:04d}.parquet", "rows": 1}],
            op="append",
            retries=500,
        )
    return wid


def remove_worker(args: tuple[str, int]) -> str:
    path, wid = args
    t = TxLogTable(path)
    try:
        t.commit(
            [{"remove": "contested.parquet"},
             {"add": f"rewrite-by-w{wid:02d}.parquet", "rows": 1}],
            op="rewrite",
            retries=500,
        )
        return "won"
    except ConcurrentModification:
        return "conflict"


def main() -> None:
    import tempfile

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    ctx = mp.get_context("spawn")  # real separate processes, cold state

    with tempfile.TemporaryDirectory() as d:
        table = TxLogTable(d)
        with ctx.Pool(n) as pool:
            pool.map(append_worker, [(d, w, m) for w in range(n)])
        versions = table.versions()
        adds = {a["add"] for a in table.snapshot_adds()}
        expected = {f"w{w:02d}-{j:04d}.parquet" for w in range(n) for j in range(m)}
        lost = sorted(expected - adds)
        contiguous = versions == list(range(n * m))
        one_worker_per_commit = all(
            len({a["add"].split("-")[0] for c in [table._read_commit(v)]
                 for a in c["actions"]}) == 1
            for v in versions
        )

    with tempfile.TemporaryDirectory() as d:
        table = TxLogTable(d)
        table.commit([{"add": "contested.parquet", "rows": 1}], op="append")
        with ctx.Pool(n) as pool:
            outcomes = pool.map(remove_worker, [(d, w) for w in range(n)])
        winners = outcomes.count("won")
        final = {a["add"] for a in table.snapshot_adds()}

    result = {
        "metric": "txlog_occ_multiprocess",
        "workers": n,
        "commits_per_worker": m,
        "contended_commits": n * m,
        "lost_updates": len(lost),
        "versions_contiguous": contiguous,
        "single_writer_per_version": one_worker_per_commit,
        "remove_race_winners": winners,
        "remove_race_conflicts": outcomes.count("conflict"),
        "contested_file_still_live": "contested.parquet" in final,
        "ok": (
            not lost and contiguous and one_worker_per_commit
            and winners == 1 and "contested.parquet" not in final
        ),
    }
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
