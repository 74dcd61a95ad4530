#!/usr/bin/env python3
"""End-to-end 100 TB table-ownership walkthrough.

Chains the maintenance operators the way a nightly table-owner job
does — each stage is a registered, oracle-checked query, so this
script is wiring, not logic:

    raw ingest (with damage)
      -> quarantine malformed records       (q_corrupt_ingest)
      -> data-quality gate before publish   (q_dq_checks)
      -> derive the changelog vs yesterday  (q_snapshot_diff)
      -> apply the log, latest state        (q_latest_snapshot)
      -> compact small files                (q_compaction)
      -> re-cluster for 2-D scans           (q_zorder_layout)
      -> refresh optimizer statistics       (q_profile, q_equidepth_hist)

Run: python examples/table_maintenance.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmark_spark.registry import get_query
from benchmark_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("table-maintenance", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest: parse what parses, quarantine what doesn't
    ingest = get_query("q_corrupt_ingest").fn(spark, sf_dir).collect()[0]
    print(f"ingest: {ingest['n_good']} rows parsed, "
          f"{ingest['n_corrupt']} quarantined for replay")

    # 2. quality gate: publish only if the expectation suite is clean
    checks = get_query("q_dq_checks").fn(spark, sf_dir).collect()
    for c in checks:
        print(f"  dq {c['check_name']:>18}: {c['violations']} violations")
    blocking = [c for c in checks
                if c["violations"] > 0 and c["check_name"] != "date_out_of_range"]
    print(f"quality gate: {'BLOCKED' if blocking else 'clean'} "
          f"(date_out_of_range is a warn-level check here)")

    # 3. what changed since the last snapshot? (CDC derivation)
    diff = get_query("q_snapshot_diff").fn(spark, sf_dir).collect()
    census = {r["change_type"]: r["n"] for r in diff}
    print(f"changelog: {census}")

    # 4. current state = base + change batches, last writer wins
    latest = get_query("q_latest_snapshot").fn(spark, sf_dir).collect()
    print(f"compacted log: {sum(r['n'] for r in latest)} live keys, "
          f"{sum(r['version_total'] for r in latest)} superseded versions applied")

    # 5. physical maintenance: fewer files, better clustering
    comp = get_query("q_compaction").fn(spark, sf_dir)
    print(f"file compaction fingerprint rows: {comp.count()} (content preserved)")
    z = get_query("q_zorder_layout").fn(spark, sf_dir).collect()[0]
    print(f"z-order rewrite: box query answered from the re-clustered table "
          f"({z['n']} rows, fingerprint {z['key_fp']})")

    # 5b. release gates: privacy risk + catalog reconciliation
    ka = get_query("q_k_anonymity").fn(spark, sf_dir).collect()[0]
    print(f"k-anonymity: actual k = {ka['min_group_size']} "
          f"({ka['rows_at_risk']} rows in classes below k=5)")
    fz = get_query("q_fuzzy_join").fn(spark, sf_dir)
    n_match = fz.count()
    print(f"catalog reconciliation: {n_match} damaged names re-matched "
          f"by trigram Jaccard")

    # 6. statistics refresh for the optimizer / skew report
    prof = get_query("q_profile").fn(spark, sf_dir).collect()
    for p in prof:
        print(f"  stats {p['col']:>14}: n={p['n']} distinct={p['n_distinct']} "
              f"range=[{p['min_v']:.2f}, {p['max_v']:.2f}]")
    hist = get_query("q_equidepth_hist").fn(spark, sf_dir).collect()
    print(f"equi-depth deciles: {[round(r['hi'], 0) for r in hist]}")

    spark.stop()


if __name__ == "__main__":
    main()
