"""Planted-cluster validation curves (round 12, VERDICT r11 #4).

Every cluster-structured operator was validated only on the
near-uniform unit-sphere embeddings, where there is no structure to
recover (SCALE.md: k-center radius there ~ chance). This probe
measures the operators on the DERIVED planted mixture
(llm/selection.py planted_vm: 8 well-separated centers + 0.5-scaled
noise, 10% unclustered shell at 1.5x) and reports recovery:

* k-center      — the REGISTERED q_kcenter_planted trajectory vs the
                  raw-table q_coreset_kcenter twin (label coverage,
                  selection-distance plateau, covering radius);
* SemDeDup      — the REGISTERED q_semdedup run over a materialized
                  planted embeddings table vs the raw table (dup-rate
                  must jump: same-cluster pairs are semantic dups);
* DBSCAN        — the REGISTERED q_dbscan_grid over a 2-D variant of
                  the mixture: the operator reads dims 0-1 only and
                  the canonical one-hot centers are indistinguishable
                  in any 2-plane, so the SAME labels are laid onto a
                  circle of 2-D centers inside the committed eps's
                  density regime — class counts must show dense core
                  blobs and the sparse noise shell;
* IVFPQ recall  — tools/curve_pq_recall.ivfpq_recall (the exact
                  integer-micro replay of q_knn_ivfpq) on planted vs
                  raw vectors.

The planted table is materialized into .scratch/planted_curve/ as a
full sf_dir (other tables symlinked), so the registered query
functions run UNCHANGED. Usage:

    python tools/curve_planted.py [src_sf_dir]   # default sf0.01

Prints one JSON line (recorded in SCALE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from curve_pq_recall import ivfpq_recall  # noqa: E402

from benchmark_spark.registry import all_specs  # noqa: E402
from benchmark_spark.session import get_spark  # noqa: E402


def planted_arrays(src: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(vec_ids, planted float64 vectors, labels) — the numpy twin of
    llm/selection.planted_vm's derivation (pre-snap doubles)."""
    t = pq.read_table(os.path.join(src, "embeddings.parquet")).to_pandas()
    order = np.argsort(t.vec_id.values)
    ids = t.vec_id.values[order]
    raw = np.stack([np.asarray(v, dtype=np.float64) for v in t.embedding])[order]
    center = np.where(
        (ids[:, None] % 10 != 9) & (np.arange(64)[None, :] % 8 == ids[:, None] % 8),
        1.0,
        0.0,
    )
    scale = np.where(ids % 10 == 9, 1.5, 0.5)[:, None]
    labels = np.where(ids % 10 == 9, -1, ids % 8)
    return ids, center + scale * raw, labels


def materialize(src: str, vecs: np.ndarray, ids: np.ndarray, labels: np.ndarray,
                name: str) -> str:
    """Write a planted sf_dir: embeddings.parquet replaced, every other
    table symlinked from src."""
    out = os.path.join(REPO, ".scratch", "planted_curve", name)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for f in os.listdir(src):
        if f != "embeddings.parquet":
            os.symlink(os.path.join(src, f), os.path.join(out, f))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))
    return out


def main() -> None:
    # abspath: symlink targets resolve against the LINK's directory, so
    # a relative src would create broken links (round-12 review finding)
    src = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
    ids, planted, labels = planted_arrays(src)
    by_id = dict(zip(ids.tolist(), labels.tolist()))
    planted_dir = materialize(src, planted, ids, labels, "x1")
    # DBSCAN reads dims 0-1 only, and the canonical one-hot centers are
    # indistinguishable in ANY 2-plane (6 of 8 project onto the origin).
    # The DBSCAN variant lays the SAME labels onto a circle of 2-D
    # centers (radius 0.1, the committed eps's density regime: blob
    # spread 0.005 << eps 0.02 << center gaps ~0.077) with the 10%
    # shell as 0.4-scaled raw noise spread over the circle's region
    # (unit-norm inputs have per-dim std 1/8, so 0.4x gives 2-D std 0.05
    # ~ sparse at eps=0.02 while blobs at spread 0.005 stay dense).
    t2 = pq.read_table(os.path.join(src, "embeddings.parquet")).to_pandas()
    raw2 = np.stack([np.asarray(v, dtype=np.float64) for v in t2.embedding])[
        np.argsort(t2.vec_id.values)
    ]
    ang = 2 * np.pi * np.where(labels < 0, 0, labels) / 8.0
    db = raw2 * 0.0
    clustered = labels >= 0
    db[:, 0] = np.where(clustered, 0.1 * np.cos(ang) + 0.01 * raw2[:, 0],
                        0.4 * raw2[:, 0])
    db[:, 1] = np.where(clustered, 0.1 * np.sin(ang) + 0.01 * raw2[:, 1],
                        0.4 * raw2[:, 1])
    dbscan_dir = materialize(src, db, ids, labels, "circle2d")

    spark = get_spark("curve-planted", shuffle_partitions=8)
    specs = all_specs()
    out: dict = {"src": src, "n": int(len(ids))}

    # --- k-center: registered planted query vs raw twin ---
    traj = specs["q_kcenter_planted"].fn(spark, src).collect()
    raw_traj = specs["q_coreset_kcenter"].fn(spark, src).collect()
    out["kcenter"] = {
        "labels_in_order": [int(r["label"]) for r in traj],
        "distinct_labels": len({r["label"] for r in traj}),
        "sel_r_micro": [int(r["sel_d2"]) ** 0.5 for r in traj][1:],
        "final_r": round(traj[0]["final_r2"] ** 0.5 / 1e6, 3),
        "raw_final_r": round(raw_traj[0]["final_r2"] ** 0.5 / 1e6, 3),
        "raw_sel_r": [round(int(r["sel_d2"]) ** 0.5 / 1e6, 3) for r in raw_traj][1:],
    }
    out["kcenter"]["sel_r"] = [round(x / 1e6, 3) for x in out["kcenter"].pop("sel_r_micro")]

    # --- SemDeDup dup-rate: planted vs raw ---
    def dup_rate(sf_dir: str) -> float:
        rows = specs["q_semdedup"].fn(spark, sf_dir).collect()
        return round(sum(r["is_dup"] for r in rows) / len(rows), 3)

    out["semdedup_dup_rate"] = {"planted": dup_rate(planted_dir), "raw": dup_rate(src)}

    # --- DBSCAN class counts: rescaled planted vs raw ---
    def classes(sf_dir: str) -> dict:
        rows = specs["q_dbscan_grid"].fn(spark, sf_dir).collect()
        c: dict = {}
        for r in rows:
            c[r["cls"]] = c.get(r["cls"], 0) + 1
        return c

    planted_cls = specs["q_dbscan_grid"].fn(spark, dbscan_dir).collect()
    counts: dict = {}
    noise_from_shell = 0
    for r in planted_cls:
        counts[r["cls"]] = counts.get(r["cls"], 0) + 1
        if r["cls"] == "noise" and by_id.get(r["vec_id"]) == -1:
            noise_from_shell += 1
    shell_total = int((labels < 0).sum())
    out["dbscan"] = {
        "planted_circle2d": counts,
        "noise_rows_from_shell": noise_from_shell,
        "shell_rows": shell_total,
        "raw": classes(src),
    }

    # --- IVFPQ recall: planted vs raw vectors ---
    t = pq.read_table(os.path.join(src, "embeddings.parquet")).to_pandas()
    raw = np.stack([np.asarray(v, dtype=np.float64) for v in t.embedding])[
        np.argsort(t.vec_id.values)
    ]
    for tag, v in (("raw", raw), ("planted", planted)):
        r, frac, params = ivfpq_recall(v)
        out.setdefault("ivfpq", {})[tag] = {
            "recall_at_10": r, "scanned_frac": frac, **params,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
