"""PQ recall-vs-corpus-size curve (VERDICT r8 #1 scale evidence).

Measures recall@10 of BOTH product-quantization operating points as
the corpus grows, using the exact integer-micro arithmetic the
registered queries run (the Spark plans are oracle-hash-proven; this
probe answers the orthogonal question — does the QUALITY hold as data
grows, the metric that regressed 0.90 -> 0.66 for the untrained tier
in r8):

* untrained: 4x16-dim, 16-entry data-sampled codebooks, FIXED
  100-element ADC shortlist (q_knn_pq);
* trained:   8x8-dim, 64-entry Lloyd-trained codebooks (3 iterations,
  512-vector sample), shortlist = max(100, ceil(N/8)) (q_knn_pq_trained).

Corpus growth model: replica r's vectors are the originals with
components circularly rolled by r — norm- and distribution-preserving
but genuinely different directions (verbatim copies would make every
exact top-10 a list of the anchor's own clones and recall vacuous).

Usage: python tools/curve_pq_recall.py [multipliers...]  (default 1 4 10)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1/embeddings.parquet"


def load_corpus(mult: int) -> np.ndarray:
    t = pq.read_table(SRC).to_pandas()
    base = np.stack([np.asarray(v, dtype=np.float64) for v in t.embedding])
    base = base[np.argsort(t.vec_id.values)]
    return np.concatenate([np.roll(base, r, axis=1) for r in range(mult)])


def micros(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def lloyd(train: np.ndarray, m: int, d: int, k: int, iters: int) -> list[np.ndarray]:
    cents = [train[:k, s * d : (s + 1) * d].copy() for s in range(m)]
    for _ in range(iters):
        for s in range(m):
            x = train[:, s * d : (s + 1) * d]
            c = cents[s]
            cost = (c * c).sum(1)[None, :] - 2 * (x @ c.T)
            a = cost.argmin(1)
            new = c.copy()
            for j in range(len(c)):
                mem = x[a == j]
                if len(mem):
                    new[j] = np.floor(mem.sum(0).astype("float64") / len(mem)).astype("int64")
            cents[s] = new
    return cents


def recall(v: np.ndarray, m: int, d: int, k: int, train_n: int, iters: int,
           sl_fixed: int | None, sl_div: int | None) -> float:
    n = len(v)
    vm = micros(v)
    cents = lloyd(vm[: min(train_n, n)], m, d, k, iters)
    codes = np.zeros((n, m), dtype=np.int64)
    for s in range(m):
        x = vm[:, s * d : (s + 1) * d]
        c = cents[s]
        codes[:, s] = ((c * c).sum(1)[None, :] - 2 * (x @ c.T)).argmin(1)
    sl = sl_fixed if sl_fixed else max(100, -(-n // sl_div))
    hits = []
    for a_id in range(5):
        tabs = [vm[a_id, s * d : (s + 1) * d] @ cents[s].T for s in range(m)]
        adc = sum(tabs[s][codes[:, s]] for s in range(m)).astype(np.float64)
        adc[a_id] = -np.inf
        shortlist = np.argsort(-adc, kind="stable")[:sl]
        exact = v @ v[a_id]
        exact[a_id] = -np.inf
        top10 = set(np.argsort(-exact, kind="stable")[:10])
        rr = shortlist[np.argsort(-exact[shortlist], kind="stable")[:10]]
        hits.append(len(top10 & set(rr)) / 10)
    return round(float(np.mean(hits)), 3)


def ivfpq_recall(
    v: np.ndarray, m: int = 8, d: int = 8,
    k: int = 64, iters: int | None = None, sl_div: int = 8,
) -> tuple[float, float, dict]:
    """Recall@10 and mean corpus fraction ADC-scanned for the IVFPQ
    tier (q_knn_ivfpq's exact integer arithmetic, with the r10
    corpus-derived nlist/nprobe/train from _ivfpq_params). Matmuls
    run in float64 for BLAS speed — every product is < 2^53, so the
    results are integer-exact."""
    from benchmark_spark.llm.similarity import _IVFPQ_ITERS, _ivfpq_params

    if iters is None:
        iters = _IVFPQ_ITERS  # whatever the registered query runs
    n = len(v)
    nlist, nprobe, train_n = _ivfpq_params(n)
    vm = micros(v)
    vf = vm.astype(np.float64)
    # coarse quantizer over FULL vectors: reuse lloyd with one subspace
    coarse = lloyd(vm[: min(train_n, n)], 1, 64, nlist, iters)[0]
    cf = coarse.astype(np.float64)
    lists_ = ((cf * cf).sum(1)[None, :] - 2 * (vf @ cf.T)).argmin(1)
    resid = vm - coarse[lists_]
    cents = lloyd(resid[: min(train_n, n)], m, d, k, iters)
    codes = np.zeros((n, m), dtype=np.int64)
    for s in range(m):
        x = resid[:, s * d : (s + 1) * d].astype(np.float64)
        c = cents[s].astype(np.float64)
        codes[:, s] = ((c * c).sum(1)[None, :] - 2 * (x @ c.T)).argmin(1)
    sl = max(100, -(-n // sl_div))
    params = {"nlist": nlist, "nprobe": nprobe, "train": train_n, "shortlist": sl}
    hits, scanned = [], []
    for a in range(5):
        cd = vm[a] @ coarse.T
        probe = np.argsort(-cd, kind="stable")[:nprobe]
        cand = np.where(np.isin(lists_, probe))[0]
        cand = cand[cand != a]
        scanned.append(len(cand) / n)
        tabs = [vm[a, s * d : (s + 1) * d] @ cents[s].T for s in range(m)]
        adc = (coarse[lists_[cand]] @ vm[a]).astype(np.float64)
        adc = adc + sum(tabs[s][codes[cand, s]] for s in range(m))
        order = cand[np.argsort(-adc, kind="stable")[:sl]]
        ex = v @ v[a]
        ex[a] = -np.inf
        top10 = set(np.argsort(-ex, kind="stable")[:10])
        rr = order[np.argsort(-ex[order], kind="stable")[:10]]
        hits.append(len(top10 & set(rr)) / 10)
    return (
        round(float(np.mean(hits)), 3),
        round(float(np.mean(scanned)), 3),
        params,
    )


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    out = {}
    for mult in mults:
        v = load_corpus(mult)
        untrained = recall(v, 4, 16, 16, 16, 0, sl_fixed=100, sl_div=None)
        trained = recall(v, 8, 8, 64, 512, 3, sl_fixed=None, sl_div=8)
        ivf_r, ivf_scan, ivf_params = ivfpq_recall(v)
        out[f"x{mult}"] = {
            "vectors": len(v),
            "untrained_fixed_sl": untrained,
            "trained_proportional_sl": trained,
            "ivfpq_recall10": ivf_r,
            "ivfpq_scan_frac": ivf_scan,
            "ivfpq_params": ivf_params,
        }
        print(json.dumps({"scale": f"x{mult}", **out[f"x{mult}"]}), flush=True)
    print(json.dumps({"metric": "pq_recall_curve", "base": "sf0.1", "curves": out}))


if __name__ == "__main__":
    main()
