"""Append-without-retrain recall curve (VERDICT r12 #2 scale evidence).

The persisted-index append path (llm/ann_index.py) encodes new vectors
against codebooks FROZEN at build time. This probe measures what that
freeze costs: recall@10 (mean in_exact10 over the anchors' top-10s,
exact top-10 always computed over the FULL corpus) for

* retrained:  q_knn_ivfpq — quantizers trained on the full corpus
              (identical to q_ann_index_probe, which shares its oracle);
* appended:   quantizers trained on the first base_frac of the corpus,
              the remainder encoded against the frozen codebooks — at
              base fractions 7/8 (the registered q_ann_index_append
              split), 3/4, and 1/2 (VERDICT r13 #2: extend the curve
              past 1/8 appended so the documented "periodic rebuild"
              gets a MEASURED trigger point);
* base-only:  the pre-append index probed alone (its recall ceiling is
              base coverage of the exact top-10 — what you'd serve if
              ingest stalled).

The 7/8 split runs the registered hash-proven q_ann_index_append plan;
the deeper splits run the same _probe_plan against indexes built with
smaller base_n (same code path, different split constant). Usage:
python tools/curve_append_recall.py [sf_dirs...]; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from benchmark_spark import registry  # noqa: E402
from benchmark_spark.llm import ann_index as ai  # noqa: E402
from benchmark_spark.session import get_spark  # noqa: E402


def recall(df) -> float:
    row = df.agg(
        F.sum("in_exact10").alias("hit"), F.count(F.lit(1)).alias("n")
    ).first()
    return round(row.hit / row.n, 4)


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("curve-append-recall", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    out = {}
    for sf in sf_dirs:
        n_all = ai._vecs(spark, sf).count()
        retrained = recall(specs["q_knn_ivfpq"].fn(spark, sf))
        splits = {}
        for num, den in ((7, 8), (3, 4), (1, 2)):
            base_n = (num * n_all) // den
            if (num, den) == (ai._BASE_NUM, ai._BASE_DEN):
                # the registered split runs the hash-proven plan
                appended = recall(specs["q_ann_index_append"].fn(spark, sf))
                path, meta = ai.build_index(spark, sf, base_n=base_n)
            else:
                path, meta = ai.build_index(spark, sf, base_n=base_n)
                path, meta = ai.append_to_index(spark, sf, path, meta)
                appended = recall(
                    ai._probe_plan(spark, sf, path, meta, with_delta=True)
                )
            base_only = recall(
                ai._probe_plan(spark, sf, path, meta, with_delta=False)
            )
            splits[f"{num}/{den}"] = {
                "base_n": base_n,
                "appended_frac": round(1 - num / den, 4),
                "recall_appended": appended,
                "recall_base_only": base_only,
            }
        out[os.path.basename(sf.rstrip("/"))] = {
            "n": n_all,
            "recall_retrained": retrained,
            "splits": splits,
        }
    print(json.dumps({"curve": "append_recall", "points": out}))


if __name__ == "__main__":
    main()
