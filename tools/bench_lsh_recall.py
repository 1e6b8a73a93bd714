#!/usr/bin/env python
"""Measured recall/latency for the multi-probe LSH knob (VERDICT r5
ask #9): single-probe vs ``multi_probe=1`` at EQUAL plane counts,
against the brute-force cosine top-k ground truth, at
$SPARK_GRAFT_SF_DIR (default sf0.1).

Recall@k counts a retrieved (query, vec) pair as a hit when it appears
in the query's true cosine top-k (rank ties broken identically in both
paths: cosine desc, vec_id). Prints one JSON line per setting;
docs/SCALE.md records the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from myodish_peak_analysis_spark.llm import similarity  # noqa: E402
from myodish_peak_analysis_spark.schema import read_table  # noqa: E402
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10


def main() -> None:
    spark = get_spark("bench-lsh-recall")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    emb = read_table(spark, SF_DIR, "embeddings").repartition(par).cache()
    emb.count()

    truth = (
        similarity.cosine_topk(emb, k=K)
        .select("query_id", "vec_id")
        .cache()
    )
    n_truth = truth.count()

    for probe in (0, 1):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df = similarity.lsh_topk(emb, k=K, n_planes="auto", multi_probe=probe)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        got = similarity.lsh_topk(
            emb, k=K, n_planes="auto", multi_probe=probe
        ).select("query_id", "vec_id")
        hits = got.join(truth, ["query_id", "vec_id"]).count()
        print(
            json.dumps(
                {
                    "metric": f"lsh_recall@{K}:multi_probe={probe}",
                    "value": round(hits / n_truth, 4),
                    "unit": "recall",
                    "sec": round(best, 3),
                    "pairs_returned": got.count(),
                    "truth_pairs": n_truth,
                    "sf_dir": SF_DIR,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
