#!/usr/bin/env python
"""Pin the BPE trainer's cost curve past the bench's 16 merges
(VERDICT r6 ask #3): one measured n_merges=256 run per variant —
classic (batch=1), batch_merges at larger budgets, and sample-fit —
recording wall seconds, driver rounds actually taken, and effective
rules/round. The 32k-vocab production posture (train on a sample,
large batch, or accept tokenizer training as a non-Spark-shaped job)
was documented but unmeasured; this makes it a numbers-backed
recommendation in docs/SCALE.md.

Usage: python tools/bench_bpe_curve.py [--n-merges 256]
           [--variants classic,b8,b16,b32,sample5_b8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from myodish_peak_analysis_spark.llm import bpe  # noqa: E402
from myodish_peak_analysis_spark.schema import read_table  # noqa: E402
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-merges", type=int, default=256)
    ap.add_argument(
        "--variants", type=str, default="classic,b8,b16,b32,sample5_b8"
    )
    args = ap.parse_args()

    spark = get_spark("bench-bpe-curve")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    docs = read_table(spark, SF_DIR, "documents").repartition(par).cache()
    n_docs = docs.count()

    variants = {
        "classic": (docs, 1),
        "b8": (docs, 8),
        "b16": (docs, 16),
        "b32": (docs, 32),
        "sample5_b8": (docs.filter(F.col("doc_id") % 5 == 0), 8),
    }
    for name in args.variants.split(","):
        fit, batch = variants[name]
        stats: dict = {}
        t0 = time.time()
        merges, final = bpe._bpe_run(
            fit, n_merges=args.n_merges, batch_merges=batch, stats=stats
        )
        sec = time.time() - t0
        final.unpersist()
        rounds = stats["rounds"]
        print(
            json.dumps(
                {
                    "metric": f"bpe_curve:{name}",
                    "value": round(sec, 2),
                    "unit": "sec",
                    "n_merges": len(merges),
                    "rounds": rounds,
                    "rules_per_round": round(len(merges) / rounds, 2),
                    "sec_per_round": round(sec / rounds, 3),
                    "n_docs": n_docs,
                    "sf_dir": SF_DIR,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
