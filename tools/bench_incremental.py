#!/usr/bin/env python
"""Measured decade for incremental_corpus_manifest (round 13): the
100 TB claim is cost ∝ |diff|, not |corpus| — a nightly run over an
almost-unchanged corpus must pay per-document work only for the docs
the diff touches, while the full rebuild pays for everything.

Method: replicate the sf0.1 documents table K× with the same
bijective-token-prefix scheme the docs scaling family uses
(tools/bench_scaling._replicate_docs — preserves in-copy near-dup
structure, kills cross-copy Jaccard), prefit the manifest state once,
then for each diff fraction f build a snapshot where a deterministic
~f of docs are modified (text || ' vNEW') and time:

  * incremental_corpus_manifest(new, state)  — the nightly path;
  * training_corpus_manifest(new)            — the rebuild baseline.

One JSON line per (K, f) with both times and the ratio. Healthy shape:
incremental time RISES with f and sits well under the rebuild at
small f; at f=1.0 the incremental path degenerates to the rebuild
plus diff overhead (every doc is "changed") — that's the honest upper
bound, not a regression.

Usage: python tools/bench_incremental.py [--factors 10] [--fracs
           0.01,0.1,1.0] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from myodish_peak_analysis_spark.llm import curate  # noqa: E402
from myodish_peak_analysis_spark.schema import read_table  # noqa: E402
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402
from tools.bench_scaling import _replicate_docs  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10")
    ap.add_argument("--fracs", default="0.01,0.1,1.0")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("bench-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, args.sf_dir, "documents")

    for k in [int(x) for x in args.factors.split(",")]:
        docs = _replicate_docs(base, k).persist()
        n = docs.count()
        t0 = time.time()
        state = curate.manifest_prefit_state(docs)
        t_prefit = round(time.time() - t0, 3)
        for frac in [float(x) for x in args.fracs.split(",")]:
            # select ~frac of docs: % mod == mod-1 (NOT == 1, which at
            # mod=1 — the frac=1.0 cell — would select NOTHING)
            mod = max(1, round(1.0 / frac))
            changed_pred = F.col("doc_id") % mod == mod - 1
            new = docs.withColumn(
                "text",
                F.when(
                    changed_pred, F.concat(F.col("text"), F.lit(" vnew"))
                ).otherwise(F.col("text")),
            ).persist()
            n_changed = new.filter(changed_pred).count()
            t0 = time.time()
            _force(curate.incremental_corpus_manifest(new, state))
            t_inc = round(time.time() - t0, 3)
            t0 = time.time()
            _force(curate.training_corpus_manifest(new))
            t_full = round(time.time() - t0, 3)
            new.unpersist()
            print(
                json.dumps(
                    {
                        "op": "incremental_manifest",
                        "k": k,
                        "n_docs": n,
                        "diff_frac": frac,
                        "n_changed": n_changed,
                        "prefit_sec": t_prefit,
                        "incremental_sec": t_inc,
                        "rebuild_sec": t_full,
                        "speedup": round(t_full / t_inc, 2) if t_inc else None,
                    }
                ),
                flush=True,
            )
        curate.release_manifest_state(state)
        docs.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
