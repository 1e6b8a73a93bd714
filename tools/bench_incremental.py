#!/usr/bin/env python
"""Measured decade for incremental_corpus_manifest (round 13): the
100 TB claim is cost ∝ |diff| + metadata-sized global stages, not
∝ |corpus| — a nightly run over an almost-unchanged corpus must pay
per-document work only for the docs the diff touches, while the full
rebuild pays for everything.

Method: replicate the sf0.1 documents table K× with the same
bijective-token-prefix scheme the docs scaling family uses
(tools/bench_scaling._replicate_docs — preserves in-copy near-dup
structure, kills cross-copy Jaccard), prefit the manifest state, then
for each diff fraction f build a snapshot where a deterministic ~f of
docs are modified (text || ' vnew') and time:

  * incremental_corpus_manifest(new, state)  — the nightly path;
  * training_corpus_manifest(new)            — the rebuild baseline.

One JSON line per (K, f) with both times and the ratio.

Isolation discipline (every clause below was a MEASURED failure mode
of this tool's first cut, stage-metrics attribution in docs/PLANS.md
"Round-13"):

* Each (K, f) cell runs in its OWN SUBPROCESS (the ab_trees
  discipline). In-process cells degraded monotonically — the
  identical rebuild read 45 s in cell 1 and 128 s in cell 5 of one
  run — and the operators' by-design persists (package cache
  contract) let a later cell take warm CacheManager plan-matches from
  an earlier cell with the same predicate (a repeated f=1.0 cell read
  8.7 s against an honest ~20 s).
* Inside a cell, the replicated corpus is REPARTITIONED to
  defaultParallelism before persist: the sf0.1 parquet is one input
  split and explode/withColumn preserve partitioning, so without this
  the rebuild's signature map stage runs as ONE task while the
  incremental path gets re-spread by its digest join's shuffle — a
  32× parallelism artifact that inflated the first recorded ratio.
* Each cell runs an untimed k=1 warmup of both paths first (JIT/
  codegen; measured ~2-4× on whichever path otherwise ran first).

Usage: python tools/bench_incremental.py [--factors 10] [--fracs
           0.01,0.1,1.0] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_cell(k: int, frac: float, sf_dir: str) -> None:
    """One (K, frac) measurement, printed as a JSON line. Meant to run
    in a fresh interpreter (see module docstring)."""
    from pyspark.sql import functions as F

    from myodish_peak_analysis_spark.llm import curate
    from myodish_peak_analysis_spark.schema import read_table
    from myodish_peak_analysis_spark.session import get_spark
    from tools.bench_scaling import _replicate_docs

    spark = get_spark("bench-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, sf_dir, "documents")

    # untimed JIT/codegen warmup of both paths at toy scale
    wdocs = base.limit(500).persist()
    wdocs.count()
    wstate = curate.manifest_prefit_state(wdocs)
    _force(curate.incremental_corpus_manifest(wdocs, wstate))
    _force(curate.training_corpus_manifest(wdocs))
    spark.catalog.clearCache()

    docs = (
        _replicate_docs(base, k)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    n = docs.count()
    t0 = time.time()
    state = curate.manifest_prefit_state(docs)
    t_prefit = round(time.time() - t0, 3)
    # select ~frac of docs: % mod == mod-1 (NOT == 1, which at mod=1 —
    # the frac=1.0 cell — would select NOTHING)
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10")
    ap.add_argument("--fracs", default="0.01,0.1,1.0")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--cell",
        nargs=2,
        metavar=("K", "FRAC"),
        help="internal: run exactly one (K, FRAC) cell in-process",
    )
    args = ap.parse_args()

    if args.cell:
        run_cell(int(args.cell[0]), float(args.cell[1]), args.sf_dir)
        return

    for k in [int(x) for x in args.factors.split(",")]:
        for frac in [float(x) for x in args.fracs.split(",")]:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--cell",
                    str(k),
                    str(frac),
                    "--sf-dir",
                    args.sf_dir,
                ],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            emitted = False
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    emitted = True
            if not emitted:
                print(
                    json.dumps(
                        {
                            "op": "incremental_manifest",
                            "k": k,
                            "diff_frac": frac,
                            "error": proc.stderr[-500:],
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
