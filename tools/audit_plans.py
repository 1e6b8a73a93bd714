#!/usr/bin/env python
"""Whole-surface plan audit: build the physical plan of EVERY
registered ``queries()`` entry at sf0.01 and tabulate the shape
signals that matter at 100 TB — exchange count, broadcast joins,
cartesian products (must be 0), Python-eval stages (must be 0 outside
the explicitly-fidelity routes), and TakeOrdered usage.

Writes a markdown table to stdout; redirect into docs/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Arrow/pandas stages are allowed ONLY where they are the design:
# the reference-exact fidelity twins (applyInPandas), the sparse
# candidate-suppression step of the constrained peak family, the
# multimodal decode plumbing, the WARC byte-walk (round 12), and the
# HTML text extraction over crawl response bodies (round 13: entity
# tables + a real HTML tokenizer are not JVM-expressible) —
# mapInPandas/pandas_udf over opaque binary columns, the places a JVM
# expression genuinely cannot express the work. Every other query
# must be Python-free.
PYTHON_ALLOWED = {"fidelity_peaks", "fidelity_signal", "native_find_peaks",
                  "native_find_peaks_nodist", "constrained_peak_attributes",
                  "peak_interval_stats", "media_metadata",
                  "audio_metadata", "video_metadata", "warc_roundtrip",
                  "warc_extract_text", "crawl_corpus"}


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    violations = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            violations.append(f"{name}: failed to plan ({exc})")
            continue
        # "Exchange" substring-matches BroadcastExchange and
        # ReusedExchange too — subtract both so the column counts only
        # real shuffle materializations.
        n_ex = (
            plan.count("Exchange")
            - plan.count("BroadcastExchange")
            - plan.count("ReusedExchange")
        )
        n_bc = plan.count("BroadcastHashJoin") + plan.count(
            "BroadcastNestedLoopJoin"
        )
        n_cart = plan.count("CartesianProduct")
        # Spark's Python-execution nodes are BatchEvalPython /
        # ArrowEvalPython (scalar UDFs) and *InPandas (grouped/map
        # Arrow) — "EvalPython" + "InPandas" covers all of them;
        # the old "PythonEval" substring matched NONE.
        n_py = plan.count("EvalPython") + plan.count("InPandas")
        n_tko = plan.count("TakeOrderedAndProject")
        n_ims = plan.count("InMemoryTableScan")
        rows.append((name, n_ex, n_bc, n_cart, n_py, n_tko, n_ims))
        if n_cart:
            violations.append(f"{name}: CartesianProduct")
        if n_py and name not in PYTHON_ALLOWED:
            violations.append(f"{name}: unexpected Python stage")
    print(
        "| query | shuffles | bcast joins | cartesian | python |"
        " takeOrdered | cache hits |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in sorted(rows):
        print("| {} | {} | {} | {} | {} | {} | {} |".format(*r))
    print()
    print(
        "NOTE: `shuffles` counts Exchange nodes in the PRINTED plan,"
        " which expands the full cached lineage under every"
        " InMemoryRelation — iterative queries (dedup_clusters, the"
        " Lloyd fits) therefore print hundreds of exchanges whose"
        " EXECUTION is an InMemoryTableScan cache hit (see the"
        " `cache hits` column); their real per-round cost is one keyed"
        " shuffle."
    )
    print()
    print(f"{len(rows)} queries audited; violations: {len(violations)}")
    for v in violations:
        print("VIOLATION:", v)
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
