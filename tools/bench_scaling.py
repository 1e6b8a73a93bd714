#!/usr/bin/env python
"""Scaling regression: per-row cost must stay flat as the data grows.

Two operator families, selected with ``--family``:

* ``peaks`` (default): the full native pipeline (channelize → SG
  smooth → envelopes → diastolic → threshold peaks → attributes) and
  the constrained ``native_find_peaks``, over the events table
  replicated with shifted ``user_id``s so every copy lands in fresh
  channels, channel count scaled by the rows/TARGET_CHANNEL_ROWS rule.
* ``docs`` (round 6 — the VERDICT r5 ask: the dedup/LLM operators
  carry the repo's heaviest 100 TB claims and had no measured decade):
  ``minhash_pairs``, ``dedup_clusters`` (label-prop AND star),
  ``canonical_corpus``, ``incremental_neardup`` over the documents
  table. Replication rewrites EVERY token with a copy-specific prefix
  (``c3_word``): within a copy, shingle sets map bijectively so the
  original near-dup structure is preserved exactly; across copies the
  token sets are disjoint so Jaccard ≈ 0 — a K× corpus therefore
  carries ~K× true near-dup pairs and a K× vocabulary, the shape a
  genuinely bigger crawl has. (Naive replication would make every doc
  an exact dup of its K−1 copies: K² candidate pairs, a workload no
  real corpus produces.)

Prints one JSON line per (operator, factor) and exits 1 if any K×
throughput (rows/s) falls below ``--min-ratio`` (default 0.8) of the
PREVIOUS factor's throughput — i.e. if per-row cost grew across any
decade. Fixed planning/JIT/driver-round overhead amortizes with scale,
so healthy plans show throughput RISING; a ratio under 1 by more than
the noise floor means some stage is super-linear (a single-partition
sort, a growing window partition, a driver loop, a pair blow-up).

Usage: python tools/bench_scaling.py [--family peaks|docs]
           [--factors 10,100] [--min-ratio 0.8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from myodish_peak_analysis_spark.api import PeakPipeline  # noqa: E402
from myodish_peak_analysis_spark.schema import (  # noqa: E402
    TARGET_CHANNEL_ROWS,
    read_table,
    signal_frame_from_events,
)
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _best_of_2(df: DataFrame) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def _pipeline_seconds(events: DataFrame, n_rows: int) -> float:
    """Best-of-2 wall seconds for the full pipeline over ``events``."""
    n_channels = max(1, n_rows // TARGET_CHANNEL_ROWS)
    sig = signal_frame_from_events(events, n_channels=n_channels)
    pipe = (
        PeakPipeline(sig).smooth().envelopes().diastolic().detect_peaks().attributes()
    )
    return _best_of_2(pipe)


def _find_peaks_seconds(events: DataFrame, n_rows: int) -> float:
    """Best-of-2 wall seconds for the JVM-side constrained find_peaks."""
    from myodish_peak_analysis_spark.operators.native_peaks import (
        native_find_peaks,
    )
    from myodish_peak_analysis_spark.operators.smooth import with_fir_smooth

    n_channels = max(1, n_rows // TARGET_CHANNEL_ROWS)
    sig = with_fir_smooth(signal_frame_from_events(events, n_channels=n_channels))
    return _best_of_2(native_find_peaks(sig))


def _replicate(base: DataFrame, k: int) -> DataFrame:
    """K copies with disjoint user_id ranges: channel populations stay
    reference-shaped while channel COUNT grows linearly — exactly how
    auto_channels absorbs more data. One explode, not K union branches,
    so the 100× plan stays flat."""
    return base.withColumn(
        "_c", F.explode(F.expr(f"sequence(0, {k - 1})"))
    ).select(
        (
            F.col("user_id") + F.col("_c").cast("long") * F.lit(1_000_000_000)
        ).alias("user_id"),
        "ts",
        "event_id",
        "value",
    )


def _timed_build(build) -> float:
    """Best-of-2 wall seconds INCLUDING build(): the iterative dedup
    operators (label-prop convergence, star rounds) do real driver-
    action work before the returned frame exists — excluding it would
    time only the final projection."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def _replicate_docs(base: DataFrame, k: int) -> DataFrame:
    """K corpus copies with disjoint doc_id ranges and per-copy token
    prefixes (see module docstring: preserves in-copy near-dup
    structure bijectively, kills cross-copy Jaccard). Copy 0 is the
    original corpus verbatim. doc_id strides by 1e9 (a multiple of 10,
    so the %10 new/corpus split keeps its per-copy meaning)."""
    pref = F.concat(F.lit("c"), F.col("_c").cast("string"), F.lit("_"))
    return base.withColumn(
        "_c", F.explode(F.expr(f"sequence(0, {k - 1})"))
    ).select(
        (
            F.col("doc_id") + F.col("_c").cast("long") * F.lit(1_000_000_000)
        ).alias("doc_id"),
        F.when(F.col("_c") == 0, F.col("text"))
        .otherwise(
            F.concat(
                pref,
                F.regexp_replace("text", F.lit(" "), F.concat(F.lit(" "), pref)),
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def _docs_ops():
    from pyspark.sql import functions as FF

    from myodish_peak_analysis_spark.llm import dedup

    def incr(d: DataFrame):
        return dedup.incremental_neardup(
            d.filter(FF.col("doc_id") % 10 == 0),
            d.filter(FF.col("doc_id") % 10 != 0),
        )

    return (
        ("minhash_pairs", lambda d, _n: _timed_build(lambda: dedup.minhash_pairs(d))),
        (
            "dedup_clusters_label",
            lambda d, _n: _timed_build(lambda: dedup.dedup_clusters(d)),
        ),
        (
            "dedup_clusters_star",
            lambda d, _n: _timed_build(
                lambda: dedup.dedup_clusters(d, method="star")
            ),
        ),
        (
            "canonical_corpus",
            lambda d, _n: _timed_build(lambda: dedup.canonical_corpus(d)),
        ),
        ("incremental_neardup", lambda d, _n: _timed_build(lambda: incr(d))),
        # round-6 operators: the gram-heavy span cut, the per-pair DP
        # verify, and the fingerprint-keyed containment join.
        (
            "remove_dup_spans",
            lambda d, _n: _timed_build(lambda: _text_mod().remove_dup_spans(d)),
        ),
        (
            "levenshtein_neardup",
            lambda d, _n: _timed_build(lambda: dedup.levenshtein_neardup(d)),
        ),
        (
            "containment_pairs",
            lambda d, _n: _timed_build(lambda: dedup.containment_pairs(d)),
        ),
        # the composed nightly build end-to-end: canonical dedup →
        # quality prune → leakage-safe train selection → pack spans
        (
            "training_corpus_manifest",
            lambda d, _n: _timed_build(
                lambda: _curate_mod().training_corpus_manifest(d)
            ),
        ),
    )


def _curate_mod():
    from myodish_peak_analysis_spark.llm import curate

    return curate


def _text_mod():
    from myodish_peak_analysis_spark.llm import text

    return text


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--factors",
        type=str,
        default="10,100",
        help="comma-separated replication factors, each measured vs the previous",
    )
    ap.add_argument("--min-ratio", type=float, default=0.8)
    ap.add_argument("--family", choices=("peaks", "docs"), default="peaks")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    spark = get_spark("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    if args.family == "docs":
        base = (
            read_table(spark, SF_DIR, "documents")
            .repartition(spark.sparkContext.defaultParallelism)
            .cache()
        )
        ops = _docs_ops()
        replicate = _replicate_docs
    else:
        base = read_table(spark, SF_DIR, "events").cache()
        ops = (
            ("native_pipeline", _pipeline_seconds),
            ("native_find_peaks", _find_peaks_seconds),
        )
        replicate = _replicate
    n1 = base.count()
    failed = False
    # prev[(name)] = (factor, rows/s) of the previously measured scale
    prev = {name: (1, n1 / fn(base, n1)) for name, fn in ops}
    base_tp = {name: tp for name, (_, tp) in prev.items()}
    for k in factors:
        big = replicate(base, k).cache()
        nk = big.count()
        for name, fn in ops:
            sk = fn(big, nk)
            tpk = nk / sk
            pf, ptp = prev[name]
            ratio = tpk / ptp
            print(
                json.dumps(
                    {
                        "metric": f"scaling_throughput_ratio:{name}",
                        "value": round(ratio, 3),
                        "unit": f"x (rows/s at {k}x vs {pf}x)",
                        "rows_kx": nk,
                        "sec_kx": round(sk, 3),
                        "rows_per_sec_kx": round(tpk),
                        "vs_1x": round(tpk / base_tp[name], 3),
                        **(
                            {"channels_kx": nk // TARGET_CHANNEL_ROWS}
                            if args.family == "peaks"
                            else {}
                        ),
                        "sf_dir": SF_DIR,
                    }
                )
            )
            failed = failed or ratio < args.min_ratio
            prev[name] = (k, tpk)
        big.unpersist()
        # native_find_peaks persists its slim input projection
        # internally (persist_input=True); each factor's replicated
        # plan is a distinct cache entry, so without this the 1x/10x
        # projections stay resident while the 100x run is measured and
        # their eviction pressure can spuriously trip --min-ratio.
        spark.catalog.clearCache()
        base.cache().count()  # re-warm the shared 1x input
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
