#!/usr/bin/env python
"""Scaling regression for the native peak pipeline: per-row cost must
stay flat as the data grows.

Runs the full native pipeline (channelize → SG smooth → envelopes →
diastolic → threshold peaks → attributes) at 1× (the sf dir's events
table) and at K× (default 10×: the same events replicated with shifted
``user_id``s so every copy lands in fresh channels — the same shape a
bigger harness SF would produce), with channel count scaled by
``auto_channels``' rows/TARGET_CHANNEL_ROWS rule in both runs.

Prints one JSON line and exits 1 if the K× throughput (rows/s) falls
below ``--min-ratio`` (default 0.8) of the 1× throughput — i.e. if
per-row cost grew with scale. Fixed planning/JIT overhead amortizes at
K×, so healthy plans show throughput RISING with scale; a ratio under 1
by more than the noise floor means some stage is super-linear (a
single-partition sort, a growing window partition, a driver loop).

Usage: python tools/bench_scaling.py [--factor 10] [--min-ratio 0.8]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--min-ratio", type=float, default=0.8)
    args = ap.parse_args()

    spark = get_spark("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    base = read_table(spark, SF_DIR, "events").cache()
    n1 = base.count()

    # K copies with disjoint user_id ranges: channel populations stay
    # reference-shaped while channel COUNT grows linearly — exactly how
    # auto_channels absorbs more data.
    copies = [
        base.select(
            (F.col("user_id") + F.lit(c * 1_000_000_000)).alias("user_id"),
            "ts",
            "event_id",
            "value",
        )
        for c in range(args.factor)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionAll(c)
    big = big.cache()
    nk = big.count()

    failed = False
    for name, fn in (
        ("native_pipeline", _pipeline_seconds),
        ("native_find_peaks", _find_peaks_seconds),
    ):
        s1 = fn(base, n1)
        sk = fn(big, nk)
        tp1, tpk = n1 / s1, nk / sk
        ratio = tpk / tp1
        print(
            json.dumps(
                {
                    "metric": f"scaling_throughput_ratio:{name}",
                    "value": round(ratio, 3),
                    "unit": f"x (rows/s at {args.factor}x vs 1x)",
                    "rows_1x": n1,
                    "rows_kx": nk,
                    "sec_1x": round(s1, 3),
                    "sec_kx": round(sk, 3),
                    "rows_per_sec_1x": round(tp1),
                    "rows_per_sec_kx": round(tpk),
                    "channels_kx": nk // TARGET_CHANNEL_ROWS,
                    "sf_dir": SF_DIR,
                }
            )
        )
        failed = failed or ratio < args.min_ratio
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
