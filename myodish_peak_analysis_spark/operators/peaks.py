"""Peak selection operators (SURVEY.md §2.4: P1-P4).

* ``naive_peaks`` — unconstrained local maxima, the semantics of
  ``find_peaks(stim)`` with all defaults (P4,
  ``/root/reference/peak_detection.py:296``; the six tuning params there
  are accepted but ignored — preserved here by simply not taking them).
* ``with_threshold_keep`` / ``threshold_peaks`` — the envelope threshold
  filter (P2, ``/root/reference/peak_detection.py:255-260``): keep a peak
  unless its smoothed value sits below ``baseline + t*(ceiling-baseline)``.
  Quirk preserved: NumPy ``NaN < x`` is False, so a peak whose envelope is
  NaN is KEPT by the reference — here the NULL comparison is coalesced to
  "keep" to match.
* Constrained detection (P1: distance/prominence/width) is inherently
  sequential-greedy — it lives in the grouped-map fidelity route
  (:mod:`.fidelity`), not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .windows import with_extrema_flags

DEFAULT_THRESHOLD = 0.7  # /root/reference/peak_detection.py:17


def naive_peaks(df: DataFrame, value_col: str = "signal_value") -> DataFrame:
    """All plateau-midpoint local maxima of a channelized signal (P4)."""
    flagged = with_extrema_flags(df, value_col=value_col)
    return flagged.filter(F.col("is_peak")).select(
        "channel_id",
        F.col("sample_idx").alias("peak_idx"),
        F.col("time_index").alias("timestamp"),
        F.col(value_col).alias("peak_value"),
    )


def with_threshold_keep(
    df: DataFrame,
    value_col: str = "smooth",
    baseline_col: str = "baseline",
    ceiling_col: str = "ceiling",
    threshold: float = DEFAULT_THRESHOLD,
    out_col: str = "keep_peak",
) -> DataFrame:
    """Boolean column: False iff value < baseline + t*(ceiling-baseline).

    NULL *or NaN* envelopes keep the peak (the reference's NumPy quirk:
    ``NaN < x`` and ``x < NaN`` are both False). Spark SQL orders NaN
    *greater* than every value, so ``value < NaN-line`` would evaluate
    TRUE and wrongly drop the peak — guard with isnan on the line (the
    fidelity route's golden-diff columns carry NaN, not NULL)."""
    line = F.col(baseline_col) + F.lit(float(threshold)) * (
        F.col(ceiling_col) - F.col(baseline_col)
    )
    drop = (F.col(value_col) < line) & ~F.isnan(line)
    return df.withColumn(out_col, ~F.coalesce(drop, F.lit(False)))


def threshold_keep_sql_expr(
    value_col: str = "smooth",
    baseline_col: str = "baseline",
    ceiling_col: str = "ceiling",
    threshold: float = DEFAULT_THRESHOLD,
) -> str:
    line = f"{baseline_col} + {threshold!r} * ({ceiling_col} - {baseline_col})"
    return f"NOT COALESCE({value_col} < ({line}) AND NOT isnan({line}), FALSE)"


def peak_interval_stats(peaks: DataFrame, fs: float = 100.0) -> DataFrame:
    """Per-channel inter-peak-interval (IPI) statistics over any peaks
    frame carrying ``(channel_id, peak_idx)`` — beat-rate analysis, the
    natural physiology rollup downstream of detection (the reference
    stops at per-peak attributes; rate/variability is the first thing a
    contraction study derives next).

    Output: channel_id, n_intervals, mean_ipi (samples), std_ipi
    (population σ, samples), mean_rate_hz (= fs / mean_ipi). Channels
    with fewer than two peaks emit no row.

    Cross-engine exactness: intervals are integer sample deltas, so the
    first and second moments are exact BIGINT sums in any aggregation
    order; each derived stat is ONE double expression over those
    integers, rounded once. Scale: one lag window + one
    map-side-combinable aggregate per channel on the (already tiny)
    peaks frame — no extra shuffle beyond the channel key.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("channel_id").orderBy("peak_idx")
    ipi = (
        peaks.withColumn(
            "_d", F.col("peak_idx") - F.lag("peak_idx").over(w)
        )
        .filter(F.col("_d").isNotNull())
        .select("channel_id", F.col("_d").cast("long"))
    )
    agg = ipi.groupBy("channel_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("_d").alias("_s"),
        F.sum(F.col("_d") * F.col("_d")).alias("_q"),
    )
    n, s, q = F.col("n_intervals"), F.col("_s"), F.col("_q")
    return agg.select(
        "channel_id",
        "n_intervals",
        F.round(s / n, 6).alias("mean_ipi"),
        F.round(F.sqrt((n * q - s * s).cast("double")) / n, 6).alias("std_ipi"),
        F.round(F.lit(float(fs)) * n / s, 6).alias("mean_rate_hz"),
    )
