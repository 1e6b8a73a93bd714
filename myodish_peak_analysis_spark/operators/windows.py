"""Canonical per-channel window specs + plateau-aware local-extrema flags.

The reference finds local extrema with ``scipy.signal.find_peaks`` inside
each rolling frame (``/root/reference/peak_detection.py:95,153``). SciPy
marks a flat-top plateau's *midpoint* as the single extremum; a naive
``lag``/``lead`` flag marks none (SURVEY.md §2.3 caveat). The run-length
construction below reproduces the midpoint rule in pure Spark SQL:

1. assign a run id to each maximal stretch of equal values,
2. a run is a peak-run iff the previous run's value is lower AND the next
   run's value is lower (nulls at channel borders disqualify — matching
   SciPy, which never marks the first/last sample),
3. flag the run's midpoint row ``(start + end) DIV 2``.

Everything is window functions over one (channel_id, sample_idx) sort —
no joins, no UDFs; at 100 TB this is a single hash-partition by channel
with an in-partition sort that AQE sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

CHANNEL = "channel_id"
IDX = "sample_idx"


def channel_window() -> Window:
    return Window.partitionBy(CHANNEL).orderBy(IDX)


def with_extrema_flags(
    df: DataFrame,
    value_col: str = "signal_value",
    peak_col: str = "is_peak",
    valley_col: str = "is_valley",
) -> DataFrame:
    """Add boolean plateau-midpoint local-max/min flags per channel.

    Matches SciPy ``find_peaks``'s maxima rule: strictly greater than the
    previous differing sample and the next differing sample; plateaus
    flag ``(left_edge + right_edge) DIV 2``; channel edges never flag.
    """
    w = channel_window()
    v = F.col(value_col)
    df = df.withColumn("_pl", F.lag(value_col).over(w)).withColumn(
        "_nl", F.lead(value_col).over(w)
    )
    run_change = F.when(F.col("_pl").isNull() | (v != F.col("_pl")), 1).otherwise(0)
    df = df.withColumn(
        "_run_id", F.sum(run_change).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    wrun = Window.partitionBy(CHANNEL, "_run_id")
    wrun_ord = wrun.orderBy(IDX)
    df = (
        df.withColumn("_prev_run_val", F.first("_pl").over(wrun_ord))
        .withColumn(
            "_next_run_val",
            F.last("_nl").over(
                wrun_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .withColumn("_run_start", F.min(IDX).over(wrun))
        .withColumn("_run_end", F.max(IDX).over(wrun))
    )
    is_mid = F.col(IDX) == F.expr("(_run_start + _run_end) DIV 2")
    df = df.withColumn(
        peak_col,
        F.coalesce(
            (F.col("_prev_run_val") < v) & (F.col("_next_run_val") < v) & is_mid,
            F.lit(False),
        ),
    ).withColumn(
        valley_col,
        F.coalesce(
            (F.col("_prev_run_val") > v) & (F.col("_next_run_val") > v) & is_mid,
            F.lit(False),
        ),
    )
    return df.drop("_pl", "_nl", "_run_id", "_prev_run_val", "_next_run_val", "_run_start", "_run_end")


def with_channel_bounds(df: DataFrame) -> DataFrame:
    """Attach per-channel n (row count) and max_idx columns via an
    unordered partition window (no extra shuffle beyond the channel one)."""
    wall = Window.partitionBy(CHANNEL)
    return df.withColumn("_n", F.count(F.lit(1)).over(wall)).withColumn(
        "_max_idx", F.max(IDX).over(wall)
    )


def extrema_flags_sql(
    src: str,
    value_col: str = "signal_value",
    extra_cols: str = "",
) -> str:
    """DuckDB SQL mirroring :func:`with_extrema_flags` over CTE ``src``.

    Returns a chain of CTE definitions ending in a relation named
    ``flagged`` with is_peak / is_valley columns added.
    """
    return f"""
    lagged AS (
        SELECT *,
               lag({value_col}) OVER w AS _pl,
               lead({value_col}) OVER w AS _nl
        FROM {src}
        WINDOW w AS (PARTITION BY channel_id ORDER BY sample_idx)
    ),
    runs AS (
        SELECT *,
               SUM(CASE WHEN _pl IS NULL OR {value_col} <> _pl THEN 1 ELSE 0 END)
                   OVER (PARTITION BY channel_id ORDER BY sample_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _run_id
        FROM lagged
    ),
    runinfo AS (
        SELECT *,
               first_value(_pl) OVER wr AS _prev_run_val,
               last_value(_nl) OVER (PARTITION BY channel_id, _run_id ORDER BY sample_idx
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS _next_run_val,
               MIN(sample_idx) OVER (PARTITION BY channel_id, _run_id) AS _run_start,
               MAX(sample_idx) OVER (PARTITION BY channel_id, _run_id) AS _run_end
        FROM runs
        WINDOW wr AS (PARTITION BY channel_id, _run_id ORDER BY sample_idx)
    ),
    flagged AS (
        SELECT * EXCLUDE (_pl, _nl, _run_id, _prev_run_val, _next_run_val, _run_start, _run_end),
               COALESCE(_prev_run_val < {value_col} AND _next_run_val < {value_col}
                        AND sample_idx = (_run_start + _run_end) // 2, FALSE) AS is_peak,
               COALESCE(_prev_run_val > {value_col} AND _next_run_val > {value_col}
                        AND sample_idx = (_run_start + _run_end) // 2, FALSE) AS is_valley
        FROM runinfo
    )
    """
