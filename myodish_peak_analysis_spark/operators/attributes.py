"""Per-peak analytic attributes (SURVEY.md §2.5-2.6: A1-A4, T3, G1).

The reference walks sample-by-sample from each peak until the smoothed
signal crosses the diastolic reference (``/root/reference/
peak_analysis.py:79-113``). The loop semantics reduce to backward/forward
*as-of* crossing searches (derivation in SURVEY.md §2.5):

* side(x)  = smooth[x] >= diastolic[x]   (TTP uses >=; loop at :84-89)
* side'(x) = smooth[x] <= diastolic[x]   (TTR uses <=; loop at :99-107 —
  the strict/non-strict asymmetry is load-bearing and preserved)
* TTP: j = last index < p where side(j) != side(p), else 0 (the walk
  stops at the channel start); ttp = (p - j)/fs. The reference's
  ``i == 0 -> NaN`` branch is unreachable for p > 0 (the flag at :82 is
  never updated, so the loop always takes >= 1 step) — not replicated.
* TTR: j = first index > p where side'(j) != side'(p); NULL when there is
  no crossing OR the crossing is the channel's last sample (guard :109).
* Edge guard (:71-76): peaks at idx 0 or >= n-2 get NULL ttp/ttr/duration.
* duration = ttp + ttr, NULL-propagating (:115-119).
* force = peak_value - baseline_value (:67-68).
* Averages (:124-136): AVG(), which skips NULLs exactly like the
  reference's NaN-filtering list comprehensions.

Implementation: conditional running ``last``/``first`` with
``ignorenulls=True`` over unbounded frames on the *signal* table — pure
window functions, evaluated once per row, then restricted to peak rows.
Both crossing candidates (crossed-below / crossed-above) are computed so
the current row's side just selects between them — this keeps the
"condition references the current row" walk expressible declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..schema import DEFAULT_FS
from .windows import CHANNEL, IDX, channel_window


def with_crossings(
    df: DataFrame,
    smooth_col: str = "smooth",
    diastolic_col: str = "diastolic",
) -> DataFrame:
    """Add crossing-search helper columns to the signal table."""
    w = channel_window()
    s, d = F.col(smooth_col), F.col(diastolic_col)
    back = w.rowsBetween(Window.unboundedPreceding, -1)
    fwd = w.rowsBetween(1, Window.unboundedFollowing)
    return (
        df.withColumn("_side_ge", s >= d)
        .withColumn("_side_le", s <= d)
        .withColumn(
            "_last_lt",
            F.last(F.when(s < d, F.col(IDX)), ignorenulls=True).over(back),
        )
        .withColumn(
            "_last_ge",
            F.last(F.when(s >= d, F.col(IDX)), ignorenulls=True).over(back),
        )
        .withColumn(
            "_first_gt",
            F.first(F.when(s > d, F.col(IDX)), ignorenulls=True).over(fwd),
        )
        .withColumn(
            "_first_le",
            F.first(F.when(s <= d, F.col(IDX)), ignorenulls=True).over(fwd),
        )
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(CHANNEL)))
        .withColumn("_max_idx", F.max(IDX).over(Window.partitionBy(CHANNEL)))
    )


def peak_attributes(
    df_crossed: DataFrame,
    keep_col: str = "is_peak",
    smooth_col: str = "smooth",
    baseline_col: str = "baseline",
    fs: float = DEFAULT_FS,
) -> DataFrame:
    """Restrict to peak rows and compute force/ttp/ttr/duration."""
    p = F.col(IDX)
    edge = (p == 0) | (p >= F.col("_n") - 2)
    ttp_j = F.coalesce(
        F.when(F.col("_side_ge"), F.col("_last_lt")).otherwise(F.col("_last_ge")),
        F.lit(0),
    )
    ttr_j = F.when(F.col("_side_le"), F.col("_first_gt")).otherwise(F.col("_first_le"))
    ttp = (p - ttp_j).cast("double") / F.lit(float(fs))
    ttr = F.when(
        ttr_j.isNull() | (ttr_j == F.col("_max_idx")), F.lit(None).cast("double")
    ).otherwise((ttr_j - p).cast("double") / F.lit(float(fs)))
    out = (
        df_crossed.filter(F.col(keep_col))
        .withColumn("time_to_peak", F.when(edge, F.lit(None).cast("double")).otherwise(ttp))
        .withColumn("time_to_relaxation", F.when(edge, F.lit(None).cast("double")).otherwise(ttr))
        .withColumn("duration", F.col("time_to_peak") + F.col("time_to_relaxation"))
        .withColumn("force", F.col(smooth_col) - F.col(baseline_col))
    )
    return out.select(
        CHANNEL,
        F.col(IDX).alias("peak_idx"),
        F.col("time_index").alias("timestamp"),
        F.col(smooth_col).alias("peak_value"),
        F.col(baseline_col).alias("baseline_value"),
        "force",
        "time_to_peak",
        "time_to_relaxation",
        "duration",
    )


def peak_averages(peaks: DataFrame) -> DataFrame:
    """Per-channel NULL-skipping means (G1,
    ``/root/reference/peak_analysis.py:124-136``)."""
    return peaks.groupBy(CHANNEL).agg(
        F.count(F.lit(1)).alias("n_peaks"),
        F.avg("time_to_peak").alias("avg_ttp"),
        F.avg("time_to_relaxation").alias("avg_ttr"),
        F.avg("duration").alias("avg_duration"),
        F.avg("force").alias("avg_force"),
    )


# --- DuckDB oracle builders ------------------------------------------------

def crossings_sql_cte(src: str, smooth_col: str = "smooth", diastolic_col: str = "diastolic") -> str:
    """CTE ending in ``crossed`` mirroring :func:`with_crossings`."""
    s, d = smooth_col, diastolic_col
    return f"""
    crossed AS (
        SELECT *,
               {s} >= {d} AS _side_ge,
               {s} <= {d} AS _side_le,
               last_value(CASE WHEN {s} < {d} THEN sample_idx END IGNORE NULLS)
                   OVER (PARTITION BY channel_id ORDER BY sample_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS _last_lt,
               last_value(CASE WHEN {s} >= {d} THEN sample_idx END IGNORE NULLS)
                   OVER (PARTITION BY channel_id ORDER BY sample_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS _last_ge,
               first_value(CASE WHEN {s} > {d} THEN sample_idx END IGNORE NULLS)
                   OVER (PARTITION BY channel_id ORDER BY sample_idx
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS _first_gt,
               first_value(CASE WHEN {s} <= {d} THEN sample_idx END IGNORE NULLS)
                   OVER (PARTITION BY channel_id ORDER BY sample_idx
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS _first_le,
               COUNT(*) OVER (PARTITION BY channel_id) AS _n,
               MAX(sample_idx) OVER (PARTITION BY channel_id) AS _max_idx
        FROM {src}
    )
    """


def peak_attributes_sql_select(
    keep_expr: str = "is_peak",
    smooth_col: str = "smooth",
    baseline_col: str = "baseline",
    fs: float = DEFAULT_FS,
) -> str:
    """SELECT over ``crossed`` mirroring :func:`peak_attributes`."""
    ttp_core = f"CAST(sample_idx - COALESCE(CASE WHEN _side_ge THEN _last_lt ELSE _last_ge END, 0) AS DOUBLE) / {fs!r}"
    ttr_j = "(CASE WHEN _side_le THEN _first_gt ELSE _first_le END)"
    ttp = f"CASE WHEN sample_idx = 0 OR sample_idx >= _n - 2 THEN NULL ELSE {ttp_core} END"
    ttr = (
        f"CASE WHEN sample_idx = 0 OR sample_idx >= _n - 2 THEN NULL "
        f"WHEN {ttr_j} IS NULL OR {ttr_j} = _max_idx THEN NULL "
        f"ELSE CAST({ttr_j} - sample_idx AS DOUBLE) / {fs!r} END"
    )
    return f"""
    SELECT channel_id,
           sample_idx AS peak_idx,
           time_index AS timestamp,
           {smooth_col} AS peak_value,
           {baseline_col} AS baseline_value,
           {smooth_col} - {baseline_col} AS force,
           {ttp} AS time_to_peak,
           {ttr} AS time_to_relaxation,
           ({ttp}) + ({ttr}) AS duration
    FROM crossed
    WHERE {keep_expr}
    """
