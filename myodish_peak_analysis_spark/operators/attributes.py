"""Per-peak analytic attributes (SURVEY.md §2.5-2.6: A1-A4, T3, G1).

The reference walks sample-by-sample from each peak until the smoothed
signal crosses the diastolic reference (``/root/reference/
peak_analysis.py:79-113``). The loop fixes the *initial side* at the peak
and stops at the first sample on the other side (the "new_edge_reference"
flag is never updated, so the walk runs while the side stays equal to the
side at the peak):

* TTP side(x) = smooth[x] >= diastolic[x]  (loop at :84-89). NumPy NaN
  comparisons are False, so a NaN row is on the FALSE side — a NaN
  diastolic terminates a True-side walk (verified vs reference; the naive
  "last index where smooth < diastolic" formulation would skip NaN rows
  and walk too far).
* TTR side'(x) = smooth[x] <= diastolic[x] (loop at :99-107 — the
  strict/non-strict asymmetry is load-bearing and preserved).
* TTP: j = last index < p with side(j) != side(p); the walk also stops at
  the channel start, so j falls back to 0; ttp = (p - j)/fs. The
  reference's ``i == 0 -> NaN`` branch is unreachable for p > 0.
* TTR: j = first index > p with side'(j) != side'(p); NULL when there is
  no crossing OR the crossing is the channel's last sample (guard :109).
* Edge guard (:71-76): peaks at idx 0 or >= n-2 get NULL ttp/ttr/duration.
* duration = ttp + ttr, NULL-propagating (:115-119).
* force = peak_value - baseline_value (:67-68).
* Averages (:124-136): AVG(), which skips NULLs exactly like the
  reference's NaN-filtering list comprehensions.

Implementation: the side predicates are made two-valued with
``coalesce(cmp, FALSE)`` — NULL diastolic/smooth lands on the False side,
matching NumPy — then conditional running ``last``/``first`` with
``ignorenulls=True`` over unbounded frames compute, per row, the nearest
preceding/following index on EACH side; the peak row's own side selects
between them. Pure window functions over the one canonical
(channel_id, sample_idx) sort; no joins, no UDFs, no Python.
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
    side_ge = F.coalesce(s >= d, F.lit(False))
    side_le = F.coalesce(s <= d, F.lit(False))
    back = w.rowsBetween(Window.unboundedPreceding, -1)
    # "Nearest FOLLOWING row where cond" via a running last() over the
    # DESCENDING sort: rows with idx > current are the frame's preceding
    # rows there, and last(..., ignorenulls) picks the one nearest the
    # current row, i.e. the smallest following idx. This is Spark's O(n)
    # growing-frame path; the direct first() over (1, unboundedFollowing)
    # is the O(n^2) rescan-per-row UnboundedFollowing frame (measured
    # ~1.5s of the sf0.1 pipeline before the rewrite). Costs one extra
    # in-partition sort, no extra shuffle.
    fwd = (
        Window.partitionBy(CHANNEL)
        .orderBy(F.col(IDX).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    idx = F.col(IDX)
    # The crossing search records BOTH the index and the smooth value of
    # the crossing row as one struct, so a NULL smooth at the crossing
    # row cannot make ignorenulls skip to a different row for the value
    # than for the index (the struct is non-null whenever the side
    # condition holds, even if its value field is NULL).
    pair = F.struct(idx.alias("i"), s.alias("v"))
    df = (
        df.withColumn("_side_ge", side_ge)
        .withColumn("_side_le", side_le)
        .withColumn(
            "_last_ge_true_s",
            F.last(F.when(side_ge, pair), ignorenulls=True).over(back),
        )
        .withColumn(
            "_last_ge_false_s",
            F.last(F.when(~side_ge, pair), ignorenulls=True).over(back),
        )
        .withColumn(
            "_first_le_true_s",
            F.last(F.when(side_le, pair), ignorenulls=True).over(fwd),
        )
        .withColumn(
            "_first_le_false_s",
            F.last(F.when(~side_le, pair), ignorenulls=True).over(fwd),
        )
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(CHANNEL)))
        .withColumn("_max_idx", F.max(IDX).over(Window.partitionBy(CHANNEL)))
        .withColumn(
            "_first_smooth",
            F.first(s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    for name in ("_last_ge_true", "_last_ge_false", "_first_le_true", "_first_le_false"):
        df = df.withColumn(name, F.col(f"{name}_s.i")).withColumn(
            f"{name}_v", F.col(f"{name}_s.v")
        )
    return df.drop(
        "_last_ge_true_s", "_last_ge_false_s", "_first_le_true_s", "_first_le_false_s"
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
        F.when(F.col("_side_ge"), F.col("_last_ge_false")).otherwise(
            F.col("_last_ge_true")
        ),
        F.lit(0),
    )
    ttr_j = F.when(F.col("_side_le"), F.col("_first_le_false")).otherwise(
        F.col("_first_le_true")
    )
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


def peak_crossing_points(
    df_crossed: DataFrame,
    keep_col: str = "is_peak",
    fs: float = DEFAULT_FS,
) -> DataFrame:
    """The reference's ``ttp_points``/``ttr_points``
    (peak_analysis.py:95,113): per valid peak, the (time, smooth-value)
    coordinate where each crossing walk stopped. The value columns reuse
    the same conditional windows as the index search, so they land on
    the same row; when the TTP walk falls back to the channel start
    (no opposite-side row), the value is the channel's first smooth
    sample — exactly ``smooth[0]`` in the reference loop."""
    p = F.col(IDX)
    edge = (p == 0) | (p >= F.col("_n") - 2)
    ttp_j = F.coalesce(
        F.when(F.col("_side_ge"), F.col("_last_ge_false")).otherwise(
            F.col("_last_ge_true")
        ),
        F.lit(0),
    )
    ttp_v = F.coalesce(
        F.when(F.col("_side_ge"), F.col("_last_ge_false_v")).otherwise(
            F.col("_last_ge_true_v")
        ),
        F.col("_first_smooth"),
    )
    ttr_j = F.when(F.col("_side_le"), F.col("_first_le_false")).otherwise(
        F.col("_first_le_true")
    )
    ttr_v = F.when(F.col("_side_le"), F.col("_first_le_false_v")).otherwise(
        F.col("_first_le_true_v")
    )
    ttp = (p - ttp_j).cast("double") / F.lit(float(fs))
    ttr = (ttr_j - p).cast("double") / F.lit(float(fs))
    ttr_valid = ttr_j.isNotNull() & (ttr_j != F.col("_max_idx"))
    t = F.col("time_index")
    null_d = F.lit(None).cast("double")
    return df_crossed.filter(F.col(keep_col)).select(
        CHANNEL,
        F.col(IDX).alias("peak_idx"),
        F.when(edge, null_d).otherwise(t - ttp).alias("ttp_point_t"),
        F.when(edge, null_d).otherwise(ttp_v).alias("ttp_point_v"),
        F.when(edge | ~ttr_valid, null_d).otherwise(t + ttr).alias("ttr_point_t"),
        F.when(edge | ~ttr_valid, null_d).otherwise(ttr_v).alias("ttr_point_v"),
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
    ge = f"COALESCE({s} >= {d}, FALSE)"
    le = f"COALESCE({s} <= {d}, FALSE)"
    pair = f"struct_pack(i := sample_idx, v := {s})"
    back = (
        "OVER (PARTITION BY channel_id ORDER BY sample_idx "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    fwd = (
        "OVER (PARTITION BY channel_id ORDER BY sample_idx "
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
    )
    return f"""
    crossed0 AS (
        SELECT *,
               {ge} AS _side_ge,
               {le} AS _side_le,
               last_value(CASE WHEN {ge} THEN {pair} END IGNORE NULLS)
                   {back} AS _last_ge_true_s,
               last_value(CASE WHEN NOT {ge} THEN {pair} END IGNORE NULLS)
                   {back} AS _last_ge_false_s,
               first_value(CASE WHEN {le} THEN {pair} END IGNORE NULLS)
                   {fwd} AS _first_le_true_s,
               first_value(CASE WHEN NOT {le} THEN {pair} END IGNORE NULLS)
                   {fwd} AS _first_le_false_s,
               COUNT(*) OVER (PARTITION BY channel_id) AS _n,
               MAX(sample_idx) OVER (PARTITION BY channel_id) AS _max_idx,
               first_value({s}) OVER (PARTITION BY channel_id ORDER BY sample_idx) AS _first_smooth
        FROM {src}
    ),
    crossed AS (
        SELECT * EXCLUDE (_last_ge_true_s, _last_ge_false_s,
                          _first_le_true_s, _first_le_false_s),
               (_last_ge_true_s).i AS _last_ge_true,
               (_last_ge_true_s).v AS _last_ge_true_v,
               (_last_ge_false_s).i AS _last_ge_false,
               (_last_ge_false_s).v AS _last_ge_false_v,
               (_first_le_true_s).i AS _first_le_true,
               (_first_le_true_s).v AS _first_le_true_v,
               (_first_le_false_s).i AS _first_le_false,
               (_first_le_false_s).v AS _first_le_false_v
        FROM crossed0
    )
    """


def crossing_points_sql_select(
    keep_expr: str = "is_peak",
    fs: float = DEFAULT_FS,
) -> str:
    """SELECT over ``crossed`` mirroring :func:`peak_crossing_points`."""
    ttp_j = "COALESCE(CASE WHEN _side_ge THEN _last_ge_false ELSE _last_ge_true END, 0)"
    ttp_v = (
        "COALESCE(CASE WHEN _side_ge THEN _last_ge_false_v ELSE _last_ge_true_v END, "
        "_first_smooth)"
    )
    ttr_j = "(CASE WHEN _side_le THEN _first_le_false ELSE _first_le_true END)"
    ttr_v = "(CASE WHEN _side_le THEN _first_le_false_v ELSE _first_le_true_v END)"
    edge = "sample_idx = 0 OR sample_idx >= _n - 2"
    ttr_invalid = f"{ttr_j} IS NULL OR {ttr_j} = _max_idx"
    ttp = f"CAST(sample_idx - {ttp_j} AS DOUBLE) / {fs!r}"
    ttr = f"CAST({ttr_j} - sample_idx AS DOUBLE) / {fs!r}"
    return f"""
    SELECT channel_id,
           sample_idx AS peak_idx,
           CASE WHEN {edge} THEN NULL ELSE time_index - ({ttp}) END AS ttp_point_t,
           CASE WHEN {edge} THEN NULL ELSE {ttp_v} END AS ttp_point_v,
           CASE WHEN {edge} OR {ttr_invalid} THEN NULL
                ELSE time_index + ({ttr}) END AS ttr_point_t,
           CASE WHEN {edge} OR {ttr_invalid} THEN NULL ELSE {ttr_v} END AS ttr_point_v
    FROM crossed
    WHERE {keep_expr}
    """


def peak_attributes_sql_select(
    keep_expr: str = "is_peak",
    smooth_col: str = "smooth",
    baseline_col: str = "baseline",
    fs: float = DEFAULT_FS,
) -> str:
    """SELECT over ``crossed`` mirroring :func:`peak_attributes`."""
    ttp_core = (
        f"CAST(sample_idx - COALESCE("
        f"CASE WHEN _side_ge THEN _last_ge_false ELSE _last_ge_true END, 0) "
        f"AS DOUBLE) / {fs!r}"
    )
    ttr_j = "(CASE WHEN _side_le THEN _first_le_false ELSE _first_le_true END)"
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
