"""Rolling floor/ceiling envelopes + diastolic reference (SURVEY.md §2.3, T2).

Reference semantics (``/root/reference/peak_detection.py:56-169``): for each
position i, look at the forward frame ``y[i : i+window]``; the floor is the
min over the frame's interior local minima, the ceiling the max over its
interior local maxima; frames with no extremum yield NaN; the truncated
series is then block-padded and SG-smoothed (301/3).

Spark decomposition: a frame extremum of ``y[i:i+w]`` is exactly a *global*
per-channel extremum whose plateau lies strictly inside the frame — SciPy
can never flag a frame's first/last sample. For width-1 extrema that is
``i+1 <= j <= i+w-2``, i.e. a conditional rolling aggregate over
``ROWS BETWEEN 1 FOLLOWING AND w-2 FOLLOWING``:

    floor_raw = MIN(CASE WHEN is_valley THEN v END) OVER frame
    ceil_raw  = MAX(CASE WHEN is_peak   THEN v END) OVER frame

NULL when no extremum in frame == the reference's NaN, for free. (For a
multi-sample plateau the frame-membership test keys on the midpoint here;
the grouped-map fidelity route applies the exact edge rule — deviation
only when a frame's sole extremum is a plateau straddling its border.)

The envelope is then SG-smoothed with the same FIR machinery as the
signal smooth (nearest-clamp edges; NULLs poison ±150 taps, mirroring the
reference's NaN spreading through ``savgol_filter``). The reference only
defines the envelope for ``i < n - window`` and back-fills the tail via
padding; the spark-native route instead evaluates the (truncating) frame
at every row — full-length output by construction, deviation confined to
the last ``window`` rows per channel. Use ``strict_tail=True`` to NULL
those rows out instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .smooth import fir_smooth_col, fir_smooth_sql_expr
from .windows import CHANNEL, IDX, channel_window, with_extrema_flags
from pyspark.sql.window import Window

DEFAULT_WINDOW = 350  # aux_window_size, /root/reference/peak_detection.py:15
DEFAULT_SMOOTH = 301  # aux_smoothing_window
DEFAULT_POLY = 3  # aux_polyorder
DEFAULT_REL = 0.1  # relative_to_baseline, /root/reference/peak_detection.py:16


def with_raw_envelopes(
    df: DataFrame,
    value_col: str = "smooth",
    window_size: int = DEFAULT_WINDOW,
    floor_col: str = "floor_raw",
    ceil_col: str = "ceil_raw",
    flags_present: bool = False,
) -> DataFrame:
    """Conditional rolling min/max over the forward frame interior."""
    if not flags_present:
        df = with_extrema_flags(df, value_col=value_col)
    w = channel_window().rowsBetween(1, window_size - 2)
    v = F.col(value_col)
    return df.withColumn(
        floor_col, F.min(F.when(F.col("is_valley"), v)).over(w)
    ).withColumn(ceil_col, F.max(F.when(F.col("is_peak"), v)).over(w))


def with_smoothed_envelopes(
    df: DataFrame,
    value_col: str = "smooth",
    window_size: int = DEFAULT_WINDOW,
    smoothing_window_length: int = DEFAULT_SMOOTH,
    polyorder: int = DEFAULT_POLY,
    flags_present: bool = False,
) -> DataFrame:
    """floor/ceiling = SG-smoothed raw envelopes (reference defaults
    350/301/3, ``/root/reference/peak_detection.py:15``)."""
    df = with_raw_envelopes(
        df, value_col=value_col, window_size=window_size, flags_present=flags_present
    )
    w = channel_window()
    wall = Window.partitionBy(CHANNEL)
    df = df.withColumn("_max_idx", F.max(IDX).over(wall))
    for raw, out in (("floor_raw", "baseline"), ("ceil_raw", "ceiling")):
        df = (
            df.withColumn(
                "_first_val",
                F.first(raw).over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .withColumn(
                "_last_val",
                F.last(raw).over(w.rowsBetween(0, Window.unboundedFollowing)),
            )
            .withColumn(
                out, fir_smooth_col(raw, smoothing_window_length, polyorder)
            )
            .drop("_first_val", "_last_val")
        )
    return df.drop("_max_idx")


def with_diastolic(
    df: DataFrame,
    baseline_col: str = "baseline",
    ceiling_col: str = "ceiling",
    out_col: str = "diastolic",
    relative_to_baseline: float = DEFAULT_REL,
) -> DataFrame:
    """diastolic = baseline + r*(ceiling-baseline)
    (``/root/reference/peak_detection.py:216``)."""
    return df.withColumn(
        out_col,
        F.col(baseline_col)
        + F.lit(float(relative_to_baseline)) * (F.col(ceiling_col) - F.col(baseline_col)),
    )


# --- DuckDB oracle builders ------------------------------------------------

def raw_envelopes_sql_cte(
    src_flagged: str,
    value_col: str = "smooth",
    window_size: int = DEFAULT_WINDOW,
) -> str:
    """CTE ending in ``enveloped`` = flagged src + floor_raw/ceil_raw."""
    hi = window_size - 2
    return f"""
    enveloped AS (
        SELECT *,
               MIN(CASE WHEN is_valley THEN {value_col} END)
                   OVER (PARTITION BY channel_id ORDER BY sample_idx
                         ROWS BETWEEN 1 FOLLOWING AND {hi} FOLLOWING) AS floor_raw,
               MAX(CASE WHEN is_peak THEN {value_col} END)
                   OVER (PARTITION BY channel_id ORDER BY sample_idx
                         ROWS BETWEEN 1 FOLLOWING AND {hi} FOLLOWING) AS ceil_raw
        FROM {src_flagged}
    )
    """


def smoothed_envelopes_sql_cte(
    src_flagged: str,
    value_col: str = "smooth",
    window_size: int = DEFAULT_WINDOW,
    smoothing_window_length: int = DEFAULT_SMOOTH,
    polyorder: int = DEFAULT_POLY,
) -> str:
    """CTE chain ending in ``envsmooth`` with baseline/ceiling columns."""
    base = raw_envelopes_sql_cte(src_flagged, value_col, window_size)
    floor_expr = fir_smooth_sql_expr(
        "floor_raw", smoothing_window_length, polyorder,
        first_expr="_ffirst", last_expr="_flast",
    )
    ceil_expr = fir_smooth_sql_expr(
        "ceil_raw", smoothing_window_length, polyorder,
        first_expr="_cfirst", last_expr="_clast",
    )
    return f"""{base},
    envbounds AS (
        SELECT *,
               MAX(sample_idx) OVER (PARTITION BY channel_id) AS _max_idx,
               first_value(floor_raw) OVER w AS _ffirst,
               last_value(floor_raw) OVER (PARTITION BY channel_id ORDER BY sample_idx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS _flast,
               first_value(ceil_raw) OVER w AS _cfirst,
               last_value(ceil_raw) OVER (PARTITION BY channel_id ORDER BY sample_idx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS _clast
        FROM enveloped
        WINDOW w AS (PARTITION BY channel_id ORDER BY sample_idx)
    ),
    envsmooth AS (
        SELECT * EXCLUDE (_max_idx, _ffirst, _flast, _cfirst, _clast),
               {floor_expr} AS baseline,
               {ceil_expr} AS ceiling
        FROM envbounds
        WINDOW w AS (PARTITION BY channel_id ORDER BY sample_idx)
    )
    """
