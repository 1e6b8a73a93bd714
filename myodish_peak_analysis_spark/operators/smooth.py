"""Savitzky–Golay smoothing as a pure-Spark FIR window expression.

The reference smooths with ``scipy.signal.savgol_filter(..., mode='nearest')``
after duplicating the first/last ``window//2`` samples as padding
(``/root/reference/peak_detection.py:185-197``). Interior samples see a
plain FIR convolution with the SG coefficient vector; only the first/last
``window//2`` outputs see the reference's block-duplicate padding.

This module's **spark-native route** keeps the identical interior FIR and
uses *nearest-clamp* boundary semantics (out-of-range taps read the first/
last sample of the channel) — a documented edge deviation confined to
``window//2`` rows per channel end. The exact reference edge behaviour is
available through the grouped-map fidelity route in
:mod:`myodish_peak_analysis_spark.operators.fidelity`.

Why FIR-as-window-expression: the whole smooth stays inside Tungsten
whole-stage codegen — no Python boundary, no Arrow hop — and reuses the
single (channel_id, sample_idx) sort every other stage needs. NULL inputs
poison every output within ``window//2`` taps, matching NumPy NaN
propagation through a convolution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.sigproc import savgol_coeffs
from .windows import CHANNEL, IDX, channel_window


def fir_smooth_col(
    value_col: str,
    window_length: int,
    polyorder: int,
    idx_col: str = IDX,
    max_idx_col: str = "_max_idx",
    first_col: str = "_first_val",
    last_col: str = "_last_val",
) -> Column:
    """FIR Savitzky–Golay smoothing column with nearest-clamp edges.

    Requires helper columns: per-channel ``max_idx_col`` plus the first
    and last value of ``value_col`` (see :func:`with_fir_smooth`).
    The out-of-range guard tests the row *index*, not the lag result, so
    genuine NULL values still propagate (NaN-poisoning parity).
    """
    coeffs = savgol_coeffs(window_length, polyorder)
    half = window_length // 2
    w = channel_window()
    idx = F.col(idx_col)
    terms = []
    for k, ck in enumerate(coeffs):
        d = k - half  # tap reads value at sample_idx + d, clamped to channel
        if d < 0:
            tap = F.when(idx + d < 0, F.col(first_col)).otherwise(
                F.lag(value_col, -d).over(w)
            )
        elif d > 0:
            tap = F.when(idx + d > F.col(max_idx_col), F.col(last_col)).otherwise(
                F.lead(value_col, d).over(w)
            )
        else:
            tap = F.col(value_col)
        terms.append(F.lit(float(ck)) * tap)
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    return expr


def with_fir_smooth(
    df: DataFrame,
    value_col: str = "signal_value",
    out_col: str = "smooth",
    window_length: int = 51,
    polyorder: int = 7,
) -> DataFrame:
    """Add a smoothed column (reference defaults 51/7,
    ``/root/reference/peak_detection.py:14``)."""
    w = channel_window()
    wall = Window.partitionBy(CHANNEL)
    df = (
        df.withColumn("_max_idx", F.max(IDX).over(wall))
        .withColumn(
            "_first_val",
            F.first(value_col).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "_last_val",
            F.last(value_col).over(w.rowsBetween(0, Window.unboundedFollowing)),
        )
    )
    df = df.withColumn(
        out_col, fir_smooth_col(value_col, window_length, polyorder)
    )
    return df.drop("_max_idx", "_first_val", "_last_val")


def fir_smooth_sql_expr(
    value_col: str,
    window_length: int,
    polyorder: int,
    first_expr: str = "_first_val",
    last_expr: str = "_last_val",
    max_idx_expr: str = "_max_idx",
) -> str:
    """DuckDB SQL expression mirroring :func:`fir_smooth_col` term-for-term
    (same coefficient literals, same left-to-right addition order, so both
    engines produce bit-comparable doubles up to FP contraction)."""
    coeffs = savgol_coeffs(window_length, polyorder)
    half = window_length // 2
    terms = []
    for k, ck in enumerate(coeffs):
        d = k - half
        lit = repr(float(ck))
        if d < 0:
            tap = (
                f"CASE WHEN sample_idx - {-d} < 0 THEN {first_expr} "
                f"ELSE lag({value_col}, {-d}) OVER w END"
            )
        elif d > 0:
            tap = (
                f"CASE WHEN sample_idx + {d} > {max_idx_expr} THEN {last_expr} "
                f"ELSE lead({value_col}, {d}) OVER w END"
            )
        else:
            tap = value_col
        terms.append(f"({lit}) * ({tap})")
    return " + ".join(terms)


def fir_smooth_sql_cte(
    src: str,
    value_col: str = "signal_value",
    out_col: str = "smooth",
    window_length: int = 51,
    polyorder: int = 7,
) -> str:
    """CTE chain ending in relation ``smoothed`` = ``src`` + smooth column."""
    expr = fir_smooth_sql_expr(value_col, window_length, polyorder)
    return f"""
    bounds AS (
        SELECT *,
               MAX(sample_idx) OVER (PARTITION BY channel_id) AS _max_idx,
               first_value({value_col}) OVER w AS _first_val,
               last_value({value_col}) OVER (PARTITION BY channel_id ORDER BY sample_idx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS _last_val
        FROM {src}
        WINDOW w AS (PARTITION BY channel_id ORDER BY sample_idx)
    ),
    smoothed AS (
        SELECT * EXCLUDE (_max_idx, _first_val, _last_val), {expr} AS {out_col}
        FROM bounds
        WINDOW w AS (PARTITION BY channel_id ORDER BY sample_idx)
    )
    """
