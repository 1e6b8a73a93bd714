"""Savitzky–Golay smoothing as a pure-Spark FIR window expression.

The reference smooths with ``scipy.signal.savgol_filter(..., mode='nearest')``
after duplicating the first/last ``window//2`` samples as padding
(``/root/reference/peak_detection.py:185-197``). Writing the padded array as
``ypad = concat(y[:h], y, y[-h:])`` (h = window//2) and expanding the
stripped convolution gives, for output row ``j`` and tap offset
``d in [-h, h]``:

    value read = y[j+d]        if 0 <= j+d < n       (interior)
                 y[j+d+h]      if j+d < 0            (head: block pad)
                 y[j+d-h]      if j+d >= n           (tail: block pad)

(the 'nearest' extension of ``ypad`` is never consulted for the stripped
outputs). All three branches are plain ``lag``/``lead`` reads within the
channel, so the EXACT reference smooth — edges included — is expressible
as one window projection that stays inside Tungsten whole-stage codegen:
no Python boundary, no Arrow hop, reusing the single
``(channel_id, sample_idx)`` sort every other stage needs. NULL inputs
poison every output within ``window//2`` taps, matching NumPy NaN
propagation through a convolution. Channels shorter than ``window//2 + 1``
rows produce NULL edge outputs (the reference would misbehave there too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.sigproc import savgol_coeffs
from .windows import CHANNEL, IDX, channel_window


def _tap(value_col: str, offset: int, w) -> Column:
    """Read ``value_col`` at ``sample_idx + offset`` within the channel."""
    if offset == 0:
        return F.col(value_col)
    if offset > 0:
        return F.lead(value_col, offset).over(w)
    return F.lag(value_col, -offset).over(w)


def fir_smooth_col(
    value_col: str,
    window_length: int,
    polyorder: int,
    idx_col: str = IDX,
    max_idx_col: str = "_max_idx",
) -> Column:
    """Exact reference Savitzky–Golay smoothing column (block-pad edges).

    Requires a per-channel ``max_idx_col`` helper column (see
    :func:`with_fir_smooth`). The out-of-range guard tests the row *index*,
    not the lag result, so genuine NULL values still propagate
    (NaN-poisoning parity with the reference's NumPy convolution).
    """
    coeffs = savgol_coeffs(window_length, polyorder)
    half = window_length // 2
    w = channel_window()
    idx = F.col(idx_col)
    terms = []
    for k, ck in enumerate(coeffs):
        d = k - half
        if d < 0:
            tap = F.when(idx + d < 0, _tap(value_col, d + half, w)).otherwise(
                F.lag(value_col, -d).over(w)
            )
        elif d > 0:
            tap = F.when(
                idx + d > F.col(max_idx_col), _tap(value_col, d - half, w)
            ).otherwise(F.lead(value_col, d).over(w))
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
    df = df.withColumn("_max_idx", F.max(IDX).over(Window.partitionBy(CHANNEL)))
    df = df.withColumn(out_col, fir_smooth_col(value_col, window_length, polyorder))
    return df.drop("_max_idx")


def _tap_sql(value_col: str, offset: int) -> str:
    if offset == 0:
        return value_col
    if offset > 0:
        return f"lead({value_col}, {offset}) OVER w"
    return f"lag({value_col}, {-offset}) OVER w"


def fir_smooth_sql_expr(
    value_col: str,
    window_length: int,
    polyorder: int,
    max_idx_expr: str = "_max_idx",
) -> str:
    """DuckDB SQL expression mirroring :func:`fir_smooth_col` term-for-term
    (same coefficient literals, same left-to-right addition order, so both
    engines produce matching doubles up to FP contraction)."""
    coeffs = savgol_coeffs(window_length, polyorder)
    half = window_length // 2
    terms = []
    for k, ck in enumerate(coeffs):
        d = k - half
        lit = repr(float(ck))
        if d < 0:
            tap = (
                f"CASE WHEN sample_idx - {-d} < 0 THEN {_tap_sql(value_col, d + half)} "
                f"ELSE lag({value_col}, {-d}) OVER w END"
            )
        elif d > 0:
            tap = (
                f"CASE WHEN sample_idx + {d} > {max_idx_expr} THEN {_tap_sql(value_col, d - half)} "
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
               MAX(sample_idx) OVER (PARTITION BY channel_id) AS _max_idx
        FROM {src}
    ),
    smoothed AS (
        SELECT * EXCLUDE (_max_idx), {expr} AS {out_col}
        FROM bounds
        WINDOW w AS (PARTITION BY channel_id ORDER BY sample_idx)
    )
    """
