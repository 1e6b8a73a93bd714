"""Rolling floor/ceiling envelopes + diastolic reference (SURVEY.md §2.3, T2).

Reference semantics (``/root/reference/peak_detection.py:56-169``): for each
position ``i`` up to ``m = n - window``, look at the forward frame
``y[i : i+window]``; the floor is the min over the frame's interior local
minima, the ceiling the max over its interior local maxima; frames with no
extremum yield NaN. The truncated length-``m`` series ``raw`` is then
block-padded with ``pad = max(window, smoothing_window)//2`` copies of its
head/tail — ``padded = concat(raw[:pad], raw, raw[-pad:])`` — and
SG-smoothed (301/3, mode='nearest') WITHOUT stripping, so for the defaults
(``2*pad == window``) the output has exactly length ``n`` again but is a
*shifted* view: ``out[j]`` smooths ``raw[j-pad]`` for interior ``j``.

Spark decomposition. A frame extremum of ``y[i:i+w]`` is exactly a global
per-channel extremum whose plateau lies strictly inside the frame
(``i+1 <= j <= i+w-2``) — a conditional rolling aggregate. Expanding
``padded[j]`` gives three zones, each a frame aggregate at a different
offset:

    j < pad:            padded[j] = raw[j]       -> frame [j+1,     j+w-2]
    pad <= j < m+pad:   padded[j] = raw[j-pad]   -> frame [j+1-pad, j+w-2-pad]
    j >= m+pad:         padded[j] = raw[j-2pad]  -> frame [j+1-2pad, j+w-2-2pad]

NULL when no extremum in frame == the reference's NaN, for free. The SG
smooth of ``padded`` (nearest mode over the channel domain) is ONE
``collect_list`` over a ±150-row frame + an ``aggregate`` dot product with
the coefficient literals — a single window expression per envelope rather
than 301 ``lag``/``lead`` terms (a Catalyst plan-size hazard observed in
round 1). NULLs ride through the array as NaN sentinels and poison the
dot product exactly like the reference's NaN propagation; they convert
back to NULL on output.

Scale: everything is window functions over one (channel_id, sample_idx)
sort — no joins, no UDFs, no Python. Channels shorter than
``window + pad`` rows yield NULL envelopes (the reference itself
misbehaves below that length: its padding arithmetic needs ``m >= pad``).
The native route requires ``2*pad == window`` (true for the reference
defaults 350/301); other combinations break the reference's own
length-restoration trick — use the fidelity route for those.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.sigproc import savgol_coeffs
from .windows import CHANNEL, IDX, channel_window, with_extrema_flags

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
    """Conditional rolling min/max over the forward frame interior —
    the reference's pre-padding ``raw`` envelope evaluated at every row
    (only rows with ``sample_idx <= n - window - 1`` carry reference
    semantics; later rows see a truncated frame)."""
    if not flags_present:
        df = with_extrema_flags(df, value_col=value_col)
    w = channel_window().rowsBetween(1, window_size - 2)
    v = F.col(value_col)
    return df.withColumn(
        floor_col, F.min(F.when(F.col("is_valley"), v)).over(w)
    ).withColumn(ceil_col, F.max(F.when(F.col("is_peak"), v)).over(w))


def _padded_envelope_col(
    value_col: str,
    kind: str,
    window_size: int,
    pad: int,
) -> Column:
    """The reference's block-padded raw envelope as a three-zone CASE of
    conditional frame aggregates. Requires ``_n`` per-channel row count."""
    flag = F.col("is_peak" if kind == "peak" else "is_valley")
    v = F.when(flag, F.col(value_col))
    agg = F.max if kind == "peak" else F.min
    w = channel_window()
    hi = window_size - 2
    zone_a = agg(v).over(w.rowsBetween(1, hi))
    # zone_b's frame [j+1-pad, j+hi-pad] is zone_a's frame evaluated at
    # row j-pad, and in zone_b's whole usage range (pad <= j <
    # n-window+pad) that row exists and its frame is never clipped — so
    # an O(n) lag of zone_a replaces a second O(n·w) sliding aggregate
    # with bit-identical values (min/max are order-insensitive). zone_c
    # (tail rows only) can NOT use lag(zone_a, 2*pad): for
    # n < window+2*pad its true frame clips at the partition start,
    # which the lag would turn into NULL instead of the clipped extreme.
    zone_b = F.lag(zone_a, pad).over(w)
    if 2 * pad == window_size:
        # zone_c's frame [j+1-2pad, j+hi-2pad] is zone_a's frame at row
        # j-2pad. Under the native route's 2*pad == window invariant the
        # lag is bit-identical ON EVERY USAGE ROW (the CASE's otherwise
        # branch: j >= n-pad with n >= 3pad, so j-2pad >= 0 exists and
        # the frame neither start- nor end-clips — verified empirically
        # across channel lengths 525..1200 straddling all boundary
        # regimes), replacing the second O(n·w) sliding aggregate with
        # an O(n) lag, exactly like zone_b.
        zone_c = F.lag(zone_a, 2 * pad).over(w)
    else:
        zone_c = agg(v).over(w.rowsBetween(1 - 2 * pad, hi - 2 * pad))
    n, idx = F.col("_n"), F.col(IDX)
    return (
        F.when(n < window_size + pad, F.lit(None).cast("double"))
        .when(idx < pad, zone_a)
        .when(idx < n - window_size + pad, zone_b)
        .otherwise(zone_c)
    )


def _sg_smooth_array_col(
    value_col: str,
    smoothing_window_length: int,
    polyorder: int,
) -> Column:
    """SG smooth with 'nearest' edges as ONE collect_list window + an
    aggregate dot product. NULL inputs ride as NaN sentinels (collect_list
    drops NULLs, NaN keeps alignment) and poison the sum; the caller maps
    NaN back to NULL. Requires ``_max_idx`` helper column."""
    coeffs = savgol_coeffs(smoothing_window_length, polyorder)
    half = smoothing_window_length // 2
    w = channel_window()
    nan = F.lit(float("nan"))
    nanv = F.coalesce(F.col(value_col), nan)
    arr = F.collect_list(nanv).over(w.rowsBetween(-half, half))
    first_v = F.first(nanv).over(w.rowsBetween(Window.unboundedPreceding, 0))
    # nanv is never NULL (coalesced to NaN), so the channel-tail value is
    # the last row of the WHOLE partition — the unbounded-both frame is
    # Spark's O(n) entire-partition path, vs the O(n^2) per-row rescan an
    # UnboundedFollowing frame ((0, unboundedFollowing)) would cost.
    last_v = F.last(nanv).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    idx = F.col(IDX)
    left_miss = F.greatest(F.lit(0), F.lit(half) - idx).cast("int")
    right_miss = F.greatest(F.lit(0), idx + half - F.col("_max_idx")).cast("int")
    full = F.concat(
        F.array_repeat(first_v, left_miss), arr, F.array_repeat(last_v, right_miss)
    )
    coeff_arr = F.array(*[F.lit(float(c)) for c in coeffs])
    dot = F.aggregate(
        F.zip_with(full, coeff_arr, lambda x, c: x * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(F.isnan(dot), F.lit(None).cast("double")).otherwise(dot)


def with_smoothed_envelopes(
    df: DataFrame,
    value_col: str = "smooth",
    window_size: int = DEFAULT_WINDOW,
    smoothing_window_length: int = DEFAULT_SMOOTH,
    polyorder: int = DEFAULT_POLY,
    flags_present: bool = False,
) -> DataFrame:
    """baseline/ceiling = the reference's padded + SG-smoothed envelopes
    (defaults 350/301/3, ``/root/reference/peak_detection.py:15``),
    reproduced exactly — including the ~``pad``-sample shift its padding
    introduces for interior rows (see module docstring).

    (A merged formulation sharing one collect_list of (floor, ceil)
    structs between the two smooths was measured at sf0.1 and rejected:
    2.16 s vs 2.18 s — the cost lives in the two 301-term dot products,
    not the window buffer, so the struct plumbing bought nothing.)"""
    pad = max(window_size, smoothing_window_length) // 2
    if 2 * pad != window_size:
        raise ValueError(
            "native envelope route requires 2*max(window,smooth)//2 == window "
            f"(got window={window_size}, smooth={smoothing_window_length}); "
            "use operators.fidelity for non-default parameters"
        )
    if not flags_present:
        df = with_extrema_flags(df, value_col=value_col)
    wall = Window.partitionBy(CHANNEL)
    df = df.withColumn("_n", F.count(F.lit(1)).over(wall)).withColumn(
        "_max_idx", F.max(IDX).over(wall)
    )
    for kind, out in (("valley", "baseline"), ("peak", "ceiling")):
        padded = _padded_envelope_col(value_col, kind, window_size, pad)
        df = df.withColumn(f"_pad_{out}", padded)
        df = df.withColumn(
            out,
            _sg_smooth_array_col(f"_pad_{out}", smoothing_window_length, polyorder),
        ).drop(f"_pad_{out}")
    return df.drop("_n", "_max_idx")


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


def _frame_sql(lo: int, hi: int) -> str:
    def b(k: int) -> str:
        if k < 0:
            return f"{-k} PRECEDING"
        if k == 0:
            return "CURRENT ROW"
        return f"{k} FOLLOWING"

    return (
        f"OVER (PARTITION BY channel_id ORDER BY sample_idx "
        f"ROWS BETWEEN {b(lo)} AND {b(hi)})"
    )


def _coeffs_sql_lit(smoothing_window_length: int, polyorder: int) -> str:
    coeffs = savgol_coeffs(smoothing_window_length, polyorder)
    return "[" + ", ".join(repr(float(c)) for c in coeffs) + "]::DOUBLE[]"


def smoothed_envelopes_sql_cte(
    src_flagged: str,
    value_col: str = "smooth",
    window_size: int = DEFAULT_WINDOW,
    smoothing_window_length: int = DEFAULT_SMOOTH,
    polyorder: int = DEFAULT_POLY,
) -> str:
    """CTE chain ending in ``envsmooth`` with baseline/ceiling columns,
    mirroring :func:`with_smoothed_envelopes` construct-for-construct:
    NaN-sentinel values collected by a windowed ``list()`` (frame order,
    NULLs preserved as NaN), nearest-clamp edge repair via
    ``list_transform(range(missing), …)`` repeats, and one
    ``list_dot_product`` against the coefficient literal — 2 window
    expressions total instead of 602 lag/lead terms (which were both a
    binder-recursion hazard and a memory hog in DuckDB)."""
    pad = max(window_size, smoothing_window_length) // 2
    hi = window_size - 2
    min_n = window_size + pad
    half = smoothing_window_length // 2
    coeffs = _coeffs_sql_lit(smoothing_window_length, polyorder)

    def zones(agg: str, flag: str) -> tuple[str, str, str]:
        e = f"{agg}(CASE WHEN {flag} THEN {value_col} END)"
        return (
            f"{e} {_frame_sql(1, hi)}",
            f"{e} {_frame_sql(1 - pad, hi - pad)}",
            f"{e} {_frame_sql(1 - 2 * pad, hi - 2 * pad)}",
        )

    fa, fb, fc = zones("MIN", "is_valley")
    ca, cb, cc = zones("MAX", "is_peak")

    def full_arr(prefix: str) -> str:
        return (
            f"list_concat(list_concat("
            f"list_transform(range(greatest(0, {half} - sample_idx)), i -> {prefix}first), "
            f"{prefix}arr), "
            f"list_transform(range(greatest(0, sample_idx + {half} - _max_idx)), i -> {prefix}last))"
        )

    def out_expr(prefix: str) -> str:
        dot = f"list_dot_product({full_arr(prefix)}, {coeffs})"
        return f"CASE WHEN isnan({dot}) THEN NULL ELSE {dot} END"

    return f"""
    envzones AS (
        SELECT *,
               COUNT(*) OVER (PARTITION BY channel_id) AS _n,
               MAX(sample_idx) OVER (PARTITION BY channel_id) AS _max_idx,
               {fa} AS _fza, {fb} AS _fzb, {fc} AS _fzc,
               {ca} AS _cza, {cb} AS _czb, {cc} AS _czc
        FROM {src_flagged}
    ),
    envpad AS (
        SELECT * EXCLUDE (_fza, _fzb, _fzc, _cza, _czb, _czc),
               COALESCE(CASE WHEN _n < {min_n} THEN NULL
                    WHEN sample_idx < {pad} THEN _fza
                    WHEN sample_idx < _n - {window_size} + {pad} THEN _fzb
                    ELSE _fzc END, 'NaN'::DOUBLE) AS _fpad,
               COALESCE(CASE WHEN _n < {min_n} THEN NULL
                    WHEN sample_idx < {pad} THEN _cza
                    WHEN sample_idx < _n - {window_size} + {pad} THEN _czb
                    ELSE _czc END, 'NaN'::DOUBLE) AS _cpad
        FROM envzones
    ),
    envarr AS (
        SELECT *,
               list(_fpad) OVER wfr AS _farr,
               list(_cpad) OVER wfr AS _carr,
               first_value(_fpad) OVER wh AS _ffirst,
               last_value(_fpad) OVER wt AS _flast,
               first_value(_cpad) OVER wh AS _cfirst,
               last_value(_cpad) OVER wt AS _clast
        FROM envpad
        WINDOW wfr AS (PARTITION BY channel_id ORDER BY sample_idx
                       ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING),
               wh AS (PARTITION BY channel_id ORDER BY sample_idx),
               wt AS (PARTITION BY channel_id ORDER BY sample_idx
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    envsmooth AS (
        SELECT * EXCLUDE (_n, _max_idx, _fpad, _cpad, _farr, _carr,
                          _ffirst, _flast, _cfirst, _clast),
               {out_expr('_f')} AS baseline,
               {out_expr('_c')} AS ceiling
        FROM envarr
    )
    """
