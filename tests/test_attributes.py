"""Golden test for TTP/TTR crossing semantics: the Spark window
formulation must equal a direct port of the reference loop
(``/root/reference/peak_analysis.py:79-113``) on synthetic channels that
include NaN diastolic rows (the ADVICE r1 regression: NaN comparisons
are False, so a NaN row terminates a True-side walk)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from myodish_peak_analysis_spark.operators.attributes import (
    peak_attributes,
    with_crossings,
)


def reference_walk(smooth, dia, peak_idx, fs=100.0):
    """Direct port of the reference's TTP/TTR loops (NaN-compare = False)."""
    n = len(smooth)
    if peak_idx == 0 or peak_idx >= n - 2:
        return (math.nan, math.nan)

    def ge(i):
        return (
            not (math.isnan(smooth[i]) or math.isnan(dia[i]))
            and smooth[i] >= dia[i]
        )

    def le(i):
        return (
            not (math.isnan(smooth[i]) or math.isnan(dia[i]))
            and smooth[i] <= dia[i]
        )

    i = 0
    edge = ge(peak_idx)
    new_edge = not edge
    while edge != new_edge and peak_idx - i > 0:
        i += 1
        edge = ge(peak_idx - i)
    ttp = math.nan if i == 0 else i / fs

    i = 0
    edge = le(peak_idx)
    new_edge = not edge
    while edge != new_edge and peak_idx + i < n - 1:
        i += 1
        edge = le(peak_idx + i)
    ttr = math.nan if peak_idx + i == n - 1 else i / fs
    return (ttp, ttr)


def _run_spark(spark, smooth, dia, peak_idxs):
    n = len(smooth)
    rows = [
        (
            0,
            i,
            i / 100.0,
            float(smooth[i]),
            None if math.isnan(smooth[i]) else float(smooth[i]),
            None if math.isnan(dia[i]) else float(dia[i]),
            i in peak_idxs,
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "channel_id long, sample_idx long, time_index double, signal_value double, "
        "smooth double, diastolic double, is_peak boolean",
    )
    df = df.withColumn("baseline", F.col("diastolic"))
    out = peak_attributes(with_crossings(df), keep_col="is_peak")
    return {
        r.peak_idx: (r.time_to_peak, r.time_to_relaxation)
        for r in out.collect()
    }


def _check(spark, smooth, dia, peak_idxs):
    got = _run_spark(spark, smooth, dia, peak_idxs)
    for p in peak_idxs:
        exp_ttp, exp_ttr = reference_walk(smooth, dia, p)
        got_ttp, got_ttr = got[p]
        for e, g, name in ((exp_ttp, got_ttp, "ttp"), (exp_ttr, got_ttr, "ttr")):
            if math.isnan(e):
                assert g is None, f"peak {p} {name}: expected NaN, got {g}"
            else:
                assert g == pytest.approx(e), f"peak {p} {name}"


def test_simple_crossings(spark):
    dia = [1.0] * 12
    smooth = [0.5, 0.6, 2.0, 3.0, 2.0, 0.4, 0.6, 2.5, 0.3, 0.2, 0.1, 0.0]
    _check(spark, smooth, dia, [3, 7])


def test_nan_diastolic_terminates_walk(spark):
    # NaN rows sit on the False side of smooth>=dia: the backward walk
    # from an above-line peak must STOP at the NaN row, not skip it.
    nan = math.nan
    dia = [1.0, 1.0, nan, 1.0, 1.0, 1.0, nan, 1.0, 1.0, 1.0]
    smooth = [2.0, 2.0, 2.0, 2.0, 3.0, 2.0, 2.0, 2.0, 0.5, 0.5]
    _check(spark, smooth, dia, [4])


def test_peak_below_line_walks_to_above_row(spark):
    dia = [1.0] * 10
    smooth = [2.0, 2.0, 0.5, 0.6, 0.9, 0.5, 0.4, 2.0, 2.0, 0.0]
    # peak at 4 is BELOW the line: initial side of >= is False; walk
    # stops at the first row on the True side.
    _check(spark, smooth, dia, [4])


def test_no_crossing_falls_back_to_channel_start(spark):
    dia = [1.0] * 8
    smooth = [2.0, 2.1, 2.2, 2.5, 2.2, 2.1, 2.0, 2.0]
    _check(spark, smooth, dia, [3])


def test_edge_peaks_get_nulls(spark):
    dia = [1.0] * 8
    smooth = [2.0, 2.5, 2.0, 2.0, 2.0, 2.0, 2.5, 2.0]
    got = _run_spark(spark, smooth, dia, [0, 6, 7])
    assert got[6] == (None, None)  # idx >= n-2
    assert got[0] == (None, None)
    assert got[7] == (None, None)


def test_crossing_at_last_sample_is_null_ttr(spark):
    dia = [1.0] * 6
    smooth = [0.5, 2.0, 2.0, 2.0, 2.0, 0.5]
    # forward walk from peak 2 first drops below dia exactly at the
    # final sample -> reference records NaN (guard :109-110).
    got = _run_spark(spark, smooth, dia, [2])
    assert got[2][1] is None


def reference_walk_points(smooth, dia, peak_idx, fs=100.0):
    """Reference ttp_points/ttr_points (peak_analysis.py:95,113):
    (timestamp -/+ i/fs, smooth[p -/+ i]) when the attribute is non-NaN."""
    n = len(smooth)
    t = [k / fs for k in range(n)]
    if peak_idx == 0 or peak_idx >= n - 2:
        return (None, None, None, None)

    def ge(i):
        return not (math.isnan(smooth[i]) or math.isnan(dia[i])) and smooth[i] >= dia[i]

    def le(i):
        return not (math.isnan(smooth[i]) or math.isnan(dia[i])) and smooth[i] <= dia[i]

    i = 0
    edge = ge(peak_idx)
    new_edge = not edge
    while edge != new_edge and peak_idx - i > 0:
        i += 1
        edge = ge(peak_idx - i)
    ttp_pt = (t[peak_idx] - i / fs, smooth[peak_idx - i]) if i != 0 else (None, None)

    i = 0
    edge = le(peak_idx)
    new_edge = not edge
    while edge != new_edge and peak_idx + i < n - 1:
        i += 1
        edge = le(peak_idx + i)
    if peak_idx + i == n - 1:
        ttr_pt = (None, None)
    else:
        ttr_pt = (t[peak_idx] + i / fs, smooth[peak_idx + i])
    return (*ttp_pt, *ttr_pt)


def test_crossing_points_match_reference_loop(spark):
    import numpy as np

    from myodish_peak_analysis_spark.operators.attributes import (
        peak_crossing_points,
    )

    rng = np.random.default_rng(11)
    smooth = rng.normal(1.0, 1.0, 100).tolist()
    dia = rng.normal(1.0, 0.3, 100).tolist()
    dia[20] = math.nan
    peaks = [8, 30, 55, 80]
    n = len(smooth)
    rows = [
        (
            0,
            i,
            i / 100.0,
            float(smooth[i]),
            None if math.isnan(smooth[i]) else float(smooth[i]),
            None if math.isnan(dia[i]) else float(dia[i]),
            i in peaks,
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "channel_id long, sample_idx long, time_index double, signal_value double, "
        "smooth double, diastolic double, is_peak boolean",
    )
    got = {
        r.peak_idx: (r.ttp_point_t, r.ttp_point_v, r.ttr_point_t, r.ttr_point_v)
        for r in peak_crossing_points(with_crossings(df)).collect()
    }
    for p in peaks:
        exp = reference_walk_points(smooth, dia, p)
        for e, g, name in zip(exp, got[p], ("ttp_t", "ttp_v", "ttr_t", "ttr_v")):
            if e is None:
                assert g is None, f"peak {p} {name}: expected None, got {g}"
            else:
                assert g == pytest.approx(e), f"peak {p} {name}"


def test_random_channels_match_reference_loop(spark):
    rng = np.random.default_rng(7)
    smooth = rng.normal(1.0, 1.0, 120).tolist()
    dia = rng.normal(1.0, 0.3, 120).tolist()
    for k in (5, 17, 30):  # sprinkle NaNs into dia
        dia[k] = math.nan
    peaks = [10, 25, 40, 60, 90]
    _check(spark, smooth, dia, peaks)


def test_peak_interval_stats_integer_moments(spark):
    from myodish_peak_analysis_spark.operators.peaks import (
        peak_interval_stats,
    )

    peaks = spark.createDataFrame(
        # channel 1: peaks at 0, 10, 30 -> intervals 10, 20
        #   mean 15, population std 5, rate = 100/15
        # channel 2: single peak -> no row
        [(1, 0), (1, 10), (1, 30), (2, 5)],
        "channel_id long, peak_idx long",
    )
    out = {r.channel_id: r for r in peak_interval_stats(peaks).collect()}
    assert set(out) == {1}
    r = out[1]
    assert r.n_intervals == 2
    assert r.mean_ipi == 15.0
    assert r.std_ipi == 5.0
    assert r.mean_rate_hz == round(100.0 * 2 / 30, 6)
