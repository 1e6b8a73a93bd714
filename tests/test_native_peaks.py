"""JVM-side constrained peak finder vs the NumPy sigproc kernels.

The sigproc kernels are themselves golden-matched to the reference's
SciPy usage (tests/test_sigproc.py), so equality here transitively pins
operators/native_peaks.py to /root/reference/peak_detection.py:251
semantics — plateau midpoints, greedy distance suppression, wlen-bounded
prominence bases, and interpolated widths at rel_height.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from myodish_peak_analysis_spark.functions import sigproc
from myodish_peak_analysis_spark.operators.native_peaks import (
    candidate_maxima,
    native_find_peaks,
)


def _frame(spark, channels: dict[int, np.ndarray]):
    pdf = pd.concat(
        pd.DataFrame(
            {
                "channel_id": ch,
                "sample_idx": np.arange(y.size, dtype=np.int64),
                "smooth": y,
            }
        )
        for ch, y in channels.items()
    )
    return spark.createDataFrame(pdf)


def _signals(seed: int = 7, n_channels: int = 6) -> dict[int, np.ndarray]:
    rng = np.random.default_rng(seed)
    out = {}
    for ch in range(n_channels):
        n = int(rng.integers(50, 2500))
        y = np.cumsum(rng.normal(0, 1, n)) + 3 * np.sin(np.arange(n) / 25.0)
        if ch % 2 == 0:
            y = np.round(y, 1)  # quantize → plateaus
        out[ch] = y
    return out


def test_candidate_maxima_matches_plateau_kernel(spark):
    channels = _signals()
    got = candidate_maxima(_frame(spark, channels)).toPandas()
    for ch, y in channels.items():
        mids, _, _ = sigproc.local_maxima_plateau(y)
        sub = np.sort(got[got.channel_id == ch].peak_idx.to_numpy())
        assert np.array_equal(sub, mids), f"channel {ch}"


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(distance=20, prominence=None, width=None),
        dict(distance=20, prominence=0.3, width=None),
        dict(distance=None, prominence=0.3, width=1.0),
        dict(distance=None, prominence=None, width=1.0),
        dict(distance=20, prominence=0.3, width=1.0),
    ],
)
def test_native_find_peaks_matches_numpy(spark, kwargs):
    channels = _signals()
    got = (
        native_find_peaks(_frame(spark, channels), rel_height=0.3, wlen=250, **kwargs)
        .toPandas()
        .sort_values(["channel_id", "peak_idx"])
    )
    for ch, y in channels.items():
        exp = sigproc.find_peaks(y, rel_height=0.3, wlen=250, **kwargs)
        sub = got[got.channel_id == ch].peak_idx.to_numpy()
        assert np.array_equal(sub, exp), f"channel {ch}: {kwargs}"


def test_prominence_and_width_values_match_numpy(spark):
    channels = _signals(seed=11, n_channels=3)
    got = (
        native_find_peaks(
            _frame(spark, channels), distance=20, prominence=0.3, width=1.0
        )
        .toPandas()
        .sort_values(["channel_id", "peak_idx"])
    )
    for ch, y in channels.items():
        cand, _, _ = sigproc.local_maxima_plateau(y)
        keep = sigproc._select_by_distance(cand, y[cand], 20)
        peaks = cand[keep]
        proms, lb, rb = sigproc.peak_prominences(y, peaks, 250)
        widths = sigproc.peak_widths(y, peaks, 0.3, proms, lb, rb)
        mask = (proms >= 0.3) & (widths >= 1.0)
        sub = got[got.channel_id == ch]
        assert np.array_equal(sub.peak_idx.to_numpy(), peaks[mask])
        np.testing.assert_allclose(
            sub.prominence.to_numpy(), proms[mask], rtol=0, atol=1e-9
        )
        np.testing.assert_allclose(
            sub.width.to_numpy(), widths[mask], rtol=0, atol=1e-9
        )


def test_unbounded_wlen(spark):
    channels = _signals(seed=3, n_channels=2)
    got = (
        native_find_peaks(
            _frame(spark, channels),
            distance=None,
            prominence=0.5,
            width=None,
            wlen=None,
        )
        .toPandas()
        .sort_values(["channel_id", "peak_idx"])
    )
    for ch, y in channels.items():
        exp = sigproc.find_peaks(y, prominence=0.5)
        sub = got[got.channel_id == ch].peak_idx.to_numpy()
        assert np.array_equal(sub, exp), f"channel {ch}"


def test_validation_mirrors_scipy(spark):
    df = _frame(spark, {0: np.arange(10.0)})
    with pytest.raises(ValueError, match="distance"):
        native_find_peaks(df, distance=0)
    with pytest.raises(ValueError, match="wlen"):
        native_find_peaks(df, wlen=1)


def test_edge_case_battery(spark):
    """Adversarial channel shapes in one frame: plateaus at borders,
    priority ties inside the distance radius, monotones, constants."""
    cases = {
        0: np.full(30, 5.0),                     # constant — no peaks
        1: np.arange(30, dtype=float),           # monotone up
        2: np.arange(30, dtype=float)[::-1],     # monotone down
        3: np.array([0, 3, 3, 3, 0, 1, 0] * 5, dtype=float),  # plateaus
        4: np.array([0.0] * 10 + [7, 7] + [0.0] * 10),  # even plateau
        5: np.array([0, 5, 0, 5, 0, 5, 0], dtype=float),  # ties within 20
        6: np.array([1, 9, 1], dtype=float),     # peak at idx 1 (n=3)
        7: np.concatenate([[9.0], np.zeros(10), [8.0, 9.0]]),  # border highs
        8: np.array([0, 1, 2, 3, 2, 1, 0, 1, 2, 3, 2, 1, 0] * 4, float),
    }
    got = (
        native_find_peaks(
            _frame(spark, cases), distance=3, prominence=0.5, width=1.0,
            rel_height=0.5, wlen=7,
        )
        .toPandas()
        .sort_values(["channel_id", "peak_idx"])
    )
    for ch, y in cases.items():
        exp = sigproc.find_peaks(
            y, distance=3, prominence=0.5, width=1.0, rel_height=0.5, wlen=7
        )
        sub = got[got.channel_id == ch].peak_idx.to_numpy()
        assert np.array_equal(sub, exp), f"channel {ch}: got {sub} exp {exp}"


def test_persist_flag_does_not_change_results(spark):
    """persist_input=True (default) must be a pure performance knob."""
    frame = _frame(spark, _signals(seed=13))
    a = native_find_peaks(frame, persist_input=True).collect()
    b = native_find_peaks(frame, persist_input=False).collect()
    assert sorted(
        [(r.channel_id, r.peak_idx, r.peak_value, r.prominence, r.width) for r in a]
    ) == sorted(
        [(r.channel_id, r.peak_idx, r.peak_value, r.prominence, r.width) for r in b]
    )
