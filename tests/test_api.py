"""End-to-end facade test: PeakPipeline on real harness data."""

import pytest

from myodish_peak_analysis_spark.api import PeakPipeline
from myodish_peak_analysis_spark.schema import signal_frame

from tests.conftest import SF001


@pytest.fixture(scope="module")
def pipeline(spark):
    sig = signal_frame(spark, SF001, n_channels=1)
    return PeakPipeline(sig).smooth().envelopes().diastolic().detect_peaks()


def test_attributes_nonempty_with_expected_schema(pipeline):
    att = pipeline.attributes()
    assert att.columns == [
        "channel_id",
        "peak_idx",
        "timestamp",
        "peak_value",
        "baseline_value",
        "force",
        "time_to_peak",
        "time_to_relaxation",
        "duration",
    ]
    rows = att.collect()
    assert len(rows) > 0
    assert all(r.force is None or r.force > 0 or r.baseline_value is None for r in rows)


def test_averages_row_per_channel(pipeline):
    avg = pipeline.averages().collect()
    assert len(avg) == 1
    assert avg[0].n_peaks > 0
    assert avg[0].avg_duration is not None


def test_fidelity_route_runs(spark):
    sig = signal_frame(spark, SF001, n_channels=1)
    peaks = PeakPipeline(sig).fidelity_peaks().collect()
    assert len(peaks) > 0


def test_stim_normalization_scales_to_data_max(spark):
    sig = spark.createDataFrame(
        [(0, 0, 0.0, 10.0), (0, 1, 0.01, 20.0)],
        "channel_id long, sample_idx long, time_index double, signal_value double",
    )
    stim = spark.createDataFrame(
        [(0, 0, 0.0, 1.0), (0, 1, 0.01, 4.0)],
        "channel_id long, sample_idx long, time_index double, signal_value double",
    )
    out = PeakPipeline(sig, stim=stim).normalized_stim().collect()
    vals = sorted(r.signal_value for r in out)
    assert vals == [5.0, 20.0]  # scaled by max(data)/max(stim) = 20/4


def test_detect_stim_peaks_ignores_tuning_params(spark):
    sig = spark.createDataFrame(
        [(0, i, i / 100.0, float(v)) for i, v in enumerate([0, 2, 0, 3, 0])],
        "channel_id long, sample_idx long, time_index double, signal_value double",
    )
    pipe = PeakPipeline(sig, stim=sig)
    a = pipe.detect_stim_peaks().collect()
    b = pipe.detect_stim_peaks(prominence=99, min_distance=99).collect()
    assert [r.peak_idx for r in a] == [r.peak_idx for r in b] == [1, 3]


def test_constrained_detect_peaks_matches_native_find_peaks(spark):
    """constrained=True keeps exactly the native_find_peaks survivors
    that also pass the envelope threshold filter, and the kept set is a
    subset of the unconstrained detection."""
    import pyspark.sql.functions as F

    from myodish_peak_analysis_spark.operators.native_peaks import (
        native_find_peaks,
    )

    sig = signal_frame(spark, SF001, n_channels=1)
    base = PeakPipeline(sig).smooth().envelopes().diastolic()
    unconstrained = base.detect_peaks()
    constrained = base.detect_peaks(constrained=True)

    kept_u = {
        (r.channel_id, r.sample_idx)
        for r in unconstrained.df.filter("_keep").select(
            "channel_id", "sample_idx"
        ).collect()
    }
    kept_c = {
        (r.channel_id, r.sample_idx)
        for r in constrained.df.filter("_keep").select(
            "channel_id", "sample_idx"
        ).collect()
    }
    assert kept_c and kept_c <= kept_u

    finder = {
        (r.channel_id, r.peak_idx)
        for r in native_find_peaks(base.df, value_col="smooth")
        .select("channel_id", "peak_idx")
        .collect()
    }
    thresh_ok = {
        (r.channel_id, r.sample_idx)
        for r in unconstrained.df.filter("keep_peak")
        .select("channel_id", "sample_idx")
        .collect()
    }
    assert kept_c == (finder & thresh_ok)

    att = constrained.attributes()
    assert att.count() == len(kept_c)
