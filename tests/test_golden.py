"""Golden diff: the pure-Spark native route vs the reference-exact
grouped-map fidelity route must agree everywhere — values AND NaN/NULL
placement — on real harness data (SURVEY.md §5 item 1)."""

import numpy as np
import pytest

from myodish_peak_analysis_spark.operators.envelopes import (
    with_diastolic,
    with_smoothed_envelopes,
)
from myodish_peak_analysis_spark.operators.fidelity import fidelity_signal_columns
from myodish_peak_analysis_spark.operators.smooth import with_fir_smooth
from myodish_peak_analysis_spark.operators.windows import with_extrema_flags
from myodish_peak_analysis_spark.schema import signal_frame

from tests.conftest import SF001


@pytest.fixture(scope="module")
def routes(spark):
    sig = signal_frame(spark, SF001, n_channels=1)
    native = with_diastolic(
        with_smoothed_envelopes(
            with_extrema_flags(with_fir_smooth(sig), value_col="smooth"),
            flags_present=True,
        )
    )
    npdf = (
        native.select("sample_idx", "smooth", "baseline", "ceiling", "diastolic")
        .toPandas()
        .set_index("sample_idx")
        .sort_index()
    )
    fid = (
        fidelity_signal_columns(sig)
        .select("sample_idx", "smooth", "baseline", "ceiling", "diastolic")
        .toPandas()
        .set_index("sample_idx")
        .sort_index()
    )
    return npdf, fid


@pytest.mark.parametrize("col", ["smooth", "baseline", "ceiling", "diastolic"])
def test_native_matches_fidelity(routes, col):
    npdf, fid = routes
    a = npdf[col].to_numpy()
    b = fid[col].to_numpy()
    na, nb = np.isnan(a), np.isnan(b)
    assert (na == nb).all(), f"{col}: NaN placement differs"
    if (~na).any():
        assert np.abs(a[~na] - b[~na]).max() < 1e-9, f"{col}: values differ"


def test_envelope_coverage_not_degenerate(routes):
    # r1 regression: the native route produced 100% NULL envelopes.
    npdf, _ = routes
    assert npdf["baseline"].notna().mean() > 0.5
    assert npdf["ceiling"].notna().mean() > 0.5
