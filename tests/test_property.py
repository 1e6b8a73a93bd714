"""Property tests (SURVEY.md §5 item 3): envelope ordering, threshold
monotonicity, amplitude-scaling invariance."""

import pytest
from pyspark.sql import functions as F

from myodish_peak_analysis_spark.operators.envelopes import (
    with_diastolic,
    with_smoothed_envelopes,
)
from myodish_peak_analysis_spark.operators.peaks import (
    naive_peaks,
    with_threshold_keep,
)
from myodish_peak_analysis_spark.operators.smooth import with_fir_smooth
from myodish_peak_analysis_spark.operators.windows import with_extrema_flags
from myodish_peak_analysis_spark.schema import signal_frame

from tests.conftest import SF001


@pytest.fixture(scope="module")
def enveloped(spark):
    sig = signal_frame(spark, SF001, n_channels=1)
    df = with_extrema_flags(with_fir_smooth(sig), value_col="smooth")
    return with_diastolic(with_smoothed_envelopes(df, flags_present=True)).cache()


def test_baseline_le_diastolic_le_ceiling(enveloped):
    bad = enveloped.filter(
        F.col("baseline").isNotNull()
        & F.col("ceiling").isNotNull()
        & (
            (F.col("diastolic") < F.col("baseline") - 1e-9)
            | (F.col("diastolic") > F.col("ceiling") + 1e-9)
        )
        & (F.col("baseline") <= F.col("ceiling"))
    ).count()
    assert bad == 0


def test_higher_threshold_keeps_fewer_peaks(enveloped):
    counts = []
    for t in (0.3, 0.7, 0.9):
        kept = (
            with_threshold_keep(enveloped, value_col="smooth", threshold=t)
            .filter(F.col("is_peak") & F.col("keep_peak"))
            .count()
        )
        counts.append(kept)
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[0] > 0


def test_peak_count_invariant_under_amplitude_scaling(spark):
    sig = signal_frame(spark, SF001, n_channels=1)
    n1 = naive_peaks(sig).count()
    scaled = sig.withColumn("signal_value", F.col("signal_value") * 3.0)
    n2 = naive_peaks(scaled).count()
    assert n1 == n2 > 0
