"""Extrema-flag unit tests on hand-computed frames (plateau midpoints,
channel edges)."""

from pyspark.sql import functions as F

from myodish_peak_analysis_spark.operators.windows import with_extrema_flags


def _flags(spark, values):
    rows = [(0, i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "channel_id long, sample_idx long, signal_value double")
    out = with_extrema_flags(df).orderBy("sample_idx").collect()
    return (
        [r.sample_idx for r in out if r.is_peak],
        [r.sample_idx for r in out if r.is_valley],
    )


def test_simple_peak_and_valley(spark):
    peaks, valleys = _flags(spark, [0, 2, 0, 3, 0])
    assert peaks == [1, 3]
    assert valleys == [2]


def test_plateau_midpoint_flagged(spark):
    peaks, _ = _flags(spark, [0, 1, 1, 1, 0])
    assert peaks == [2]


def test_even_plateau_floors_midpoint(spark):
    peaks, _ = _flags(spark, [0, 1, 1, 0])
    assert peaks == [1]  # (1+2) DIV 2


def test_channel_edges_never_flagged(spark):
    peaks, valleys = _flags(spark, [5, 1, 4])
    assert peaks == [] and valleys == [1]


def test_multi_channel_independence(spark):
    rows = [(c, i, float(v)) for c in (0, 1) for i, v in enumerate([0, 2, 0])]
    df = spark.createDataFrame(rows, "channel_id long, sample_idx long, signal_value double")
    out = with_extrema_flags(df).filter(F.col("is_peak")).collect()
    assert sorted((r.channel_id, r.sample_idx) for r in out) == [(0, 1), (1, 1)]
