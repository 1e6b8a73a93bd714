"""Sink tests: selection/limit logic without a renderer, durable
parquet round-trip with partition pruning."""

import os

import pytest
from pyspark.sql import functions as F

from myodish_peak_analysis_spark import sinks
from myodish_peak_analysis_spark.api import PeakPipeline
from myodish_peak_analysis_spark.schema import signal_frame

from tests.conftest import SF001


@pytest.fixture(scope="module")
def detected(spark):
    sig = signal_frame(spark, SF001, n_channels=1)
    pipe = PeakPipeline(sig).smooth().envelopes().diastolic().detect_peaks()
    return pipe.df.cache(), pipe.attributes().cache()


def test_detection_view_collects_one_channel(detected):
    signal, peaks = detected
    sig_pdf, peaks_pdf = sinks.detection_view(signal, channel_id=0, peaks=peaks)
    assert {"signal_value", "smooth", "baseline", "ceiling"} <= set(sig_pdf.columns)
    assert len(sig_pdf) == 1000
    assert len(peaks_pdf) > 0


def test_collect_limit_guard(detected):
    signal, _ = detected
    import myodish_peak_analysis_spark.sinks as s

    with pytest.raises(ValueError):
        s._collect(signal, limit=10)


def test_beat_times_flags_select_series(detected):
    _, peaks = detected
    pdf = sinks.beat_times_view(peaks, 0, ttp=True)
    assert list(pdf.columns) == ["timestamp", "time_to_peak"]
    pdf = sinks.beat_times_view(peaks, 0, show_all=True)
    assert {"time_to_peak", "time_to_relaxation", "duration"} <= set(pdf.columns)


def test_figure_requires_plotly(detected):
    signal, _ = detected
    if not sinks.HAVE_PLOTLY:
        with pytest.raises(ImportError):
            sinks.detection_view(signal, 0, to_figure=True)


def test_write_parquet_partitioned(detected, spark, tmp_path):
    _, peaks = detected
    path = os.path.join(str(tmp_path), "peaks")
    sinks.write_parquet(peaks, path)
    back = spark.read.parquet(path)
    assert back.count() == peaks.count()
    # partition pruning: channel filter must hit PartitionFilters
    plan = back.filter(F.col("channel_id") == 0)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(channel_id" in plan


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the join key must hash-join with ZERO
    Exchange nodes — the plan-level proof that bucketing removes the
    shuffle for repeated joins (docs/SCALE.md)."""
    from myodish_peak_analysis_spark.sinks import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS vb")
        write_bucketed(a, "bk_a", "k", n_buckets=4, sort_by="k")
        write_bucketed(b, "bk_b", "k", n_buckets=4, sort_by="k")
        j = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
        import shutil

        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_write_sized_rolls_files_and_bounds_count(spark, tmp_path):
    import glob
    import os

    from myodish_peak_analysis_spark.sinks import write_sized

    df = spark.range(1000).selectExpr("id", "id % 3 AS lang")
    out = os.path.join(str(tmp_path), "sized")
    write_sized(
        df, out, partition_by=("lang",), max_records_per_file=100, target_files=2
    )
    files = glob.glob(os.path.join(out, "lang=*", "*.parquet"))
    per_part: dict = {}
    for f in files:
        part = f.split("lang=")[1].split("/")[0]
        per_part[part] = per_part.get(part, 0) + 1
    # each lang has ~333 rows: cap of 100 rows/file forces >= 4 files,
    # and the pre-write repartition(2, lang) bounds it (2 tasks hold one
    # lang each wholly -> exactly ceil(333/100) + tail rounding)
    assert set(per_part) == {"0", "1", "2"}
    assert all(4 <= n <= 8 for n in per_part.values()), per_part
    back = spark.read.parquet(out)
    assert back.count() == 1000


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """The partition-pruning contract of write_parquet(partition_by=...):
    a filter on the partition column must become a PartitionFilter
    (pruned at file listing), not a data filter over all rows."""
    import os

    from myodish_peak_analysis_spark.schema import read_table
    from myodish_peak_analysis_spark.sinks import write_parquet

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    path = os.path.join(str(tmp_path), "by_source")
    write_parquet(docs, path, partition_by=("source",))
    one = docs.select("source").first()["source"]
    back = spark.read.parquet(path).filter(f"source = '{one}'")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters, and the
    # row-level PushedFilters must NOT need it
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "source" in pf
    n_src = docs.filter(f"source = '{one}'").count()
    assert back.count() == n_src
