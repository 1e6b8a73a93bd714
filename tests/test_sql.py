"""SQL-facade tests: registered views must match the DataFrame route and
keep Catalyst's pushdown through the view boundary."""

from myodish_peak_analysis_spark.sql import register_views

SF = "/root/testdata/sf0.001"


def test_views_match_dataframe_route(spark):
    names = register_views(spark, SF, n_channels=1)
    assert {"signal", "signal_enriched", "peaks", "peak_summary"} <= set(names)

    n_peaks = spark.sql("SELECT COUNT(*) AS n FROM peaks").collect()[0].n
    assert n_peaks > 0

    # SQL over the view == the direct DataFrame pipeline
    import __spark_entry__ as e

    direct = e.entry(spark)
    assert n_peaks == direct.count()

    summary = {
        r.channel_id: r.n_peaks
        for r in spark.sql("SELECT channel_id, n_peaks FROM peak_summary").collect()
    }
    assert sum(summary.values()) == n_peaks


def test_view_filter_pushdown(spark):
    register_views(spark, SF, n_channels=2)
    plan = spark.sql(
        "SELECT sample_idx, smooth FROM signal_enriched WHERE channel_id = 1"
    )._jdf.queryExecution().executedPlan().toString()
    # the channel filter must reach below the window stages (partition
    # filter on the window key), not sit above a full materialization
    assert "channel_id" in plan and "Filter" in plan


def test_sql_join_views(spark):
    register_views(spark, SF, n_channels=1)
    # harness tables and derived views compose in one SQL statement
    row = spark.sql(
        """
        SELECT COUNT(*) AS n
        FROM peaks p JOIN signal s
          ON p.channel_id = s.channel_id AND p.peak_idx = s.sample_idx
        """
    ).collect()[0]
    n_peaks = spark.sql("SELECT COUNT(*) AS n FROM peaks").collect()[0].n
    assert row.n == n_peaks
