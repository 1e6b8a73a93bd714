"""Sessionization over the events stream/table (log-analytics core op).

Not present in the reference (batch signal library), but the harness
category is log-analytics and any events-at-scale pipeline needs it.
Classic gap-based formulation, fully window-expressible:

    new_session = (ts - lag(ts)) > gap     per user, ordered by ts
    session_seq = running SUM(new_session) -- cumulative count of starts
    session_id  = (user_id, session_seq)

One shuffle (hash by user_id), one in-partition sort, no UDFs; at scale
user_id is high-cardinality so the shuffle is skew-free, and the
per-session aggregate is map-side combinable. Timestamps are truncated
to MICROSECONDS before use: the harness parquet carries nanoseconds,
which Spark reads as raw longs but DuckDB truncates to its
microsecond TIMESTAMP — so microseconds is the portable precision
(sub-microsecond gaps don't matter for sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

MICROS = 1_000_000


def with_sessions(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Add ts_us (truncated microseconds) and session_seq (1-based per
    user) via the gap rule."""
    events = events.withColumn("ts_us", F.expr("ts DIV 1000"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.lit(int(gap_seconds * MICROS))
    prev = F.lag("ts_us").over(w)
    new_session = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > gap), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def session_stats(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Per-session rollup: bounds, length, event count, value sum."""
    s = with_sessions(events, gap_seconds)
    return s.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("session_start"),
        F.max("ts_us").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.max("ts_us") - F.min("ts_us")).cast("double") / F.lit(float(MICROS))
        ).alias("duration_s"),
        # exact integer micro-units: the SUM is order-independent, so the
        # oracle compares identical integers (double summation order
        # differs between engines and flakes at round-half boundaries)
        (
            F.sum(F.round(F.round(F.col("value"), 6) * 1e6, 0).cast("long")).cast(
                "double"
            )
            / F.lit(1e6)
        ).alias("sum_value"),
    )


def sessions_sql(gap_seconds: float = 1800.0) -> str:
    """DuckDB mirror: epoch_us(ts) equals Spark's ``ts DIV 1000``
    because DuckDB already truncated the parquet nanos to micros."""
    gap = int(gap_seconds * MICROS)
    return f"""
    WITH e AS (SELECT epoch_us(ts) AS ts_n, * FROM events),
    marked AS (
        SELECT *,
               CASE WHEN lag(ts_n) OVER w IS NULL
                         OR ts_n - lag(ts_n) OVER w > {gap}
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_n, event_id)
    ),
    sess AS (
        SELECT *,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_n, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts_n) AS session_start,
           MAX(ts_n) AS session_end,
           COUNT(*) AS n_events,
           CAST(MAX(ts_n) - MIN(ts_n) AS DOUBLE) / {float(MICROS)!r} AS duration_s,
           CAST(SUM(CAST(ROUND(ROUND(value, 6) * 1e6, 0) AS BIGINT)) AS DOUBLE)
               / 1e6 AS sum_value
    FROM sess GROUP BY user_id, session_seq
    """
