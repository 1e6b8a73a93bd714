"""Schemas and readers for the harness tables + the channelized signal frame.

The reference's data model is a list of per-channel pandas frames with
columns ``time_index``/``signal_value`` (``/root/reference/utils.py:15-18``).
Here that becomes ONE long DataFrame keyed by ``channel_id`` — channels
are the parallelism unit (SURVEY.md §1.3) — with an explicit
``sample_idx`` so every windowed operator can order deterministically
instead of relying on positional list alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

#: Canonical signal schema (SURVEY.md §1.3).
SIGNAL_SCHEMA = StructType(
    [
        StructField("channel_id", LongType(), False),
        StructField("sample_idx", LongType(), False),
        StructField("time_index", DoubleType(), False),
        StructField("signal_value", DoubleType(), False),
    ]
)

HARNESS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Default sampling rate; the reference hardcodes 100 Hz
#: (``/root/reference/peak_analysis.py:94,112``).
DEFAULT_FS = 100.0


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one harness table; Catalyst handles column pruning
    and predicate pushdown on top of this.

    Defensively enables nanosecond-as-long parquet reads on the GIVEN
    session: the driver supplies its own SparkSession (not our
    :func:`~myodish_peak_analysis_spark.session.get_spark`), and without
    this conf Spark 4 throws PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
    columns (some harness generations carry them; current data is
    TIMESTAMP(MICROS) where the conf is a no-op).

    Also pins the session timezone to UTC: every events-derived query is
    oracle-compared against DuckDB's ``epoch_us`` (naive wall time read
    as UTC), and Spark's implicit NTZ->LTZ casts go through the session
    timezone — under a non-UTC driver session, wall times inside a DST
    gap of that zone are unrepresentable and shift (verified: NTZ
    2024-03-10 02:30 under America/New_York). :func:`ts_micros` is
    session-tz-independent for all other wall times on its own; the pin
    closes the DST-gap residual and keeps date_trunc/bucket functions
    aligned with the oracle too."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_micros(df: DataFrame, col: str = "ts") -> F.Column:
    """Microseconds-since-epoch of the ``events.ts`` column, whatever
    physical type the harness parquet carries this generation:

    - ``long`` (TIMESTAMP(NANOS) read via nanosAsLong): integer-DIV 1000 —
      matches DuckDB, which truncates parquet nanos to its micro TIMESTAMP.
    - ``timestamp_ntz`` (TIMESTAMP(MICROS), isAdjustedToUTC=false):
      ``from_utc_timestamp(ts, current_timezone())`` reinterprets the naive
      wall time as a UTC instant — exactly DuckDB's ``epoch_us(ts)``. The
      implicit NTZ->LTZ cast shifts by the session offset; from_utc_timestamp
      shifts back by the same offset, so the result is session-timezone-
      independent (verified value-equal against DuckDB under UTC /
      America/New_York / Asia/Tokyo; the sole exception is a wall time
      falling inside a DST *gap* of a non-UTC session zone, which the
      NTZ->LTZ cast cannot represent — closed by :func:`read_table`
      pinning the session to UTC).
    - ``timestamp`` (LTZ): plain ``unix_micros``.

    Always a JVM-side expression on the scan output; no shuffle, stays
    inside whole-stage codegen.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.unix_micros(
            F.from_utc_timestamp(F.col(col), F.expr("current_timezone()"))
        )
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col))
    return F.expr(f"{col} DIV 1000")


#: Minimum per-channel rows for the native envelope route to be non-NULL
#: (window + pad with the reference defaults 350/301).
MIN_CHANNEL_ROWS = 525

#: Target rows per channel for auto-channelization: comfortably above
#: MIN_CHANNEL_ROWS, small enough that one channel (a few MB of doubles)
#: always fits an executor — the honest memory bound for the per-channel
#: fidelity route.
TARGET_CHANNEL_ROWS = 2000


def auto_channels(spark: SparkSession, sf_dir: str) -> int:
    """Data-proportional channel count: ``rows / TARGET_CHANNEL_ROWS``.

    At 100 TB this is millions of channels of *bounded* length —
    parallelism grows linearly with data while the per-channel memory
    contract stays constant. (A fixed small modulus, round 1's
    ``user_id % 8``, caps the whole pipeline at 8 concurrent tasks and
    makes one channel grow with the dataset — fatal at scale.) The row
    count is a metadata-only parquet count, not a full scan.
    """
    n = read_table(spark, sf_dir, "events").count()
    return max(1, n // TARGET_CHANNEL_ROWS)


def signal_frame(
    spark: SparkSession,
    sf_dir: str,
    n_channels: int = 8,
    fs: float = DEFAULT_FS,
) -> DataFrame:
    """Channelize the ``events`` table into the canonical signal frame.

    channel_id = user_id % n_channels; within a channel, samples are
    ordered by (ts, event_id) — event_id breaks timestamp ties
    deterministically — and re-indexed 0..n-1 at a uniform ``fs``.

    ``n_channels`` must scale with the data (use :func:`auto_channels`);
    the fixed default 8 exists only so the DuckDB oracle SQL — which needs
    a literal — and the Spark query agree at the driver's sf0.01 check
    (10k rows / 8 = 1250 rows/channel >= MIN_CHANNEL_ROWS).

    Scale note: one shuffle on channel_id; every downstream window op
    reuses the same (partitionBy channel_id, orderBy sample_idx) spec so
    Catalyst plans a single sort per channel partition.
    """
    events = read_table(spark, sf_dir, "events")
    return signal_frame_from_events(events, n_channels=n_channels, fs=fs)


def signal_frame_from_events(
    events: DataFrame,
    n_channels: int,
    fs: float = DEFAULT_FS,
) -> DataFrame:
    """Channelize an already-loaded ``events`` frame — the DF-input core
    of :func:`signal_frame`, used directly by synthetic-scale tooling
    (``tools/bench_scaling.py``) that builds events frames Spark-side."""
    # Order by MICROSECOND ts (the resolution both engines share — with a
    # nanos parquet, Spark sees raw longs while DuckDB truncates to its
    # microsecond TIMESTAMP, so a same-microsecond pair whose event_id
    # order differs from its nanosecond order would get swapped sample_idx
    # values). Microseconds + event_id is the portable sort key.
    w = Window.partitionBy("channel_id").orderBy("ts_us", "event_id")
    base = events.select(
        (F.col("user_id") % F.lit(n_channels)).cast("long").alias("channel_id"),
        ts_micros(events).alias("ts_us"),
        F.col("event_id"),
        F.col("value").cast("double").alias("signal_value"),
    )
    # RANGE-partition by channel before the channelization window
    # (round 12, measured): hash partitioning deals n channels into
    # shuffle-partition buckets with birthday collisions — at 50
    # channels over 32 buckets one bucket measured FIVE channels, and
    # that bucket's task is the straggler behind the peaks family's
    # wide rep spreads (envelopes fresh-scan [6.67, 11.31] s hash vs
    # [5.69, 6.33] ranged at sf0.1; docs/PLANS.md "Round-12 channel
    # partitioning"). RangePartitioning(channel_id) satisfies the
    # window's ClusteredDistribution just like hash, so the window
    # reuses it with NO extra exchange — same shuffle count, balanced
    # by rows instead of by hash luck, and every downstream
    # channel-keyed window/groupBy inherits the balance. One channel
    # per partition while channels are few, capped at 2× parallelism.
    #
    # Regime cutoff, also measured: the collision pathology needs
    # channels ≈ buckets. Once channels ≫ buckets the law of large
    # numbers balances hash anyway (50k uniform channels into 32
    # buckets is ±3%), and range's extra sampling pass over the full
    # input is pure cost — the 100M-row/50k-channel decade read
    # 27.9 s hash vs [31.8, 38.5] ranged. So range applies only while
    # n_channels is within 8× of the partition budget; beyond that the
    # window's own hash exchange is already the right plan. (Skewed
    # channel SIZES at high channel counts would revisit this — the
    # harness and the reference's episodic data are uniform.)
    par = events.sparkSession.sparkContext.defaultParallelism
    n_parts = int(min(n_channels, max(2 * par, 8)))
    if n_channels <= 8 * n_parts:
        base = base.repartitionByRange(n_parts, "channel_id")
    return (
        base
        .withColumn("sample_idx", (F.row_number().over(w) - F.lit(1)).cast("long"))
        .withColumn("time_index", F.col("sample_idx") / F.lit(float(fs)))
        .select("channel_id", "sample_idx", "time_index", "signal_value")
    )


def signal_frame_sql(n_channels: int = 8, fs: float = DEFAULT_FS) -> str:
    """DuckDB-oracle equivalent of :func:`signal_frame` (a CTE body)."""
    return f"""
    SELECT
        CAST(user_id % {n_channels} AS BIGINT) AS channel_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY user_id % {n_channels} ORDER BY ts, event_id) - 1 AS BIGINT) AS sample_idx,
        CAST((ROW_NUMBER() OVER (PARTITION BY user_id % {n_channels} ORDER BY ts, event_id) - 1) AS DOUBLE) / {fs} AS time_index,
        CAST(value AS DOUBLE) AS signal_value
    FROM events
    """
