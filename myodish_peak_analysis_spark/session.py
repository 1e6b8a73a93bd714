"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the configs below are the ones that
matter identically on a 1000-executor cluster: AQE (runtime re-planning,
skew-join splitting, partition coalescing), Arrow for pandas-UDF
exchange, and a shuffle-partition count sized to the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def release_caches(spark: SparkSession) -> None:
    """Release every cache entry the operator library has accumulated.

    Cache-lifetime contract (the package-level statement of what each
    operator docstring notes locally): a few operators persist
    intermediates BY DESIGN and deliberately do not unpersist them
    before returning, because the returned DataFrame is lazy and its
    most expensive consumer pass still reads the cache —
    ``native_find_peaks(persist_input=True)`` (slim input projection),
    ``_pq_fit`` (subvector explosion), ``_ivf_fit`` (normed base).
    Spark's CacheManager dedups identical canonicalized plans, so
    repeated calls on the SAME input share one entry — but a long
    session calling them across many DISTINCT inputs accumulates
    entries (bounded by MEMORY_AND_DISK eviction, not released).
    Call this between unrelated workloads, or pass
    ``persist_input=False`` / pre-cache inputs yourself to opt out
    per call."""
    spark.catalog.clearCache()


def get_spark(
    app_name: str = "myodish-peak-analysis-spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """``extra_conf`` entries are applied to the builder and therefore
    only take effect when THIS call creates the session (configs like
    ``spark.sql.warehouse.dir`` are fixed at session creation);
    standalone tools that need one (bench_bucketing) call this first."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's parallelism-first coalescing floors partitions at
        # max(minPartitionSize, shuffleBytes / parallelism). The 1 MB
        # default is a bytes-proxy for cost; the signal operators are
        # CPU-bound (301-tap FIR HOFs, prominence walks) at ~100 B/row,
        # so small-SF shuffles collapse to 2 tasks on 32 cores. A 64 KB
        # floor restores CPU parallelism locally and is inert at scale,
        # where shuffleBytes/parallelism dominates the max().
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Harness parquet stores nanosecond timestamps; Spark 4 rejects
        # TIMESTAMP(NANOS) unless read as raw longs (VERDICT r1 item 1).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # The stage-progress bar writes \r-terminated lines to the
        # console; when a harness captures combined output into a
        # bounded tail buffer they flood it and can clobber the one
        # JSON result line bench.py emits (r5: BENCH_r05.json parsed
        # null because the tail was truncated mid-JSON). Nothing in
        # this repo reads the bar, so disable it session-wide.
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
