"""Presentation and durable sinks (SURVEY.md §2.1 S3/S4).

The reference renders interactive Plotly figures from in-memory lists
(``/root/reference/peak_detection.py:301-487``,
``peak_analysis.py:139-197``). In the engine these are *sinks*: the
distributed frame is reduced to one channel / the (small) peak table,
collected to the driver as pandas, and handed to Plotly — which is
import-gated because it is presentation-only and absent in the build
environment. Every function returns the collected pandas data so the
selection/limit logic is testable without a renderer; ``to_figure=True``
additionally returns the Plotly figure.

Durable sink: plain partitioned parquet via :func:`write_parquet`.

Reference bug NOT replicated: ``plot_beat_times_evolution``'s boolean
``ttp/ttr/duration`` flags are shadowed by data lists at
``peak_analysis.py:182-184`` (the flags are dead); here the flags work.
Also the reference reads the hard-coded column ``signal_value`` at
``peak_detection.py:362`` regardless of the configured signal column —
here the configured name is honored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

try:  # presentation-only dependency; absent in the build environment
    import plotly.graph_objects as go  # type: ignore

    HAVE_PLOTLY = True
except Exception:  # noqa: BLE001
    go = None
    HAVE_PLOTLY = False

#: Refuse to collect more than this many rows to the driver — plots are
#: per-channel views, not dataset dumps.
MAX_COLLECT_ROWS = 2_000_000


def _collect(df: DataFrame, limit: int = MAX_COLLECT_ROWS):
    pdf = df.limit(limit + 1).toPandas()
    if len(pdf) > limit:
        raise ValueError(
            f"refusing to collect >{limit} rows to the driver; "
            "filter to one channel or raise the limit explicitly"
        )
    return pdf


def detection_view(
    signal: DataFrame,
    channel_id: int,
    peaks: DataFrame | None = None,
    to_figure: bool = False,
):
    """S3: one channel's raw/smooth/baseline/ceiling/diastolic traces +
    its peak markers, collected for rendering."""
    cols = [
        c
        for c in ("sample_idx", "time_index", "signal_value", "smooth",
                  "baseline", "ceiling", "diastolic")
        if c in signal.columns
    ]
    sig_pdf = _collect(
        signal.filter(F.col("channel_id") == channel_id).select(*cols).orderBy(
            "sample_idx"
        )
    )
    peaks_pdf = None
    if peaks is not None:
        peaks_pdf = _collect(
            peaks.filter(F.col("channel_id") == channel_id).orderBy("peak_idx")
        )
    if not to_figure:
        return sig_pdf, peaks_pdf
    if not HAVE_PLOTLY:
        raise ImportError("plotly not installed; call with to_figure=False")
    fig = go.Figure()
    for c in cols:
        if c in ("sample_idx", "time_index"):
            continue
        fig.add_trace(
            go.Scatter(x=sig_pdf["time_index"], y=sig_pdf[c], name=c, mode="lines")
        )
    if peaks_pdf is not None and len(peaks_pdf):
        fig.add_trace(
            go.Scatter(
                x=peaks_pdf["timestamp"],
                y=peaks_pdf["peak_value"],
                name="peaks",
                mode="markers",
            )
        )
    return fig


def force_evolution_view(peaks: DataFrame, channel_id: int, to_figure: bool = False):
    """S4: per-peak force over time for one channel."""
    pdf = _collect(
        peaks.filter(F.col("channel_id") == channel_id)
        .select("timestamp", "force")
        .orderBy("timestamp")
    )
    if not to_figure:
        return pdf
    if not HAVE_PLOTLY:
        raise ImportError("plotly not installed; call with to_figure=False")
    fig = go.Figure(
        go.Scatter(x=pdf["timestamp"], y=pdf["force"], mode="lines+markers")
    )
    return fig


def beat_times_view(
    peaks: DataFrame,
    channel_id: int,
    ttp: bool = False,
    ttr: bool = False,
    duration: bool = False,
    show_all: bool = False,
    to_figure: bool = False,
):
    """S4: TTP/TTR/duration evolution; the flags actually select series
    (unlike the reference, whose flags are dead — see module docstring)."""
    wanted = []
    if ttp or show_all:
        wanted.append("time_to_peak")
    if ttr or show_all:
        wanted.append("time_to_relaxation")
    if duration or show_all:
        wanted.append("duration")
    if not wanted:
        wanted = ["duration"]
    pdf = _collect(
        peaks.filter(F.col("channel_id") == channel_id)
        .select("timestamp", *wanted)
        .orderBy("timestamp")
    )
    if not to_figure:
        return pdf
    if not HAVE_PLOTLY:
        raise ImportError("plotly not installed; call with to_figure=False")
    fig = go.Figure()
    for c in wanted:
        fig.add_trace(go.Scatter(x=pdf["timestamp"], y=pdf[c], name=c, mode="lines"))
    return fig


def write_parquet(df: DataFrame, path: str, partition_by: tuple[str, ...] = ("channel_id",)):
    """Durable sink: partitioned parquet (partition pruning for free on
    later channel-filtered reads)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Durable bucketed table: pre-shuffles ONCE at write time so every
    later join/aggregation on ``bucket_by`` is exchange-free (Spark
    matches bucket specs and skips the shuffle — the cluster-scale
    answer for a fact table joined repeatedly on the same key, e.g.
    lineitem⋈orders on orderkey or documents⋈embeddings on doc_id).

    Bucketing requires the session catalog (``saveAsTable``), not a bare
    path — bucket metadata lives in the catalog. ``sort_by`` adds
    in-bucket ordering so merge-style reads skip the sort too."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def write_sized(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int = 1_000_000,
    target_files: int | None = None,
) -> None:
    """Durable sink with explicit OUTPUT FILE SIZING — the part of a
    100 TB write that `write.parquet` alone gets wrong in both
    directions: thousands of tasks × hundreds of partition keys emit
    millions of KB-sized files (metadata death), while one giant task
    emits multi-GB files that downstream scans can't split by row group.

    Two independent controls:

    * ``max_records_per_file`` caps file size (the writer rolls to a new
      file at the threshold) — protects the big end.
    * ``target_files`` repartitions before the write — by the partition
      columns (hash) when partitioning, plain round-robin otherwise —
      so the small end collapses to ~1 file per task per key instead of
      tasks × keys. For a skew-prone partition column, add a salt
      column upstream and include it here.
    """
    if target_files is not None:
        df = (
            df.repartition(target_files, *[F.col(c) for c in partition_by])
            if partition_by
            else df.repartition(target_files)
        )
    writer = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
