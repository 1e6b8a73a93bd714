"""Structured Streaming variants of the peak operators.

The reference library is batch-only (SURVEY.md §2.9: no streaming
constructs anywhere); these are the forward-looking extensions the build
brief asks for, built on the two canonical streaming patterns:

* :func:`streaming_naive_peaks` — a *custom stateful operator* via
  ``applyInPandasWithState``: per-channel state carries the trailing two
  samples across micro-batches, so a local maximum sitting exactly on a
  batch boundary is still detected. This is the streaming analogue of
  the batch ``naive_peaks`` (strict maxima; the plateau-midpoint rule
  needs unbounded lookahead and is documented as a batch-only feature).
* :func:`streaming_windowed_stats` — watermark + tumbling event-time
  window aggregation, the built-in route for late-data-tolerant rollups.

Scale notes: state is O(1) per channel (three scalars), keyed by the
same channel hash partitioning as the batch pipeline; the window agg is
map-side combined before the state store. Both run identically on a
1000-executor cluster — the state store shards by key.

Ordering contract: samples must arrive in ``sample_idx`` order *within
a micro-batch per channel* (guaranteed by sorting inside the UDF) and
batches must not interleave old samples (use a source with ordered
offsets, e.g. Kafka per-partition order or file source by mtime).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PEAK_OUT_SCHEMA = "channel_id long, peak_idx long, peak_value double"
_STATE_SCHEMA = "prev double, curr double, curr_idx long"


def _peaks_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (channel_id,) = key
    if state.exists:
        prev, curr, curr_idx = state.get
        if prev is not None and math.isnan(prev):
            prev = None
        if curr is not None and math.isnan(curr):
            curr = None
    else:
        prev = curr = curr_idx = None

    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("sample_idx")
        for idx, v in zip(pdf["sample_idx"], pdf["signal_value"]):
            v = float(v)
            if (
                prev is not None
                and curr is not None
                and prev < curr
                and v < curr
            ):
                rows.append((int(channel_id), int(curr_idx), curr))
            prev, curr, curr_idx = curr, v, int(idx)

    state.update(
        (
            float("nan") if prev is None else prev,
            float("nan") if curr is None else curr,
            -1 if curr_idx is None else int(curr_idx),
        )
    )
    yield pd.DataFrame(rows, columns=["channel_id", "peak_idx", "peak_value"])


def streaming_naive_peaks(signal_stream: DataFrame) -> DataFrame:
    """Strict local maxima over a streaming signal frame
    (channel_id, sample_idx, signal_value, ...), emitted as soon as the
    following sample confirms them — including across micro-batch
    boundaries via per-channel state."""
    return signal_stream.groupBy("channel_id").applyInPandasWithState(
        _peaks_fn,
        PEAK_OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(
    docs_stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop documents whose md5(text) was already
    seen within the watermark horizon. Uses the built-in
    ``dropDuplicatesWithinWatermark`` state store, so state is bounded
    by the horizon (an unbounded ``dropDuplicates`` would grow state
    forever — never ship that). The ingest-time dedup stage of a
    streaming training-data pipeline."""
    return (
        docs_stream.withColumn("text_hash", F.md5("text"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def streaming_windowed_stats(
    events_stream: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Late-data-tolerant per-user tumbling-window rollup over the
    events stream (ts must be a timestamp column)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
            "n_events",
            "max_value",
            "avg_value",
        )
    )
