"""ABF source plumbing: the conversion layer (everything except the
pyabf decode itself) against a stub recording."""

import numpy as np
import pandas as pd
import pytest

from myodish_peak_analysis_spark.sources.abf import (
    abf_to_parquet,
    channels_to_long,
    extract_channels,
)


class StubABF:
    """Mimics the two pyabf attributes the reference touches."""

    def __init__(self, n=20, channels=3):
        self._channels = channels
        self._n = n
        self.sweepX = None
        self.sweepY = None

    def setSweep(self, sweep, channel):
        assert sweep == 0
        self.sweepX = np.arange(self._n) / 100.0
        self.sweepY = np.sin(np.arange(self._n) + channel).astype(float)


def test_channels_to_long_layout(spark):
    frames = extract_channels(StubABF(), n_channels=3)
    long = channels_to_long(frames)
    assert list(long.columns) == ["channel_id", "sample_idx", "time_index", "signal_value"]
    assert len(long) == 60 and long["channel_id"].nunique() == 3
    # per-channel indices restart at 0 and align positionally
    g = long[long.channel_id == 2].reset_index(drop=True)
    assert (g["sample_idx"] == np.arange(20)).all()
    assert g["signal_value"].iloc[3] == pytest.approx(np.sin(3 + 2))

    # the engine reads the result as a signal frame directly
    df = spark.createDataFrame(long)
    assert df.count() == 60 and set(df.columns) == set(long.columns)


def test_abf_to_parquet_requires_pyabf(tmp_path):
    with pytest.raises(ImportError, match="pyabf"):
        abf_to_parquet("nonexistent.abf", str(tmp_path / "o.parquet"))


def test_read_documents_three_formats_identical(spark, tmp_path):
    import os

    from myodish_peak_analysis_spark.sources.text import read_documents

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tricky = spark.createDataFrame(
        # newline + quote + comma in text: the CSV hazard cases
        [(99990, 'line one\nline "two", three', "en", "web", 26)],
        base.schema,
    )
    rows = base.limit(50).unionByName(tricky)
    pq = os.path.join(str(tmp_path), "pq")
    jl = os.path.join(str(tmp_path), "jl")
    cs = os.path.join(str(tmp_path), "cs")
    rows.write.parquet(pq)
    rows.write.json(jl)
    # escape='"' => RFC-4180 doubled quotes, the dialect read_documents
    # expects (Spark's writer default is backslash-escape, nonstandard)
    rows.write.option("header", "true").option("escape", '"').csv(cs)

    def key(df):
        return sorted(
            (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in df.collect()
        )

    a = read_documents(spark, pq, "parquet")
    b = read_documents(spark, jl, "jsonl")
    c = read_documents(spark, cs, "csv")
    assert a.schema == b.schema == c.schema
    assert key(a) == key(b) == key(c)
