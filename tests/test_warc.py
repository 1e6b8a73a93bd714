"""WARC source (round 12): pure-stdlib record iterator, gzip members,
the mapInPandas parse path, the JVM-expression encoder, and the
encode→parse round trip on harness documents."""

import gzip

import pytest
from pyspark.sql import functions as F

from myodish_peak_analysis_spark.sources.warc import (
    WARC_DATE,
    encode_documents_warc,
    iter_warc_records,
    parse_warc,
    warc_documents,
)

SF001 = "/root/testdata/sf0.001"


def _record(rid: str, payload: bytes, extra: str = "") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: conversion\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {WARC_DATE}\r\n"
        f"{extra}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def test_iter_warc_records_content_length_driven():
    """A payload containing the record delimiter AND a fake version
    line must come back byte-exact — the parser may only trust
    Content-Length, never boundary scanning."""
    evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\ny"
    blob = _record("urn:doc:1", evil) + _record("urn:doc:2", b"ok")
    got = list(iter_warc_records(blob))
    assert len(got) == 2
    assert got[0][1] == evil and got[0][0]["warc-record-id"] == "urn:doc:1"
    assert got[1][1] == b"ok"


def test_iter_warc_records_multibyte_octets():
    """Content-Length is OCTETS: a multibyte payload whose char count
    differs from its byte count round-trips exactly."""
    payload = "héllo → 世界".encode()
    assert len(payload) != len("héllo → 世界")
    (h, p), = iter_warc_records(_record("urn:doc:7", payload))
    assert p == payload and int(h["content-length"]) == len(payload)


def test_iter_warc_records_gzip_members():
    """Per-record gzip members (the .warc.gz convention) decompress
    member by member; a plain blob takes the uncompressed path."""
    r1, r2 = _record("urn:doc:1", b"a"), _record("urn:doc:2", b"bb")
    blob = gzip.compress(r1) + gzip.compress(r2)
    got = list(iter_warc_records(blob))
    assert [p for _, p in got] == [b"a", b"bb"]


def test_iter_warc_records_rejects_malformed():
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"HTTP/1.1 200\r\n\r\n"))
    ok = _record("urn:doc:1", b"abc")
    with pytest.raises(ValueError, match="truncated payload"):
        list(iter_warc_records(ok[:-6]))  # cut inside the payload
    with pytest.raises(ValueError, match="terminator"):
        list(iter_warc_records(ok[:-2]))  # cut one CRLF of the two
    with pytest.raises(ValueError, match="truncated gzip"):
        list(iter_warc_records(gzip.compress(ok)[:-3]))


def test_warc_roundtrip_matches_documents(spark):
    """encode_documents_warc -> parse_warc -> warc_documents is the
    identity on the harness documents table (the registered
    warc_roundtrip query's contract), and the parse is distributed —
    one record row per document across the 8 blobs."""
    from myodish_peak_analysis_spark.schema import read_table

    docs = read_table(spark, SF001, "documents")
    blobs = encode_documents_warc(docs, file_mod=8).select(
        F.concat(F.lit("mem://p"), F.col("file_key").cast("string")).alias(
            "path"
        ),
        "content",
    )
    recs = parse_warc(blobs)
    assert recs.count() == docs.count()
    assert recs.select("path").distinct().count() == 8
    got = {
        r.doc_id: (r.text, r.lang, r.source)
        for r in warc_documents(recs).collect()
    }
    expect = {
        r.doc_id: (r.text, r.lang, r.source)
        for r in docs.select("doc_id", "text", "lang", "source").collect()
    }
    assert got == expect


def test_encoded_blobs_are_stdlib_parseable_and_deterministic(spark):
    """The JVM-built blobs are valid WARC to the pure-Python iterator
    (no Spark on the read side), and byte-deterministic across runs
    (array_sort by doc_id before the binary fold)."""
    from myodish_peak_analysis_spark.schema import read_table

    docs = read_table(spark, SF001, "documents").limit(40)
    blob_rows = lambda: {  # noqa: E731
        r.file_key: bytes(r.content)
        for r in encode_documents_warc(docs, file_mod=2).collect()
    }
    a, b = blob_rows(), blob_rows()
    assert a == b and len(a) == 2
    n = 0
    for blob in a.values():
        for h, payload in iter_warc_records(blob):
            assert h["warc-type"] == "conversion"
            assert h["warc-record-id"].startswith("urn:doc:")
            payload.decode("utf-8")  # valid UTF-8 text payloads
            n += 1
    assert n == 40


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.binary(min_size=0, max_size=64),
            min_size=1,
            max_size=8,
        ),
        st.booleans(),
    )
    def test_warc_iter_roundtrip_property(payloads, gz):
        """Property: ANY payload bytes — including ones full of CRLFs,
        fake headers, or gzip magic — round-trip byte-exact through the
        encoder shape and the Content-Length-driven iterator, plain or
        per-record-gzipped."""
        recs = [
            _record(f"urn:doc:{i}", p) for i, p in enumerate(payloads)
        ]
        blob = (
            b"".join(gzip.compress(r) for r in recs)
            if gz
            else b"".join(recs)
        )
        got = list(iter_warc_records(blob))
        assert [p for _, p in got] == payloads
        assert [h["warc-record-id"] for h, _ in got] == [
            f"urn:doc:{i}" for i in range(len(payloads))
        ]


def test_read_warc_batch_and_stream_match(spark, tmp_path):
    """Real files on disk through both ingestion fronts: the batch
    binaryFile read and the streaming crawl-drop watcher yield the
    identical record set (stateless map — batch↔stream parity is
    structural), with maxFilesPerTrigger=2 forcing multiple genuine
    micro-batches over 8 files."""
    import os

    from myodish_peak_analysis_spark.schema import read_table
    from myodish_peak_analysis_spark.sources.warc import (
        read_warc,
        read_warc_stream,
    )

    docs = read_table(spark, SF001, "documents")
    d = os.path.join(str(tmp_path), "crawl")
    os.makedirs(d)
    for r in encode_documents_warc(docs, file_mod=8).collect():
        with open(os.path.join(d, f"part-{r.file_key}.warc"), "wb") as f:
            f.write(bytes(r.content))

    batch = read_warc(spark, d, glob="*.warc")
    n_docs = docs.count()
    assert batch.count() == n_docs

    collected = []
    epochs = set()

    def sink(df, epoch_id):
        epochs.add(epoch_id)
        collected.extend(df.collect())

    q = (
        read_warc_stream(spark, d, max_files_per_trigger=2)
        .writeStream.foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(epochs) >= 2
    got = {r.record_id: (r.payload, r.x_doc_lang) for r in collected}
    expect = {
        r.record_id: (r.payload, r.x_doc_lang) for r in batch.collect()
    }
    assert got == expect and len(got) == n_docs
