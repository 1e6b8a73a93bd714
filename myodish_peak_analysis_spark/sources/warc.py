"""WARC (ISO 28500) ingestion — the format 100 TB text corpora
actually arrive in (Common Crawl publishes ~100k ``.warc.gz`` files
per crawl). Pure stdlib: no warcio/fastwarc dependency.

Spark-side shape:

- **Read**: ``spark.read.format("binaryFile")`` gives one
  ``(path, content)`` row per WARC file; :func:`parse_warc` is a
  ``mapInPandas`` over those rows — one Arrow batch in, a record
  frame out, nothing driver-side. Parallelism is therefore
  file-level, which matches how WARC is published: many ~1 GB files
  (Common Crawl's actual layout), NOT one giant file — a single
  ``binaryFile`` blob is capped at 2 GB and is parsed by one task.
  Per-record gzip members (the ``.warc.gz`` convention) are
  decompressed inline with ``zlib`` — the whole file never
  materializes decompressed; records stream member by member.
- **Parse** is Content-Length-driven, never delimiter-scanning: a
  payload containing ``\\r\\n\\r\\nWARC/1.0`` does not confuse it
  (the spec's whole point; a regex splitter silently corrupts such
  records).
- **Round-trip**: :func:`encode_documents_warc` builds spec-shaped
  record bytes from the ``documents`` frame ENTIRELY with JVM
  expressions (``octet_length`` for the payload byte count, binary
  ``||`` concat), so the registered ``warc_roundtrip`` query
  (encode → blob per file-group → parse → project) is hash-checked
  against ``SELECT ... FROM documents`` — the parser is oracle-
  verified on every correctness round, not just unit-tested.

Reference parity note: the reference ingests ABF files
(``/root/reference/utils.py:5-22``); WARC is an EXTENSION for the
LLM-pipeline surface (SURVEY.md §2.9 extensions), alongside the
JSONL/CSV readers in :mod:`.text`.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Output schema of :func:`parse_warc`: one row per WARC record.
WARC_RECORD_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("x_doc_lang", StringType()),
        StructField("x_doc_source", StringType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members (the ``.warc.gz``
    per-record-gzip convention) one member at a time via
    ``zlib.decompressobj`` — each member yields without ever holding
    the whole file decompressed."""
    rest = blob
    offset = 0
    while rest:
        # anything after a member must itself be a gzip member: writer
        # padding / stray trailing bytes would otherwise surface as a
        # raw zlib.error with no offset context (ADVICE r12)
        if rest[:2] != b"\x1f\x8b":
            raise ValueError(
                f"warc: trailing non-gzip bytes after member at offset "
                f"{offset} ({rest[:4]!r})"
            )
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        out = d.decompress(rest)
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        yield out
        offset += len(rest) - len(d.unused_data)
        rest = d.unused_data


def _iter_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per record in an UNCOMPRESSED WARC blob.
    Content-Length (mandatory per ISO 28500) drives every payload
    read; the only structural assumptions are the version line, the
    CRLFCRLF header terminator, and the CRLFCRLF record terminator."""
    i, n = 0, len(blob)
    while i < n:
        j = blob.find(_CRLF2, i)
        if j < 0:
            raise ValueError("warc: header block missing CRLFCRLF")
        lines = blob[i:j].split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"warc: bad version line {lines[0][:40]!r} at offset {i}"
            )
        headers: dict = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("utf-8").lower()] = v.strip().decode(
                "utf-8"
            )
        clen = int(headers["content-length"])
        start = j + len(_CRLF2)
        payload = blob[start : start + clen]
        if len(payload) != clen:
            raise ValueError("warc: truncated payload")
        i = start + clen
        if blob[i : i + len(_CRLF2)] != _CRLF2:
            raise ValueError("warc: record terminator missing")
        i += len(_CRLF2)
        yield headers, payload


def iter_warc_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """Records from a WARC blob, gzipped (per-member) or plain."""
    if blob[:2] == b"\x1f\x8b":
        for member in _gzip_members(blob):
            yield from _iter_records(member)
    else:
        yield from _iter_records(blob)


def parse_warc(files: DataFrame) -> DataFrame:
    """One record row per WARC record in a frame of ``(path, content)``
    file blobs (the ``binaryFile`` source's columns). Arrow-batched
    ``mapInPandas``: genuinely sequential byte-walking per file, the
    documented boundary for Python stages — every downstream step is
    back on JVM columns."""
    import pandas as pd

    names = [f.name for f in WARC_RECORD_SCHEMA.fields]

    def parse(batches):
        for pdf in batches:
            # columnar accumulation: pd.DataFrame from per-column lists
            # is ~3x cheaper than from row tuples at 100x corpus scale
            # (the construction cost was the measured ceiling, not the
            # byte walk — tools/bench_warc.py)
            cols: list = [[] for _ in names]
            for path, blob in zip(pdf["path"], pdf["content"]):
                for h, payload in iter_warc_records(bytes(blob)):
                    cols[0].append(path)
                    cols[1].append(h.get("warc-record-id"))
                    cols[2].append(h.get("warc-type"))
                    cols[3].append(h.get("warc-date"))
                    cols[4].append(int(h["content-length"]))
                    cols[5].append(payload)
                    cols[6].append(h.get("x-doc-lang"))
                    cols[7].append(h.get("x-doc-source"))
            yield pd.DataFrame(dict(zip(names, cols)))

    return files.select("path", "content").mapInPandas(
        parse, WARC_RECORD_SCHEMA
    )


def warc_documents(records: DataFrame) -> DataFrame:
    """Project parsed records back to the canonical ``documents``
    columns (the round-trip's read side): doc ids ride
    ``WARC-Record-ID`` as ``urn:doc:<id>``, lang/source ride the
    ``X-Doc-*`` extension headers, text is the UTF-8 payload."""
    return records.select(
        F.regexp_extract("record_id", r"urn:doc:(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.decode("payload", "UTF-8").alias("text"),
        F.col("x_doc_lang").alias("lang"),
        F.col("x_doc_source").alias("source"),
    )


#: the ``binaryFile`` source's fixed schema — needed explicitly for
#: the STREAMING reader (file stream sources cannot infer it).
BINARY_FILE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ]
)


def read_warc(spark, path: str, glob: str | None = None) -> DataFrame:
    """Batch WARC ingestion: ``binaryFile`` scan → :func:`parse_warc`.
    ``glob`` filters by filename (e.g. ``*.warc.gz``)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return parse_warc(reader.load(path))


def read_warc_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming WARC ingestion — the crawl-drop watcher: new WARC
    files landing under ``path`` become record rows micro-batch by
    micro-batch. The parse is a STATELESS map (each file's records
    depend on nothing outside its bytes), so the batch
    :func:`parse_warc` applies to the unbounded stream verbatim: no
    state store, no watermark, and stream results equal the batch
    parse row-for-row (pinned by tests/test_warc.py). Downstream, this
    is the front of the ingest twins: records → ``warc_documents`` →
    dedup/DSIR/ANN serving via the existing foreachBatch operators."""
    reader = spark.readStream.format("binaryFile").schema(
        BINARY_FILE_SCHEMA
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_warc(reader.load(path))


#: fixed timestamp for deterministic encode (hash-checked round trip);
#: real writers stamp the crawl time.
WARC_DATE = "2026-01-01T00:00:00Z"


def encode_documents_warc(docs: DataFrame, file_mod: int = 8) -> DataFrame:
    """``(file_key, content)`` WARC blobs from the ``documents`` frame,
    ``file_mod`` blobs total — the write side of the round trip, and a
    miniature of how an exporter shards records across files. All JVM
    expressions: the header is a string concat whose Content-Length is
    ``octet_length(encode(text,'utf-8'))`` (BYTES, not chars — the
    wrong one corrupts every multibyte document), the record is binary
    ``||`` concat, and per-file assembly is an ``array_sort`` by
    doc_id (byte-deterministic blobs) + an ``aggregate`` binary fold.
    One shuffle (the groupBy); no Python.

    NULL text/lang/source is refused LOUDLY per row: ``concat`` would
    null the record and the binary fold would then null the ENTIRE
    file's content — silently losing every document sharing that
    file_key (self-review round 12). An exporter feeding real corpora
    coalesces or drops nulls explicitly BEFORE encoding. Lang/source
    containing CR/LF are refused the same way (ADVICE r12): the values
    are written verbatim into WARC headers, so an embedded newline is
    header INJECTION — it corrupts the record framing into a malformed
    blob (or silently misattributed headers) that surfaces only as an
    opaque parse error downstream."""
    docs = docs.withColumn(
        "text",
        F.expr(
            "IF(text IS NULL OR lang IS NULL OR source IS NULL, "
            "raise_error(concat('warc encode: NULL text/lang/source "
            "for doc_id ', CAST(doc_id AS STRING))), "
            "IF(lang RLIKE '[\\r\\n]' OR source RLIKE '[\\r\\n]', "
            "raise_error(concat('warc encode: CR/LF in lang/source for "
            "doc_id ', CAST(doc_id AS STRING), ' — header injection')), "
            "text))"
        ),
    )
    header = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.concat(
            F.lit("WARC-Record-ID: urn:doc:"),
            F.col("doc_id").cast("string"),
            F.lit("\r\n"),
        ),
        F.lit(f"WARC-Date: {WARC_DATE}\r\n"),
        F.concat(F.lit("X-Doc-Lang: "), F.col("lang"), F.lit("\r\n")),
        F.concat(F.lit("X-Doc-Source: "), F.col("source"), F.lit("\r\n")),
        F.concat(
            F.lit("Content-Length: "),
            F.octet_length(F.encode("text", "UTF-8")).cast("string"),
            F.lit("\r\n\r\n"),
        ),
    )
    rec = F.concat(
        F.encode(header, "UTF-8"),
        F.encode("text", "UTF-8"),
        F.encode(F.lit("\r\n\r\n"), "UTF-8"),
    )
    return (
        docs.select(
            (F.col("doc_id") % file_mod).alias("file_key"),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("file_key")
        .agg(F.array_sort(F.collect_list("s")).alias("recs"))
        .select(
            "file_key",
            F.expr(
                "aggregate(recs, CAST('' AS BINARY), "
                "(acc, x) -> acc || x.rec)"
            ).alias("content"),
        )
    )
