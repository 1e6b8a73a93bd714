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

# module-level so pandas_udf type hints resolve under
# `from __future__ import annotations` (get_type_hints reads the
# module globals, not the defining function's locals)
import pandas as pd

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
#: ``target_uri`` is ISO 28500 §5.12's ``WARC-Target-URI`` — the
#: record's URL, the one header every real curation step keys on
#: (URL/domain dedup, per-domain caps, blocklists, provenance).
WARC_RECORD_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("warc_date", StringType()),
        StructField("target_uri", StringType()),
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
                    cols[4].append(h.get("warc-target-uri"))
                    cols[5].append(int(h["content-length"]))
                    cols[6].append(payload)
                    cols[7].append(h.get("x-doc-lang"))
                    cols[8].append(h.get("x-doc-source"))
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
    docs = _refuse_bad_rows(docs)
    header = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.concat(
            F.lit("WARC-Record-ID: urn:doc:"),
            F.col("doc_id").cast("string"),
            F.lit("\r\n"),
        ),
        F.lit(f"WARC-Date: {WARC_DATE}\r\n"),
        F.concat(F.lit("WARC-Target-URI: "), doc_url(), F.lit("\r\n")),
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
    return _assemble_blobs(docs, rec, file_mod)


def _refuse_bad_rows(docs: DataFrame) -> DataFrame:
    """Per-row loud refusal shared by both encoders: NULL text/lang/
    source (would null the whole file's binary fold) and CR/LF in
    lang/source (header injection)."""
    return docs.withColumn(
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


def _assemble_blobs(docs: DataFrame, rec, file_mod: int) -> DataFrame:
    """(file_key, content) blobs from per-row record bytes: array_sort
    by doc_id (byte-deterministic blobs) + an ``aggregate`` binary
    fold. One shuffle (the groupBy); no Python."""
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


#: Deterministic provenance URL written as ``WARC-Target-URI`` by both
#: encoders. Mirrored verbatim in the DuckDB oracle
#: (``'https://crawl.example/' || source || '/' || doc_id``).
CRAWL_URL_PREFIX = "https://crawl.example/"


def doc_url():
    """The deterministic per-document URL expression (JVM concat)."""
    return F.concat(
        F.lit(CRAWL_URL_PREFIX),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )


def encode_documents_warc_http(
    docs: DataFrame, file_mod: int = 8, url=None
) -> DataFrame:
    """``(file_key, content)`` WARC blobs of **response** records — the
    shape real Common Crawl ``.warc.gz`` files carry: each payload is a
    full HTTP message (status line + headers + CRLFCRLF + an HTML
    body), and the WARC header block carries ``WARC-Target-URI``. This
    is the write side of the ``warc_extract_text`` round trip, so the
    crawl-facing read path (:func:`split_http_responses` +
    :func:`with_html_text`) is oracle-verified end to end.

    All JVM expressions. The HTML body wraps the document text
    HTML-escaped (``&`` first, then ``<``/``>`` — the reverse order
    would double-escape) inside a template with a ``<title>``, a
    ``<script>`` and a ``<style>`` block, so the extractor's
    tag-stripping, skip-tag and entity-decoding behavior is all
    exercised by the hash check, not just by unit fixtures. Both
    Content-Lengths are ``octet_length`` (BYTES, not chars).

    ``url`` optionally overrides the ``WARC-Target-URI`` expression
    (default :func:`doc_url`) — how a caller fabricates duplicate-URL
    fetches for the URL-dedup path (``crawl_corpus``)."""
    docs = _refuse_bad_rows(docs)
    if url is None:
        url = doc_url()
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    html = F.concat(
        F.lit(
            '<!DOCTYPE html><html><head><meta charset="utf-8">'
            "<title>doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><script>var skip = 1 < 2;</script>"
            "<style>p { color: #000; }</style></head><body><p>"
        ),
        esc,
        F.lit("</p></body></html>"),
    )
    http = F.concat(
        F.lit(
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=UTF-8\r\n"
            "Content-Length: "
        ),
        F.octet_length(F.encode(html, "UTF-8")).cast("string"),
        F.lit("\r\n\r\n"),
    )
    payload = F.concat(F.encode(http, "UTF-8"), F.encode(html, "UTF-8"))
    header = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.concat(
            F.lit("WARC-Record-ID: urn:doc:"),
            F.col("doc_id").cast("string"),
            F.lit("\r\n"),
        ),
        F.lit(f"WARC-Date: {WARC_DATE}\r\n"),
        F.concat(F.lit("WARC-Target-URI: "), url, F.lit("\r\n")),
        F.concat(F.lit("X-Doc-Lang: "), F.col("lang"), F.lit("\r\n")),
        F.concat(F.lit("X-Doc-Source: "), F.col("source"), F.lit("\r\n")),
        F.concat(
            F.lit("Content-Length: "),
            F.octet_length(payload).cast("string"),
            F.lit("\r\n\r\n"),
        ),
    )
    rec = F.concat(
        F.encode(header, "UTF-8"), payload, F.encode(F.lit("\r\n\r\n"), "UTF-8")
    )
    return _assemble_blobs(docs, rec, file_mod)


def split_http_responses(records: DataFrame) -> DataFrame:
    """Split the HTTP message out of ``response`` records' payloads —
    ENTIRELY with JVM expressions, no Python stage. The payload bytes
    are decoded ISO-8859-1 (a lossless byte↔char bijection, so string
    functions can locate the CRLFCRLF boundary) and the body substring
    is re-encoded ISO-8859-1 back to the exact original bytes.

    Adds: ``http_status`` (int), ``http_content_type``,
    ``http_charset`` (from the Content-Type header, default UTF-8),
    ``http_body`` (binary — the entity bytes, undecoded: the declared
    charset belongs to the DECODER, :func:`with_html_text`). Non-
    ``response`` records and payloads with no header terminator get
    NULLs (malformed crawl records are data, not exceptions)."""
    p = F.decode("payload", "ISO-8859-1")
    sep = F.instr(p, "\r\n\r\n")
    is_resp = (F.col("warc_type") == "response") & (sep > 0)
    head = F.substring(p, F.lit(1), sep - 1)
    body = F.expr(
        "substring(decode(payload, 'ISO-8859-1'), "
        "instr(decode(payload, 'ISO-8859-1'), '\r\n\r\n') + 4)"
    )
    ctype = F.nullif(
        F.regexp_extract(head, r"(?i)\r\ncontent-type:[ \t]*([^\r\n]+)", 1),
        F.lit(""),
    )
    charset = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.coalesce(ctype, F.lit("")),
                r"(?i)charset=\"?([A-Za-z0-9_.:\-]+)",
                1,
            ),
            F.lit(""),
        ),
        F.lit("UTF-8"),
    )
    status = F.regexp_extract(head, r"^HTTP/[0-9.]+ ([0-9]{3})", 1).cast(
        "int"
    )
    return (
        records.withColumn(
            "http_status", F.when(is_resp, status)
        )
        .withColumn("http_content_type", F.when(is_resp, ctype))
        .withColumn("http_charset", F.when(is_resp, charset))
        .withColumn(
            "http_body",
            F.when(is_resp, F.encode(body, "ISO-8859-1")),
        )
    )


#: Tags whose text content is never document text.
_HTML_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "title"}
)
#: Tags that separate text blocks (a space is inserted at their
#: boundaries so "<p>a</p><p>b</p>" extracts "a b", not "ab"); inline
#: tags ("a<b>b</b>c") insert nothing.
_HTML_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
        "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
        "header", "footer", "blockquote", "pre", "hr", "body", "head",
        "figure", "figcaption", "nav", "aside", "form",
    }
)


def html_to_text(doc: str) -> str:
    """Pure-stdlib HTML→text: ``html.parser.HTMLParser`` walk that
    drops script/style/noscript/template/title content, inserts block
    separators, decodes character references (``convert_charrefs`` —
    unknown entities pass through literally), and whitespace-normalizes
    (runs → one space, stripped). Boilerplate-aware extraction
    (trafilatura-style) needs layout heuristics beyond stdlib scope;
    this is the oracle-checkable core every crawl ingest needs first:
    tag strip + skip tags + entity decode + charset honor."""
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts: list = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in _HTML_SKIP_TAGS:
                self.skip += 1
            elif tag in _HTML_BLOCK_TAGS:
                self.parts.append(" ")

        def handle_endtag(self, tag):
            if tag in _HTML_SKIP_TAGS:
                self.skip = max(0, self.skip - 1)
            elif tag in _HTML_BLOCK_TAGS:
                self.parts.append(" ")

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    x = _X()
    x.feed(doc)
    x.close()
    return " ".join("".join(x.parts).split())


def with_html_text(
    df: DataFrame,
    body_col: str = "http_body",
    charset_col: str = "http_charset",
    out_col: str = "text",
) -> DataFrame:
    """Decode ``body_col`` bytes per the row's DECLARED charset (the
    ``http_charset`` column from :func:`split_http_responses`; unknown
    or wrong declarations fall back to UTF-8 with replacement — a
    malformed page yields degraded text, not a dead task) and extract
    text via :func:`html_to_text`. Arrow-batched pandas UDF — the
    documented Python boundary (entity tables + a real HTML tokenizer
    are not JVM-expressible); everything before and after stays on JVM
    columns, and payloads never leave the executors."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _extract(body: pd.Series, charset: pd.Series) -> pd.Series:
        out = []
        for b, cs in zip(body, charset):
            if b is None:
                out.append(None)
                continue
            raw = bytes(b)
            try:
                s = raw.decode(cs or "utf-8", errors="replace")
            except LookupError:  # unknown declared charset
                s = raw.decode("utf-8", errors="replace")
            out.append(html_to_text(s))
        return pd.Series(out, dtype="object")

    return df.withColumn(out_col, _extract(F.col(body_col), F.col(charset_col)))


def crawl_documents(records: DataFrame) -> DataFrame:
    """The full crawl-ingest projection: parsed WARC ``response``
    records → canonical document rows ``(doc_id, url, text, lang,
    source)`` — HTTP split (JVM), charset-honoring HTML text extraction
    (Arrow-batched), provenance URL from ``WARC-Target-URI``. This is
    what sits between :func:`read_warc` and the curation operators for
    a real crawl; the registered ``warc_extract_text`` query hash-checks
    it end to end against the documents table."""
    recs = split_http_responses(
        records.filter(F.col("warc_type") == "response")
    )
    out = with_html_text(recs)
    return out.select(
        F.regexp_extract("record_id", r"urn:doc:(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("url"),
        "text",
        F.col("x_doc_lang").alias("lang"),
        F.col("x_doc_source").alias("source"),
    )
