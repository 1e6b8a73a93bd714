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


# --- round 13: crawl ingestion (Target-URI + HTTP split + HTML text) --------


def test_html_to_text_adversarial():
    """Nested/unclosed tags, skip-tag content (script with a '<'
    inside, style, title), good/bad entities, and whitespace collapse."""
    from myodish_peak_analysis_spark.sources.warc import html_to_text

    assert html_to_text("<div><p>a<b>b</b>c</p><p>d</p></div>") == "abc d"
    assert (
        html_to_text(
            "<html><head><title>skip me</title>"
            "<script>if (a < b) { x(); }</script>"
            "<style>p { color: red; }</style></head>"
            "<body><p>kept</p></body></html>"
        )
        == "kept"
    )
    # entity decode: known refs decode; a bogus name is handled the way
    # BROWSERS handle it (HTML5 longest-prefix matching — stdlib
    # html.parser implements the spec table, so '&not' inside
    # '&notarealentity;' decodes to U+00AC and the rest stays literal);
    # a name with no valid prefix passes through untouched
    assert html_to_text("<p>a &amp; b &lt;c&gt; &copy;</p>") == "a & b <c> \xa9"
    assert html_to_text("<p>x &notarealentity; y</p>") == "x \xacarealentity; y"
    assert html_to_text("<p>x &qqzz; y</p>") == "x &qqzz; y"
    # numeric charrefs, including a malformed one
    assert html_to_text("<p>&#65;&#x42;</p>") == "AB"
    # unclosed inline tag + nested same-name skip tags
    assert html_to_text("<p>a <b>bold</p>") == "a bold"
    # whitespace runs collapse; block boundaries separate words
    assert html_to_text("<p>  a \n\t b  </p><br>c") == "a b c"
    # void/self-closing tags don't unbalance the skip depth
    assert html_to_text("<p>a<br/>b</p>") == "a b"


def test_parse_warc_surfaces_target_uri(spark):
    """WARC-Target-URI (ISO 28500 §5.12) lands in the record frame and
    rides through to crawl provenance."""
    blob = _record(
        "urn:doc:3",
        b"payload",
        extra="WARC-Target-URI: https://example.com/a?b=1\r\n",
    )
    files = spark.createDataFrame(
        [("mem://f0", bytearray(blob))], "path string, content binary"
    )
    row = parse_warc(files).collect()[0]
    assert row.target_uri == "https://example.com/a?b=1"
    assert row.record_id == "urn:doc:3"


def _http_record(rid, html_bytes, ctype="text/html; charset=UTF-8",
                 uri="https://example.com/x"):
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
        + b"\r\nContent-Length: " + str(len(html_bytes)).encode()
        + b"\r\n\r\n" + html_bytes
    )
    return _record(rid, http, extra=f"WARC-Target-URI: {uri}\r\n").replace(
        b"WARC-Type: conversion", b"WARC-Type: response"
    )


def test_split_http_responses_and_charset(spark):
    """The JVM HTTP split recovers status/content-type/charset and the
    exact body BYTES (ISO-8859-1 round trip), and the extractor honors
    a declared non-UTF-8 charset."""
    from myodish_peak_analysis_spark.sources.warc import (
        split_http_responses,
        with_html_text,
    )

    latin = "<p>caf\xe9 touch\xe9</p>".encode("iso-8859-1")
    utf8 = "<p>caf\xe9 touch\xe9</p>".encode("utf-8")
    blob = _http_record(
        "urn:doc:1", latin, ctype="text/html; charset=ISO-8859-1"
    ) + _http_record("urn:doc:2", utf8) + _record("urn:doc:3", b"not-http")
    files = spark.createDataFrame(
        [("mem://f0", bytearray(blob))], "path string, content binary"
    )
    out = with_html_text(split_http_responses(parse_warc(files)))
    rows = {r.record_id: r for r in out.collect()}
    r1, r2, r3 = rows["urn:doc:1"], rows["urn:doc:2"], rows["urn:doc:3"]
    assert r1.http_status == 200
    assert r1.http_charset.upper() == "ISO-8859-1"
    assert bytes(r1.http_body) == latin
    assert r1.text == "caf\xe9 touch\xe9"
    assert r2.http_charset.upper() == "UTF-8"
    assert r2.text == "caf\xe9 touch\xe9"
    # non-response record: NULL http columns, NULL text (not a crash)
    assert r3.http_status is None and r3.http_body is None and r3.text is None


def test_split_http_unknown_charset_falls_back(spark):
    """An unknown declared charset degrades to UTF-8+replacement, not a
    dead task (malformed crawl records are data, not exceptions)."""
    from myodish_peak_analysis_spark.sources.warc import (
        split_http_responses,
        with_html_text,
    )

    blob = _http_record(
        "urn:doc:9", b"<p>ok</p>", ctype="text/html; charset=x-no-such-cs"
    )
    files = spark.createDataFrame(
        [("mem://f0", bytearray(blob))], "path string, content binary"
    )
    out = with_html_text(split_http_responses(parse_warc(files)))
    assert out.collect()[0].text == "ok"


def test_crawl_documents_roundtrip_sf001(spark):
    """encode_documents_warc_http -> parse -> split -> extract is the
    whitespace-normalized identity on the harness documents table, with
    the deterministic provenance URL (the registered warc_extract_text
    query's contract at sf0.001)."""
    from myodish_peak_analysis_spark.schema import read_table
    from myodish_peak_analysis_spark.sources.warc import (
        CRAWL_URL_PREFIX,
        crawl_documents,
        encode_documents_warc_http,
    )

    docs = read_table(spark, SF001, "documents")
    blobs = encode_documents_warc_http(docs, file_mod=4).select(
        F.concat(F.lit("mem://p"), F.col("file_key").cast("string")).alias(
            "path"
        ),
        "content",
    )
    got = {
        r.doc_id: (r.url, r.text, r.lang, r.source)
        for r in crawl_documents(parse_warc(blobs)).collect()
    }
    expect = {
        r.doc_id: (
            f"{CRAWL_URL_PREFIX}{r.source}/{r.doc_id}",
            " ".join(r.text.split()),
            r.lang,
            r.source,
        )
        for r in docs.collect()
    }
    assert got == expect


def test_encode_http_escapes_markup_characters(spark):
    """Text containing &, <, > survives the HTML wrap: escape order
    (& first) prevents double-escaping, and the extractor decodes the
    refs back."""
    from myodish_peak_analysis_spark.sources.warc import (
        crawl_documents,
        encode_documents_warc_http,
    )

    docs = spark.createDataFrame(
        [(1, "a & b < c > d &amp; <script>evil()</script>", "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    blobs = encode_documents_warc_http(docs, file_mod=1).select(
        F.lit("mem://p0").alias("path"), "content"
    )
    row = crawl_documents(parse_warc(blobs)).collect()[0]
    assert row.text == "a & b < c > d &amp; <script>evil()</script>"
