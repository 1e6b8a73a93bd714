"""Streaming crawl ingest (round 13): the full crawl read path —
parse → HTTP split → HTML extract → document projection — is a
STATELESS map over file blobs, so it must apply to the WARC file
stream verbatim and match the batch route row-for-row."""

import os

from myodish_peak_analysis_spark.schema import read_table
from myodish_peak_analysis_spark.sources.warc import (
    crawl_documents,
    encode_documents_warc_http,
    read_warc,
    read_warc_stream,
)

SF001 = "/root/testdata/sf0.001"


def test_stream_crawl_documents_equals_batch(spark, tmp_path):
    docs = read_table(spark, SF001, "documents")
    d = os.path.join(str(tmp_path), "crawl_http")
    os.makedirs(d)
    for r in encode_documents_warc_http(docs, file_mod=6).collect():
        with open(os.path.join(d, f"part-{r.file_key}.warc"), "wb") as f:
            f.write(bytes(r.content))

    batch = crawl_documents(read_warc(spark, d, glob="*.warc"))
    expect = {
        r.doc_id: (r.url, r.text, r.lang, r.source) for r in batch.collect()
    }
    assert len(expect) == docs.count()
    # extracted text must equal the whitespace-normalized source text
    src = {
        r.doc_id: " ".join(r.text.split())
        for r in docs.select("doc_id", "text").collect()
    }
    assert {k: v[1] for k, v in expect.items()} == src

    collected = []
    q = (
        crawl_documents(read_warc_stream(spark, d, max_files_per_trigger=2))
        .writeStream.foreachBatch(
            lambda df, _eid: collected.extend(df.collect())
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id: (r.url, r.text, r.lang, r.source) for r in collected}
    assert got == expect
