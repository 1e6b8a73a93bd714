"""Crawl→corpus composition (round 13): the full WARC-bytes-to-
curated-documents chain — URL-dedup keeper rule over canonical URLs,
per-domain cap binding, and the quality/Gopher gates — exercised on a
hand-built record fabric where every expected row is enumerable."""

from pyspark.sql import Row, functions as F

from myodish_peak_analysis_spark.llm.crawl import crawl_curated_corpus
from myodish_peak_analysis_spark.sources.warc import (
    encode_documents_warc_http,
    parse_warc,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then walks back "
    "home with a small bag of red apples for the whole hungry family"
)


def _records(spark, rows):
    docs = spark.createDataFrame(rows)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".site.example/p/"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") >= 100, F.lit("?fbclid=dup")).otherwise(
            F.lit("")
        ),
    )
    blobs = encode_documents_warc_http(docs, file_mod=2, url=url).select(
        F.concat(F.lit("mem://t/"), F.col("file_key").cast("string")).alias(
            "path"
        ),
        "content",
    )
    return parse_warc(blobs)


def _row(doc_id, text, source="s0"):
    return Row(
        doc_id=doc_id,
        text=text,
        lang="en",
        source=source,
        n_chars=len(text),
    )


def test_url_dedup_keeper_and_gates(spark):
    # doc 1 + its mirror fetch (doc 101, same URL modulo a tracking
    # param): exactly one survives, keeper = the LOWER doc_id.
    # doc 2: low-quality (symbol spam) — fails the gates.
    rows = [
        _row(1, GOOD),
        _row(101, GOOD),
        _row(2, "@@@ ### $$$ %%% ^^^ &&& *** !!! ??? ;;; ::: ~~~"),
    ]
    out = crawl_curated_corpus(_records(spark, rows)).collect()
    assert [r.doc_id for r in out] == [1]
    r = out[0]
    assert r.url == "https://s0.site.example/p/1"
    assert r.domain == "s0.site.example"
    assert r.n_chars == len(GOOD)
    assert r.domain_rank == 1


def test_domain_cap_binds_per_domain(spark):
    # 4 distinct-URL docs on domain s0, 1 on s1; cap=2 keeps the two
    # best-quality s0 docs (identical text → quality ties broken by
    # doc_id asc) and the single s1 doc.
    rows = [_row(i, GOOD + f" tail{i}") for i in range(1, 5)] + [
        _row(9, GOOD, source="s1")
    ]
    out = crawl_curated_corpus(
        _records(spark, rows), max_per_domain=2
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r.doc_id)
    assert sorted(by_dom["s0.site.example"]) == [1, 2]
    assert by_dom["s1.site.example"] == [9]
    assert all(r.domain_rank <= 2 for r in out)


def test_non_response_records_ignored(spark):
    # conversion-type records (the plain encoder's output) carry no
    # HTTP payload; the crawl path must drop them, not mis-split them.
    from myodish_peak_analysis_spark.sources.warc import (
        encode_documents_warc,
    )

    docs = spark.createDataFrame([_row(1, GOOD)])
    blobs = encode_documents_warc(docs, file_mod=1).select(
        F.lit("mem://t/0").alias("path"), "content"
    )
    out = crawl_curated_corpus(parse_warc(blobs)).collect()
    assert out == []
