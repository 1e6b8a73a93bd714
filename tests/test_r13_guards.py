"""Round-13 guards: the four ADVICE-r12 fixes pinned as tests.

1. ivf_pq_append's pre-cache dim probe catches NULL-embedding rows
   (size(NULL) is NULL → the old predicate dropped the row from the
   probe and the batch slipped through to the per-row encoder).
2. bpe_roundtrip diagnoses NULL text as NULL text, not as "contains
   the + merge marker" (IF(NULL, ...) takes the else arm).
3. _gzip_members refuses trailing non-gzip bytes with the module's
   descriptive ValueError, not a raw zlib.error.
4. encode_documents_warc refuses CR/LF in lang/source (header
   injection would corrupt the record framing).
"""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _emb01(spark):
    from myodish_peak_analysis_spark.schema import read_table

    return read_table(spark, SF01, "embeddings")


# --- 1: NULL-embedding batch refused before caching -------------------------


def test_ivf_pq_append_null_embedding_raises_before_caching(spark):
    from myodish_peak_analysis_spark.llm import similarity as S

    emb = _emb01(spark)
    idx = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 != 3))
    bad = emb.filter(F.col("vec_id") % 10 == 3).select(
        "vec_id",
        F.when(F.col("vec_id") % 30 == 3, F.lit(None))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    n_cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    with pytest.raises(ValueError, match="batch embedding dim NULL"):
        S.ivf_pq_append(idx, bad)
    assert (
        spark.sparkContext._jsc.getPersistentRDDs().size() == n_cached_before
    )
    idx.unpersist()


# --- 2: bpe_roundtrip NULL-text diagnosis ------------------------------------


def test_bpe_roundtrip_null_text_fails_with_null_diagnosis(spark, tmp_path):
    from myodish_peak_analysis_spark.llm.queries import q_bpe_roundtrip

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "alpha beta", "en", "s0", 10), (2, None, "en", "s0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(sf + "/documents.parquet")
    with pytest.raises(Exception, match="NULL text for doc_id 2"):
        q_bpe_roundtrip(spark, sf).collect()


# --- 3: trailing non-gzip bytes ----------------------------------------------


def _one_record_blob() -> bytes:
    payload = b"hello"
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Record-ID: urn:doc:1\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def test_gzip_members_trailing_garbage_is_descriptive_valueerror():
    from myodish_peak_analysis_spark.sources.warc import iter_warc_records

    blob = gzip.compress(_one_record_blob()) + b"\n  padding"
    with pytest.raises(ValueError, match="trailing non-gzip bytes"):
        list(iter_warc_records(blob))


def test_gzip_members_clean_members_still_parse():
    from myodish_peak_analysis_spark.sources.warc import iter_warc_records

    blob = gzip.compress(_one_record_blob()) + gzip.compress(
        _one_record_blob()
    )
    recs = list(iter_warc_records(blob))
    assert len(recs) == 2
    assert recs[0][1] == b"hello"


# --- 4: CR/LF header injection refused ---------------------------------------


def test_encode_documents_warc_refuses_crlf_in_headers(spark):
    from myodish_peak_analysis_spark.sources.warc import (
        encode_documents_warc,
    )

    docs = spark.createDataFrame(
        [(1, "alpha", "en\r\nWARC-Evil: x", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    with pytest.raises(Exception, match="CR/LF in lang/source"):
        encode_documents_warc(docs).collect()
    docs2 = spark.createDataFrame(
        [(1, "alpha", "en", "s\n0")],
        "doc_id long, text string, lang string, source string",
    )
    with pytest.raises(Exception, match="CR/LF in lang/source"):
        encode_documents_warc(docs2).collect()
