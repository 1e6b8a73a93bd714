"""Crawl-to-corpus composition (round 13): WARC ``response`` records
→ the curated training-document set, as ONE lazy Catalyst plan — the
pipeline a crawl-scale ingest actually runs, stitched from the
individually-oracle-checked stages:

1. HTTP split + HTML→text extraction
   (:func:`..sources.warc.crawl_documents`: JVM header split, then the
   charset-honoring stdlib extractor — the only Python stage, Arrow-
   batched, confined to the HTML tokenizer);
2. URL canonicalization + URL-level exact dedup (:mod:`.urls` — the
   same page fetched under cosmetically different URLs collapses to
   one row BEFORE any text-keyed work);
3. per-domain caps (anti-monoculture: at most N docs per host,
   best-quality first);
4. quality + Gopher gates (:mod:`.text` — the same integer-exact
   score and rule set ``curated_corpus`` applies).

Ordering rationale, cheapest-key-first: URL dedup runs on canonical
URLs (metadata-width) before any per-document text scoring, so
duplicate fetches never reach the quality stages; the caps and gates
then run on the URL-unique survivors only.

Reference parity note: the reference ingests ABF signal files
(``/root/reference/utils.py:5-22``); this module is EXTENSION surface
(SURVEY.md §2.9) composing the WARC/URL/quality extension operators.

Scale notes (100 TB): stage 1 is file-parallel (one task per WARC
blob); the URL-dedup window shuffles (doc_id, canonical_url) — never
text or payload bytes; domain caps and the gates are doc_id-keyed
joins of projections of the same extracted-text scan, the
``curated_corpus`` shape Catalyst plans as co-partitioned shuffles.
The text column crosses exactly one shuffle (the url-window) and is
dropped from every later exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..sources.warc import crawl_documents
from .curate import MIN_QUALITY
from .text import with_gopher_quality, with_quality_score
from .urls import domain_of, with_canonical_url


def crawl_curated_corpus(
    records: DataFrame,
    max_per_domain: int = 100,
    min_quality: float = MIN_QUALITY,
) -> DataFrame:
    """Curated documents from parsed WARC records (the
    :func:`..sources.warc.parse_warc` frame).

    Output: ``(doc_id, url, domain, lang, source, n_chars,
    quality_score, domain_rank)`` for the surviving documents —
    ``url`` is the CANONICAL form, ``n_chars`` the extracted-text
    length (the post-extraction measure a crawl pipeline actually
    has), ``domain_rank`` the quality rank that justified the keep
    under the per-domain cap."""
    from pyspark import StorageLevel

    docs = crawl_documents(records).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    canon = with_canonical_url(docs)
    # URL-level exact dedup, keeper = min doc_id (deterministic) —
    # the url_dedup keeper rule as a window, inlined so no
    # keeper-table join is needed (the curated_corpus idiom).
    w = Window.partitionBy("canonical_url")
    kept = (
        canon.withColumn("_min", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_min"))
        .drop("_min")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # persisted + pinned EAGERLY (package cache contract): four
    # downstream branches (quality, gopher, the rank window, the
    # final projection) derive from `kept`, and without the cache
    # each branch re-executes the WHOLE crawl front end — parse,
    # HTTP split, and the Arrow-batched HTML extraction, the one
    # genuinely expensive stage — once per branch (the round-13 plan
    # audit counted the extraction subtree 3x in this query's plan).
    # A production pipeline materializes extracted text to storage at
    # exactly this point; the persist is the single-session analog.
    kept.count()
    quality = with_quality_score(kept.select("doc_id", "text"))
    gopher = with_gopher_quality(kept.select("doc_id", "text")).select(
        "doc_id", F.col("keep").alias("gopher_keep")
    )
    wd = Window.partitionBy("domain").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        kept.select(
            "doc_id",
            F.col("canonical_url").alias("url"),
            domain_of().alias("domain"),
            "lang",
            "source",
            "n_chars",
        )
        .join(quality, "doc_id")
        .join(gopher, "doc_id")
        .withColumn("domain_rank", F.row_number().over(wd).cast("long"))
        .filter(
            (F.col("domain_rank") <= max_per_domain)
            & (F.col("quality_score") >= F.lit(min_quality))
            & F.col("gopher_keep")
        )
        .select(
            "doc_id",
            "url",
            "domain",
            "lang",
            "source",
            "n_chars",
            "quality_score",
            "domain_rank",
        )
    )


def crawl_curated_corpus_sql(
    snap_sql: str,
    url_sql: str,
    quality_score_sql: str,
    gopher_sql: str,
    max_per_domain: int = 100,
    min_quality: float = MIN_QUALITY,
) -> str:
    """DuckDB mirror of :func:`crawl_curated_corpus` over a
    reconstructed post-extraction snapshot.

    ``snap_sql`` must yield the documents AS THE EXTRACTOR EMITS THEM
    (whitespace-normalized text) with columns (doc_id, text, lang,
    source); ``url_sql`` must yield (doc_id, url) — the pre-canonical
    URL fabric; ``quality_score_sql``/``gopher_sql`` must already read
    from a relation named ``kept_docs`` (the caller token-rewrites the
    registered oracles, the ``incremental_manifest`` idiom)."""
    from .urls import canonical_url_sql

    return f"""
    WITH snap AS ({snap_sql}),
    u AS ({url_sql}),
    c AS (
        SELECT snap.doc_id, snap.text, snap.lang, snap.source,
               length(snap.text)::BIGINT AS n_chars,
               {canonical_url_sql("u.url")} AS canonical_url
        FROM snap JOIN u ON snap.doc_id = u.doc_id
    ),
    kept_docs AS (
        SELECT * FROM (
            SELECT c.*,
                   MIN(doc_id) OVER (PARTITION BY canonical_url) AS _min
            FROM c
        ) t WHERE doc_id = _min
    ),
    q AS ({quality_score_sql}),
    g AS ({gopher_sql}),
    ranked AS (
        SELECT k.doc_id, k.canonical_url AS url,
               regexp_extract(k.canonical_url,
                   '^[a-z][a-z0-9+.\\-]*://([^/:?]*)', 1) AS domain,
               k.lang, k.source, k.n_chars,
               q.quality_score, g.keep AS gopher_keep
        FROM kept_docs k JOIN q USING (doc_id) JOIN g USING (doc_id)
    ),
    rr AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY domain
                   ORDER BY quality_score DESC, doc_id ASC
               )::BIGINT AS domain_rank
        FROM ranked
    )
    SELECT doc_id, url, domain, lang, source, n_chars, quality_score,
           domain_rank
    FROM rr
    WHERE domain_rank <= {max_per_domain}
      AND quality_score >= {min_quality} AND gopher_keep
    """
