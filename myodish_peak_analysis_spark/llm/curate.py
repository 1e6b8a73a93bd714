"""End-to-end corpus curation: the composition a real training-data
pipeline runs nightly — exact dedup, quality scoring, and Gopher-style
rule filtering in ONE lazy plan, producing the surviving document set.

Composition shape (quality/Gopher stages reuse the individually-
oracle-checked operators from :mod:`.text`; the dedup stage is the
window formulation of :func:`.dedup.exact_dedup`'s keeper rule,
inlined so no keeper-table join is needed):

1. canonical pick — keep the lowest ``doc_id`` per ``md5(text)`` group
   (one hash-partition window; no join against a keeper table needed);
2. quality gate — integer-exact composite score ≥ ``min_quality``;
3. Gopher rules — word-count / word-length / symbol / repetition caps.

Scale notes (100 TB): one shuffle by ``md5(text)`` for the canonical
window, then doc_id-aligned joins of projections of the SAME scan —
Catalyst plans the score and rule branches as co-partitioned shuffles
on ``doc_id``. No branch carries ``text`` past its projection, so
shuffle payload is metadata-sized. The whole thing is a filter: output
≤ input, never wider.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import with_gopher_quality, with_quality_score

#: Default quality-score floor for the curated set. The score is exact
#: (integer 1e-7 units / 1e7), so the threshold compare is portable.
MIN_QUALITY = 0.55


def curated_corpus(docs: DataFrame, min_quality: float = MIN_QUALITY) -> DataFrame:
    """Surviving documents after dedup + quality + Gopher filtering,
    with the scores that justified each keep."""
    w = Window.partitionBy("text_hash")
    canonical = (
        docs.withColumn("text_hash", F.md5("text"))
        .withColumn("min_doc", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("min_doc"))
        .select("doc_id", "lang", "source", "n_chars")
    )
    quality = with_quality_score(docs)
    gopher = with_gopher_quality(docs).select(
        "doc_id", F.col("keep").alias("gopher_keep")
    )
    return (
        canonical.join(quality, "doc_id")
        .join(gopher, "doc_id")
        .filter((F.col("quality_score") >= F.lit(min_quality)) & F.col("gopher_keep"))
        .select("doc_id", "lang", "source", "n_chars", "quality_score")
    )


def curated_corpus_sql(min_quality: float = MIN_QUALITY) -> str:
    """DuckDB oracle: the same three gates as one SQL statement, built
    on the same integer-exact score formulation."""
    from .oracle import ORACLES

    return f"""
    WITH canonical AS (
        SELECT doc_id, lang, source, n_chars
        FROM (
            SELECT doc_id, lang, source, n_chars,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_doc
            FROM documents
        ) t WHERE doc_id = min_doc
    ),
    quality AS ({ORACLES["quality_score"]}),
    gopher AS ({ORACLES["gopher_quality"]})
    SELECT c.doc_id, c.lang, c.source, c.n_chars, q.quality_score
    FROM canonical c
    JOIN quality q USING (doc_id)
    JOIN gopher g USING (doc_id)
    WHERE q.quality_score >= {min_quality} AND g.keep
    """
