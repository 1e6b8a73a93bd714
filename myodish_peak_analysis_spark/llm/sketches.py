"""Approximate sketches — the 100 TB substitutes for exact aggregates.

Several exact operators in this package (vocab counts, exact
percentiles, distinct-token counts) are oracle-checkable but carry a
corpus-sized shuffle at scale. These are their sketch counterparts,
all built on Spark's JVM-side implementations:

* ``approx_count_distinct`` — HyperLogLog++ (Heule et al., public):
  fixed ~KB of state per group, map-side mergeable, one tiny exchange
  instead of a distinct-shuffle of every token occurrence.
* ``percentile_approx`` — Greenwald-Khanna / KLL-style quantile sketch:
  bounded-memory mergeable summaries instead of a global sort.

Both are deterministic for a fixed input (sketches are
insertion-order-merge-invariant in Spark's implementations), so results
are stable across runs — but they intentionally do NOT match an exact
DuckDB oracle, so the registered query is a rows-only check; the
tolerance contract vs the exact aggregates is pinned by
``tests/test_llm.py::test_sketch_profile_tolerances``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _TOKENS

__all__ = ["sketch_profile", "sketch_profile_checked", "per_source_sketches"]


def sketch_profile(docs: DataFrame, rsd: float = 0.01) -> DataFrame:
    """One-row corpus profile from mergeable sketches only.

    Every column is a map-side-combinable sketch aggregate: the whole
    profile costs one scan plus a single 1-row reduce, independent of
    corpus size — vs the token-explode + distinct-shuffle the exact
    forms pay.
    """
    toks = docs.select(F.explode(F.expr(_TOKENS)).alias("term"))
    tok_card = toks.agg(
        F.approx_count_distinct("term", rsd).alias("approx_distinct_tokens")
    )
    doc_stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct(F.md5("text"), rsd).alias("approx_distinct_texts"),
        F.percentile_approx("n_chars", F.array(*[F.lit(x) for x in (0.5, 0.9, 0.99)]))
        .alias("_pcts"),
    ).select(
        "n_docs",
        "approx_distinct_texts",
        F.col("_pcts")[0].alias("p50_chars"),
        F.col("_pcts")[1].alias("p90_chars"),
        F.col("_pcts")[2].alias("p99_chars"),
    )
    return doc_stats.crossJoin(F.broadcast(tok_card))


def sketch_profile_checked(
    docs: DataFrame, rsd: float = 0.01, rel_tol: float = 0.05
) -> DataFrame:
    """Self-verifying form of :func:`sketch_profile` — the hash-checkable
    registration (VERDICT r5 ask #5).

    A sketch can never hash-match an exact oracle, but its CONTRACT can:
    this query computes both the sketch side and the exact side in one
    plan and emits (a) the exact values and (b) deterministic
    within-tolerance booleans ``|approx - exact| <= rel_tol * exact``.
    The DuckDB mirror computes the same exact side and emits literal
    TRUEs — so the hash matches iff the exact columns agree AND every
    sketch actually landed inside its tolerance. Spark's HLL++ and GK
    sketches are deterministic for fixed input, so the booleans are
    stable across runs (pinned by test_sketch_profile_tolerances).

    The exact side (token-explode distinct, full percentiles) is the
    corpus-sized shuffle the sketches exist to avoid — this query is
    the verification harness, not the production path; production calls
    :func:`sketch_profile`.
    """
    approx = sketch_profile(docs, rsd)
    toks = docs.select(F.explode(F.expr(_TOKENS)).alias("term"))
    exact_tok = toks.agg(
        F.countDistinct("term").alias("exact_distinct_tokens")
    )
    exact = docs.agg(
        F.countDistinct(F.md5("text")).alias("exact_distinct_texts"),
        F.round(F.expr("percentile(n_chars, 0.5D)"), 6).alias("p50_exact"),
        F.round(F.expr("percentile(n_chars, 0.9D)"), 6).alias("p90_exact"),
        F.round(F.expr("percentile(n_chars, 0.99D)"), 6).alias("p99_exact"),
    )

    def ok(a: str, e: str):
        return F.abs(F.col(a) - F.col(e)) <= F.lit(rel_tol) * F.col(e)

    return (
        approx.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(exact_tok))
        .select(
            "n_docs",
            "exact_distinct_tokens",
            "exact_distinct_texts",
            "p50_exact",
            "p90_exact",
            "p99_exact",
            ok("approx_distinct_tokens", "exact_distinct_tokens").alias(
                "tokens_within_tol"
            ),
            ok("approx_distinct_texts", "exact_distinct_texts").alias(
                "texts_within_tol"
            ),
            ok("p50_chars", "p50_exact").alias("p50_within_tol"),
            ok("p90_chars", "p90_exact").alias("p90_within_tol"),
            ok("p99_chars", "p99_exact").alias("p99_within_tol"),
        )
    )


def sketch_profile_checked_sql() -> str:
    """DuckDB mirror of :func:`sketch_profile_checked`: the exact side
    plus literal TRUE booleans (DuckDB has no HLL++/GK twin — the
    booleans ARE the sketch-side assertion). ``quantile_cont`` is the
    same interpolated type-7 quantile Spark's exact ``percentile``
    computes."""
    return """
    WITH tok AS (
        SELECT COUNT(DISTINCT term)::BIGINT AS exact_distinct_tokens
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    ),
    ex AS (
        SELECT COUNT(*)::BIGINT AS n_docs,
               COUNT(DISTINCT md5(text))::BIGINT AS exact_distinct_texts,
               ROUND(quantile_cont(n_chars, 0.5), 6) AS p50_exact,
               ROUND(quantile_cont(n_chars, 0.9), 6) AS p90_exact,
               ROUND(quantile_cont(n_chars, 0.99), 6) AS p99_exact
        FROM documents
    )
    SELECT n_docs, exact_distinct_tokens, exact_distinct_texts,
           p50_exact, p90_exact, p99_exact,
           TRUE AS tokens_within_tol, TRUE AS texts_within_tol,
           TRUE AS p50_within_tol, TRUE AS p90_within_tol,
           TRUE AS p99_within_tol
    FROM ex CROSS JOIN tok
    """


def per_source_sketches(docs: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Per-source cardinality/quantile sketches — the grouped form.

    The groupBy carries only sketch state per source (KBs), so the
    exchange is sources × sketch-size regardless of corpus size.
    """
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct(F.md5("text"), rsd).alias(
                "approx_distinct_texts"
            ),
            F.percentile_approx("n_chars", F.lit(0.5)).alias("p50_chars"),
        )
        .orderBy("source")
    )


def per_source_profile(docs: DataFrame) -> DataFrame:
    """The EXACT twin of :func:`per_source_sketches` — oracle-checkable
    (count, exact distinct text hashes, rank-formulated exact median of
    n_chars: mean of the middle one/two values, no engine-specific
    interpolation). This is what the sketches replace at 100 TB: the
    distinct here shuffles every (source, hash) pair and the median
    sorts per source, vs KB-sized mergeable sketch state."""
    from pyspark.sql.window import Window

    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("_n"),
    )
    mid = (
        (F.col("_rn") * 2 == F.col("_n"))
        | (F.col("_rn") * 2 == F.col("_n") + 1)
        | (F.col("_rn") * 2 == F.col("_n") + 2)
    )
    med = (
        ranked.filter(mid)
        .groupBy("source")
        .agg(F.round(F.avg("n_chars"), 6).alias("median_chars"))
    )
    return base.join(med, "source").orderBy("source")


def per_source_profile_sql() -> str:
    return """
    WITH ranked AS (
        SELECT source, n_chars, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    ),
    med AS (
        SELECT source, ROUND(AVG(n_chars), 6) AS median_chars
        FROM ranked
        WHERE rn * 2 IN (n, n + 1, n + 2)
        GROUP BY source
    ),
    base AS (
        SELECT source, COUNT(*)::BIGINT AS n_docs,
               COUNT(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        FROM documents GROUP BY source
    )
    SELECT base.source, n_docs, n_distinct_texts, median_chars
    FROM base JOIN med USING (source)
    ORDER BY base.source
    """
