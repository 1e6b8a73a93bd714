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

__all__ = ["sketch_profile", "per_source_sketches"]


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
