"""incremental_corpus_manifest (round 13): output equality with the
full rebuild on the new snapshot — on the harness snapshot and on
adversarial diffs (near-dup creation by modification, near-dup
breakage, representative removal)."""

import pytest
from pyspark.sql import functions as F

from myodish_peak_analysis_spark.llm import curate

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "shard", "chunk_id", "doc_id", "begin_tok", "end_tok"
        ).collect()
    )


def _assert_incremental_equals_rebuild(old, new):
    state = curate.manifest_prefit_state(old)
    try:
        inc = _rows(curate.incremental_corpus_manifest(new, state))
        full = _rows(curate.training_corpus_manifest(new))
        assert inc == full and len(inc) > 0
    finally:
        curate.release_manifest_state(state)


def test_incremental_equals_rebuild_harness_snapshot(spark):
    """The registered query's contract Spark-vs-Spark at sf0.001:
    remove %10==0, modify %10==1, add re-keyed %10==2."""
    from myodish_peak_analysis_spark.llm.queries import _next_snapshot
    from myodish_peak_analysis_spark.schema import read_table

    docs = read_table(spark, SF001, "documents")
    _assert_incremental_equals_rebuild(docs, _next_snapshot(docs))
    spark.catalog.clearCache()


@pytest.fixture()
def crafted(spark):
    """A corpus with a near-dup family {1,2}, a singleton 3, and
    filler docs long enough to shingle."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " one", "en", "s0"),
        (2, base + " two", "en", "s0"),  # near-dup of 1
        (3, "totally different words nothing shared here at all okay", "en", "s0"),
        (4, "lambda mu nu xi omicron pi rho sigma tau upsilon", "en", "s1"),
        (5, "phi chi psi omega aleph beth gimel daleth he waw", "en", "s1"),
    ]
    return spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_modification_creates_neardup_edge(spark, crafted):
    """Doc 4's text becomes a near-copy of doc 5: the fresh verify
    stage must discover the NEW edge (carried edges alone would miss
    it) — pinned by rebuild equality."""
    new = crafted.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 4,
            F.lit("phi chi psi omega aleph beth gimel daleth he vau"),
        ).otherwise(F.col("text")),
    )
    _assert_incremental_equals_rebuild(crafted, new)
    spark.catalog.clearCache()


def test_modification_breaks_neardup_edge(spark, crafted):
    """Doc 2 is rewritten away from doc 1: the carried edge {1,2} must
    be DROPPED (its endpoint changed), splitting the family."""
    new = crafted.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 2,
            F.lit("rewritten entirely separate vocabulary now appears here"),
        ).otherwise(F.col("text")),
    )
    _assert_incremental_equals_rebuild(crafted, new)
    spark.catalog.clearCache()


def test_removal_of_family_representative(spark, crafted):
    """Doc 2 (family {1,2} member) and singleton 3 are removed; a new
    doc 6 arrives as a near-dup of doc 1 — removal retirement and
    addition discovery in one diff."""
    new = crafted.filter(~F.col("doc_id").isin(2, 3)).unionByName(
        crafted.sparkSession.createDataFrame(
            [(6, "alpha beta gamma delta epsilon zeta eta theta iota kappa six",
              "en", "s0", 62)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    _assert_incremental_equals_rebuild(crafted, new)
    spark.catalog.clearCache()


def test_empty_diff_is_identity(spark, crafted):
    """new == old: everything carried, nothing fresh, same manifest."""
    _assert_incremental_equals_rebuild(crafted, crafted)
    spark.catalog.clearCache()
