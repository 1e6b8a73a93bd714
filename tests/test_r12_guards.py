"""Round-12 guards: appended-rows persistence across the index
save/load boundary (VERDICT r11 ask #3), the pre-cache dim guard in
ivf_pq_append (ADVICE r11), and the corrected base-release condition in
AnnIngestor.maybe_refit (ADVICE r11)."""

import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.01"


def _emb01(spark):
    from myodish_peak_analysis_spark.schema import read_table

    return read_table(spark, SF01, "embeddings")


# --- appended_rows across save/load (VERDICT r11 ask #3) --------------------


def test_saved_appended_index_reproduces_refit_verdict(spark, tmp_path):
    """The full lifecycle round-trip: fit -> append -> save -> load must
    reproduce the pre-save index_health/needs_refit verdict WITHOUT the
    caller passing appended_rows= (pre-r12, the loaded index reported
    appended_rows=0 — the mass dial went blind after every restart)."""
    from myodish_peak_analysis_spark.llm import similarity as S

    emb = _emb01(spark)
    corpus = emb.filter(F.col("vec_id") % 10 > 2)
    batch = emb.filter(F.col("vec_id") % 10 <= 2)
    idx = S.fit_ivf_pq_index(corpus)
    idx2 = S.ivf_pq_append(idx, batch)
    pre = S.needs_refit(idx2, max_appended_fraction=0.05)
    assert pre["refit"] is True  # the dial we must reproduce after load

    S.save_ivf_pq_index(idx2, str(tmp_path / "idx"))
    loaded = S.load_ivf_pq_index(spark, str(tmp_path / "idx"))
    assert loaded.appended == batch.count()
    h = S.index_health(loaded)
    assert h["appended_rows"] == batch.count()
    assert h["n_vectors"] == emb.count()
    assert h["appended_fraction"] == pytest.approx(
        pre["health"]["appended_fraction"]
    )
    post = S.needs_refit(loaded, max_appended_fraction=0.05)
    assert post["refit"] is True
    assert any("appended mass" in r for r in post["reasons"])
    # and the loaded index stays healthy under the default dials iff
    # the in-session one did
    assert (
        S.needs_refit(loaded)["refit"] == S.needs_refit(idx2)["refit"]
    )
    loaded.unpersist()
    idx2.unpersist()
    idx.unpersist()


def test_saved_fresh_index_loads_with_zero_appended(spark, tmp_path):
    from myodish_peak_analysis_spark.llm import similarity as S

    emb = _emb01(spark)
    idx = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 > 3))
    S.save_ivf_pq_index(idx, str(tmp_path / "fresh"))
    loaded = S.load_ivf_pq_index(spark, str(tmp_path / "fresh"))
    assert loaded.appended == 0
    h = S.index_health(loaded)
    assert h["appended_rows"] == 0 and h["appended_fraction"] == 0.0
    loaded.unpersist()
    idx.unpersist()


def test_append_onto_loaded_index_keeps_count_running(spark, tmp_path):
    """ivf_pq_append on a LOADED index must keep the persisted count
    running (the loaded chain is empty, so owned-derivation would see
    only post-load batches and silently under-report the mass dial)."""
    from myodish_peak_analysis_spark.llm import similarity as S

    emb = _emb01(spark)
    idx = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 > 2))
    b1 = emb.filter(F.col("vec_id") % 10 == 0)
    b2 = emb.filter(F.col("vec_id") % 10 == 1)
    idx2 = S.ivf_pq_append(idx, b1)
    S.save_ivf_pq_index(idx2, str(tmp_path / "grown"))
    loaded = S.load_ivf_pq_index(spark, str(tmp_path / "grown"))
    regrown = S.ivf_pq_append(loaded, b2)
    assert regrown.appended == b1.count() + b2.count()
    h = S.index_health(regrown)
    assert h["appended_rows"] == b1.count() + b2.count()
    # a second save/load carries the RUNNING total, not just the last leg
    S.save_ivf_pq_index(regrown, str(tmp_path / "grown2"))
    reloaded = S.load_ivf_pq_index(spark, str(tmp_path / "grown2"))
    assert reloaded.appended == b1.count() + b2.count()
    reloaded.unpersist()
    regrown.unpersist()
    loaded.unpersist()
    idx2.unpersist()
    idx.unpersist()


def test_explicit_appended_rows_still_overrides(spark, tmp_path):
    """Caller precedence is unchanged: an explicit appended_rows=
    argument beats both the persisted count and chain derivation (the
    AnnIngestor externally-tracked path)."""
    from myodish_peak_analysis_spark.llm import similarity as S

    emb = _emb01(spark)
    idx = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 > 2))
    idx2 = S.ivf_pq_append(idx, emb.filter(F.col("vec_id") % 10 == 0))
    S.save_ivf_pq_index(idx2, str(tmp_path / "o"))
    loaded = S.load_ivf_pq_index(spark, str(tmp_path / "o"))
    assert S.index_health(loaded, appended_rows=7)["appended_rows"] == 7
    loaded.unpersist()
    idx2.unpersist()
    idx.unpersist()


# --- pre-cache dim guard (ADVICE r11) ---------------------------------------


def test_ivf_pq_append_wrong_dim_raises_before_caching(spark):
    """A wrong-dim batch must be refused BEFORE new_members is cached —
    the ADVICE-r11 leak: the old flow cached+counted the assignment
    frame, then raised from the PQ encoder's per-row guard, leaving the
    cached frame with no caller handle to unpersist."""
    from myodish_peak_analysis_spark.llm import similarity as S

    emb = _emb01(spark)
    idx = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 != 3))
    bad = emb.filter(F.col("vec_id") % 10 == 3).select(
        "vec_id",
        F.expr("slice(embedding, 1, size(embedding) - 1)").alias("embedding"),
    )
    n_cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    with pytest.raises(ValueError, match="batch embedding dim"):
        S.ivf_pq_append(idx, bad)
    assert (
        spark.sparkContext._jsc.getPersistentRDDs().size() == n_cached_before
    )
    idx.unpersist()


# --- maybe_refit base-release condition (ADVICE r11) ------------------------


def test_maybe_refit_zero_append_trip_releases_base_once(spark):
    """A refit tripped with ZERO appended batches (relative imbalance
    dial) has old_base IS the refit input: refit's release_old already
    freed it, and the fixed guard must not re-release (the old guard
    compared against the freshly-built index — always a new object —
    so it never expressed this). Observable contract: the refit
    happens, the superseded base is released, the new index is live
    and healthy."""
    from myodish_peak_analysis_spark.llm import similarity as S
    from myodish_peak_analysis_spark.streaming.peaks import AnnIngestor

    emb = _emb01(spark)
    base = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 > 2))
    ing = AnnIngestor(base)
    _ = ing.fit_imbalance  # capture the baseline before tripping
    # max_imbalance=1.0 -> relative limit = baseline/1.25 < baseline:
    # trips on the pristine index with appended == 0
    assert ing.maybe_refit(max_imbalance=1.0) is True
    assert ing.index is not base
    assert ing._base is ing.index
    assert not base.members.storageLevel.useMemory
    assert ing.index.members.storageLevel.useMemory
    assert S.index_health(ing.index)["n_vectors"] == (
        emb.filter(F.col("vec_id") % 10 > 2).count()
    )
    ing.index.unpersist()


def test_maybe_refit_after_appends_releases_old_base_and_chain(spark):
    """The normal path: appends happened, the mass dial trips, and BOTH
    the append chain (refit's release_old) and the distinct old base
    (the explicit guard) are released; serving continues on the refit
    index with every ingested vector first-class."""
    from myodish_peak_analysis_spark.llm import similarity as S
    from myodish_peak_analysis_spark.streaming.peaks import AnnIngestor

    emb = _emb01(spark)
    base = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 > 2))
    ing = AnnIngestor(base)
    ing.ingest(emb.filter(F.col("vec_id") % 10 == 0))
    chain = ing.index.owned
    assert ing.maybe_refit(max_appended_fraction=0.01) is True
    assert all(not df.storageLevel.useMemory for df in chain)
    assert not base.members.storageLevel.useMemory
    probe = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .limit(1)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    top = S.ivf_pq_search(probe, ing.index, k=1).collect()
    assert top and top[0].vec_id == top[0].query_id
    ing.index.unpersist()


def test_ann_ingestor_seeds_counter_from_loaded_index(spark, tmp_path):
    """An AnnIngestor over a load_ivf_pq_index-ed index must start its
    counter at the PERSISTED since-fit mass, not 0 — maybe_refit passes
    `appended_rows=self.appended`, which would otherwise override
    exactly the pre-restart ingest the meta table now remembers."""
    from myodish_peak_analysis_spark.llm import similarity as S
    from myodish_peak_analysis_spark.streaming.peaks import AnnIngestor

    emb = _emb01(spark)
    idx = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 > 2))
    b1 = emb.filter(F.col("vec_id") % 10 == 0)
    idx2 = S.ivf_pq_append(idx, b1)
    S.save_ivf_pq_index(idx2, str(tmp_path / "restart"))
    loaded = S.load_ivf_pq_index(spark, str(tmp_path / "restart"))
    ing = AnnIngestor(loaded)
    assert ing.appended == b1.count()
    # the restarted loop keeps counting from there
    b2 = emb.filter(F.col("vec_id") % 10 == 1)
    ing.ingest(b2)
    assert ing.appended == b1.count() + b2.count()
    # a fresh-fit ingestor still starts at zero
    assert AnnIngestor(idx).appended == 0
    ing.index.unpersist()
    loaded.unpersist()
    idx2.unpersist()
    idx.unpersist()


# --- corpus snapshot diff (round 12) ----------------------------------------


def test_corpus_diff_classifies_changes(spark):
    """added/removed/modified classification on a hand-built snapshot
    pair; unchanged docs are excluded; the join carries md5 digests,
    not text (plan-asserted: no `text` column past the projections)."""
    from myodish_peak_analysis_spark.llm.curate import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
    )
    got = {r.doc_id: r.change for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 3: "modified", 4: "added"}
    # the join sides are md5 projections: `text` appears only below the
    # digest computation, never as a join/shuffle output column
    optimized = (
        corpus_diff(old, new)._jdf.queryExecution().optimizedPlan().toString()
    )
    join_part = optimized.split("Join", 1)[0]
    assert "_oh" in optimized and "_nh" in optimized
    assert "text" not in join_part


def test_corpus_diff_null_text_presence_not_hash(spark):
    """NULL-text docs must classify by ROW presence, not md5-nullness
    (self-review round 12): unchanged NULL-text docs emit nothing,
    removed ones say 'removed', NULL<->value transitions say
    'modified'."""
    from myodish_peak_analysis_spark.llm.curate import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "c"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (3, None), (4, "now set")], "doc_id long, text string"
    )
    got = {r.doc_id: r.change for r in corpus_diff(old, new).collect()}
    # 1: NULL->NULL unchanged (absent); 2: removed; 3: value->NULL
    # modified; 4: NULL->value modified
    assert got == {2: "removed", 3: "modified", 4: "modified"}


def test_warc_encode_refuses_null_fields(spark):
    """A NULL lang (or text/source) must raise loudly instead of
    nulling the record and, through the binary fold, the whole file's
    content (self-review round 12)."""
    import pytest as _pytest

    from myodish_peak_analysis_spark.sources.warc import (
        encode_documents_warc,
    )

    docs = spark.createDataFrame(
        [(1, "ok", "en", "s"), (2, "boom", None, "s")],
        "doc_id long, text string, lang string, source string",
    )
    with _pytest.raises(Exception, match="NULL text/lang/source"):
        encode_documents_warc(docs, file_mod=1).collect()


def test_ann_ingestor_seeds_counter_from_in_session_chain(spark):
    """An ingestor constructed over an ivf_pq_append-grown IN-SESSION
    index must seed from the owned chain — maybe_refit's explicit
    appended_rows= would otherwise suppress the chain derivation and
    blind the mass dial to pre-construction appends (self-review
    round 12)."""
    from myodish_peak_analysis_spark.llm import similarity as S
    from myodish_peak_analysis_spark.streaming.peaks import AnnIngestor

    emb = _emb01(spark)
    base = S.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 > 2))
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    grown = S.ivf_pq_append(base, batch)
    ing = AnnIngestor(grown)
    assert ing.appended == batch.count()
    # and the dial actually sees it: a tight mass dial trips at once
    assert ing.maybe_refit(max_appended_fraction=0.01) is True
    ing.index.unpersist()


def test_bpe_decode_inverts_apply(spark):
    """decode(apply(docs)) == docs on '+'-free text; the registered
    round-trip query refuses marker-bearing text loudly."""
    import pytest as _pytest

    from myodish_peak_analysis_spark.llm import bpe
    from myodish_peak_analysis_spark.llm.queries import q_bpe_roundtrip

    out = q_bpe_roundtrip(spark, SF01)
    from myodish_peak_analysis_spark.schema import read_table

    docs = read_table(spark, SF01, "documents")
    got = {r.doc_id: r.text for r in out.collect()}
    expect = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert got == expect
    plus = spark.createDataFrame(
        [(1, "a+b c")], "doc_id long, text string"
    )
    dec = bpe.bpe_decode(bpe.bpe_apply(plus, bpe.APPLY_MERGES))
    assert dec.first().text == "a b c"  # the documented lossy caveat
