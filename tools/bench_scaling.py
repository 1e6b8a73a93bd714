#!/usr/bin/env python
"""Scaling regression: per-row cost must stay flat as the data grows.

Two operator families, selected with ``--family``:

* ``peaks`` (default): the full native pipeline (channelize → SG
  smooth → envelopes → diastolic → threshold peaks → attributes) and
  the constrained ``native_find_peaks``, over the events table
  replicated with shifted ``user_id``s so every copy lands in fresh
  channels, channel count scaled by the rows/TARGET_CHANNEL_ROWS rule.
* ``docs`` (round 6 — the VERDICT r5 ask: the dedup/LLM operators
  carry the repo's heaviest 100 TB claims and had no measured decade):
  ``minhash_pairs``, ``dedup_clusters`` (label-prop AND star),
  ``canonical_corpus``, ``incremental_neardup`` over the documents
  table. Replication rewrites EVERY token with a copy-specific prefix
  (``c3_word``): within a copy, shingle sets map bijectively so the
  original near-dup structure is preserved exactly; across copies the
  token sets are disjoint so Jaccard ≈ 0 — a K× corpus therefore
  carries ~K× true near-dup pairs and a K× vocabulary, the shape a
  genuinely bigger crawl has. (Naive replication would make every doc
  an exact dup of its K−1 copies: K² candidate pairs, a workload no
  real corpus produces.)
* ``rel`` (round 7 continuation — the last family with measured-decade
  coverage missing): the relational/behavioral-analytics operators
  (TPC-H Q1/Q3/Q5 shapes, sessionization, ordered funnel, cohort
  triangle, as-of join) over a star-schema WORLD replicated in
  lockstep: every copy shifts its ``custkey``/``orderkey``/``suppkey``/
  ``user_id`` ranges by a disjoint 1e9 stride so per-copy join fan-out
  and window-partition sizes are IDENTICAL to 1× while total volume
  grows K× — the shape a warehouse growing customers (not
  orders-per-customer) has. ``nation``/``region`` stay fixed (real
  warehouses don't grow nations; they stay broadcast dims at any
  scale). Throughput is rows/s over lineitem+events (the two fact
  tables the measured ops scan).
* ``emb`` (round 7 — the VERDICT r6 ask: the ANN/similarity family had
  recall measurements but no measured decade): ``ann_ivf_topk``,
  ``pq_topk``, ``sq8_topk``, ``rp_ivf_topk`` and the prefit search
  twins over the embeddings table. Replication applies a per-copy
  SIGNED-PERMUTATION rotation (circular dimension shift + hash-derived
  sign flips — an orthogonal transform): within a copy every pairwise
  inner product and norm is preserved EXACTLY, so the corpus's cluster
  and neighbor structure replicates bijectively; across copies vectors
  land in rotated orientations, so no distance-0 duplicates appear
  (naive replication would give every vector K−1 exact-dup neighbors —
  a degenerate top-k workload no real corpus produces). The QUERY
  BATCH is held at the 1× size (``query_mod`` scales with K): serving
  cost per fixed query batch against a K× corpus is the claim the
  decade verifies — brute compressed scans (pq/sq8) are O(Q·N) and
  should hold flat throughput; bucketed routes (IVF posting lists with
  k ≈ √N) should rise.

Prints one JSON line per (operator, factor) and exits 1 if any K×
throughput (rows/s) falls below ``--min-ratio`` (default 0.8) of the
PREVIOUS factor's throughput — i.e. if per-row cost grew across any
decade. Fixed planning/JIT/driver-round overhead amortizes with scale,
so healthy plans show throughput RISING; a ratio under 1 by more than
the noise floor means some stage is super-linear (a single-partition
sort, a growing window partition, a driver loop, a pair blow-up).

Usage: python tools/bench_scaling.py [--family peaks|docs|emb|rel]
           [--factors 10,100] [--min-ratio 0.8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from myodish_peak_analysis_spark.api import PeakPipeline  # noqa: E402
from myodish_peak_analysis_spark.schema import (  # noqa: E402
    TARGET_CHANNEL_ROWS,
    read_table,
    signal_frame_from_events,
)
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _best_of_2(df: DataFrame) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def _pipeline_seconds(events: DataFrame, n_rows: int) -> float:
    """Best-of-2 wall seconds for the full pipeline over ``events``."""
    n_channels = max(1, n_rows // TARGET_CHANNEL_ROWS)
    sig = signal_frame_from_events(events, n_channels=n_channels)
    pipe = (
        PeakPipeline(sig).smooth().envelopes().diastolic().detect_peaks().attributes()
    )
    return _best_of_2(pipe)


def _find_peaks_seconds(events: DataFrame, n_rows: int) -> float:
    """Best-of-2 wall seconds for the JVM-side constrained find_peaks."""
    from myodish_peak_analysis_spark.operators.native_peaks import (
        native_find_peaks,
    )
    from myodish_peak_analysis_spark.operators.smooth import with_fir_smooth

    n_channels = max(1, n_rows // TARGET_CHANNEL_ROWS)
    sig = with_fir_smooth(signal_frame_from_events(events, n_channels=n_channels))
    return _best_of_2(native_find_peaks(sig))


def _replicate(base: DataFrame, k: int) -> DataFrame:
    """K copies with disjoint user_id ranges: channel populations stay
    reference-shaped while channel COUNT grows linearly — exactly how
    auto_channels absorbs more data. One explode, not K union branches,
    so the 100× plan stays flat."""
    return base.withColumn(
        "_c", F.explode(F.expr(f"sequence(0, {k - 1})"))
    ).select(
        (
            F.col("user_id") + F.col("_c").cast("long") * F.lit(1_000_000_000)
        ).alias("user_id"),
        "ts",
        "event_id",
        "value",
    )


def _timed_build(build) -> float:
    """Best-of-2 wall seconds INCLUDING build(): the iterative dedup
    operators (label-prop convergence, star rounds) do real driver-
    action work before the returned frame exists — excluding it would
    time only the final projection."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def _replicate_docs(base: DataFrame, k: int) -> DataFrame:
    """K corpus copies with disjoint doc_id ranges and per-copy token
    prefixes (see module docstring: preserves in-copy near-dup
    structure bijectively, kills cross-copy Jaccard). Copy 0 is the
    original corpus verbatim. doc_id strides by 1e9 (a multiple of 10,
    so the %10 new/corpus split keeps its per-copy meaning)."""
    pref = F.concat(F.lit("c"), F.col("_c").cast("string"), F.lit("_"))
    return base.withColumn(
        "_c", F.explode(F.expr(f"sequence(0, {k - 1})"))
    ).select(
        (
            F.col("doc_id") + F.col("_c").cast("long") * F.lit(1_000_000_000)
        ).alias("doc_id"),
        F.when(F.col("_c") == 0, F.col("text"))
        .otherwise(
            F.concat(
                pref,
                F.regexp_replace("text", F.lit(" "), F.concat(F.lit(" "), pref)),
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )


#: Per-op extra JSON fields for the decade rows, filled by the op
#: lambdas (e.g. label-prop rounds-to-converge) and popped by main()'s
#: printer — the VERDICT r7 ask #2 wants the convergence-round count
#: alongside the 1000x dedup timings, not just wall seconds.
_EXTRA_FIELDS: dict[str, dict] = {}


def _docs_ops():
    from pyspark.sql import functions as FF

    from myodish_peak_analysis_spark.llm import dedup

    def incr(d: DataFrame):
        return dedup.incremental_neardup(
            d.filter(FF.col("doc_id") % 10 == 0),
            d.filter(FF.col("doc_id") % 10 != 0),
        )

    def clusters_with_rounds(name: str, **kw):
        def run(d: DataFrame, _n: int) -> float:
            s = _timed_build(lambda: dedup.dedup_clusters(d, **kw))
            method = kw.get("method", "label")
            _EXTRA_FIELDS[name] = {
                "rounds_to_converge": dedup.CONVERGENCE_ROUNDS.get(method)
            }
            return s

        return run

    def leakage_split(d: DataFrame, _n: int) -> float:
        s = _timed_build(lambda: _sampling_mod().leakage_safe_split(d))
        _EXTRA_FIELDS["leakage_safe_split"] = {
            "rounds_to_converge": dedup.CONVERGENCE_ROUNDS.get("label")
        }
        return s

    return (
        (
            "tfidf_cosine_pairs",
            lambda d, _n: _timed_build(
                lambda: _text_mod().tfidf_cosine_pairs(d)
            ),
        ),
        ("minhash_pairs", lambda d, _n: _timed_build(lambda: dedup.minhash_pairs(d))),
        ("dedup_clusters_label", clusters_with_rounds("dedup_clusters_label")),
        (
            "dedup_clusters_star",
            clusters_with_rounds("dedup_clusters_star", method="star"),
        ),
        (
            "canonical_corpus",
            lambda d, _n: _timed_build(lambda: dedup.canonical_corpus(d)),
        ),
        ("leakage_safe_split", leakage_split),
        ("incremental_neardup", lambda d, _n: _timed_build(lambda: incr(d))),
        # round-6 operators: the gram-heavy span cut, the per-pair DP
        # verify, and the fingerprint-keyed containment join.
        (
            "remove_dup_spans",
            lambda d, _n: _timed_build(lambda: _text_mod().remove_dup_spans(d)),
        ),
        # round-9 candidates-tier twins (VERDICT r8 ask #5): each row
        # pays candidate generation + the scoped verifier — the honest
        # end-to-end production posture whose decade curve the
        # full-corpus rows above bound from above.
        (
            "tfidf_verify",
            lambda d, _n: _timed_build(
                lambda: _text_mod().tfidf_verify(d, dedup.minhash_pairs(d))
            ),
        ),
        (
            "dup_spans_scoped",
            lambda d, _n: _timed_build(
                lambda: _text_mod().remove_dup_spans_scoped(
                    d, d.filter(FF.col("doc_id") % 4 == 0).select("doc_id")
                )
            ),
        ),
        # round 10: the amortized path — fit_dup_gram_stats runs inside
        # rep 1's timed region and rep 2 reuses the cached fit (best-of-2
        # therefore records fit-amortized per-scope cost, the same
        # convention as the prefit-index emb rows).
        (
            "dup_spans_scoped_prefit",
            lambda d, _n: _timed_build(
                lambda: _text_mod().remove_dup_spans_scoped(
                    d,
                    d.filter(FF.col("doc_id") % 4 == 0).select("doc_id"),
                    dup_grams=_text_mod().fit_dup_gram_stats(d),
                )
            ),
        ),
        # round 10: DSIR importance resampling decades — the inline-fit
        # weights (3 exploded-gram passes) and the amortized prefit
        # serve (fit_dsir_logratio materializes the <=1024-row model in
        # rep 1's timed region; rep 2 records the one-explode-pass +
        # broadcast-join serve cost, the prefit-index convention).
        (
            "dsir_weights",
            lambda d, _n: _timed_build(
                lambda: _sampling_mod().dsir_logweights(d)
            ),
        ),
        (
            "dsir_weights_prefit",
            lambda d, _n: _timed_build(
                lambda: _sampling_mod().dsir_logweights(
                    d, logratio=_sampling_mod().fit_dsir_logratio(d)
                )
            ),
        ),
        (
            "dsir_sample",
            lambda d, _n: _timed_build(
                lambda: _sampling_mod().dsir_resample(d)
            ),
        ),
        (
            "dsir_curated_sample",
            lambda d, _n: _timed_build(
                lambda: _sampling_mod().dsir_resample(
                    d.join(
                        _curate_mod().curated_corpus(d).select("doc_id"),
                        "doc_id",
                    )
                )
            ),
        ),
        (
            "levenshtein_neardup",
            lambda d, _n: _timed_build(lambda: dedup.levenshtein_neardup(d)),
        ),
        (
            "containment_pairs",
            lambda d, _n: _timed_build(lambda: dedup.containment_pairs(d)),
        ),
        # the composed nightly build end-to-end: canonical dedup →
        # quality prune → leakage-safe train selection → pack spans
        (
            "training_corpus_manifest",
            lambda d, _n: _timed_build(
                lambda: _curate_mod().training_corpus_manifest(d)
            ),
        ),
    )


def _media_ops():
    """Round 8 (VERDICT r7 ask #6): the multimodal ``mapInPandas``
    decode is the one plan family with a DECLARED Python stage and no
    scaling row. Payloads are REAL container headers (PNG IHDR /
    RIFF-WAVE fmt+data / MP4 ftyp+moov+mvhd — the pure-stdlib parsers'
    production path, fake=False) with the document text as a variable
    binary tail, so each decade measures the full path: binary column
    through Arrow batching, per-row stdlib header parse, typed metadata
    out. Replication is :func:`_replicate_docs` — per-copy token
    prefixes vary the tail bytes so copies aren't byte-identical
    payloads."""
    import struct

    from myodish_peak_analysis_spark.llm import multimodal

    def box(t: bytes, b: bytes) -> bytes:
        return struct.pack(">I", 8 + len(b)) + t + b

    png_hdr = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 1920, 1080)
        + b"\x08\x02\x00\x00\x00"
    )
    wav_hdr = (
        b"RIFF"
        + struct.pack("<I", 0)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
        + b"data"
        + struct.pack("<I", 10_000_000)  # clamped to the actual tail
    )
    mp4_hdr = box(b"ftyp", b"isom" + b"\x00" * 4 + b"mp42") + box(
        b"moov",
        box(b"mvhd", b"\x00" * 4 + b"\x00" * 8 + struct.pack(">II", 1000, 90000))
        + box(b"trak", b"")
        + box(b"trak", b""),
    )

    def media_frame(d: DataFrame, kind: str, hdr: bytes) -> DataFrame:
        return d.select(
            F.col("doc_id").alias("media_id"),
            F.lit(kind).alias("kind"),
            F.concat(F.lit(hdr), F.encode("text", "UTF-8")).alias("payload"),
            "source",
        )

    return (
        (
            "image_metadata_real",
            lambda d, _n: _timed_build(
                lambda: multimodal.image_metadata(
                    media_frame(d, "image", png_hdr), fake=False
                )
            ),
        ),
        (
            "audio_metadata_real",
            lambda d, _n: _timed_build(
                lambda: multimodal.audio_metadata(
                    media_frame(d, "audio", wav_hdr), fake=False
                )
            ),
        ),
        (
            "video_metadata_real",
            lambda d, _n: _timed_build(
                lambda: multimodal.video_metadata(
                    media_frame(d, "video", mp4_hdr), fake=False
                )
            ),
        ),
    )


def _replicate_emb(base: DataFrame, k: int) -> DataFrame:
    """K corpus copies with disjoint vec_id ranges, each under its own
    signed-permutation rotation (see module docstring). Copy 0 is the
    original corpus verbatim. The circular shift alone would repeat
    every 64 copies (dim = 64); the hash-derived sign flips make each
    copy's transform effectively unique, so no cross-copy exact
    duplicates arise at any K. vec_id strides by 1e9 (divisible by the
    scaled query_mod 50·K for decade K, so the %-query set keeps its
    per-copy positions)."""
    rot = (
        "CASE WHEN _c = 0 THEN embedding ELSE "
        "transform(embedding, (x, i) -> CAST("
        "  element_at(embedding, pmod(i + _c, size(embedding)) + 1)"
        "  * (CASE WHEN pmod(hash(_c, pmod(i + _c, size(embedding))), 2) = 0"
        "     THEN 1.0 ELSE -1.0 END)"
        " AS FLOAT)) END"
    )
    return base.withColumn(
        "_c", F.explode(F.expr(f"sequence(0, {k - 1})"))
    ).select(
        (
            F.col("vec_id") + F.col("_c").cast("long") * F.lit(1_000_000_000)
        ).alias("vec_id"),
        F.expr(rot).alias("embedding"),
        "label",
    )


def _emb_ops(n1_holder: dict, recall: bool = False):
    """ANN ops, query batch pinned to the 1× size via query_mod = 50·K
    (K derived from the measured row count). The prefit twins fit
    their index OUTSIDE the timed region — the fit-once/search-many
    serving path — while the fit-inline ops keep the fit inside, as
    the registered queries do.

    ``recall`` (round 8, VERDICT r7 ask #5): after timing, re-run the
    prefit/serve searches at k=10 (UNTIMED) and record recall@10
    against brute-force cosine ground truth over the SAME query batch
    and the SAME K× corpus — auto-k grows with N, so rising latency
    alone can mask a silent recall collapse at 10×/100×. Ground truth
    is one crossJoin window per factor (top-11 with self, cached),
    from which both self-excluded (corpus-query routes) and
    self-included (external serving) top-10 truths are derived."""
    from pyspark.sql import Window

    from myodish_peak_analysis_spark.llm import similarity as S
    from myodish_peak_analysis_spark.llm.params import ANN_QUERY_MOD

    RK = 10
    _truth_cache: dict = {}

    def qmod(n: int) -> int:
        return ANN_QUERY_MOD * max(1, round(n / n1_holder["n1"]))

    def nprobe_held(n: int) -> int:
        """The constant-coverage dial: auto-k grows ~√N, so a FIXED
        nprobe shrinks probe coverage by √10 per decade and recall@10
        collapses silently (measured: serve 0.242→0.163→0.120 across
        1×/10×/100× at nprobe=2). Scaling nprobe ∝ √(N/N₁) holds
        nprobe/k — the fraction of the corpus each query scans —
        constant, which is the FAISS-documented production posture
        (grow nprobe with nlist to hold recall)."""
        import math

        return max(2, round(2 * math.sqrt(n / n1_holder["n1"])))

    def _truth(d: DataFrame, n: int) -> DataFrame:
        if n in _truth_cache:
            return _truth_cache[n]
        qn = S._with_norm(
            d.filter(F.col("vec_id") % qmod(n) == 0)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
        )
        cn = S._with_norm(d).select(
            "vec_id",
            F.col("embedding").alias("c_emb"),
            F.col("_norm").alias("c_norm"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        )
        t = (
            qn.crossJoin(cn)
            .select(
                "query_id",
                "vec_id",
                F.round(
                    S._dot("q_emb", "c_emb")
                    / (F.col("q_norm") * F.col("c_norm")),
                    6,
                ).alias("cosine"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= RK + 1)
            .select("query_id", "vec_id", "rank")
            .cache()
        )
        t.count()
        _truth_cache[n] = t
        return t

    def _recall_at_10(
        result: DataFrame, d: DataFrame, n: int, include_self: bool,
        shift: int = 0,
    ) -> float:
        t = _truth(d, n)
        if include_self:
            truth = t.filter(F.col("rank") <= RK)
        else:
            w2 = Window.partitionBy("query_id").orderBy("rank")
            truth = (
                t.filter(F.col("query_id") != F.col("vec_id"))
                .withColumn("_r2", F.row_number().over(w2))
                .filter(F.col("_r2") <= RK)
            )
        truth = truth.select(
            (F.col("query_id") + F.lit(shift)).alias("query_id"), "vec_id"
        )
        n_truth = truth.count()
        hits = (
            result.select("query_id", "vec_id")
            .join(truth, ["query_id", "vec_id"])
            .count()
        )
        return hits / n_truth

    def prefit_pq(d: DataFrame, n: int) -> float:
        idx = S.fit_ivf_pq_index(d, n_clusters="auto")
        try:
            sec = _timed_build(
                lambda: S.ivf_pq_topk(
                    d, index=idx, n_clusters="auto", query_mod=qmod(n)
                )
            )
            if recall:
                r = _recall_at_10(
                    S.ivf_pq_topk(
                        d, index=idx, n_clusters="auto",
                        query_mod=qmod(n), k=RK,
                    ),
                    d, n, include_self=False,
                )
                np_h = nprobe_held(n)
                sec_h = _timed_build(
                    lambda: S.ivf_pq_topk(
                        d, index=idx, n_clusters="auto",
                        query_mod=qmod(n), nprobe=np_h,
                    )
                )
                r_h = _recall_at_10(
                    S.ivf_pq_topk(
                        d, index=idx, n_clusters="auto",
                        query_mod=qmod(n), k=RK, nprobe=np_h,
                    ),
                    d, n, include_self=False,
                )
                _EXTRA_FIELDS["ivf_pq_topk_prefit"] = {
                    "recall_at_10": round(r, 3),
                    "nprobe_held": np_h,
                    "recall_at_10_held": round(r_h, 3),
                    "sec_held": round(sec_h, 3),
                }
            return sec
        finally:
            idx.members.unpersist()
            idx.codes.unpersist()

    def serve(d: DataFrame, n: int) -> float:
        # External-query serving (ivf_pq_search): the index is prefit
        # on the K× corpus OUTSIDE the timed region; the QUERY BATCH is
        # a fixed-size external frame (the 1× batch size, fresh ids not
        # in the corpus) — the purest serving claim: a production
        # request batch against a K× index.
        from pyspark.sql import functions as F

        idx = S.fit_ivf_pq_index(d, n_clusters="auto")
        qs = (
            d.filter(F.col("vec_id") % qmod(n) == 0)
            .select((F.col("vec_id") + n * 10).alias("query_id"), "embedding")
        )
        try:
            sec = _timed_build(lambda: S.ivf_pq_search(qs, idx))
            if recall:
                r = _recall_at_10(
                    S.ivf_pq_search(qs, idx, k=RK),
                    d, n, include_self=True, shift=n * 10,
                )
                np_h = nprobe_held(n)
                sec_h = _timed_build(
                    lambda: S.ivf_pq_search(qs, idx, nprobe=np_h)
                )
                r_h = _recall_at_10(
                    S.ivf_pq_search(qs, idx, k=RK, nprobe=np_h),
                    d, n, include_self=True, shift=n * 10,
                )
                _EXTRA_FIELDS["ann_serve"] = {
                    "recall_at_10": round(r, 3),
                    "nprobe_held": np_h,
                    "recall_at_10_held": round(r_h, 3),
                    "sec_held": round(sec_h, 3),
                }
            return sec
        finally:
            idx.members.unpersist()
            idx.codes.unpersist()

    def serve_appended(d: DataFrame, n: int) -> float:
        # round 10: the between-refits ingest claim — a FIXED-size
        # batch (the 1x batch size, same qmod mechanism as the query
        # batch) appended onto an index prefit on the K× corpus, then
        # the fixed external query batch served against the union. If
        # ivf_pq_append is O(batch) as documented, this row tracks the
        # plain ann_serve row at every decade (append adds a constant).
        # Best-of-2 with the append inside the timed region: rep 1
        # pays the assign+union materialization, rep 2 records the
        # amortized cost (the prefit convention).
        from pyspark.sql import functions as F

        batch = d.filter(F.col("vec_id") % qmod(n) == 1)
        corpus = d.filter(F.col("vec_id") % qmod(n) != 1)
        idx = S.fit_ivf_pq_index(corpus, n_clusters="auto")
        qs = (
            d.filter(F.col("vec_id") % qmod(n) == 0)
            .select((F.col("vec_id") + n * 10).alias("query_id"), "embedding")
        )
        holder: dict = {}
        try:
            def build():
                # release the previous rep's per-batch append caches
                # (IvfPqIndex.unpersist cascades to the owned frames —
                # the ADVICE-r10 leak fix; the parent idx stays cached)
                if "idx2" in holder:
                    holder["idx2"].unpersist()
                holder["idx2"] = S.ivf_pq_append(idx, batch)
                return S.ivf_pq_search(qs, holder["idx2"])

            return _timed_build(build)
        finally:
            idx.members.unpersist()
            idx.codes.unpersist()
            if "idx2" in holder:
                holder["idx2"].unpersist()

    def prefit_sq8(d: DataFrame, n: int) -> float:
        idx = S.fit_ivf_pq_index(d, n_clusters="auto")
        try:
            sec = _timed_build(
                lambda: S.ivf_sq8_topk(
                    d, index=idx, n_clusters="auto", query_mod=qmod(n)
                )
            )
            if recall:
                r = _recall_at_10(
                    S.ivf_sq8_topk(
                        d, index=idx, n_clusters="auto",
                        query_mod=qmod(n), k=RK,
                    ),
                    d, n, include_self=False,
                )
                np_h = nprobe_held(n)
                sec_h = _timed_build(
                    lambda: S.ivf_sq8_topk(
                        d, index=idx, n_clusters="auto",
                        query_mod=qmod(n), nprobe=np_h,
                    )
                )
                r_h = _recall_at_10(
                    S.ivf_sq8_topk(
                        d, index=idx, n_clusters="auto",
                        query_mod=qmod(n), k=RK, nprobe=np_h,
                    ),
                    d, n, include_self=False,
                )
                _EXTRA_FIELDS["ivf_sq8_topk_prefit"] = {
                    "recall_at_10": round(r, 3),
                    "nprobe_held": np_h,
                    "recall_at_10_held": round(r_h, 3),
                    "sec_held": round(sec_h, 3),
                }
            return sec
        finally:
            idx.members.unpersist()
            idx.codes.unpersist()

    return (
        (
            "ann_ivf_topk",
            lambda d, n: _timed_build(
                lambda: S.ivf_topk(d, n_clusters="auto", query_mod=qmod(n))
            ),
        ),
        (
            "pq_topk",
            lambda d, n: _timed_build(lambda: S.pq_topk(d, query_mod=qmod(n))),
        ),
        (
            "sq8_topk",
            lambda d, n: _timed_build(lambda: S.sq8_topk(d, query_mod=qmod(n))),
        ),
        (
            "rp_ivf_topk",
            lambda d, n: _timed_build(
                lambda: S.rp_ivf_topk(d, query_mod=qmod(n))
            ),
        ),
        ("ivf_pq_topk_prefit", prefit_pq),
        ("ivf_sq8_topk_prefit", prefit_sq8),
        ("ann_serve", serve),
        ("ann_serve_appended", serve_appended),
    )


class _RelWorld:
    """A lockstep-replicated star-schema world, quacking enough like a
    DataFrame (count/cache/unpersist) to ride the shared decade loop.
    ``count`` is the fact-table row total (lineitem + events) — the
    unit the rel ops' rows/s throughput is measured in."""

    FACTS = ("lineitem", "events")

    def __init__(self, tables: dict):
        self.t = tables

    def cache(self):
        for df in self.t.values():
            df.cache()
        return self

    def count(self) -> int:
        # count() also materializes every cached table so op timings
        # exclude the replicate-explode cost, matching the other
        # families' cached-input discipline.
        for name, df in self.t.items():
            if name not in self.FACTS:
                df.count()
        return sum(self.t[n].count() for n in self.FACTS)

    def unpersist(self):
        for df in self.t.values():
            df.unpersist()


def _read_rel_world(spark) -> "_RelWorld":
    names = ("customer", "orders", "lineitem", "supplier", "nation",
             "region", "events")
    return _RelWorld({n: read_table(spark, SF_DIR, n) for n in names})


def _replicate_rel(base: "_RelWorld", k: int) -> "_RelWorld":
    """K copies of the whole star schema with disjoint key ranges
    (stride 1e9 per copy on custkey/orderkey/suppkey/partkey/user_id/
    event_id). Copy 0 is the original world verbatim; within a copy
    every PK/FK relationship is preserved exactly, so a K× world has
    K× the join output and K× the window partitions — never K× the
    rows per partition. nation/region are shared across copies."""
    stride = 1_000_000_000

    def rep(df: DataFrame, keys: tuple[str, ...]) -> DataFrame:
        out = df.withColumn("_c", F.explode(F.expr(f"sequence(0, {k - 1})")))
        shift = F.col("_c").cast("long") * F.lit(stride)
        return out.select(
            *[
                (F.col(c) + shift).alias(c) if c in keys else F.col(c)
                for c in df.columns
            ]
        )

    t = base.t
    return _RelWorld(
        {
            "customer": rep(t["customer"], ("c_custkey",)),
            "orders": rep(t["orders"], ("o_orderkey", "o_custkey")),
            "lineitem": rep(
                t["lineitem"], ("l_orderkey", "l_partkey", "l_suppkey")
            ),
            "supplier": rep(t["supplier"], ("s_suppkey",)),
            "nation": t["nation"],
            "region": t["region"],
            "events": rep(t["events"], ("user_id", "event_id")),
        }
    )


def _rel_ops():
    from myodish_peak_analysis_spark.operators import relational as R
    from myodish_peak_analysis_spark.operators import sessions as SS
    from myodish_peak_analysis_spark.operators.asof import asof_join
    from myodish_peak_analysis_spark.schema import ts_micros

    def asof(w: "_RelWorld"):
        ev = w.t["events"].withColumn("ts_us", ts_micros(w.t["events"]))
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts_us", "value"
        )
        views = (
            ev.filter(F.col("event_type") == "view")
            .groupBy("user_id", "ts_us")
            .agg(F.max_by("value", "event_id").alias("view_value"))
        )
        return asof_join(
            purchases, views, on="ts_us", by="user_id",
            right_cols=("view_value",),
        )

    return (
        (
            "pricing_summary",
            lambda w, _n: _timed_build(
                lambda: R.pricing_summary(w.t["lineitem"])
            ),
        ),
        (
            "top_revenue_orders",
            lambda w, _n: _timed_build(
                lambda: R.segment_revenue_topk(
                    w.t["customer"], w.t["orders"], w.t["lineitem"]
                )
            ),
        ),
        (
            "nation_revenue",
            lambda w, _n: _timed_build(
                lambda: R.nation_revenue(
                    w.t["customer"], w.t["orders"], w.t["lineitem"],
                    w.t["supplier"], w.t["nation"], w.t["region"],
                )
            ),
        ),
        (
            "session_stats",
            lambda w, _n: _timed_build(
                lambda: SS.session_stats(w.t["events"])
            ),
        ),
        (
            "funnel_counts",
            lambda w, _n: _timed_build(
                lambda: SS.funnel_counts(w.t["events"])
            ),
        ),
        (
            "cohort_retention",
            lambda w, _n: _timed_build(
                lambda: SS.cohort_retention(w.t["events"])
            ),
        ),
        (
            "asof_join",
            lambda w, _n: _timed_build(lambda: asof(w)),
        ),
    )


def _curate_mod():
    from myodish_peak_analysis_spark.llm import curate

    return curate


def _text_mod():
    from myodish_peak_analysis_spark.llm import text

    return text


def _sampling_mod():
    from myodish_peak_analysis_spark.llm import sampling

    return sampling


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--factors",
        type=str,
        default="10,100",
        help="comma-separated replication factors, each measured vs the previous",
    )
    ap.add_argument("--min-ratio", type=float, default=0.8)
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra SparkSession config (repeatable), applied at "
        "session creation. Used by the uncached 1000x rel run to "
        "disable static auto-broadcast: the explode-replicated side "
        "carries the 1x parquet's size estimate, so the static planner "
        "broadcasts a 15M-row frame (2.2 GiB driver collect) that "
        "stats-aware planning over real warehouse files never would.",
    )
    ap.add_argument(
        "--uncached",
        action="store_true",
        help="do NOT cache the replicated Kx input: the op's timed "
        "region then includes regenerating it from the (cached) 1x "
        "base, the analog of a cluster scanning storage. Required "
        "when the Kx world exceeds one host's RAM (the rel family at "
        "1000x is ~700M wide fact rows: the cached-input run OOM-"
        "crawled past a 58-min timeout; uncached it measures).",
    )
    ap.add_argument(
        "--family",
        choices=("peaks", "docs", "emb", "rel", "media"),
        default="peaks",
    )
    ap.add_argument(
        "--ops",
        type=str,
        default=None,
        help="comma-separated op-name filter (default: the whole family)",
    )
    ap.add_argument(
        "--recall",
        action="store_true",
        help="emb family: also record recall@10 vs brute ground truth "
        "for the prefit/serve ops (untimed re-run at k=10)",
    )
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    spark = get_spark(
        "bench-scaling",
        extra_conf=dict(c.split("=", 1) for c in args.conf) or None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n1_holder: dict = {}
    if args.family == "docs":
        base = (
            read_table(spark, SF_DIR, "documents")
            .repartition(spark.sparkContext.defaultParallelism)
            .cache()
        )
        ops = _docs_ops()
        replicate = _replicate_docs
    elif args.family == "media":
        base = (
            read_table(spark, SF_DIR, "documents")
            .repartition(spark.sparkContext.defaultParallelism)
            .cache()
        )
        ops = _media_ops()
        replicate = _replicate_docs
    elif args.family == "rel":
        base = _read_rel_world(spark).cache()
        ops = _rel_ops()
        replicate = _replicate_rel
    elif args.family == "emb":
        base = (
            read_table(spark, SF_DIR, "embeddings")
            .repartition(spark.sparkContext.defaultParallelism)
            .cache()
        )
        ops = _emb_ops(n1_holder, recall=args.recall)
        replicate = _replicate_emb
    else:
        base = read_table(spark, SF_DIR, "events").cache()
        ops = (
            ("native_pipeline", _pipeline_seconds),
            ("native_find_peaks", _find_peaks_seconds),
        )
        replicate = _replicate
    if args.ops:
        keep = set(args.ops.split(","))
        ops = tuple((n, f) for n, f in ops if n in keep)
        if not ops:
            sys.exit(f"--ops matched nothing in family {args.family}")
    n1 = base.count()
    n1_holder["n1"] = n1
    failed = False
    # prev[(name)] = (factor, rows/s) of the previously measured scale
    prev = {}
    for name, fn in ops:
        s1 = fn(base, n1)
        prev[name] = (1, n1 / s1)
        extra1 = _EXTRA_FIELDS.pop(name, {})
        if extra1:
            # baseline visibility for the per-op extras (convergence
            # rounds, recall@10): the 1x value anchors the decade rows
            print(
                json.dumps(
                    {
                        "metric": f"scaling_baseline:{name}",
                        "rows_1x": n1,
                        "sec_1x": round(s1, 3),
                        "rows_per_sec_1x": round(n1 / s1),
                        **extra1,
                        "sf_dir": SF_DIR,
                    }
                )
            )
    base_tp = {name: tp for name, (_, tp) in prev.items()}
    for k in factors:
        big = replicate(base, k)
        if not args.uncached:
            big = big.cache()
        nk = big.count()
        for name, fn in ops:
            sk = fn(big, nk)
            tpk = nk / sk
            pf, ptp = prev[name]
            ratio = tpk / ptp
            print(
                json.dumps(
                    {
                        "metric": f"scaling_throughput_ratio:{name}",
                        "value": round(ratio, 3),
                        "unit": f"x (rows/s at {k}x vs {pf}x)",
                        "rows_kx": nk,
                        "sec_kx": round(sk, 3),
                        "rows_per_sec_kx": round(tpk),
                        "vs_1x": round(tpk / base_tp[name], 3),
                        **(
                            {"channels_kx": nk // TARGET_CHANNEL_ROWS}
                            if args.family == "peaks"
                            else {}
                        ),
                        **({"uncached_input": True} if args.uncached else {}),
                        **_EXTRA_FIELDS.pop(name, {}),
                        "sf_dir": SF_DIR,
                    }
                )
            )
            failed = failed or ratio < args.min_ratio
            prev[name] = (k, tpk)
        if not args.uncached:
            big.unpersist()
        # native_find_peaks persists its slim input projection
        # internally (persist_input=True); each factor's replicated
        # plan is a distinct cache entry, so without this the 1x/10x
        # projections stay resident while the 100x run is measured and
        # their eviction pressure can spuriously trip --min-ratio.
        spark.catalog.clearCache()
        base.cache().count()  # re-warm the shared 1x input
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
