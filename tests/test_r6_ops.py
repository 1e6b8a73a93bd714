"""Round-6 additions: BPE trainer scale path (sample-fit knob +
periodic lineage truncation), the self-verifying sketch profile, and
the pre-fitted ANN index overload."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myodish_peak_analysis_spark.llm import bpe, sketches
from myodish_peak_analysis_spark.schema import read_table

SF_DIR = "/root/testdata/sf0.01"


def _zipf_corpus(spark, n_docs: int = 300):
    """Deterministic corpus with a SKEWED pair distribution — the
    statistical shape of real text, where BPE's frequency ranking is
    stable under uniform sampling. (The harness `documents` table is
    uniform-random words: every adjacent pair is ~equally rare there,
    so ANY subsample reranks the top pairs — the adversarial case for
    sample-fit, exercised by test_bpe_sample_fit_uniform_caveat.)

    Construction: doc i repeats the bigram pattern `w{i%k} w{(i%k)+1}`
    with k chosen so low-index bigrams appear in many more docs
    (Zipf-ish counts), plus an index-dependent noise tail so documents
    are not identical.
    """
    rows = []
    for i in range(n_docs):
        # heavy head: bigram (a0 b0) in every doc; (a1 b1) in 1/2 of
        # docs; (a2 b2) in 1/4 ... — clean frequency separation that a
        # 1/2 or 1/3 uniform sample preserves.
        parts = ["a0 b0"]
        if i % 2 == 0:
            parts.append("a1 b1")
        if i % 4 == 0:
            parts.append("a2 b2")
        if i % 8 == 0:
            parts.append("a3 b3")
        parts.append(f"n{i} m{i * 7 % 97}")  # noise tail, unique-ish
        rows.append((i, " ".join(parts)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_sample_fit_matches_full_fit_on_skewed_corpus(spark):
    docs = _zipf_corpus(spark)
    full = [
        (r.left_tok, r.right_tok)
        for r in bpe.bpe_vocab(docs, n_merges=3).collect()
    ]
    assert full[0] == ("a0", "b0")  # sanity: the head pair wins round 1
    for mod in (2, 3):
        sampled = [
            (r.left_tok, r.right_tok)
            for r in bpe.bpe_vocab(docs, n_merges=3, fit_sample_mod=mod).collect()
        ]
        assert sampled == full, f"mod={mod} reranked the merge rules"


def test_bpe_sample_fit_uniform_caveat(spark):
    """On the uniform-random harness corpus the top pairs are ties at
    tiny counts — document (don't hide) that sample-fit CAN rerank
    there: the knob's contract is rank stability on skewed (real-text)
    distributions, not on white noise."""
    docs = read_table(spark, SF_DIR, "documents")
    full = bpe.bpe_vocab(docs, n_merges=1).collect()
    # the harness corpus's top pair exists but is rare relative to the
    # corpus — the skew BPE relies on is absent by construction
    assert full[0].n_pairs < docs.count() // 10


def test_bpe_encode_sample_fit_is_serving_fold(spark):
    """fit_sample_mod routes the full-corpus apply through the
    zero-exchange serving fold; schema and doc coverage must match the
    full-fit output, and the plan must contain no shuffle exchange."""
    docs = _zipf_corpus(spark, n_docs=64)
    out = bpe.bpe_encode(docs, n_merges=2, fit_sample_mod=2)
    assert out.columns == ["doc_id", "text_bpe", "n_tokens"]
    assert out.count() == 64  # full corpus, sample only fed the fit
    # a0+b0 must be merged in EVERY doc (rule learned on the sample,
    # applied corpus-wide)
    assert out.filter(F.col("text_bpe").contains("a0+b0")).count() == 64
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "serving apply must be map-only"


def test_bpe_checkpoint_rounds_preserve_results(spark):
    """Periodic localCheckpoint (lineage truncation) must not change
    the learned rules or the encoded corpus."""
    docs = _zipf_corpus(spark, n_docs=80)
    plain, plain_final = bpe._bpe_run(docs, n_merges=4, checkpoint_every=0)
    ck, ck_final = bpe._bpe_run(docs, n_merges=4, checkpoint_every=2)
    assert ck == plain
    a = sorted(
        (r.doc_id, tuple(r.toks)) for r in plain_final.select("doc_id", "toks").collect()
    )
    b = sorted(
        (r.doc_id, tuple(r.toks)) for r in ck_final.select("doc_id", "toks").collect()
    )
    assert a == b
    plain_final.unpersist()
    ck_final.unpersist()


def test_ivf_pq_prefit_equals_fit_inline(spark):
    """fit_ivf_pq_index + index= must return exactly what the
    fit-inline search returns (same params), and the IVF half must
    drive ivf_topk identically too."""
    from myodish_peak_analysis_spark.llm import similarity

    emb = read_table(spark, SF_DIR, "embeddings")
    inline = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_pq_topk(emb).collect()
    )
    idx = similarity.fit_ivf_pq_index(emb)
    prefit = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_pq_topk(emb, index=idx).collect()
    )
    assert prefit == inline

    ivf_inline = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_topk(emb).collect()
    )
    ivf_prefit = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_topk(emb, index=idx).collect()
    )
    assert ivf_prefit == ivf_inline


def test_sketch_profile_checked_all_green(spark):
    docs = read_table(spark, SF_DIR, "documents")
    row = sketches.sketch_profile_checked(docs).collect()[0]
    assert row.n_docs == docs.count()
    for flag in (
        "tokens_within_tol",
        "texts_within_tol",
        "p50_within_tol",
        "p90_within_tol",
        "p99_within_tol",
    ):
        assert getattr(row, flag) is True, flag
    # exact columns really are exact
    assert row.exact_distinct_texts == docs.selectExpr(
        "md5(text) h"
    ).distinct().count()


def test_chunk_overlap_invariants(spark):
    """Every token lands in >= 1 chunk; consecutive full chunks share
    size - stride tokens; tail chunk covers the remainder; plan is
    exchange-free (map-only)."""
    from myodish_peak_analysis_spark.llm import packing

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(100))),  # 100 toks
            (1, " ".join(f"t{i}" for i in range(32))),   # exactly one window
            (2, " ".join(f"t{i}" for i in range(33))),   # window + 1 tail tok
            (3, "only three tokens"),                     # shorter than window
        ],
        "doc_id long, text string",
    )
    out = packing.chunk_overlap(docs, size=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: full windows start at 0,24,48 ((100-32)=68 → last multiple
    # of 24 that fits is 48); 48+32 < 100 leaves a tail at 72 covering
    # the last 28 tokens
    starts0 = sorted(r.chunk_idx for r in by_doc[0])
    assert starts0 == [0, 1, 2, 3]
    chunks0 = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert all(r.n_tokens == 32 for r in chunks0[:-1])
    assert chunks0[-1].n_tokens == 100 - 72  # tail covers to the end
    # coverage: union of [start, start+n) == [0, 100)
    covered = set()
    for r in chunks0:
        s = r.chunk_idx * 24
        covered.update(range(s, s + r.n_tokens))
    assert covered == set(range(100))
    # overlap between consecutive full windows is size - stride
    c0 = chunks0[0].text_chunk.split(" ")
    c1 = chunks0[1].text_chunk.split(" ")
    assert c0[-8:] == c1[:8]
    # doc 1: single exact window, no tail
    assert [r.n_tokens for r in by_doc[1]] == [32]
    # doc 2: full window + tail of stride-aligned remainder
    assert sorted(r.n_tokens for r in by_doc[2]) == [9, 32]
    # doc 3: one short chunk
    assert [r.n_tokens for r in by_doc[3]] == [3]

    plan = packing.chunk_overlap(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sq8_recall_near_exact(spark):
    """int8 scalar quantization must be a near-lossless compression for
    cosine ranking: recall@10 vs the float brute force >= 0.9."""
    from myodish_peak_analysis_spark.llm import similarity

    emb = read_table(spark, SF_DIR, "embeddings")
    truth = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, k=10).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in similarity.sq8_topk(emb, k=10).collect()
    }
    assert len(got & truth) / len(truth) >= 0.9


def test_levenshtein_neardup_flags_candidates(spark):
    """Band-bucket candidates verified by relative edit distance; the
    exact-dup pair must score 0 and every pair must be an LSH
    candidate."""
    from myodish_peak_analysis_spark.llm import dedup

    docs = read_table(spark, SF_DIR, "documents")
    out = dedup.levenshtein_neardup(docs).collect()
    assert out, "sf0.01 corpus contains near-dup families"
    cand = {
        (r.doc_id_a, r.doc_id_b) for r in dedup.minhash_pairs(docs).collect()
    }
    for r in out:
        assert (r.doc_id_a, r.doc_id_b) in cand
        assert 0 <= r.rel_dist <= 0.5
        if r.lev_dist == 0:
            assert r.rel_dist == 0.0


def test_remove_dup_spans_cuts_shared_spans(spark):
    """Docs sharing an 8-token run lose exactly that run; untouched
    docs pass through verbatim; kept+removed == total."""
    from myodish_peak_analysis_spark.llm import text as t

    shared = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta {shared} gamma delta"),
            (1, f"one two three {shared} four"),
            (2, "totally unique words here nothing repeats at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in t.remove_dup_spans(docs).collect()}
    assert out[0].clean_text == "alpha beta gamma delta"
    assert out[1].clean_text == "one two three four"
    assert out[2].clean_text == "totally unique words here nothing repeats at all"
    for r in out.values():
        orig_n = {0: 12, 1: 12, 2: 8}[r.doc_id]
        assert r.n_tokens_kept + r.n_tokens_removed == orig_n


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully contained in a long doc: containment on the
    short side ~1 while Jaccard is low — the quote-inclusion case."""
    from myodish_peak_analysis_spark.llm import dedup

    quote = " ".join(f"q{i}" for i in range(10))
    filler = " ".join(f"f{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, quote), (1, f"{filler} {quote}")],
        "doc_id long, text string",
    )
    out = dedup.containment_pairs(docs, min_containment=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id_a, r.doc_id_b) == (0, 1)
    assert r.containment_a == 1.0  # the quote is fully inside doc 1
    assert r.containment_b < 0.2  # while Jaccard-style symmetry is low


def test_leakage_safe_split_families_never_straddle(spark):
    """Every near-dup family lands wholly in one split, and the split
    fractions are roughly the requested permilles on the (mostly
    singleton) harness corpus."""
    from myodish_peak_analysis_spark.llm import dedup, sampling

    docs = read_table(spark, SF_DIR, "documents")
    out = sampling.leakage_safe_split(docs).collect()
    assert len(out) == docs.count()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values()), (
        "a near-dup family straddles a split boundary"
    )
    # non-singleton families exist on this corpus and stay together
    sizes = {}
    for r in out:
        sizes[r.cluster_id] = sizes.get(r.cluster_id, 0) + 1
    assert max(sizes.values()) > 1
    # fractions in the right ballpark (hash is uniform-ish)
    n = len(out)
    frac_train = sum(1 for r in out if r.split == "train") / n
    assert 0.7 < frac_train <= 0.95


def test_ivf_sq8_matches_float_ivf(spark):
    """SQ8 in-list scoring is near-lossless: the composed IVF×SQ8
    result overlaps the float IVF result >= 0.9, and a prefit index
    drives it identically to fit-inline."""
    from myodish_peak_analysis_spark.llm import similarity

    emb = read_table(spark, SF_DIR, "embeddings")
    fl = {
        (r.query_id, r.vec_id) for r in similarity.ivf_topk(emb).collect()
    }
    q8 = {
        (r.query_id, r.vec_id) for r in similarity.ivf_sq8_topk(emb).collect()
    }
    assert len(q8 & fl) / len(fl) >= 0.9
    idx = similarity.fit_ivf_pq_index(emb)
    pre = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_sq8_topk(emb, index=idx).collect()
    }
    assert pre == q8


def test_training_corpus_manifest_end_to_end(spark):
    """The composed nightly build: every doc in the manifest is a
    canonical, quality-kept, TRAIN-split family member, and each doc's
    spans tile [0, n_tok) exactly (the pack_chunks contract)."""
    from myodish_peak_analysis_spark.llm import curate, dedup, sampling

    docs = read_table(spark, SF_DIR, "documents")
    manifest = curate.training_corpus_manifest(docs).collect()
    assert manifest

    split = {
        r.doc_id: r.split
        for r in sampling.leakage_safe_split(docs).collect()
    }
    canon = {r.doc_id for r in dedup.canonical_corpus(docs).collect()}
    n_tok = {
        r.doc_id: r.n
        for r in docs.selectExpr(
            "doc_id", "size(split(text, ' ')) AS n"
        ).collect()
    }
    spans: dict = {}
    for r in manifest:
        assert r.doc_id in canon, "non-canonical doc packed"
        assert split[r.doc_id] == "train", "held-out family leaked into training"
        spans.setdefault(r.doc_id, []).append((r.begin_tok, r.end_tok))
    for d, ss in spans.items():
        ss.sort()
        assert ss[0][0] == 0 and ss[-1][1] == n_tok[d]
        assert all(a[1] == b[0] for a, b in zip(ss, ss[1:])), "span gap/overlap"


def _disjoint_head_corpus(spark, n_docs: int = 200):
    """Head bigrams (a0,b0)..(a3,b3) with per-doc UNIQUE separator
    tokens between them, so a merged token can never form a
    high-count pair with its neighbor — the case where batching is
    provably equivalent to classic BPE."""
    rows = []
    for i in range(n_docs):
        parts = [f"a0 b0 u{i}p"]
        if i % 2 == 0:
            parts.append(f"a1 b1 u{i}q")
        if i % 4 == 0:
            parts.append(f"a2 b2 u{i}r")
        if i % 8 == 0:
            parts.append(f"a3 b3 u{i}s")
        rows.append((i, " ".join(parts)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_batch_merges_match_classic_on_disjoint_heads(spark):
    """With pairwise-disjoint head pairs separated by unique noise
    tokens, batch selection must learn exactly the classic rule list
    — in 1 driver round instead of 4 — and produce the identical
    token frame. (On corpora where a merged token immediately forms a
    dominant new pair, classic and batch legitimately diverge — the
    documented batching semantics; see _select_noninterfering.)"""
    docs = _disjoint_head_corpus(spark)
    m1, f1 = bpe._bpe_run(docs, n_merges=4, batch_merges=1)
    m4, f4 = bpe._bpe_run(docs, n_merges=4, batch_merges=4)
    assert [(l, r) for l, r, _ in m4] == [(l, r) for l, r, _ in m1]
    assert [(l, r) for l, r, _ in m1] == [
        ("a0", "b0"), ("a1", "b1"), ("a2", "b2"), ("a3", "b3")
    ]
    a = sorted((r.doc_id, tuple(r.toks)) for r in f1.collect())
    b = sorted((r.doc_id, tuple(r.toks)) for r in f4.collect())
    assert a == b
    f1.unpersist()
    f4.unpersist()


def test_bpe_batch_defers_interfering_pairs(spark):
    """When the top-2 pairs share a token, the batch applies only the
    best and defers the other to the next recount — two interfering
    rules are never applied from one count snapshot."""
    # (b,c) has count 50 (> (a,b)=40) and shares token b with (a,b)
    rows = [(i, "a b c x" + str(i)) for i in range(40)] + [
        (100 + i, "b c y" + str(i)) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.left_tok, r.right_tok)
        for r in bpe.bpe_vocab(docs, n_merges=2, batch_merges=2).collect()
    ]
    assert got[0] == ("b", "c")
    # (a,b) must NOT have been applied from the same snapshot: after
    # the (b,c) merge there are no "a b" adjacencies left, so the
    # recount picks (a, b+c) — the deferred-and-recounted answer.
    assert got[1] == ("a", "b+c")


def _minimal_jpeg(w: int, h: int, progressive: bool = False) -> bytes:
    """Hand-assembled JFIF header stream: SOI, APP0, DQT stub, SOFn
    with the given dims, then SOS (no entropy data needed — dims
    precede it)."""
    import struct

    sof_marker = 0xC2 if progressive else 0xC0
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof = (
        bytes([0xFF, sof_marker])
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    sos = b"\xff\xda" + struct.pack(">H", 4) + b"\x00\x00"
    return b"\xff\xd8" + app0 + dqt + sof + sos


def test_jpeg_gif_header_dims(spark):
    """JPEG dims parse from the SOF marker (baseline AND progressive)
    with zero entropy decoding; GIF from the logical screen
    descriptor; both run through the real distributed decode path."""
    import struct

    from myodish_peak_analysis_spark.llm.multimodal import (
        MEDIA_SCHEMA,
        _parse_image_header,
        image_metadata,
    )

    assert _parse_image_header(_minimal_jpeg(640, 480)) == (640, 480)
    assert _parse_image_header(_minimal_jpeg(31, 7, progressive=True)) == (31, 7)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert _parse_image_header(gif) == (320, 200)
    # truncated JPEG (cut before the SOF) must return None, not garbage
    assert _parse_image_header(_minimal_jpeg(640, 480)[:8]) is None

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(_minimal_jpeg(800, 600)), "s"),
            (2, "image", bytearray(gif), "s"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in image_metadata(media, fake=False).collect()}
    assert (rows[1].width, rows[1].height) == (800, 600)
    assert (rows[2].width, rows[2].height) == (320, 200)


def test_webp_header_dims():
    """All three WebP variants: VP8X (24-bit canvas), VP8 lossy
    (start-code + 14-bit dims), VP8L lossless (packed bits)."""
    import struct

    from myodish_peak_analysis_spark.llm.multimodal import _parse_image_header

    def riff(fmt: bytes, chunk: bytes) -> bytes:
        body = b"WEBP" + fmt + struct.pack("<I", len(chunk)) + chunk
        return b"RIFF" + struct.pack("<I", len(body)) + body

    vp8x = bytes([0x02, 0, 0, 0]) + (639).to_bytes(3, "little") + (
        479
    ).to_bytes(3, "little")
    assert _parse_image_header(riff(b"VP8X", vp8x)) == (640, 480)

    vp8 = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    assert _parse_image_header(riff(b"VP8 ", vp8 + b"\x00" * 8)) == (320, 240)

    bits = (99 - 1) | ((77 - 1) << 14)
    vp8l = b"\x2f" + bits.to_bytes(4, "little")
    assert _parse_image_header(riff(b"VP8L", vp8l + b"\x00" * 8)) == (99, 77)

    # unknown variant falls through (None → Pillow/raise path)
    assert _parse_image_header(riff(b"ANMF", b"\x00" * 16)) is None


def test_flac_streaminfo_duration(spark):
    """FLAC duration from the mandatory STREAMINFO block — no frame
    decode; runs through the distributed audio path."""
    from myodish_peak_analysis_spark.llm.multimodal import (
        MEDIA_SCHEMA,
        _parse_flac_header,
        audio_metadata,
    )

    def flac(rate: int, total: int) -> bytes:
        packed = (rate << 44) | (1 << 41) | (15 << 36) | total
        info = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
        return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info

    dur, sr = _parse_flac_header(flac(44100, 44100 * 3))
    assert (dur, sr) == (3.0, 44100)
    assert _parse_flac_header(b"fLaC" + b"\x00" * 4) is None  # truncated
    assert _parse_flac_header(flac(0, 100)) is None  # invalid rate

    media = spark.createDataFrame(
        [(9, "audio", bytearray(flac(16000, 8000)), "s")], MEDIA_SCHEMA
    )
    row = audio_metadata(media, fake=False).collect()[0]
    assert (row.duration_s, row.sample_rate) == (0.5, 16000)


def test_incremental_neardup_corpus_index_parity(spark):
    """The prematerialized corpus band index must produce exactly the
    ad-hoc result — the daily-batch amortization contract."""
    from myodish_peak_analysis_spark.llm import dedup

    docs = read_table(spark, SF_DIR, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corp = docs.filter(F.col("doc_id") % 10 != 0)
    adhoc = sorted(
        (r.new_doc_id, r.corpus_doc_id, r.jaccard)
        for r in dedup.incremental_neardup(new, corp).collect()
    )
    idx = dedup.corpus_band_index(corp)
    indexed = sorted(
        (r.new_doc_id, r.corpus_doc_id, r.jaccard)
        for r in dedup.incremental_neardup(
            new, corp, corpus_index=idx
        ).collect()
    )
    assert indexed == adhoc and adhoc
    idx.unpersist()


def test_abf2_section_map_roundtrip_property():
    """Property: for random (n_samples, n_channels, rate) the ABF2
    writer/reader round-trip preserves shape and rate (float32 path;
    the int16 path's error bound is covered by its own test)."""
    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import read_abf2, write_abf2

    rng = np.random.default_rng(3)
    import tempfile

    for _ in range(10):
        n = int(rng.integers(4, 200))
        c = int(rng.integers(1, 9))
        rate = float(rng.integers(50, 50000))
        data = rng.normal(size=(n, c))
        with tempfile.NamedTemporaryFile(suffix=".abf2") as f:
            write_abf2(f.name, data, rate)
            frames, got = read_abf2(f.name)
        assert len(frames) == c and len(frames[0]) == n
        assert abs(got - rate) / rate < 1e-5
        np.testing.assert_allclose(
            frames[0]["signal_value"].to_numpy(), data[:, 0], atol=1e-6
        )


def test_webp_vp8l_dim_bit_packing_property():
    """Property: VP8L's packed 14+14-bit minus-one dims decode
    correctly for arbitrary dims in range."""
    import struct

    from myodish_peak_analysis_spark.llm.multimodal import _parse_image_header

    def riff(chunk: bytes) -> bytes:
        body = b"WEBP" + b"VP8L" + struct.pack("<I", len(chunk)) + chunk
        return b"RIFF" + struct.pack("<I", len(body)) + body

    for w, h in ((1, 1), (16383, 16383), (1920, 1080), (7, 16000)):
        bits = (w - 1) | ((h - 1) << 14)
        payload = riff(b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 8)
        assert _parse_image_header(payload) == (w, h)
