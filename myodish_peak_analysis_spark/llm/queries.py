"""Driver-facing LLM-pipeline queries over documents/embeddings.
Each entry in QUERIES has a matching DuckDB mirror in ``llm.oracle``
(except where noted); column names and rounding are matched exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import read_table
from . import curate, dedup, packing, sampling, similarity, text


def _long(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("long"))
    return df


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(read_table(spark, sf_dir, "documents"))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.with_text_stats(read_table(spark, sf_dir, "documents"))
    return _long(out, "n_words", "n_distinct_words")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.with_lang_id(read_table(spark, sf_dir, "documents"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.with_quality_score(read_table(spark, sf_dir, "documents"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.with_token_counts(read_table(spark, sf_dir, "documents"))
    return _long(out, "n_ws_tokens", "n_bpe_tokens")


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.with_gopher_quality(read_table(spark, sf_dir, "documents"))


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.with_pii_scrub(read_table(spark, sf_dir, "documents"))


def q_vocab_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.vocab_counts(read_table(spark, sf_dir, "documents"), top_n=100)
    return _long(out, "rank")


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.doc_fingerprints(read_table(spark, sf_dir, "documents"))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(read_table(spark, sf_dir, "documents"))


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_pairs(read_table(spark, sf_dir, "documents"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_signatures(read_table(spark, sf_dir, "documents"))


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(read_table(spark, sf_dir, "documents"))


def q_neardup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.neardup_verified(read_table(spark, sf_dir, "documents"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_clusters(read_table(spark, sf_dir, "documents"))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_neardup(read_table(spark, sf_dir, "embeddings"))


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = similarity.embedding_norms(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "dim")


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = similarity.cosine_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = similarity.lsh_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (deterministic k-means coarse quantizer + nprobe search).
    Oracle: the fixed-init, fixed-iteration Lloyd loop unrolls into
    chained SQL CTEs (``oracle.ivf_topk_sql``); tests additionally
    assert recall vs the brute-force top-k."""
    out = similarity.ivf_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sampling (hash-of-doc_id
    per-mille buckets — reproducible, engine-independent)."""
    return sampling.stratified_sample(read_table(spark, sf_dir, "documents"))


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source resampling weights toward a uniform mixture."""
    return sampling.mixture_weights(read_table(spark, sf_dir, "documents"))


def q_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 longest documents per source via the skew-safe two-phase
    salted top-k (final ranks identical to a single global window)."""
    from ..operators.analytics import topk_per_group

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return topk_per_group(docs, "source", "n_chars", "doc_id", k=5)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per doc by the integer-exact tf-idf
    surrogate (rank-equivalent to tf·N/df, no float idf)."""
    out = text.tfidf_top_terms(read_table(spark, sf_dir, "documents"))
    return _long(out, "tf", "df_docs")


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df-pruned shingle tf-idf cosine pairs (lexical similarity
    search without embeddings): BIGINT weights, exact integer
    dot/norms, one rounded double division at the end."""
    out = text.tfidf_cosine_pairs(read_table(spark, sf_dir, "documents"))
    return _long(out, "shared_terms")


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-overlap decontamination report (8-gram exact overlap)."""
    # gram=4 on the short synthetic docs (~50 tokens) — real pipelines
    # use 8-13; the overlap-join shape is identical.
    out = text.contamination_pairs(read_table(spark, sf_dir, "documents"), gram=4)
    return _long(out, "n_shared", "bench_grams")


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked end-to-end: build a media
    table from documents (payload = UTF-8 text bytes), run the
    Arrow-batched ``mapInPandas`` image-metadata decode with the
    deterministic md5-derived fake codec, and emit typed metadata. The
    fake is reproducible in pure SQL (md5 hex slicing), so the oracle
    verifies the WHOLE distributed path — schema, batching, UDF
    signature — produces engine-identical rows. Swapping the fake for
    Pillow touches only the ``_decode_image_impl`` hook."""
    from . import multimodal

    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        "source",
    )
    out = multimodal.image_metadata(media, fake=True)
    return _long(out, "width", "height")


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence-packing manifest (llm/packing.py)."""
    return packing.pack_chunks(read_table(spark, sf_dir, "documents"))


def q_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packed-chunk counts and padding waste."""
    return packing.packing_stats(read_table(spark, sf_dir, "documents"))


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional-LM quality score per document."""
    return text.with_bigram_logprob(read_table(spark, sf_dir, "documents"))


def q_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partitioning by unigram-LM score."""
    return text.lm_quality_buckets(read_table(spark, sf_dir, "documents"))


def q_term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation pairs with integer-exact PMI-surrogate lift.
    max_df_ratio=0.85 because the synthetic corpus drafts from a ~31-word
    vocabulary with ~78% df — the realistic 0.5 default would empty it."""
    return text.term_cooccurrence(
        read_table(spark, sf_dir, "documents"), max_df_ratio=0.85
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → (df, sorted posting list) retrieval index."""
    return text.inverted_index(read_table(spark, sf_dir, "documents"))


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast anti-join against a content-hash blocklist (derived
    deterministically here: hashes of the lowest-quality decile docs)."""
    docs = read_table(spark, sf_dir, "documents")
    bad = (
        text.with_quality_score(docs)
        .filter(F.col("quality_score") < 0.45)
        .join(docs, "doc_id")
        .select(F.md5("text").alias("text_hash"))
        .distinct()
    )
    out = dedup.blocklist_filter(docs, bad)
    return out.select("doc_id", "lang", "source", "n_chars")


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM quality proxy (CCNet-style head/middle/tail
    scoring signal)."""
    return text.with_unigram_logprob(read_table(spark, sf_dir, "documents"))


def q_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup + quality + Gopher gates composed into one plan (llm/curate.py)."""
    return curate.curated_corpus(read_table(spark, sf_dir, "documents"))


def q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al.-style substring
    dedup signal): corpus-repeated 8-gram positions merged into maximal
    per-document spans."""
    return text.duplicated_spans(read_table(spark, sf_dir, "documents"))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-scoped embedding near-dup pairs (k-means
    quantizer shared with the IVF index; oracle = unrolled-Lloyd CTEs)."""
    return similarity.semantic_dedup(read_table(spark, sf_dir, "embeddings"))


def q_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch corpus profile (HLL++ cardinalities, GK quantile
    sketch) — the 100 TB substitute for exact distinct/percentile
    aggregates. Registered in its SELF-VERIFYING form since round 6:
    the query emits the exact-side values plus deterministic
    within-tolerance booleans, so the driver hash-checks both the exact
    columns and the sketch-accuracy contract (previously the one
    rows-only-by-design entry). Production uses the raw
    ``sketch_profile``; tolerance is additionally pinned in
    tests/test_llm.py."""
    from . import sketches

    return sketches.sketch_profile_checked(read_table(spark, sf_dir, "documents"))


def q_per_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of the sketch profile (oracle-checked): per-source
    count, exact distinct text hashes, rank-exact median of n_chars."""
    from . import sketches

    return sketches.per_source_profile(read_table(spark, sf_dir, "documents"))


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded corpus shuffle (shard + in-shard position)
    for reproducible training epochs; md5 permutation keys so the order
    is engine-portable and oracle-checked."""
    from . import sampling

    return sampling.training_order(read_table(spark, sf_dir, "documents"))


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_counts": q_token_counts,
    "vocab_top100": q_vocab_top100,
    "gopher_quality": q_gopher_quality,
    "pii_scrub": q_pii_scrub,
    "doc_fingerprints": q_doc_fingerprints,
    "minhash_signatures": q_minhash_signatures,
    "minhash_pairs": q_minhash_pairs,
    "simhash": q_simhash,
    "jaccard_pairs": q_jaccard_pairs,
    "neardup_verified": q_neardup_verified,
    "dedup_clusters": q_dedup_clusters,
    "embedding_neardup": q_embedding_neardup,
    "embedding_norms": q_embedding_norms,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "stratified_sample": q_stratified_sample,
    "mixture_weights": q_mixture_weights,
    "topk_per_source": q_topk_per_source,
    "tfidf_top_terms": q_tfidf_top_terms,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "contamination": q_contamination,
    "media_metadata": q_media_metadata,
    "inverted_index": q_inverted_index,
    "term_cooccurrence": q_term_cooccurrence,
    "lm_quality_buckets": q_lm_quality_buckets,
    "bigram_logprob": q_bigram_logprob,
    "blocklist_filter": q_blocklist_filter,
    "unigram_logprob": q_unigram_logprob,
    "pack_chunks": q_pack_chunks,
    "packing_stats": q_packing_stats,
    "curated_corpus": q_curated_corpus,
    "duplicated_spans": q_duplicated_spans,
    "semantic_dedup": q_semantic_dedup,
    "sketch_profile": q_sketch_profile,
    "per_source_profile": q_per_source_profile,
    "training_order": q_training_order,
}


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher top-n-gram repetition metrics (explode → two keyed
    map-side-combinable aggregates; no window, no per-doc sort)."""
    return text.repetition_profile(read_table(spark, sf_dir, "documents"))


QUERIES["repetition_profile"] = q_repetition_profile


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code words over embeddings (deterministic
    per-subspace k-means; broadcast codebook, map-side assignment)."""
    return similarity.pq_codes(read_table(spark, sf_dir, "embeddings"))


QUERIES["pq_codes"] = q_pq_codes


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (candidates touched only through
    their integer code words; per-query m*k distance table)."""
    out = similarity.pq_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


QUERIES["pq_topk"] = q_pq_topk


def q_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC shortlist -> exact cosine re-rank (the IVF+PQ production
    pattern; exact math touches Q*shortlist pairs only)."""
    out = similarity.pq_rerank_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


QUERIES["pq_rerank_topk"] = q_pq_rerank_topk


def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF×PQ search: nprobe posting lists -> ADC shortlist
    over integer codes -> exact cosine re-rank (the FAISS IVFx,PQy
    production pattern as one operator)."""
    out = similarity.ivf_pq_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


QUERIES["ivf_pq_topk"] = q_ivf_pq_topk


def q_ivf_pq_topk_prefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production reuse shape of the composed search: fit the
    IVF×PQ index once (:func:`similarity.fit_ivf_pq_index`), then
    search with ``index=`` — identical results to the fit-inline
    ``ivf_pq_topk`` (same oracle SQL), exercising the amortized path
    the second and every later query batch takes."""
    emb = read_table(spark, sf_dir, "embeddings")
    idx = similarity.fit_ivf_pq_index(emb)
    out = similarity.ivf_pq_topk(emb, index=idx)
    return _long(out, "rank")


QUERIES["ivf_pq_topk_prefit"] = q_ivf_pq_topk_prefit


def q_levenshtein_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level (edit-distance) verification of the MinHash-LSH
    candidates — the near-dup check Jaccard is blind to; per-pair DP
    only on band-bucket candidates, never all-pairs."""
    return dedup.levenshtein_neardup(read_table(spark, sf_dir, "documents"))


QUERIES["levenshtein_neardup"] = q_levenshtein_neardup


def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunking with overlap: one chunk per stride
    plus a covering tail, zero-shuffle sequence+slice+explode."""
    return packing.chunk_overlap(read_table(spark, sf_dir, "documents"))


QUERIES["chunk_overlap"] = q_chunk_overlap


def q_sq8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization codes (FAISS SQ8 pattern): one per-dim
    max agg -> broadcast scale vector -> zero-shuffle code pass."""
    return similarity.sq8_codes(read_table(spark, sf_dir, "embeddings"))


QUERIES["sq8_codes"] = q_sq8_codes


def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric SQ8 search: float queries vs reconstructed int8
    candidates — int8-compressed brute twin of ann_cosine_topk."""
    out = similarity.sq8_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


QUERIES["sq8_topk"] = q_sq8_topk


def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span-CUT step (Lee et al.): corpus re-emitted with every
    token covered by a corpus-duplicated 8-gram removed; map-only
    nested-HOF cut after a sparse starts gather."""
    return text.remove_dup_spans(read_table(spark, sf_dir, "documents"))


QUERIES["remove_dup_spans"] = q_remove_dup_spans


def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus dedup profile: doc/distinct counts, exact-dup
    surplus, near-dup family stats from the connected components."""
    return dedup.dedup_report(read_table(spark, sf_dir, "documents"))


QUERIES["dedup_report"] = q_dedup_report


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source OOV rate against the corpus top-100 vocabulary —
    the tokenizer-fit-by-domain report."""
    return text.vocab_coverage(read_table(spark, sf_dir, "documents"))


QUERIES["vocab_coverage"] = q_vocab_coverage


def q_training_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END nightly build in one lazy plan: canonical near-dup
    corpus -> per-source quality prune -> leakage-safe train selection
    -> packed-sequence span manifest; hash-checked against the chained
    oracle of its four individually-verified stages."""
    return curate.training_corpus_manifest(read_table(spark, sf_dir, "documents"))


QUERIES["training_corpus_manifest"] = q_training_corpus_manifest


def q_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF×SQ8 search (the FAISS IVFx,SQ8 pattern): nprobe
    posting lists scored against int8-reconstructed candidates — the
    fit-free compressed search."""
    out = similarity.ivf_sq8_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


QUERIES["ivf_sq8_topk"] = q_ivf_sq8_topk


def q_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percentile curation: keep each source's top 70% by
    the composite quality score (rank window per source, deterministic
    tie-break) — the RefinedWeb/FineWeb-style keep-the-best-X% step."""
    return text.quality_prune(read_table(spark, sf_dir, "documents"))


QUERIES["quality_prune"] = q_quality_prune


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-keyed train/val/test assignment: near-dup families never
    straddle a split boundary (the Lee-et-al. contamination guard)."""
    return sampling.leakage_safe_split(read_table(spark, sf_dir, "documents"))


QUERIES["leakage_safe_split"] = q_leakage_safe_split


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment (|A∩B|/|A|, /|B|) over LSH candidates —
    catches subset/quote-inclusion near-dups Jaccard scores near 0."""
    return dedup.containment_pairs(read_table(spark, sf_dir, "documents"))


QUERIES["containment_pairs"] = q_containment_pairs


def q_encode_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding: top-V token ids per document (distributed
    TakeOrdered vocab, broadcast encode join, bounded per-doc fold)."""
    return text.encode_token_ids(read_table(spark, sf_dir, "documents"))


QUERIES["encode_token_ids"] = q_encode_token_ids


def q_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of tokens covered by corpus-duplicated 8-gram
    windows (Gopher dup-chars rule cross-document): sparse dup-position
    window + interval-union coverage, no span materialization."""
    return text.dup_span_fraction(read_table(spark, sf_dir, "documents"))


QUERIES["dup_span_fraction"] = q_dup_span_fraction


def q_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Achlioptas sparse random projection to 8 dims (map-only HOF,
    closed-form ±1/0 coefficients, exact integer-micro arithmetic)."""
    return similarity.rp_project(read_table(spark, sf_dir, "embeddings"))


QUERIES["rp_project"] = q_rp_project


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE pair-merge trainer: 4 rounds of corpus-wide top-pair
    selection (map-combinable pair counts + distributed TakeOrdered,
    one driver action per round — the Lloyd pattern).

    ``batch_merges=1`` is pinned EXPLICITLY (round 13): the trainer's
    default flipped to the measured batched posture, but the DuckDB
    oracle mirrors classic per-round recount semantics, and batching
    can legitimately pick a different rule set where consecutive top
    pairs interfere (observed at sf0.001: classic's round-4 pick
    ('order','order') shares a token with round-1's ('order','fast'),
    so the batch defers it) — this entry is the classic-semantics
    pin."""
    from . import bpe

    return bpe.bpe_vocab(
        read_table(spark, sf_dir, "documents"), batch_merges=1
    )


QUERIES["bpe_vocab"] = q_bpe_vocab


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus re-tokenized under the learned BPE merges (per-row LTR
    fold inside codegen — no UDF, no shuffle in the apply).
    ``batch_merges=1`` pinned for the same oracle-semantics reason as
    ``bpe_vocab``."""
    from . import bpe

    return bpe.bpe_encode(
        read_table(spark, sf_dir, "documents"), batch_merges=1
    )


QUERIES["bpe_encode"] = q_bpe_encode


def q_blocklist_filter_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated blocklist filter: broadcast bucket-set gate, exact
    anti-join over bucket-positives only. EXACT output -> shares
    blocklist_filter's oracle."""
    docs = read_table(spark, sf_dir, "documents")
    bad = (
        text.with_quality_score(docs)
        .filter(F.col("quality_score") < 0.45)
        .join(docs, "doc_id")
        .select(F.md5("text").alias("text_hash"))
        .distinct()
    )
    out = dedup.blocklist_filter_bloom(docs, bad)
    return out.select("doc_id", "lang", "source", "n_chars")


QUERIES["blocklist_filter_bloom"] = q_blocklist_filter_bloom


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE serving path: fixed pre-trained merge rules inlined as one
    chained codegen fold - map-only, no fit, no shuffle."""
    from . import bpe

    return bpe.bpe_apply(read_table(spark, sf_dir, "documents"), bpe.APPLY_MERGES)


QUERIES["bpe_apply"] = q_bpe_apply


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric batch-vs-corpus near-dup gate (new = doc_id%10==0,
    corpus = the rest): banded LSH bucket join new x corpus only, exact
    Jaccard verify on candidates."""
    docs = read_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return dedup.incremental_neardup(new_docs, corpus)


QUERIES["incremental_neardup"] = q_incremental_neardup


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon entropy of the token distribution (two
    doc-keyed map-combinable aggregates; quantized log2 sums)."""
    return text.token_entropy(read_table(spark, sf_dir, "documents"))


QUERIES["token_entropy"] = q_token_entropy


def q_rp_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed RP x IVF search: coarse quantizer entirely in the
    8-dim random projection (fit + probe 8x cheaper), exact cosine
    re-rank over the probed posting lists in the original space."""
    out = similarity.rp_ivf_topk(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


QUERIES["rp_ivf_topk"] = q_rp_ivf_topk


def q_hybrid_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical LSH near-dup pairs enriched with embedding cosine
    (documents x embeddings on doc_id = vec_id) - separates true
    near-dups from template collisions."""
    return dedup.hybrid_neardup(
        read_table(spark, sf_dir, "documents"),
        read_table(spark, sf_dir, "embeddings"),
    )


QUERIES["hybrid_neardup"] = q_hybrid_neardup


def q_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware final corpus: longest doc per cluster (ties ->
    lowest doc_id), singletons kept."""
    return dedup.canonical_corpus(read_table(spark, sf_dir, "documents"))


QUERIES["canonical_corpus"] = q_canonical_corpus


def q_prototype_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label prototype outliers (mislabeled-candidate screen):
    closed-form label centroids, k least-similar members each."""
    out = similarity.prototype_outliers(read_table(spark, sf_dir, "embeddings"))
    return _long(out, "rank")


QUERIES["prototype_outliers"] = q_prototype_outliers


def q_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root temperature sampling mixture over sources (exact
    integer-ppb normalization - no cross-engine float-sum order)."""
    return sampling.temperature_weights(read_table(spark, sf_dir, "documents"))


QUERIES["temperature_weights"] = q_temperature_weights


def q_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of ``media_metadata``: the Arrow-batched
    ``audio_metadata`` decode (deterministic length-derived fake codec,
    reproduced exactly in SQL) over a payload column built from
    document text — verifies the audio path's distinct schema/UDF
    end-to-end. Swapping the fake for the real stdlib WAV/FLAC/OGG/MP3
    parsers touches only the ``_decode_audio_impl`` hook."""
    from . import multimodal

    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        "source",
    )
    out = multimodal.audio_metadata(media, fake=True)
    return _long(out, "sample_rate")


def q_video_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video twin of ``media_metadata``: the ``video_metadata`` decode
    (md5-derived fake duration/track-count, reproduced in SQL) —
    verifies the video path end-to-end; the real MP4/MOV ``mvhd``
    parser is pinned by ``test_r7_ops.py``."""
    from . import multimodal

    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        "source",
    )
    out = multimodal.video_metadata(media, fake=True)
    return _long(out, "n_tracks")


QUERIES["audio_metadata"] = q_audio_metadata
QUERIES["video_metadata"] = q_video_metadata


def q_ann_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-query serving against the prefit IVF×PQ index
    (:func:`similarity.ivf_pq_search`): the same query batch the
    corpus-query routes use, but submitted as an INDEPENDENT
    (query_id, embedding) frame — exercising the production request
    path (probe → posting lists → broadcast ADC → exact re-rank, no
    self-match exclusion)."""
    emb = read_table(spark, sf_dir, "embeddings")
    idx = similarity.fit_ivf_pq_index(emb)
    qs = emb.filter(
        F.col("vec_id") % similarity.ANN_QUERY_MOD == 0
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_pq_search(qs, idx)
    return _long(out, "rank")


QUERIES["ann_serve"] = q_ann_serve


def q_ivf_list_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list size distribution of the IVF coarse quantizer —
    the statistic :func:`similarity.index_health` reads for the refit
    decision (round 11): one ``groupBy(centroid_id).count()`` over the
    quantizer assignments (k output rows, map-side-combined). The
    DuckDB oracle runs the identical unrolled deterministic k-means
    and aggregation, so the health numbers an ops loop watches are
    hash-checked end-to-end, not just unit-tested."""
    emb = read_table(spark, sf_dir, "embeddings")
    out = (
        similarity.ivf_index(emb)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("list_size"))
    )
    return _long(out, "list_size")


QUERIES["ivf_list_sizes"] = q_ivf_list_sizes


def q_tfidf_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates-tier tf-idf verification (VERDICT r8 ask #5): score
    MinHash-LSH candidate pairs with the full-corpus tf-idf cosine —
    the documented production composition for ``tfidf_cosine_pairs``
    ("run the verifier tier on MinHash candidates"). Equals the full
    op restricted to the candidate set (pinned by test); the chained
    DuckDB oracle runs the same two stages in one statement."""
    docs = read_table(spark, sf_dir, "documents")
    out = text.tfidf_verify(docs, dedup.minhash_pairs(docs))
    return _long(out, "shared_terms")


QUERIES["tfidf_verify"] = q_tfidf_verify


def q_dup_spans_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped span-cut (VERDICT r8 ask #5): rewrite only a doc subset
    (deterministic doc_id % 4 slice here; production passes dedup
    clusters / flagged docs) with corpus-global duplicated-gram stats
    — equals the full remove_dup_spans filtered to the scope."""
    docs = read_table(spark, sf_dir, "documents")
    scope = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    return text.remove_dup_spans_scoped(docs, scope)


QUERIES["dup_spans_scoped"] = q_dup_spans_scoped


def q_dup_spans_scoped_prefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The amortized span-cut (round 10): fit the corpus-global
    duplicated-gram statistic once (:func:`text.fit_dup_gram_stats` —
    the pass the 5M-doc decade measured at ~95% of a scoped rewrite's
    cost), then rewrite the scope against the prefit stats — identical
    results to ``dup_spans_scoped`` (same oracle SQL), exercising the
    per-scope path the second and every later scope batch takes."""
    docs = read_table(spark, sf_dir, "documents")
    stats = text.fit_dup_gram_stats(docs)
    scope = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    return text.remove_dup_spans_scoped(docs, scope, dup_grams=stats)


QUERIES["dup_spans_scoped_prefit"] = q_dup_spans_scoped_prefit


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weights (Xie et al. 2023) of every document
    toward the 'src0' target slice: hashed unigram+bigram bag-of-words
    models on target vs pool, micro-quantized log-ratio scoring. One
    explode + two doc-keyed map-combinable aggregates + a
    <=DSIR_BUCKETS-row broadcast model — no global state, the paper's
    CommonCrawl shape."""
    return sampling.dsir_logweights(read_table(spark, sf_dir, "documents"))


QUERIES["dsir_weights"] = q_dsir_weights


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Gumbel top-k DSIR resample (k=100): the weight
    plan plus a map-side md5-derived Gumbel key; top-k compiles to
    TakeOrderedAndProject (no global sort materializes)."""
    return sampling.dsir_resample(read_table(spark, sf_dir, "documents"))


QUERIES["dsir_sample"] = q_dsir_sample


def q_dsir_weights_prefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The amortized DSIR path: fit the <=DSIR_BUCKETS-row log-ratio model once
    (:func:`sampling.fit_dsir_logratio` — persist/write it in
    production), then score against the prefit model — identical
    results to ``dsir_weights`` (same oracle SQL); the serve side is
    ONE explode pass + a broadcast join, the daily-batch 100 TB shape."""
    docs = read_table(spark, sf_dir, "documents")
    model = sampling.fit_dsir_logratio(docs)
    return sampling.dsir_logweights(docs, logratio=model)


QUERIES["dsir_weights_prefit"] = q_dsir_weights_prefit


def q_dsir_curated_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR composed into the curation pipeline: fit the hashed-ngram
    model on the CURATED pool (dedup + quality + Gopher survivors) and
    Gumbel-top-k sample from it — quality gates first, then
    target-relevance selection, the order production stacks run (the
    paper selects from the raw pool; gating first shrinks the fit and
    sample space to documents worth training on)."""
    docs = read_table(spark, sf_dir, "documents")
    kept = curate.curated_corpus(docs).select("doc_id")
    pool = docs.join(kept, "doc_id")
    return sampling.dsir_resample(pool)


QUERIES["dsir_curated_sample"] = q_dsir_curated_sample


def q_ann_serve_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving against an APPENDED index (round 10): fit on the corpus
    slice (vec_id % 10 != 3), :func:`similarity.ivf_pq_append` the
    held-out slice onto the frozen centroids/codebooks, then serve the
    standard external-query batch — the between-refits ingest path
    (FAISS ``add`` semantics; the ANN twin of incremental_neardup's
    daily-crawl posture). Appended vectors are findable immediately,
    pinned by test."""
    emb = read_table(spark, sf_dir, "embeddings")
    idx = similarity.fit_ivf_pq_index(emb.filter(F.col("vec_id") % 10 != 3))
    idx2 = similarity.ivf_pq_append(
        idx, emb.filter(F.col("vec_id") % 10 == 3)
    )
    qs = emb.filter(
        F.col("vec_id") % similarity.ANN_QUERY_MOD == 0
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_pq_search(qs, idx2)
    return _long(out, "rank")


QUERIES["ann_serve_appended"] = q_ann_serve_appended


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC encode→parse round trip (round 12): the documents table is
    written to 8 in-memory WARC blobs with pure JVM expressions
    (:func:`..sources.warc.encode_documents_warc` — Content-Length in
    octets, binary ``||`` assembly) and read back through the real
    ingestion path (:func:`..sources.warc.parse_warc` mapInPandas +
    :func:`..sources.warc.warc_documents`), so the Content-Length-driven
    parser that a Common Crawl ``binaryFile`` read would use is
    oracle-verified against ``SELECT ... FROM documents`` on every
    correctness round. Multibyte text exercises the octets-vs-chars
    distinction wherever the corpus carries it."""
    from ..sources.warc import (
        encode_documents_warc,
        parse_warc,
        warc_documents,
    )

    docs = read_table(spark, sf_dir, "documents")
    blobs = encode_documents_warc(docs, file_mod=8).select(
        F.concat(F.lit("mem://warc/part-"), F.col("file_key").cast("string"))
        .alias("path"),
        "content",
    )
    return warc_documents(parse_warc(blobs)).select(
        "doc_id", "text", "lang", "source"
    )


QUERIES["warc_roundtrip"] = q_warc_roundtrip


def q_warc_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-shaped WARC ingest round trip (round 13): the documents
    table is encoded as **response** records — full HTTP messages
    (status line + Content-Type + Content-Length headers) carrying an
    HTML body that wraps the escaped text in a template with title/
    script/style blocks, plus ``WARC-Target-URI`` provenance
    (:func:`..sources.warc.encode_documents_warc_http`) — then read
    back through the real crawl path: Content-Length-driven parse →
    JVM HTTP split (:func:`..sources.warc.split_http_responses`,
    lossless ISO-8859-1 byte↔char trick) → charset-honoring stdlib
    HTML→text extraction (:func:`..sources.warc.with_html_text`).
    Oracle: whitespace-normalized identity projection + the same URL
    concat — so tag stripping, skip-tag handling, entity decode, both
    Content-Length byte counts, and the Target-URI plumbing are all
    hash-checked every round."""
    from ..sources.warc import (
        crawl_documents,
        encode_documents_warc_http,
        parse_warc,
    )

    docs = read_table(spark, sf_dir, "documents")
    blobs = encode_documents_warc_http(docs, file_mod=8).select(
        F.concat(F.lit("mem://warc/part-"), F.col("file_key").cast("string"))
        .alias("path"),
        "content",
    )
    return crawl_documents(parse_warc(blobs))


QUERIES["warc_extract_text"] = q_warc_extract_text


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (round 13): the RFC 3986 §6 syntax rules +
    tracking-param strip over the deterministic messy-URL fabric
    (:func:`..llm.urls.synth_urls` — host/scheme case, default ports,
    trailing slashes, tracking/mixed queries, fragments). Map-only JVM
    codegen; the DuckDB oracle re-implements the same contract
    expression-for-expression."""
    from . import urls

    return urls.with_canonical_url(
        urls.synth_urls(read_table(spark, sf_dir, "documents"))
    )


QUERIES["url_canonicalize"] = q_url_canonicalize


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup: one hash-groupBy on the canonical URL —
    variants 0-2 of each doc_id%200 class collide by construction, so
    the collision groups exercise both the canonicalizer and the
    keeper rule."""
    from . import urls

    return urls.url_dedup(
        urls.synth_urls(read_table(spark, sf_dir, "documents"))
    )


QUERIES["url_dedup"] = q_url_dedup


def q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (the domain-keyed twin of quality_prune): at most
    N docs per canonical-URL host, best quality first. The URL fabric
    yields two hosts with very different populations, so the cap binds
    on one and not the other."""
    from . import urls

    docs = read_table(spark, sf_dir, "documents")
    return urls.domain_caps(
        urls.synth_urls(docs).join(docs.select("doc_id", "text"), "doc_id"),
        max_per_domain=100,
    )


QUERIES["domain_caps"] = q_domain_caps


def _next_snapshot(docs: DataFrame) -> DataFrame:
    """Tomorrow's crawl snapshot, deterministically, full columns:
    doc_id%10==0 removed, %10==1 modified (text + ' v2'), a re-keyed
    copy of %10==2 added — the same construction q_corpus_diff uses
    (and its oracle mirrors), widened to all document columns."""
    kept = docs.filter(F.col("doc_id") % 10 != 0)
    modified = kept.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 1, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") % 10 == 2).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000_000)
    )
    return modified.unionByName(added)


def q_incremental_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental nightly manifest (round 13, VERDICT r12 ask #3):
    prefit per-doc state (digests/bands/quality/verified edges) on the
    OLD snapshot, then :func:`..llm.curate.incremental_corpus_manifest`
    on the deterministic next snapshot — per-doc cost only for the
    ~28%% of docs the diff touches. The oracle is the FULL
    ``training_corpus_manifest`` rebuilt on the same next snapshot
    (the documents view shadowed by a snapshot CTE), so the hash check
    IS the incremental-equals-rebuild contract."""
    docs = read_table(spark, sf_dir, "documents")
    state = curate.manifest_prefit_state(docs)
    return curate.incremental_corpus_manifest(_next_snapshot(docs), state)


QUERIES["incremental_manifest"] = q_incremental_manifest


def q_crawl_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl→corpus composition (round 13): the documents table is
    encoded TWICE as WARC response records — the original set, plus a
    re-keyed mirror fetch of every page whose ``WARC-Target-URI``
    differs only by tracking parameters (the real-crawl duplicate-URL
    shape) — then run through the full
    :func:`..llm.crawl.crawl_curated_corpus` pipeline: parse → HTTP
    split → HTML extract → URL canonicalize (mirror URLs collapse) →
    URL dedup (originals win the keeper rule) → per-domain caps (one
    domain per source, cap 8 binds on every ~10-16-doc domain) →
    quality + Gopher gates. One hash check covers the whole chain."""
    from ..sources.warc import encode_documents_warc_http, parse_warc
    from . import crawl

    docs = read_table(spark, sf_dir, "documents")
    both = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(2_000_000_000))
    )
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".crawl.example/doc/"),
        (F.col("doc_id") % F.lit(2_000_000_000)).cast("string"),
        F.when(
            F.col("doc_id") >= 2_000_000_000,
            F.lit("?utm_source=mirror&gclid=x"),
        ).otherwise(F.lit("")),
    )
    blobs = encode_documents_warc_http(both, file_mod=8, url=url).select(
        F.concat(
            F.lit("mem://crawl/part-"), F.col("file_key").cast("string")
        ).alias("path"),
        "content",
    )
    return crawl.crawl_curated_corpus(parse_warc(blobs), max_per_domain=8)


QUERIES["crawl_corpus"] = q_crawl_corpus


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (round 12): simulate tomorrow's crawl snapshot
    deterministically from the documents table — doc_id%10==0 removed,
    %10==1 modified (text + ' v2'), a re-keyed copy of %10==2 added —
    and emit :func:`..llm.curate.corpus_diff`'s (doc_id, change) rows.
    The md5-projection join shape is the query under test; the oracle
    mirrors the same snapshot construction in DuckDB."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = docs.filter(F.col("doc_id") % 10 != 0)
    new = kept.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 1, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 10 == 2).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        )
    )
    return curate.corpus_diff(docs, new)


QUERIES["corpus_diff"] = q_corpus_diff


def q_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer losslessness pin (round 12): apply the fixed
    pre-trained merges, then :func:`..llm.bpe.bpe_decode` back —
    byte-identical to the input corpus (oracle: identity SELECT).
    Catches a merge fold that drops, duplicates, or reorders a token,
    which per-query token counts alone would miss. A corpus whose raw
    text already contains the ``'+'`` merge marker would make decode
    LOSSY rather than wrong-and-loud, so such rows are refused with
    raise_error up front (self-review round 12) — the query fails
    visibly instead of silently mangling text into a hash mismatch."""
    from . import bpe

    # NULL text is refused EXPLICITLY before the marker check: IF(NULL,
    # ...) takes the else arm, so without the outer guard a NULL-text
    # doc would hit the raise_error branch with the misleading "contains
    # the + merge marker" diagnosis (ADVICE r12) — fail with the actual
    # cause instead.
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.expr(
            "IF(text IS NULL, raise_error(concat('bpe_roundtrip: NULL "
            "text for doc_id ', CAST(doc_id AS STRING))), "
            "IF(text NOT LIKE '%+%', text, raise_error(concat("
            "'bpe_roundtrip: text for doc_id ', CAST(doc_id AS STRING), "
            "' contains the + merge marker; decode would be lossy'))))"
        ),
    )
    return bpe.bpe_decode(
        bpe.bpe_apply(docs, bpe.APPLY_MERGES)
    ).select("doc_id", "text")


QUERIES["bpe_roundtrip"] = q_bpe_roundtrip
