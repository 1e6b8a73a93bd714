"""Text-analysis operators over the ``documents`` table: per-document
stats, language ID, quality scoring, token counting, and winnowing
fingerprints.

All of these are pure ``pyspark.sql.functions`` expressions — no UDFs,
no Python in the hot path — so they scale as embarrassingly parallel
projections (plus one per-document window for the fingerprint rolling
min). At 100 TB: documents are independent rows; the only shuffle is the
fingerprint DISTINCT, which is bounded by fingerprints-per-doc (a few
dozen), not text size.

The reference library has no text operators; these are the
LLM-training-data extensions required by the build brief, expressed
Spark-first with DuckDB oracle mirrors in :mod:`.oracle`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .params import (
    FINGERPRINT_GRAM,
    FINGERPRINT_WINDOW,
    LANG_MARKERS,
    STOPWORDS,
    TOKEN_REGEX,
    sql_in_list,
)

_TOKENS = "split(text, ' ')"


def _hits_expr(words) -> str:
    return f"size(filter({_TOKENS}, x -> x IN {sql_in_list(words)}))"


def with_text_stats(docs: DataFrame) -> DataFrame:
    """n_words / distinct words / avg word length / stopword + punct
    ratios per document."""
    n_words = F.expr(f"size({_TOKENS})")
    no_space = F.length(F.regexp_replace("text", " ", ""))
    punct = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.expr(f"size(array_distinct({_TOKENS}))").alias("n_distinct_words"),
        F.round(no_space.cast("double") / n_words, 6).alias("avg_word_len"),
        F.round(
            F.expr(_hits_expr(STOPWORDS)).cast("double") / n_words, 6
        ).alias("stopword_ratio"),
        F.round(punct.cast("double") / F.length("text"), 6).alias("punct_ratio"),
    )


def lang_pred_case_sql(dialect: str = "spark") -> str:
    """Shared CASE expression choosing the language with the most marker
    hits (ties break toward 'en' → es → de → fr). Identical text works in
    both engines once the token-split function name is swapped."""
    toks = _TOKENS if dialect == "spark" else "string_split(text, ' ')"
    fil = "filter" if dialect == "spark" else "list_filter"
    size = "size" if dialect == "spark" else "len"

    def hits(words):
        return f"{size}({fil}({toks}, x -> x IN {sql_in_list(words)}))"

    h = {k: hits(v) for k, v in LANG_MARKERS.items()}
    return (
        f"CASE WHEN {h['es']} > {h['en']} AND {h['es']} >= {h['de']} "
        f"AND {h['es']} >= {h['fr']} THEN 'es' "
        f"WHEN {h['de']} > {h['en']} AND {h['de']} >= {h['fr']} THEN 'de' "
        f"WHEN {h['fr']} > {h['en']} THEN 'fr' ELSE 'en' END"
    )


def with_lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID (n-gram-free heuristic: marker-word
    hit counts per language, argmax with deterministic tie-break)."""
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.expr(lang_pred_case_sql("spark")).alias("pred_lang"),
    )


def with_quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality score in [0,1]: length saturation (0.4) + low
    punctuation (0.3) + stopword presence (0.3, natural-language-ness).

    Computed in exact integer 1e-7 units (the ratio inputs are 6-dp
    decimals, so 10x-scaled weights 4/3/3 keep every term integral) and
    divided once at the end — the oracle sums the same integers, so the
    cross-engine result is bit-identical with no round-half boundary
    cases."""
    stats = with_text_stats(docs)
    one_m = F.lit(1000000).cast("long")
    punct_u = F.round(F.col("punct_ratio") * 1e6, 0).cast("long")
    stop_u = F.round(F.col("stopword_ratio") * 1e6, 0).cast("long")
    q_e7 = (
        F.lit(4) * F.least(one_m, F.col("n_words").cast("long") * 10000)
        + F.lit(3) * (one_m - punct_u)
        + F.lit(3) * F.least(one_m, F.lit(5) * stop_u)
    )
    return stats.select(
        "doc_id", (q_e7.cast("double") / F.lit(1e7)).alias("quality_score")
    )


def with_token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs / digit runs
    / single punctuation) per document."""
    return docs.select(
        "doc_id",
        F.expr(f"size({_TOKENS})").alias("n_ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{TOKEN_REGEX}', 0))").alias(
            "n_bpe_tokens"
        ),
    )


def with_gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public):
    word-count range, mean word length range, symbol ratio cap, and
    duplicate-2-gram repetition cap — each emitted as a boolean plus the
    combined ``keep`` verdict. Pure expressions, trivially parallel."""
    n_words = F.expr(f"size({_TOKENS})").cast("long")
    no_space = F.length(F.regexp_replace("text", " ", ""))
    mean_wl = no_space.cast("double") / n_words
    punct = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    symbol_ratio = punct.cast("double") / F.length("text")
    # duplicate 2-gram fraction: 1 - distinct/total
    grams2 = (
        f"transform(sequence(1, greatest(size({_TOKENS}) - 1, 1)), "
        f"i -> concat_ws(' ', slice({_TOKENS}, i, 2)))"
    )
    rep = (
        F.lit(1.0)
        - F.expr(f"size(array_distinct({grams2}))").cast("double")
        / F.expr(f"size({grams2})")
    )
    ok_words = (n_words >= 5) & (n_words <= 10000)
    ok_wl = (mean_wl >= 2.0) & (mean_wl <= 12.0)
    ok_sym = symbol_ratio <= 0.2
    ok_rep = rep <= 0.5
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(rep, 6).alias("dup_2gram_ratio"),
        ok_words.alias("ok_word_count"),
        ok_wl.alias("ok_word_len"),
        ok_sym.alias("ok_symbols"),
        ok_rep.alias("ok_repetition"),
        (ok_words & ok_wl & ok_sym & ok_rep).alias("keep"),
    )


#: Portable redaction patterns (identical semantics in Java regex and
#: RE2): emails and long digit runs.
PII_PATTERNS = (
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+", "<EMAIL>"),
    ("number", "[0-9]{6,}", "<NUM>"),
)


def with_pii_scrub(docs: DataFrame) -> DataFrame:
    """Redact emails and long digit runs; report true per-doc redaction
    counts per pattern (the scrub stage of a training-data pipeline)."""
    scrubbed = F.col("text")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.expr(f"size(regexp_extract_all(text, '{pat}', 0))")
            .cast("long")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select("doc_id", scrubbed.alias("scrubbed_text"), *counts)


def vocab_counts(docs: DataFrame, top_n: int | None = None) -> DataFrame:
    """Corpus vocabulary: global token counts + document frequency —
    the wordcount backbone of tokenizer/vocab construction. Explode +
    two-level aggregate; both aggregations are map-side combinable, so
    the shuffle carries only (token, partial-count) pairs. ``top_n``
    adds a deterministic (count DESC, token ASC) rank cutoff."""
    toks = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS)).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_count"),
        F.countDistinct("doc_id").alias("doc_frequency"),
    )
    if top_n is None:
        return counts
    from pyspark.sql.window import Window

    # orderBy().limit() plans as TakeOrderedAndProject (per-partition
    # top-N heaps + one N-row merge on the driver side of the exchange)
    # — no single-partition sort of the whole vocabulary. The rank
    # window then runs on the already-limited N-row frame.
    top = counts.orderBy(F.col("term_count").desc(), F.col("token")).limit(top_n)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("term_count").desc(), F.col("token"))
        ),
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing fingerprints: k-token-gram rolling hashes, minimum per
    sliding window, distinct (doc_id, fingerprint).

    The rolling hash is the first 15 hex digits of md5 (60 bits) — chosen
    because both Spark (``conv``) and DuckDB (``'0x…'::BIGINT``) convert
    it identically. Value-based window minima make winnowing tie-stable
    across engines. Documents shorter than the gram are excluded (same
    WHERE in the oracle).
    """
    g, w = FINGERPRINT_GRAM, FINGERPRINT_WINDOW
    grams = docs.filter(F.expr(f"size({_TOKENS}) >= {g}")).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size({_TOKENS}) - {g - 1}), "
                f"i -> concat_ws(' ', slice({_TOKENS}, i, {g})))"
            )
        ).alias("pos", "gram"),
    )
    hashed = grams.select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    from pyspark.sql.window import Window

    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    return (
        hashed.withColumn("fingerprint", F.min("h").over(win))
        .select("doc_id", "fingerprint")
        .distinct()
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k most distinctive terms per document by an integer-exact
    tf-idf surrogate: ``score = tf * n_docs * 1_000_000 DIV df`` — rank-
    equivalent to tf * (N/df) but computed entirely in 64-bit integer
    arithmetic, so the score (and therefore the ranking) is bit-identical
    in any engine; no log/float idf to drift cross-engine.

    Scale: term frequencies and document frequencies are two map-side-
    combined aggregates; the tf⋈df join shuffles on ``term`` (vocab-
    sized, Zipf-skewed — AQE skew-join splits the head terms) and the
    corpus total is a 1-row broadcast. The final top-k is a per-doc
    window over k' = n_distinct_terms(doc) rows — bounded by document
    length, never by corpus size.
    """
    from pyspark.sql import Window

    terms = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS)).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    totals = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(totals))
        .withColumn("score", F.expr("tf * _n_docs * 1000000 DIV df_docs"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df_docs", "score", "rank")
    )


#: Cap on the idf NUMERATOR (not the quotient): weights are
#: ``tf * (LEAST(N, cap) DIV df)``. Cosine is invariant to scaling every
#: weight by the same N, so capping N is metric-preserving up to integer
#: quantization (relative error <= df/cap <= max_df/1e8 = 1e-6 at the
#: default max_df, below the 6-decimal output rounding), while bounding
#: ``w <= tf * 1e8`` so the DECIMAL accumulators below provably cannot
#: overflow at any corpus size. A no-op whenever N < 1e8.
TFIDF_N_CAP = 100_000_000

#: Largest weight the DECIMAL(18,0) accumulator operands can take
#: exactly. Under Spark's default non-ANSI mode a larger w would CAST
#: to NULL and silently VANISH from the F.sum accumulators (NULLs are
#: skipped) — wrong cosines, not an error — so the weight expression
#: guards it as code (ADVICE r8): w > this bound raises loudly.
_TFIDF_W_BOUND = 10**18 - 1


def _tfidf_rare_weights(
    docs: DataFrame, gram: int, max_df: int, n_docs: int | None
) -> DataFrame:
    """(doc_id, term, w): the df-pruned integer tf-idf posting list
    shared by :func:`tfidf_cosine_pairs` and :func:`tfidf_verify` —
    ``w = tf * (LEAST(N, TFIDF_N_CAP) DIV df)`` as a guarded BIGINT.

    Cached: referenced three times by each consumer (norms + both
    join sides), and the executed plan shows NO exchange reuse across
    the references — uncached, the tokenize→tf→df chain runs three
    times (invisible at sf0.1; measured at the 500k-doc decade).

    The overflow guard compares ``tf`` against the bound DIVIDED by
    the idf quotient (integer ops only — the guard itself cannot
    overflow, unlike comparing the product), so a per-doc term count
    above ~1e10 (a 10-billion-token document at the capped idf) fails
    loudly with the doc_id instead of silently nulling out of the
    DECIMAL accumulators under non-ANSI CAST semantics."""
    terms = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                # guard: sequence(1, 0) DESCENDS in Spark, so short docs
                # must hit the empty branch, not a degenerate sequence
                f"CASE WHEN size({_TOKENS}) >= {gram} THEN "
                f"transform(sequence(1, size({_TOKENS}) - {gram - 1}), "
                f"i -> concat_ws(' ', slice({_TOKENS}, i, {gram}))) "
                f"ELSE array() END"
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    if n_docs is None:
        totals = docs.agg(
            F.least(F.count(F.lit(1)), F.lit(TFIDF_N_CAP)).alias("_n_idf")
        )
    else:
        totals = docs.sparkSession.range(1).select(
            F.lit(min(int(n_docs), TFIDF_N_CAP)).cast("long").alias("_n_idf")
        )
    w_guarded = (
        f"IF(tf <= {_TFIDF_W_BOUND} DIV GREATEST(_n_idf DIV df_docs, 1), "
        "tf * (_n_idf DIV df_docs), "
        "raise_error(concat('TFIDF_W_OVERFLOW: doc_id=', doc_id, "
        "' tf=', tf, ' idf=', _n_idf DIV df_docs, "
        "' — weight exceeds the exact DECIMAL(18,0) operand bound; "
        "split or pre-truncate the document')))"
    )
    return (
        tf.join(dfc, "term")
        .filter(F.col("df_docs") <= max_df)
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "term", F.expr(w_guarded).alias("w"))
        .cache()
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    min_cosine: float = 0.35,
    max_df: int = 100,
    min_shared: int = 2,
    gram: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Lexical similarity search WITHOUT embeddings: tf-idf-weighted
    cosine between documents over a df-pruned SHINGLE posting list —
    the classic prefix-filtered all-pairs shape (Bayardo et al.,
    WWW'07: frequent terms generate quadratically many junk candidates
    and almost no cosine mass, so drop postings with ``df > max_df``
    and compute the metric ENTIRELY in the pruned term space;
    ``max_df`` is the recall/cost dial, and the metric is exactly
    self-consistent — both the dot products and the norms use the
    same pruned vocabulary). Terms are ``gram``-token shingles, not
    unigrams: word-level df carries no rarity signal on small/repetitive
    vocabularies (the harness corpus has 31 distinct tokens), while
    shingles give the same large sparse term space the winnowing
    fingerprints exploit — gram=1 recovers classic unigram tf-idf.

    Integer-exact cross-engine (the repo's tf-idf convention): weight
    ``w = tf * (LEAST(N, TFIDF_N_CAP) DIV df)`` is a BIGINT, the pair
    dot product and the squared norms are exact DECIMAL sums —
    DECIMAL(18,0) operands so each product is an exact DECIMAL(37,0)
    (no precision-loss clamping) accumulated in DECIMAL(38,0),
    order-independent with no floating drift between engines — and the
    single ``ROUND(dot / (sqrt(na2)*sqrt(nb2)), 6)`` at the end is a
    deterministic IEEE op on exact integers. Web-scale overflow guard
    (was docstring-only before round 8): capping the idf numerator at
    :data:`TFIDF_N_CAP` bounds ``w <= tf * 1e8``, so with per-doc term
    counts up to 1e6 the worst norm is 1e6 * (1e6*1e8)^2 = 1e34 <
    10^38 — exact at ANY corpus size, N >= 1e9 included. The
    DECIMAL(18,0) operand cast is itself exact while ``w < 1e18``,
    i.e. up to 10-billion-token single documents. Property-tested at
    adversarial N/df in tests/test_r8_guards.py.

    ``n_docs`` overrides the corpus size used for idf (default: count
    of ``docs``) — for scoring a partition/sample of a larger corpus
    with the global N, and for testing the cap path.

    Scale shape: two map-combinable aggregates (tf, df), one
    term-keyed self-join restricted to rare terms — each term
    contributes ≤ max_df²/2 candidate pairs, so the worst-case join
    fan-out is BOUNDED PER KEY (the skew guarantee frequent-term
    postings would destroy) — then one (doc_a, doc_b)-keyed
    aggregation. Never all-pairs.

    ``min_shared`` (default 2) drops pairs overlapping in fewer rare
    terms — a single-rare-term overlap between two docs whose ONLY
    pruned-space term is that one scores a degenerate cosine 1.0.

    Output: (doc_a, doc_b, shared_terms, cosine ≥ min_cosine),
    doc_a < doc_b."""
    rare = _tfidf_rare_weights(docs, gram, max_df, n_docs)
    norms = rare.groupBy("doc_id").agg(
        F.sum(
            F.expr("CAST(w AS DECIMAL(18,0)) * CAST(w AS DECIMAL(18,0))")
        ).alias("n2")
    )
    a = rare.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    b = rare.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.expr("CAST(wa AS DECIMAL(18,0)) * CAST(wb AS DECIMAL(18,0))")
            ).alias("dot"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    cos = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
        6,
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(F.col("shared_terms") >= min_shared)
        .select("doc_a", "doc_b", "shared_terms", cos.alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


def tfidf_verify(
    docs: DataFrame,
    pairs: DataFrame,
    min_cosine: float = 0.35,
    max_df: int = 100,
    min_shared: int = 2,
    gram: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Candidates-tier tf-idf cosine (VERDICT r8 ask #5 — the
    composition the 5M-doc decade demanded): score ONLY the given
    candidate ``pairs`` instead of self-joining the whole posting
    list. Exactly equals :func:`tfidf_cosine_pairs` restricted to the
    candidate set (pinned by test + the chained DuckDB oracle): tf,
    df, N and therefore every weight come from the FULL corpus — the
    restriction changes which pairs are scored, never a score.

    ``pairs`` is any (doc_a, doc_b) frame — production callers pass
    MinHash-LSH candidates (``dedup.minhash_pairs``), the documented
    posture for the full-corpus op ("run on MinHash candidates").
    Pair order is normalized to doc_a < doc_b, duplicates dropped,
    self-pairs ignored, so a raw band-bucket join can be passed as-is.

    Scale shape vs the full op: the tokenize→tf→df chain stays linear
    (one pass over the corpus — unavoidable, the weights are corpus
    statistics), but the quadratic-risk stage — the term-keyed posting
    self-join whose fan-out is bounded only by max_df² per term —
    collapses to |pairs| keyed lookups: postings are semi-joined down
    to candidate docs, each pair fans out by ONE doc's pruned terms,
    and the (doc_b, term) join is a plain equi-join. MEASURED at the
    5M-doc decade (round 10, docs/PLANS.md "Round 10 measures that
    posture end-to-end" + docs/SCALE.md): the full op ran 327 s, this
    composition 13.9 s amortized (~30 s cold including MinHash
    candidate generation) — ≥ 23× cheaper."""
    rare = _tfidf_rare_weights(docs, gram, max_df, n_docs)
    a_col, b_col = pairs.columns[0], pairs.columns[1]
    # The normalized candidate frame is referenced THREE times below
    # (the dots join + both arms of the cand_docs union), and the
    # caller's ``pairs`` is typically the full MinHash-LSH DAG
    # (shingle → signatures → band self-join) — without a cache Spark
    # re-derives that DAG per reference (VERDICT r9 ask #7: the first
    # driver row paid candidate generation ~3×). cache() is lazy (no
    # action here); the CacheManager dedups across calls on the same
    # input and clearCache()/eviction bounds residency, the same
    # posture as _pq_fit's subvector cache.
    cand = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("doc_a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("doc_b"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
        .cache()
    )
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select("doc_b"))
        .distinct()
    )
    rare_cand = rare.join(cand_docs, "doc_id", "left_semi")
    a = rare_cand.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    b = rare_cand.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.expr("CAST(wa AS DECIMAL(18,0)) * CAST(wb AS DECIMAL(18,0))")
            ).alias("dot"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
    )
    norms = rare_cand.groupBy("doc_id").agg(
        F.sum(
            F.expr("CAST(w AS DECIMAL(18,0)) * CAST(w AS DECIMAL(18,0))")
        ).alias("n2")
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    cos = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
        6,
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(F.col("shared_terms") >= min_shared)
        .select("doc_a", "doc_b", "shared_terms", cos.alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


def contamination_pairs(
    docs: DataFrame, gram: int = 8, bench_mod: int = 25
) -> DataFrame:
    """Benchmark decontamination: for every (training doc, benchmark doc)
    pair sharing at least one token ``gram``-gram, the count of DISTINCT
    shared grams and the benchmark's total distinct gram count — the
    overlap report a training pipeline uses to drop contaminated docs.

    The harness has no separate eval table, so the benchmark side is the
    deterministic ``doc_id % bench_mod == 0`` slice of ``documents`` (a
    stand-in for the real eval-set table; swap the DataFrame to use one).

    Scale: both sides reduce to DISTINCT (doc, gram) first, so the join
    is keyed on the gram string — never all-pairs; 8-grams are near-
    unique, so bucket fan-out is tiny and a pathological boilerplate
    gram is an AQE skew split. The benchmark side is small by
    construction (eval sets are), so Spark broadcasts it. Counts are
    exact distinct-gram counts per pair — map-side combined.
    """
    def grams_of(df: DataFrame, id_alias: str) -> DataFrame:
        return (
            df.filter(F.expr(f"size({_TOKENS}) >= {gram}"))
            .select(
                F.col("doc_id").alias(id_alias),
                F.explode(
                    F.expr(
                        f"array_distinct(transform(sequence(1, size({_TOKENS}) - {gram - 1}), "
                        f"i -> concat_ws(' ', slice({_TOKENS}, i, {gram}))))"
                    )
                ).alias("gram"),
            )
        )

    train = grams_of(docs.filter(F.col("doc_id") % bench_mod != 0), "doc_id")
    bench_docs = docs.filter(F.col("doc_id") % bench_mod == 0)
    # bench feeds both the join and bench_sizes; persist so the (small)
    # benchmark tokenize/explode runs once, not once per consumer.
    bench = grams_of(bench_docs, "bench_id").persist()
    bench_sizes = bench.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_grams")
    )
    overlap = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        overlap.join(F.broadcast(bench_sizes), "bench_id")
        .select("doc_id", "bench_id", "n_shared", "bench_grams")
    )


def with_unigram_logprob(docs: DataFrame) -> DataFrame:
    """CCNet-style LM quality proxy: the mean corpus-unigram
    log2-probability of each document's tokens (higher = more typical
    text; real pipelines bucket documents by this score, e.g. CCNet's
    head/middle/tail thirds — Wenzek et al. 2020, public).

    avg_logprob = mean over tokens of log2(tf(term)) − log2(corpus_N).

    Determinism contract: a raw double sum over shuffled join output is
    order-nondeterministic, so each token contributes
    ``round(log2(tf), 6)`` scaled to an exact integer in 1e-6 units; the
    per-document sum is then a BIGINT aggregate (order-free), divided
    once at the end. Cross-engine float risk is confined to per-VALUE
    ``log2`` + round — never to aggregation order.

    Scale: term frequencies come from ``groupBy(term).count()`` — the
    partial (map-side) aggregate shrinks each task's output to its
    LOCAL vocabulary before any exchange, so the tf shuffle is
    vocab-sized, not corpus-sized, and no single task ever holds all
    occurrences of a stopword. The vocab-sized count table is then
    broadcast-joined back onto the one exploded frame. (The previous
    formulation — a count window partitioned by raw ``term`` — put
    every occurrence of "the" in ONE window partition; AQE skew
    handling does NOT rescue that: it splits skewed sort-merge-join
    partitions, not window exchanges.) At extreme vocabularies where
    the count table outgrows the broadcast limit, drop the hint and
    the term join becomes a sort-merge join — which AQE skew-split
    genuinely covers. The explode is evaluated once per consumer (tf
    build + probe side): explode is a map-side flatMap off a pruned
    single-column scan, far cheaper than a corpus-sized skewed
    exchange. ``corpus_n`` is a separate map-only sum over the
    documents (no explode).
    """
    toks = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
    tf_counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    total = docs.agg(
        F.sum(F.expr(f"size({_TOKENS})")).cast("long").alias("corpus_n")
    )
    scored = (
        toks.join(F.broadcast(tf_counts), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.round(F.log2("tf"), 6).cast("decimal(18,6)"))
            .alias("_sum_lp"),
        )
    )
    return (
        scored.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("_sum_lp").cast("double") / F.col("n_tokens")
                - F.log2("corpus_n"),
                6,
            ).alias("avg_logprob"),
        )
    )


def unigram_logprob_sql() -> str:
    """DuckDB oracle for :func:`with_unigram_logprob` — identical
    quantize-then-integer-sum formulation."""
    tk = "string_split(text, ' ')"
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({tk}) AS term FROM documents
    ),
    tf AS (SELECT term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY term),
    total AS (SELECT CAST(SUM(tf) AS BIGINT) AS corpus_n FROM tf),
    scored AS (
        SELECT doc_id,
               COUNT(*)::BIGINT AS n_tokens,
               SUM(CAST(ROUND(log2(tf), 6) AS DECIMAL(18,6))) AS _sum_lp
        FROM toks JOIN tf USING (term)
        GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           ROUND(CAST(_sum_lp AS DOUBLE) / n_tokens - log2(corpus_n), 6)
               AS avg_logprob
    FROM scored, total
    """


def duplicated_spans(
    docs: DataFrame, gram: int = 8, min_count: int = 2
) -> DataFrame:
    """Exact duplicated-substring detection (the signal behind
    suffix-array substring dedup — Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", public): find every
    position where a ``gram``-token window occurs at least
    ``min_count`` times corpus-wide, then merge consecutive duplicated
    positions into maximal per-document spans. Real pipelines CUT these
    spans out of the training text; the span report is the
    engine-portable core of that.

    Scale: positional n-grams explode map-side; occurrence counts are a
    ``groupBy(gram).count()`` (map-side combinable — the exchange
    carries the gram VOCABULARY with partial counts, never one task
    per hot gram) joined back onto the positional frame; the
    run-length merge (pos − row_number) is a per-document window. No
    suffix array needed for fixed-length windows — the groupBy IS the
    "find repeated substrings of length ≥ gram" query, distributed.

    Output: (doc_id, span_start [1-based token idx], span_tokens,
    n_grams) — all integers, so cross-engine hashes are trivially
    exact.
    """
    from pyspark.sql import Window

    pos_grams = docs.filter(F.expr(f"size({_TOKENS}) >= {gram}")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size({_TOKENS}) - {gram - 1}), "
                f"i -> struct(i AS pos, "
                f"concat_ws(' ', slice({_TOKENS}, i, {gram})) AS gram))"
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    dup_grams = (
        pos_grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram")
    )
    dup_pos = pos_grams.join(dup_grams, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = dup_pos.withColumn("_grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "_grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") - F.min("pos") + gram).cast("long").alias("span_tokens"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_tokens", "n_grams")
    )


def duplicated_spans_sql(gram: int = 8, min_count: int = 2) -> str:
    """DuckDB mirror of :func:`duplicated_spans` (identical positional
    grams, corpus counts, and pos−row_number run-length merge)."""
    tk = "string_split(text, ' ')"
    return f"""
    WITH pos_grams AS (
        SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len({tk}) - {gram - 2}),
                          i -> {{'pos': i,
                                 'gram': array_to_string(
                                     list_slice({tk}, i, i + {gram - 1}), ' ')}}))
                       AS pg
            FROM documents WHERE len({tk}) >= {gram}) t
    ),
    dup_grams AS (
        SELECT gram FROM pos_grams GROUP BY gram
        HAVING COUNT(*) >= {min_count}
    ),
    dup_pos AS (
        SELECT doc_id, pos FROM pos_grams JOIN dup_grams USING (gram)
    ),
    runs AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS _grp
        FROM dup_pos
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) - MIN(pos) + {gram} AS BIGINT) AS span_tokens,
           COUNT(*)::BIGINT AS n_grams
    FROM runs GROUP BY doc_id, _grp
    """


def dup_span_fraction(
    docs: DataFrame, gram: int = 8, min_count: int = 2
) -> DataFrame:
    """Per-document fraction of tokens covered by corpus-duplicated
    ``gram``-token windows — the document-level filter built on the
    same signal as :func:`duplicated_spans` (Gopher's "fraction of
    characters in duplicate n-grams" rule, Rae et al. 2021, applied
    cross-document as in Dolma/RefinedWeb: docs above a coverage
    threshold are dropped or trimmed).

    Exact interval-union coverage without materializing spans: the
    duplicated positions each cover ``[pos, pos+gram-1]``; sorted by
    ``pos`` within a doc, a position's NEW coverage is
    ``min(gram, pos - lag(pos))`` (gap ≥ gram → full window, overlap →
    only the fresh suffix). Summing that per doc is the union length —
    one window pass over the sparse duplicated positions, no
    per-interval merge loop.

    Scale: identical shape to :func:`duplicated_spans` (map-side gram
    explode, combinable vocabulary count, join back) plus one window
    over duplicated positions only (≪ corpus tokens) and a key-only
    left join onto the doc spine. All-integer outputs except the final
    single division of two longs (bit-identical IEEE in any engine).
    """
    from pyspark.sql import Window

    pos_grams = docs.filter(F.expr(f"size({_TOKENS}) >= {gram}")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size({_TOKENS}) - {gram - 1}), "
                f"i -> struct(i AS pos, "
                f"concat_ws(' ', slice({_TOKENS}, i, {gram})) AS gram))"
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    dup_grams = (
        pos_grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram")
    )
    dup_pos = pos_grams.join(dup_grams, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = dup_pos.withColumn(
        "_new",
        F.least(F.lit(gram), F.col("pos") - F.lag("pos").over(w)),
    ).withColumn("_new", F.coalesce("_new", F.lit(gram)))
    per_doc = cov.groupBy("doc_id").agg(
        F.sum("_new").cast("long").alias("dup_tokens")
    )
    spine = docs.select(
        "doc_id", F.expr(f"size({_TOKENS})").cast("long").alias("n_tokens")
    )
    return (
        spine.join(per_doc, "doc_id", "left")
        .withColumn("dup_tokens", F.coalesce("dup_tokens", F.lit(0)))
        .select(
            "doc_id",
            "n_tokens",
            "dup_tokens",
            (F.col("dup_tokens") / F.col("n_tokens")).alias("dup_frac"),
        )
    )


def dup_span_fraction_sql(gram: int = 8, min_count: int = 2) -> str:
    """DuckDB mirror of :func:`dup_span_fraction` — same positional
    grams, same min(gram, gap) union-length window, same single final
    long/long division."""
    tk = "string_split(text, ' ')"
    return f"""
    WITH pos_grams AS (
        SELECT doc_id, pos,
               array_to_string(list_slice({tk}, pos, pos + {gram - 1}), ' ')
                   AS gram
        FROM (SELECT doc_id, text, unnest(range(1, len({tk}) - {gram - 2}))
                         AS pos
              FROM documents WHERE len({tk}) >= {gram}) t
    ),
    dup_grams AS (
        SELECT gram FROM pos_grams GROUP BY gram
        HAVING COUNT(*) >= {min_count}
    ),
    cov AS (
        SELECT doc_id,
               COALESCE(LEAST({gram},
                   pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)),
                   {gram}) AS _new
        FROM pos_grams JOIN dup_grams USING (gram)
    ),
    per_doc AS (
        SELECT doc_id, CAST(SUM(_new) AS BIGINT) AS dup_tokens
        FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len({tk}) AS BIGINT) AS n_tokens,
           COALESCE(p.dup_tokens, 0) AS dup_tokens,
           COALESCE(p.dup_tokens, 0) / CAST(len({tk}) AS BIGINT) AS dup_frac
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


def inverted_index(docs: DataFrame, min_df: int = 2) -> DataFrame:
    """Term → posting-list index over the corpus (the retrieval-side
    companion of :func:`vocab_counts`): document frequency plus the
    sorted posting list itself, serialized as a comma-joined string so
    the result is engine-portable (array cell comparison is
    representation-fragile across Arrow/pandas/DuckDB).

    Scale: explode → distinct (term, doc) → one groupBy(term). The
    posting list for a stopword-grade term is the whole corpus — real
    deployments cap or shard those; ``min_df`` trims the singleton tail
    instead (the hot-term cap would be its mirror). Collect_list is
    bounded by df, which the caller controls via min_df/stopword
    filtering.
    """
    # dropDuplicates guards duplicate doc_id ROWS (a corpus appended
    # twice): without it df double-counts and postings repeat ids while
    # the oracle's DISTINCT dedupes — silent cross-engine divergence.
    pairs = docs.select(
        F.explode(F.expr(f"array_distinct({_TOKENS})")).alias("term"), "doc_id"
    ).dropDuplicates(["term", "doc_id"])
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.concat_ws(
                ",", F.transform(F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string"))
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def inverted_index_sql(min_df: int = 2) -> str:
    return f"""
    WITH pairs AS (
        SELECT DISTINCT unnest(list_distinct(string_split(text, ' '))) AS term,
               doc_id
        FROM documents
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM pairs GROUP BY term
    HAVING COUNT(*) >= {min_df}
    """


def term_cooccurrence(
    docs: DataFrame,
    min_df: int = 3,
    max_df_ratio: float = 0.5,
    min_pair: int = 2,
) -> DataFrame:
    """Collocation mining: unordered content-term pairs that co-occur in
    documents, scored by an integer-exact PMI surrogate
    ``lift_ppm = n_both * n_docs * 1_000_000 DIV (df_a * df_b)`` —
    rank-equivalent to pointwise mutual information (monotone in
    p(a,b)/(p(a)p(b))) with no cross-engine float drift (same trick as
    :func:`tfidf_top_terms`).

    Scale: the pair join is keyed on ``doc_id`` — co-partitioned
    self-join, NEVER a global cross join — and the vocabulary band
    (``min_df`` .. ``max_df_ratio``·corpus) caps the per-document join
    fan-out by dropping stopword-grade terms (whose pair lists are the
    quadratic blow-up) and the untrustworthy singleton tail.
    """
    toks = docs.select(
        "doc_id", F.explode(F.expr(f"array_distinct({_TOKENS})")).alias("term")
    ).dropDuplicates(["doc_id", "term"])  # mirror the oracle's DISTINCT
    dfs = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    vocab = (
        dfs.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.ceil(F.lit(max_df_ratio) * F.col("n_docs")))
        )
        .select("term", "df")
    )
    t = toks.join(F.broadcast(vocab), "term")
    a = t.select("doc_id", F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    b = t.select("doc_id", F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    pairs = a.join(b, "doc_id").filter(F.col("term_a") < F.col("term_b"))
    return (
        pairs.groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_pair)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_both",
            # numerator in DECIMAL(38,0): n_both * n_docs * 1e6 passes
            # 2^63 at ~3M docs (both factors are corpus-sized, unlike
            # tfidf's per-doc tf); 38 digits holds to ~1e11 docs. The
            # quotient itself always fits BIGINT.
            F.expr(
                "CAST(CAST(n_both AS DECIMAL(38,0)) * n_docs * 1000000"
                " DIV (df_a * df_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def term_cooccurrence_sql(
    min_df: int = 3, max_df_ratio: float = 0.5, min_pair: int = 2
) -> str:
    return f"""
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(string_split(text, ' '))) AS term
        FROM documents
    ),
    dfs AS (SELECT term, COUNT(*)::BIGINT AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
    vocab AS (
        SELECT term, df FROM dfs, n
        WHERE df >= {min_df} AND df <= CEIL({max_df_ratio} * n_docs)
    ),
    t AS (SELECT toks.doc_id, toks.term, vocab.df FROM toks JOIN vocab USING (term)),
    co AS (
        SELECT a.term AS term_a, b.term AS term_b, a.df AS df_a, b.df AS df_b,
               COUNT(*)::BIGINT AS n_both
        FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY a.term, b.term, a.df, b.df
        HAVING COUNT(*) >= {min_pair}
    )
    SELECT term_a, term_b, n_both,
           CAST(CAST(n_both AS HUGEINT) * n_docs * 1000000
                // (df_a * df_b) AS BIGINT) AS lift_ppm
    FROM co, n
    """


def lm_quality_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    approx: bool = False,
    rel_err: float = 0.001,
) -> DataFrame:
    """CCNet-style corpus partitioning (Wenzek et al. 2020, public):
    rank documents by their unigram-LM score and split into
    ``n_buckets`` equal-count bands — head/middle/tail for the default
    3 — the signal real pipelines use to keep/downsample/drop.

    ``bucket = (rank - 1) * n_buckets DIV n`` over (score DESC, doc_id)
    — pure integer arithmetic on an engine-identical ordering, so the
    assignment is exact cross-engine (NTILE has engine-specific
    remainder rules; this formulation has one rule).

    Scale: the global rank runs on the NARROW (score, doc_id) frame —
    two longs and a double per document — not the corpus; even so it is
    a single-partition sort at the very end. At 100 TB pass
    ``approx=True``: bucket boundaries then come from
    ``approxQuantile`` (Greenwald–Khanna sketch, one pass, no global
    sort) and the assignment is a MAP-ONLY comparison against n-1
    broadcast thresholds — the bands don't need exact boundaries,
    which is why CCNet itself uses sampled quantiles. Keep the default
    exact form wherever the oracle-checkable path matters: the approx
    route can misplace documents within ``rel_err`` of a boundary
    (and, unlike the exact rank, splits score-ties by the boundary
    value, not doc_id).
    """
    from pyspark.sql import Window

    scored = with_unigram_logprob(docs)
    if approx:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        # ascending thresholds at 1/n … (n-1)/n of the score
        # distribution; two actions total (the quantile sketch runs on
        # the already-narrow scored frame), then a map-only bucketing.
        thresholds = scored.approxQuantile("avg_logprob", qs, rel_err)
        bucket = F.lit(0)
        for t in thresholds:
            # bucket 0 = head (highest scores): one increment per
            # threshold the score falls below.
            bucket = bucket + F.when(
                F.col("avg_logprob") < F.lit(t), 1
            ).otherwise(0)
        return scored.select(
            "doc_id", "avg_logprob", bucket.cast("bigint").alias("bucket")
        )
    w = Window.orderBy(F.col("avg_logprob").desc(), F.col("doc_id").asc())
    n = Window.partitionBy()
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        # integer DIV, not double '/': double division of exact integers
        # can land at 2.999…96 and cast-truncate into the wrong bucket
        .select(
            "doc_id",
            "avg_logprob",
            # CAST first: row_number is 32-bit; (_rn-1)*k wraps past
            # ~2^31/k documents without it
            F.expr(
                f"(CAST(_rn AS BIGINT) - 1) * {n_buckets} DIV _n"
            ).alias("bucket"),
        )
    )


def lm_quality_buckets_sql(n_buckets: int = 3) -> str:
    return f"""
    WITH scored AS ({unigram_logprob_sql()})
    SELECT doc_id, avg_logprob,
           CAST((ROW_NUMBER() OVER (ORDER BY avg_logprob DESC, doc_id ASC) - 1)
                * {n_buckets} // COUNT(*) OVER () AS BIGINT) AS bucket
    FROM scored
    """


def with_bigram_logprob(docs: DataFrame) -> DataFrame:
    """Bigram-LM quality score: mean conditional log2 p(w_i | w_{i-1})
    over each document, with p(b|a) = c(a,b) / c(a,·) from corpus bigram
    counts — the next step up from :func:`with_unigram_logprob` on the
    same determinism pattern: each token contributes
    ``round6(log2 c_ab) − round6(log2 c_a)`` in exact 1e-6 units, so the
    per-document aggregate is an order-free integer sum.

    Plan: bigram counts come from ``groupBy(a, b).count()`` (map-side
    partial combine → the exchange carries the bigram VOCABULARY, not
    the corpus), and the left-context counts c(a,·) are a rollup of
    that already-vocab-sized table (``sum(c_ab) group by a`` — no
    second corpus pass). Both count tables broadcast-join back onto
    the one exploded bigram frame, then a groupBy(doc_id). The
    previous count-window-by-(a,b)/-(a) formulation concentrated every
    occurrence of a Zipf-head context in one window partition — a
    single-task hotspot AQE cannot split (its skew handling covers
    sort-merge joins, not window exchanges). If the bigram vocabulary
    outgrows the broadcast limit, drop the hints: the fallback
    sort-merge joins ARE AQE-skew-splittable. Documents with fewer
    than 2 tokens are absent from the output (no bigrams to score).
    """
    bigrams = (
        # filter BEFORE the sequence: sequence(1, 0) steps DESCENDING in
        # Spark, so a 1-token doc would index element_at out of bounds
        docs.filter(F.expr(f"size({_TOKENS}) >= 2"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size({_TOKENS}) - 1), "
                    f"i -> struct(element_at({_TOKENS}, i) AS a, "
                    f"element_at({_TOKENS}, i + 1) AS b))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    )
    c_ab = bigrams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    c_a = c_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    lp = (
        F.round(F.log2("c_ab"), 6).cast("decimal(18,6)")
        - F.round(F.log2("c_a"), 6).cast("decimal(18,6)")
    )
    return (
        bigrams.join(F.broadcast(c_ab), ["a", "b"])
        .join(F.broadcast(c_a), "a")
        .withColumn("_lp", lp)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                (F.sum("_lp")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_bigram_logprob"),
        )
    )


def bigram_logprob_sql() -> str:
    tk = "string_split(text, ' ')"
    return f"""
    WITH bigrams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len({tk})),
                      i -> {{'a': {tk}[i], 'b': {tk}[i + 1]}})) AS bg
        FROM documents
        WHERE len({tk}) >= 2
    ),
    flat AS (SELECT doc_id, bg.a AS a, bg.b AS b FROM bigrams),
    scored AS (
        SELECT doc_id,
               CAST(ROUND(log2(COUNT(*) OVER (PARTITION BY a, b)), 6)
                    AS DECIMAL(18,6))
               - CAST(ROUND(log2(COUNT(*) OVER (PARTITION BY a)), 6)
                    AS DECIMAL(18,6)) AS lp
        FROM flat
    )
    SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
           ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_bigram_logprob
    FROM scored GROUP BY doc_id
    """


def repetition_profile(docs: DataFrame, ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Gopher-style top-n-gram repetition metrics (Rae et al. 2021,
    public, §A1.1): for each n in ``ns``, the single most frequent word
    n-gram of every document and the fraction of the document's
    characters its occurrences cover — the "top n-gram character
    fraction" filter of a training-data pipeline. (The line-based
    repetition rules are omitted: the harness corpus is single-line by
    construction, so they are degenerate there; the n-gram family is
    the non-trivial part.)

    Output (long format): doc_id, n, top_gram, n_occurrences,
    top_gram_char_frac. Docs shorter than n words emit no row for that
    n. Ties on occurrence count break to the lexicographically LARGEST
    gram via lexicographic struct-max — deterministic, and mirrored
    exactly by the DuckDB oracle's struct max.

    Scale (100 TB): one explode fans each doc into ~n_words rows per n,
    but each row carries only (doc_id, n, gram) — never the document
    text; the occurrence count is a map-side-combinable aggregate keyed
    on (doc_id, n, gram), and the per-doc argmax is a second
    map-side-combinable max(struct) into one row per (doc, n) — no
    window, no per-doc sort, two keyed exchanges total. The char-frac
    division joins back to a doc-keyed (doc_id, n_chars) projection,
    not the text itself.
    """
    gram_arrays = [
        F.when(
            F.expr(f"size({_TOKENS})") >= n,
            F.expr(
                f"transform(sequence(1, size({_TOKENS}) - {n} + 1), "
                f"i -> concat_ws(' ', slice({_TOKENS}, i, {n})))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias(f"_g{n}")
        for n in ns
    ]
    exploded = (
        docs.select("doc_id", F.length("text").alias("_len"), *gram_arrays)
        .select(
            "doc_id",
            "_len",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).cast("long").alias("n"),
                            F.col(f"_g{n}").alias("grams"),
                        )
                        for n in ns
                    ]
                )
            ).alias("_ng"),
        )
        .select(
            "doc_id",
            "_len",
            F.col("_ng.n").alias("n"),
            F.explode("_ng.grams").alias("gram"),
        )
    )
    counted = exploded.groupBy("doc_id", "_len", "n", "gram").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    top = counted.groupBy("doc_id", "_len", "n").agg(
        F.max(F.struct(F.col("_cnt"), F.col("gram"))).alias("_top")
    )
    return top.select(
        "doc_id",
        "n",
        F.col("_top.gram").alias("top_gram"),
        F.col("_top._cnt").alias("n_occurrences"),
        F.round(
            F.col("_top._cnt") * F.length("_top.gram") / F.col("_len"), 6
        ).alias("top_gram_char_frac"),
    )


def encode_token_ids(docs: DataFrame, vocab_size: int = 1000) -> DataFrame:
    """Vocabulary encoding — the tokenize→encode step of training-data
    prep: build the top-``vocab_size`` token vocabulary (corpus counts,
    deterministic (count desc, token asc) ranking; id 1 = most
    frequent) and re-emit every document as its token-id sequence
    (OOV → 0).

    Output: (doc_id, token_ids — ' '-joined id sequence in document
    order —, n_tokens, n_oov).

    Scale (100 TB): the vocabulary count is one map-side-combinable
    token-keyed aggregate; the top-V selection is a distributed
    TakeOrdered (``orderBy().limit()`` → per-partition heads, k-row
    driver merge — NEVER a global sort), and only the V surviving rows
    see a ranking window. The vocab is bounded by construction, so the
    encode join is a broadcast map-side lookup; the per-doc fold
    collects at most the document's own tokens. Text never shuffles —
    only (doc_id, pos, token) triples.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id", F.posexplode(F.expr(_TOKENS)).alias("pos", "tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_cnt"))
    top = counts.orderBy(F.col("_cnt").desc(), F.col("tok").asc()).limit(
        int(vocab_size)
    )
    vocab = top.select(
        "tok",
        F.row_number()
        .over(Window.orderBy(F.col("_cnt").desc(), F.col("tok").asc()))
        .alias("_id"),
    )
    enc = toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("_id"), F.lit(0)).cast("long").alias("_id"),
    )
    return enc.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, _id))), "
            "s -> CAST(s._id AS STRING)), ' ')"
        ).alias("token_ids"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_id") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )


def token_entropy(docs: DataFrame) -> DataFrame:
    """Shannon entropy of each document's token distribution in
    bits/token — the diversity signal that separates template/spam text
    (few tokens repeated, low entropy) from natural text, used as a
    quality filter alongside the Gopher rules.

    H = log2(n) − (1/n)·Σ c_t·log2(c_t) over per-doc term counts c_t.
    Determinism contract: every log2 is quantized to integer 1e-6
    units with the engine-portable floor trick (floor(x·1e6 + 0.5) —
    NOT ``F.round``, whose BigDecimal HALF_UP disagrees with DuckDB's
    binary-double ROUND exactly on decimal-half values like the
    4.1529205 this corpus actually produces), all sums are BIGINT, and
    the one final quantization uses the same floor trick — aggregation
    order and round-half rules can never move the result.

    Scale: one explode into (doc_id, term) pairs, one map-combinable
    count keyed (doc_id, term) — per-doc vocabulary state, no global
    vocabulary, no window — then a second map-combinable rollup to one
    row per doc. Both exchanges are doc-keyed (skew-free).
    """
    counts = (
        docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lp_micro = F.floor(F.log2("c") * F.lit(1e6) + F.lit(0.5)).cast("long")
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * lp_micro).cast("long").alias("_s_micro"),
    )
    lpn_micro = F.floor(F.log2("n_tokens") * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    h_micro = (
        lpn_micro.cast("double")
        - F.col("_s_micro").cast("double") / F.col("n_tokens")
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (F.floor(h_micro + F.lit(0.5)) / F.lit(1e6)).alias("entropy"),
    )


def token_entropy_sql() -> str:
    """DuckDB mirror of :func:`token_entropy` — identical
    quantize-then-exact-sum formulation."""
    tk = "string_split(text, ' ')"
    return f"""
    WITH counts AS (
        SELECT doc_id, term, COUNT(*)::BIGINT AS c
        FROM (SELECT doc_id, unnest({tk}) AS term FROM documents) t
        GROUP BY doc_id, term
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*)::BIGINT AS n_distinct,
               CAST(SUM(c * CAST(floor(log2(c) * 1e6 + 0.5) AS BIGINT))
                    AS BIGINT) AS _s_micro
        FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           floor(CAST(floor(log2(n_tokens) * 1e6 + 0.5) AS BIGINT)
                 - CAST(_s_micro AS DOUBLE) / n_tokens + 0.5) / 1e6
               AS entropy
    FROM per_doc
    """


def remove_dup_spans(
    docs: DataFrame, gram: int = 8, min_count: int = 2
) -> DataFrame:
    """The CUT step built on :func:`duplicated_spans`' signal: emit the
    corpus with every token covered by a corpus-duplicated
    ``gram``-window removed (the aggressive Dolma/RefinedWeb-style
    trim; Lee et al. 2022 cut such spans from training text to measurable
    quality gains).

    Spark shape: the duplicated START positions per doc are gathered
    into ONE small array (a groupBy over the sparse duplicated
    positions — ≪ corpus tokens), key-joined back onto the doc spine,
    and the cut itself is a map-only nested-HOF pass: keep token i iff
    no start s has s <= i < s+gram. No token-level shuffle, no UDF;
    the whole reconstruct stays in whole-stage codegen.

    Output: (doc_id, clean_text, n_tokens_kept, n_tokens_removed);
    clean_text is '' when everything was duplicated.
    """
    pos_grams = docs.filter(F.expr(f"size({_TOKENS}) >= {gram}")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size({_TOKENS}) - {gram - 1}), "
                f"i -> struct(i AS pos, "
                f"concat_ws(' ', slice({_TOKENS}, i, {gram})) AS gram))"
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    dup_grams = (
        pos_grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram")
    )
    starts = (
        pos_grams.join(dup_grams, "gram")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("_starts"))
    )
    kept = (
        f"filter(sequence(1, size({_TOKENS})), "
        f"i -> NOT exists(_starts, s -> s <= i AND i < s + {gram}))"
    )
    return (
        docs.join(starts, "doc_id", "left")
        .withColumn(
            "_starts",
            F.coalesce("_starts", F.expr("CAST(array() AS ARRAY<INT>)")),
        )
        .selectExpr(
            "doc_id",
            f"concat_ws(' ', transform({kept}, i -> {_TOKENS}[i - 1])) AS clean_text",
            f"CAST(size({kept}) AS BIGINT) AS n_tokens_kept",
            f"CAST(size({_TOKENS}) - size({kept}) AS BIGINT) AS n_tokens_removed",
        )
    )


def fit_dup_gram_stats(
    docs: DataFrame, gram: int = 8, min_count: int = 2
) -> DataFrame:
    """Materialize the corpus-global duplicated-gram statistic ONCE —
    the fit-once/reuse-many pattern (`fit_ivf_pq_index`'s shape)
    applied to the span cutter, motivated by the round-10 5M-doc
    measurement (docs/PLANS.md "Round 10 measures that posture
    end-to-end"): the stats pass is ~95% of a scoped rewrite's cost,
    so per-scope cost only drops when the stats are fitted once and
    reused across scopes (dedup clusters, flagged-quality slices,
    per-source batches of one corpus snapshot). MEASURED at 5M docs:
    the amortized per-scope rewrite runs 46.5–87.1 s (two runs, host
    band) vs 305 s for the fit-inline scoped op — the decade table in
    docs/PLANS.md.

    Returns the cached+counted (gram) frame; pass it to
    :func:`remove_dup_spans_scoped` via ``dup_grams=``. The caller
    must reuse the SAME ``gram``/``min_count`` they fit with — the
    frame carries grams of one shape only, and a mismatched rewrite
    would silently miss spans (documented contract, same as reusing
    an :class:`~.similarity.IvfPqIndex` against the corpus it was
    fitted on). On a cluster, write the frame to parquet once per
    corpus snapshot and read it per scope batch — it is one row per
    DISTINCT duplicated gram, orders of magnitude smaller than the
    corpus."""
    pos_grams = docs.filter(F.expr(f"size({_TOKENS}) >= {gram}")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size({_TOKENS}) - {gram - 1}), "
                f"i -> struct(i AS pos, "
                f"concat_ws(' ', slice({_TOKENS}, i, {gram})) AS gram))"
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    dup_grams = (
        pos_grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram")
        .cache()
    )
    dup_grams.count()  # materialize: the fit IS the expensive pass
    return dup_grams


def remove_dup_spans_scoped(
    docs: DataFrame,
    scope: DataFrame,
    gram: int = 8,
    min_count: int = 2,
    dup_grams: DataFrame | None = None,
) -> DataFrame:
    """Scoped twin of :func:`remove_dup_spans` (VERDICT r8 ask #5):
    rewrite ONLY the docs in ``scope`` (a frame whose first column is
    doc_id — e.g. a dedup cluster's members, a flagged-quality slice),
    with the duplicated-gram statistics still computed over the FULL
    corpus — so the output exactly equals the full op filtered to the
    scope (pinned by test + oracle), never a rescored variant whose
    "duplicated" threshold silently shrank to the subset.

    Scale shape: the corpus-wide gram explosion → dup-gram agg is
    unavoidable (the signal is a corpus statistic, one linear pass,
    map-side combined to ≤ one row per distinct gram), but every
    downstream stage collapses to the scope: the positions join is
    semi-joined to scoped docs BEFORE the dup-gram join (the big
    fan-in side shrinks first), the per-doc starts aggregation and the
    reconstruct HOF pass touch scoped docs only. MEASURED at the
    5M-doc decade (round 10, docs/PLANS.md "Round 10 measures that
    posture end-to-end"): full rewrite 318 s, scoped (25% of docs)
    305 s — at this corpus shape the corpus-global stats pass is ~95%
    of the cost, so the scoped tier buys a cheaper single pass ONLY
    when long documents make the rewrite tier dominant; its other
    production value is amortizing one stats pass across many scopes
    — pass ``dup_grams=``:func:`fit_dup_gram_stats`` for exactly that
    (fit once per corpus snapshot, rewrite per scope; the caller must
    reuse the fit's ``gram``/``min_count``)."""
    scope_ids = scope.select(F.col(scope.columns[0]).alias("doc_id")).distinct()

    def _pos_grams(src: DataFrame) -> DataFrame:
        return src.filter(F.expr(f"size({_TOKENS}) >= {gram}")).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size({_TOKENS}) - {gram - 1}), "
                    f"i -> struct(i AS pos, "
                    f"concat_ws(' ', slice({_TOKENS}, i, {gram})) AS gram))"
                )
            ).alias("pg"),
        ).select(
            "doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram")
        )

    if dup_grams is None:
        dup_grams = (
            _pos_grams(docs)
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= min_count)
            .select("gram")
        )
    # the starts side explodes SCOPED docs only — the semi-join cannot
    # be pushed below a generate, so exploding before restricting would
    # fan out the whole corpus even when the stats are prefit (the
    # entire point of fit_dup_gram_stats is to make this the only
    # non-trivial pass per scope)
    starts = (
        _pos_grams(docs.join(scope_ids, "doc_id", "left_semi"))
        .join(dup_grams, "gram")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("_starts"))
    )
    kept = (
        f"filter(sequence(1, size({_TOKENS})), "
        f"i -> NOT exists(_starts, s -> s <= i AND i < s + {gram}))"
    )
    return (
        docs.join(scope_ids, "doc_id", "left_semi")
        .join(starts, "doc_id", "left")
        .withColumn(
            "_starts",
            F.coalesce("_starts", F.expr("CAST(array() AS ARRAY<INT>)")),
        )
        .selectExpr(
            "doc_id",
            f"concat_ws(' ', transform({kept}, i -> {_TOKENS}[i - 1])) AS clean_text",
            f"CAST(size({kept}) AS BIGINT) AS n_tokens_kept",
            f"CAST(size({_TOKENS}) - size({kept}) AS BIGINT) AS n_tokens_removed",
        )
    )


def remove_dup_spans_sql(gram: int = 8, min_count: int = 2) -> str:
    """DuckDB mirror: same duplicated starts, same keep-iff-uncovered
    nested-lambda filter (1-based list indexing in both engines)."""
    tk = "string_split(text, ' ')"
    return f"""
    WITH pos_grams AS (
        SELECT doc_id, pos,
               array_to_string(list_slice({tk}, pos, pos + {gram - 1}), ' ')
                   AS gram
        FROM (SELECT doc_id, text, unnest(range(1, len({tk}) - {gram - 2}))
                         AS pos
              FROM documents WHERE len({tk}) >= {gram}) t
    ),
    dup_grams AS (
        SELECT gram FROM pos_grams GROUP BY gram
        HAVING COUNT(*) >= {min_count}
    ),
    starts AS (
        SELECT doc_id, list_sort(list(pos)) AS s
        FROM pos_grams JOIN dup_grams USING (gram)
        GROUP BY doc_id
    ),
    cut AS (
        SELECT d.doc_id, {tk} AS tk,
               list_filter(range(1, len({tk}) + 1),
                   i -> len(list_filter(COALESCE(st.s, []),
                            s -> s <= i AND i < s + {gram})) = 0) AS keep_idx
        FROM documents d LEFT JOIN starts st ON d.doc_id = st.doc_id
    )
    SELECT doc_id,
           -- COALESCE: DuckDB's array_to_string of an empty list is
           -- NULL; Spark's concat_ws is '' — match Spark
           COALESCE(array_to_string(list_transform(keep_idx, i -> tk[i]), ' '),
                    '') AS clean_text,
           len(keep_idx)::BIGINT AS n_tokens_kept,
           (len(tk) - len(keep_idx))::BIGINT AS n_tokens_removed
    FROM cut
    """


def quality_prune(docs: DataFrame, keep_permille: int = 700) -> DataFrame:
    """Per-source quality pruning: keep each source's top
    ``keep_permille``/1000 documents by :func:`with_quality_score`
    (ties broken by doc_id asc — fully deterministic), the standard
    "keep the best X% of every source" curation step (RefinedWeb /
    FineWeb-style percentile filtering, applied per source so one
    high-quality source can't crowd out the others' survivors).

    Output: (doc_id, source, quality_score, src_rank, src_n) for the
    surviving docs — the rank/population columns make the cut
    auditable downstream.

    Scale: one window rank per source partition (source cardinality
    bounds the partition count; each partition sorts its own docs) —
    the same shape as `topk_per_source`. ``ceil`` keeps at least one
    doc per non-empty source.
    """
    from pyspark.sql import Window

    scored = with_quality_score(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    ranked = scored.select(
        "doc_id",
        "source",
        "quality_score",
        F.row_number().over(w).cast("long").alias("src_rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("src_n"),
    )
    return ranked.filter(
        F.col("src_rank")
        <= F.ceil(F.col("src_n") * F.lit(keep_permille) / F.lit(1000.0))
    )


def quality_prune_sql(quality_score_sql: str, keep_permille: int = 700) -> str:
    """DuckDB mirror: same per-source rank over the same quality
    score, same ceil cut."""
    return f"""
    WITH q AS ({quality_score_sql}),
    ranked AS (
        SELECT d.doc_id, d.source, q.quality_score,
               ROW_NUMBER() OVER (PARTITION BY d.source
                                  ORDER BY q.quality_score DESC,
                                           d.doc_id ASC) AS src_rank,
               COUNT(*) OVER (PARTITION BY d.source) AS src_n
        FROM documents d JOIN q USING (doc_id)
    )
    SELECT doc_id, source, quality_score,
           CAST(src_rank AS BIGINT) AS src_rank,
           CAST(src_n AS BIGINT) AS src_n
    FROM ranked
    WHERE src_rank <= CEIL(src_n * {keep_permille} / 1000.0)
    """


def vocab_coverage(docs: DataFrame, vocab_size: int = 100) -> DataFrame:
    """Per-source tokenizer-fit report: what fraction of token
    OCCURRENCES falls outside the corpus top-``vocab_size`` vocabulary
    (the OOV rate a fixed vocab of that size would pay, by domain) —
    the signal that decides whether a source needs its own vocabulary
    or a bigger shared one.

    Scale: one map-side-combinable corpus count, a distributed
    TakeOrdered for the top-V, then a broadcast membership join and a
    per-source aggregate — text never shuffles.
    """
    toks = docs.select("source", F.explode(F.expr(_TOKENS)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_cnt"))
    top = (
        counts.orderBy(F.col("_cnt").desc(), F.col("tok").asc())
        .limit(int(vocab_size))
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(top), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
        .orderBy("source")
    )


def vocab_coverage_sql(vocab_size: int = 100) -> str:
    tk = "string_split(text, ' ')"
    return f"""
    WITH toks AS (
        SELECT source, unnest({tk}) AS tok
        FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    top AS (
        SELECT tok FROM counts
        ORDER BY cnt DESC, tok ASC LIMIT {vocab_size}
    )
    SELECT source,
           COUNT(*)::BIGINT AS n_tokens,
           SUM(CASE WHEN top.tok IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           ROUND(SUM(CASE WHEN top.tok IS NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
    FROM toks LEFT JOIN top ON toks.tok = top.tok
    GROUP BY source
    ORDER BY source
    """
