"""DuckDB oracle SQL for the LLM-pipeline queries — generated from the
same constants (:mod:`.params`) as the Spark builders, so stopword
lists, MinHash permutations, and LSH hyperplanes are literally
identical in both engines."""

from __future__ import annotations

from .params import (
    ANN_LSH_TOPK,
    ANN_QUERY_MOD,
    ANN_TOPK,
    FINGERPRINT_GRAM,
    FINGERPRINT_WINDOW,
    LSH_PLANE_WEIGHTS,
    MINHASH_BANDS,
    MINHASH_COEFFS,
    MINHASH_PRIME,
    MINHASH_ROWS,
    SHINGLE_K,
    SIMHASH_BITS,
    STOPWORDS,
    TOKEN_REGEX,
    duck_array_lit,
    sql_in_list,
)
from .text import lang_pred_case_sql

_TK = "string_split(text, ' ')"


def _text_stats_sql() -> str:
    stop = sql_in_list(STOPWORDS)
    return f"""
    SELECT doc_id,
           len({_TK}) AS n_words,
           len(list_distinct({_TK})) AS n_distinct_words,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_TK}), 6)
               AS avg_word_len,
           ROUND(CAST(len(list_filter({_TK}, x -> x IN {stop})) AS DOUBLE)
                 / len({_TK}), 6) AS stopword_ratio,
           ROUND(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS punct_ratio
    FROM documents
    """


def _minhash_sig_sql() -> str:
    k = SHINGLE_K
    sigs = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_PRIME}) AS sig_{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    )
    return f"""
    sh AS (
        SELECT doc_id, ('0x' || substr(md5(g), 1, 7))::BIGINT AS h
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tk) - {k - 2}),
                          i -> array_to_string(tk[i:i+{k - 1}], ' '))) AS g
            FROM (SELECT doc_id, {_TK} AS tk FROM documents) t
            WHERE len(tk) >= {k}
        ) s
    ),
    sigs AS (
        SELECT doc_id, {sigs}
        FROM sh GROUP BY doc_id
    )
    """


def _band_keys_sql() -> str:
    selects = []
    for b in range(MINHASH_BANDS):
        cols = ", ".join(
            f"sig_{b * MINHASH_ROWS + r}::VARCHAR" for r in range(MINHASH_ROWS)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS band_key FROM sigs"
        )
    return "bandkeys AS (" + " UNION ALL ".join(selects) + ")"


ORACLES: dict[str, str] = {}

ORACLES["dedup_exact"] = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

ORACLES["text_stats"] = _text_stats_sql()

ORACLES["lang_id"] = (
    f"SELECT doc_id, lang AS labeled_lang, {lang_pred_case_sql('duckdb')} AS pred_lang "
    "FROM documents"
)

# Quality score in exact integer 1e-7 units (inputs are 6-dp decimals, so
# 10x-scaled weights 4/3/3 keep every term integral): both engines sum
# identical integers — no round-half-boundary drift from double ROUND
# (Java BigDecimal rounds the shortest decimal representation, DuckDB
# rounds the binary double; they disagree on exact-looking .5 cases).
ORACLES["quality_score"] = f"""
WITH stats AS ({_text_stats_sql()})
SELECT doc_id,
       CAST(4 * least(1000000::BIGINT, n_words * 10000)
            + 3 * (1000000 - CAST(ROUND(punct_ratio * 1e6, 0) AS BIGINT))
            + 3 * least(1000000::BIGINT,
                        5 * CAST(ROUND(stopword_ratio * 1e6, 0) AS BIGINT))
            AS DOUBLE) / 1e7 AS quality_score
FROM stats
"""

ORACLES["token_counts"] = f"""
SELECT doc_id,
       len({_TK}) AS n_ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_bpe_tokens
FROM documents
"""

_G2 = (
    "list_transform(range(1, greatest(len(tk) - 1, 1) + 1), "
    "i -> array_to_string(tk[i:i+1], ' '))"
)

ORACLES["gopher_quality"] = f"""
WITH base AS (
    SELECT doc_id,
           len(tk)::BIGINT AS n_words,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(tk) AS mean_wl,
           CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / length(text) AS sym,
           1.0 - CAST(len(list_distinct({_G2})) AS DOUBLE) / len({_G2}) AS rep
    FROM (SELECT doc_id, text, {_TK} AS tk FROM documents) t
)
SELECT doc_id, n_words,
       ROUND(mean_wl, 6) AS mean_word_len,
       ROUND(sym, 6) AS symbol_ratio,
       ROUND(rep, 6) AS dup_2gram_ratio,
       n_words >= 5 AND n_words <= 10000 AS ok_word_count,
       mean_wl >= 2.0 AND mean_wl <= 12.0 AS ok_word_len,
       sym <= 0.2 AS ok_symbols,
       rep <= 0.5 AS ok_repetition,
       (n_words >= 5 AND n_words <= 10000) AND (mean_wl >= 2.0 AND mean_wl <= 12.0)
           AND sym <= 0.2 AND rep <= 0.5 AS keep
FROM base
"""

ORACLES["pii_scrub"] = """
SELECT doc_id,
       regexp_replace(regexp_replace(text,
           '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+', '<EMAIL>', 'g'),
           '[0-9]{6,}', '<NUM>', 'g') AS scrubbed_text,
       CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_number
FROM documents
"""

ORACLES["vocab_top100"] = f"""
WITH toks AS (SELECT doc_id, unnest({_TK}) AS token FROM documents),
counts AS (
    SELECT token, COUNT(*) AS term_count,
           COUNT(DISTINCT doc_id) AS doc_frequency
    FROM toks GROUP BY token
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY term_count DESC, token) AS rank
    FROM counts
)
SELECT * FROM ranked WHERE rank <= 100
"""

ORACLES["doc_fingerprints"] = f"""
WITH grams AS (
    SELECT doc_id, u.i AS pos,
           ('0x' || substr(md5(u.g), 1, 15))::BIGINT AS h
    FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk) - {FINGERPRINT_GRAM - 2}),
                      i -> struct_pack(i := i,
                           g := array_to_string(tk[i:i+{FINGERPRINT_GRAM - 1}], ' ')))) AS u
        FROM (SELECT doc_id, {_TK} AS tk FROM documents) t
        WHERE len(tk) >= {FINGERPRINT_GRAM}
    ) s
),
wins AS (
    SELECT doc_id,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {FINGERPRINT_WINDOW - 1} FOLLOWING)
               AS fingerprint
    FROM grams
)
SELECT DISTINCT doc_id, fingerprint FROM wins
"""

ORACLES["minhash_signatures"] = f"WITH {_minhash_sig_sql()} SELECT * FROM sigs"

ORACLES["minhash_pairs"] = f"""
WITH {_minhash_sig_sql()},
{_band_keys_sql()}
SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
FROM bandkeys a
JOIN bandkeys b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""

ORACLES["simhash"] = f"""
WITH toks AS (
    SELECT doc_id, unnest(list_distinct({_TK})) AS tok FROM documents
),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h FROM toks),
bits AS (SELECT doc_id, h, unnest(range(0, {SIMHASH_BITS})) AS b FROM h),
per_bit AS (
    SELECT doc_id, b,
           SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
    FROM bits GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END) AS BIGINT)
           AS simhash
FROM per_bit GROUP BY doc_id
"""

ORACLES["jaccard_pairs"] = f"""
WITH t AS (SELECT doc_id, list_distinct({_TK}) AS toks FROM documents)
SELECT * FROM (
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           ROUND(CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x))) AS DOUBLE)
                 / (len(a.toks) + len(b.toks)
                    - len(list_filter(a.toks, x -> list_contains(b.toks, x)))), 6)
               AS jaccard
    FROM t a JOIN t b
      ON a.doc_id % 20 = b.doc_id % 20 AND a.doc_id < b.doc_id
) p WHERE jaccard >= 0.05
"""

ORACLES["neardup_verified"] = f"""
WITH {_minhash_sig_sql()},
{_band_keys_sql()},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM bandkeys a
    JOIN bandkeys b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
t AS (SELECT doc_id, list_distinct({_TK}) AS toks FROM documents)
SELECT * FROM (
    SELECT cand.doc_id_a, cand.doc_id_b,
           ROUND(CAST(len(list_filter(ta.toks, x -> list_contains(tb.toks, x))) AS DOUBLE)
                 / (len(ta.toks) + len(tb.toks)
                    - len(list_filter(ta.toks, x -> list_contains(tb.toks, x)))), 6)
               AS jaccard
    FROM cand
    JOIN t ta ON ta.doc_id = cand.doc_id_a
    JOIN t tb ON tb.doc_id = cand.doc_id_b
) v WHERE jaccard >= 0.5
"""

# Connected components as a recursive CTE: min reachable doc_id over the
# undirected near-dup edge set (mirrors the Spark label propagation).
ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE {_minhash_sig_sql()},
{_band_keys_sql()},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM bandkeys a
    JOIN bandkeys b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
t AS (SELECT doc_id, list_distinct({_TK}) AS toks FROM documents),
verified AS (
    SELECT * FROM (
        SELECT cand.doc_id_a, cand.doc_id_b,
               CAST(len(list_filter(ta.toks, x -> list_contains(tb.toks, x))) AS DOUBLE)
               / (len(ta.toks) + len(tb.toks)
                  - len(list_filter(ta.toks, x -> list_contains(tb.toks, x)))) AS j
        FROM cand
        JOIN t ta ON ta.doc_id = cand.doc_id_a
        JOIN t tb ON tb.doc_id = cand.doc_id_b
    ) v WHERE ROUND(j, 6) >= 0.5
),
edges AS (
    SELECT doc_id_a AS src, doc_id_b AS dst FROM verified
    UNION ALL
    SELECT doc_id_b AS src, doc_id_a AS dst FROM verified
),
reach AS (
    SELECT doc_id AS src, doc_id AS dst FROM documents
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
"""

_DOT_SELF = "list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])"

ORACLES["embedding_norms"] = f"""
SELECT vec_id, label, len(embedding) AS dim,
       ROUND(sqrt({_DOT_SELF}), 6) AS norm
FROM embeddings
"""

_BASE_CTE = f"""
base AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS e,
           sqrt({_DOT_SELF}) AS nrm
    FROM embeddings
)
"""

ORACLES["ann_cosine_topk"] = f"""
WITH {_BASE_CTE},
q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM base
      WHERE vec_id % {ANN_QUERY_MOD} = 0),
pairs AS (
    SELECT q.query_id, c.vec_id,
           ROUND(list_dot_product(q.qe, c.e) / (q.qn * c.nrm), 6) AS cosine
    FROM base c, q WHERE c.vec_id <> q.query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM pairs
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {ANN_TOPK}
"""


def _bucket_sql() -> str:
    parts = [
        f"(CASE WHEN list_dot_product(e, {duck_array_lit(w)}) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, w in enumerate(LSH_PLANE_WEIGHTS)
    ]
    return " + ".join(parts)


ORACLES["embedding_neardup"] = f"""
WITH {_BASE_CTE},
bucketed AS (SELECT *, CAST({_bucket_sql()} AS INTEGER) AS bucket FROM base)
SELECT * FROM (
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) p WHERE cosine >= 0.4
"""

def _kmeans_member_ctes(n_clusters: int, iters: int, src: str = "base") -> str:
    """Unrolled deterministic k-means: the Lloyd loop is a FIXED
    iteration count with a FIXED init (the ``n_clusters`` lowest
    vec_ids), so the "iterative" algorithm is just ``iters`` chained
    CTEs — fully SQL-expressible after all. Per-dimension means are
    cast through FLOAT exactly like the Spark route, which absorbs
    sum-order differences between the engines' AVG implementations;
    assignment ranks round cosine to 9 decimals with centroid-id
    tie-break, identical on both sides. Ends with ``members``
    (vec_id, e, nrm, centroid_id) and ``c{iters}`` (final centroids);
    expects ``src`` (default ``base``) in scope."""
    assign = (
        "SELECT vec_id, e, nrm, centroid_id FROM ("
        "SELECT b.vec_id, b.e, b.nrm, c.centroid_id, "
        "ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY "
        "ROUND(list_dot_product(b.e, c.c) / (b.nrm * c.cn), 9) DESC, "
        "c.centroid_id) AS rk "
        f"FROM {src} b CROSS JOIN {{cents}} c) t WHERE rk = 1"
    )
    ctes = [
        f"""c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id,
               e AS c, nrm AS cn
        FROM {src} ORDER BY vec_id LIMIT {n_clusters})"""
    ]
    for i in range(1, iters + 1):
        ctes.append(f"a{i} AS ({assign.format(cents=f'c{i - 1}')})")
        ctes.append(
            f"""c{i} AS (
            SELECT centroid_id, c, sqrt(list_dot_product(c, c)) AS cn FROM (
                SELECT centroid_id,
                       list(CAST(CAST(m AS FLOAT) AS DOUBLE) ORDER BY dim) AS c
                FROM (
                    SELECT centroid_id, d.dim, AVG(e[d.dim]) AS m
                    FROM a{i}
                    CROSS JOIN UNNEST(generate_series(1, CAST(len(e) AS BIGINT)))
                        AS d(dim)
                    GROUP BY centroid_id, d.dim) s
                GROUP BY centroid_id) t)"""
        )
    ctes.append(f"members AS ({assign.format(cents=f'c{iters}')})")
    return ",\n    ".join(ctes)


def ivf_topk_sql(
    k: int = ANN_LSH_TOPK,
    query_mod: int = ANN_QUERY_MOD,
    n_clusters: int = 16,
    nprobe: int = 2,
    iters: int = 3,
) -> str:
    """IVF search over the unrolled k-means quantizer
    (:func:`_kmeans_member_ctes`)."""
    chain = _kmeans_member_ctes(n_clusters, iters)
    return f"""
    WITH {_BASE_CTE},
    {chain},
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM members
          WHERE vec_id % {query_mod} = 0),
    qprobe AS (
        SELECT query_id, qe, qn, centroid_id FROM (
            SELECT q.query_id, q.qe, q.qn, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       ROUND(list_dot_product(q.qe, c.c) / (q.qn * c.cn), 9) DESC,
                       c.centroid_id) AS rk
            FROM q CROSS JOIN c{iters} c) t WHERE rk <= {nprobe}),
    cand AS (
        SELECT p.query_id, m.vec_id,
               ROUND(list_dot_product(p.qe, m.e) / (p.qn * m.nrm), 6) AS cosine
        FROM qprobe p JOIN members m USING (centroid_id)
        WHERE m.vec_id <> p.query_id),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rank
        FROM cand)
    SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


ORACLES["ann_ivf_topk"] = ivf_topk_sql()


def ivf_list_sizes_sql(n_clusters: int = 16, iters: int = 3) -> str:
    """Posting-list sizes of the deterministic IVF quantizer — the
    :func:`..similarity.index_health` statistic, hash-checked against
    the same unrolled k-means the search oracles chain."""
    chain = _kmeans_member_ctes(n_clusters, iters)
    return f"""
    WITH {_BASE_CTE},
    {chain}
    SELECT centroid_id, COUNT(*) AS list_size
    FROM members GROUP BY centroid_id
    """


ORACLES["ivf_list_sizes"] = ivf_list_sizes_sql()

ORACLES["ann_lsh_topk"] = f"""
WITH {_BASE_CTE},
bucketed AS (SELECT *, CAST({_bucket_sql()} AS INTEGER) AS bucket FROM base),
q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, bucket AS qb FROM bucketed
      WHERE vec_id % {ANN_QUERY_MOD} = 0),
pairs AS (
    SELECT q.query_id, c.vec_id,
           ROUND(list_dot_product(q.qe, c.e) / (q.qn * c.nrm), 6) AS cosine
    FROM bucketed c JOIN q ON c.bucket = q.qb AND c.vec_id <> q.query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM pairs
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {ANN_LSH_TOPK}
"""

from .sampling import mixture_weights_sql, stratified_sample_sql  # noqa: E402

ORACLES["stratified_sample"] = stratified_sample_sql()
ORACLES["mixture_weights"] = mixture_weights_sql()

ORACLES["topk_per_source"] = """
SELECT doc_id, source, n_chars, rank FROM (
    SELECT doc_id, source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rank
    FROM documents
) t WHERE rank <= 5
"""

# df-pruned shingle tf-idf cosine (text.tfidf_cosine_pairs defaults:
# gram=3, max_df=100, min_shared=2, min_cosine=0.35): BIGINT weights
# w = tf * (N // df), exact integer dot/norms, one final rounded
# double division — the same integer-exact convention as
# tfidf_top_terms, so the hash compare has no float-accumulation
# order dependence.
ORACLES["tfidf_cosine_pairs"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
    WHERE len(string_split(text, ' ')) >= 3
),
terms AS (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS term
    FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM terms WHERE term <> '' GROUP BY doc_id, term
),
dfc AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
rare AS (
    SELECT tf.doc_id, tf.term,
           tf.tf * (n.n_docs // dfc.df_docs) AS w
    FROM tf JOIN dfc USING (term), n
    WHERE dfc.df_docs <= 100
),
norms AS (SELECT doc_id, SUM(w * w) AS n2 FROM rare GROUP BY doc_id),
dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           SUM(a.w * b.w) AS dot, COUNT(*) AS shared_terms
    FROM rare a JOIN rare b USING (term)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT d.doc_a, d.doc_b, d.shared_terms,
       ROUND(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.doc_a
JOIN norms nb ON nb.doc_id = d.doc_b
WHERE d.shared_terms >= 2
  AND ROUND(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= 0.35
"""

ORACLES["tfidf_top_terms"] = """
WITH t2 AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM t2 WHERE term <> '' GROUP BY doc_id, term
),
dfc AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, dfc.df_docs,
           (tf.tf * n.n_docs * 1000000) // dfc.df_docs AS score
    FROM tf JOIN dfc USING (term), n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df_docs, score, rank FROM ranked WHERE rank <= 3
"""

ORACLES["contamination"] = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
    WHERE len(string_split(text, ' ')) >= 4
),
grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(t[i:i+3], ' ') AS gram
    FROM toks, unnest(range(1, len(t) - 2)) AS r(i)
),
train AS (SELECT * FROM grams WHERE doc_id % 25 <> 0),
bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id % 25 = 0),
sizes AS (SELECT bench_id, COUNT(*) AS bench_grams FROM bench GROUP BY bench_id)
SELECT t.doc_id, b.bench_id, COUNT(*) AS n_shared, s.bench_grams
FROM train t JOIN bench b USING (gram) JOIN sizes s USING (bench_id)
GROUP BY t.doc_id, b.bench_id, s.bench_grams
"""

# Reconstructs the deterministic fake image codec in pure SQL: the
# mapInPandas route and this query must agree byte-for-byte, proving the
# distributed plumbing (not the codec) is correct.
ORACLES["media_metadata"] = """
SELECT doc_id AS media_id,
       ('0x' || substr(md5(coalesce(text, '')), 1, 4))::BIGINT % 1920 + 1 AS width,
       ('0x' || substr(md5(coalesce(text, '')), 5, 4))::BIGINT % 1080 + 1 AS height,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       md5(coalesce(text, '')) AS content_hash
FROM documents -- coalesce mirrors the Spark route's NULL-payload -> b'' branch
"""

from .curate import curated_corpus_sql  # noqa: E402
from .packing import pack_chunks_sql, packing_stats_sql  # noqa: E402
from .text import (  # noqa: E402
    bigram_logprob_sql,
    inverted_index_sql,
    lm_quality_buckets_sql,
    term_cooccurrence_sql,
    unigram_logprob_sql,
)

ORACLES["lm_quality_buckets"] = lm_quality_buckets_sql()
ORACLES["bigram_logprob"] = bigram_logprob_sql()

ORACLES["unigram_logprob"] = unigram_logprob_sql()
ORACLES["inverted_index"] = inverted_index_sql()
ORACLES["term_cooccurrence"] = term_cooccurrence_sql(max_df_ratio=0.85)

ORACLES["blocklist_filter"] = f"""
WITH quality AS ({ORACLES["quality_score"]}),
bad AS (
    SELECT DISTINCT md5(d.text) AS text_hash
    FROM quality q JOIN documents d USING (doc_id)
    WHERE q.quality_score < 0.45
)
SELECT doc_id, lang, source, n_chars
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM bad b WHERE b.text_hash = md5(d.text))
"""

ORACLES["pack_chunks"] = pack_chunks_sql()
ORACLES["packing_stats"] = packing_stats_sql()
ORACLES["curated_corpus"] = curated_corpus_sql()

from .text import duplicated_spans_sql  # noqa: E402

ORACLES["duplicated_spans"] = duplicated_spans_sql()

ORACLES["semantic_dedup"] = f"""
WITH {_BASE_CTE},
{_kmeans_member_ctes(n_clusters=16, iters=3)}
SELECT * FROM (
    SELECT CAST(a.centroid_id AS BIGINT) AS centroid_id,
           a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM members a JOIN members b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
) p WHERE cosine >= 0.4
"""

from .sketches import per_source_profile_sql, sketch_profile_checked_sql  # noqa: E402

ORACLES["per_source_profile"] = per_source_profile_sql()
ORACLES["sketch_profile"] = sketch_profile_checked_sql()

from .sampling import training_order_sql  # noqa: E402

ORACLES["training_order"] = training_order_sql()

ORACLES["repetition_profile"] = f"""
WITH tok AS (
    SELECT doc_id, length(text) AS n_chars, {_TK} AS tk FROM documents
),
g AS (
    SELECT doc_id, n_chars, 2::BIGINT AS n,
           unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                                 i -> array_to_string(tk[i:i+1], ' '))) AS gram
    FROM tok
    UNION ALL
    SELECT doc_id, n_chars, 3::BIGINT AS n,
           unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                                 i -> array_to_string(tk[i:i+2], ' '))) AS gram
    FROM tok
),
c AS (
    SELECT doc_id, n_chars, n, gram, COUNT(*)::BIGINT AS cnt
    FROM g GROUP BY ALL
),
t AS (
    SELECT doc_id, n_chars, n, max({{'c': cnt, 'g': gram}}) AS top
    FROM c GROUP BY ALL
)
SELECT doc_id, n, top.g AS top_gram, top.c AS n_occurrences,
       ROUND(top.c * length(top.g) / n_chars, 6) AS top_gram_char_frac
FROM t
"""


def _fq(expr: str, dp: int) -> str:
    """Floor-based half-up quantizer for NON-NEGATIVE doubles —
    identical IEEE ops to the Spark side's ``similarity._floor_q``
    (multiply, +0.5, floor, divide), so the two engines can never
    disagree on a half-boundary double the way ROUND does (Java
    BigDecimal shortest-decimal HALF_UP vs DuckDB binary-double)."""
    return f"(FLOOR(({expr}) * 1e{dp} + 0.5) / 1e{dp})"


def _pq_member_ctes(m: int, k: int, iters: int, src: str = "base") -> str:
    """Product-quantization twin of :func:`_kmeans_member_ctes`:
    per-subspace deterministic k-means (init = subvectors of the k
    lowest vec_ids, fixed Lloyd rounds, squared-L2 assignment
    floor-quantized to 9 dp with centroid-id tie-break, per-dim means
    cast through FLOAT). Ends with ``pq_members``
    (vec_id, sub_id, centroid_id, d); expects ``src`` (default
    ``base``) in scope."""
    dsub = f"(len(e) // {m})"
    l2 = (
        "list_sum(list_transform(list_zip(s.se, c.c), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    assign = (
        "SELECT vec_id, sub_id, se, centroid_id, d FROM ("
        "SELECT s.vec_id, s.sub_id, s.se, c.centroid_id, "
        f"{_fq(l2, 9)} AS d, "
        "ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY "
        f"{_fq(l2, 9)} ASC, c.centroid_id) AS rk "
        "FROM sub s JOIN {cents} c USING (sub_id)) t WHERE rk = 1"
    )
    ctes = [
        f"""sub AS (
        SELECT vec_id, CAST(g.sub_id AS INT) AS sub_id,
               list_transform(
                   e[((g.sub_id - 1) * {dsub} + 1):(g.sub_id * {dsub})],
                   x -> CAST(x AS DOUBLE)) AS se
        FROM {src} CROSS JOIN UNNEST(generate_series(1, {m})) g(sub_id))""",
        f"""pc0 AS (
        SELECT sub_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY sub_id ORDER BY vec_id)
                    AS INT) AS centroid_id,
               se AS c
        FROM sub
        WHERE vec_id IN (SELECT vec_id FROM {src} ORDER BY vec_id LIMIT {k}))""",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"pa{i} AS ({assign.format(cents=f'pc{i - 1}')})")
        ctes.append(
            f"""pc{i} AS (
            SELECT sub_id, centroid_id,
                   list(CAST(CAST(m AS FLOAT) AS DOUBLE) ORDER BY dim) AS c
            FROM (
                SELECT sub_id, centroid_id, d.dim, AVG(se[d.dim]) AS m
                FROM pa{i}
                CROSS JOIN UNNEST(generate_series(1, CAST(len(se) AS BIGINT)))
                    AS d(dim)
                GROUP BY sub_id, centroid_id, d.dim) s
            GROUP BY sub_id, centroid_id)"""
        )
    ctes.append(f"pq_members AS ({assign.format(cents=f'pc{iters}')})")
    return ",\n    ".join(ctes)


ORACLES["pq_codes"] = f"""
WITH {_BASE_CTE},
{_pq_member_ctes(m=4, k=16, iters=2)}
SELECT vec_id,
       array_to_string(list(CAST(centroid_id AS VARCHAR) ORDER BY sub_id),
                       ',') AS codes,
       (FLOOR(SUM(d) * 1e6 + 0.5) / 1e6) AS qerr
FROM pq_members
GROUP BY vec_id
"""

ORACLES["pq_topk"] = f"""
WITH {_BASE_CTE},
{_pq_member_ctes(m=4, k=16, iters=2)},
qsub AS (
    SELECT vec_id AS query_id, sub_id, se FROM sub
    WHERE vec_id % {ANN_QUERY_MOD} = 0
),
dtable AS (
    SELECT q.query_id, q.sub_id, c.centroid_id,
           (FLOOR(list_sum(list_transform(list_zip(q.se, c.c),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))) * 1e9 + 0.5) / 1e9) AS qd
    FROM qsub q JOIN pc2 c USING (sub_id)
),
scored AS (
    SELECT d.query_id, m.vec_id, (FLOOR(SUM(d.qd) * 1e6 + 0.5) / 1e6) AS adc_dist
    FROM pq_members m
    JOIN dtable d ON m.sub_id = d.sub_id AND m.centroid_id = d.centroid_id
    WHERE m.vec_id <> d.query_id
    GROUP BY d.query_id, m.vec_id
)
SELECT query_id, vec_id, adc_dist, rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist ASC, vec_id ASC) AS rank
    FROM scored) t
WHERE rank <= {ANN_LSH_TOPK}
"""

ORACLES["pq_rerank_topk"] = f"""
WITH {_BASE_CTE},
{_pq_member_ctes(m=4, k=16, iters=2)},
qsub AS (
    SELECT vec_id AS query_id, sub_id, se FROM sub
    WHERE vec_id % {ANN_QUERY_MOD} = 0
),
dtable AS (
    SELECT q.query_id, q.sub_id, c.centroid_id,
           (FLOOR(list_sum(list_transform(list_zip(q.se, c.c),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))) * 1e9 + 0.5) / 1e9) AS qd
    FROM qsub q JOIN pc2 c USING (sub_id)
),
scored AS (
    SELECT d.query_id, m.vec_id, (FLOOR(SUM(d.qd) * 1e6 + 0.5) / 1e6) AS adc_dist
    FROM pq_members m
    JOIN dtable d ON m.sub_id = d.sub_id AND m.centroid_id = d.centroid_id
    WHERE m.vec_id <> d.query_id
    GROUP BY d.query_id, m.vec_id
),
sl AS (
    SELECT query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc_dist ASC, vec_id ASC) AS rk
        FROM scored) t
    WHERE rk <= 20
),
rr AS (
    SELECT s.query_id, s.vec_id,
           ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
    FROM sl s
    JOIN base c ON c.vec_id = s.vec_id
    JOIN base q ON q.vec_id = s.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM rr) t
WHERE rank <= {ANN_LSH_TOPK}
"""

def ivf_pq_topk_sql(
    k: int = ANN_LSH_TOPK,
    shortlist: int = 20,
    query_mod: int = ANN_QUERY_MOD,
    n_clusters: int = 16,
    nprobe: int = 2,
    ivf_iters: int = 3,
    m: int = 4,
    n_centroids: int = 16,
    pq_iters: int = 2,
    self_exclude: bool = True,
) -> str:
    """Composed IVF×PQ search: chains the unrolled k-means quantizer
    (:func:`_kmeans_member_ctes` — ``members``/``c{ivf_iters}``) and
    the per-subspace PQ codebook (:func:`_pq_member_ctes` —
    ``sub``/``pq_members``/``pc{pq_iters}``; disjoint CTE names), then
    probes nprobe posting lists, ADC-ranks only their members, and
    exact-re-ranks the shortlist — mirroring
    ``similarity.ivf_pq_topk`` stage for stage."""
    kchain = _kmeans_member_ctes(n_clusters, ivf_iters)
    pchain = _pq_member_ctes(m, n_centroids, pq_iters)
    return f"""
    WITH {_BASE_CTE},
    {kchain},
    {pchain},
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM members
          WHERE vec_id % {query_mod} = 0),
    qprobe AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       ROUND(list_dot_product(q.qe, c.c) / (q.qn * c.cn), 9) DESC,
                       c.centroid_id) AS rk
            FROM q CROSS JOIN c{ivf_iters} c) t WHERE rk <= {nprobe}),
    cand AS (
        SELECT p.query_id, mm.vec_id
        FROM qprobe p JOIN members mm USING (centroid_id)
        {"WHERE mm.vec_id <> p.query_id" if self_exclude else ""}),
    qsub AS (
        SELECT vec_id AS query_id, sub_id, se FROM sub
        WHERE vec_id % {query_mod} = 0),
    dtable AS (
        SELECT q.query_id, q.sub_id, c.centroid_id,
               (FLOOR(list_sum(list_transform(list_zip(q.se, c.c),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))) * 1e9 + 0.5) / 1e9) AS qd
        FROM qsub q JOIN pc{pq_iters} c USING (sub_id)),
    scored AS (
        SELECT cd.query_id, cd.vec_id,
               (FLOOR(SUM(d.qd) * 1e6 + 0.5) / 1e6) AS adc_dist
        FROM cand cd
        JOIN pq_members pm ON pm.vec_id = cd.vec_id
        JOIN dtable d ON d.query_id = cd.query_id
                     AND d.sub_id = pm.sub_id
                     AND d.centroid_id = pm.centroid_id
        GROUP BY cd.query_id, cd.vec_id),
    sl AS (
        SELECT query_id, vec_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adc_dist ASC, vec_id ASC) AS rk
            FROM scored) t
        WHERE rk <= {shortlist}),
    rr AS (
        SELECT s.query_id, s.vec_id,
               ROUND(list_dot_product(qb.e, cb.e) / (qb.nrm * cb.nrm), 6) AS cosine
        FROM sl s
        JOIN base cb ON cb.vec_id = s.vec_id
        JOIN base qb ON qb.vec_id = s.query_id)
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id ASC) AS rank
        FROM rr) t
    WHERE rank <= {k}
    """


ORACLES["ivf_pq_topk"] = ivf_pq_topk_sql()
# prefit search = same math, fits merely hoisted out of the call; the
# identical mirror pins "prefit results == fit-inline results" as a
# driver-checked contract, not just a pytest claim.
ORACLES["ivf_pq_topk_prefit"] = ivf_pq_topk_sql()
# external-query serving (ivf_pq_search): identical stages, no
# self-match exclusion — an external query has no self row, and a
# coincident corpus vector is a real exact-dup hit.
ORACLES["ann_serve"] = ivf_pq_topk_sql(self_exclude=False)


def ann_serve_appended_sql(
    k: int = ANN_LSH_TOPK,
    shortlist: int = 20,
    query_mod: int = ANN_QUERY_MOD,
    n_clusters: int = 16,
    nprobe: int = 2,
    ivf_iters: int = 3,
    m: int = 4,
    n_centroids: int = 16,
    pq_iters: int = 2,
    new_mod: int = 10,
    new_rem: int = 3,
) -> str:
    """Serving against an APPENDED index (``similarity.ivf_pq_append``):
    the fit chains run on the ``corpus`` slice only (vec_id % new_mod
    <> new_rem), the held-out ``newv`` slice is assigned to the FROZEN
    final centroids / codebooks with the exact same quantized assign
    expressions the fit's last pass uses, the posting lists and code
    table are unioned, and the ivf_pq_topk search stages run over the
    union with queries drawn from the FULL corpus (no self-exclusion —
    the serve contract)."""
    dsub = f"(len(e) // {m})"
    l2 = (
        "list_sum(list_transform(list_zip(s.se, c.c), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    kchain = _kmeans_member_ctes(n_clusters, ivf_iters, src="corpus")
    pchain = _pq_member_ctes(m, n_centroids, pq_iters, src="corpus")
    return f"""
    WITH {_BASE_CTE},
    corpus AS (SELECT * FROM base WHERE vec_id % {new_mod} <> {new_rem}),
    newv AS (SELECT * FROM base WHERE vec_id % {new_mod} = {new_rem}),
    {kchain},
    {pchain},
    new_members AS (
        SELECT vec_id, e, nrm, centroid_id FROM (
            SELECT b.vec_id, b.e, b.nrm, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
                       ROUND(list_dot_product(b.e, c.c) / (b.nrm * c.cn), 9) DESC,
                       c.centroid_id) AS rk
            FROM newv b CROSS JOIN c{ivf_iters} c) t WHERE rk = 1),
    all_members AS (
        SELECT vec_id, e, nrm, centroid_id FROM members
        UNION ALL
        SELECT vec_id, e, nrm, centroid_id FROM new_members),
    new_sub AS (
        SELECT vec_id, CAST(g.sub_id AS INT) AS sub_id,
               list_transform(
                   e[((g.sub_id - 1) * {dsub} + 1):(g.sub_id * {dsub})],
                   x -> CAST(x AS DOUBLE)) AS se
        FROM newv CROSS JOIN UNNEST(generate_series(1, {m})) g(sub_id)),
    new_codes AS (
        SELECT vec_id, sub_id, centroid_id FROM (
            SELECT s.vec_id, s.sub_id, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY
                       {_fq(l2, 9)} ASC, c.centroid_id) AS rk
            FROM new_sub s JOIN pc{pq_iters} c USING (sub_id)) t WHERE rk = 1),
    all_codes AS (
        SELECT vec_id, sub_id, centroid_id FROM pq_members
        UNION ALL
        SELECT vec_id, sub_id, centroid_id FROM new_codes),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM base
          WHERE vec_id % {query_mod} = 0),
    qprobe AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       ROUND(list_dot_product(q.qe, c.c) / (q.qn * c.cn), 9) DESC,
                       c.centroid_id) AS rk
            FROM q CROSS JOIN c{ivf_iters} c) t WHERE rk <= {nprobe}),
    cand AS (
        SELECT p.query_id, mm.vec_id
        FROM qprobe p JOIN all_members mm USING (centroid_id)),
    qsub AS (
        SELECT b.vec_id AS query_id, CAST(g.sub_id AS INT) AS sub_id,
               list_transform(
                   b.e[((g.sub_id - 1) * {dsub} + 1):(g.sub_id * {dsub})],
                   x -> CAST(x AS DOUBLE)) AS se
        FROM base b CROSS JOIN UNNEST(generate_series(1, {m})) g(sub_id)
        WHERE b.vec_id % {query_mod} = 0),
    dtable AS (
        SELECT q.query_id, q.sub_id, c.centroid_id,
               (FLOOR(list_sum(list_transform(list_zip(q.se, c.c),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))) * 1e9 + 0.5) / 1e9) AS qd
        FROM qsub q JOIN pc{pq_iters} c USING (sub_id)),
    scored AS (
        SELECT cd.query_id, cd.vec_id,
               (FLOOR(SUM(d.qd) * 1e6 + 0.5) / 1e6) AS adc_dist
        FROM cand cd
        JOIN all_codes pm ON pm.vec_id = cd.vec_id
        JOIN dtable d ON d.query_id = cd.query_id
                     AND d.sub_id = pm.sub_id
                     AND d.centroid_id = pm.centroid_id
        GROUP BY cd.query_id, cd.vec_id),
    sl AS (
        SELECT query_id, vec_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adc_dist ASC, vec_id ASC) AS rk
            FROM scored) t
        WHERE rk <= {shortlist}),
    rr AS (
        SELECT s.query_id, s.vec_id,
               ROUND(list_dot_product(qb.e, cb.e) / (qb.nrm * cb.nrm), 6) AS cosine
        FROM sl s
        JOIN base cb ON cb.vec_id = s.vec_id
        JOIN base qb ON qb.vec_id = s.query_id)
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id ASC) AS rank
        FROM rr) t
    WHERE rank <= {k}
    """


ORACLES["ann_serve_appended"] = ann_serve_appended_sql()

ORACLES["encode_token_ids"] = f"""
WITH toks AS (
    SELECT doc_id, u.pos, u.tok FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk) + 1),
                      i -> struct_pack(pos := i, tok := tk[i]))) AS u
        FROM (SELECT doc_id, {_TK} AS tk FROM documents) t) s
),
counts AS (SELECT tok, COUNT(*)::BIGINT AS cnt FROM toks GROUP BY tok),
vocab AS (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS id
    FROM counts
    ORDER BY cnt DESC, tok ASC LIMIT 1000
),
enc AS (
    SELECT t.doc_id, t.pos, COALESCE(v.id, 0)::BIGINT AS id
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT doc_id,
       array_to_string(list(CAST(id AS VARCHAR) ORDER BY pos), ' ') AS token_ids,
       COUNT(*)::BIGINT AS n_tokens,
       SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov
FROM enc GROUP BY doc_id
"""


from .text import dup_span_fraction_sql as _dsf_sql  # noqa: E402
from .similarity import rp_project_sql as _rp_sql  # noqa: E402

ORACLES["dup_span_fraction"] = _dsf_sql()
ORACLES["rp_project"] = _rp_sql()

from .bpe import bpe_vocab_sql as _bpev_sql, bpe_encode_sql as _bpee_sql  # noqa: E402

ORACLES["bpe_vocab"] = _bpev_sql()
ORACLES["bpe_encode"] = _bpee_sql()

# blocklist_filter_bloom is EXACT for every bucket count (false
# positives die in the verify join), so it shares the oracle.
ORACLES["blocklist_filter_bloom"] = ORACLES["blocklist_filter"]

from .bpe import bpe_apply_sql as _bpea_sql, APPLY_MERGES as _APPLY_MERGES  # noqa: E402

ORACLES["bpe_apply"] = _bpea_sql(_APPLY_MERGES)

# incremental_neardup: per-doc signatures are side-independent, so the
# oracle computes bandkeys over the full table and restricts by side.
ORACLES["incremental_neardup"] = f"""
WITH {_minhash_sig_sql()},
{_band_keys_sql()},
cand AS (
    SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
    FROM bandkeys n
    JOIN bandkeys c
      ON n.band = c.band AND n.band_key = c.band_key
    WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 != 0
),
t AS (SELECT doc_id, list_distinct({_TK}) AS toks FROM documents)
SELECT * FROM (
    SELECT cand.new_doc_id, cand.corpus_doc_id,
           ROUND(CAST(len(list_filter(ta.toks, x -> list_contains(tb.toks, x))) AS DOUBLE)
                 / (len(ta.toks) + len(tb.toks)
                    - len(list_filter(ta.toks, x -> list_contains(tb.toks, x)))), 6)
               AS jaccard
    FROM cand
    JOIN t ta ON ta.doc_id = cand.new_doc_id
    JOIN t tb ON tb.doc_id = cand.corpus_doc_id
) v WHERE jaccard >= 0.5
"""

from .text import token_entropy_sql as _te_sql  # noqa: E402

ORACLES["token_entropy"] = _te_sql()


def rp_ivf_topk_sql(
    k: int = ANN_LSH_TOPK,
    query_mod: int = ANN_QUERY_MOD,
    n_clusters: int = 8,
    nprobe: int = 2,
    d_out: int = 8,
    iters: int = 3,
) -> str:
    """RP×IVF: the k-means chain runs over the PROJECTED base (same
    float-cast micro-exact values as Spark's ``_rp_float_embedding``),
    the re-rank over the original vectors."""
    from .similarity import _rp_coef_sql

    coef = _rp_coef_sql("t.i - 1", "j.out_dim")
    chain = _kmeans_member_ctes(n_clusters, iters)
    return f"""
    WITH m AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                        AS BIGINT)) AS micro
        FROM embeddings
    ),
    proj AS (
        SELECT t.vec_id, j.out_dim,
               CAST(SUM(t.v * ({coef})) AS BIGINT) AS s
        FROM (SELECT vec_id, unnest(micro) AS v,
                     generate_subscripts(micro, 1) AS i
              FROM m) t
        CROSS JOIN (SELECT unnest(range({d_out})) AS out_dim) j
        GROUP BY t.vec_id, j.out_dim
    ),
    parr AS (
        SELECT vec_id,
               list(CAST(CAST(s / 1e6 AS FLOAT) AS DOUBLE)
                    ORDER BY out_dim) AS e
        FROM proj GROUP BY vec_id
    ),
    base AS (
        SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM parr
    ),
    {chain},
    orig AS (
        SELECT vec_id, embedding::DOUBLE[] AS oe,
               sqrt({_DOT_SELF}) AS onrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM members
          WHERE vec_id % {query_mod} = 0),
    qprobe AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       ROUND(list_dot_product(q.qe, c.c) / (q.qn * c.cn), 9)
                           DESC,
                       c.centroid_id) AS rk
            FROM q CROSS JOIN c{iters} c) t WHERE rk <= {nprobe}),
    cand AS (
        SELECT p.query_id, m2.vec_id,
               ROUND(list_dot_product(oq.oe, oc.oe) / (oq.onrm * oc.onrm), 6)
                   AS cosine
        FROM qprobe p
        JOIN members m2 USING (centroid_id)
        JOIN orig oq ON oq.vec_id = p.query_id
        JOIN orig oc ON oc.vec_id = m2.vec_id
        WHERE m2.vec_id <> p.query_id),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rank
        FROM cand)
    SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


ORACLES["rp_ivf_topk"] = rp_ivf_topk_sql()

ORACLES["hybrid_neardup"] = f"""
WITH {_minhash_sig_sql()},
{_band_keys_sql()},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM bandkeys a
    JOIN bandkeys b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
t AS (SELECT doc_id, list_distinct({_TK}) AS toks FROM documents),
v AS (
    SELECT * FROM (
        SELECT cand.doc_id_a, cand.doc_id_b,
               ROUND(CAST(len(list_filter(ta.toks, x -> list_contains(tb.toks, x))) AS DOUBLE)
                     / (len(ta.toks) + len(tb.toks)
                        - len(list_filter(ta.toks, x -> list_contains(tb.toks, x)))), 6)
                   AS jaccard
        FROM cand
        JOIN t ta ON ta.doc_id = cand.doc_id_a
        JOIN t tb ON tb.doc_id = cand.doc_id_b
    ) p WHERE jaccard >= 0.2
),
e AS (
    SELECT vec_id, embedding::DOUBLE[] AS ee,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
    FROM embeddings
)
SELECT v.doc_id_a, v.doc_id_b, v.jaccard,
       ROUND(list_dot_product(a.ee, b.ee) / (a.nrm * b.nrm), 6) AS cosine,
       ROUND(list_dot_product(a.ee, b.ee) / (a.nrm * b.nrm), 6) >= 0.2
           AS semantic_match
FROM v
JOIN e a ON a.vec_id = v.doc_id_a
JOIN e b ON b.vec_id = v.doc_id_b
"""

# canonical_corpus composes the dedup_clusters transitive closure with
# a per-cluster keeper rank; built by extending the recursive oracle's
# CTE chain (the final SELECT becomes a CTE).
_DC = ORACLES["dedup_clusters"].rstrip()
_DC_PREFIX = _DC.rsplit("SELECT src AS doc_id", 1)[0].rstrip()
assert _DC_PREFIX.endswith(")"), "dedup_clusters oracle shape changed"
ORACLES["canonical_corpus"] = _DC_PREFIX + """,
clusters AS (
    SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
),
scored AS (
    SELECT d.doc_id, c.cluster_id, d.lang, d.source, d.n_chars,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY d.n_chars DESC, d.doc_id ASC) AS _rk
    FROM documents d JOIN clusters c USING (doc_id)
)
SELECT doc_id, cluster_id, lang, source, n_chars
FROM scored WHERE _rk = 1
"""

from .similarity import prototype_outliers_sql as _proto_sql  # noqa: E402

ORACLES["prototype_outliers"] = _proto_sql()

from .sampling import temperature_weights_sql as _tw_sql  # noqa: E402

ORACLES["temperature_weights"] = _tw_sql()

# --- round 6 additions -----------------------------------------------------

ORACLES["levenshtein_neardup"] = f"""
WITH {_minhash_sig_sql()},
{_band_keys_sql()},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM bandkeys a
    JOIN bandkeys b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
v AS (
    SELECT cand.doc_id_a, cand.doc_id_b,
           CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev_dist,
           ROUND(CAST(levenshtein(ta.text, tb.text) AS DOUBLE)
                 / GREATEST(length(ta.text), length(tb.text)), 6) AS rel_dist
    FROM cand
    JOIN documents ta ON ta.doc_id = cand.doc_id_a
    JOIN documents tb ON tb.doc_id = cand.doc_id_b
)
SELECT * FROM v WHERE rel_dist <= 0.5
"""

from .packing import chunk_overlap_sql as _chunk_overlap_sql  # noqa: E402

ORACLES["chunk_overlap"] = _chunk_overlap_sql()

_SQ8_SCALES_CTE = """
sqbase AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sqdims AS (
    SELECT vec_id, unnest(e) AS x, generate_subscripts(e, 1) AS dim
    FROM sqbase
),
sqscale AS (SELECT dim, MAX(ABS(x)) AS s FROM sqdims GROUP BY dim),
sqarr AS (SELECT list(s ORDER BY dim) AS ss FROM sqscale),
sqcoded AS (
    SELECT vec_id, e,
           list_transform(range(1, len(e) + 1),
               i -> CAST(GREATEST(-127, LEAST(127,
                    CASE WHEN ss[i] = 0 THEN 0
                         ELSE floor(e[i] * 127 / ss[i] + 0.5) END)) AS INT))
               AS codes,
           ss
    FROM sqbase CROSS JOIN sqarr
)
"""

ORACLES["sq8_codes"] = f"""
WITH {_SQ8_SCALES_CTE}
SELECT vec_id,
       CAST(generate_subscripts(codes, 1) - 1 AS INT) AS dim,
       unnest(codes) AS code
FROM sqcoded
"""

ORACLES["sq8_topk"] = f"""
WITH {_SQ8_SCALES_CTE},
xh AS (
    SELECT vec_id,
           list_transform(range(1, len(codes) + 1),
               i -> CAST(codes[i] AS DOUBLE) * ss[i] / 127) AS xhat
    FROM sqcoded
),
cn AS (
    SELECT vec_id, xhat,
           sqrt(list_dot_product(xhat, xhat)) AS cnrm
    FROM xh
),
q AS (
    SELECT vec_id AS query_id, e AS qe,
           sqrt(list_dot_product(e, e)) AS qn
    FROM sqbase WHERE vec_id % {ANN_QUERY_MOD} = 0
),
pairs AS (
    SELECT q.query_id, c.vec_id,
           ROUND(list_dot_product(q.qe, c.xhat) / (q.qn * c.cnrm), 6) AS cosine
    FROM cn c, q WHERE c.vec_id <> q.query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM pairs
)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {ANN_LSH_TOPK}
"""

from .text import remove_dup_spans_sql as _rds_sql  # noqa: E402

ORACLES["remove_dup_spans"] = _rds_sql()

# candidates come from shared winnowed fingerprints (NOT MinHash —
# resemblance-banded LSH never surfaces low-Jaccard subset pairs); the
# fp CTE is the doc_fingerprints oracle inlined as a subquery.
ORACLES["containment_pairs"] = f"""
WITH fp AS ({ORACLES["doc_fingerprints"]}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM fp a
    JOIN fp b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
),
t AS (SELECT doc_id, list_distinct({_TK}) AS toks FROM documents),
v AS (
    SELECT cand.doc_id_a, cand.doc_id_b,
           ROUND(CAST(len(list_filter(ta.toks, x -> list_contains(tb.toks, x)))
                      AS DOUBLE) / len(ta.toks), 6) AS containment_a,
           ROUND(CAST(len(list_filter(ta.toks, x -> list_contains(tb.toks, x)))
                      AS DOUBLE) / len(tb.toks), 6) AS containment_b
    FROM cand
    JOIN t ta ON ta.doc_id = cand.doc_id_a
    JOIN t tb ON tb.doc_id = cand.doc_id_b
)
SELECT * FROM v WHERE GREATEST(containment_a, containment_b) >= 0.5
"""

from .sampling import leakage_safe_split_sql as _lss_sql  # noqa: E402

ORACLES["leakage_safe_split"] = _lss_sql(ORACLES["dedup_clusters"])

from .text import quality_prune_sql as _qp_sql  # noqa: E402

ORACLES["quality_prune"] = _qp_sql(ORACLES["quality_score"])


def ivf_sq8_topk_sql(
    k: int = ANN_LSH_TOPK,
    query_mod: int = ANN_QUERY_MOD,
    n_clusters: int = 16,
    nprobe: int = 2,
    iters: int = 3,
) -> str:
    """IVF posting-list restriction + SQ8-reconstructed in-list scoring:
    the unrolled-Lloyd quantizer CTEs chained with the scalar-quantizer
    CTEs — mirrors ``similarity.ivf_sq8_topk`` stage for stage."""
    chain = _kmeans_member_ctes(n_clusters, iters)
    code = (
        "CAST(GREATEST(-127, LEAST(127, CASE WHEN ss[i] = 0 THEN 0 "
        "ELSE floor(e[i] * 127 / ss[i] + 0.5) END)) AS INT)"
    )
    return f"""
    WITH {_BASE_CTE},
    {chain},
    sqdims AS (
        SELECT vec_id, unnest(e) AS x, generate_subscripts(e, 1) AS dim
        FROM base
    ),
    sqscale AS (SELECT dim, MAX(ABS(x)) AS s FROM sqdims GROUP BY dim),
    sqarr AS (SELECT list(s ORDER BY dim) AS ss FROM sqscale),
    xh AS (
        SELECT vec_id,
               list_transform(range(1, len(e) + 1),
                   i -> CAST({code} AS DOUBLE) * ss[i] / 127) AS xhat
        FROM base CROSS JOIN sqarr
    ),
    cn AS (
        SELECT vec_id, xhat, sqrt(list_dot_product(xhat, xhat)) AS cnrm
        FROM xh
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM members
          WHERE vec_id % {query_mod} = 0),
    qprobe AS (
        SELECT query_id, qe, qn, centroid_id FROM (
            SELECT q.query_id, q.qe, q.qn, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       ROUND(list_dot_product(q.qe, c.c) / (q.qn * c.cn), 9) DESC,
                       c.centroid_id) AS rk
            FROM q CROSS JOIN c{iters} c) t WHERE rk <= {nprobe}),
    cand AS (
        SELECT p.query_id, m.vec_id, p.qe, p.qn
        FROM qprobe p JOIN members m USING (centroid_id)
        WHERE m.vec_id <> p.query_id),
    scored AS (
        SELECT c.query_id, c.vec_id,
               ROUND(list_dot_product(c.qe, x.xhat) / (c.qn * x.cnrm), 6)
                   AS cosine
        FROM cand c JOIN cn x USING (vec_id)),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rank
        FROM scored)
    SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


ORACLES["ivf_sq8_topk"] = ivf_sq8_topk_sql()

from .curate import training_corpus_manifest_sql as _tcm_sql  # noqa: E402
from .sampling import HASH_MULTIPLIER as _HM  # noqa: E402

ORACLES["training_corpus_manifest"] = _tcm_sql(
    ORACLES["canonical_corpus"], ORACLES["quality_score"], _HM
)

from .dedup import dedup_report_sql as _dr_sql  # noqa: E402

ORACLES["dedup_report"] = _dr_sql(ORACLES["dedup_clusters"])

from .text import vocab_coverage_sql as _vc_sql  # noqa: E402

ORACLES["vocab_coverage"] = _vc_sql()


# Audio/video twins of the media_metadata oracle: each reconstructs its
# deterministic fake codec in pure SQL so the kind-specific mapInPandas
# routes (distinct schemas and UDF signatures) are hash-verified
# end-to-end, exactly like the image path.
ORACLES["audio_metadata"] = """
SELECT doc_id AS media_id,
       octet_length(encode(coalesce(text, ''))) / 16000.0 AS duration_s,
       16000 AS sample_rate,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       md5(coalesce(text, '')) AS content_hash
FROM documents
"""

ORACLES["video_metadata"] = """
SELECT doc_id AS media_id,
       ('0x' || substr(md5(coalesce(text, '')), 1, 4))::BIGINT % 3600 / 10.0 AS duration_s,
       ('0x' || substr(md5(coalesce(text, '')), 5, 2))::BIGINT % 4 + 1 AS n_tracks,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       md5(coalesce(text, '')) AS content_hash
FROM documents
"""

# candidates-tier tf-idf (text.tfidf_verify on dedup.minhash_pairs
# candidates): the minhash band-bucket CTEs feed a pair-restricted
# version of the tfidf_cosine_pairs dot stage — weights/df/N still
# computed over the FULL corpus, so every surviving score equals the
# full op's row for that pair.
ORACLES["tfidf_verify"] = f"""
WITH {_minhash_sig_sql()},
{_band_keys_sql()},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bandkeys a
    JOIN bandkeys b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
    WHERE len(string_split(text, ' ')) >= 3
),
vterms AS (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS term
    FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
),
vtf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM vterms WHERE term <> '' GROUP BY doc_id, term
),
vdfc AS (SELECT term, COUNT(*) AS df_docs FROM vtf GROUP BY term),
vn AS (SELECT COUNT(*) AS n_docs FROM documents),
vrare AS (
    SELECT vtf.doc_id, vtf.term,
           vtf.tf * (vn.n_docs // vdfc.df_docs) AS w
    FROM vtf JOIN vdfc USING (term), vn
    WHERE vdfc.df_docs <= 100
),
vnorms AS (SELECT doc_id, SUM(w * w) AS n2 FROM vrare GROUP BY doc_id),
vdots AS (
    SELECT c.doc_a, c.doc_b,
           SUM(a.w * b.w) AS dot, COUNT(*) AS shared_terms
    FROM cand c
    JOIN vrare a ON a.doc_id = c.doc_a
    JOIN vrare b ON b.doc_id = c.doc_b AND b.term = a.term
    GROUP BY c.doc_a, c.doc_b
)
SELECT d.doc_a, d.doc_b, d.shared_terms,
       ROUND(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
FROM vdots d
JOIN vnorms na ON na.doc_id = d.doc_a
JOIN vnorms nb ON nb.doc_id = d.doc_b
WHERE d.shared_terms >= 2
  AND ROUND(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= 0.35
"""

# scoped span-cut: the full remove_dup_spans oracle restricted to the
# query's deterministic scope — dup-gram stats stay corpus-global in
# both engines, so the wrapper filter IS the scoped semantics.
ORACLES["dup_spans_scoped"] = (
    f"SELECT * FROM ({_rds_sql()}) WHERE doc_id % 4 = 0"
)

# prefit stats change WHERE the dup-gram frame comes from, never a
# value — the amortized entry shares the scoped oracle verbatim.
ORACLES["dup_spans_scoped_prefit"] = ORACLES["dup_spans_scoped"]

# DSIR importance resampling: quantized-log / exact-BIGINT-sum mirror
# generated from the same params as the Spark plan.
from .sampling import dsir_logweights_sql, dsir_resample_sql  # noqa: E402

ORACLES["dsir_weights"] = dsir_logweights_sql()
ORACLES["dsir_sample"] = dsir_resample_sql()

# prefit model changes WHERE the log-ratio frame comes from, never a
# value — the amortized entry shares the inline oracle verbatim.
ORACLES["dsir_weights_prefit"] = ORACLES["dsir_weights"]

# DSIR over the curated pool: the curated_corpus oracle becomes the
# fit+score relation via the parameterized core chain.
from .curate import curated_corpus_sql as _ccs  # noqa: E402

ORACLES["dsir_curated_sample"] = dsir_resample_sql(
    rel="dsir_pool",
    prelude=(
        f"curated AS ({_ccs()}), "
        "dsir_pool AS (SELECT d.* FROM documents d "
        "JOIN curated USING (doc_id)), "
    ),
)

# warc_roundtrip: the Spark side encodes documents into WARC blobs and
# parses them back, so the oracle is the identity projection — any
# encoder/parser defect (octets-vs-chars Content-Length, boundary
# scanning, header loss) breaks the value hash.
ORACLES["warc_roundtrip"] = """
SELECT doc_id, text, lang, source FROM documents
"""

# incremental_manifest (round 13): the oracle is the FULL manifest
# rebuild on the diffed snapshot. A CTE named `documents` cannot
# reference the `documents` view inside its own body (DuckDB binds
# that as a circular CTE self-reference), so the snapshot CTE is
# named `snap` and every `documents` table reference inside the
# chained training_corpus_manifest mirror is token-rewritten to it —
# the generated SQL uses `documents` only as the table name, asserted
# below. Equality with this oracle is exactly the
# incremental-equals-rebuild contract.
_SNAP_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 10 = 1 THEN text || ' v2' ELSE text END AS text,
       lang, source, n_chars
FROM documents WHERE doc_id % 10 != 0
UNION ALL
SELECT doc_id + 1000000000 AS doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id % 10 = 2
"""
_TCM_PREFIX = "\n    WITH canon AS ("
assert ORACLES["training_corpus_manifest"].startswith(_TCM_PREFIX), (
    "training_corpus_manifest oracle shape changed"
)
import re as _re  # noqa: E402

_TCM_ON_SNAP = _re.sub(
    r"\bdocuments\b", "snap", ORACLES["training_corpus_manifest"]
)
assert "documents" not in _TCM_ON_SNAP
ORACLES["incremental_manifest"] = _TCM_ON_SNAP.replace(
    "\n    WITH canon AS (",
    f"\n    WITH snap AS ({_SNAP_SQL}),\n    canon AS (",
    1,
)

# warc_extract_text: encode→parse→HTTP-split→HTML-extract is the
# identity up to whitespace normalization (the extractor's contract:
# runs → one space, stripped — the template's block separators wash
# out), plus the deterministic provenance URL the encoder writes as
# WARC-Target-URI (warc.doc_url / warc.CRAWL_URL_PREFIX, mirrored
# verbatim here).
ORACLES["warc_extract_text"] = """
SELECT doc_id,
       'https://crawl.example/' || source || '/' || CAST(doc_id AS VARCHAR)
           AS url,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text,
       lang, source
FROM documents
"""

# URL curation ops (round 13): the canonicalization contract is
# implemented twice by design (Spark Column expressions vs the DuckDB
# expression from urls.canonical_url_sql); the messy-URL fabric is
# mirrored verbatim. Grid-equality of the two canonicalizers is
# additionally pinned in tests/test_urls.py.
from .urls import canonical_url_sql, domain_caps_sql, synth_urls_sql  # noqa: E402

ORACLES["url_canonicalize"] = f"""
WITH u AS ({synth_urls_sql()})
SELECT doc_id, url, {canonical_url_sql("url")} AS canonical_url FROM u
"""

ORACLES["url_dedup"] = f"""
WITH u AS ({synth_urls_sql()})
SELECT {canonical_url_sql("url")} AS canonical_url,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*)::BIGINT AS n_copies
FROM u GROUP BY 1
"""

ORACLES["domain_caps"] = domain_caps_sql(
    synth_urls_sql(), ORACLES["quality_score"], max_per_domain=100
)

# crawl_corpus (round 13): the full crawl→corpus composition. The
# post-extraction snapshot is reconstructed the warc_extract_text way
# (whitespace-normalized identity) for the originals PLUS a re-keyed
# mirror copy; the URL fabric matches the query's encoder expression;
# the quality/gopher oracles are token-rewritten onto the URL-dedup
# survivors (`kept_docs`, the incremental_manifest shadowing idiom).
from .crawl import crawl_curated_corpus_sql  # noqa: E402

_CRAWL_SNAP = """
SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text,
       lang, source
FROM documents
UNION ALL
SELECT doc_id + 2000000000 AS doc_id,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text, lang, source
FROM documents
"""
_CRAWL_URLS = """
SELECT doc_id,
       'https://' || source || '.crawl.example/doc/'
       || CAST(doc_id % 2000000000 AS VARCHAR)
       || CASE WHEN doc_id >= 2000000000
               THEN '?utm_source=mirror&gclid=x' ELSE '' END AS url
FROM snap
"""
_Q_ON_KEPT = _re.sub(r"\bdocuments\b", "kept_docs", ORACLES["quality_score"])
_G_ON_KEPT = _re.sub(r"\bdocuments\b", "kept_docs", ORACLES["gopher_quality"])
assert "documents" not in _Q_ON_KEPT and "documents" not in _G_ON_KEPT
ORACLES["crawl_corpus"] = crawl_curated_corpus_sql(
    _CRAWL_SNAP, _CRAWL_URLS, _Q_ON_KEPT, _G_ON_KEPT, max_per_domain=8
)

# corpus_diff: the same deterministic next-snapshot construction, with
# the same md5-projection full-outer-join classification. DuckDB's
# md5(text) hashes the UTF-8 bytes, matching Spark's
# md5(encode(text,'utf-8')).
ORACLES["corpus_diff"] = """
WITH old AS (SELECT doc_id, text FROM documents),
new AS (
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 1 THEN text || ' v2' ELSE text END AS text
    FROM documents WHERE doc_id % 10 != 0
    UNION ALL
    SELECT doc_id + 1000000000 AS doc_id, text
    FROM documents WHERE doc_id % 10 = 2
),
j AS (
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           o.doc_id IS NOT NULL AS in_old,
           n.doc_id IS NOT NULL AS in_new,
           md5(o.text) AS oh, md5(n.text) AS nh
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            WHEN oh IS DISTINCT FROM nh THEN 'modified' END AS change
FROM j
WHERE (NOT in_old OR NOT in_new OR oh IS DISTINCT FROM nh)
"""

# bpe_roundtrip: decode(apply(corpus)) is the identity wherever base
# tokens contain no '+' (the harness corpus) — the oracle is the
# plain projection.
ORACLES["bpe_roundtrip"] = """
SELECT doc_id, text FROM documents
"""
