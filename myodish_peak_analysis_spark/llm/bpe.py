"""Distributed BPE-style pair-merge training over the corpus.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units" — public) trains a tokenizer by
repeatedly (1) counting adjacent symbol pairs corpus-wide, (2) picking
the most frequent pair, (3) merging its occurrences left-to-right.
Here the atoms are the harness corpus's whitespace tokens (the corpus
is synthetic words; on real data the same operators run over
character/byte atoms — only the initial split changes), and a merged
pair is written ``left+right``.

Spark shape (100 TB):

* Pair counting is one explode into (l, r) key pairs — rows carry two
  tokens, never the document — followed by a map-side-combinable
  count and a 1-row ``orderBy().limit(1)`` (distributed TakeOrdered).
  One driver action per merge round, exactly the Lloyd-iteration
  pattern of the IVF/PQ fits.
* Merge application is a per-row ``aggregate`` HOF fold (left-to-right,
  non-overlapping, pending-token accumulator) inside whole-stage
  codegen — no UDF, no shuffle.
* The evolving token-array frame is persisted per round and the
  previous round unpersisted after materialization, so round R+1 never
  recomputes rounds 1..R. Cache lifetime follows the PQ-fit contract
  (see ``queries.py`` module docstring): the FINAL frame stays
  persisted for the caller; ``spark.catalog.clearCache()`` releases it.

Determinism: ties on pair count break to the lexicographically
smallest (left, right) — byte-wise ASCII comparison, identical in
Spark and DuckDB.

The DuckDB oracle mirrors each round with a string-level apply: with
every inter-token gap doubled (``' '→'  '``), non-overlapping global
``replace(' l  r ', ' l+r ')`` is exactly the left-to-right BPE merge
(adjacent matches no longer share a delimiter space), then spacing is
re-normalized. ``tests/test_r5_ops.py`` pins the fold against that
string model on adversarial repeats ("a a a").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

BPE_MERGES = 4

#: Default non-interfering merges learned per driver round (round 13,
#: VERDICT r12 ask #5): the MEASURED production posture — batched
#: training at 16 rules read 3.62 s vs classic 9.18 s on the r12 bench
#: with identical output on the fixture (tests/test_r6_ops.py). Classic
#: BPE stays one flag away (``batch_merges=1``) and remains what the
#: oracle-checked registry queries pin, because batching CAN pick a
#: different (equally-frequent-at-recount-time) rule set on corpora
#: where consecutive top pairs interfere — see
#: :func:`_select_noninterfering` for the exact divergence semantics.
BATCH_MERGES = 4


def _sq(s: str) -> str:
    """Escape a token for embedding in a single-quoted SQL literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _pairs_expr(toks: str) -> str:
    """Adjacent (l, r) pairs of a token array; empty for <2 tokens
    (guarded — Spark's sequence(1, 0) would count DOWN, not empty)."""
    return (
        f"CASE WHEN size({toks}) >= 2 THEN "
        f"transform(sequence(1, size({toks}) - 1), "
        f"i -> struct({toks}[i - 1] AS l, {toks}[i] AS r)) "
        f"ELSE array() END"
    )


def _merge_apply_expr(toks: str, left: str, right: str) -> str:
    """Left-to-right non-overlapping merge of (left, right) → left+right
    as a single fold: the accumulator holds the pending previous token;
    a (pending=left, current=right) hit emits the merged token and
    clears the pending slot so the merged token can never re-pair
    within the same round."""
    l, r = _sq(left), _sq(right)
    m = _sq(left + "+" + right)
    empty = "named_struct('out', CAST(array() AS ARRAY<STRING>), 'pend', CAST(NULL AS STRING))"
    return (
        f"aggregate({toks}, {empty}, (acc, x) -> "
        f"CASE WHEN acc.pend = '{l}' AND x = '{r}' THEN "
        f"named_struct('out', array_append(acc.out, '{m}'), "
        f"'pend', CAST(NULL AS STRING)) "
        f"WHEN acc.pend IS NULL THEN named_struct('out', acc.out, 'pend', x) "
        f"ELSE named_struct('out', array_append(acc.out, acc.pend), 'pend', x) END, "
        f"acc -> CASE WHEN acc.pend IS NULL THEN acc.out "
        f"ELSE array_append(acc.out, acc.pend) END)"
    )


#: Truncate the token-frame lineage every this many merge rounds. Each
#: round stacks one fold-projection on the plan; by round ~32k (a
#: production vocab) analysis cost alone would dominate. The eager
#: localCheckpoint materializes the current frame as executor blocks
#: and cuts every upstream round — the exact lesson dedup_clusters'
#: iterative label-prop taught in round 5 (cluster deployments: point
#: spark.checkpoint.dir at durable storage and use reliable
#: .checkpoint() instead, see dedup.py).
CHECKPOINT_EVERY = 8


def _select_noninterfering(rows, budget: int) -> list[tuple[str, str, int]]:
    """Greedy batch selection in (count DESC, l, r) order: take a pair
    only if NEITHER of its tokens appears in an already-selected pair
    of this batch. Disjoint pairs' left-to-right merges commute, and a
    disjoint merge cannot change another batch member's pair count —
    so applying the whole batch as chained folds in one projection
    equals applying those same rules in separate classic rounds.
    Interfering pairs are deferred to the next recount. The MERGED
    output token of each selected pair (``l+'+'+r``) is also marked
    used: if that token string already exists in the corpus (from an
    earlier round's merge), applying (l, r) mints new copies of it, so
    any candidate touching it has a stale count and must wait for the
    recount. The one remaining divergence from classic BPE is
    deliberate and inherent to batching: a pair CREATED by an earlier
    batch member (involving its merged token) cannot be picked until
    the next recount, whereas classic BPE could pick it immediately —
    rule SETS can therefore differ when fresh merged-token pairs would
    outrank pre-merge pairs; the batch=1 default has no such
    divergence."""
    out: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for row in rows:
        l, r = row["l"], row["r"]
        merged = l + "+" + r
        if l in used or r in used or merged in used:
            continue
        out.append((l, r, int(row["n"])))
        used.update((l, r, merged))
        if len(out) >= budget:
            break
    return out


def _bpe_run(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    checkpoint_every: int = CHECKPOINT_EVERY,
    batch_merges: int = 1,
    stats: dict | None = None,
    materialize_final: bool = True,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run merge rounds until ``n_merges`` rules are learned; returns
    (merge rules, final token frame). The final frame remains persisted
    (see module docstring). ``stats``, if given, receives
    ``{"rounds": <driver rounds taken>}`` — the cost-curve tooling
    reads it to report effective rules/round.

    ``batch_merges=B`` learns up to B NON-INTERFERING rules per driver
    round (see :func:`_select_noninterfering`) — driver actions drop
    from O(n_merges) to O(n_merges / B), the production answer to the
    trainer's round-trip cost at 32k-vocab scale (the same batching
    idea as Hugging Face tokenizers' batched BPE trainer, public).
    B=1 is exactly classic BPE."""
    cur = docs.selectExpr("doc_id", "split(text, ' ') AS toks").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    merges: list[tuple[str, str, int]] = []
    rnd = 0
    # Round fusion (optimization round 14): the per-round frame is
    # persisted LAZILY and materialized by the NEXT round's top-pair
    # collect — which consumes it exactly once, so the persist fills
    # with no sibling-stage race — instead of paying a separate eager
    # count per round. The superseded frame is released only AFTER its
    # successor materialized (it is the successor's input), so nothing
    # recomputes; `prev` holds that one-generation window. Saves one
    # driver action per merge round; lineage-truncation rounds keep the
    # same lazy pattern via localCheckpoint(eager=False).
    prev: DataFrame | None = None
    cur_cold = False  # True while `cur` is persist-marked but unmaterialized
    while len(merges) < n_merges:
        rnd += 1
        budget = min(batch_merges, n_merges - len(merges))
        pairs = cur.select(
            F.explode(F.expr(_pairs_expr("toks"))).alias("p")
        ).select("p.l", "p.r")
        # over-fetch 4x: interfering candidates are skipped, deferred
        # to the next recount
        top = (
            pairs.groupBy("l", "r")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(max(budget * 4, 1))
            .collect()
        )
        cur_cold = False  # the collect materialized cur's persist
        if prev is not None:
            prev.unpersist()
            prev = None
        batch = _select_noninterfering(top, budget)
        if not batch:
            break
        merges.extend(batch)
        expr = "toks"
        for l, r, _ in batch:
            expr = _merge_apply_expr(expr, l, r)
        nxt = cur.selectExpr("doc_id", expr + " AS toks")
        if checkpoint_every and rnd % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=False)
        else:
            nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
        prev = cur
        cur = nxt
        cur_cold = True
    if cur_cold:
        # the loop exited right after building a frame no collect ever
        # touched (merge budget reached): materialize it now — the
        # returned frame stays persisted AND warm for the caller (the
        # multi-consumer contract every eager pin in this package
        # follows), and the input generation can then be released.
        # Callers that only want the RULES pass materialize_final=False
        # and unpersist the frame unread — no job is spent on it, and
        # releasing `prev` stays safe: dropping persisted blocks keeps
        # the lineage valid (and is a no-op on checkpointed frames), so
        # the never-read lazy frame could still recompute if someone
        # did read it.
        if materialize_final:
            cur.count()
        if prev is not None:
            prev.unpersist()
    if stats is not None:
        stats["rounds"] = rnd
    return merges, cur


def bpe_vocab(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    fit_sample_mod: int | None = None,
    batch_merges: int = BATCH_MERGES,
) -> DataFrame:
    """The learned merge table: (merge_rank, left_tok, right_tok,
    n_pairs) — n_pairs is the corpus-wide adjacent-pair count at the
    time the rule was selected. Tiny (n_merges rows), re-emitted as a
    driver-literal frame like the k-means centroid tables.

    ``fit_sample_mod=m`` trains on the deterministic 1/m corpus sample
    ``doc_id % m == 0`` — the same sample-fit knob the IVF/PQ fits
    carry. Pair frequencies are corpus-scale statistics, so the ranked
    merge rules are stable under uniform sampling (pinned by
    tests/test_r6_ops.py on the fixture corpus); at a production 32k
    vocab this turns every per-round action into sample-sized work.
    n_pairs then counts the SAMPLE's occurrences (scale by ~m for a
    corpus estimate).

    ``batch_merges=B`` learns up to B non-interfering rules per driver
    round (classic at B=1; see :func:`_select_noninterfering` for the
    exact batching semantics) — the knob that takes driver round-trips
    from O(n_merges) to O(n_merges/B) at production vocab sizes. The
    DEFAULT is the measured batched posture (round 13); pass
    ``batch_merges=1`` for classic-BPE-exact rule selection."""
    spark = SparkSession.getActiveSession() or docs.sparkSession
    fit = (
        docs.filter(F.col("doc_id") % fit_sample_mod == 0)
        if fit_sample_mod
        else docs
    )
    merges, final = _bpe_run(
        fit, n_merges, batch_merges=batch_merges, materialize_final=False
    )
    final.unpersist()
    return spark.createDataFrame(
        [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "merge_rank long, left_tok string, right_tok string, n_pairs long",
    )


def bpe_encode(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    fit_sample_mod: int | None = None,
    batch_merges: int = BATCH_MERGES,
) -> DataFrame:
    """The corpus re-tokenized under the learned merges: (doc_id,
    text_bpe, n_tokens). ``n_tokens`` shrinks by exactly the number of
    merge hits — the compression the tokenizer buys.

    With ``fit_sample_mod``, the merge rules are learned on the 1/m
    sample and applied to the FULL corpus through the zero-exchange
    serving fold (:func:`bpe_apply`) — the production train/serve
    split in one call."""
    if fit_sample_mod:
        merges, final = _bpe_run(
            docs.filter(F.col("doc_id") % fit_sample_mod == 0),
            n_merges,
            batch_merges=batch_merges,
            materialize_final=False,
        )
        final.unpersist()
        return bpe_apply(docs, [(l, r) for l, r, _ in merges])
    _, final = _bpe_run(docs, n_merges, batch_merges=batch_merges)
    return final.select(
        "doc_id",
        F.concat_ws(" ", "toks").alias("text_bpe"),
        F.size("toks").cast("long").alias("n_tokens"),
    )


def _round_ctes(n_merges: int) -> str:
    """Chained per-round CTEs: cN counts pairs of rN-1, bN picks the
    top pair, rN applies it with the doubled-space string replace."""
    tk = "string_split(txt, ' ')"
    parts = ["r0 AS (SELECT doc_id, text AS txt FROM documents)"]
    for i in range(1, n_merges + 1):
        prev = f"r{i - 1}"
        parts.append(
            f"""c{i} AS (
        SELECT pr.l AS l, pr.r AS r, COUNT(*)::BIGINT AS n
        FROM (SELECT unnest(list_transform(range(1, len({tk})),
                     i -> {{'l': {tk}[i], 'r': {tk}[i + 1]}})) AS pr
              FROM {prev}) t
        GROUP BY pr.l, pr.r)"""
        )
        parts.append(
            f"""b{i} AS (
        SELECT l, r, n FROM c{i} ORDER BY n DESC, l ASC, r ASC LIMIT 1)"""
        )
        # COALESCE to a chr(1) sentinel: when a round has NO remaining
        # pairs, b{i} is empty and the bare scalar subqueries would be
        # NULL — replace(txt, NULL, NULL) = NULL would WIPE every doc
        # while the Spark loop just breaks. The sentinel pattern
        # ' \\x01  \\x01 ' can never occur in the doubled text (tokens
        # never contain control chars), so the round becomes the
        # identity double-space round-trip, matching Spark's break.
        parts.append(
            f"""r{i} AS (
        SELECT doc_id,
               trim(regexp_replace(
                   replace(' ' || replace(txt, ' ', '  ') || ' ',
                           ' ' || COALESCE((SELECT l FROM b{i}), chr(1))
                               || '  '
                               || COALESCE((SELECT r FROM b{i}), chr(1))
                               || ' ',
                           ' ' || COALESCE((SELECT l FROM b{i}), chr(1))
                               || '+'
                               || COALESCE((SELECT r FROM b{i}), chr(1))
                               || ' '),
                   ' +', ' ', 'g')) AS txt
        FROM {prev})"""
        )
    return ",\n    ".join(parts)


def bpe_vocab_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB mirror of :func:`bpe_vocab` — same rounds, same
    (count DESC, l, r) tie-break, string-replace apply."""
    selects = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, l AS left_tok, "
        f"r AS right_tok, n AS n_pairs FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {_round_ctes(n_merges)}
    {selects}
    ORDER BY merge_rank
    """


def bpe_encode_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB mirror of :func:`bpe_encode`."""
    tk = "string_split(txt, ' ')"
    return f"""
    WITH {_round_ctes(n_merges)}
    SELECT doc_id, txt AS text_bpe, len({tk})::BIGINT AS n_tokens
    FROM r{n_merges}
    """


def bpe_apply(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """The SERVING path: re-tokenize a corpus under an already-trained
    merge table — no fit, no driver actions, no shuffle. The rules are
    inlined as literals into one chained fold expression (rule i+1
    folds over rule i's output), so the whole apply is a single
    map-only whole-stage-codegen pass; at 100 TB this is the operator
    the tokenization stage of a training run actually executes, with
    ``bpe_vocab`` (or a sampled fit) having produced ``merges`` once.

    Output schema matches :func:`bpe_encode`."""
    expr = "split(text, ' ')"
    for left, right in merges:
        expr = _merge_apply_expr(expr, left, right)
    return docs.select(
        "doc_id",
        F.concat_ws(" ", F.expr(expr)).alias("text_bpe"),
        F.size(F.expr(expr)).cast("long").alias("n_tokens"),
    )


def bpe_apply_sql(merges: list[tuple[str, str]]) -> str:
    """DuckDB mirror of :func:`bpe_apply` — the same fixed rules via
    the doubled-space string replace, chained."""
    expr = "text"
    for left, right in merges:
        l = left.replace("'", "''")
        r = right.replace("'", "''")
        expr = (
            f"trim(regexp_replace(replace(' ' || replace({expr}, ' ', '  ')"
            f" || ' ', ' {l}  {r} ', ' {l}+{r} '), ' +', ' ', 'g'))"
        )
    return f"""
    SELECT doc_id, {expr} AS text_bpe,
           len(string_split({expr}, ' '))::BIGINT AS n_tokens
    FROM documents
    """


# Deterministic fixed rules for the oracle-checked serving-path query:
# chosen so later rules consume earlier rules' outputs (rule 2's left
# side is rule 1's merged token), exercising the chained fold.
APPLY_MERGES: list[tuple[str, str]] = [
    ("data", "slow"),
    ("data+slow", "small"),
    ("the", "fast"),
]


def bpe_decode(encoded: DataFrame) -> DataFrame:
    """Inverse of :func:`bpe_apply`/:func:`bpe_encode`: merged tokens
    are ``left+right`` strings, so decoding is one char-for-char
    ``translate('+', ' ')`` — map-only, codegen, no shuffle. Exact
    inverse whenever base-vocabulary tokens contain no ``'+'`` (true
    for the whitespace pre-tokenizer used here; a byte-level
    production vocab sidesteps the caveat structurally). The
    registered ``bpe_roundtrip`` query pins decode(apply(corpus)) ==
    corpus against the documents oracle every correctness round — the
    merge fold cannot silently drop or duplicate a token without
    breaking the hash."""
    return encoded.select(
        "doc_id",
        F.translate("text_bpe", "+", " ").alias("text"),
    )
