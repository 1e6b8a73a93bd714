"""Dataset-composition operators for training-data pipelines:
deterministic stratified sampling and per-source mixture weights.

A 100 TB corpus is never trained on verbatim — pipelines downsample
overrepresented strata (language, source/domain) and compute per-source
resampling weights so the final mixture matches a target distribution.
Both operators here are single-pass, shuffle-light, and — unlike
``df.sample()`` — fully deterministic and reproducible across engines
and runs, which is what makes them oracle-checkable.

Scale notes:

* :func:`stratified_sample` is a pure filter (no shuffle at all): the
  keep/drop decision is a multiplicative-hash of the stable ``doc_id``,
  so re-running on a grown corpus keeps exactly the rows it kept
  before (reservoir/Bernoulli samplers don't). The hash is plain
  64-bit integer arithmetic so the DuckDB oracle computes the identical
  value — no engine-specific hash function involved.
* :func:`mixture_weights` is two map-side-combined aggregates (one per
  source — O(sources) shuffle rows) plus a 1-row broadcast of the
  corpus totals. The weight divides exact integers, so it is
  bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Knuth's multiplicative hash constant (2654435761 = 2^32 * phi^-1,
#: public domain — TAOCP vol. 3 §6.4); doc_id * C % 1000 is a cheap,
#: well-mixed per-mille bucket that any SQL engine evaluates identically.
HASH_MULTIPLIER = 2654435761

#: Default per-mille keep rates per language: downsample the dominant
#: 'en' stratum, keep the long tail at a higher rate (the usual
#: rebalancing direction for a web corpus).
DEFAULT_RATES_PER_MILLE = {"en": 200, "*": 600}


def _permille_bucket() -> F.Column:
    # (doc_id * C) % 1000 computed mod-first — identical value by modular
    # arithmetic, but (doc_id % 1000) * C never overflows BIGINT, which
    # the full-width product does (ANSI crash) once doc_id > ~3.5e9.
    return (F.col("doc_id") % F.lit(1000) * F.lit(HASH_MULTIPLIER)) % F.lit(1000)


def keep_condition(
    rates_per_mille: dict[str, int] | None = None, stratum_col: str = "lang"
) -> F.Column:
    """The stratified-sampling keep/drop predicate as a reusable Column —
    a pure filter (zero shuffle, zero joins) that any pipeline stage can
    apply to a full document frame."""
    rates = dict(rates_per_mille or DEFAULT_RATES_PER_MILLE)
    default = rates.pop("*", 0)
    rate = F.lit(default)
    for stratum, permille in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(permille)).otherwise(rate)
    return _permille_bucket() < rate


def stratified_sample(
    docs: DataFrame,
    rates_per_mille: dict[str, int] | None = None,
    stratum_col: str = "lang",
) -> DataFrame:
    """Keep each document iff its deterministic per-mille bucket
    (``doc_id * 2654435761 % 1000``) falls below its stratum's keep
    rate. Returns the surviving rows with their bucket, so downstream
    stages can re-stratify without recomputing the hash."""
    return (
        docs.withColumn("permille", _permille_bucket().cast("long"))
        .filter(keep_condition(rates_per_mille, stratum_col))
        .select("doc_id", stratum_col, "source", "permille")
    )


def stratified_sample_sql(
    rates_per_mille: dict[str, int] | None = None, stratum_col: str = "lang"
) -> str:
    """DuckDB mirror of :func:`stratified_sample` (same rate table)."""
    rates = dict(rates_per_mille or DEFAULT_RATES_PER_MILLE)
    default = rates.pop("*", 0)
    whens = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {p}" for s, p in sorted(rates.items())
    )
    return f"""
    SELECT doc_id, {stratum_col}, source,
           (doc_id % 1000 * {HASH_MULTIPLIER}) % 1000 AS permille
    FROM documents
    WHERE (doc_id % 1000 * {HASH_MULTIPLIER}) % 1000
          < (CASE {whens} ELSE {default} END)
    """


def mixture_weights(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-source resampling weight toward a uniform mixture:
    ``weight = total_chars / (n_sources * src_chars)`` — >1 means the
    source must be upsampled, <1 downsampled. All inputs to the final
    division are exact integers, so the double result is bit-identical
    in any IEEE engine."""
    per_src = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("src_chars"),
    )
    totals = per_src.agg(
        F.sum("src_chars").alias("_total"),
        F.count(F.lit(1)).alias("_nsrc"),
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            "n_docs",
            "src_chars",
            (
                F.col("_total").cast("double")
                / (F.col("_nsrc") * F.col("src_chars")).cast("double")
            ).alias("weight"),
        )
    )


def mixture_weights_sql(group_col: str = "source") -> str:
    """DuckDB mirror of :func:`mixture_weights`."""
    return f"""
    WITH per_src AS (
        SELECT {group_col}, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS src_chars
        FROM documents GROUP BY {group_col}
    ),
    totals AS (
        SELECT CAST(SUM(src_chars) AS BIGINT) AS _total,
               COUNT(*) AS _nsrc
        FROM per_src
    )
    SELECT {group_col}, n_docs, src_chars,
           CAST(_total AS DOUBLE) / CAST(_nsrc * src_chars AS DOUBLE) AS weight
    FROM per_src, totals
    """


def training_order(docs: DataFrame, seed: int = 0, n_shards: int = 8) -> DataFrame:
    """Deterministic, reproducible corpus shuffle for training epochs:
    every doc gets a pseudo-random ``shard`` and an in-shard ``pos``,
    both pure functions of ``(doc_id, seed)`` — rerunning with the same
    seed reproduces the exact order on any cluster size; bumping the
    seed reshuffles for the next epoch.

    The permutation key is ``md5(doc_id || ':' || seed)`` — chosen over
    the engine-native hashes (Spark xxhash64 vs DuckDB hash differ)
    because md5 is bit-identical everywhere, so the order is
    oracle-checkable. Shard = the first four hex NIBBLES of the hash
    decoded to a 16-bit integer (``instr('0123456789abcdef', ch) - 1``
    per char — portable to any engine with instr/substr, no hex-cast
    needed), mod ``n_shards``. 16 bits of hash entropy keep shards
    balanced for any n_shards into the thousands, and exactly uniform
    for power-of-two shard counts. (Ascii arithmetic on the raw chars
    is NOT balanced: 256 ≡ 0 mod 2^k collapses the first char's
    contribution, and hex ascii codes cover only 16 values.)

    Scale: one exchange on ``shard`` + an in-partition sort of 32-char
    keys. Shards are hash-balanced, so per-shard sort memory is
    corpus/n_shards — raise ``n_shards`` with data (the same lever as
    ``pack_chunks``'s shard_mod, and the two compose: feed this order
    into packing for shuffled-then-packed training manifests).
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(seed))))
    ranked = docs.select("doc_id", h.alias("_h")).withColumn(
        "shard", F.expr(_shard_expr(int(n_shards))).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("_h", "doc_id")
    return ranked.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    ).orderBy("shard", "pos")


def _shard_expr(n_shards: int) -> str:
    """SQL expression (valid in both Spark SQL and DuckDB) decoding the
    first 4 hex nibbles of ``_h`` to a 16-bit int, mod ``n_shards``."""
    nib = [
        f"(instr('0123456789abcdef', substr(_h, {i}, 1)) - 1)" for i in (1, 2, 3, 4)
    ]
    return (
        f"({nib[0]} * 4096 + {nib[1]} * 256 + {nib[2]} * 16 + {nib[3]})"
        f" % {int(n_shards)}"
    )


def training_order_sql(seed: int = 0, n_shards: int = 8) -> str:
    """DuckDB mirror of :func:`training_order` (same md5 permutation)."""
    return f"""
    WITH h AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR) || ':' || '{seed}') AS _h
        FROM documents
    ),
    s AS (
        SELECT doc_id, _h,
               {_shard_expr(int(n_shards))} AS shard
        FROM h
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY _h, doc_id)
                AS BIGINT) AS pos
    FROM s
    ORDER BY shard, pos
    """


def temperature_weights(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Temperature-flattened sampling mixture (the multilingual-LM
    recipe — Conneau & Lample 2019, public): sampling probability
    q_i ∝ p_i^τ with τ=0.5 (square-root sampling), which upweights
    small sources without drowning large ones. Output per source:
    the natural share ``p``, the flattened share ``q``, and
    ``boost = q/p`` (the resampling factor a data loader applies).

    Exactness: p is a division of exact BIGINTs; p^0.5 is ``sqrt`` —
    correctly-rounded IEEE in every engine (why τ is FIXED at 0.5 for
    the oracle-checked entry: general ``pow`` is libm-dependent);
    each sqrt is quantized to integer parts-per-billion BEFORE the
    normalizing sum, so the denominator is an exact integer and no
    cross-engine float-sum ordering exists anywhere.
    """
    per_src = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("src_chars"),
    )
    totals = per_src.agg(F.sum("src_chars").alias("_total"))
    scored = per_src.crossJoin(F.broadcast(totals)).withColumn(
        "p", F.col("src_chars").cast("double") / F.col("_total")
    )
    r_ppb = F.floor(F.sqrt("p") * F.lit(1e9) + F.lit(0.5)).cast("long")
    scored = scored.withColumn("_r", r_ppb)
    denom = scored.agg(F.sum("_r").alias("_rsum"))
    return (
        scored.crossJoin(F.broadcast(denom))
        .select(
            group_col,
            "n_docs",
            "src_chars",
            "p",
            (F.col("_r").cast("double") / F.col("_rsum")).alias("q"),
            (
                (F.col("_r").cast("double") / F.col("_rsum")) / F.col("p")
            ).alias("boost"),
        )
    )


def temperature_weights_sql(group_col: str = "source") -> str:
    """DuckDB mirror of :func:`temperature_weights` (τ=0.5)."""
    return f"""
    WITH per_src AS (
        SELECT {group_col}, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS src_chars
        FROM documents GROUP BY {group_col}
    ),
    totals AS (SELECT CAST(SUM(src_chars) AS BIGINT) AS _total FROM per_src),
    scored AS (
        SELECT {group_col}, n_docs, src_chars,
               CAST(src_chars AS DOUBLE) / _total AS p,
               CAST(floor(sqrt(CAST(src_chars AS DOUBLE) / _total) * 1e9
                          + 0.5) AS BIGINT) AS _r
        FROM per_src, totals
    ),
    denom AS (SELECT CAST(SUM(_r) AS BIGINT) AS _rsum FROM scored)
    SELECT {group_col}, n_docs, src_chars, p,
           CAST(_r AS DOUBLE) / _rsum AS q,
           (CAST(_r AS DOUBLE) / _rsum) / p AS boost
    FROM scored, denom
    """


def leakage_safe_split(
    docs: "DataFrame",
    test_permille: int = 100,
    val_permille: int = 100,
) -> "DataFrame":
    """Train/val/test assignment keyed by the NEAR-DUP CLUSTER, not
    the document: every member of a connected near-dup family hashes
    to the same split, so a training document can never leak a
    near-duplicate of a held-out document across the boundary (Lee et
    al. 2022 measured exactly this train→test contamination from
    per-document splits on un-deduplicated corpora).

    The split hash is the package's Knuth-multiplier permille bucket
    (``cluster_id % 1000 * 2654435761 % 1000`` — deterministic,
    engine-portable) applied to :func:`..dedup.dedup_clusters`' min-id
    cluster label: buckets below ``test_permille`` → 'test', next
    ``val_permille`` → 'val', rest → 'train'. Singleton documents are
    their own cluster, so corpus-level split fractions approach the
    requested permilles as dup rate falls.

    Scale: dedup_clusters' banded machinery (measured decades in
    PLANS.md) plus one map-side hash+CASE — the split itself adds no
    shuffle beyond the cluster join.
    """
    from .dedup import dedup_clusters

    clusters = dedup_clusters(docs)
    bucket = (
        F.col("cluster_id") % F.lit(1000) * F.lit(HASH_MULTIPLIER)
    ) % F.lit(1000)
    return (
        docs.select("doc_id")
        .join(clusters, "doc_id")
        .withColumn("permille", bucket.cast("long"))
        .withColumn(
            "split",
            F.when(F.col("permille") < test_permille, F.lit("test"))
            .when(
                F.col("permille") < test_permille + val_permille, F.lit("val")
            )
            .otherwise(F.lit("train")),
        )
        .select("doc_id", "cluster_id", "permille", "split")
    )


def leakage_safe_split_sql(
    dedup_clusters_sql: str,
    test_permille: int = 100,
    val_permille: int = 100,
) -> str:
    """DuckDB mirror: the dedup_clusters recursive-CTE oracle as a
    subquery plus the same hash+CASE arithmetic."""
    return f"""
    WITH cl AS ({dedup_clusters_sql})
    SELECT doc_id, cluster_id,
           CAST((cluster_id % 1000 * {HASH_MULTIPLIER}) % 1000 AS BIGINT)
               AS permille,
           CASE
               WHEN (cluster_id % 1000 * {HASH_MULTIPLIER}) % 1000
                    < {test_permille} THEN 'test'
               WHEN (cluster_id % 1000 * {HASH_MULTIPLIER}) % 1000
                    < {test_permille + val_permille} THEN 'val'
               ELSE 'train'
           END AS split
    FROM cl
    """
