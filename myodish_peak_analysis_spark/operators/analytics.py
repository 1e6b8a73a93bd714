"""General log-analytics operators over the events table: fixed-width
histograms, bounded range (interval) self-joins, semi-structured JSON
property extraction, and a two-phase salted top-k.

These extend the reference's surface the same way the sessionization /
as-of operators do (the reference itself has no event analytics — see
SURVEY.md §2.9 "explicit absences"); each is designed for the 100 TB
shape first and mirrored by a DuckDB oracle in :mod:`..oracle`.

Scale notes per operator:

* :func:`value_histogram` — a single map-side-combined ``groupBy`` on a
  computed bin key; the shuffle carries one row per (bin), i.e. O(bins),
  not O(rows). Safe at any scale.
* :func:`range_pairs` — the naive formulation is a per-key cross join
  (O(n²) per user at 100 TB). This one buckets time into window-width
  epochs and joins on ``(user_id, bucket)`` with the left side exploded
  to two adjacent buckets, so the shuffle key is fine-grained and every
  candidate pair is produced exactly once; the O(n²) blow-up is bounded
  to rows co-resident in a 2-window span.
* :func:`json_props_stats` — ``get_json_object`` runs JVM-side
  (no Python); the aggregate is map-side combined to O(event_types).
* :func:`topk_per_group` — skew-safe top-k per group. On Spark 3.5+
  the plain ``row_number() OVER (PARTITION BY group) <= k`` compiles
  with a Partial WindowGroupLimit BELOW the exchange (each map task
  ships ≤ k rows per group), so a hot group cannot OOM one task and
  the optimizer route beats the hand-salted two-phase (measured:
  `tools/bench_skew.py`, 95%-hot 40M rows — 3.6 s vs 4.2 s); the
  explicit salted form remains as an opt-in (``salt=N``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Pair window for :func:`range_pairs` (1 hour in microseconds).
DEFAULT_WINDOW_US = 3_600 * 1_000_000

#: Salt fan-out for the partial phase of :func:`topk_per_group`.
TOPK_SALT = 16


def value_histogram(
    events: DataFrame,
    value_col: str = "value",
    bin_width: float = 25.0,
    round_dp: int = 6,
) -> DataFrame:
    """Fixed-width histogram of ``value_col``: bin id, count, min/max and
    an exact-integer-micro-unit mean (bit-identical across engines, see
    oracle.ROUND_DP contract).

    ``floor(value / bin_width)`` is exact in IEEE doubles for identical
    inputs, so the bin key needs no rounding guard.
    """
    bin_id = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    micro = F.round(F.round(F.col(value_col), round_dp) * 1e6, 0).cast("long")
    return (
        events.groupBy(bin_id.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            (F.sum(micro).cast("double") / (F.count(F.lit(1)) * F.lit(1e6))).alias(
                "avg_value"
            ),
        )
    )


def range_pairs(
    events: DataFrame,
    window_us: int = DEFAULT_WINDOW_US,
    by: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """All ordered same-key event pairs ``(a, b)`` with
    ``a.ts <= b.ts <= a.ts + window_us`` — a bounded range self-join.

    Bucketed formulation: bucket time by ``window_us``; a qualifying
    ``b`` can only live in ``a``'s bucket or the next one, so the left
    side is exploded to those two join keys and the join runs on the
    fine-grained ``(by, bucket)`` key. Each pair is matched exactly once
    (``b`` has one bucket; the two exploded keys differ). Ties at equal
    timestamps are ordered by ``id_col`` so the pair set is
    deterministic.
    """
    e = events.select(
        F.col(id_col).alias("_id"),
        F.col(by).alias("_by"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_val"),
    )
    bucket = F.expr(f"_ts DIV {window_us}")
    left = e.select(
        F.col("_id").alias("left_id"),
        F.col("_by").alias("_by"),
        F.col("_ts").alias("_lts"),
        F.col("_val").alias("left_value"),
        F.explode(F.array(bucket, bucket + 1)).alias("_jb"),
    )
    right = e.select(
        F.col("_id").alias("right_id"),
        F.col("_by").alias("_by"),
        F.col("_ts").alias("_rts"),
        F.col("_val").alias("right_value"),
        bucket.alias("_jb"),
    )
    gap = F.col("_rts") - F.col("_lts")
    ordered = (F.col("_lts") < F.col("_rts")) | (
        (F.col("_lts") == F.col("_rts")) & (F.col("left_id") < F.col("right_id"))
    )
    return (
        left.join(right, on=["_by", "_jb"])
        .filter((gap >= 0) & (gap <= window_us) & ordered)
        .select(
            F.col("_by").alias(by),
            "left_id",
            "right_id",
            gap.alias("gap_us"),
            "left_value",
            "right_value",
        )
    )


def json_props_stats(
    events: DataFrame,
    props_col: str = "props",
    json_path: str = "$.k",
    group_col: str = "event_type",
) -> DataFrame:
    """Extract an integer property from the semi-structured ``props``
    JSON column and aggregate it per ``group_col``. The extraction is
    ``get_json_object`` (JVM expression, codegen'd — no Python); the
    mean divides the exact integer sum, so it is bit-identical to the
    oracle's."""
    k = F.get_json_object(F.col(props_col), json_path).cast("long")
    return (
        events.select(F.col(group_col), k.alias("_k"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
            (F.sum("_k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tie_col: str,
    k: int = 5,
    descending: bool = True,
    salt: int | None = None,
) -> DataFrame:
    """Deterministic top-k rows per group, skew-safe.

    Default (``salt=None``): the single window
    ``row_number() over (partition by group order by ...) <= k`` —
    which on Spark 3.5+ is NOT the naive skew-vulnerable plan it looks
    like: Catalyst inserts a **Partial WindowGroupLimit below the
    exchange**, so every map task keeps only its local top-k per group
    and a hot key ships ≤ k rows per task instead of its full volume.
    Measured (`tools/bench_skew.py`, 40M rows, 95% in ONE group,
    local[32]): single-window 3.6 s vs hand-salted two-phase 4.2 s —
    the optimizer route wins because the salted form pays an extra
    exchange + window pass for protection the engine already provides.

    ``salt=N`` keeps the explicit two-phase form (phase 1 ranks within
    ``(group, xxhash64(tie) % N)`` and keeps k per sub-group, phase 2
    re-ranks the surviving ``N·k`` rows) for engines without the
    WindowGroupLimit rewrite; both forms return identical rows (the
    global top-k must survive every sub-group top-k; asserted in
    `tools/bench_skew.py` before timing).
    """
    from pyspark.sql import Window

    def order_exprs() -> list[Column]:
        c = F.col(order_col).desc() if descending else F.col(order_col).asc()
        return [c, F.col(tie_col).asc()]

    src = df
    if salt is not None and salt > 1:
        part = F.pmod(F.xxhash64(F.col(tie_col)), F.lit(salt))
        w1 = Window.partitionBy(group_col, part).orderBy(*order_exprs())
        src = (
            df.withColumn("_rk", F.row_number().over(w1))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )
    w2 = Window.partitionBy(group_col).orderBy(*order_exprs())
    return (
        src.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _ranked(df: DataFrame, by: str, value_col: str, id_col: str) -> DataFrame:
    """Shared rank prelude for the exact order statistics: row_number
    ascending over (value, id) with NULL values LAST — made explicit
    because Spark's ASC default is NULLS FIRST while DuckDB's is NULLS
    LAST, which would silently shift every rank in a group containing a
    NULL value. NULL rows still count toward ``n``."""
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(
        F.col(value_col).asc_nulls_last(), F.col(id_col).asc()
    )
    return df.select(
        F.col(by),
        F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(by)).alias("n"),
    )


def grouped_median(
    df: DataFrame,
    by: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Exact per-group median via the explicit rank formulation (mean of
    the one or two middle elements), identical in any SQL engine — no
    engine-specific interpolation (`percentile_cont` variants disagree
    across engines; this never does, because both engines average the
    same <=2 doubles).

    Scale: one hash exchange on ``by`` plus an in-partition sort — the
    same cost as any grouped window. Groups are users, so no group
    outgrows a task; for a pathological single giant group use the
    two-phase :func:`topk_per_group` pattern on the rank instead.
    """
    ranked = _ranked(df, by, value_col, id_col)
    mid = (F.col("_rn") * 2 == F.col("n")) | (F.col("_rn") * 2 == F.col("n") + 1) | (
        F.col("_rn") * 2 == F.col("n") + 2
    )
    # middle one (odd n: rn = (n+1)/2) or middle two (even n: rn = n/2, n/2+1)
    return (
        ranked.filter(mid)
        .groupBy(by, "n")
        .agg(F.avg(value_col).alias("median"))
    )


def corpus_rollup(docs: DataFrame) -> DataFrame:
    """Multi-granularity corpus report in ONE pass: doc counts and
    char/size sums at (source, lang), (source), (lang), and grand-total
    granularity via ``GROUPING SETS`` — the summary dashboard query every
    corpus pipeline runs nightly.

    Spark plans all four granularities as a single Expand + one hash
    aggregate (one shuffle, map-side combined; the expand multiplies
    rows by 4 BEFORE partial aggregation, so the shuffle still carries
    only O(groups) rows). ``grouping_id`` disambiguates the NULLs of a
    rolled-up dimension from genuine NULL values — exposed as
    ``gid`` so results are unambiguous and engine-portable.
    """
    return (
        docs.groupingSets(
            [["source", "lang"], ["source"], ["lang"], []],
            "source",
            "lang",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def corpus_rollup_sql() -> str:
    """DuckDB oracle: identical GROUPING SETS + GROUPING() id bits."""
    return """
    SELECT source, lang,
           CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
    """


PERCENTILES_DEFAULT = (50, 95, 99)


def grouped_percentiles(
    df: DataFrame,
    by: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    percentiles: tuple[int, ...] = PERCENTILES_DEFAULT,
) -> DataFrame:
    """Exact per-group percentile report (discrete / lower-value
    semantics: the p-th percentile is the value at row-number
    ``ceil(p/100 * n)`` of the group sorted ascending) — the ops
    dashboard query (p50/p95/p99 latency per endpoint) in a form that is
    bit-identical in any engine: rank selection only, no interpolation.

    Scale: ONE hash exchange + in-partition sort (same window as
    :func:`grouped_median`), then a pivot-style conditional aggregate —
    output is O(groups × percentiles). Ties break by ``id_col`` for a
    total order, which never changes the SELECTED VALUE (only which of
    the tied rows supplies it).
    """
    ranked = _ranked(df, by, value_col, id_col)
    aggs = [
        F.min(
            F.when(
                F.col("_rn") == F.ceil(F.lit(p) * F.col("n") / F.lit(100)),
                F.col(value_col),
            )
        ).alias(f"p{p}")
        for p in percentiles
    ]
    return ranked.groupBy(by, "n").agg(*aggs)


def grouped_percentiles_sql(
    by: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    percentiles: tuple[int, ...] = PERCENTILES_DEFAULT,
    table: str = "events",
) -> str:
    cols = ",\n           ".join(
        f"MIN(CASE WHEN _rn = CAST(CEIL({p} * n / 100.0) AS BIGINT) "
        f"THEN {value_col} END) AS p{p}"
        for p in percentiles
    )
    return f"""
    WITH ranked AS (
        SELECT {by}, {value_col},
               ROW_NUMBER() OVER (PARTITION BY {by}
                                  ORDER BY {value_col} ASC NULLS LAST,
                                           {id_col} ASC) AS _rn,
               COUNT(*) OVER (PARTITION BY {by}) AS n
        FROM {table}
    )
    SELECT {by}, CAST(n AS BIGINT) AS n,
           {cols}
    FROM ranked GROUP BY {by}, n
    """


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(events: DataFrame, types: tuple[str, ...] = EVENT_TYPES) -> DataFrame:
    """Per-user behavior matrix: one row per user, one count column per
    event type — the feature-table shape fed to churn/segmentation
    models. Uses ``pivot`` with an EXPLICIT value list: Spark then plans
    a single map-side-combined aggregate (no extra pass to discover the
    pivot values, and a deterministic column order on any engine/run —
    never call wide-pivot without a value list at scale).
    """
    out = events.groupBy("user_id").pivot("event_type", list(types)).count()
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


def user_event_pivot_sql(types: tuple[str, ...] = EVENT_TYPES) -> str:
    cols = ",\n           ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""
    SELECT user_id,
           {cols}
    FROM events GROUP BY user_id
    """


def user_value_zscores(events: DataFrame) -> DataFrame:
    """Per-event anomaly score: how many population standard deviations
    each event's value sits from its user's mean — the core of any
    per-entity outlier monitor.

    Cross-engine exactness for a SECOND-order statistic: naive
    avg/stddev_pop aggregate doubles in shuffle order (nondeterministic
    last-ulp). Instead both moments are summed as exact integer
    micro-units in DECIMAL(38,0) — s = Σv, q = Σv² — and the z-score
    uses the algebraic identity

        z = (n·v − s) / sqrt(n·q − s²)

    whose numerator and radicand are formed EXACTLY in decimal before
    the single double division, so both engines round the same integers
    the same way. Zero-variance users yield NULL (not ±Inf). Range: |v|
    ≤ ~1e3 at 6 decimals → q ≤ ~1e18·n, and n·q ≤ 1e38 holds to ~1e14
    events per user — beyond any real per-user cardinality.
    """
    vu = F.expr("CAST(ROUND(value * 1e6, 0) AS DECIMAL(18,0))")
    ev = events.select("event_id", "user_id", "value", vu.alias("_vu"))
    mom = ev.groupBy("user_id").agg(
        # count the VALUES, not the rows: the moment sums skip NULLs, so
        # a COUNT(*) n would inflate the radicand and fabricate variance
        # for a user whose only spread is missing values
        F.count("_vu").cast("long").alias("_n"),
        F.sum("_vu").cast("decimal(38,0)").alias("_s"),
        F.sum(F.expr("_vu * _vu")).cast("decimal(38,0)").alias("_q"),
    )
    rad = F.expr("CAST(_n AS DECIMAL(38,0)) * _q - _s * _s")
    num = F.expr("CAST(_n AS DECIMAL(38,0)) * _vu - _s")
    return (
        ev.join(mom, "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.when(
                rad > 0,
                F.round(
                    num.cast("double") / F.sqrt(rad.cast("double")), 6
                ),
            ).alias("zscore"),
        )
    )


def user_value_zscores_sql() -> str:
    return """
    WITH ev AS (
        SELECT event_id, user_id, value,
               CAST(ROUND(value * 1e6, 0) AS HUGEINT) AS vu
        FROM events
    ),
    mom AS (
        SELECT user_id, COUNT(vu)::BIGINT AS n,
               SUM(vu) AS s, SUM(vu * vu) AS q
        FROM ev GROUP BY user_id
    )
    SELECT event_id, ev.user_id, value,
           CASE WHEN n * q - s * s > 0 THEN
               ROUND(CAST(n * vu - s AS DOUBLE)
                     / sqrt(CAST(n * q - s * s AS DOUBLE)), 6)
           END AS zscore
    FROM ev JOIN mom ON ev.user_id = mom.user_id
    """


def mad_outliers(
    df: DataFrame,
    by: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier profile: exact median, exact MAD
    (median of absolute deviations from the median — the robust-stats
    spread measure that, unlike stddev, a single corrupt point cannot
    inflate), and the count of points beyond ``k·MAD``. The z-score
    twin (`user_value_zscores`) flags against mean/σ, which outliers
    themselves distort; MAD is the screen a data-quality pipeline runs
    when the data is suspect — exactly when robust statistics matter.

    Both medians use the explicit rank formulation of
    :func:`grouped_median` (mean of the ≤2 middle elements, NULLS
    LAST) so every number is engine-portable. NULL values count toward
    ``n`` but never toward medians or the outlier count.

    Scale: two windowed rank passes and one rollup, all hash-keyed on
    ``by`` (users — high-cardinality, skew-free); the deviation join
    carries one double per group. No collect, no UDF.
    """
    med = grouped_median(df, by, value_col, id_col).select(by, "median")
    dev = (
        df.select(by, value_col, id_col)
        .join(med, by)
        .withColumn("_dev", F.abs(F.col(value_col) - F.col("median")))
    )
    mad = grouped_median(dev, by, "_dev", id_col).select(
        by, F.col("median").alias("mad")
    )
    joined = dev.join(mad, by)
    return (
        joined.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("median"), 6).alias("median"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("_dev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


def mad_outliers_sql(
    by: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
) -> str:
    """DuckDB mirror of :func:`mad_outliers` — same rank medians, same
    deviation arithmetic."""
    return f"""
    WITH v AS (
        SELECT {by}, {value_col}, {id_col},
               ROW_NUMBER() OVER (PARTITION BY {by}
                                  ORDER BY {value_col} ASC NULLS LAST,
                                           {id_col}) AS rn,
               COUNT(*) OVER (PARTITION BY {by}) AS n
        FROM events
    ),
    med AS (
        SELECT {by}, AVG({value_col}) AS median
        FROM v WHERE rn * 2 = n OR rn * 2 = n + 1 OR rn * 2 = n + 2
        GROUP BY {by}
    ),
    dev AS (
        SELECT e.{by}, e.{value_col}, e.{id_col}, m.median,
               ABS(e.{value_col} - m.median) AS _dev
        FROM events e JOIN med m USING ({by})
    ),
    dv AS (
        SELECT {by}, _dev,
               ROW_NUMBER() OVER (PARTITION BY {by}
                                  ORDER BY _dev ASC NULLS LAST,
                                           {id_col}) AS rn,
               COUNT(*) OVER (PARTITION BY {by}) AS n
        FROM dev
    ),
    mad AS (
        SELECT {by}, AVG(_dev) AS mad
        FROM dv WHERE rn * 2 = n OR rn * 2 = n + 1 OR rn * 2 = n + 2
        GROUP BY {by}
    )
    SELECT d.{by}, COUNT(*)::BIGINT AS n,
           ROUND(MIN(d.median), 6) AS median,
           ROUND(MIN(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d._dev > {k} * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING ({by})
    GROUP BY d.{by}
    """


def trailing_window_stats(
    events: DataFrame, window_us: int = 3600 * 1_000_000
) -> DataFrame:
    """Per-event trailing time-window rollup — for every event, how
    many events and how much value the SAME user produced in the
    preceding hour (rate-limit / velocity features): the RANGE frame
    (``RANGE BETWEEN window PRECEDING AND CURRENT ROW`` over the
    event-time microseconds), the one window frame type the engine
    didn't yet exercise. A ROWS frame counts a fixed number of rows;
    only a RANGE frame expresses "the last hour" when event spacing
    varies.

    Exactness: the value sum runs over integer micro-units and divides
    once; counts are integers; frame membership compares exact int64
    microseconds — nothing engine-dependent anywhere. Spark evaluates
    a running RANGE frame with two pointers over the partition sort —
    O(n) per user, no re-scan per row.
    """
    from pyspark.sql import Window

    from ..schema import ts_micros

    ev = events.select(
        "event_id",
        "user_id",
        ts_micros(events).alias("ts_us"),
        F.round(F.round("value", 6) * 1e6, 0).cast("long").alias("_v_micro"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-window_us, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        (F.sum("_v_micro").over(w).cast("double") / F.lit(1e6)).alias(
            "sum_trailing"
        ),
    )


def trailing_window_stats_sql(window_us: int = 3600 * 1_000_000) -> str:
    """DuckDB mirror of :func:`trailing_window_stats` — same RANGE
    frame over the same integer microseconds."""
    return f"""
    WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               CAST(ROUND(ROUND(value, 6) * 1e6, 0) AS BIGINT) AS _v_micro
        FROM events
    )
    SELECT event_id, user_id, ts_us,
           COUNT(*) OVER w AS n_trailing,
           CAST(SUM(_v_micro) OVER w AS DOUBLE) / 1e6 AS sum_trailing
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN {window_us} PRECEDING AND CURRENT ROW)
    """
