"""Sessionization over the events stream/table (log-analytics core op).

Not present in the reference (batch signal library), but the harness
category is log-analytics and any events-at-scale pipeline needs it.
Classic gap-based formulation, fully window-expressible:

    new_session = (ts - lag(ts)) > gap     per user, ordered by ts
    session_seq = running SUM(new_session) -- cumulative count of starts
    session_id  = (user_id, session_seq)

One shuffle (hash by user_id), one in-partition sort, no UDFs; at scale
user_id is high-cardinality so the shuffle is skew-free, and the
per-session aggregate is map-side combinable. Timestamps are truncated
to MICROSECONDS before use: the harness parquet carries nanoseconds,
which Spark reads as raw longs but DuckDB truncates to its
microsecond TIMESTAMP — so microseconds is the portable precision
(sub-microsecond gaps don't matter for sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

MICROS = 1_000_000


def with_sessions(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Add ts_us (truncated microseconds) and session_seq (1-based per
    user) via the gap rule."""
    from ..schema import ts_micros

    events = events.withColumn("ts_us", ts_micros(events))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.lit(int(gap_seconds * MICROS))
    prev = F.lag("ts_us").over(w)
    new_session = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > gap), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def session_stats(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Per-session rollup: bounds, length, event count, value sum."""
    s = with_sessions(events, gap_seconds)
    return s.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("session_start"),
        F.max("ts_us").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.max("ts_us") - F.min("ts_us")).cast("double") / F.lit(float(MICROS))
        ).alias("duration_s"),
        # exact integer micro-units: the SUM is order-independent, so the
        # oracle compares identical integers (double summation order
        # differs between engines and flakes at round-half boundaries)
        (
            F.sum(F.round(F.round(F.col("value"), 6) * 1e6, 0).cast("long")).cast(
                "double"
            )
            / F.lit(1e6)
        ).alias("sum_value"),
    )


def sessions_sql(gap_seconds: float = 1800.0) -> str:
    """DuckDB mirror: epoch_us(ts) equals Spark's :func:`~..schema.ts_micros`
    for every harness timestamp generation (nanos are truncated to DuckDB's
    micro TIMESTAMP; micros pass through)."""
    gap = int(gap_seconds * MICROS)
    return f"""
    WITH e AS (SELECT epoch_us(ts) AS ts_n, * FROM events),
    marked AS (
        SELECT *,
               CASE WHEN lag(ts_n) OVER w IS NULL
                         OR ts_n - lag(ts_n) OVER w > {gap}
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_n, event_id)
    ),
    sess AS (
        SELECT *,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_n, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts_n) AS session_start,
           MAX(ts_n) AS session_end,
           COUNT(*) AS n_events,
           CAST(MAX(ts_n) - MIN(ts_n) AS DOUBLE) / {float(MICROS)!r} AS duration_s,
           CAST(SUM(CAST(ROUND(ROUND(value, 6) * 1e6, 0) AS BIGINT)) AS DOUBLE)
               / 1e6 AS sum_value
    FROM sess GROUP BY user_id, session_seq
    """


# --- funnel & cohort retention (log-analytics staples) ----------------------

DAY_US = 86_400 * MICROS
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    max_gap_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: how many users performed step 1, then
    step 2 strictly after their first step 1, then step 3 strictly after
    that, ... Each stage is "earliest qualifying event after the user's
    previous-stage timestamp" — the no-backtracking funnel every product
    analytics stack ships.

    Plan shape: ONE scan, ONE hash exchange + per-user sort. Stage-k
    entry times are chained running conditional mins over the same
    ``(user_id, ts)`` window (``t_k`` at a row = earliest qualifying
    step-k event so far, where "qualifying" compares against ``t_{k-1}``
    of the SAME row — ties are handled identically on both engines
    because qualification is a strict ``>`` on the timestamp, not on row
    position). A per-user aggregate then a single-row stack emit
    O(steps) rows. Contrast: the naive per-stage join+agg formulation
    re-executes its lineage per stage (k scans, ~2k exchanges).
    """
    from ..schema import ts_micros

    ev = events.select(
        "user_id", "event_type", ts_micros(events).alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    aggs = []
    for k, step in enumerate(steps):
        qualifies = F.col("event_type") == step
        if k > 0:
            prev_run = F.min(f"_t{k - 1}_cand").over(w)
            qualifies = qualifies & (F.col("ts_us") > prev_run)
            if max_gap_us is not None:
                qualifies = qualifies & (
                    F.col("ts_us") <= prev_run + F.lit(max_gap_us)
                )
        ev = ev.withColumn(
            f"_t{k}_cand", F.when(qualifies, F.col("ts_us"))
        )
        aggs.append(F.min(f"_t{k}_cand").alias(f"_t{k}"))
    per_user = ev.groupBy("user_id").agg(*aggs)
    totals = per_user.agg(
        *[F.count(f"_t{k}").alias(f"_c{k}") for k in range(len(steps))]
    )
    stack = ", ".join(
        f"{k + 1}, '{step}', _c{k}" for k, step in enumerate(steps)
    )
    return totals.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step, event_type, n_users)"
    )


def funnel_counts_sql(
    steps: tuple[str, ...] = FUNNEL_STEPS,
    max_gap_us: int | None = None,
) -> str:
    ctes = []
    for k, step in enumerate(steps):
        if k == 0:
            ctes.append(
                f"s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events "
                f"WHERE event_type = '{step}' GROUP BY user_id)"
            )
        else:
            bound = (
                f"AND epoch_us(e.ts) <= s{k}.t + {max_gap_us} "
                if max_gap_us is not None
                else ""
            )
            ctes.append(
                f"s{k + 1} AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t "
                f"FROM events e JOIN s{k} USING (user_id) "
                f"WHERE e.event_type = '{step}' AND epoch_us(e.ts) > s{k}.t "
                f"{bound}"
                f"GROUP BY e.user_id)"
            )
    selects = " UNION ALL ".join(
        f"SELECT {k + 1} AS step, '{step}' AS event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM s{k + 1}"
        for k, step in enumerate(steps)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def cohort_retention(events: DataFrame, max_offset: int = 14) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by the day of
    their first event; for each cohort day × day offset, how many of
    them were active. All integer day arithmetic (epoch days from the
    microsecond timestamps), so the cross-engine match is exact.

    Plan shape: distinct (user, day) — one map-side-combinable
    aggregate — then a per-user min (same key, reused partitioning) and
    a final O(cohorts × offsets) rollup. The events table shuffles
    once, on ``user_id``.
    """
    from ..schema import ts_micros

    days = (
        events.select("user_id", ts_micros(events).alias("ts_us"))
        .select("user_id", F.expr(f"ts_us DIV {DAY_US}").alias("day"))
        .distinct()
    )
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention_sql(max_offset: int = 14) -> str:
    return f"""
    WITH days AS (
        SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
    ),
    first AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
    SELECT cohort_day, day - cohort_day AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM days JOIN first USING (user_id)
    WHERE day - cohort_day <= {max_offset}
    GROUP BY cohort_day, day - cohort_day
    """


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each (event_type → next event_type) pair, the observed count and
    the transition probability out of the source type.

    Scale: one hash shuffle on ``user_id`` + in-partition sort (the same
    partitioning sessionization uses) feeds the ``lead`` window; the
    pair count is map-side combinable into at most K² groups (K = event
    type cardinality, small). The probability normalization is a window
    over the K²-row aggregate — constant-size regardless of input rows.
    The count is exact; the single double division happens per group.
    """
    from ..schema import ts_micros

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        events.withColumn("ts_us", ts_micros(events))
        .select(
            "user_id",
            "ts_us",
            "event_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy("src"))
    return counts.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / total, 6).alias("p"),
    )


def event_transitions_sql() -> str:
    return """
    WITH pairs AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS dst
        FROM events
    ),
    c AS (
        SELECT src, dst, COUNT(*)::BIGINT AS n
        FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           ROUND(n / SUM(n) OVER (PARTITION BY src), 6) AS p
    FROM c
    """


def top_event_paths(
    events: DataFrame, path_len: int = 3, k: int = 20
) -> DataFrame:
    """Top-k initial event paths: the first ``path_len`` event types of
    every user (time order, event_id tie-break), joined with '>', ranked
    by how many users share that prefix. Users with fewer than
    ``path_len`` events are excluded (ragged prefixes would make path
    popularity incomparable).

    Scale: the prefix extraction is a ``row_number`` window on the same
    user-keyed shuffle as sessionization, filtered to ``path_len`` rows
    per user BEFORE the per-user fold (so the fold's collect_list is
    bounded at ``path_len`` structs — never a whole user history). The
    path count is map-side combinable, and the final top-k is a
    distributed TakeOrdered with a deterministic (count desc, path asc)
    tie-break — never a global sort materialization.
    """
    from ..schema import ts_micros

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prefix = (
        events.withColumn("ts_us", ts_micros(events))
        .select(
            "user_id",
            "ts_us",
            "event_id",
            "event_type",
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") <= F.lit(int(path_len)))
    )
    paths = (
        prefix.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_rn", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path"),
        )
        .filter(F.col("_n") == F.lit(int(path_len)))
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(int(k))
    )


def top_event_paths_sql(path_len: int = 3, k: int = 20) -> str:
    return f"""
    WITH ranked AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id,
               COUNT(*)::BIGINT AS n,
               STRING_AGG(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= {int(path_len)}
        GROUP BY user_id
    )
    SELECT path, COUNT(*)::BIGINT AS n_users
    FROM paths WHERE n = {int(path_len)}
    GROUP BY path
    ORDER BY n_users DESC, path ASC
    LIMIT {int(k)}
    """


def funnel_within(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    max_gap_us: int = 24 * 3600 * 1_000_000,
) -> DataFrame:
    """Time-bounded ordered funnel: :func:`funnel_counts` with the
    product-analytics constraint that each stage must happen within
    ``max_gap_us`` of the user's previous-stage ENTRY time
    (first-touch attribution: stage k anchors to the user's earliest
    qualifying stage-k event, so a later re-entry cannot reopen the
    window — the standard "converted within 24h of signup" funnel).

    Thin delegate: the bound is one extra predicate inside
    :func:`funnel_counts`'s chained running-min qualifiers — same
    one-scan plan, zero duplicated machinery (r5 review)."""
    return funnel_counts(events, steps, max_gap_us=max_gap_us)


def funnel_within_sql(
    steps: tuple[str, ...] = FUNNEL_STEPS,
    max_gap_us: int = 24 * 3600 * 1_000_000,
) -> str:
    return funnel_counts_sql(steps, max_gap_us=max_gap_us)
