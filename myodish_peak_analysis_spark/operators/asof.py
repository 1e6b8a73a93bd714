"""General-purpose as-of join + time-bucket resampling with gap-fill.

Spark has no native ASOF JOIN (DuckDB does; its oracle uses the real
thing). The standard scalable formulation is the union-sort trick:

    tag left rows (side=1) and right rows (side=0), union them, and per
    ``by``-key take the running LAST right-payload at or before each
    row; left rows then carry the as-of match. One shuffle on the key,
    one in-partition sort — same cost profile as any window stage, and
    strictly better than the naive range-join (which explodes to
    O(left x right) per key before filtering).

This is exactly the formulation behind the TTP/TTR crossing searches
(operators/attributes.py); here it is exposed as a first-class operator
over arbitrary tables.

Resampling (``resample_lttb``-style down-bucketing + last-observation-
carried-forward gap fill) composes the same primitives: bucket by
integer-divided time, aggregate, then ``last(value, ignorenulls)`` over
the bucket sequence to fill empty buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: tuple[str, ...],
    suffix: str = "_asof",
    strict: bool = False,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest ``on``
    value <= the left row's (``<`` when ``strict``), within the same
    ``by`` group. Left rows without a prior right row keep NULLs.
    ``tolerance`` (same units as ``on``) additionally bounds the
    lookback: a match older than ``left.on - tolerance`` is discarded —
    pandas ``merge_asof(tolerance=...)`` semantics, the usual guard in
    sensor fusion so a stale reading never attaches to a fresh event.
    The bound costs one comparison on the already-computed running
    match: no extra shuffle, sort, or join.

    ``direction="forward"`` flips the search to the NEAREST FOLLOWING
    right row (>= / > when strict, lookahead bounded by ``tolerance``) —
    implemented by negating the ``on`` axis and reusing the backward
    machinery verbatim, so both directions share one code path and one
    plan shape (negation preserves ties, strictness, and the tolerance
    age formula). When ``on`` itself appears in ``right_cols``, its
    ``{on}{suffix}`` payload is un-negated on the way out along with the
    top-level column, so forward results carry true ``on`` values.

    Ordering contract: ties on ``on`` between a left and a right row
    resolve with the right row visible (non-strict) / hidden (strict) —
    matching DuckDB's ``ASOF JOIN ... ON l.on >= r.on`` semantics.

    Preconditions (enforced by construction in the callers, documented
    here): the right side must be UNIQUE per ``(by, on)`` — duplicate
    right keys make the match shuffle-order-dependent (pre-aggregate
    with ``max_by`` as ``q_asof_view_before_purchase`` does) — and right
    rows with a NULL ``on`` are dropped (a NULL timestamp can never be
    "the most recent prior"; DuckDB ASOF agrees: ``l.on >= NULL`` is
    never true).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"__r_on", "_side", "_r_payload", "_match"}
    bad = reserved.intersection(right_cols)
    if bad:
        raise ValueError(f"right_cols may not use reserved names: {sorted(bad)}")
    if direction == "forward":
        out = asof_join(
            left.withColumn(on, -F.col(on)),
            right.withColumn(on, -F.col(on)),
            on=on,
            by=by,
            right_cols=right_cols,
            suffix=suffix,
            strict=strict,
            tolerance=tolerance,
            direction="backward",
        )
        out = out.withColumn(on, -F.col(on))
        if on in right_cols:
            # the payload rode the negated axis; flip it back (NULL-safe:
            # -NULL stays NULL for unmatched rows)
            out = out.withColumn(f"{on}{suffix}", -F.col(f"{on}{suffix}"))
        return out

    lt = left.withColumn("_side", F.lit(1))
    rt = (
        right.filter(F.col(on).isNotNull())
        .select(
            by,
            on,
            # One struct payload: stays non-null for the running `last`
            # even when every payload FIELD is NULL, so a right row with
            # a NULL value is still the match (its NULL is returned)
            # rather than being skipped for an older row.
            F.struct(
                *[F.col(c).alias(c) for c in right_cols],
                F.col(on).alias("__r_on"),
            ).alias("_r_payload"),
        )
        .withColumn("_side", F.lit(0))
    )
    lt_cols = lt.columns
    for c in rt.columns:
        if c not in lt_cols:
            lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    for c in lt_cols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    rt = rt.select(*lt.columns)  # align column order for union
    # Sort: right rows before left rows at equal `on` (non-strict makes
    # the same-timestamp right row visible); strict flips that.
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    u = lt.union(rt)
    w = (
        Window.partitionBy(by)
        # nulls_last: a left row with a NULL `on` must not see the whole
        # right side (and right NULL-`on` rows were dropped above).
        .orderBy(F.col(on).asc_nulls_last(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn(
        "_match",
        F.when(
            F.col(on).isNotNull(),  # a NULL-`on` left row matches nothing
            F.last(
                F.when(F.col("_side") == 0, F.col("_r_payload")), ignorenulls=True
            ).over(w),
        ),
    )
    if tolerance is not None:
        u = u.withColumn(
            "_match",
            F.when(
                F.col(on) - F.col("_match.__r_on") <= F.lit(int(tolerance)),
                F.col("_match"),
            ),
        )
    for c in right_cols:
        u = u.withColumn(f"{c}{suffix}", F.col(f"_match.{c}"))
    return u.filter(F.col("_side") == 1).drop("_side", "_r_payload", "_match")


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: str,
    bucket_width: int,
) -> DataFrame:
    """Downsample to fixed buckets (``ts DIV width``) with avg/min/max/
    count per (key, bucket) — map-side combinable, one shuffle."""
    # exact integer FLOOR division via the pmod identity: plain DIV (and
    # DuckDB's //) truncate toward zero, which would merge the buckets
    # either side of t=0 into one double-width bucket; float division +
    # cast additionally loses precision past 2^53 (nanosecond longs)
    w = int(bucket_width)
    bucket = F.expr(f"({ts_col} - pmod({ts_col}, {w})) DIV {w}")
    return (
        df.withColumn("_bucket", bucket)
        .groupBy(by, "_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .withColumnRenamed("_bucket", "bucket")
    )


def _densify(resampled: DataFrame, by: str, bucket_col: str) -> DataFrame:
    """Shared densify step for both gap-fill modes: per-key min/max
    bucket sequence exploded into a dense axis (no driver-side loop),
    left-joined back with an ``_obs`` marker — the marker comes from
    the join side, not from any value column, because a
    genuinely-observed bucket can carry NULL values."""
    bounds = resampled.groupBy(by).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    dense = bounds.select(
        by, F.explode(F.expr("sequence(_lo, _hi)")).alias(bucket_col)
    )
    return dense.join(
        resampled.withColumn("_obs", F.lit(True)), [by, bucket_col], "left"
    )


def gap_fill(
    resampled: DataFrame,
    by: str,
    bucket_col: str = "bucket",
    fill_cols: tuple[str, ...] = ("avg_value",),
) -> DataFrame:
    """Densify the bucket axis per key (sequence join) and forward-fill
    the value columns (last observation carried forward)."""
    joined = _densify(resampled, by, bucket_col)
    w = (
        Window.partitionBy(by)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn("_filled", F.coalesce(F.col("_obs"), F.lit(False))).drop(
        "_obs"
    )
    for c in fill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def gap_fill_interpolate(
    resampled: DataFrame,
    by: str,
    bucket_col: str = "bucket",
    value_col: str = "avg_value",
) -> DataFrame:
    """Densify the bucket axis per key and LINEARLY INTERPOLATE the
    value column across gaps (the other classic fill mode next to
    :func:`gap_fill`'s LOCF): a missing bucket b between observations
    (pb, pv) and (nb, nv) gets ``pv + (nv-pv)·(b-pb)/(nb-pb)``; buckets
    before the first / after the last observation stay NULL (no
    extrapolation).

    The "next" observation is found with a DESCENDING-sort running
    ``last(..., ignorenulls)`` frame — the same trick as
    ``operators/attributes.with_crossings`` — never an
    UnboundedFollowing frame (banned repo-wide: Spark re-evaluates
    growing-tail frames quadratically). Two in-partition window passes
    over the dense axis, one sequence-explode join — no driver loop.
    Determinism: both engines evaluate the identical interpolation
    expression on identical doubles; quantization is
    ``floor(x·1e6 + 0.5)/1e6`` rather than ROUND — floor is
    IEEE-defined on identical doubles, while engine ROUND
    implementations disagree on half-boundary doubles (Spark rounds
    the shortest-decimal BigDecimal, DuckDB the binary double).
    """
    joined = _densify(resampled, by, bucket_col).withColumn(
        "_observed", F.coalesce(F.col("_obs"), F.lit(False))
    )
    v = F.col(value_col)
    obs_b = F.when(v.isNotNull(), F.col(bucket_col))
    obs_v = F.when(v.isNotNull(), v)
    fwd = (
        Window.partitionBy(by)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(by)
        .orderBy(F.col(bucket_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        joined.withColumn("_pb", F.last(obs_b, ignorenulls=True).over(fwd))
        .withColumn("_pv", F.last(obs_v, ignorenulls=True).over(fwd))
        .withColumn("_nb", F.last(obs_b, ignorenulls=True).over(bwd))
        .withColumn("_nv", F.last(obs_v, ignorenulls=True).over(bwd))
    )
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (
        (F.col(bucket_col) - F.col("_pb"))
        / (F.col("_nb") - F.col("_pb"))
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(F.col("_pb").isNotNull() & F.col("_nb").isNotNull(), interp)
    )
    quantized = F.floor(filled * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        out.withColumn(value_col, quantized)
        .drop("_obs", "_pb", "_pv", "_nb", "_nv")
        .withColumnRenamed("_observed", "observed")
    )


def resample_ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: str,
    bucket_width: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Fixed-bucket OHLC downsample: per (key, bucket) the opening
    (first by time), high, low and closing (last by time) values plus
    the count — the classic finance-style resample mode next to
    :func:`resample`'s avg/min/max.

    Open/close are pure row SELECTIONS (no arithmetic), deterministic
    under ties via the (ts, id) ordering, so the oracle comparison is
    bit-exact with no rounding. Scale: one hash shuffle on (key,
    bucket); both row_number windows reuse that partitioning with one
    in-partition sort each (ascending + descending — the descending
    twin replaces a last_value/UnboundedFollowing frame, banned
    repo-wide); the final aggregate is map-side combinable.
    """
    w = int(bucket_width)
    bucket = F.expr(f"({ts_col} - pmod({ts_col}, {w})) DIV {w}")
    base = df.select(
        F.col(by),
        bucket.alias("bucket"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    asc = Window.partitionBy(by, "bucket").orderBy(
        F.col("_ts").asc(), F.col("_id").asc()
    )
    desc = Window.partitionBy(by, "bucket").orderBy(
        F.col("_ts").desc(), F.col("_id").desc()
    )
    marked = base.withColumn("_ra", F.row_number().over(asc)).withColumn(
        "_rd", F.row_number().over(desc)
    )
    return marked.groupBy(by, "bucket").agg(
        F.max(F.when(F.col("_ra") == 1, F.col("_v"))).alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max(F.when(F.col("_rd") == 1, F.col("_v"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )
