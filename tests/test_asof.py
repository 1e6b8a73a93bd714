"""As-of join and resample/gap-fill unit tests on hand-computed frames."""

from myodish_peak_analysis_spark.operators.asof import asof_join, gap_fill, resample


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_tie_semantics(spark):
    left = _df(
        spark,
        [(1, 10, 1.0), (1, 20, 2.0), (1, 5, 3.0)],
        "k long, t long, v double",
    )
    right = _df(
        spark,
        [(1, 10, 100.0), (1, 15, 150.0)],
        "k long, t long, rv double",
    )
    out = {
        r.t: r.rv_asof
        for r in asof_join(left, right, on="t", by="k", right_cols=("rv",)).collect()
    }
    assert out[10] == 100.0  # tie: non-strict sees the equal-time right row
    assert out[20] == 150.0
    assert out[5] is None  # nothing prior


def test_asof_strict_hides_equal_time_row(spark):
    left = _df(spark, [(1, 10, 1.0)], "k long, t long, v double")
    right = _df(spark, [(1, 10, 100.0), (1, 9, 90.0)], "k long, t long, rv double")
    out = asof_join(
        left, right, on="t", by="k", right_cols=("rv",), strict=True
    ).collect()
    assert out[0].rv_asof == 90.0


def test_asof_null_payload_is_still_the_match(spark):
    # The most recent right row has a NULL value: the match must be that
    # row (returning NULL), not an older row with a value — DuckDB ASOF
    # semantics.
    left = _df(spark, [(1, 10, 1.0)], "k long, t long, v double")
    right = _df(spark, [(1, 5, None), (1, 1, 90.0)], "k long, t long, rv double")
    out = asof_join(left, right, on="t", by="k", right_cols=("rv",)).collect()
    assert out[0].rv_asof is None


def test_asof_null_timestamps_never_match(spark):
    left = _df(spark, [(1, 10, 1.0), (1, None, 2.0)], "k long, t long, v double")
    right = _df(spark, [(1, None, 99.0)], "k long, t long, rv double")
    out = {r.v: r.rv_asof for r in asof_join(left, right, on="t", by="k", right_cols=("rv",)).collect()}
    assert out[1.0] is None  # NULL-t right row is not a prior observation
    assert out[2.0] is None  # NULL-t left row matches nothing


def test_asof_tolerance_bounds_lookback(spark):
    """A match older than `tolerance` is discarded (boundary inclusive,
    pandas merge_asof semantics); newer matches are unaffected."""
    left = _df(
        spark,
        [(1, 100, 1.0), (1, 200, 2.0), (1, 205, 3.0)],
        "k long, t long, v double",
    )
    right = _df(
        spark,
        [(1, 90, 90.0), (1, 198, 198.0)],
        "k long, t long, rv double",
    )
    out = {
        r.t: r.rv_asof
        for r in asof_join(
            left, right, on="t", by="k", right_cols=("rv",), tolerance=10
        ).collect()
    }
    assert out[100] == 90.0  # age exactly == tolerance: kept
    assert out[200] == 198.0
    assert out[205] == 198.0  # age 7 <= 10
    out2 = {
        r.t: r.rv_asof
        for r in asof_join(
            left, right, on="t", by="k", right_cols=("rv",), tolerance=5
        ).collect()
    }
    assert out2[100] is None  # age 10 > 5: stale match discarded
    assert out2[200] == 198.0
    assert out2[205] is None  # age 7 > 5


def test_asof_forward_direction(spark):
    """direction='forward' attaches the nearest FOLLOWING right row,
    with tie visibility, strictness, and tolerance mirrored."""
    left = _df(
        spark,
        [(1, 10, 1.0), (1, 20, 2.0), (1, 30, 3.0)],
        "k long, t long, v double",
    )
    right = _df(
        spark,
        [(1, 12, 12.0), (1, 20, 20.0)],
        "k long, t long, rv double",
    )

    def run(**kw):
        return {
            r.t: r.rv_asof
            for r in asof_join(
                left, right, on="t", by="k", right_cols=("rv",),
                direction="forward", **kw
            ).collect()
        }

    out = run()
    assert out[10] == 12.0  # nearest following
    assert out[20] == 20.0  # tie visible (non-strict)
    assert out[30] is None  # nothing after
    strict = run(strict=True)
    assert strict[10] == 12.0
    assert strict[20] is None  # equal-time row hidden
    tol = run(tolerance=1)
    assert tol[10] is None  # age 2 > 1
    assert tol[20] == 20.0  # age 0 <= 1


def test_asof_forward_on_column_payload_not_negated(spark):
    """Listing the `on` column itself in right_cols must return TRUE `on`
    values under direction='forward' (the axis negation is undone for the
    payload too), and reserved internal names are rejected."""
    import pytest

    left = _df(spark, [(1, 10, 1.0), (1, 30, 3.0)], "k long, t long, v double")
    right = _df(spark, [(1, 12, 12.0)], "k long, t long, rv double")
    out = {
        r.t: (r.t_asof, r.rv_asof)
        for r in asof_join(
            left, right, on="t", by="k", right_cols=("t", "rv"),
            direction="forward",
        ).collect()
    }
    assert out[10] == (12, 12.0)  # not -12
    assert out[30] == (None, None)  # unmatched stays NULL
    # backward direction unaffected
    back = {
        r.t: r.t_asof
        for r in asof_join(
            left, right, on="t", by="k", right_cols=("t", "rv")
        ).collect()
    }
    assert back[30] == 12
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on="t", by="k", right_cols=("__r_on",))


def test_resample_negative_ts_floor_division(spark):
    df = _df(spark, [(1, -5, 1.0), (1, 5, 2.0)], "k long, t long, v double")
    r = {x.bucket: x.n for x in resample(df, "t", "v", "k", 10).collect()}
    assert r == {-1: 1, 0: 1}  # floor, not truncate-toward-zero


def test_resample_and_gap_fill(spark):
    df = _df(
        spark,
        [(1, 0, 10.0), (1, 5, 20.0), (1, 25, 40.0)],
        "k long, t long, v double",
    )
    r = resample(df, ts_col="t", value_col="v", by="k", bucket_width=10)
    got = {x.bucket: (x.n, x.avg_value) for x in r.collect()}
    assert got[0] == (2, 15.0) and got[2] == (1, 40.0)
    filled = gap_fill(r, by="k")
    rows = {x.bucket: (x.avg_value, x._filled) for x in filled.collect()}
    assert rows[1] == (15.0, False)  # gap bucket carried forward
    assert rows[2] == (40.0, True)


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof — an independent
    reference implementation of the exact semantics we claim (direction,
    inclusive tolerance, allow_exact_matches == not strict)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    for direction in ("backward", "forward"):
        for tolerance in (None, 7):
            for strict in (False, True):
                lt = pd.DataFrame(
                    {
                        "k": rng.integers(0, 3, 40),
                        "t": rng.choice(np.arange(0, 200), 40, replace=False).astype(
                            np.int64
                        ),
                    }
                ).sort_values("t")
                rt = pd.DataFrame(
                    {
                        "k": rng.integers(0, 3, 30),
                        "t": rng.choice(np.arange(0, 200), 30, replace=False).astype(
                            np.int64
                        ),
                    }
                ).sort_values("t")
                rt["rv"] = rt["t"].astype(float)
                exp = pd.merge_asof(
                    lt,
                    rt,
                    on="t",
                    by="k",
                    direction=direction,
                    tolerance=tolerance,
                    allow_exact_matches=not strict,
                )
                got = (
                    asof_join(
                        spark.createDataFrame(lt),
                        spark.createDataFrame(rt),
                        on="t",
                        by="k",
                        right_cols=("rv",),
                        strict=strict,
                        tolerance=tolerance,
                        direction=direction,
                    )
                    .toPandas()
                    .sort_values("t")
                    .reset_index(drop=True)
                )
                exp = exp.sort_values("t").reset_index(drop=True)
                lhs = got["rv_asof"].to_numpy(dtype=float)
                rhs = exp["rv"].to_numpy(dtype=float)
                assert ((lhs == rhs) | (np.isnan(lhs) & np.isnan(rhs))).all(), (
                    direction,
                    tolerance,
                    strict,
                )


def test_gap_fill_interpolate_linear_and_edges(spark):
    from myodish_peak_analysis_spark.operators.asof import (
        gap_fill_interpolate,
    )

    r = spark.createDataFrame(
        # user 1: observed at buckets 0 (v=1.0) and 3 (v=4.0);
        # gaps 1, 2 interpolate to 2.0, 3.0
        # user 2: single observation -> nothing to fill
        [(1, 0, 1.0), (1, 3, 4.0), (2, 7, 9.0)],
        "user_id long, bucket long, avg_value double",
    )
    out = {
        (r_.user_id, r_.bucket): r_
        for r_ in gap_fill_interpolate(r, by="user_id").collect()
    }
    assert out[(1, 0)].avg_value == 1.0 and out[(1, 0)].observed
    assert out[(1, 1)].avg_value == 2.0 and not out[(1, 1)].observed
    assert out[(1, 2)].avg_value == 3.0 and not out[(1, 2)].observed
    assert out[(1, 3)].avg_value == 4.0 and out[(1, 3)].observed
    assert out[(2, 7)].avg_value == 9.0
    assert len(out) == 5


def test_resample_ohlc_selection_semantics(spark):
    from myodish_peak_analysis_spark.operators.asof import resample_ohlc

    rows = [
        # user 1, bucket 0 (width 10): ts 1,5,9 -> open=3.0 close=7.0
        (1, 1, 1, 3.0),
        (2, 5, 1, 9.0),
        (3, 9, 1, 7.0),
        # same ts tie inside bucket: event_id breaks it (id 4 first)
        (4, 12, 1, 1.0),
        (5, 12, 1, 2.0),
        # user 2: single event
        (6, 3, 2, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, value double"
    )
    out = {
        (r.user_id, r.bucket): r
        for r in resample_ohlc(df, "ts_us", "value", "user_id", 10).collect()
    }
    b0 = out[(1, 0)]
    assert (b0.open, b0.high, b0.low, b0.close, b0.n) == (3.0, 9.0, 3.0, 7.0, 3)
    b1 = out[(1, 1)]
    assert (b1.open, b1.close, b1.n) == (1.0, 2.0, 2)
    b2 = out[(2, 0)]
    assert (b2.open, b2.high, b2.low, b2.close, b2.n) == (5.0, 5.0, 5.0, 5.0, 1)
