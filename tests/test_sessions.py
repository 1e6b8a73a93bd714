"""Sessionization unit tests on hand-computed event sequences."""

from myodish_peak_analysis_spark.operators.sessions import (
    session_stats,
    with_sessions,
)

US = 1_000_000_000  # 1 second in nanos (raw harness ts unit)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, value double"
    )


def test_gap_rule_splits_sessions(spark):
    rows = [
        (0, 0 * US, 1, 1.0),
        (1, 10 * US, 1, 1.0),  # same session (gap 10s < 1800s)
        (2, 2000 * US, 1, 1.0),  # new session (gap 1990s)
        (3, 5 * US, 2, 1.0),  # other user: own session
    ]
    out = with_sessions(_events(spark, rows)).collect()
    seq = {r.event_id: r.session_seq for r in out}
    assert seq[0] == seq[1] == 1
    assert seq[2] == 2
    assert seq[3] == 1


def test_session_stats_aggregates(spark):
    rows = [
        (0, 0 * US, 1, 2.5),
        (1, 60 * US, 1, 1.5),
        (2, 10_000 * US, 1, 1.0),
    ]
    stats = {
        (r.user_id, r.session_seq): r for r in session_stats(_events(spark, rows)).collect()
    }
    s1 = stats[(1, 1)]
    assert s1.n_events == 2
    assert s1.duration_s == 60.0
    assert s1.sum_value == 4.0
    assert stats[(1, 2)].n_events == 1


def test_funnel_counts_no_backtracking(spark):
    from myodish_peak_analysis_spark.operators.sessions import funnel_counts

    us = 1_000  # 1 microsecond in nanos
    rows = [
        # user 1: view -> click -> purchase, in order: converts fully
        (1, "view", 1 * us), (1, "click", 2 * us), (1, "purchase", 3 * us),
        # user 2: click BEFORE first view never counts; purchase without
        # a qualifying click never counts
        (2, "click", 1 * us), (2, "view", 2 * us), (2, "purchase", 3 * us),
        # user 3: only a view
        (3, "view", 5 * us),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    got = {r.step: r.n_users for r in funnel_counts(ev).collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_cohort_retention_triangle(spark):
    from myodish_peak_analysis_spark.operators.sessions import cohort_retention

    day = 86_400 * 1_000_000_000  # one day in nanos
    rows = [
        (1, "view", 0 * day + 5), (1, "view", 1 * day + 9), (1, "click", 3 * day),
        (1, "view", 1 * day + 7),  # same user+day dedups
        (2, "view", 1 * day + 1),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    got = {
        (r.cohort_day, r.day_offset): r.n_users for r in cohort_retention(ev).collect()
    }
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1}


def _typed_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )


def test_event_transitions_counts_and_probs(spark):
    from myodish_peak_analysis_spark.operators.sessions import (
        event_transitions,
    )

    rows = [
        # user 1: a -> b -> a -> c
        (0, 0 * US, 1, "a"),
        (1, 1 * US, 1, "b"),
        (2, 2 * US, 1, "a"),
        (3, 3 * US, 1, "c"),
        # user 2: a -> b  (no cross-user pair with user 1's stream)
        (4, 0 * US, 2, "a"),
        (5, 1 * US, 2, "b"),
    ]
    out = {
        (r.src, r.dst): (r.n, r.p)
        for r in event_transitions(_typed_events(spark, rows)).collect()
    }
    # out of 'a': a->b twice, a->c once
    assert out[("a", "b")] == (2, 0.666667)
    assert out[("a", "c")] == (1, 0.333333)
    assert out[("b", "a")] == (1, 1.0)
    assert len(out) == 3


def test_top_event_paths_prefix_and_ties(spark):
    from myodish_peak_analysis_spark.operators.sessions import (
        top_event_paths,
    )

    rows = [
        # two users share prefix a>b>c (user 1 has a 4th event: ignored)
        (0, 0 * US, 1, "a"), (1, 1 * US, 1, "b"), (2, 2 * US, 1, "c"),
        (3, 3 * US, 1, "z"),
        (4, 0 * US, 2, "a"), (5, 1 * US, 2, "b"), (6, 2 * US, 2, "c"),
        # one user with path a>a>a
        (7, 0 * US, 3, "a"), (8, 1 * US, 3, "a"), (9, 2 * US, 3, "a"),
        # under path_len events: excluded entirely
        (10, 0 * US, 4, "q"), (11, 1 * US, 4, "q"),
    ]
    out = top_event_paths(_typed_events(spark, rows), path_len=3, k=10).collect()
    assert [(r.path, r.n_users) for r in out] == [
        ("a>b>c", 2),
        ("a>a>a", 1),
    ]


def test_funnel_within_time_bound_binds(spark):
    import datetime as dt

    from myodish_peak_analysis_spark.operators.sessions import (
        funnel_counts,
        funnel_within,
    )

    base = dt.datetime(2026, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1 converts fully within an hour each step
        (1, "view", base), (1, "cart", base + h), (1, "purchase", base + 2 * h),
        # user 2: cart comes 3 days after view -> excluded by 24h bound
        (2, "view", base), (2, "cart", base + dt.timedelta(days=3)),
        (2, "purchase", base + dt.timedelta(days=3, hours=1)),
    ]
    ev = spark.createDataFrame(
        [(i, u, t, ts) for i, (u, t, ts) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    unbounded = {r.step: r.n_users for r in funnel_counts(ev, ("view", "cart", "purchase")).collect()}
    bounded = {r.step: r.n_users for r in funnel_within(ev, ("view", "cart", "purchase")).collect()}
    assert unbounded == {1: 2, 2: 2, 3: 2}
    assert bounded == {1: 2, 2: 1, 3: 1}
