"""Unit tests for the log-analytics operators (histogram, bucketed
range join, JSON props, two-phase top-k) and the dataset-composition
operators (stratified sampling, mixture weights) on hand-computed
inputs."""

from pyspark.sql import Window, functions as F

from myodish_peak_analysis_spark.llm.sampling import (
    HASH_MULTIPLIER,
    mixture_weights,
    stratified_sample,
)
from myodish_peak_analysis_spark.operators.analytics import (
    json_props_stats,
    range_pairs,
    topk_per_group,
    value_histogram,
)


def test_value_histogram_bins_and_stats(spark):
    df = spark.createDataFrame(
        [(0.0,), (24.9,), (25.0,), (30.0,), (-1.0,)], "value double"
    )
    out = {r.bin: r for r in value_histogram(df, bin_width=25.0).collect()}
    assert set(out) == {-1, 0, 1}
    assert out[0].n == 2 and out[0].min_value == 0.0 and out[0].max_value == 24.9
    assert out[1].n == 2 and out[1].avg_value == 27.5
    assert out[-1].n == 1  # floor(-1/25) = -1, not truncation toward 0


def _pair_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )


def test_range_pairs_matches_naive_join(spark):
    # Timestamps straddle bucket boundaries on purpose; window = 100 us.
    rows = [
        (0, 1, 10, 1.0),
        (1, 1, 95, 2.0),   # bucket 0; pairs with 0 (gap 85)
        (2, 1, 105, 3.0),  # bucket 1; pairs with 0 (gap 95, cross-bucket) and 1
        (3, 1, 300, 4.0),  # isolated
        (4, 2, 12, 5.0),   # other user: no cross-user pairs
        (5, 1, 105, 6.0),  # tie with 2: ordered by event_id, single pair
    ]
    df = _pair_events(spark, rows)
    got = {
        (r.left_id, r.right_id, r.gap_us)
        for r in range_pairs(df, window_us=100).collect()
    }
    naive = df.alias("a").join(
        df.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts_us") >= F.col("a.ts_us"))
        & (F.col("b.ts_us") - F.col("a.ts_us") <= 100)
        & (
            (F.col("a.ts_us") < F.col("b.ts_us"))
            | (
                (F.col("a.ts_us") == F.col("b.ts_us"))
                & (F.col("a.event_id") < F.col("b.event_id"))
            )
        ),
    )
    want = {
        (r[0], r[1], r[2])
        for r in naive.select(
            "a.event_id", "b.event_id", F.col("b.ts_us") - F.col("a.ts_us")
        ).collect()
    }
    assert got == want
    assert (0, 2, 95) in got  # the cross-bucket pair is found exactly once
    assert (2, 5, 0) in got and (5, 2, 0) not in got  # tie-break once


def test_json_props_stats(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 1}'), ("a", '{"k": 3}'), ("b", '{"k": 10}')],
        "event_type string, props string",
    )
    out = {r.event_type: r for r in json_props_stats(df).collect()}
    assert out["a"].n == 2 and out["a"].sum_k == 4 and out["a"].avg_k == 2.0
    assert out["b"].min_k == 10 and out["b"].max_k == 10


def test_topk_per_group_equals_single_window(spark):
    # 1 hot group (40 rows) + 1 small group; ties in the order column.
    rows = [(i, "hot", i % 7) for i in range(40)] + [(100, "cold", 5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = topk_per_group(df, "source", "n_chars", "doc_id", k=3, salt=4)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    want = (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", "s0") for i in range(1000)],
        "doc_id long, lang string, source string",
    )
    out = stratified_sample(df, {"en": 100, "*": 500})
    kept = out.collect()
    # Deterministic: same rows on a second run.
    assert sorted(r.doc_id for r in kept) == sorted(
        r.doc_id for r in stratified_sample(df, {"en": 100, "*": 500}).collect()
    )
    # Every kept row satisfies its stratum's rate; buckets match the hash.
    for r in kept:
        assert r.permille == (r.doc_id * HASH_MULTIPLIER) % 1000
        assert r.permille < (100 if r.lang == "en" else 500)
    # Rates are approximately honored (well-mixed hash).
    n_en = sum(1 for r in kept if r.lang == "en")
    n_fr = len(kept) - n_en
    assert 20 <= n_en <= 80  # ~50 expected of 500 candidates
    assert 175 <= n_fr <= 325  # ~250 expected


def test_mixture_weights_uniformize(spark):
    df = spark.createDataFrame(
        [(1, "a", 300), (2, "a", 300), (3, "b", 200), (4, "c", 100)],
        "doc_id long, source string, n_chars long",
    )
    out = {r.source: r for r in mixture_weights(df).collect()}
    total, nsrc = 900, 3
    assert out["a"].n_docs == 2 and out["a"].src_chars == 600
    for s, chars in (("a", 600), ("b", 200), ("c", 100)):
        assert out[s].weight == total / (nsrc * chars)
    # Resampling by weight equalizes the mixture: weight * src_chars const.
    sizes = {s: out[s].weight * out[s].src_chars for s in out}
    assert max(sizes.values()) - min(sizes.values()) < 1e-9


def test_grouped_median_odd_even_groups(spark):
    rows = [
        (0, 1, 5.0), (1, 1, 1.0), (2, 1, 3.0),          # odd: median 3.0
        (3, 2, 4.0), (4, 2, 1.0), (5, 2, 2.0), (6, 2, 100.0),  # even: 3.0
        (7, 3, 7.5),                                     # singleton
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    from myodish_peak_analysis_spark.operators.analytics import grouped_median

    out = {r.user_id: r for r in grouped_median(df).collect()}
    assert out[1].median == 3.0 and out[1].n == 3
    assert out[2].median == 3.0 and out[2].n == 4  # (2+4)/2
    assert out[3].median == 7.5 and out[3].n == 1


def test_tfidf_top_terms_ranks_distinctive_terms(spark):
    from myodish_peak_analysis_spark.llm.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (0, "common rare rare"),
            (1, "common unique"),
            (2, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=1).collect()
    best = {r.doc_id: r for r in out}
    # 'rare' (df=1, tf=2) beats 'common' (df=3) for doc 0; 'unique' for doc 1.
    assert best[0].term == "rare" and best[0].score == 2 * 3 * 1_000_000 // 1
    assert best[1].term == "unique"
    assert best[2].term == "common"  # only term present
    assert all(r.rank == 1 for r in out)


def test_contamination_pairs_counts_distinct_shared_grams(spark):
    from myodish_peak_analysis_spark.llm.text import contamination_pairs

    docs = spark.createDataFrame(
        [
            # doc 0 is the benchmark (0 % 25 == 0)
            (0, "a b c d e f"),
            # shares grams "a b c d" and "b c d e" with the benchmark;
            # the repeated window contributes only DISTINCT grams
            (1, "a b c d e a b c d e"),
            (2, "x y z w v u"),  # no overlap
        ],
        "doc_id long, text string",
    )
    out = contamination_pairs(docs, gram=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.bench_id) == (1, 0)
    # doc 1 distinct shared grams: 'a b c d', 'b c d e' -> 2; and
    # 'c d e a', 'd e a b', 'e a b c' don't appear in the benchmark.
    assert r.n_shared == 2
    assert r.bench_grams == 3  # benchmark has 3 distinct 4-grams


def test_corpus_rollup_granularities(spark):
    from myodish_peak_analysis_spark.operators.analytics import corpus_rollup

    docs = spark.createDataFrame(
        [(0, "a", "en", "web", 10), (1, "b", "en", "web", 20), (2, "c", "de", "books", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {(r.source, r.lang, r.gid): r for r in corpus_rollup(docs).collect()}
    assert rows[("web", "en", 0)].n_docs == 2
    assert rows[("web", "en", 0)].total_chars == 30
    assert rows[("web", None, 1)].n_docs == 2          # per-source rollup
    assert rows[(None, "de", 2)].total_chars == 5      # per-lang rollup
    grand = rows[(None, None, 3)]
    assert (grand.n_docs, grand.total_chars, grand.max_chars) == (3, 35, 20)


def test_grouped_percentiles_hand_computed(spark):
    from myodish_peak_analysis_spark.operators.analytics import grouped_percentiles

    # group "a": values 1..10 -> p50 = value at ceil(5.0)=rank 5 -> 5.0;
    # p95 -> ceil(9.5)=rank 10 -> 10.0; p99 -> ceil(9.9)=10 -> 10.0
    rows = [(i, "a", float(i)) for i in range(1, 11)] + [(99, "b", 7.0)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r.event_type: r for r in grouped_percentiles(ev).collect()}
    assert (got["a"].p50, got["a"].p95, got["a"].p99) == (5.0, 10.0, 10.0)
    assert got["a"].n == 10
    assert (got["b"].p50, got["b"].p95, got["b"].p99) == (7.0, 7.0, 7.0)


def test_user_event_pivot_counts_and_zeros(spark):
    from myodish_peak_analysis_spark.operators.analytics import user_event_pivot

    rows = [(1, 10, "view"), (2, 10, "view"), (3, 10, "click"), (4, 20, "purchase")]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    got = {r.user_id: r for r in user_event_pivot(ev).collect()}
    assert (got[10].n_view, got[10].n_click, got[10].n_purchase) == (2, 1, 0)
    assert (got[20].n_purchase, got[20].n_view) == (1, 0)


def test_sketch_families_track_exact_answers(spark):
    """The approximate companions of the exact operators: HLL distinct
    counts and quantile sketches are the 100 TB fallback when exact
    rank/ distinct shuffles are too expensive. Approximate by design ->
    no DuckDB hash oracle; this accuracy gate is their check."""
    df = spark.range(20_000).selectExpr(
        "id % 1000 AS user_id", "CAST(id % 337 AS DOUBLE) AS value"
    )
    exact = df.selectExpr("count(distinct user_id) AS d").first().d
    approx = df.selectExpr(
        "approx_count_distinct(user_id, 0.02) AS d"
    ).first().d
    assert abs(approx - exact) / exact < 0.05

    [p50, p95] = df.stat.approxQuantile("value", [0.5, 0.95], 0.01)
    # true distribution is uniform over 0..336
    assert abs(p50 - 168) < 12 and abs(p95 - 319) < 12


def test_user_value_zscores_exact_moments(spark):
    import pytest

    from myodish_peak_analysis_spark.operators.analytics import user_value_zscores

    ev = spark.createDataFrame(
        [(1, 1, 1.0), (2, 1, 2.0), (3, 1, 3.0), (4, 2, 9.0)],
        "event_id long, user_id long, value double",
    )
    got = {r.event_id: r.zscore for r in user_value_zscores(ev).collect()}
    # user 1: mean 2, population sigma = sqrt(2/3)
    assert got[1] == pytest.approx(-1.224745)
    assert got[2] == 0.0
    assert got[3] == pytest.approx(1.224745)
    assert got[4] is None  # single event -> zero variance -> NULL


def test_user_value_zscores_null_values_do_not_fabricate_variance(spark):
    from myodish_peak_analysis_spark.operators.analytics import user_value_zscores

    ev = spark.createDataFrame(
        [(1, 1, 5.0), (2, 1, 5.0), (3, 1, None)],
        "event_id long, user_id long, value double",
    )
    got = {r.event_id: r.zscore for r in user_value_zscores(ev).collect()}
    # two identical observed values: zero variance -> NULL z for all
    assert got[1] is None and got[2] is None and got[3] is None


def test_mad_outliers_known_values(spark):
    from myodish_peak_analysis_spark.operators.analytics import mad_outliers

    ev = spark.createDataFrame(
        [
            # user 1: values 1..7 plus a wild 100 -> median of
            # [1,2,3,4,5,6,7,100] = 4.5; devs [3.5,2.5,1.5,.5,.5,1.5,2.5,95.5]
            # -> MAD = median = 2.0; outliers: dev > 6.0 -> only 100.
            *[(i, 1, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 100])],
            # user 2: constant values -> MAD 0; no dev > 0 is false for
            # equal values (0 > 0 fails) -> zero outliers.
            (100, 2, 5.0),
            (101, 2, 5.0),
            (102, 2, 5.0),
        ],
        "event_id long, user_id long, value double",
    )
    out = {
        r.user_id: (r.n, r.median, r.mad, r.n_outliers)
        for r in mad_outliers(ev).collect()
    }
    assert out[1] == (8, 4.5, 2.0, 1)
    assert out[2] == (3, 5.0, 0.0, 0)


def test_trailing_window_stats_range_frame(spark):
    from pyspark.sql import functions as F

    from myodish_peak_analysis_spark.operators.analytics import (
        trailing_window_stats,
    )

    base = 1_000_000_000_000  # µs epoch
    h = 3600 * 1_000_000
    rows = [
        # user 1: events at t0, t0+30min, t0+2h
        (1, 1, base, 10.0),
        (2, 1, base + h // 2, 20.0),
        (3, 1, base + 2 * h, 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    ).select(
        "event_id", "user_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"), "value",
    )
    out = {
        r.event_id: (r.n_trailing, r.sum_trailing)
        for r in trailing_window_stats(ev).collect()
    }
    assert out[1] == (1, 10.0)
    assert out[2] == (2, 30.0)   # t0 is inside the trailing hour
    assert out[3] == (1, 5.0)    # both earlier events aged out
