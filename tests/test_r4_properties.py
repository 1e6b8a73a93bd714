"""Randomized reference comparisons for the round-4 operators: each
Spark operator is checked against an independent brute-force
Python/NumPy/pandas formulation on seeded random inputs — a different
failure surface than the DuckDB oracle (which shares the SQL
formulation's blind spots)."""

from collections import Counter, defaultdict

import numpy as np
import pandas as pd


def test_gap_fill_interpolate_matches_numpy_interp(spark):
    from myodish_peak_analysis_spark.operators.asof import (
        gap_fill_interpolate,
    )

    rng = np.random.default_rng(41)
    rows, expect = [], {}
    for key in range(8):
        buckets = np.sort(
            rng.choice(np.arange(0, 40), size=rng.integers(1, 12), replace=False)
        )
        vals = np.round(rng.normal(0, 10, buckets.size), 6)
        for b, v in zip(buckets, vals):
            rows.append((key, int(b), float(v)))
        lo, hi = int(buckets[0]), int(buckets[-1])
        # same algebraic form as the operator (pv + (nv-pv)*frac) so the
        # IEEE result is bit-identical pre-quantization; np.interp's
        # slope-based form differs by ~1 ulp, which the floor-quantizer
        # legitimately snaps to a different 1e-6 step at half boundaries
        for b in range(lo, hi + 1):
            j = int(np.searchsorted(buckets, b))
            if b in buckets:
                v = float(vals[j])
            else:
                pb, nb = float(buckets[j - 1]), float(buckets[j])
                pv, nv = float(vals[j - 1]), float(vals[j])
                v = pv + (nv - pv) * ((b - pb) / (nb - pb))
            expect[(key, int(b))] = np.floor(v * 1e6 + 0.5) / 1e6
    df = spark.createDataFrame(rows, "user_id long, bucket long, avg_value double")
    out = {
        (r.user_id, r.bucket): r.avg_value
        for r in gap_fill_interpolate(df, by="user_id").collect()
    }
    assert set(out) == set(expect)
    for k in expect:
        assert out[k] is not None and abs(out[k] - expect[k]) < 1e-9, k


def test_resample_ohlc_matches_pandas(spark):
    from myodish_peak_analysis_spark.operators.asof import resample_ohlc

    rng = np.random.default_rng(42)
    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts_us": rng.integers(0, 1000, n),
            "user_id": rng.integers(0, 6, n),
            "value": np.round(rng.normal(0, 5, n), 6),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r.user_id, r.bucket): (r.open, r.high, r.low, r.close, r.n)
        for r in resample_ohlc(df, "ts_us", "value", "user_id", 100).collect()
    }
    pdf["bucket"] = pdf["ts_us"] // 100
    pdf = pdf.sort_values(["ts_us", "event_id"])
    exp = {}
    for (u, b), g in pdf.groupby(["user_id", "bucket"]):
        exp[(u, b)] = (
            g["value"].iloc[0],
            g["value"].max(),
            g["value"].min(),
            g["value"].iloc[-1],
            len(g),
        )
    assert got == exp


def test_peak_interval_stats_matches_numpy(spark):
    from myodish_peak_analysis_spark.operators.peaks import (
        peak_interval_stats,
    )

    rng = np.random.default_rng(43)
    rows, exp = [], {}
    for ch in range(6):
        idxs = np.sort(
            rng.choice(np.arange(0, 5000), size=rng.integers(1, 40), replace=False)
        )
        rows += [(ch, int(i)) for i in idxs]
        d = np.diff(idxs)
        if d.size:
            exp[ch] = (
                d.size,
                round(d.sum() / d.size, 6),
                round(float(np.sqrt(d.size * (d * d).sum() - d.sum() ** 2)) / d.size, 6),
                round(100.0 * d.size / d.sum(), 6),
            )
    df = spark.createDataFrame(rows, "channel_id long, peak_idx long")
    got = {
        r.channel_id: (r.n_intervals, r.mean_ipi, r.std_ipi, r.mean_rate_hz)
        for r in peak_interval_stats(df).collect()
    }
    assert got == exp


def test_event_transitions_matches_pandas_counter(spark):
    from myodish_peak_analysis_spark.operators.sessions import (
        event_transitions,
    )

    rng = np.random.default_rng(44)
    types = list("abcd")
    rows, pair_counts = [], Counter()
    eid = 0
    for user in range(15):
        seq = [types[i] for i in rng.integers(0, 4, rng.integers(1, 20))]
        for i, t in enumerate(seq):
            rows.append((eid, (i + 1) * 1_000_000_000, user, t))
            eid += 1
        pair_counts.update(zip(seq, seq[1:]))
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )
    out = {(r.src, r.dst): (r.n, r.p) for r in event_transitions(df).collect()}
    src_totals = defaultdict(int)
    for (s, _), n in pair_counts.items():
        src_totals[s] += n
    assert {k: v[0] for k, v in out.items()} == dict(pair_counts)
    for (s, d), (n, p) in out.items():
        assert p == round(n / src_totals[s], 6)


def test_repetition_profile_matches_brute_counter(spark):
    from myodish_peak_analysis_spark.llm import text

    rng = np.random.default_rng(45)
    vocab = list("xyzw")
    docs = []
    for i in range(12):
        words = [vocab[j] for j in rng.integers(0, 4, rng.integers(1, 25))]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.n): (r.top_gram, r.n_occurrences, r.top_gram_char_frac)
        for r in text.repetition_profile(df).collect()
    }
    exp = {}
    for i, t in docs:
        words = t.split(" ")
        for n in (2, 3):
            if len(words) < n:
                continue
            grams = [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]
            c = Counter(grams)
            best = max(c.items(), key=lambda kv: (kv[1], kv[0]))
            exp[(i, n)] = (
                best[0],
                best[1],
                round(best[1] * len(best[0]) / len(t), 6),
            )
    assert got == exp


def test_encode_token_ids_matches_brute(spark):
    from myodish_peak_analysis_spark.llm import text

    rng = np.random.default_rng(46)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(15):
        words = [vocab[j] for j in rng.integers(0, 12, rng.integers(1, 30))]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    V = 6
    got = {
        r.doc_id: (r.token_ids, r.n_tokens, r.n_oov)
        for r in text.encode_token_ids(df, vocab_size=V).collect()
    }
    counts = Counter()
    for _, t in docs:
        counts.update(t.split(" "))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    ids = {tok: i + 1 for i, (tok, _) in enumerate(ranked)}
    for i, t in docs:
        words = t.split(" ")
        enc = [ids.get(w, 0) for w in words]
        assert got[i] == (
            " ".join(str(x) for x in enc),
            len(words),
            sum(1 for x in enc if x == 0),
        ), i
