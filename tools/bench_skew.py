"""Measured skew evidence for the salted two-phase top-k.

`docs/SCALE.md` claims the salted `topk_per_group` "bounds any one
task to O(rows/salt) for a hot group — the single-window form dies on
a hot key". This harness MEASURES that claim instead of asserting it:
a synthetic frame with an adversarially hot group (95% of all rows in
group 0, the rest uniform over 63 groups — the crawl-corpus shape
where one source dominates) is ranked top-k-per-group two ways:

* ``naive`` — the textbook single window
  ``row_number() over (partition by group order by value desc)``:
  every row of the hot group lands in ONE task, which must sort it
  alone while 31 cores idle;
* ``salted`` — `operators.analytics.topk_per_group`: phase 1 ranks
  within (group, xxhash64(tie) % salt) spreading the hot group over
  ``salt`` tasks, phase 2 re-ranks the surviving salt*k rows.

Both produce identical rows (asserted before timing). Usage:
python tools/bench_skew.py [--rows 4000000] [--hot-frac 0.95]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from myodish_peak_analysis_spark.session import get_spark  # noqa: E402
from myodish_peak_analysis_spark.operators.analytics import (  # noqa: E402
    topk_per_group,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.95)
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")

    mod = max(2, round(1.0 / (1.0 - args.hot_frac)))
    df = (
        spark.range(args.rows)
        .select(
            F.col("id"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(mod)) != 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64(F.col("id") + 1), F.lit(63)) + 1)
            .alias("grp"),
            F.pmod(F.xxhash64(F.col("id") + 2), F.lit(1_000_000_000)).alias(
                "val"
            ),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    )
    n = df.count()
    hot = df.filter("grp = 0").count()

    def naive():
        w = Window.partitionBy("grp").orderBy(
            F.col("val").desc(), F.col("id").asc()
        )
        return (
            df.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= args.k)
        )

    def salted():
        return topk_per_group(df, "grp", "val", "id", k=args.k)

    key = lambda r: (r.grp, r.rank, r.id, r.val)  # noqa: E731
    assert sorted(map(key, naive().collect())) == sorted(
        map(key, salted().collect())
    ), "salted result must equal the single-window result"

    out = {"rows": n, "hot_rows": hot, "hot_frac": round(hot / n, 4)}
    for name, build in (("naive_single_window", naive), ("salted_two_phase", salted)):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name + "_sec"] = round(best, 3)
    out["speedup"] = round(
        out["naive_single_window_sec"] / out["salted_two_phase_sec"], 2
    )
    print(json.dumps({"metric": "skew_topk", **out}), flush=True)


if __name__ == "__main__":
    main()
