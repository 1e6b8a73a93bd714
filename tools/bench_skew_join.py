"""Measured evidence for "AQE splits skewed join keys".

The relational operators' docstrings lean on AQE's skew-join handling
for the fact⋈fact ``orderkey`` joins ("co-partitioned hash join; AQE
splits skewed keys"). This harness MEASURES that claim on an
adversarially skewed warehouse instead of asserting it:

* lineitem is replicated ``--factor``× (same disjoint-stride scheme as
  ``bench_scaling.py --family rel``), then ``--hot-frac`` of its rows
  are remapped to ONE existing hot orderkey — the shape a real
  warehouse gets from a single runaway order/customer/session, which
  lockstep replication deliberately never produces;
* the Q3-shaped orders⋈lineitem→aggregate runs twice on the SAME
  cached inputs: once with ``spark.sql.adaptive.skewJoin.enabled``
  false (the hot key's partition is sorted+joined by ONE task while
  the other cores drain and idle) and once with it true (AQE splits
  the oversized partition into multiple tasks, each joining a slice
  of the hot side against a replicated copy of the matching build
  rows);
* broadcast is disabled for the measured join (at 100 TB neither side
  of orders⋈lineitem broadcasts) so the comparison is SMJ-vs-SMJ, the
  join shape AQE's skew handling actually covers;
* results are count-asserted identical before timing, and the
  skew-on executed plan is asserted to carry the ``skew=true`` SMJ
  marker — so a Spark upgrade that silently stops splitting fails
  this tool rather than just getting slower.

Two preconditions this tool had to LEARN (bisected from a working
minimal repro against a silent non-split; both are re-asserted by the
plan marker):

* **Map-output granularity**: AQE splits a skewed REDUCE partition
  into per-map-output ranges (``PartialReducerPartitionSpec``), so a
  shuffle fed by ONE map task cannot be split at all — and the
  explode-replication of one small parquet file is exactly one map
  task. The inputs are therefore ``repartition()``-ed to the session
  parallelism first, the analog of a real warehouse scan's thousands
  of input splits. At 100 TB this precondition holds for free.
* **Compressed-size thresholds**: skew detection compares COMPRESSED
  shuffle bytes against ``skewedPartitionThresholdInBytes`` (default
  256 MB, chosen for warehouse scale). A local-scale hot key — tens
  of millions of rows whose constant join key LZ4-compresses to
  almost nothing — can sit under it, so the tool scales the
  threshold down (``--skew-threshold``, default 16m, advisory half
  that), the same ratio a 100 TB hot key bears to the default.

Prints one JSON line per variant plus a ``skew_join_speedup`` summary.
Exits 1 if the skew-on plan shows no skew-handled join node.

Usage: python tools/bench_skew_join.py [--factor 10] [--hot-frac 0.9]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from myodish_peak_analysis_spark.schema import read_table  # noqa: E402
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _replicate(df: DataFrame, k: int, keys: tuple[str, ...]) -> DataFrame:
    out = df.withColumn("_c", F.explode(F.expr(f"sequence(0, {k - 1})")))
    shift = F.col("_c").cast("long") * F.lit(1_000_000_000)
    return out.select(
        *[
            (F.col(c) + shift).alias(c) if c in keys else F.col(c)
            for c in df.columns
        ]
    )


def _join_agg(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).alias("_rev")
    return (
        orders.select("o_orderkey", "o_orderpriority")
        .join(
            lineitem.select("l_orderkey", rev),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("_rev").alias("revenue"),
        )
    )


def _timed(df: DataFrame, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def _executed_plan(df: DataFrame) -> str:
    # collect() drives THIS DataFrame's own query execution to its
    # final adaptive plan (a noop write runs a separate QueryExecution
    # and would leave df's plan in the isFinalPlan=false initial state
    # with no AQEShuffleRead/skew markers); output is 5 agg rows.
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=40)
    ap.add_argument("--hot-frac", type=float, default=0.9)
    ap.add_argument("--skew-threshold", default="16m")
    args = ap.parse_args()

    spark = get_spark("bench-skew-join")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        args.skew_threshold,
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        str(max(1, int(args.skew_threshold.rstrip("m")) // 2)) + "m",
    )
    par = spark.sparkContext.defaultParallelism

    orders = _replicate(
        read_table(spark, SF_DIR, "orders"), args.factor,
        ("o_orderkey", "o_custkey"),
    ).repartition(par).cache()
    hot_key = orders.agg(F.min("o_orderkey")).collect()[0][0]
    # remap hot-frac of lineitem onto ONE orderkey, deterministically
    mod = max(2, round(1.0 / (1.0 - args.hot_frac)))
    li = _replicate(
        read_table(spark, SF_DIR, "lineitem"), args.factor,
        ("l_orderkey", "l_partkey", "l_suppkey"),
    ).repartition(par)
    lineitem = li.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(mod))
            != 0,
            F.lit(hot_key).cast("long"),
        ).otherwise(F.col("l_orderkey")),
    ).cache()
    n_orders, n_li = orders.count(), lineitem.count()
    hot_rows = lineitem.filter(F.col("l_orderkey") == hot_key).count()

    q = _join_agg(orders, lineitem)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    rows_off = q.count()
    sec_off = _timed(q)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    rows_on = q.count()
    assert rows_on == rows_off, (rows_on, rows_off)
    sec_on = _timed(q)
    plan_on = _executed_plan(q)
    skew_marked = "skew=true" in plan_on

    for name, sec in (("skew_off", sec_off), ("skew_on", sec_on)):
        print(
            json.dumps(
                {
                    "metric": f"skew_join_sec:{name}",
                    "value": round(sec, 3),
                    "unit": "sec",
                    "rows": n_li,
                    "hot_rows": hot_rows,
                    "orders": n_orders,
                    "factor": args.factor,
                    "sf_dir": SF_DIR,
                }
            )
        )
    print(
        json.dumps(
            {
                "metric": "skew_join_speedup",
                "value": round(sec_off / sec_on, 3),
                "unit": "x (skew-off sec / skew-on sec)",
                "skew_marker_in_plan": skew_marked,
            }
        )
    )
    if not skew_marked:
        sys.exit(1)


if __name__ == "__main__":
    main()
