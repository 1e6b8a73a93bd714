#!/usr/bin/env python
"""Measure the bucketed co-located join SCALE.md promises at 100 TB.

SCALE.md's 100 TB posture says "bucketed tables for the repeated
``orderkey``/``doc_id`` joins". This tool turns that from a claim into
a measurement: it writes ``orders`` and ``lineitem`` twice — plain
parquet and ``bucketBy(orderkey)`` + ``sortBy(orderkey)`` tables with
MATCHING bucket counts — then times the same Q3-shaped
orders⋈lineitem→aggregate on both and diff-checks the physical plans.

What the bucketed plan must show (and this tool asserts):

* ZERO shuffle Exchange nodes before the join — both scans come out of
  the source already hash-partitioned on the join key, so the join is
  co-located. On a 100 TB warehouse this deletes the two largest
  shuffles of every orderkey join a nightly pipeline runs; the
  one-time bucketed write amortizes across every downstream join.
* With ``sortBy``, SortMergeJoin's per-task sorts read pre-sorted
  bucket files.

Broadcast is disabled for the measured join (autoBroadcastJoinThreshold
= -1): at 100 TB NEITHER side of orders⋈lineitem is broadcastable, so
the honest comparison is shuffle-SMJ vs bucketed-SMJ. (At local SF the
optimizer would broadcast 15k orders and sidestep the question the
measurement is asking.)

Replication (``--factor``, default 10) scales both fact tables with
the same disjoint-keyrange scheme as ``bench_scaling.py --family rel``
so the join has enough volume for the delta to clear host noise.

Prints one JSON line per variant plus a ``bucketing_speedup`` summary;
exits 1 if the bucketed plan still contains a pre-join Exchange.

Usage: python tools/bench_bucketing.py [--factor 10] [--buckets 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
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
    """The Q3-ish shape every warehouse runs nightly: join the two fact
    tables on orderkey, aggregate revenue per priority bucket."""
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


def _best_of(df: DataFrame, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def _executed_plan(df: DataFrame) -> str:
    df.write.format("noop").mode("overwrite").save()  # finalize AQE
    return df._jdf.queryExecution().executedPlan().toString()


def _pre_join_exchanges(plan: str) -> int:
    """Shuffle Exchange nodes below the join (i.e. anywhere in the
    plan except the single post-aggregation exchange the groupBy always
    needs). BroadcastExchange/ReusedExchange excluded as in
    audit_plans.py."""
    shuffles = (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
    )
    return max(0, shuffles - 1)  # 1 = the unavoidable groupBy exchange


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    wh = tempfile.mkdtemp(prefix="bucketing-wh-")
    spark = get_spark(
        "bench-bucketing", extra_conf={"spark.sql.warehouse.dir": wh}
    )
    spark.sparkContext.setLogLevel("ERROR")
    if spark.conf.get("spark.sql.warehouse.dir", "").rstrip("/") not in (
        wh,
        f"file:{wh}",
    ):
        # an earlier session in this process owns the warehouse conf;
        # refuse rather than silently writing tables somewhere else
        sys.exit("warehouse dir not applied; run this tool standalone")

    orders = _replicate(
        read_table(spark, SF_DIR, "orders"), args.factor,
        ("o_orderkey", "o_custkey"),
    )
    lineitem = _replicate(
        read_table(spark, SF_DIR, "lineitem"), args.factor,
        ("l_orderkey", "l_partkey", "l_suppkey"),
    )

    # -- one-time writes (timed too: the amortized cost side of the claim)
    t0 = time.time()
    orders.write.mode("overwrite").saveAsTable("orders_plain")
    lineitem.write.mode("overwrite").saveAsTable("lineitem_plain")
    plain_write_s = time.time() - t0
    t0 = time.time()
    (
        orders.write.mode("overwrite")
        .bucketBy(args.buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(args.buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
    )
    bucketed_write_s = time.time() - t0

    n_orders = spark.table("orders_plain").count()
    n_lines = spark.table("lineitem_plain").count()

    results = {}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for variant in ("plain", "bucketed"):
            q = _join_agg(
                spark.table(f"orders_{variant}"),
                spark.table(f"lineitem_{variant}"),
            )
            plan = _executed_plan(q)
            pre = _pre_join_exchanges(plan)
            sec = _best_of(q)
            results[variant] = (sec, pre)
            print(
                json.dumps(
                    {
                        "metric": f"bucketing_join_sec:{variant}",
                        "value": round(sec, 3),
                        "unit": "sec",
                        "pre_join_exchanges": pre,
                        "rows": n_orders + n_lines,
                        "write_sec": round(
                            plain_write_s
                            if variant == "plain"
                            else bucketed_write_s,
                            3,
                        ),
                        "buckets": args.buckets,
                        "factor": args.factor,
                        "sf_dir": SF_DIR,
                    }
                )
            )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in (
            "orders_plain", "lineitem_plain",
            "orders_bucketed", "lineitem_bucketed",
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(wh, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "bucketing_speedup",
                "value": round(results["plain"][0] / results["bucketed"][0], 3),
                "unit": "x (plain join sec / bucketed join sec)",
            }
        )
    )
    if results["bucketed"][1] != 0:
        sys.exit("bucketed join still shuffles before the join")
    if results["plain"][1] < 1:
        sys.exit("plain join shows no pre-join shuffle — measurement invalid")


if __name__ == "__main__":
    main()
