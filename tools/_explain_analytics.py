"""One-off plan audit for the analytics operators (docs/PLANS.md)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from myodish_peak_analysis_spark.llm.sampling import stratified_sample  # noqa: E402
from myodish_peak_analysis_spark.operators.analytics import (  # noqa: E402
    range_pairs,
    topk_per_group,
    value_histogram,
)
from myodish_peak_analysis_spark.schema import read_table  # noqa: E402
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def audit(name, df):
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    n_ex = plan.count("Exchange")
    n_sort = plan.count("Sort [")
    scans = [ln.strip() for ln in plan.splitlines() if "ReadSchema" in ln]
    print(f"== {name}: exchanges={n_ex} sorts={n_sort}")
    for s in scans:
        print("   ", s[:160])
    if os.environ.get("FULL"):
        print(plan)


spark = get_spark("explain")
spark.sparkContext.setLogLevel("ERROR")

from myodish_peak_analysis_spark.schema import ts_micros
_ev = read_table(spark, SF, "events")
events = _ev.withColumn("ts_us", ts_micros(_ev))
docs = read_table(spark, SF, "documents")

audit("value_histogram", value_histogram(read_table(spark, SF, "events")))
audit("range_pairs", range_pairs(events))
audit(
    "topk_per_source",
    topk_per_group(docs.select("doc_id", "source", "n_chars"),
                   "source", "n_chars", "doc_id", k=5),
)
audit("stratified_sample", stratified_sample(docs))
