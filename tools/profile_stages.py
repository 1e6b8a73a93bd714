"""Stage-by-stage wall time of the native pipeline at sf0.1 (cumulative
prefixes through a noop sink, best-of-2), to localize regressions."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from myodish_peak_analysis_spark.operators.attributes import (
    peak_attributes,
    with_crossings,
)
from myodish_peak_analysis_spark.operators.envelopes import (
    with_diastolic,
    with_smoothed_envelopes,
)
from myodish_peak_analysis_spark.operators.peaks import with_threshold_keep
from myodish_peak_analysis_spark.operators.smooth import with_fir_smooth
from myodish_peak_analysis_spark.operators.windows import with_extrema_flags
from myodish_peak_analysis_spark.schema import auto_channels, signal_frame
from myodish_peak_analysis_spark.session import get_spark

def main() -> None:
    SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("exp-stages")
    spark.sparkContext.setLogLevel("ERROR")

    n_channels = auto_channels(spark, SF_DIR)
    sig = signal_frame(spark, SF_DIR, n_channels=n_channels).cache()
    sig.count()


    def force(d):
        d.write.format("noop").mode("overwrite").save()


    def stage_smooth(d):
        return with_fir_smooth(d)


    def stage_flags(d):
        return with_extrema_flags(stage_smooth(d), value_col="smooth")


    def stage_env(d):
        return with_smoothed_envelopes(stage_flags(d), flags_present=True)


    def stage_dia(d):
        return with_diastolic(stage_env(d))


    def stage_keep(d):
        out = with_threshold_keep(stage_dia(d), value_col="smooth")
        return out.withColumn("_keep", F.col("is_peak") & F.col("keep_peak"))


    def stage_cross(d):
        return with_crossings(stage_keep(d))


    def stage_attr(d):
        return peak_attributes(stage_cross(d), keep_col="_keep")


    stages = [
        ("smooth51", stage_smooth),
        ("+flags", stage_flags),
        ("+envelopes", stage_env),
        ("+diastolic", stage_dia),
        ("+threshold", stage_keep),
        ("+crossings", stage_cross),
        ("+attributes", stage_attr),
    ]

    prev = 0.0
    for name, fn in stages:
        d = fn(sig)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(d)
            best = min(best, time.time() - t0)
        print(f"{name:14s} cum={best:6.3f}s  delta={best - prev:6.3f}s")
        prev = best


if __name__ == "__main__":
    main()
