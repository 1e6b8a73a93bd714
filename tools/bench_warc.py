"""WARC ingest decades (round 12): encode+parse wall time as the
corpus grows 1×/10×/100× with the FILE COUNT growing proportionally —
the Common Crawl layout (many ~fixed-size files), so parse parallelism
is file-level and per-doc cost should stay flat.

Each cell: replicate the sf documents corpus k× (disjoint doc_ids,
`bench_scaling._replicate_docs`), encode to ``8*k`` WARC blobs
(JVM-expression writer), then parse every record back through the
``mapInPandas`` reader and noop-sink the projected documents frame.
Encode and parse are timed separately (two actions; the encode's
groupBy is the only shuffle on the path). Output: one JSON line per
factor; docs/SCALE.md records the table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from myodish_peak_analysis_spark.schema import read_table  # noqa: E402
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402
from myodish_peak_analysis_spark.sources.warc import (  # noqa: E402
    encode_documents_warc,
    parse_warc,
    warc_documents,
)
from tools.bench_scaling import _replicate_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", type=str, default="1,10,100")
    args = ap.parse_args()

    spark = get_spark("bench-warc")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    base = read_table(spark, SF_DIR, "documents")

    for k in (int(x) for x in args.factors.split(",")):
        docs = (
            (_replicate_docs(base, k) if k > 1 else base)
            .repartition(par)
            .cache()
        )
        n = docs.count()
        t0 = time.time()
        blobs = encode_documents_warc(docs, file_mod=8 * k).withColumn(
            "path",
            F.concat(F.lit("mem://p"), F.col("file_key").cast("string")),
        ).cache()
        n_files = blobs.count()
        t_enc = time.time() - t0
        t0 = time.time()
        out = warc_documents(parse_warc(blobs))
        out.write.format("noop").mode("overwrite").save()
        t_parse = time.time() - t0
        print(
            json.dumps(
                {
                    "factor": k,
                    "n_docs": n,
                    "n_files": n_files,
                    "sec_encode": round(t_enc, 1),
                    "sec_parse": round(t_parse, 1),
                    "docs_per_sec_parse": int(n / t_parse),
                }
            ),
            flush=True,
        )
        blobs.unpersist()
        docs.unpersist()


if __name__ == "__main__":
    main()
