"""Multi-format document ingestion: the same ``documents`` frame from
parquet, JSONL, or CSV — real corpora arrive as all three (Common Crawl
derivatives ship JSONL; vendor drops ship CSV; the lake speaks parquet).

Always pass the EXPLICIT schema: schema inference on JSON/CSV is a
full extra pass over 100 TB before the first real job, and worse, it is
sampling-based — two runs over a growing corpus can infer different
types and silently fork downstream plans. With the explicit schema the
read is a single scan and the three formats produce identical frames.

CSV is read with ``multiLine=true`` so quoted text containing newlines
(normal for document bodies) parses correctly — without it each
embedded newline silently splits a document into garbage rows. The
cost: multiLine CSV files are NOT splittable (one task per file), so
at scale CSV drops should be many medium files, or better, converted
to parquet/JSONL at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: documents schema, shared by all three formats (matches the harness
#: parquet exactly).
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a documents table from ``parquet`` | ``jsonl`` | ``csv``
    into the canonical frame. Column order and types are normalized to
    :data:`DOCUMENTS_SCHEMA` regardless of the on-disk layout."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "jsonl":
        df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    elif fmt == "csv":
        df = (
            spark.read.schema(DOCUMENTS_SCHEMA)
            .option("header", "true")
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported format: {fmt!r} (parquet|jsonl|csv)")
    return df.select(
        *[
            df[f.name].cast(f.dataType).alias(f.name)
            for f in DOCUMENTS_SCHEMA.fields
        ]
    )
