"""PySpark-native engine with the query/data capabilities of the
reference ``myodish-peak-analysis`` library (see SURVEY.md), plus
LLM-training-data pipeline operators (dedup, similarity search, text
analysis) designed for horizontal scale.

Public surface:

* :class:`~myodish_peak_analysis_spark.api.PeakPipeline` — fluent facade
  mirroring the reference's ``PeakDetection``/``PeakAnalysis`` classes.
* :mod:`~myodish_peak_analysis_spark.operators` — the individual
  DataFrame→DataFrame operators.
* :mod:`~myodish_peak_analysis_spark.llm` — documents/embeddings
  operators (dedup, similarity, text stats).
"""

from .schema import (  # noqa: F401
    DEFAULT_FS,
    MIN_CHANNEL_ROWS,
    SIGNAL_SCHEMA,
    auto_channels,
    read_table,
    signal_frame,
)
from .session import get_spark  # noqa: F401
