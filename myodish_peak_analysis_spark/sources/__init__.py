"""Source connectors: ingest external recordings into the engine's
long-format parquet layout."""

from .abf import abf_to_parquet, channels_to_long  # noqa: F401
