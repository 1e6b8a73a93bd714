"""Fluent facade for the LLM-training-data side, mirroring
:class:`..api.PeakPipeline`'s chainable style: each stage is a pure
DataFrame→DataFrame operator from this package, so a nightly corpus
job reads as one line::

    CorpusPipeline(docs).blocklist(bad).curate().sample().pack().df

Every stage returns a NEW pipeline object wrapping the derived frame —
nothing executes until an action; Catalyst still sees one lazy plan and
optimizes across stage boundaries (e.g. the curate filter prunes
columns straight out of the scan feeding pack's token counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import curate as _curate
from . import dedup as _dedup
from . import packing as _packing
from . import sampling as _sampling


class CorpusPipeline:
    """Chainable corpus-curation pipeline over a documents frame with
    columns (doc_id, text, lang, source, n_chars)."""

    def __init__(self, docs: DataFrame):
        self.df = docs

    def _next(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df)

    def blocklist(self, blocklist: DataFrame) -> "CorpusPipeline":
        """Drop documents whose content hash is blocklisted (broadcast
        LEFT ANTI — the corpus never shuffles)."""
        return self._next(_dedup.blocklist_filter(self.df, blocklist))

    def curate(self, min_quality: float = _curate.MIN_QUALITY) -> "CorpusPipeline":
        """Exact-dedup + quality + Gopher gates in one plan. NOTE:
        narrows the frame to (doc_id, lang, source, n_chars,
        quality_score); chain text-dependent stages BEFORE this one or
        re-join text on doc_id."""
        return self._next(_curate.curated_corpus(self.df, min_quality))

    def sample(
        self, rates_per_mille: dict[str, int] | None = None
    ) -> "CorpusPipeline":
        """Deterministic per-stratum downsampling (reproducible across
        runs and engines). The underlying operator emits a narrowed
        reporting frame; here the surviving ids semi-join back so the
        pipeline keeps the FULL document row (doc_id-keyed, co-
        partitionable — no widening)."""
        kept = _sampling.stratified_sample(self.df, rates_per_mille).select("doc_id")
        return self._next(self.df.join(kept, "doc_id", "left_semi"))

    def pack(
        self,
        capacity: int = _packing.PACK_CAPACITY,
        shard_mod: int | None = None,
    ) -> DataFrame:
        """Terminal stage: the concat-and-chunk packing manifest for the
        surviving documents (requires ``text``, so run before
        :meth:`curate` narrows the frame, or on a re-joined frame)."""
        return _packing.pack_chunks(self.df, capacity=capacity, shard_mod=shard_mod)
