"""Fluent facade for the LLM-training-data side, mirroring
:class:`..api.PeakPipeline`'s chainable style: each stage is a pure
DataFrame→DataFrame operator from this package, so a nightly corpus
job reads as one line::

    manifest = CorpusPipeline(docs).blocklist(bad).sample().pack()
    report   = CorpusPipeline(docs).blocklist(bad).curate().df

``pack()`` is terminal (returns the manifest DataFrame); ``curate()``
narrows to the scored reporting frame, so it ends a chain too. Every
non-terminal stage returns a NEW pipeline wrapping the derived frame —
nothing executes until an action; Catalyst sees one lazy plan and
optimizes across stage boundaries.
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
        runs and engines): applies the shared keep predicate directly —
        a pure filter, zero shuffles, full document row preserved."""
        return self._next(self.df.filter(_sampling.keep_condition(rates_per_mille)))

    def pack(
        self,
        capacity: int = _packing.PACK_CAPACITY,
        shard_mod: int | None = None,
    ) -> DataFrame:
        """Terminal stage: the concat-and-chunk packing manifest for the
        surviving documents (requires ``text``, so run before
        :meth:`curate` narrows the frame, or on a re-joined frame)."""
        return _packing.pack_chunks(self.df, capacity=capacity, shard_mod=shard_mod)
