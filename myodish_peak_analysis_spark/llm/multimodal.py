"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side design is real and tested — schemas, partitioning,
batch-iterator UDF signatures, and metadata propagation all work against
synthetic payloads. The actual codecs (JPEG decode, audio resample,
video frame extraction) are NOT available in this environment, so each
``*_impl`` hook either raises ``NotImplementedError`` (strict mode) or
substitutes a deterministic fake derived from the payload bytes
(``fake=True``, used by the tests). Swapping in Pillow/ffmpeg later
only touches the hooks — the distributed plumbing is unchanged.

100 TB notes: payloads never leave the executor; ``mapInPandas``
streams Arrow record batches, so one task holds only
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads at a time.
Keep media tables partitioned by a content-derived key (e.g.
``hash(media_id) % N``) so decode cost spreads evenly; never groupBy a
skewed source column for decode work.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("source", StringType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
    ]
)

AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def _decode_image_impl(payload: bytes, fake: bool):
    """Codec hook. ``fake=True`` → deterministic md5-derived dims
    (reproducible tests, SQL-mirrorable oracle). ``fake=False`` → real
    Pillow decode when the library is installed (see
    ``requirements-extra.txt``); NotImplementedError otherwise so the
    gap is loud, not silent."""
    if not fake:
        try:
            import io

            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "image codec not available in this environment; pass "
                "fake=True or install Pillow (requirements-extra.txt)"
            ) from exc
        with Image.open(io.BytesIO(payload)) as img:
            return img.size
    h = hashlib.md5(payload).hexdigest()
    return (int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1)


def _decode_audio_impl(payload: bytes, fake: bool):
    """Codec hook; real path = soundfile when installed (see
    ``requirements-extra.txt``), else NotImplementedError."""
    if not fake:
        try:
            import io

            import soundfile
        except ImportError as exc:
            raise NotImplementedError(
                "audio codec not available in this environment; pass "
                "fake=True or install soundfile (requirements-extra.txt)"
            ) from exc
        with soundfile.SoundFile(io.BytesIO(payload)) as snd:
            return (len(snd) / snd.samplerate, snd.samplerate)
    return (len(payload) / 16000.0, 16000)


def image_metadata(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image dims + content hash, streaming Arrow batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                w, h = _decode_image_impl(b, fake)
                rows.append(
                    (int(mid), w, h, len(b), hashlib.md5(b).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes", "content_hash"],
            )

    return media.filter("kind = 'image'").mapInPandas(fn, IMAGE_META_SCHEMA)


def audio_metadata(media: DataFrame, fake: bool = False) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                dur, sr = _decode_audio_impl(b, fake)
                rows.append((int(mid), dur, sr, len(b), hashlib.md5(b).hexdigest()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_s", "sample_rate", "n_bytes", "content_hash"],
            )

    return media.filter("kind = 'audio'").mapInPandas(fn, AUDIO_META_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Frame sampling: one output row per sampled frame. The fake derives
    a per-frame hash from (payload, frame_idx); a real implementation
    would decode with ffmpeg and hash the frame tensor."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "video codec not available; pass fake=True or plug ffmpeg in"
                    )
                n_frames = max(1, len(b) // 64)
                for idx in range(0, n_frames, every_n):
                    fh = hashlib.md5(b + idx.to_bytes(4, "little")).hexdigest()
                    rows.append((int(mid), idx, fh))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_hash"])

    return media.filter("kind = 'video'").mapInPandas(fn, FRAME_SCHEMA)
