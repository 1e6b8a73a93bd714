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


def _parse_jpeg_dims(payload: bytes):
    """Walk JFIF marker segments to the SOF frame header — JPEG
    dimensions live BEFORE any entropy-coded data (public ITU T.81
    layout), so no decoder is needed: segments are [0xFF marker
    len_be16 data], length includes its own 2 bytes; SOF0..SOF15 are
    0xC0..0xCF except DHT(C4)/JPG(C8)/DAC(CC), payload = precision u8,
    height u16be, width u16be. Returns (w, h) or None."""
    n = len(payload)
    i = 2  # past SOI
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None  # desynchronized — not a valid marker stream
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8,) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9 or marker == 0xDA:
            return None  # EOI / start-of-scan reached without a SOF
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seg_len < 7:
                return None
            h = int.from_bytes(payload[i + 5 : i + 7], "big")
            w = int.from_bytes(payload[i + 7 : i + 9], "big")
            return (w, h) if w > 0 and h > 0 else None
        i += 2 + seg_len
    return None


def _parse_image_header(payload: bytes):
    """Pure-stdlib REAL header decode for the formats whose dimensions
    live in a fixed/parseable header — PNG (IHDR), BMP (BITMAPINFO),
    binary PPM/PGM (P6/P5 ASCII header), JPEG (SOF frame header — the
    dimensions precede all entropy-coded data), GIF (logical screen
    descriptor), WebP (VP8X/VP8/VP8L fixed header bits), TIFF
    (first-IFD tag walk) and AVIF/HEIF (ISOBMFF ispe property box).
    No third-party codec needed, so this path works in every
    environment; an unrecognized format falls through to Pillow.
    Returns (width, height) or None if unrecognized."""
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        return _parse_jpeg_dims(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return (w, h) if w > 0 and h > 0 else None
    if (
        payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
        and len(payload) >= 30
    ):
        # All three WebP variants put dimensions in fixed header bits
        # (public container spec) — no VP8 decode needed:
        fmt = payload[12:16]
        if fmt == b"VP8X":  # extended: 24-bit LE canvas minus-one dims
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return (w, h)
        if fmt == b"VP8 " and payload[23:26] == b"\x9d\x01\x2a":
            # lossy: 3-byte frame tag then start code, 14-bit LE dims
            w = int.from_bytes(payload[26:28], "little") & 0x3FFF
            h = int.from_bytes(payload[28:30], "little") & 0x3FFF
            return (w, h) if w > 0 and h > 0 else None
        if fmt == b"VP8L" and payload[20] == 0x2F:
            # lossless: packed 14+14-bit minus-one dims after signature
            bits = int.from_bytes(payload[21:25], "little")
            return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        return None  # unknown WebP variant → Pillow
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        return (
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:2] == b"BM" and len(payload) >= 26:
        dib = int.from_bytes(payload[14:18], "little")
        if dib >= 40:  # BITMAPINFOHEADER and successors: int32 dims
            w = int.from_bytes(payload[18:22], "little", signed=True)
            # biHeight < 0 is the legal top-down orientation (abs it);
            # biWidth < 0 (or either dim 0) is simply corrupt — return
            # None so the Pillow/raise path owns the error.
            h = abs(int.from_bytes(payload[22:26], "little", signed=True))
            return (w, h) if w > 0 and h > 0 else None
        if dib == 12:  # legacy BITMAPCOREHEADER: uint16 dims
            w = int.from_bytes(payload[18:20], "little")
            h = int.from_bytes(payload[20:22], "little")
            return (w, h) if w > 0 and h > 0 else None
        return None  # unknown DIB variant: fall through to Pillow
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _parse_tiff_dims(payload)
    if payload[4:8] == b"ftyp":  # ISOBMFF container (AVIF/HEIF)
        return _parse_avif_dims(payload)
    if payload[:2] in (b"P6", b"P5"):
        toks, i, n = [], 2, len(payload)
        while len(toks) < 2 and i < n:
            while i < n and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment to EOL
                while i < n and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            if j > i:
                toks.append(payload[i:j])
            i = j
        if len(toks) == 2 and toks[0].isdigit() and toks[1].isdigit():
            return (int(toks[0]), int(toks[1]))
    return None


def _parse_tiff_dims(payload: bytes):
    """Pure-stdlib TIFF parse (public TIFF 6.0 spec): dimensions live
    in the first IFD's ImageWidth (tag 256) / ImageLength (tag 257)
    entries — a pure ``int.from_bytes`` walk, no sample decode. Both
    byte orders ('II' little, 'MM' big) are handled; SHORT (type 3)
    values sit left-justified in the 4-byte value field, LONG (type 4)
    fills it. Returns (w, h) or None."""
    n = len(payload)
    if n < 8:
        return None
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        return None
    ifd = int.from_bytes(payload[4:8], bo)
    if ifd + 2 > n:
        return None
    n_entries = int.from_bytes(payload[ifd : ifd + 2], bo)
    w = h = None
    for e in range(n_entries):
        off = ifd + 2 + e * 12
        if off + 12 > n:
            return None
        tag = int.from_bytes(payload[off : off + 2], bo)
        typ = int.from_bytes(payload[off + 2 : off + 4], bo)
        if tag not in (256, 257):
            continue
        if typ == 3:  # SHORT, left-justified in the value field
            val = int.from_bytes(payload[off + 8 : off + 10], bo)
        elif typ == 4:  # LONG
            val = int.from_bytes(payload[off + 8 : off + 12], bo)
        else:
            return None  # RATIONAL dims etc. — not a baseline TIFF
        if tag == 256:
            w = val
        else:
            h = val
        if w is not None and h is not None:
            return (w, h) if w > 0 and h > 0 else None
    return None


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for each ISOBMFF box in
    ``buf[start:end]`` (public ISO/IEC 14496-12 layout): u32be size +
    4cc type, size==1 → u64 largesize follows, size==0 → extends to the
    end of the enclosing box. Stops (rather than raising) on any
    malformed/truncated header so callers degrade to None."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i : i + 4], "big")
        typ = buf[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(buf[i + 8 : i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield typ, i + hdr, i + size
        i += size


def _parse_avif_dims(payload: bytes):
    """Pure-stdlib AVIF/HEIF dims (public ISO/IEC 23008-12 + AV1-ISOBMFF
    binding): image dimensions live in the ``ispe`` (ImageSpatialExtents)
    property box inside ``meta``→``iprp``→``ipco`` — metadata boxes that
    precede all entropy-coded AV1/HEVC payload, so no decoder is needed.
    The primary image's ispe is resolved properly: ``pitm`` names the
    primary item, ``ipma`` maps items to 1-indexed ``ipco`` properties.
    When that chain is absent/damaged, falls back to the largest-area
    ispe (covers thumbnail-bearing files whose pitm is missing).
    Returns (w, h) or None."""
    boxes = list(_iter_boxes(payload, 0, len(payload)))
    if not boxes or boxes[0][0] != b"ftyp":
        return None
    _, fs, fe = boxes[0]
    # ftyp body = major_brand, minor_version (skipped), compatible brands
    brands = {payload[fs : fs + 4]} | {
        payload[i : i + 4] for i in range(fs + 8, fe - 3, 4)
    }
    if not brands & {b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1"}:
        return None
    meta = next(((s, e) for t, s, e in boxes if t == b"meta"), None)
    if meta is None:
        return None
    ms, me = meta[0] + 4, meta[1]  # meta is a FullBox: skip version/flags
    primary = None
    ipco_props: list = []
    assoc: dict = {}
    for t2, s2, e2 in _iter_boxes(payload, ms, me):
        if t2 == b"pitm":
            # bounds BEFORE the version byte read: a zero-body pitm box
            # ending at the buffer end makes s2 == e2 (== len(payload)),
            # and the parsers' contract is degrade-to-None, not
            # IndexError inside the mapInPandas worker.
            if s2 >= e2:
                continue
            if payload[s2] == 0:  # v0: u16 item id
                if s2 + 6 <= e2:
                    primary = int.from_bytes(payload[s2 + 4 : s2 + 6], "big")
            elif s2 + 8 <= e2:  # v1: u32
                primary = int.from_bytes(payload[s2 + 4 : s2 + 8], "big")
        elif t2 == b"iprp":
            for t3, s3, e3 in _iter_boxes(payload, s2, e2):
                if t3 == b"ipco":
                    ipco_props = list(_iter_boxes(payload, s3, e3))
                elif t3 == b"ipma" and s3 + 8 <= e3:
                    version = payload[s3]
                    flags = int.from_bytes(payload[s3 + 1 : s3 + 4], "big")
                    i = s3 + 4
                    cnt = int.from_bytes(payload[i : i + 4], "big")
                    i += 4
                    for _ in range(cnt):
                        id_w = 2 if version < 1 else 4
                        if i + id_w + 1 > e3:
                            break
                        iid = int.from_bytes(payload[i : i + id_w], "big")
                        i += id_w
                        ac = payload[i]
                        i += 1
                        idxs = []
                        for _ in range(ac):
                            if flags & 1:  # 15-bit property index
                                if i + 2 > e3:
                                    break
                                idxs.append(
                                    int.from_bytes(payload[i : i + 2], "big")
                                    & 0x7FFF
                                )
                                i += 2
                            else:  # 7-bit
                                if i + 1 > e3:
                                    break
                                idxs.append(payload[i] & 0x7F)
                                i += 1
                        assoc[iid] = idxs

    def ispe_dims(s4: int, e4: int):
        # ispe FullBox: version/flags u32, then u32 width, u32 height
        if e4 - s4 >= 12:
            w = int.from_bytes(payload[s4 + 4 : s4 + 8], "big")
            h = int.from_bytes(payload[s4 + 8 : s4 + 12], "big")
            if w > 0 and h > 0:
                return (w, h)
        return None

    if primary is not None:
        for idx in assoc.get(primary, ()):
            if 1 <= idx <= len(ipco_props):
                t4, s4, e4 = ipco_props[idx - 1]
                if t4 == b"ispe":
                    d = ispe_dims(s4, e4)
                    if d:
                        return d
    best = None
    for t4, s4, e4 in ipco_props:
        if t4 == b"ispe":
            d = ispe_dims(s4, e4)
            if d and (best is None or d[0] * d[1] > best[0] * best[1]):
                best = d
    return best


# public MPEG-1/2/2.5 audio frame-header tables (Layer index 1..3 =
# Layer III..I as encoded in the header's layer bits):
_MP3_RATES = {
    3: (44100, 48000, 32000),    # MPEG1
    2: (22050, 24000, 16000),    # MPEG2
    0: (11025, 12000, 8000),     # MPEG2.5
}
_MP3_BITRATES_V1 = {
    # layer bits → kbit/s by bitrate index (0 = free, 15 = bad)
    3: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),  # Layer I
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),     # Layer II
    1: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),      # Layer III
}
_MP3_BITRATES_V2 = {
    3: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),     # Layer I
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),          # Layer II
    1: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),          # Layer III
}


def _parse_mp3_header(payload: bytes):
    """Pure-stdlib MP3 duration: walk every frame HEADER (public
    MPEG-1/2 audio spec) — each header states its own bitrate/
    samplerate, so the frame length is computable and the payload is
    SKIPPED, never entropy-decoded. Summing per-frame sample counts is
    exact for both CBR and VBR streams (a CBR filesize shortcut would
    be wrong for VBR). A leading ID3v2 tag (synchsafe length) is
    skipped. Returns (duration_s, sample_rate_of_first_frame) or
    None if no valid frame sequence is found."""
    n = len(payload)
    i = 0
    if payload[:3] == b"ID3" and n >= 10:
        size = 0
        for b in payload[6:10]:  # synchsafe: 7 bits per byte
            if b & 0x80:
                return None
            size = (size << 7) | b
        i = 10 + size
    n_frames = 0
    total_s = 0.0  # seconds, summed per-frame (each at its own rate)
    first_rate = None
    while i + 4 <= n:
        b1, b2, b3 = payload[i], payload[i + 1], payload[i + 2]
        if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
            break  # desync: stop at trailing garbage/ID3v1
        version = (b2 >> 3) & 0x3   # 0=MPEG2.5, 2=MPEG2, 3=MPEG1
        layer = (b2 >> 1) & 0x3     # 1=III, 2=II, 3=I
        if version == 1 or layer == 0:
            break  # reserved
        bit_idx = (b3 >> 4) & 0xF
        rate_idx = (b3 >> 2) & 0x3
        padding = (b3 >> 1) & 0x1
        if bit_idx in (0, 15) or rate_idx == 3:
            break  # free-format/bad bitrate or reserved samplerate
        rate = _MP3_RATES[version][rate_idx]
        kbps = (_MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2)[
            layer
        ][bit_idx]
        if layer == 3:  # Layer I: slot = 4 bytes
            samples = 384
            frame_len = (12000 * kbps // rate + padding) * 4
        else:  # Layers II/III: slot = 1 byte
            samples = 1152 if (layer == 2 or version == 3) else 576
            frame_len = samples // 8 * 1000 * kbps // rate + padding
        if frame_len <= 4:
            break
        if first_rate is None:
            first_rate = rate
        n_frames += 1
        total_s += samples / rate  # VBR-safe: per-frame rate
        i += frame_len
    if n_frames == 0 or first_rate is None:
        return None
    return (total_s, first_rate)


def _parse_wav_header(payload: bytes):
    """Pure-stdlib RIFF/WAVE parse: walk chunks for 'fmt ' (sample
    rate, byte rate) and 'data' (payload size); duration = data bytes
    / byte rate. Returns (duration_s, sample_rate) or None."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    rate = byte_rate = data_size = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 20 <= n:
            rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(payload[i + 16 : i + 20], "little")
        elif cid == b"data":
            # The header's declared size can exceed what survived a
            # truncated download; clamp to the bytes actually present
            # so duration reflects the real (playable) payload.
            data_size = min(size, max(0, n - (i + 8)))
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if rate and byte_rate and data_size is not None:
        return (data_size / byte_rate, rate)
    return None


def _decode_image_impl(payload: bytes, fake: bool):
    """Codec hook. ``fake=True`` → deterministic md5-derived dims
    (reproducible tests, SQL-mirrorable oracle). ``fake=False`` →
    REAL decode: the pure-stdlib header parser covers
    PNG/BMP/PPM/JPEG/GIF/WebP/TIFF/AVIF/HEIF (dims never require
    entropy decoding in any of them) in any environment; Pillow
    (requirements-extra.txt) extends coverage to anything rarer;
    anything else raises loudly."""
    if not fake:
        dims = _parse_image_header(payload)
        if dims is not None:
            return dims
        try:
            import io

            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "unrecognized image format and Pillow not installed; "
                "PNG/BMP/PPM/JPEG/GIF/WebP/TIFF/AVIF need no library — "
                "for rarer formats install Pillow "
                "(requirements-extra.txt) or pass fake=True"
            ) from exc
        with Image.open(io.BytesIO(payload)) as img:
            return img.size
    h = hashlib.md5(payload).hexdigest()
    return (int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1)


def _parse_flac_header(payload: bytes):
    """Pure-stdlib FLAC parse: the mandatory first STREAMINFO metadata
    block (public format spec) carries everything duration needs — no
    audio-frame decode. Layout after the 'fLaC' magic: 1-byte block
    header (last-flag + type, type 0 = STREAMINFO), 3-byte BE length,
    then 34 bytes of which bytes 10..17 pack sample_rate (20 bits),
    channels-1 (3), bits_per_sample-1 (5), total_samples (36).
    Returns (duration_s, sample_rate) or None."""
    if payload[:4] != b"fLaC" or len(payload) < 4 + 4 + 18:
        return None
    if payload[4] & 0x7F != 0:  # first block must be STREAMINFO
        return None
    block_len = int.from_bytes(payload[5:8], "big")
    if block_len < 34 or len(payload) < 8 + block_len:
        return None
    packed = int.from_bytes(payload[8 + 10 : 8 + 18], "big")
    rate = packed >> 44
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        return None  # spec: 0 is invalid
    return (total / rate, rate)


def _parse_ogg_header(payload: bytes):
    """Pure-stdlib OGG duration (public RFC 3533 container + Vorbis I /
    RFC 7845 Opus specs): every page header carries an absolute
    granule position, so the audio stream's LAST granulepos divided by
    the codec clock is the duration — page bodies are SKIPPED via the
    segment table, no audio packet is ever decoded. The clock comes
    from the codec ID header in the stream's first page: Vorbis stores
    its sample rate at byte 12 of the ``\\x01vorbis`` packet and counts
    granules at that rate; Opus granules always tick at 48 kHz
    regardless of the ``OpusHead`` input rate, and the pre-skip samples
    are subtracted per RFC 7845 §4.1. Multiplexed files are handled by
    tracking only the serial of the first recognized audio stream.
    Returns (duration_s, sample_rate) or None."""
    n = len(payload)
    i = 0
    serial = rate = last_granule = None
    opus = False
    preskip = 0
    while i + 27 <= n:
        if payload[i : i + 4] != b"OggS" or payload[i + 4] != 0:
            break
        granule = int.from_bytes(payload[i + 6 : i + 14], "little", signed=True)
        ser = int.from_bytes(payload[i + 14 : i + 18], "little")
        nsegs = payload[i + 26]
        body_start = i + 27 + nsegs
        if body_start > n:
            break
        body_len = sum(payload[i + 27 : body_start])
        if body_start + body_len > n:
            break
        if serial is None:
            body = payload[body_start : body_start + body_len]
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                serial = ser
                rate = int.from_bytes(body[12:16], "little")
            elif body[:8] == b"OpusHead" and len(body) >= 16:
                serial = ser
                opus = True
                preskip = int.from_bytes(body[10:12], "little")
                # informational input rate; granules still tick at 48k
                rate = int.from_bytes(body[12:16], "little") or 48000
        if ser == serial and granule >= 0:
            last_granule = granule  # pages are in stream order
        i = body_start + body_len
    if serial is None or last_granule is None or not rate:
        return None
    if opus:
        return (max(0, last_granule - preskip) / 48000.0, rate)
    return (last_granule / rate, rate)


def _parse_aiff_header(payload: bytes):
    """Pure-stdlib AIFF/AIFF-C parse (public EA IFF 85 spec): big-
    endian chunks under ``FORM``/``AIFF``; the ``COMM`` chunk states
    numSampleFrames (u32) and sampleRate as an IEEE 754 80-bit
    extended float — duration = frames / rate. Returns
    (duration_s, sample_rate) or None."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        return None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "big")
        if cid == b"COMM" and i + 8 + 18 <= n:
            frames = int.from_bytes(payload[i + 10 : i + 14], "big")
            ext = payload[i + 16 : i + 26]  # 80-bit extended float
            exp = int.from_bytes(ext[:2], "big") & 0x7FFF
            mant = int.from_bytes(ext[2:10], "big")
            if exp == 0 and mant == 0:
                return None
            rate = mant * 2.0 ** (exp - 16383 - 63)
            if not (rate > 0):
                return None
            return (frames / rate, int(round(rate)))
        i += 8 + size + (size & 1)
    return None


#: MPEG-4 AAC sampling-frequency index table (public ISO/IEC 14496-3).
_AAC_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350)


def _parse_aac_adts(payload: bytes):
    """Pure-stdlib ADTS-AAC parse: walk the self-framing ADTS headers
    (12-bit 0xFFF syncword; 13-bit frame length spans header+payload;
    4-bit sampling-frequency index) — each AAC frame decodes to 1024
    PCM samples per channel, so duration = frames·1024/rate, VBR-exact
    without entropy decode (the same walk as the MP3 parser). Returns
    (duration_s, sample_rate) or None."""
    i, n, frames, rate = 0, len(payload), 0, None
    while i + 7 <= n:
        if payload[i] != 0xFF or (payload[i + 1] & 0xF6) != 0xF0:
            return None  # ADTS is contiguous: a bad sync means not ADTS
        sfi = (payload[i + 2] >> 2) & 0x0F
        if sfi >= len(_AAC_RATES):
            return None
        r = _AAC_RATES[sfi]
        if rate is None:
            rate = r
        elif r != rate:
            return None
        flen = ((payload[i + 3] & 0x03) << 11) | (payload[i + 4] << 3) | (
            payload[i + 5] >> 5
        )
        if flen < 7:
            return None
        frames += 1
        i += flen
    if not frames or rate is None or i != n:
        return None
    return (frames * 1024 / rate, rate)


def _decode_audio_impl(payload: bytes, fake: bool):
    """Codec hook; real path = the pure-stdlib RIFF/WAVE, AIFF, FLAC
    STREAMINFO, OGG granule-position (Vorbis/Opus), MP3 and ADTS-AAC
    frame-header parsers (any environment), soundfile
    (requirements-extra.txt) for anything rarer, else
    NotImplementedError."""
    if not fake:
        for parse in (_parse_wav_header, _parse_aiff_header,
                      _parse_flac_header, _parse_ogg_header,
                      _parse_mp3_header, _parse_aac_adts):
            meta = parse(payload)
            if meta is not None:
                return meta
        try:
            import io

            import soundfile
        except ImportError as exc:
            raise NotImplementedError(
                "unrecognized audio format and soundfile not installed; "
                "WAV/AIFF/FLAC/OGG/MP3/ADTS-AAC need no library — for "
                "rarer formats install soundfile "
                "(requirements-extra.txt) or pass fake=True"
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


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("n_tracks", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
    ]
)


def _parse_mp4_duration(payload: bytes):
    """Pure-stdlib MP4/MOV movie metadata (public ISO/IEC 14496-12):
    the ``moov``→``mvhd`` MovieHeaderBox states duration in its own
    timescale units — duration/timescale = seconds, no sample decode.
    v0 packs creation/modification/timescale/duration as u32s; v1
    widens the times and duration to u64. Track count = ``trak``
    children of moov. Returns (duration_s, n_tracks) or None."""
    boxes = list(_iter_boxes(payload, 0, len(payload)))
    if not boxes or boxes[0][0] != b"ftyp":
        return None
    dur = None
    tracks = 0
    for t, s, e in boxes:
        if t != b"moov":
            continue
        for t2, s2, e2 in _iter_boxes(payload, s, e):
            if t2 == b"mvhd" and e2 - s2 >= 4:
                if payload[s2] == 1 and e2 - s2 >= 32:  # v1: u64 times
                    ts = int.from_bytes(payload[s2 + 20 : s2 + 24], "big")
                    d = int.from_bytes(payload[s2 + 24 : s2 + 32], "big")
                elif payload[s2] == 0 and e2 - s2 >= 20:
                    ts = int.from_bytes(payload[s2 + 12 : s2 + 16], "big")
                    d = int.from_bytes(payload[s2 + 16 : s2 + 20], "big")
                else:
                    continue
                if ts:
                    dur = d / ts
            elif t2 == b"trak":
                tracks += 1
    if dur is None:
        return None
    return (dur, tracks)


def _ebml_vint(payload: bytes, pos: int, keep_marker: bool):
    """Read one EBML variable-length integer at ``pos``: the leading
    byte's highest set bit states the total width (1-8 bytes). Element
    IDs keep the marker bit (they are compared with it, per the public
    Matroska/EBML spec); sizes strip it. Returns (value, next_pos) or
    None past the buffer."""
    if pos >= len(payload):
        return None
    first = payload[pos]
    if first == 0:
        return None
    width = 8 - first.bit_length() + 1
    if pos + width > len(payload):
        return None
    raw = int.from_bytes(payload[pos : pos + width], "big")
    if not keep_marker:
        raw &= (1 << (7 * width)) - 1
    return raw, pos + width


_EBML_UNKNOWN = {(1 << (7 * w)) - 1 for w in range(1, 9)}


def _iter_ebml(payload: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for EBML children of
    [pos, end) — the Matroska analog of :func:`_iter_boxes`. An
    all-ones size means "unknown, extends to parent end" (streamed
    Segments use it)."""
    while pos < end:
        head = _ebml_vint(payload, pos, keep_marker=True)
        if head is None:
            return
        eid, pos = head
        size = _ebml_vint(payload, pos, keep_marker=False)
        if size is None:
            return
        n, pos = size
        body_end = end if n in _EBML_UNKNOWN else min(end, pos + n)
        yield eid, pos, body_end
        pos = body_end


def _parse_mkv_duration(payload: bytes):
    """Pure-stdlib Matroska/WebM movie metadata (public EBML +
    Matroska specs): ``Segment``→``Info`` states ``Duration`` (float,
    element 0x4489) in ``TimecodeScale`` units (uint ns/tick, element
    0x2AD7B1, default 1,000,000 = ms ticks) — duration_s = Duration ×
    scale / 1e9, no cluster decode. Track count = ``TrackEntry``
    children of ``Tracks``. Returns (duration_s, n_tracks) or None."""
    import struct as _struct

    top = list(_iter_ebml(payload, 0, len(payload)))
    if not top or top[0][0] != 0x1A45DFA3:  # EBML header magic
        return None
    dur_ticks = None
    scale = 1_000_000
    tracks = 0
    for eid, s, e in top:
        if eid != 0x18538067:  # Segment
            continue
        for eid2, s2, e2 in _iter_ebml(payload, s, e):
            if eid2 == 0x1549A966:  # Info
                for eid3, s3, e3 in _iter_ebml(payload, s2, e2):
                    if eid3 == 0x2AD7B1 and e3 > s3:  # TimecodeScale
                        scale = int.from_bytes(payload[s3:e3], "big")
                    elif eid3 == 0x4489 and e3 - s3 in (4, 8):  # Duration
                        fmt = ">f" if e3 - s3 == 4 else ">d"
                        dur_ticks = _struct.unpack(fmt, payload[s3:e3])[0]
            elif eid2 == 0x1654AE6B:  # Tracks
                tracks += sum(
                    1 for eid3, _, _ in _iter_ebml(payload, s2, e2)
                    if eid3 == 0xAE  # TrackEntry
                )
    if dur_ticks is None or not scale:
        return None
    return (dur_ticks * scale / 1e9, tracks)


def _parse_avi_duration(payload: bytes):
    """Pure-stdlib AVI metadata (public RIFF + OpenDML specs): the
    mandatory ``avih`` MainAVIHeader is the first chunk of the
    ``hdrl`` LIST and states dwMicroSecPerFrame, dwTotalFrames and
    dwStreams at fixed little-endian offsets — duration_s = frames ×
    µs-per-frame / 1e6, no stream decode. Returns
    (duration_s, n_streams) or None."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"LIST" and payload[i + 8 : i + 12] == b"hdrl":
            j = i + 12
            # j + 36: the guard must cover the LAST field read
            # (dwStreams at j+32:j+36) — j + 32 admits a truncation
            # inside that field, yielding a short-slice stream count.
            if payload[j : j + 4] == b"avih" and j + 36 <= n:
                us_per_frame = int.from_bytes(payload[j + 8 : j + 12], "little")
                frames = int.from_bytes(payload[j + 24 : j + 28], "little")
                streams = int.from_bytes(payload[j + 32 : j + 36], "little")
                return (frames * us_per_frame / 1e6, streams)
            return None
        i += 8 + size + (size & 1)
    return None


def _decode_video_impl(payload: bytes, fake: bool):
    """Codec hook; real path = the pure-stdlib MP4/MOV ``mvhd`` walk,
    the Matroska/WebM EBML ``Info`` walk, and the AVI ``avih`` header
    (any environment); anything rarer raises loudly (plug ffmpeg in)."""
    if not fake:
        for parse in (_parse_mp4_duration, _parse_mkv_duration,
                      _parse_avi_duration):
            meta = parse(payload)
            if meta is not None:
                return meta
        raise NotImplementedError(
            "unrecognized video container; MP4/MOV/MKV/WebM/AVI need "
            "no library — for rarer containers plug ffmpeg into "
            "_decode_video_impl or pass fake=True"
        )
    h = hashlib.md5(payload).hexdigest()
    return (int(h[:4], 16) % 3600 / 10.0, int(h[4:6], 16) % 4 + 1)


def video_metadata(media: DataFrame, fake: bool = False) -> DataFrame:
    """Container-level video metadata (duration, track count) streamed
    through the same Arrow-batched ``mapInPandas`` shape as the image/
    audio decodes — frame extraction stays in :func:`sample_frames`."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                dur, n_tracks = _decode_video_impl(b, fake)
                rows.append(
                    (int(mid), dur, n_tracks, len(b), hashlib.md5(b).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "duration_s",
                    "n_tracks",
                    "n_bytes",
                    "content_hash",
                ],
            )

    return media.filter("kind = 'video'").mapInPandas(fn, VIDEO_META_SCHEMA)


def _iter_avi_frames(payload: bytes):
    """Yield raw video-frame chunk bytes from an AVI ``movi`` LIST
    (public RIFF spec): stream-0 chunks tagged ``00dc``/``00db``
    (compressed/uncompressed video). For an MJPEG AVI each chunk IS a
    complete JPEG image — frame extraction with no codec at all."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"LIST" and payload[i + 8 : i + 12] == b"movi":
            j, end = i + 12, min(n, i + 8 + size)
            while j + 8 <= end:
                fid = payload[j : j + 4]
                fsz = int.from_bytes(payload[j + 4 : j + 8], "little")
                if fid in (b"00dc", b"00db") and j + 8 + fsz <= n:
                    yield payload[j + 8 : j + 8 + fsz]
                j += 8 + fsz + (fsz & 1)
        i += 8 + size + (size & 1)


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Frame sampling: one output row per sampled frame. REAL path
    (stdlib, no codec): MJPEG-in-AVI — the ``movi`` chunks are
    complete JPEG images, so frame extraction is a RIFF walk and the
    per-frame hash is taken over the actual encoded frame bytes (a
    training pipeline dedups/filters on exactly this). Entropy-coded
    containers (MP4/MKV H.264 etc.) genuinely need ffmpeg and raise
    loudly; the fake derives a per-frame hash from
    (payload, frame_idx) for plumbing tests."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if not fake:
                    frames = list(_iter_avi_frames(b))
                    if not frames:
                        raise NotImplementedError(
                            "no stdlib-extractable frames (MJPEG-in-AVI "
                            "is the codec-free path); plug ffmpeg in or "
                            "pass fake=True"
                        )
                    for idx in range(0, len(frames), every_n):
                        fh = hashlib.md5(frames[idx]).hexdigest()
                        rows.append((int(mid), idx, fh))
                    continue
                n_frames = max(1, len(b) // 64)
                for idx in range(0, n_frames, every_n):
                    fh = hashlib.md5(b + idx.to_bytes(4, "little")).hexdigest()
                    rows.append((int(mid), idx, fh))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_hash"])

    return media.filter("kind = 'video'").mapInPandas(fn, FRAME_SCHEMA)
