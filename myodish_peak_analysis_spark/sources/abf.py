"""ABF (Axon Binary Format) ingestion — the reference's S1 source.

The reference opens a ``pyabf.ABF`` recording and emits one 2-column
pandas frame per channel (``/root/reference/utils.py:5-22``: hardcoded
``range(9)`` channels, loop variable misnamed ``sweep`` but passed as
``channel=``). In a Spark engine, ingestion is a DRIVER-side converter:
decode the instrument file once, write long-format parquet keyed by
``channel_id``, and let every query read the parquet — the scan then
gets pruning/pushdown for free and the decode never sits in a hot path.

``pyabf`` is not installed in this environment; the pure-stdlib
readers below cover BOTH containers (ABF1 and ABF2), BOTH payload
formats (float32 and gain-chain int16), and — since round 7 — BOTH
acquisition modes (gap-free and episodic/multi-sweep, with pyabf's
sweep-splitting derivations and per-sweep time axes). pyabf, when
installed, is used for anything rarer (e.g. variable-length event
modes, stimulus waveform reconstruction).
The long-format conversion and parquet layout (the parts the engine
actually depends on) are pure pandas and fully tested.

At 100 TB: one ABF file is one driver/task-side decode emitting a few
channels — convert many files in parallel by mapping
:func:`abf_to_parquet` over a file manifest (each output is an
independent parquet directory; a final compaction pass is optional).
"""

from __future__ import annotations

import pandas as pd

#: The reference hardcodes 9 channels (utils.py:12).
DEFAULT_CHANNELS = 9


def channels_to_long(frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Reference list-of-frames → the engine's long format
    (``channel_id, sample_idx, time_index, signal_value``), replacing
    positional list alignment with explicit keys."""
    parts = []
    for cid, f in enumerate(frames):
        parts.append(
            pd.DataFrame(
                {
                    "channel_id": cid,
                    "sample_idx": range(len(f)),
                    "time_index": f["time_index"].astype(float).to_numpy(),
                    "signal_value": f["signal_value"].astype(float).to_numpy(),
                }
            )
        )
    out = pd.concat(parts, ignore_index=True)
    out["channel_id"] = out["channel_id"].astype("int64")
    out["sample_idx"] = out["sample_idx"].astype("int64")
    return out


def extract_channels(
    abf, n_channels: int = DEFAULT_CHANNELS, sweep: int = 0
) -> list[pd.DataFrame]:
    """Reference-parity channel extraction (utils.py:5-22): one
    (time_index, signal_value) frame per channel of an open ABF.
    ``sweep`` selects the episode on multi-sweep recordings (the
    reference itself always reads sweep 0)."""
    frames = []
    for ch in range(n_channels):
        abf.setSweep(sweep, channel=ch)
        frames.append(
            pd.DataFrame({"time_index": abf.sweepX, "signal_value": abf.sweepY})
        )
    return frames


def abf_to_parquet(
    abf_path: str,
    out_path: str,
    n_channels: int = DEFAULT_CHANNELS,
    sweep: int = 0,
) -> int:
    """Decode one ABF file and write long-format parquet; returns the
    row count. Uses ``pyabf`` when installed; otherwise the stdlib
    magic-dispatching reader (:func:`read_abf_sweeps` — ABF1 gap-free
    OR episodic, ABF2, float32 or gain-chain int16). ``sweep`` picks
    the episode on multi-sweep recordings (reference semantics: it
    always analyzes sweep 0). BOTH paths enforce the same contract: a
    file with fewer than ``n_channels`` channels raises (pyabf via
    setSweep; the fallback explicitly) — the reference hardcodes 9
    channels and a silent short read would corrupt downstream channel
    math."""
    try:
        import pyabf
    except ImportError:
        pyabf = None
    if pyabf is None:
        sweeps, _ = read_abf_sweeps(abf_path)
        if sweep >= len(sweeps):
            raise ValueError(
                f"sweep={sweep} requested but the file has "
                f"{len(sweeps)} sweep(s)"
            )
        frames = sweeps[sweep]
        if len(frames) < n_channels:
            # outside any except block: a short file is a data error,
            # not a fallout of the missing import, and must not carry
            # a confusing "during handling of ImportError" traceback.
            raise ValueError(
                f"ABF file has {len(frames)} channels, "
                f"n_channels={n_channels} requested — same failure the "
                "pyabf path raises via setSweep"
            )
        long = channels_to_long(frames[:n_channels])
    else:
        long = channels_to_long(
            extract_channels(pyabf.ABF(abf_path), n_channels, sweep=sweep)
        )
    long.to_parquet(out_path, index=False)
    return len(long)


# --- pure-stdlib ABF1 subset (no pyabf) ------------------------------------
#
# The ABF1 container (public "Axon Binary File Format" spec; field
# offsets as documented in the pyabf project's format notes, itself
# pure Python) is a fixed 2048-byte header + interleaved sample data.
# The subset implemented here — single-sweep, gap-free acquisition —
# covers BOTH payload formats since round 6: float32 (nDataFormat=1,
# no scaling) and int16 (nDataFormat=0, full instrument gain/offset
# chain: fADCRange/lADCResolution counts→volts plus the per-channel
# fInstrumentScaleFactor × fSignalGain × fADCProgrammableGain
# [× fTelegraphAdditGain] divisor and fInstrumentOffset−fSignalOffset
# shift, with nADCSamplingSeq mapping data columns to physical ADC
# channels). The ABF2 container has its own reader further below.

_ABF1_MAGIC = b"ABF "
_ABF1_HEADER = 2048
_OFF_FILE_VERSION = 4   # fFileVersionNumber float32 — gates ≥1.8 blocks
_OFF_OPERATION_MODE = 8  # nOperationMode int16 — 3=gap-free, 5=episodic
_OFF_ACQ_LEN = 10       # lActualAcqLength  int32 — total samples (all chans)
_OFF_ACTUAL_EPISODES = 16  # lActualEpisodes int32 — sweep count (episodic)
_OFF_DATA_PTR = 40      # lDataSectionPtr   int32 — in 512-byte blocks
_OFF_DATA_FORMAT = 100  # nDataFormat       int16 — 0=int16, 1=float32
_OFF_N_CHANNELS = 120   # nADCNumChannels   int16
_OFF_SAMPLE_INT = 122   # fADCSampleInterval float32 — µs per ADC conversion
_OFF_SAMPLES_PER_EPISODE = 138  # lNumSamplesPerEpisode int32 (all chans)
# int16 gain-chain fields (same public header map):
_OFF_ADC_RANGE = 244          # fADCRange          float32 — ±volts full scale
# (fDACRange float32 sits at 248 between these two)
_OFF_ADC_RESOLUTION = 252     # lADCResolution     int32   — counts full scale
_OFF_SAMPLING_SEQ = 410       # nADCSamplingSeq    16×int16 — column→ADC chan
_OFF_PROG_GAIN = 730          # fADCProgrammableGain 16×float32
_OFF_INST_SCALE = 922         # fInstrumentScaleFactor 16×float32
_OFF_INST_OFFSET = 986        # fInstrumentOffset  16×float32
_OFF_SIGNAL_GAIN = 1050       # fSignalGain        16×float32
_OFF_SIGNAL_OFFSET = 1114     # fSignalOffset      16×float32
# extended (ABF ≥1.8) telegraph block lives PAST the 2048-byte base
# header; only read when the file is long enough to contain it:
_OFF_TELEGRAPH_ENABLE = 4512  # nTelegraphEnable   16×int16
_OFF_TELEGRAPH_GAIN = 4576    # fTelegraphAdditGain 16×float32
_EXT_HEADER_MIN = 4640        # telegraph block end


def _read_abf1_array(path: str):
    """Shared ABF1 decode core: returns (samples×channels float64
    array, sample_rate_hz, nOperationMode, lActualEpisodes,
    lNumSamplesPerEpisode). The sweep-shaping wrappers
    (:func:`read_abf1` for gap-free, :func:`read_abf1_sweeps` for
    episodic) sit on top. Channels are round-robin interleaved in the
    data section; the per-channel rate is
    1e6 / (fADCSampleInterval × nADCNumChannels), exactly how the
    public format notes derive dataRate.

    float32 payloads (nDataFormat=1) are raw engineering units; int16
    payloads (nDataFormat=0) go through the full public gain chain —
    for data column c with physical channel a = nADCSamplingSeq[c]::

        value = counts × fADCRange / lADCResolution
                / (fInstrumentScaleFactor[a] × fSignalGain[a]
                   × fADCProgrammableGain[a] × telegraph_gain[a])
                + fInstrumentOffset[a] − fSignalOffset[a]

    where ``telegraph_gain`` is fTelegraphAdditGain when the extended
    (≥ABF1.8) header is present AND nTelegraphEnable[a] is set, else 1
    — the same arithmetic pyabf applies. Raises on non-ABF1 magic
    (ABF2's container is a different layout → pyabf)."""
    import struct

    import numpy as np

    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != _ABF1_MAGIC:
        raise ValueError(
            "not an ABF1 file (ABF2 and other containers need pyabf)"
        )
    acq_len = struct.unpack_from("<i", raw, _OFF_ACQ_LEN)[0]
    data_ptr = struct.unpack_from("<i", raw, _OFF_DATA_PTR)[0]
    dformat = struct.unpack_from("<h", raw, _OFF_DATA_FORMAT)[0]
    nchan = struct.unpack_from("<h", raw, _OFF_N_CHANNELS)[0]
    interval_us = struct.unpack_from("<f", raw, _OFF_SAMPLE_INT)[0]
    if dformat not in (0, 1):
        raise ValueError(f"unknown ABF1 nDataFormat {dformat}")
    if nchan <= 0 or acq_len <= 0 or acq_len % nchan:
        raise ValueError("inconsistent ABF1 channel/sample counts")
    if data_ptr * 512 < _ABF1_HEADER:
        raise ValueError(
            f"ABF1 data section pointer {data_ptr} lands inside the "
            "header — corrupt file"
        )
    if not (interval_us > 0):
        raise ValueError(
            f"ABF1 sample interval {interval_us} µs is not positive — "
            "corrupt header"
        )
    bytes_per = 4 if dformat == 1 else 2
    if data_ptr * 512 + acq_len * bytes_per > len(raw):
        raise ValueError("ABF1 data section extends past end of file")
    rate = 1e6 / (interval_us * nchan)
    if dformat == 1:
        arr = np.frombuffer(
            raw, dtype="<f4", count=acq_len, offset=data_ptr * 512
        ).reshape(-1, nchan).astype(np.float64)
    else:
        counts = np.frombuffer(
            raw, dtype="<i2", count=acq_len, offset=data_ptr * 512
        ).reshape(-1, nchan).astype(np.float64)
        adc_range = struct.unpack_from("<f", raw, _OFF_ADC_RANGE)[0]
        adc_res = struct.unpack_from("<i", raw, _OFF_ADC_RESOLUTION)[0]
        if not (adc_range > 0) or adc_res <= 0:
            raise ValueError(
                f"ABF1 gain chain corrupt: fADCRange={adc_range}, "
                f"lADCResolution={adc_res}"
            )
        seq = struct.unpack_from("<16h", raw, _OFF_SAMPLING_SEQ)
        prog_gain = struct.unpack_from("<16f", raw, _OFF_PROG_GAIN)
        inst_scale = struct.unpack_from("<16f", raw, _OFF_INST_SCALE)
        inst_off = struct.unpack_from("<16f", raw, _OFF_INST_OFFSET)
        sig_gain = struct.unpack_from("<16f", raw, _OFF_SIGNAL_GAIN)
        sig_off = struct.unpack_from("<16f", raw, _OFF_SIGNAL_OFFSET)
        # The telegraph block only EXISTS in ABF >= 1.8 headers
        # (pyabf gates on fFileVersionNumber the same way); a pre-1.8
        # file whose data section merely starts past byte 4640 (synch/
        # tag sections in between) would otherwise have arbitrary bytes
        # read as nTelegraphEnable/fTelegraphAdditGain. The length
        # checks stay as a secondary truncation guard.
        version = struct.unpack_from("<f", raw, _OFF_FILE_VERSION)[0]
        has_telegraph = (
            # 1.7999 not 1.8: float32(1.8) rounds to 1.79999995…,
            # which a Python-float >= 1.8 would wrongly reject.
            version >= 1.7999
            and len(raw) >= _EXT_HEADER_MIN
            and data_ptr * 512 >= _EXT_HEADER_MIN
        )
        tele_en = (
            struct.unpack_from("<16h", raw, _OFF_TELEGRAPH_ENABLE)
            if has_telegraph
            else (0,) * 16
        )
        tele_gain = (
            struct.unpack_from("<16f", raw, _OFF_TELEGRAPH_GAIN)
            if has_telegraph
            else (1.0,) * 16
        )
        arr = np.empty_like(counts)
        for c in range(nchan):
            a = seq[c]
            if not (0 <= a < 16):
                raise ValueError(
                    f"ABF1 nADCSamplingSeq[{c}]={a} outside the 16 "
                    "physical ADC channels — corrupt header"
                )
            divisor = inst_scale[a] * sig_gain[a] * prog_gain[a]
            if tele_en[a]:
                divisor *= tele_gain[a]
            if divisor == 0:
                raise ValueError(
                    f"ABF1 gain chain divisor is 0 for ADC channel {a} "
                    "(scale/gain field unset) — corrupt header"
                )
            arr[:, c] = (
                counts[:, c] * (adc_range / adc_res) / divisor
                + inst_off[a]
                - sig_off[a]
            )
    mode = struct.unpack_from("<h", raw, _OFF_OPERATION_MODE)[0]
    episodes = struct.unpack_from("<i", raw, _OFF_ACTUAL_EPISODES)[0]
    spe = struct.unpack_from("<i", raw, _OFF_SAMPLES_PER_EPISODE)[0]
    return arr, rate, mode, episodes, spe


def _frames_from_array(arr, rate: float) -> list[pd.DataFrame]:
    import numpy as np

    t = np.arange(arr.shape[0], dtype=np.float64) / rate
    return [
        pd.DataFrame({"time_index": t, "signal_value": arr[:, c]})
        for c in range(arr.shape[1])
    ]


def read_abf1(path: str) -> tuple[list[pd.DataFrame], float]:
    """Decode a single-sweep (gap-free) ABF1 recording: returns
    (reference-shaped channel frames, sample_rate_hz) — see
    :func:`_read_abf1_array` for the decode chain. A multi-episode
    (nOperationMode=5) file raises loudly toward
    :func:`read_abf1_sweeps` rather than silently concatenating sweeps
    into one continuous trace with a fabricated time axis."""
    arr, rate, mode, episodes, _ = _read_abf1_array(path)
    if mode == 5 and episodes > 1:
        raise ValueError(
            f"episodic ABF1 with {episodes} sweeps — use "
            "read_abf1_sweeps (or abf_to_parquet(sweep=...)); "
            "flattening sweeps into one gap-free trace would "
            "fabricate the time axis across sweep boundaries"
        )
    return _frames_from_array(arr, rate), rate


def read_abf1_sweeps(
    path: str, allow_trailing: bool = False
) -> tuple[list[list[pd.DataFrame]], float]:
    """Decode an ABF1 recording into per-sweep channel frames:
    returns ([sweep][channel] frames, sample_rate_hz). Episodic
    (nOperationMode=5) files split on lNumSamplesPerEpisode —
    episodes are stored back-to-back in the data section, each holding
    lNumSamplesPerEpisode interleaved samples (the public format's
    episodic layout; pyabf derives sweepPointCount the same way) —
    and each sweep's time axis restarts at 0, matching pyabf's
    ``sweepX``. Gap-free files return a single sweep, so this is a
    strict superset of :func:`read_abf1`.

    ``allow_trailing`` (ADVICE r8): real-world episodic files from
    aborted acquisitions (or writers that pad the data section) can
    carry trailing samples past the last whole episode. The default
    refuses them loudly (the never-drop-data posture); passing True
    truncates to the whole episodes with a ``RuntimeWarning`` naming
    the dropped row count — the caller has asserted the tail is
    padding, matching what pyabf-based tooling reads. A data section
    SMALLER than episodes × samples is corrupt either way and always
    raises."""
    arr, rate, mode, episodes, spe = _read_abf1_array(path)
    if not (mode == 5 and episodes > 1):
        return [_frames_from_array(arr, rate)], rate
    nchan = arr.shape[1]
    if spe <= 0 or spe % nchan != 0:
        raise ValueError(
            f"episodic ABF1: lNumSamplesPerEpisode={spe} not a "
            f"positive multiple of {nchan} channels — corrupt header"
        )
    rows_per_sweep = spe // nchan
    if (
        allow_trailing
        and 0 < rows_per_sweep * episodes < arr.shape[0]
    ):
        import warnings

        warnings.warn(
            f"episodic ABF1: truncating {arr.shape[0] - rows_per_sweep * episodes} "
            f"trailing rows past the last of {episodes} whole episodes "
            "(allow_trailing=True)",
            RuntimeWarning,
            stacklevel=2,
        )
        arr = arr[: rows_per_sweep * episodes]
    if rows_per_sweep * episodes != arr.shape[0]:
        # != not >: a SMALLER product means trailing samples the sweep
        # split would silently discard — same loud-failure posture as
        # the oversized case (the episodic readers never drop data).
        raise ValueError(
            f"episodic ABF1: {episodes} episodes × {rows_per_sweep} "
            f"rows != the {arr.shape[0]} rows in the data section "
            f"({'exceeds it' if rows_per_sweep * episodes > arr.shape[0] else 'leaves trailing samples'})"
        )
    return [
        _frames_from_array(
            arr[s * rows_per_sweep : (s + 1) * rows_per_sweep], rate
        )
        for s in range(episodes)
    ], rate


#: Historical name from round 5, kept as an alias — since round 6 the
#: stdlib reader covers int16 too, so the _float suffix no longer
#: describes a restriction.
read_abf1_float = read_abf1


def write_abf1_float(path: str, channels, sample_rate_hz: float) -> None:
    """Emit the same ABF1 float32 subset (test/round-trip writer and a
    way to produce engine-readable recordings without an instrument):
    ``channels`` is an (n_samples, n_channels) array."""
    import struct

    import numpy as np

    arr = np.asarray(channels, dtype="<f4")
    n, c = arr.shape
    header = bytearray(_ABF1_HEADER)
    header[:4] = _ABF1_MAGIC
    struct.pack_into("<i", header, _OFF_ACQ_LEN, n * c)
    struct.pack_into("<i", header, _OFF_DATA_PTR, _ABF1_HEADER // 512)
    struct.pack_into("<h", header, _OFF_DATA_FORMAT, 1)
    struct.pack_into("<h", header, _OFF_N_CHANNELS, c)
    struct.pack_into("<f", header, _OFF_SAMPLE_INT, 1e6 / (sample_rate_hz * c))
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(arr.reshape(-1).tobytes())


def write_abf1_int16(
    path: str,
    channels,
    sample_rate_hz: float,
    adc_range: float = 10.0,
    adc_resolution: int = 32768,
    instrument_scale: float = 0.5,
    signal_gain: float = 2.0,
    programmable_gain: float = 1.0,
    instrument_offset: float = 0.25,
    signal_offset: float = 0.1,
    telegraph_gain: float | None = None,
    sampling_seq: list[int] | None = None,
    episodes: int | None = None,
) -> None:
    """Emit the int16 gain-chain subset: quantize ``channels`` (an
    (n_samples, n_channels) float array of engineering units) to ADC
    counts by INVERTING the public chain, and write header fields the
    reader's forward chain will consume. ``telegraph_gain`` not None →
    writes the extended (≥ABF1.8) telegraph block and enables it, so
    the data section starts after byte 4640. ``sampling_seq`` maps
    data columns to physical ADC channels (default: identity); every
    per-channel field is written at its mapped physical slot.
    ``episodes=K`` writes an EPISODIC (nOperationMode=5) file: the
    n_samples rows split into K equal back-to-back sweeps
    (lActualEpisodes=K, lNumSamplesPerEpisode=n·c/K) — the layout
    :func:`read_abf1_sweeps` decodes; default None writes gap-free
    (nOperationMode=3).

    Round-trip contract (pinned by tests/test_sources.py): reading the
    file back yields the input values to within half a count of
    quantization error — |err| <= 0.5 × (adc_range/adc_resolution) /
    total_gain."""
    import struct

    import numpy as np

    vals = np.asarray(channels, dtype=np.float64)
    n, c = vals.shape
    seq = list(range(c)) if sampling_seq is None else list(sampling_seq)
    if len(seq) < c or any(not 0 <= a < 16 for a in seq[:c]):
        raise ValueError("sampling_seq must map each column to ADC 0..15")
    if episodes is not None and (episodes <= 0 or n % episodes != 0):
        raise ValueError(
            f"episodes={episodes} must evenly divide the {n} sample rows"
        )
    header_len = _EXT_HEADER_MIN if telegraph_gain is not None else _ABF1_HEADER
    data_block = (header_len + 511) // 512
    header = bytearray(data_block * 512)
    header[:4] = _ABF1_MAGIC
    # version 1.83 when the >=1.8 telegraph block is written, 1.30 for
    # the base 2048-byte header — the reader gates telegraph parsing on
    # this field (see read_abf1).
    struct.pack_into(
        "<f", header, _OFF_FILE_VERSION,
        1.83 if telegraph_gain is not None else 1.30,
    )
    struct.pack_into(
        "<h", header, _OFF_OPERATION_MODE, 5 if episodes else 3
    )
    if episodes:
        struct.pack_into("<i", header, _OFF_ACTUAL_EPISODES, episodes)
        struct.pack_into(
            "<i", header, _OFF_SAMPLES_PER_EPISODE, n * c // episodes
        )
    struct.pack_into("<i", header, _OFF_ACQ_LEN, n * c)
    struct.pack_into("<i", header, _OFF_DATA_PTR, data_block)
    struct.pack_into("<h", header, _OFF_DATA_FORMAT, 0)
    struct.pack_into("<h", header, _OFF_N_CHANNELS, c)
    struct.pack_into("<f", header, _OFF_SAMPLE_INT, 1e6 / (sample_rate_hz * c))
    struct.pack_into("<f", header, _OFF_ADC_RANGE, adc_range)
    struct.pack_into("<i", header, _OFF_ADC_RESOLUTION, adc_resolution)
    for col in range(c):
        a = seq[col]
        struct.pack_into("<h", header, _OFF_SAMPLING_SEQ + 2 * col, a)
        struct.pack_into("<f", header, _OFF_PROG_GAIN + 4 * a, programmable_gain)
        struct.pack_into("<f", header, _OFF_INST_SCALE + 4 * a, instrument_scale)
        struct.pack_into("<f", header, _OFF_INST_OFFSET + 4 * a, instrument_offset)
        struct.pack_into("<f", header, _OFF_SIGNAL_GAIN + 4 * a, signal_gain)
        struct.pack_into("<f", header, _OFF_SIGNAL_OFFSET + 4 * a, signal_offset)
        if telegraph_gain is not None:
            struct.pack_into("<h", header, _OFF_TELEGRAPH_ENABLE + 2 * a, 1)
            struct.pack_into("<f", header, _OFF_TELEGRAPH_GAIN + 4 * a, telegraph_gain)
    total_gain = instrument_scale * signal_gain * programmable_gain * (
        telegraph_gain if telegraph_gain is not None else 1.0
    )
    counts = np.rint(
        (vals - instrument_offset + signal_offset)
        * total_gain
        / (adc_range / adc_resolution)
    )
    if np.any(np.abs(counts) > 32767):
        raise ValueError(
            "input values exceed the int16 ADC range under this gain "
            "chain — raise adc_range or lower the gains"
        )
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(counts.astype("<i2").reshape(-1).tobytes())


# --- pure-stdlib ABF2 subset (no pyabf) ------------------------------------
#
# The ABF2 container (public layout, as documented in the pyabf
# project's format notes): a 76-byte fixed header ('ABF2' magic,
# nDataFormat at byte 30), then a section map at byte 76 — one 16-byte
# entry per section (uint32 blockStart [512-byte blocks], uint32
# byteCount, int64 itemCount) in a fixed order. This reader uses three
# sections: ProtocolSection (index 0: fADCSequenceInterval at +2,
# fADCRange at +110, lADCResolution at +118), ADCSection (index 1: one
# per-channel gain-chain entry — nTelegraphEnable at +2,
# fTelegraphAdditGain at +6, fADCProgrammableGain at +28,
# fInstrumentScaleFactor at +40, fInstrumentOffset at +44, fSignalGain
# at +48, fSignalOffset at +52; entry size = byteCount/itemCount), and
# DataSection (index 10: interleaved samples, int16 or float32 per
# nDataFormat). Subset: single-sweep gap-free acquisition, the same
# contract as the ABF1 reader above; the int16 scaling arithmetic is
# identical to ABF1's.

_ABF2_MAGIC = b"ABF2"
_ABF2_SECTION_MAP = 76
_SECT_PROTOCOL = 0
_SECT_ADC = 1
_SECT_DATA = 10
_OFF2_DATA_FORMAT = 30        # nDataFormat int16 in the fixed header
_OFF2_ACTUAL_EPISODES = 12    # lActualEpisodes uint32 in the fixed header
_P2_OFF_OPERATION_MODE = 0    # nOperationMode int16, first Protocol field
_P_OFF_SEQ_INTERVAL = 2       # fADCSequenceInterval float32 (µs/channel-sample)
_P_OFF_ADC_RANGE = 110        # fADCRange float32
_P_OFF_ADC_RESOLUTION = 118   # lADCResolution int32
_A_OFF_TELE_ENABLE = 2        # nTelegraphEnable int16
_A_OFF_TELE_GAIN = 6          # fTelegraphAdditGain float32
_A_OFF_PROG_GAIN = 28         # fADCProgrammableGain float32
_A_OFF_INST_SCALE = 40        # fInstrumentScaleFactor float32
_A_OFF_INST_OFFSET = 44       # fInstrumentOffset float32
_A_OFF_SIGNAL_GAIN = 48       # fSignalGain float32
_A_OFF_SIGNAL_OFFSET = 52     # fSignalOffset float32
_ADC_ENTRY_SIZE = 128         # written entry size (reader derives its own)


def _abf2_section(raw: bytes, index: int) -> tuple[int, int, int]:
    """(byte_offset, byte_count, item_count) of section ``index``."""
    import struct

    base = _ABF2_SECTION_MAP + index * 16
    block, nbytes, items = struct.unpack_from("<IIq", raw, base)
    return block * 512, nbytes, items


def _read_abf2_array(path: str):
    """Shared ABF2 decode core: returns (arr[n_rows, n_chan], rate,
    nOperationMode, lActualEpisodes). float32 payloads are raw
    engineering units; int16 payloads run the instrument gain chain
    (the ABF1 formula, with the per-channel fields read from this
    container's ADCSection entries)."""
    import struct

    import numpy as np

    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != _ABF2_MAGIC:
        raise ValueError("not an ABF2 file")
    if len(raw) < _ABF2_SECTION_MAP + (_SECT_DATA + 1) * 16:
        raise ValueError("ABF2 file truncated before its section map")
    dformat = struct.unpack_from("<h", raw, _OFF2_DATA_FORMAT)[0]
    if dformat not in (0, 1):
        raise ValueError(f"unknown ABF2 nDataFormat {dformat}")
    p_off, p_bytes, _ = _abf2_section(raw, _SECT_PROTOCOL)
    a_off, a_bytes, nchan = _abf2_section(raw, _SECT_ADC)
    d_off, _, n_samples = _abf2_section(raw, _SECT_DATA)
    if nchan <= 0 or n_samples <= 0 or n_samples % nchan:
        raise ValueError("inconsistent ABF2 channel/sample counts")
    if p_bytes < _P_OFF_ADC_RESOLUTION + 4:
        raise ValueError("ABF2 ProtocolSection too short")
    interval_us = struct.unpack_from("<f", raw, p_off + _P_OFF_SEQ_INTERVAL)[0]
    if not (interval_us > 0):
        raise ValueError(
            f"ABF2 sample interval {interval_us} µs is not positive"
        )
    bytes_per = 4 if dformat == 1 else 2
    if d_off + n_samples * bytes_per > len(raw):
        raise ValueError("ABF2 data section extends past end of file")
    rate = 1e6 / interval_us
    if dformat == 1:
        arr = np.frombuffer(
            raw, dtype="<f4", count=n_samples, offset=d_off
        ).reshape(-1, nchan).astype(np.float64)
    else:
        counts = np.frombuffer(
            raw, dtype="<i2", count=n_samples, offset=d_off
        ).reshape(-1, nchan).astype(np.float64)
        adc_range = struct.unpack_from("<f", raw, p_off + _P_OFF_ADC_RANGE)[0]
        adc_res = struct.unpack_from("<i", raw, p_off + _P_OFF_ADC_RESOLUTION)[0]
        if not (adc_range > 0) or adc_res <= 0:
            raise ValueError(
                f"ABF2 gain chain corrupt: fADCRange={adc_range}, "
                f"lADCResolution={adc_res}"
            )
        entry = a_bytes // nchan
        if entry < _A_OFF_SIGNAL_OFFSET + 4:
            raise ValueError("ABF2 ADCSection entries too short")
        arr = np.empty_like(counts)
        for c in range(nchan):
            base = a_off + c * entry
            tele_en = struct.unpack_from("<h", raw, base + _A_OFF_TELE_ENABLE)[0]
            tele_gain = struct.unpack_from("<f", raw, base + _A_OFF_TELE_GAIN)[0]
            prog = struct.unpack_from("<f", raw, base + _A_OFF_PROG_GAIN)[0]
            scale = struct.unpack_from("<f", raw, base + _A_OFF_INST_SCALE)[0]
            inst_off = struct.unpack_from("<f", raw, base + _A_OFF_INST_OFFSET)[0]
            sgain = struct.unpack_from("<f", raw, base + _A_OFF_SIGNAL_GAIN)[0]
            soff = struct.unpack_from("<f", raw, base + _A_OFF_SIGNAL_OFFSET)[0]
            divisor = scale * sgain * prog
            if tele_en:
                divisor *= tele_gain
            if divisor == 0:
                raise ValueError(
                    f"ABF2 gain chain divisor is 0 for channel {c}"
                )
            arr[:, c] = (
                counts[:, c] * (adc_range / adc_res) / divisor
                + inst_off
                - soff
            )
    mode = struct.unpack_from("<h", raw, p_off + _P2_OFF_OPERATION_MODE)[0]
    episodes = struct.unpack_from("<I", raw, _OFF2_ACTUAL_EPISODES)[0]
    return arr, rate, mode, episodes


def _abf2_frames(arr, rate: float) -> list[pd.DataFrame]:
    import numpy as np

    t = np.arange(arr.shape[0], dtype=np.float64) / rate
    return [
        pd.DataFrame({"time_index": t, "signal_value": arr[:, c]})
        for c in range(arr.shape[1])
    ]


def read_abf2(path: str) -> tuple[list[pd.DataFrame], float]:
    """Decode a single-sweep (gap-free) ABF2 recording — same return
    shape as :func:`read_abf1`. An episodic (nOperationMode=5) file
    raises loudly toward :func:`read_abf2_sweeps` rather than silently
    concatenating sweeps into one continuous trace with a fabricated
    time axis (the same contract as the ABF1 reader pair)."""
    arr, rate, mode, episodes = _read_abf2_array(path)
    if mode == 5 and episodes > 1:
        raise ValueError(
            f"episodic ABF2 with {episodes} sweeps — use "
            "read_abf2_sweeps (or abf_to_parquet(sweep=...)); "
            "flattening sweeps into one gap-free trace would "
            "fabricate the time axis across sweep boundaries"
        )
    return _abf2_frames(arr, rate), rate


def read_abf2_sweeps(path: str) -> tuple[list[list[pd.DataFrame]], float]:
    """Decode an ABF2 recording into per-sweep channel frames:
    ([sweep][channel] frames, rate). ABF2 stores no per-episode sample
    count — episodes are equal-length and back-to-back in the data
    section, so sweepPointCount = rows / lActualEpisodes (the same
    derivation pyabf uses); each sweep's time axis restarts at 0.
    Gap-free files return a single sweep, a strict superset of
    :func:`read_abf2`."""
    arr, rate, mode, episodes = _read_abf2_array(path)
    if not (mode == 5 and episodes > 1):
        return [_abf2_frames(arr, rate)], rate
    if arr.shape[0] % episodes:
        raise ValueError(
            f"episodic ABF2: {arr.shape[0]} rows do not divide into "
            f"{episodes} equal episodes — corrupt header"
        )
    rows = arr.shape[0] // episodes
    return [
        _abf2_frames(arr[s * rows : (s + 1) * rows], rate)
        for s in range(episodes)
    ], rate


def write_abf2(
    path: str,
    channels,
    sample_rate_hz: float,
    int16: bool = False,
    adc_range: float = 10.0,
    adc_resolution: int = 32768,
    instrument_scale: float = 0.5,
    signal_gain: float = 2.0,
    programmable_gain: float = 1.0,
    instrument_offset: float = 0.25,
    signal_offset: float = 0.1,
    telegraph_gain: float | None = None,
    episodes: int | None = None,
) -> None:
    """Emit the ABF2 subset (round-trip writer): 76-byte header +
    section map + Protocol/ADC/Data sections, float32 raw or int16
    through the inverted gain chain. ``episodes=K`` writes an EPISODIC
    (nOperationMode=5) file — K equal back-to-back sweeps
    (lActualEpisodes=K), the layout :func:`read_abf2_sweeps` splits."""
    import struct

    import numpy as np

    vals = np.asarray(channels, dtype=np.float64)
    n, c = vals.shape
    # layout: header+map occupy block 0; protocol block 1; ADC block 2+;
    # data after.
    p_block = 1
    p_size = 512
    a_block = 2
    a_size = c * _ADC_ENTRY_SIZE
    a_blocks = (a_size + 511) // 512
    d_block = a_block + a_blocks
    header = bytearray(d_block * 512)
    header[:4] = _ABF2_MAGIC
    struct.pack_into("<h", header, _OFF2_DATA_FORMAT, 0 if int16 else 1)
    if episodes is not None:
        if episodes <= 0 or n % episodes:
            raise ValueError(
                f"{n} rows do not divide into {episodes} equal episodes"
            )
        struct.pack_into("<I", header, _OFF2_ACTUAL_EPISODES, episodes)

    def sect(index: int, block: int, nbytes: int, items: int) -> None:
        struct.pack_into(
            "<IIq", header, _ABF2_SECTION_MAP + index * 16, block, nbytes, items
        )

    sect(_SECT_PROTOCOL, p_block, p_size, 1)
    sect(_SECT_ADC, a_block, a_size, c)
    sect(_SECT_DATA, d_block, n * c * (2 if int16 else 4), n * c)
    p_off = p_block * 512
    struct.pack_into(
        "<h", header, p_off + _P2_OFF_OPERATION_MODE,
        5 if episodes is not None else 3,
    )
    struct.pack_into("<f", header, p_off + _P_OFF_SEQ_INTERVAL, 1e6 / sample_rate_hz)
    struct.pack_into("<f", header, p_off + _P_OFF_ADC_RANGE, adc_range)
    struct.pack_into("<i", header, p_off + _P_OFF_ADC_RESOLUTION, adc_resolution)
    for ch in range(c):
        base = a_block * 512 + ch * _ADC_ENTRY_SIZE
        struct.pack_into("<h", header, base, ch)  # nADCNum
        struct.pack_into("<f", header, base + _A_OFF_PROG_GAIN, programmable_gain)
        struct.pack_into("<f", header, base + _A_OFF_INST_SCALE, instrument_scale)
        struct.pack_into("<f", header, base + _A_OFF_INST_OFFSET, instrument_offset)
        struct.pack_into("<f", header, base + _A_OFF_SIGNAL_GAIN, signal_gain)
        struct.pack_into("<f", header, base + _A_OFF_SIGNAL_OFFSET, signal_offset)
        if telegraph_gain is not None:
            struct.pack_into("<h", header, base + _A_OFF_TELE_ENABLE, 1)
            struct.pack_into("<f", header, base + _A_OFF_TELE_GAIN, telegraph_gain)
    with open(path, "wb") as f:
        f.write(bytes(header))
        if int16:
            total_gain = (
                instrument_scale * signal_gain * programmable_gain
                * (telegraph_gain if telegraph_gain is not None else 1.0)
            )
            counts = np.rint(
                (vals - instrument_offset + signal_offset)
                * total_gain
                / (adc_range / adc_resolution)
            )
            if np.any(np.abs(counts) > 32767):
                raise ValueError(
                    "input values exceed the int16 ADC range under this "
                    "gain chain"
                )
            f.write(counts.astype("<i2").reshape(-1).tobytes())
        else:
            f.write(vals.astype("<f4").reshape(-1).tobytes())


def read_abf(path: str) -> tuple[list[pd.DataFrame], float]:
    """Magic-dispatching stdlib ABF reader: ABF1 or ABF2, float32 or
    gain-chain int16 — the full no-pyabf ingestion surface.
    Single-sweep contract: episodic ABF1 raises loudly toward
    :func:`read_abf_sweeps`."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == _ABF1_MAGIC:
        return read_abf1(path)
    if magic == _ABF2_MAGIC:
        return read_abf2(path)
    raise ValueError(f"not an ABF file (magic {magic!r})")


def read_abf_sweeps(path: str) -> tuple[list[list[pd.DataFrame]], float]:
    """Sweep-aware twin of :func:`read_abf`: ([sweep][channel] frames,
    rate). ABF1 splits episodic recordings on the header's episode
    layout, ABF2 on lActualEpisodes; gap-free files of either
    container return a single sweep."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == _ABF1_MAGIC:
        return read_abf1_sweeps(path)
    if magic == _ABF2_MAGIC:
        return read_abf2_sweeps(path)
    raise ValueError(f"not an ABF file (magic {magic!r})")
