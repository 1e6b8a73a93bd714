"""ABF (Axon Binary Format) ingestion — the reference's S1 source.

The reference opens a ``pyabf.ABF`` recording and emits one 2-column
pandas frame per channel (``/root/reference/utils.py:5-22``: hardcoded
``range(9)`` channels, loop variable misnamed ``sweep`` but passed as
``channel=``). In a Spark engine, ingestion is a DRIVER-side converter:
decode the instrument file once, write long-format parquet keyed by
``channel_id``, and let every query read the parquet — the scan then
gets pruning/pushdown for free and the decode never sits in a hot path.

``pyabf`` is not installed in this environment, so the decode step is
import-gated; the long-format conversion and parquet layout (the parts
the engine actually depends on) are pure pandas and fully tested.

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


def extract_channels(abf, n_channels: int = DEFAULT_CHANNELS) -> list[pd.DataFrame]:
    """Reference-parity channel extraction (utils.py:5-22): one
    (time_index, signal_value) frame per channel of an open ABF."""
    frames = []
    for ch in range(n_channels):
        abf.setSweep(0, channel=ch)
        frames.append(
            pd.DataFrame({"time_index": abf.sweepX, "signal_value": abf.sweepY})
        )
    return frames


def abf_to_parquet(
    abf_path: str, out_path: str, n_channels: int = DEFAULT_CHANNELS
) -> int:
    """Decode one ABF file and write long-format parquet; returns the
    row count. Uses ``pyabf`` when installed; otherwise the stdlib
    ABF1 float32 reader (:func:`read_abf1_float`). BOTH paths enforce
    the same contract: a file with fewer than ``n_channels`` channels
    raises (pyabf via setSweep; the fallback explicitly) — the
    reference hardcodes 9 channels and a silent short read would
    corrupt downstream channel math."""
    try:
        import pyabf
    except ImportError:
        pyabf = None
    if pyabf is None:
        frames, _ = read_abf1_float(abf_path)
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
        long = channels_to_long(extract_channels(pyabf.ABF(abf_path), n_channels))
    long.to_parquet(out_path, index=False)
    return len(long)


# --- pure-stdlib ABF1 subset (no pyabf) ------------------------------------
#
# The ABF1 container (public "Axon Binary File Format" spec; field
# offsets as documented in the pyabf project's format notes, itself
# pure Python) is a fixed 2048-byte header + interleaved sample data.
# The subset implemented here — single-sweep, float32 data
# (nDataFormat=1), gap-free acquisition — covers the layout this
# engine's converter emits and needs NO scaling math (int16 ABF data
# requires the full gain/offset chain, which stays on the pyabf path).

_ABF1_MAGIC = b"ABF "
_ABF1_HEADER = 2048
_OFF_ACQ_LEN = 10       # lActualAcqLength  int32 — total samples (all chans)
_OFF_DATA_PTR = 40      # lDataSectionPtr   int32 — in 512-byte blocks
_OFF_DATA_FORMAT = 100  # nDataFormat       int16 — 0=int16, 1=float32
_OFF_N_CHANNELS = 120   # nADCNumChannels   int16
_OFF_SAMPLE_INT = 122   # fADCSampleInterval float32 — µs per ADC conversion


def read_abf1_float(path: str) -> tuple[list[pd.DataFrame], float]:
    """Decode an ABF1 float32 recording with the stdlib only: returns
    (reference-shaped channel frames, sample_rate_hz). Channels are
    round-robin interleaved in the data section; the per-channel rate
    is 1e6 / (fADCSampleInterval × nADCNumChannels), exactly how the
    public format notes derive dataRate. Raises on int16 payloads
    (needs the full gain chain → use pyabf) and non-ABF1 magic."""
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
    if dformat != 1:
        raise NotImplementedError(
            "ABF1 int16 data needs the instrument gain chain — install "
            "pyabf; the stdlib path covers float32 recordings"
        )
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
    if data_ptr * 512 + acq_len * 4 > len(raw):
        raise ValueError("ABF1 data section extends past end of file")
    arr = np.frombuffer(
        raw, dtype="<f4", count=acq_len, offset=data_ptr * 512
    ).reshape(-1, nchan)
    rate = 1e6 / (interval_us * nchan)
    t = np.arange(arr.shape[0], dtype=np.float64) / rate
    frames = [
        pd.DataFrame({"time_index": t, "signal_value": arr[:, c].astype(float)})
        for c in range(nchan)
    ]
    return frames, rate


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
