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
    """Decode one ABF file and write long-format parquet; returns the row
    count. Requires ``pyabf`` (import-gated — absent in this container)."""
    try:
        import pyabf
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "pyabf is required for ABF ingestion: pip install pyabf"
        ) from e
    long = channels_to_long(extract_channels(pyabf.ABF(abf_path), n_channels))
    long.to_parquet(out_path, index=False)
    return len(long)
