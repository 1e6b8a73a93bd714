"""ABF source plumbing: the conversion layer (everything except the
pyabf decode itself) against a stub recording."""

import numpy as np
import pandas as pd
import pytest

from myodish_peak_analysis_spark.sources.abf import (
    abf_to_parquet,
    channels_to_long,
    extract_channels,
)


class StubABF:
    """Mimics the two pyabf attributes the reference touches."""

    def __init__(self, n=20, channels=3):
        self._channels = channels
        self._n = n
        self.sweepX = None
        self.sweepY = None

    def setSweep(self, sweep, channel):
        assert sweep == 0
        self.sweepX = np.arange(self._n) / 100.0
        self.sweepY = np.sin(np.arange(self._n) + channel).astype(float)


def test_channels_to_long_layout(spark):
    frames = extract_channels(StubABF(), n_channels=3)
    long = channels_to_long(frames)
    assert list(long.columns) == ["channel_id", "sample_idx", "time_index", "signal_value"]
    assert len(long) == 60 and long["channel_id"].nunique() == 3
    # per-channel indices restart at 0 and align positionally
    g = long[long.channel_id == 2].reset_index(drop=True)
    assert (g["sample_idx"] == np.arange(20)).all()
    assert g["signal_value"].iloc[3] == pytest.approx(np.sin(3 + 2))

    # the engine reads the result as a signal frame directly
    df = spark.createDataFrame(long)
    assert df.count() == 60 and set(df.columns) == set(long.columns)


def test_abf_to_parquet_unknown_or_corrupt_fails_loudly(tmp_path):
    # round 6: the stdlib fallback dispatches on magic (ABF1 AND ABF2)
    # — an unknown container must say so, and a truncated ABF2 must
    # fail loudly rather than decode garbage
    bad = tmp_path / "bad.abf"
    bad.write_bytes(b"NOPE" + b"\x00" * 100)
    with pytest.raises(ValueError, match="not an ABF file"):
        abf_to_parquet(str(bad), str(tmp_path / "o.parquet"))

    trunc = tmp_path / "trunc.abf"
    trunc.write_bytes(b"ABF2" + b"\x00" * 100)  # no section map
    # the specific contract, not just "some exception": an unintended
    # struct.error/IndexError from reading past the buffer must FAIL
    # this test, not pass it
    with pytest.raises(ValueError, match="truncated"):
        abf_to_parquet(str(trunc), str(tmp_path / "o2.parquet"))


def test_read_documents_three_formats_identical(spark, tmp_path):
    import os

    from myodish_peak_analysis_spark.sources.text import read_documents

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tricky = spark.createDataFrame(
        # newline + quote + comma in text: the CSV hazard cases
        [(99990, 'line one\nline "two", three', "en", "web", 26)],
        base.schema,
    )
    rows = base.limit(50).unionByName(tricky)
    pq = os.path.join(str(tmp_path), "pq")
    jl = os.path.join(str(tmp_path), "jl")
    cs = os.path.join(str(tmp_path), "cs")
    rows.write.parquet(pq)
    rows.write.json(jl)
    # escape='"' => RFC-4180 doubled quotes, the dialect read_documents
    # expects (Spark's writer default is backslash-escape, nonstandard)
    rows.write.option("header", "true").option("escape", '"').csv(cs)

    def key(df):
        return sorted(
            (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in df.collect()
        )

    a = read_documents(spark, pq, "parquet")
    b = read_documents(spark, jl, "jsonl")
    c = read_documents(spark, cs, "csv")
    assert a.schema == b.schema == c.schema
    assert key(a) == key(b) == key(c)


def test_abf1_roundtrip_and_parquet_ingestion(spark, tmp_path):
    """Pure-stdlib ABF1 float path: write a recording, decode it back
    bit-exact, and run the full abf_to_parquet ingestion (which now
    falls back to the stdlib reader when pyabf is absent) into a frame
    the engine can channelize."""
    import os

    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import (
        abf_to_parquet,
        read_abf1_float,
        write_abf1_float,
    )

    rng = np.random.default_rng(7)
    n, c, rate = 400, 3, 100.0
    data = rng.normal(size=(n, c)).astype("<f4")
    path = os.path.join(str(tmp_path), "rec.abf")
    write_abf1_float(path, data, rate)

    frames, got_rate = read_abf1_float(path)
    # the per-conversion interval is stored as float32, so the
    # recovered rate is approximate at the 1e-6 level
    assert abs(got_rate - 100.0) < 1e-3
    assert len(frames) == c
    for ch in range(c):
        assert np.array_equal(
            frames[ch]["signal_value"].to_numpy(dtype="<f4"), data[:, ch]
        )
        assert abs(frames[ch]["time_index"].iloc[1] - 1.0 / rate) < 1e-9

    out = os.path.join(str(tmp_path), "rec.parquet")
    rows = abf_to_parquet(path, out, n_channels=c)
    assert rows == n * c
    df = spark.read.parquet(out)
    assert df.count() == n * c
    assert set(df.columns) == {
        "channel_id", "sample_idx", "time_index", "signal_value",
    }
    assert df.filter("channel_id = 2").count() == n


def test_abf1_corrupt_headers_fail_loudly(tmp_path):
    import struct

    from myodish_peak_analysis_spark.sources.abf import (
        abf_to_parquet,
        read_abf1_float,
        write_abf1_float,
    )
    import numpy as np

    path = str(tmp_path / "c.abf")
    write_abf1_float(path, np.zeros((10, 2), dtype="<f4"), 100.0)
    raw = bytearray(open(path, "rb").read())

    bad_ptr = bytearray(raw)
    struct.pack_into("<i", bad_ptr, 40, 0)  # data ptr inside header
    (tmp_path / "p.abf").write_bytes(bytes(bad_ptr))
    with pytest.raises(ValueError, match="inside the header"):
        read_abf1_float(str(tmp_path / "p.abf"))

    bad_int = bytearray(raw)
    struct.pack_into("<f", bad_int, 122, 0.0)  # zero sample interval
    (tmp_path / "i.abf").write_bytes(bytes(bad_int))
    with pytest.raises(ValueError, match="not positive"):
        read_abf1_float(str(tmp_path / "i.abf"))

    # short file: fewer channels than requested must raise, not truncate
    with pytest.raises(ValueError, match="channels"):
        abf_to_parquet(path, str(tmp_path / "o.parquet"), n_channels=9)


def test_abf1_int16_gain_chain_roundtrip(tmp_path):
    """Write engineering-unit floats through the INVERTED gain chain
    (int16 counts + header gain fields), read back through the forward
    chain; error bounded by half a quantized count."""
    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import (
        read_abf1,
        write_abf1_int16,
    )

    rng = np.random.default_rng(7)
    data = rng.uniform(-3.0, 3.0, size=(200, 3))
    rate = 1000.0
    path = str(tmp_path / "i16.abf")
    kw = dict(
        adc_range=10.0,
        adc_resolution=32768,
        instrument_scale=0.5,
        signal_gain=2.0,
        programmable_gain=2.0,
        instrument_offset=0.25,
        signal_offset=0.1,
    )
    write_abf1_int16(path, data, rate, **kw)
    frames, got_rate = read_abf1(path)
    assert got_rate == pytest.approx(rate, rel=1e-6)
    assert len(frames) == 3
    total_gain = 0.5 * 2.0 * 2.0
    half_count = 0.5 * (10.0 / 32768) / total_gain
    for c, f in enumerate(frames):
        err = np.abs(f["signal_value"].to_numpy() - data[:, c])
        assert err.max() <= half_count * 1.01  # float32 header slack


def test_abf1_int16_telegraph_and_sampling_seq(tmp_path):
    """Telegraph gain (extended header) must divide into the chain when
    enabled, and nADCSamplingSeq must route data columns to their
    mapped physical channels' gain slots."""
    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import (
        read_abf1,
        write_abf1_int16,
    )

    data = np.linspace(-1.0, 1.0, 120).reshape(60, 2)
    path = str(tmp_path / "tele.abf")
    write_abf1_int16(
        path,
        data,
        500.0,
        telegraph_gain=5.0,
        sampling_seq=[4, 9],  # non-identity physical mapping
    )
    frames, _ = read_abf1(path)
    total_gain = 0.5 * 2.0 * 1.0 * 5.0  # defaults × telegraph
    half_count = 0.5 * (10.0 / 32768) / total_gain
    for c, f in enumerate(frames):
        err = np.abs(f["signal_value"].to_numpy() - data[:, c])
        assert err.max() <= half_count * 1.01


def test_abf1_int16_corrupt_gain_chain_raises(tmp_path):
    import struct

    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import (
        _OFF_INST_SCALE,
        read_abf1,
        write_abf1_int16,
    )

    path = str(tmp_path / "z.abf")
    write_abf1_int16(path, np.zeros((10, 1)), 100.0)
    raw = bytearray(open(path, "rb").read())
    struct.pack_into("<f", raw, _OFF_INST_SCALE, 0.0)  # zero divisor
    bad = tmp_path / "zz.abf"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="divisor is 0"):
        read_abf1(str(bad))


def test_abf2_roundtrip_float_and_int16(tmp_path):
    """ABF2 container round-trip: float32 exact (up to f4 precision),
    int16 within half a quantized count through the gain chain, and
    the magic dispatcher routes both containers."""
    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import (
        read_abf,
        read_abf2,
        write_abf2,
    )

    rng = np.random.default_rng(11)
    data = rng.uniform(-2.0, 2.0, size=(150, 4))
    rate = 2000.0

    fpath = str(tmp_path / "f.abf2")
    write_abf2(fpath, data, rate)
    frames, got_rate = read_abf2(fpath)
    assert got_rate == pytest.approx(rate, rel=1e-6)
    assert len(frames) == 4
    for c, f in enumerate(frames):
        np.testing.assert_allclose(
            f["signal_value"].to_numpy(), data[:, c], atol=1e-6
        )

    ipath = str(tmp_path / "i.abf2")
    write_abf2(ipath, data, rate, int16=True, telegraph_gain=2.5)
    frames_i, _ = read_abf(ipath)  # via the magic dispatcher
    total_gain = 0.5 * 2.0 * 1.0 * 2.5
    half_count = 0.5 * (10.0 / 32768) / total_gain
    for c, f in enumerate(frames_i):
        err = np.abs(f["signal_value"].to_numpy() - data[:, c])
        assert err.max() <= half_count * 1.01


def test_abf2_corrupt_sections_raise(tmp_path):
    import struct

    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import read_abf2, write_abf2

    path = str(tmp_path / "c.abf2")
    write_abf2(path, np.zeros((10, 2)), 100.0)
    raw = bytearray(open(path, "rb").read())

    bad = bytearray(raw)
    # zero the protocol's fADCSequenceInterval
    struct.pack_into("<f", bad, 512 + 2, 0.0)
    (tmp_path / "z.abf2").write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="not positive"):
        read_abf2(str(tmp_path / "z.abf2"))

    with pytest.raises(ValueError, match="not an ABF2"):
        read_abf2(__file__)


def test_abf1_pre18_file_ignores_telegraph_region(tmp_path):
    """ADVICE r6: a pre-1.8 ABF1 int16 file whose data section starts
    past byte 4640 (synch/tag sections between header and data) must
    NOT have those bytes read as a telegraph block — the reader gates
    on fFileVersionNumber, with the length check only as a truncation
    guard."""
    import struct

    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import (
        read_abf1,
        write_abf1_int16,
    )

    rng = np.random.default_rng(11)
    data = rng.normal(size=(64, 2))
    base = str(tmp_path / "base.abf")
    write_abf1_int16(base, data, 100.0)  # version 1.30, 2048-B header
    raw = bytearray(open(base, "rb").read())
    want, _ = read_abf1(base)

    # move the data section to block 10 (byte 5120 > 4640) and fill
    # the gap — including the would-be telegraph offsets — with bytes
    # that decode as "telegraph enabled, additional gain 7.5"
    moved = bytearray(raw[:2048]) + bytearray(5120 - 2048) + raw[2048:]
    struct.pack_into("<i", moved, 40, 10)  # lDataSectionPtr → byte 5120
    for a in range(16):
        struct.pack_into("<h", moved, 4512 + 2 * a, 1)
        struct.pack_into("<f", moved, 4576 + 4 * a, 7.5)
    p = str(tmp_path / "pre18.abf")
    open(p, "wb").write(bytes(moved))

    got, _ = read_abf1(p)
    for c in range(2):
        assert np.array_equal(
            got[c]["signal_value"].to_numpy(),
            want[c]["signal_value"].to_numpy(),
        ), "pre-1.8 reader applied garbage telegraph gain"

    # flipping the version field to 1.83 on the SAME bytes must now
    # apply the 7.5x telegraph divisor — proving the gate is the
    # version field, not the layout
    struct.pack_into("<f", moved, 4, 1.83)
    p2 = str(tmp_path / "v18.abf")
    open(p2, "wb").write(bytes(moved))
    got2, _ = read_abf1(p2)
    a = got2[0]["signal_value"].to_numpy()
    b = want[0]["signal_value"].to_numpy()
    assert not np.allclose(a, b), "version 1.83 should change the gain chain"


def test_bpe_batch_skips_candidates_touching_prior_merged_token():
    """ADVICE r6: a candidate whose token EQUALS an earlier batch
    member's merged output (e.g. {(a,b), (a+b,c)} when 'a+b' already
    exists from a prior round) has a stale count once (a,b) applies —
    it must be deferred to the next recount."""
    from myodish_peak_analysis_spark.llm.bpe import _select_noninterfering

    rows = [
        {"l": "a", "r": "b", "n": 10},
        {"l": "a+b", "r": "c", "n": 8},   # touches (a,b)'s merged output
        {"l": "d", "r": "a+b", "n": 7},   # ditto, on the right side
        {"l": "x", "r": "y", "n": 5},
    ]
    got = _select_noninterfering(rows, budget=3)
    assert got == [("a", "b", 10), ("x", "y", 5)]


def test_abf1_episodic_sweeps_roundtrip(tmp_path):
    """Round-7: episodic (nOperationMode=5) ABF1 decode — sweeps split
    on lNumSamplesPerEpisode, per-sweep time restarts at 0 (pyabf
    sweepX semantics), and the single-sweep readers refuse loudly
    instead of flattening sweeps into a fabricated time axis."""
    import struct

    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import (
        abf_to_parquet,
        read_abf1,
        read_abf1_sweeps,
        read_abf_sweeps,
        write_abf1_int16,
    )

    rng = np.random.default_rng(3)
    n, c, k = 240, 2, 4  # 4 sweeps x 60 rows
    data = rng.uniform(-2, 2, size=(n, c))
    path = str(tmp_path / "epi.abf")
    write_abf1_int16(path, data, 500.0, episodes=k)

    with pytest.raises(ValueError, match="episodic"):
        read_abf1(path)

    sweeps, rate = read_abf1_sweeps(path)
    assert rate == pytest.approx(500.0, rel=1e-6)
    assert len(sweeps) == k and all(len(s) == c for s in sweeps)
    half_count = 0.5 * (10.0 / 32768) / (0.5 * 2.0 * 1.0)
    for s in range(k):
        for ch in range(c):
            f = sweeps[s][ch]
            assert len(f) == n // k
            # time restarts at 0 every sweep
            assert f["time_index"].iloc[0] == 0.0
            assert f["time_index"].iloc[1] == pytest.approx(1 / 500.0)
            want = data[s * (n // k) : (s + 1) * (n // k), ch]
            err = np.abs(f["signal_value"].to_numpy() - want)
            assert err.max() <= half_count * 1.01

    # dispatcher agrees, and a gap-free file is a 1-sweep superset
    assert len(read_abf_sweeps(path)[0]) == k
    gap = str(tmp_path / "gap.abf")
    write_abf1_int16(gap, data, 500.0)
    assert len(read_abf_sweeps(gap)[0]) == 1

    # abf_to_parquet picks the requested sweep (reference: sweep 0)
    out = str(tmp_path / "s2.parquet")
    rows = abf_to_parquet(path, out, n_channels=c, sweep=2)
    assert rows == (n // k) * c
    import pandas as pd

    got = pd.read_parquet(out)
    want = data[2 * (n // k) : 3 * (n // k), 1]
    ch1 = got[got.channel_id == 1].sort_values("sample_idx")
    assert np.abs(ch1["signal_value"].to_numpy() - want).max() <= half_count * 1.01

    with pytest.raises(ValueError, match="sweep=9"):
        abf_to_parquet(path, out, n_channels=c, sweep=9)

    # corrupt episode geometry fails loudly
    raw = bytearray(open(path, "rb").read())
    struct.pack_into("<i", raw, 138, 7)  # not a multiple of channels
    bad = tmp_path / "badspe.abf"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="multiple"):
        read_abf1_sweeps(str(bad))

    with pytest.raises(ValueError, match="evenly divide"):
        write_abf1_int16(str(tmp_path / "x.abf"), data, 500.0, episodes=7)


def test_abf2_episodic_sweeps_roundtrip(tmp_path):
    """Round-7: episodic (nOperationMode=5) ABF2 decode — ABF2 stores
    no per-episode sample count, so sweeps split as rows /
    lActualEpisodes (pyabf's derivation); per-sweep time restarts at 0
    and the single-sweep reader refuses loudly."""
    import numpy as np

    from myodish_peak_analysis_spark.sources.abf import (
        abf_to_parquet,
        read_abf2,
        read_abf2_sweeps,
        read_abf_sweeps,
        write_abf2,
    )

    rng = np.random.default_rng(9)
    n, c, k = 180, 3, 3  # 3 sweeps x 60 rows
    data = rng.uniform(-2, 2, size=(n, c))
    path = str(tmp_path / "epi2.abf")
    write_abf2(path, data, 1000.0, int16=True, episodes=k)

    with pytest.raises(ValueError, match="episodic"):
        read_abf2(path)

    sweeps, rate = read_abf2_sweeps(path)
    assert rate == pytest.approx(1000.0, rel=1e-6)
    assert len(sweeps) == k and all(len(s) == c for s in sweeps)
    half_count = 0.5 * (10.0 / 32768) / (0.5 * 2.0 * 1.0)
    for s in range(k):
        for ch in range(c):
            f = sweeps[s][ch]
            assert len(f) == n // k
            assert f["time_index"].iloc[0] == 0.0
            assert f["time_index"].iloc[1] == pytest.approx(1 / 1000.0)
            want = data[s * (n // k) : (s + 1) * (n // k), ch]
            err = np.abs(f["signal_value"].to_numpy() - want)
            assert err.max() <= half_count * 1.01

    # float32 episodic round-trips exactly; dispatcher agrees
    fpath = str(tmp_path / "epi2f.abf")
    write_abf2(fpath, data, 1000.0, episodes=k)
    fsweeps, _ = read_abf_sweeps(fpath)
    assert len(fsweeps) == k
    np.testing.assert_allclose(
        fsweeps[1][0]["signal_value"].to_numpy(),
        data[60:120, 0],
        rtol=0,
        atol=1e-6,
    )

    # gap-free write stays a 1-sweep superset; bad episode count raises
    gap = str(tmp_path / "gap2.abf")
    write_abf2(gap, data, 1000.0)
    assert len(read_abf_sweeps(gap)[0]) == 1
    with pytest.raises(ValueError, match="divide"):
        write_abf2(str(tmp_path / "bad.abf"), data, 1000.0, episodes=7)

    # abf_to_parquet picks the requested sweep on ABF2 too
    out = str(tmp_path / "s1.parquet")
    rows = abf_to_parquet(path, out, n_channels=c, sweep=1)
    assert rows == (n // k) * c
