"""MP3 decode tests (umx_tpu/io/mp3.py via load_audio).

Fixtures are fabricated in-test by the independent ctypes libmp3lame
encoder (tests/mp3_writer.py) — LAME encodes, mpg123 decodes, so the
two sides share no code.  MP3 is lossy: assertions are correlation /
energy bounds plus the GAPLESS length contract (the LAME info tag's
delay/padding values must round-trip through mpg123's trimming).

Capability parity target: the reference decodes MP3 through libnyquist
(reference src/dsp.cpp:6-8); its 44.1 kHz gate and mono duplication
(dsp.cpp:27-60) apply to MP3 inputs exactly as to WAV.
"""

from __future__ import annotations

import numpy as np
import pytest

from umx_tpu.io import mp3
from umx_tpu.io.audio import UnsupportedAudio, load_audio

mp3_writer = pytest.importorskip("mp3_writer")  # tests/ is on sys.path via rootdir

pytestmark = pytest.mark.skipif(
    not (mp3.available() and mp3_writer.available()),
    reason="system libmpg123/libmp3lame not available",
)


def _tone(rate: int, secs: float, freqs=(440.0, 523.25), amp=0.45) -> np.ndarray:
    t = np.arange(int(rate * secs)) / rate
    chans = [amp * np.sin(2 * np.pi * f * t) for f in freqs]
    return np.stack(chans, axis=1).astype(np.float32)


def _corr(a: np.ndarray, b: np.ndarray) -> float:
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_stereo_roundtrip_through_load_audio(tmp_path):
    rate = 44100
    sig = _tone(rate, 1.5)
    path = str(tmp_path / "tone.mp3")
    mp3_writer.write_mp3(path, sig, rate)

    out = load_audio(path)
    assert out.dtype == np.float32
    assert out.shape[0] == 2
    # gapless contract: the LAME tag's delay/padding trims to the
    # original length (allow one MDCT granule of slack for old libs)
    assert abs(out.shape[1] - sig.shape[0]) <= 576
    for c in range(2):
        assert _corr(out[c], sig[:, c]) > 0.98
        ratio = np.linalg.norm(out[c][: sig.shape[0]]) / np.linalg.norm(sig[:, c])
        assert 0.9 < ratio < 1.1


def test_mono_duplicated_to_stereo(tmp_path):
    rate = 44100
    sig = _tone(rate, 0.8, freqs=(330.0,))
    path = str(tmp_path / "mono.mp3")
    mp3_writer.write_mp3(path, sig, rate)

    out = load_audio(path)
    assert out.shape[0] == 2
    np.testing.assert_array_equal(out[0], out[1])
    assert _corr(out[0], sig[:, 0]) > 0.98


def test_foreign_rate_rejected_then_resampled(tmp_path):
    rate = 32000  # an MPEG-1 layer III rate != 44100
    sig = _tone(rate, 0.7)
    path = str(tmp_path / "tone32k.mp3")
    mp3_writer.write_mp3(path, sig, rate)

    with pytest.raises(UnsupportedAudio, match="32000"):
        load_audio(path)

    out = load_audio(path, resample=True)
    assert out.shape[0] == 2
    expect_n = round(sig.shape[0] * 44100 / 32000)
    assert abs(out.shape[1] - expect_n) <= 1024  # lossy edge slack

    # resampled correlation against an ideal-rate rendering of the tone
    ref = _tone(44100, 0.7)
    n = min(out.shape[1], ref.shape[0])
    assert _corr(out[0][:n], ref[:n, 0]) > 0.95


def test_decode_is_deterministic(tmp_path):
    """ctypes regression guard: repeated decodes hash identically (the
    historical failure mode was a temporary's .ctypes.data being freed
    before the callee read it, which shows up as nondeterminism)."""
    rate = 44100
    sig = _tone(rate, 0.5)
    path = str(tmp_path / "det.mp3")
    mp3_writer.write_mp3(path, sig, rate)

    ref = mp3.decode_mp3(path)
    assert ref is not None
    for _ in range(3):
        again = mp3.decode_mp3(path)
        np.testing.assert_array_equal(again[0], ref[0])
        assert again[1] == ref[1]


def test_id3_and_sync_sniff():
    assert mp3.looks_like_mp3(b"ID3\x04")
    assert mp3.looks_like_mp3(bytes([0xFF, 0xFB, 0x90, 0x00]))
    assert not mp3.looks_like_mp3(b"RIFF")
    assert not mp3.looks_like_mp3(b"fLaC")
    assert not mp3.looks_like_mp3(b"OggS")
    assert not mp3.looks_like_mp3(bytes([0xFF, 0x01, 0x00, 0x00]))


def test_garbage_rejected(tmp_path):
    path = str(tmp_path / "junk.mp3")
    with open(path, "wb") as fh:
        fh.write(b"ID3" + bytes(64))  # ID3 header then garbage, no frames
    with pytest.raises(ValueError):
        load_audio(path)
