"""OGG/Vorbis decode tests (umx_tpu/io/ogg.py via load_audio).

Fixtures are fabricated in-test by the independent ctypes libvorbisenc
encoder (tests/ogg_writer.py), mirroring how tests/test_flac.py validates
the FLAC decoder against tests/flac_writer.py.  Vorbis is lossy, so the
assertions are correlation/energy bounds rather than bit-exactness.

Capability parity target: the reference decodes OGG through libnyquist
(reference src/dsp.cpp:6-8); its 44.1 kHz gate and mono duplication
(dsp.cpp:27-60) apply to OGG inputs exactly as to WAV.
"""

from __future__ import annotations

import numpy as np
import pytest

from umx_tpu.io import ogg
from umx_tpu.io.audio import UnsupportedAudio, load_audio

ogg_writer = pytest.importorskip("ogg_writer")  # tests/ is on sys.path via rootdir

pytestmark = pytest.mark.skipif(
    not (ogg.available() and ogg_writer.available()),
    reason="system libvorbis not available",
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
    path = str(tmp_path / "tone.ogg")
    ogg_writer.write_ogg(path, sig, rate)

    out = load_audio(path)
    assert out.shape == (2, sig.shape[0])
    assert out.dtype == np.float32
    for c in range(2):
        assert _corr(out[c], sig[:, c]) > 0.99
        # energy preserved within lossy tolerance
        ratio = np.linalg.norm(out[c]) / np.linalg.norm(sig[:, c])
        assert 0.95 < ratio < 1.05


def test_mono_duplicated_to_stereo(tmp_path):
    rate = 44100
    sig = _tone(rate, 0.8, freqs=(330.0,))
    path = str(tmp_path / "mono.ogg")
    ogg_writer.write_ogg(path, sig, rate)

    out = load_audio(path)
    assert out.shape == (2, sig.shape[0])
    np.testing.assert_array_equal(out[0], out[1])
    assert _corr(out[0], sig[:, 0]) > 0.99


def test_foreign_rate_rejected_then_resampled(tmp_path):
    rate = 48000
    sig = _tone(rate, 0.7)
    path = str(tmp_path / "tone48k.ogg")
    ogg_writer.write_ogg(path, sig, rate)

    with pytest.raises(UnsupportedAudio, match="48000"):
        load_audio(path)

    out = load_audio(path, resample=True)
    assert out.shape[0] == 2
    expect_n = round(sig.shape[0] * 44100 / 48000)
    assert abs(out.shape[1] - expect_n) <= 2
    # resampled 440 Hz tone still correlates with a 44.1 kHz rendering
    ref = _tone(44100, 0.7)
    assert _corr(out[0], ref[: out.shape[1], 0]) > 0.98


def test_corrupt_ogg_raises(tmp_path):
    path = str(tmp_path / "bad.ogg")
    with open(path, "wb") as fh:
        fh.write(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError, match="Vorbis"):
        load_audio(path)


def test_truncated_stream_still_decodes_prefix(tmp_path):
    rate = 44100
    sig = _tone(rate, 1.0)
    path = str(tmp_path / "full.ogg")
    # page_per_packet: a pure tone compresses so well the whole second
    # fits one Ogg page, and cutting that page leaves nothing decodable
    ogg_writer.write_ogg(path, sig, rate, page_per_packet=True)
    blob = open(path, "rb").read()
    cut = str(tmp_path / "cut.ogg")
    with open(cut, "wb") as fh:
        fh.write(blob[: len(blob) * 2 // 3])

    data, r = ogg.decode_ogg(cut)
    assert r == rate
    # decodes a usable prefix of the stream
    assert 0 < data.shape[0] < sig.shape[0]
    assert _corr(data[:, 0], sig[: data.shape[0], 0]) > 0.98


def test_decoder_reports_unavailable_gracefully(monkeypatch, tmp_path):
    import umx_tpu.io.ogg as oggmod

    monkeypatch.setattr(oggmod, "_lib", None)
    monkeypatch.setattr(oggmod, "_lib_tried", True)
    path = str(tmp_path / "x.ogg")
    with open(path, "wb") as fh:
        fh.write(b"OggS" + b"\x00" * 16)
    with pytest.raises(UnsupportedAudio, match="libvorbisfile"):
        load_audio(path)
