"""Native FLAC decoder tests: every decoder path (subframe types, stereo
decorrelation modes, bit depths, block layouts) validated bit-exactly
against an independent spec-based Python encoder (tests/flac_writer.py),
plus real-audio round trips on the gspi fixture.

Role parity: the reference decodes FLAC through vendored libnyquist
(src/dsp.cpp:6-8); OGG (lossy) is a documented rejection.
"""

import os

import numpy as np
import pytest

from umx_tpu.io import native
from umx_tpu.io.audio import UnsupportedAudio, load_audio

flac_writer = pytest.importorskip("flac_writer")  # tests/ is on sys.path via rootdir
write_flac = flac_writer.write_flac

from native_build import ensure_native_built  # tests/ is on sys.path via rootdir

pytestmark = pytest.mark.skipif(not ensure_native_built(), reason="libumxio.so not built")

DATA = os.path.join(os.path.dirname(__file__), "data")


def _random_pcm(rng, n, ch, bps):
    lim = 1 << (bps - 1)
    # band-limited-ish signal + noise keeps rice params reasonable
    t = np.arange(n)
    base = 0.5 * np.sin(2 * np.pi * 220 * t / 44100)[:, None]
    noise = rng.uniform(-0.3, 0.3, (n, ch))
    x = np.clip(base + noise, -0.99, 0.99)
    return np.round(x * (lim - 1)).astype(np.int64)


@pytest.mark.parametrize(
    "kinds",
    [
        ["verbatim"],
        ["constant"],
        [("fixed", 0)],
        [("fixed", 1)],
        [("fixed", 2)],
        [("fixed", 3)],
        [("fixed", 4)],
        [("lpc", 1, 5, [32])],
        [("lpc", 2, 6, [120, -56])],
        [("lpc", 8, 7, [90, 20, -10, 5, -3, 2, -1, 1])],
        ["verbatim", ("fixed", 2), ("lpc", 2, 6, [120, -56]), ("fixed", 4)],
    ],
)
def test_subframe_kinds_bit_exact(tmp_path, kinds):
    rng = np.random.default_rng(hash(str(kinds)) % 2**31)
    n = 4096 * 2 + 777  # exercises the short final frame (16-bit bs header)
    pcm = _random_pcm(rng, n, 2, 16)
    if kinds == ["constant"]:
        pcm[:] = -1234
    path = str(tmp_path / "t.flac")
    write_flac(path, pcm, frame_kinds=kinds)
    data, rate = native.read_flac_native(path)
    assert rate == 44100 and data.shape == (n, 2)
    np.testing.assert_array_equal(
        np.round(data * 32768.0).astype(np.int64), pcm
    )


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(tmp_path, mode):
    rng = np.random.default_rng(11)
    pcm = _random_pcm(rng, 4096 + 500, 2, 16)
    path = str(tmp_path / f"{mode}.flac")
    write_flac(path, pcm, frame_kinds=[("fixed", 2)], stereo_mode=mode)
    data, rate = native.read_flac_native(path)
    np.testing.assert_array_equal(np.round(data * 32768.0).astype(np.int64), pcm)


def test_24bit_mono(tmp_path):
    rng = np.random.default_rng(12)
    pcm = _random_pcm(rng, 3000, 1, 24)
    path = str(tmp_path / "m24.flac")
    write_flac(path, pcm, bps=24, frame_kinds=[("fixed", 1)])
    data, rate = native.read_flac_native(path)
    assert data.shape == (3000, 1)
    np.testing.assert_array_equal(
        np.round(data * float(1 << 23)).astype(np.int64), pcm
    )


def test_load_audio_flac_mono_duplicates_to_stereo(tmp_path):
    rng = np.random.default_rng(13)
    pcm = _random_pcm(rng, 5000, 1, 16)
    path = str(tmp_path / "m.flac")
    write_flac(path, pcm)
    out = load_audio(path)
    assert out.shape == (2, 5000)
    np.testing.assert_array_equal(out[0], out[1])


def test_load_audio_rejects_non_vorbis_ogg(tmp_path):
    # OGG/Vorbis now decodes (tests/test_ogg.py); an Ogg container that
    # is not a Vorbis stream must still fail loudly, not as silence
    path = str(tmp_path / "x.ogg")
    with open(path, "wb") as f:
        f.write(b"OggS" + b"\x00" * 100)
    with pytest.raises(ValueError, match="Vorbis"):
        load_audio(path)


def test_truncated_flac_raises(tmp_path):
    rng = np.random.default_rng(14)
    pcm = _random_pcm(rng, 9000, 2, 16)
    path = str(tmp_path / "t.flac")
    write_flac(path, pcm)
    blob = open(path, "rb").read()
    short = str(tmp_path / "short.flac")
    with open(short, "wb") as f:
        f.write(blob[: len(blob) * 2 // 3])
    with pytest.raises(IOError):
        native.read_flac_native(short)


def test_gspi_fixture_flac_round_trip(tmp_path):
    """The real glockenspiel recording survives a FLAC encode/decode
    cycle bit-exactly and matches the WAV-decoded samples."""
    wav = load_audio(os.path.join(DATA, "gspi_stereo.wav"))
    pcm = np.round(wav.T * 32768.0).astype(np.int64)
    pcm = np.clip(pcm, -32768, 32767)
    path = str(tmp_path / "gspi.flac")
    write_flac(path, pcm, frame_kinds=[("fixed", 2), ("lpc", 2, 6, [120, -56])])
    out = load_audio(path)
    np.testing.assert_allclose(out, wav, atol=1.0 / 32768.0)


def test_unknown_length_stream_with_trailing_bytes(tmp_path):
    # STREAMINFO total_samples=0 is legal (pipe encoders); junk after the
    # last frame must not fail the decode (round-2 review finding)
    rng = np.random.default_rng(15)
    pcm = _random_pcm(rng, 4096 + 100, 2, 16)
    path = str(tmp_path / "nolen.flac")
    write_flac(path, pcm, total_samples_zero=True, trailing_bytes=b"TAGJUNK" * 16)
    data, rate = native.read_flac_native(path)
    assert data.shape == (4096 + 100, 2)
    np.testing.assert_array_equal(np.round(data * 32768.0).astype(np.int64), pcm)


def test_frame_sample_size_overrides_streaminfo(tmp_path):
    # a frame header may declare its own sample size; scaling must follow
    # the FRAME depth, not STREAMINFO's (round-2 review finding)
    rng = np.random.default_rng(16)
    pcm24 = _random_pcm(rng, 3000, 2, 24)
    path = str(tmp_path / "f24.flac")
    write_flac(path, pcm24, bps=16, frame_bps=24, frame_kinds=[("fixed", 1)])
    data, rate = native.read_flac_native(path)
    np.testing.assert_array_equal(
        np.round(data * float(1 << 23)).astype(np.int64), pcm24
    )
