"""Native C++ IO runtime tests: the libumxio ggml parser and WAV codec
must agree exactly with the pure-Python implementations."""

import numpy as np
import pytest

from umx_tpu.io import native

from native_build import ensure_native_built  # tests/ is on sys.path via rootdir

pytestmark = pytest.mark.skipif(not ensure_native_built(), reason="libumxio.so not built")


def test_native_ggml_matches_python(tmp_path):
    from umx_tpu.config import ModelConfig
    from umx_tpu.io.ggml import read_ggml_bytes, write_ggml, write_ggml_bytes
    from umx_tpu.models.umx import synthetic_state_dicts

    cfg = ModelConfig(hidden_size=32)
    targets = synthetic_state_dicts(cfg, seed=71)
    path = str(tmp_path / "m.bin.gz")
    write_ggml(path, cfg.hidden_size, targets)

    nat = native.read_ggml_native(path)
    assert nat is not None
    py = read_ggml_bytes(write_ggml_bytes(cfg.hidden_size, targets))

    assert nat.hidden_size == py.hidden_size == 32
    assert set(nat.targets) == set(py.targets)
    for t in py.targets:
        assert set(nat.targets[t]) == set(py.targets[t])
        for name, arr in py.targets[t].items():
            got = nat.targets[t][name]
            assert got.shape == arr.shape, (t, name)
            np.testing.assert_allclose(got, arr, atol=1e-6, err_msg=f"{t}/{name}")


def test_native_ggml_uncompressed(tmp_path):
    from umx_tpu.config import ModelConfig
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts

    cfg = ModelConfig(hidden_size=32)
    path = str(tmp_path / "m.bin")
    write_ggml(path, 32, synthetic_state_dicts(cfg, seed=72))
    nat = native.read_ggml_native(path)
    assert nat is not None and nat.hidden_size == 32


def test_native_ggml_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.bin")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(IOError):
        native.read_ggml_native(path)


def test_native_wav_write_read_round_trip(tmp_path):
    rng = np.random.default_rng(73)
    data = rng.uniform(-1, 1, (1000, 2)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    assert native.write_wav_native(path, data, 44100)
    out, rate = native.read_wav_native(path)
    assert rate == 44100
    np.testing.assert_array_equal(out, data)


def test_native_wav_read_matches_scipy(tmp_path):
    from scipy.io import wavfile

    rng = np.random.default_rng(74)
    for dtype, scale in ((np.int16, 32768.0), (np.float32, 1.0)):
        data = rng.uniform(-0.9, 0.9, (500, 2))
        stored = (data * scale).astype(dtype)
        path = str(tmp_path / f"t_{np.dtype(dtype).name}.wav")
        wavfile.write(path, 44100, stored)
        out, rate = native.read_wav_native(path)
        assert rate == 44100
        np.testing.assert_allclose(out, stored.astype(np.float64) / scale, atol=1e-6)


def test_native_wav_via_audio_module(tmp_path):
    # load_audio must transparently use the native decoder
    from umx_tpu.io.audio import load_audio, write_audio

    rng = np.random.default_rng(75)
    wave = rng.uniform(-1, 1, (2, 800)).astype(np.float32)
    path = str(tmp_path / "w.wav")
    write_audio(path, wave)
    back = load_audio(path)
    np.testing.assert_allclose(back, wave, atol=1e-6)


def test_native_gunzip_rejects_truncated(tmp_path):
    # ADVICE r1: a truncated .bin.gz must fail the native parse cleanly
    # (Z_STREAM_END required), matching the Python gzip path's raise
    from umx_tpu.config import ModelConfig
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts

    cfg = ModelConfig(hidden_size=32)
    path = str(tmp_path / "m.bin.gz")
    write_ggml(path, 32, synthetic_state_dicts(cfg, seed=76))
    blob = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.bin.gz")
    with open(trunc, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises((IOError, ValueError)):
        native.read_ggml_native(trunc)


def test_native_short_uncompressed_raises_missing_tensors(tmp_path):
    # ADVICE r1: a short (uncompressed) file must raise the same
    # ValueError as the Python parser, not return a silently partial model
    from umx_tpu.config import ModelConfig
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts

    cfg = ModelConfig(hidden_size=32)
    path = str(tmp_path / "m.bin")
    write_ggml(path, 32, synthetic_state_dicts(cfg, seed=77))
    blob = open(path, "rb").read()
    short = str(tmp_path / "short.bin")
    with open(short, "wb") as f:
        f.write(blob[: int(len(blob) * 0.8)])
    with pytest.raises((IOError, ValueError)):
        native.read_ggml_native(short)
