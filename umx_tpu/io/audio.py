"""Host-side WAV decode/encode.

Role-equivalent of the reference's libnyquist usage (dsp.cpp:18-101):
44.1 kHz enforcement, mono→stereo duplication, (2, N) channel-major float32
layout, float32 PCM output.  Uses the native C++ codec (native/umxio.cpp)
when built, else scipy.
"""

from __future__ import annotations

import numpy as np

from umx_tpu.io import native


class UnsupportedAudio(ValueError):
    pass


def _decode_scipy(path: str) -> tuple[np.ndarray, int]:
    from scipy.io import wavfile

    rate, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[:, None]
    return data, rate


def load_audio(path: str, expected_rate: int = 44100, resample: bool = False) -> np.ndarray:
    """Load a WAV into a float32 (2, n_samples) array.

    Enforces the supported sample rate and mono/stereo channel counts the
    same way the reference does (dsp.cpp:27-44), raising instead of
    exit(1).  With ``resample`` (beyond the reference, which hard-rejects
    other rates), inputs are polyphase-resampled to ``expected_rate``.
    """
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic == b"fLaC":
        decoded = native.read_flac_native(path)
        if decoded is None:
            raise UnsupportedAudio(
                f"{path}: FLAC decoding requires the native library "
                "(build it with `make -C native`)"
            )
    elif magic == b"OggS":
        # OGG/Vorbis decode via the system libvorbisfile (io/ogg.py) —
        # capability parity with the reference's libnyquist path
        # (dsp.cpp:6-8).  Lossy: see docs/audio-formats.md quality note.
        from umx_tpu.io import ogg

        decoded = ogg.decode_ogg(path)
        if decoded is None:
            raise UnsupportedAudio(
                f"{path}: OGG decoding requires the system libvorbisfile "
                "(not found); supply WAV or FLAC"
            )
    else:
        from umx_tpu.io import mp3

        if mp3.looks_like_mp3(magic):
            # MP3 decode via the system libmpg123 (io/mp3.py) — parity
            # with the reference's libnyquist dr_mp3 path (dsp.cpp:6-8).
            # Checked after the fixed-magic formats: MP3 has no magic,
            # only an ID3 tag or a frame sync.
            decoded = mp3.decode_mp3(path)
            if decoded is None:
                raise UnsupportedAudio(
                    f"{path}: MP3 decoding requires the system libmpg123 "
                    "(not found); supply WAV or FLAC"
                )
        else:
            decoded = native.read_wav_native(path)
            if decoded is None:
                decoded = _decode_scipy(path)
    data, rate = decoded
    if rate != expected_rate:
        if not resample:
            raise UnsupportedAudio(
                f"{path}: sample rate {rate} Hz unsupported; only {expected_rate} Hz "
                "(pass resample=True / --resample to convert)"
            )
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(expected_rate, rate)
        data = resample_poly(
            data.astype(np.float64), expected_rate // g, rate // g, axis=0
        ).astype(np.float32)
    n_ch = data.shape[1]
    if n_ch == 1:
        data = np.repeat(data, 2, axis=1)
    elif n_ch != 2:
        raise UnsupportedAudio(f"{path}: {n_ch} channels unsupported; mono/stereo only")
    return np.ascontiguousarray(data.T, dtype=np.float32)


def write_audio(path: str, waveform: np.ndarray, rate: int = 44100) -> None:
    """Write a (2, n_samples) float32 waveform as a float32 PCM WAV."""
    interleaved = np.ascontiguousarray(np.asarray(waveform, dtype=np.float32).T)
    if native.write_wav_native(path, interleaved, rate):
        return
    from scipy.io import wavfile

    wavfile.write(path, rate, interleaved)
