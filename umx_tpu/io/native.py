"""ctypes bindings to the native C++ IO runtime (native/umxio.cpp).

The native library accelerates the host-side runtime the same way the
reference's C++ does (model.cpp gzip+parse+dequant, dsp.cpp wav codec):
gzip inflation, ggml record parsing, dequantization, and WAV decode/encode.
Everything here has a pure-Python fallback, so the framework works without
the library; when ``libumxio.so`` has been built (see native/Makefile) it is
picked up automatically.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache

import numpy as np

_LIB_NAMES = ("libumxio.so",)


@lru_cache(maxsize=1)
def _load_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [os.path.join(here, "native", name) for name in _LIB_NAMES]
    env = os.environ.get("UMX_TPU_NATIVE_LIB")
    if env:
        candidates.insert(0, env)
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            _declare(lib)
            return lib
    return None


def _declare(lib):
    lib.umxio_read_ggml.restype = ctypes.c_void_p
    lib.umxio_read_ggml.argtypes = [ctypes.c_char_p]
    lib.umxio_model_hidden_size.restype = ctypes.c_int
    lib.umxio_model_hidden_size.argtypes = [ctypes.c_void_p]
    lib.umxio_model_num_tensors.restype = ctypes.c_int
    lib.umxio_model_num_tensors.argtypes = [ctypes.c_void_p]
    lib.umxio_tensor_name.restype = ctypes.c_char_p
    lib.umxio_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.umxio_tensor_target.restype = ctypes.c_int
    lib.umxio_tensor_target.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.umxio_tensor_ndims.restype = ctypes.c_int
    lib.umxio_tensor_ndims.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.umxio_tensor_dims.restype = ctypes.POINTER(ctypes.c_int64)
    lib.umxio_tensor_dims.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.umxio_tensor_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.umxio_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.umxio_model_free.argtypes = [ctypes.c_void_p]

    lib.umxio_read_wav.restype = ctypes.c_void_p
    lib.umxio_read_wav.argtypes = [ctypes.c_char_p]
    lib.umxio_read_flac.restype = ctypes.c_void_p
    lib.umxio_read_flac.argtypes = [ctypes.c_char_p]
    lib.umxio_wav_num_frames.restype = ctypes.c_int64
    lib.umxio_wav_num_frames.argtypes = [ctypes.c_void_p]
    lib.umxio_wav_num_channels.restype = ctypes.c_int
    lib.umxio_wav_num_channels.argtypes = [ctypes.c_void_p]
    lib.umxio_wav_sample_rate.restype = ctypes.c_int
    lib.umxio_wav_sample_rate.argtypes = [ctypes.c_void_p]
    lib.umxio_wav_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.umxio_wav_data.argtypes = [ctypes.c_void_p]
    lib.umxio_wav_free.argtypes = [ctypes.c_void_p]
    lib.umxio_write_wav.restype = ctypes.c_int
    lib.umxio_write_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
    ]


def available() -> bool:
    return _load_lib() is not None


def read_ggml_native(path: str):
    """Parse a ggml model file with the native library.

    Returns a :class:`umx_tpu.io.ggml.GGMLModel`, or None when the native
    library is not built (callers fall back to the Python parser)."""
    lib = _load_lib()
    if lib is None:
        return None
    from umx_tpu.io.ggml import GGMLModel, TARGET_ORDER

    from umx_tpu.io.ggml import TENSOR_ORDER

    handle = lib.umxio_read_ggml(path.encode())
    if not handle:
        raise IOError(f"native ggml parse failed for {path}")
    try:
        hidden = lib.umxio_model_hidden_size(handle)
        n = lib.umxio_model_num_tensors(handle)
        targets: list[dict[str, np.ndarray]] = [{} for _ in TARGET_ORDER]
        for i in range(n):
            name = lib.umxio_tensor_name(handle, i).decode()
            tgt = lib.umxio_tensor_target(handle, i)
            if not 0 <= tgt < len(TARGET_ORDER):
                # a malformed file whose names repeat more than 3 times
                raise ValueError(
                    f"expected {len(TARGET_ORDER)} targets, got {tgt + 1}"
                )
            ndims = lib.umxio_tensor_ndims(handle, i)
            dims = lib.umxio_tensor_dims(handle, i)
            shape = tuple(dims[j] for j in range(ndims))
            count = int(np.prod(shape)) if shape else 1
            data_ptr = lib.umxio_tensor_data(handle, i)
            arr = np.ctypeslib.as_array(data_ptr, shape=(count,)).reshape(shape).copy()
            targets[tgt][name] = arr
        # a short file yields an incomplete model — fail like the Python
        # parser instead of returning it silently
        for t, d in zip(TARGET_ORDER, targets):
            missing = set(TENSOR_ORDER) - set(d)
            if missing:
                raise ValueError(f"target {t!r} missing tensors: {sorted(missing)}")
        return GGMLModel(
            hidden_size=hidden,
            targets={t: d for t, d in zip(TARGET_ORDER, targets)},
        )
    finally:
        lib.umxio_model_free(handle)


def read_wav_native(path: str):
    """Decode a WAV with the native library → (data (frames, ch) f32, rate),
    or None when the library is unavailable OR it cannot decode this
    file's format (callers fall back to the scipy decoder, which handles
    e.g. 8-bit PCM that the native codec does not)."""
    lib = _load_lib()
    if lib is None:
        return None
    handle = lib.umxio_read_wav(path.encode())
    if not handle:
        return None
    try:
        frames = lib.umxio_wav_num_frames(handle)
        ch = lib.umxio_wav_num_channels(handle)
        rate = lib.umxio_wav_sample_rate(handle)
        ptr = lib.umxio_wav_data(handle)
        data = np.ctypeslib.as_array(ptr, shape=(frames * ch,)).reshape(frames, ch).copy()
        return data, rate
    finally:
        lib.umxio_wav_free(handle)


def read_flac_native(path: str):
    """Decode a FLAC file with the native decoder (native/flac.cpp) →
    (data (frames, ch) float32, rate).  Returns None when the native
    library is not built; raises on a malformed stream."""
    lib = _load_lib()
    if lib is None:
        return None
    handle = lib.umxio_read_flac(path.encode())
    if not handle:
        raise IOError(f"FLAC decode failed for {path}")
    try:
        frames = lib.umxio_wav_num_frames(handle)
        ch = lib.umxio_wav_num_channels(handle)
        rate = lib.umxio_wav_sample_rate(handle)
        ptr = lib.umxio_wav_data(handle)
        data = np.ctypeslib.as_array(ptr, shape=(frames * ch,)).reshape(frames, ch).copy()
        return data, rate
    finally:
        lib.umxio_wav_free(handle)


def write_wav_native(path: str, interleaved: np.ndarray, rate: int) -> bool:
    """Encode float32 PCM WAV with the native library. Returns False when
    the library is unavailable."""
    lib = _load_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(interleaved, dtype=np.float32)
    frames, ch = data.shape
    ok = lib.umxio_write_wav(
        path.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames,
        ch,
        rate,
    )
    if ok != 0:
        raise IOError(f"native wav encode failed for {path}")
    return True
