"""Test-only MP3 ENCODER via the system libmp3lame (ctypes).

Counterpart of tests/ogg_writer.py: fabricates MP3 fixtures in-test so
umx_tpu.io.mp3's libmpg123 decode path can be validated without
shipping binary blobs, and by a DIFFERENT codebase than the decoder
(LAME encodes, mpg123 decodes — independent implementations).

The LAME global-flags handle is fully opaque (only the library touches
it).  After ``lame_encode_flush`` the encoder's Xing/LAME info frame —
which carries the encoder-delay/padding values mpg123 needs for gapless
trimming — is fetched with ``lame_get_lametag_frame`` and written over
the placeholder first frame, per the documented LAME tagging protocol.
"""

from __future__ import annotations

import ctypes

import numpy as np

_lib = None
_lib_tried = False


def _load_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.lame_init.argtypes = []
        lib.lame_init.restype = ctypes.c_void_p
        for fn in ("lame_set_in_samplerate", "lame_set_num_channels",
                   "lame_set_brate", "lame_set_quality", "lame_set_bWriteVbrTag"):
            getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int]
            getattr(lib, fn).restype = ctypes.c_int
        lib.lame_init_params.argtypes = [ctypes.c_void_p]
        lib.lame_init_params.restype = ctypes.c_int
        lib.lame_encode_buffer_ieee_float.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.lame_encode_buffer_ieee_float.restype = ctypes.c_int
        lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.lame_encode_flush.restype = ctypes.c_int
        lib.lame_get_lametag_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t
        ]
        lib.lame_get_lametag_frame.restype = ctypes.c_size_t
        lib.lame_close.argtypes = [ctypes.c_void_p]
        lib.lame_close.restype = ctypes.c_int
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load_lib() is not None


def write_mp3(path: str, samples: np.ndarray, rate: int, bitrate_kbps: int = 192) -> None:
    """Encode (n_samples, channels) float32 in [-1, 1] to a CBR MP3.

    Writes the LAME info tag (gapless delay/padding) so decoders
    reproduce exactly ``n_samples`` frames.
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("libmp3lame not available")
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim != 2 or samples.shape[1] not in (1, 2):
        raise ValueError("samples must be (n, 1|2)")
    n, ch = samples.shape

    gfp = lib.lame_init()
    if not gfp:
        raise RuntimeError("lame_init failed")
    try:
        lib.lame_set_in_samplerate(gfp, rate)
        lib.lame_set_num_channels(gfp, ch)
        lib.lame_set_brate(gfp, bitrate_kbps)
        lib.lame_set_quality(gfp, 2)
        lib.lame_set_bWriteVbrTag(gfp, 1)  # placeholder frame -> rewritten below
        if lib.lame_init_params(gfp) < 0:
            raise RuntimeError("lame_init_params failed")

        # keep the channel arrays bound to locals for the call lifetime
        # (repo ctypes rule: a temporary's .ctypes.data is a bare int)
        left = np.ascontiguousarray(samples[:, 0])
        right = np.ascontiguousarray(samples[:, ch - 1])
        out = np.empty(int(1.25 * n) + 7200 * 2, dtype=np.uint8)
        got = lib.lame_encode_buffer_ieee_float(
            gfp, left.ctypes.data, right.ctypes.data, n, out.ctypes.data, out.nbytes
        )
        if got < 0:
            raise RuntimeError(f"lame_encode_buffer failed ({got})")
        flush_buf = np.empty(65536, dtype=np.uint8)
        extra = lib.lame_encode_flush(gfp, flush_buf.ctypes.data, flush_buf.nbytes)
        if extra < 0:
            raise RuntimeError(f"lame_encode_flush failed ({extra})")

        with open(path, "wb") as fh:
            fh.write(out[:got].tobytes())
            fh.write(flush_buf[:extra].tobytes())
            # rewrite the placeholder first frame with the real info tag
            tag = np.empty(16384, dtype=np.uint8)
            tag_len = lib.lame_get_lametag_frame(gfp, tag.ctypes.data, tag.nbytes)
            if 0 < tag_len <= tag.nbytes:
                fh.seek(0)
                fh.write(tag[:tag_len].tobytes())
    finally:
        lib.lame_close(gfp)
