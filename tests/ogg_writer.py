"""Test-only OGG/Vorbis ENCODER via the system libvorbisenc (ctypes).

Counterpart of tests/flac_writer.py: gives the test suite an in-repo,
independent way to fabricate OGG fixtures so umx_tpu.io.ogg's decode
path can be validated without shipping binary blobs.  Uses the Xiph
encode ABI (libvorbisenc/libvorbis/libogg), which is stable public ABI;
the opaque codec state structs are over-allocated buffers that only the
library itself touches, and the two structs we DO read (ogg_page,
ogg_packet) have their published LP64 layouts declared below.

Standard Xiph encode loop: vorbis_encode_init_vbr -> 3 header packets ->
analysis buffer / wrote / blockout / bitrate flush -> ogg pages to disk.
"""

from __future__ import annotations

import ctypes

import numpy as np


class OggPage(ctypes.Structure):
    _fields_ = [
        ("header", ctypes.c_void_p),
        ("header_len", ctypes.c_long),
        ("body", ctypes.c_void_p),
        ("body_len", ctypes.c_long),
    ]


class OggPacket(ctypes.Structure):
    _fields_ = [
        ("packet", ctypes.c_void_p),
        ("bytes", ctypes.c_long),
        ("b_o_s", ctypes.c_long),
        ("e_o_s", ctypes.c_long),
        ("granulepos", ctypes.c_int64),
        ("packetno", ctypes.c_int64),
    ]


def _libs():
    try:
        ogg = ctypes.CDLL("libogg.so.0", mode=ctypes.RTLD_GLOBAL)
        vorbis = ctypes.CDLL("libvorbis.so.0", mode=ctypes.RTLD_GLOBAL)
        enc = ctypes.CDLL("libvorbisenc.so.2", mode=ctypes.RTLD_GLOBAL)
    except OSError:
        return None
    # full argtypes everywhere: without them ctypes/libffi falls back to
    # default conversions, and the one float argument
    # (vorbis_encode_init_vbr's base_quality) MUST be declared c_float
    # or it lands in the wrong register slot
    p = ctypes.c_void_p
    enc.vorbis_encode_init_vbr.argtypes = [p, ctypes.c_long, ctypes.c_long, ctypes.c_float]
    enc.vorbis_encode_init_vbr.restype = ctypes.c_int
    vorbis.vorbis_info_init.argtypes = [p]
    vorbis.vorbis_info_init.restype = None
    vorbis.vorbis_info_clear.argtypes = [p]
    vorbis.vorbis_info_clear.restype = None
    vorbis.vorbis_comment_init.argtypes = [p]
    vorbis.vorbis_comment_init.restype = None
    vorbis.vorbis_comment_clear.argtypes = [p]
    vorbis.vorbis_comment_clear.restype = None
    vorbis.vorbis_analysis_init.argtypes = [p, p]
    vorbis.vorbis_analysis_init.restype = ctypes.c_int
    vorbis.vorbis_block_init.argtypes = [p, p]
    vorbis.vorbis_block_init.restype = ctypes.c_int
    vorbis.vorbis_block_clear.argtypes = [p]
    vorbis.vorbis_block_clear.restype = ctypes.c_int
    vorbis.vorbis_dsp_clear.argtypes = [p]
    vorbis.vorbis_dsp_clear.restype = None
    vorbis.vorbis_analysis_headerout.argtypes = [p, p, p, p, p]
    vorbis.vorbis_analysis_headerout.restype = ctypes.c_int
    vorbis.vorbis_analysis_buffer.argtypes = [p, ctypes.c_int]
    vorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float)
    )
    vorbis.vorbis_analysis_wrote.argtypes = [p, ctypes.c_int]
    vorbis.vorbis_analysis_wrote.restype = ctypes.c_int
    vorbis.vorbis_analysis_blockout.argtypes = [p, p]
    vorbis.vorbis_analysis_blockout.restype = ctypes.c_int
    vorbis.vorbis_analysis.argtypes = [p, p]
    vorbis.vorbis_analysis.restype = ctypes.c_int
    vorbis.vorbis_bitrate_addblock.argtypes = [p]
    vorbis.vorbis_bitrate_addblock.restype = ctypes.c_int
    vorbis.vorbis_bitrate_flushpacket.argtypes = [p, p]
    vorbis.vorbis_bitrate_flushpacket.restype = ctypes.c_int
    ogg.ogg_stream_init.argtypes = [p, ctypes.c_int]
    ogg.ogg_stream_init.restype = ctypes.c_int
    ogg.ogg_stream_clear.argtypes = [p]
    ogg.ogg_stream_clear.restype = ctypes.c_int
    ogg.ogg_stream_packetin.argtypes = [p, p]
    ogg.ogg_stream_packetin.restype = ctypes.c_int
    ogg.ogg_stream_flush.argtypes = [p, p]
    ogg.ogg_stream_flush.restype = ctypes.c_int
    ogg.ogg_stream_pageout.argtypes = [p, p]
    ogg.ogg_stream_pageout.restype = ctypes.c_int
    return ogg, vorbis, enc


class _AlignedBuf:
    """Zeroed, 64-byte-aligned opaque storage for a codec state struct.

    ctypes.create_string_buffer only guarantees byte alignment (c_char
    element type); the codec states hold int64/double members, so hand
    the libraries properly aligned memory via a numpy backing array.
    """

    def __init__(self, nbytes: int):
        self._arr = np.zeros(nbytes // 8 + 8, dtype=np.uint64)
        addr = self._arr.ctypes.data
        self.addr = (addr + 63) & ~63

    @property
    def _as_parameter_(self):
        return ctypes.c_void_p(self.addr)


def available() -> bool:
    return _libs() is not None


# generous over-allocations for the opaque codec states (real LP64 sizes
# in parens); the library initializes/uses only its true extent
_SZ_INFO = 4096  # vorbis_info (56)
_SZ_COMMENT = 4096  # vorbis_comment (32)
_SZ_DSP = 65536  # vorbis_dsp_state (~160)
_SZ_BLOCK = 65536  # vorbis_block (~200)
_SZ_STREAM = 65536  # ogg_stream_state (~408)


def write_ogg(
    path: str,
    samples: np.ndarray,
    rate: int,
    quality: float = 0.6,
    page_per_packet: bool = False,
) -> None:
    """Encode (n_samples, channels) float32 in [-1, 1] to an OGG file.

    ``page_per_packet`` forces a page boundary after every packet
    (ogg_stream_flush instead of ogg_stream_pageout) — wasteful, but it
    gives truncation tests multiple independently-decodable audio pages
    even for highly compressible signals that would otherwise fit one
    page."""
    libs = _libs()
    if libs is None:
        raise RuntimeError("system libvorbisenc not available")
    ogg, vorbis, enc = libs

    samples = np.ascontiguousarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape

    vi = _AlignedBuf(_SZ_INFO)
    vc = _AlignedBuf(_SZ_COMMENT)
    vd = _AlignedBuf(_SZ_DSP)
    vb = _AlignedBuf(_SZ_BLOCK)
    os_ = _AlignedBuf(_SZ_STREAM)

    vorbis.vorbis_info_init(vi)
    rc = enc.vorbis_encode_init_vbr(
        vi, ctypes.c_long(channels), ctypes.c_long(rate), ctypes.c_float(quality)
    )
    if rc != 0:
        raise RuntimeError(f"vorbis_encode_init_vbr failed rc={rc}")
    vorbis.vorbis_comment_init(vc)
    vorbis.vorbis_analysis_init(vd, vi)
    vorbis.vorbis_block_init(vd, vb)
    ogg.ogg_stream_init(os_, ctypes.c_int(0x756D78))

    page = OggPage()
    op = OggPacket()
    oph, opc, opcb = OggPacket(), OggPacket(), OggPacket()

    out = []

    def emit_page():
        out.append(ctypes.string_at(page.header, page.header_len))
        out.append(ctypes.string_at(page.body, page.body_len))

    vorbis.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(oph), ctypes.byref(opc), ctypes.byref(opcb)
    )
    for hp in (oph, opc, opcb):
        ogg.ogg_stream_packetin(os_, ctypes.byref(hp))
    while ogg.ogg_stream_flush(os_, ctypes.byref(page)) != 0:
        emit_page()

    pageout = ogg.ogg_stream_flush if page_per_packet else ogg.ogg_stream_pageout

    def pump():
        while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            vorbis.vorbis_analysis(vb, None)
            vorbis.vorbis_bitrate_addblock(vb)
            while vorbis.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                ogg.ogg_stream_packetin(os_, ctypes.byref(op))
                while pageout(os_, ctypes.byref(page)) != 0:
                    emit_page()

    chunk = 1024
    for start in range(0, n, chunk):
        blk = samples[start : start + chunk]
        buf = vorbis.vorbis_analysis_buffer(vd, ctypes.c_int(blk.shape[0]))
        for c in range(channels):
            # bind the contiguous column to a name: .ctypes.data is a
            # bare int, so an unbound temporary would be freed before
            # memmove reads it (a real, nondeterministic corruption we
            # hit — the heap block gets recycled mid-call)
            col = np.ascontiguousarray(blk[:, c])
            ctypes.memmove(buf[c], col.ctypes.data, col.nbytes)
            del col
        vorbis.vorbis_analysis_wrote(vd, ctypes.c_int(blk.shape[0]))
        pump()
    vorbis.vorbis_analysis_wrote(vd, ctypes.c_int(0))  # EOS
    pump()
    while ogg.ogg_stream_flush(os_, ctypes.byref(page)) != 0:
        emit_page()

    ogg.ogg_stream_clear(os_)
    vorbis.vorbis_block_clear(vb)
    vorbis.vorbis_dsp_clear(vd)
    vorbis.vorbis_comment_clear(vc)
    vorbis.vorbis_info_clear(vi)

    with open(path, "wb") as fh:
        fh.write(b"".join(out))
