"""Minimal FLAC *encoder* used only to generate test vectors for the
native decoder (native/flac.cpp).  Written independently from the public
FLAC format specification; supports per-frame subframe-type selection
(constant / verbatim / fixed 0-4 / LPC), Rice residuals (partition order
0), stereo decorrelation modes, and 16/24-bit depths — enough to cover
every decoder path bit-exactly.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _utf8_code(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _rice_encode(bw: BitWriter, residual: np.ndarray, param: int):
    for v in residual:
        v = int(v)
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _pick_rice_param(residual: np.ndarray) -> int:
    mean = float(np.mean(np.abs(residual.astype(np.float64)))) + 1e-9
    return int(np.clip(np.ceil(np.log2(mean + 1)), 0, 14))


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, kind):
    """kind: "constant" | "verbatim" | ("fixed", order) | ("lpc", order,
    shift, coeffs)."""
    bw.write(0, 1)  # pad
    if kind == "constant":
        assert np.all(x == x[0])
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
        return
    if kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
        return
    if kind[0] == "fixed":
        order = kind[1]
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        coefs = _FIXED_COEFS[order]
        xi = x.astype(np.int64)
        pred = np.zeros(len(x) - order, np.int64)
        for j, c in enumerate(coefs):
            pred += c * xi[order - 1 - j : len(x) - 1 - j]
        residual = xi[order:] - pred
    else:
        _, order, shift, coefs = kind
        bw.write(0b100000 | (order - 1), 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        precision = 12
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(int(c), precision)
        xi = x.astype(np.int64)
        pred = np.zeros(len(x) - order, np.int64)
        for j, c in enumerate(coefs):
            pred += int(c) * xi[order - 1 - j : len(x) - 1 - j]
        residual = xi[order:] - (pred >> shift)
    # partitioned rice, partition order 0
    bw.write(0, 2)  # method: 4-bit rice
    bw.write(0, 4)  # partition order 0
    param = _pick_rice_param(residual)
    if param >= 15:
        param = 14
    bw.write(param, 4)
    _rice_encode(bw, residual, param)


_BS_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
             256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
             8192: 13, 16384: 14, 32768: 15}
_SS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def write_flac(
    path: str,
    samples: np.ndarray,
    sample_rate: int = 44100,
    bps: int = 16,
    block: int = 4096,
    frame_kinds=None,
    stereo_mode: str = "independent",
    total_samples_zero: bool = False,
    trailing_bytes: bytes = b"",
    frame_bps: int | None = None,
):
    """samples: (n, channels) integer array in [-2^(bps-1), 2^(bps-1)).

    frame_kinds: optional list cycled per frame, entries as accepted by
    _write_subframe.  stereo_mode: independent | left_side | right_side |
    mid_side (2-channel input only).  frame_bps: declared per-frame
    sample size (spec-legal to differ from STREAMINFO; samples must be
    given at this depth).  total_samples_zero: STREAMINFO
    total_samples=0 (unknown length, e.g. pipe encoders).
    trailing_bytes: appended after the last frame.
    """
    samples = np.asarray(samples, np.int64)
    n, ch = samples.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(0 if total_samples_zero else (n & ((1 << 36) - 1)), 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unset
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    if frame_kinds is None:
        frame_kinds = ["verbatim"]
    enc_bps = frame_bps if frame_bps is not None else bps
    sr_code = 9 if sample_rate == 44100 else 0
    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(block, n - pos)
        x = samples[pos : pos + bs]
        kind = frame_kinds[frame_idx % len(frame_kinds)]

        chans = [x[:, c] for c in range(ch)]
        chan_bps = [enc_bps] * ch
        if ch == 2 and stereo_mode != "independent":
            L = x[:, 0].astype(np.int64)
            R = x[:, 1].astype(np.int64)
            side = L - R
            if stereo_mode == "left_side":
                ch_code, chans, chan_bps = 8, [L, side], [enc_bps, enc_bps + 1]
            elif stereo_mode == "right_side":
                ch_code, chans, chan_bps = 9, [side, R], [enc_bps + 1, enc_bps]
            elif stereo_mode == "mid_side":
                mid = (L + R) >> 1
                ch_code, chans, chan_bps = 10, [mid, side], [enc_bps, enc_bps + 1]
            else:
                raise ValueError(stereo_mode)
        else:
            ch_code = ch - 1

        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        bs_code = _BS_CODES.get(bs)
        hdr.write(bs_code if bs_code else 7, 4)
        hdr.write(sr_code, 4)
        hdr.write(ch_code, 4)
        hdr.write(_SS_CODES[enc_bps], 3)
        hdr.write(0, 1)  # reserved
        for b in _utf8_code(frame_idx):
            hdr.write(b, 8)
        if not bs_code:
            hdr.write(bs - 1, 16)
        hdr_bytes = hdr.bytes()
        bw = BitWriter()
        bw.buf = bytearray(hdr_bytes)
        bw.write(crc8(hdr_bytes), 8)

        for cdata, cbps in zip(chans, chan_bps):
            k = kind
            if k == "constant" and not np.all(cdata == cdata[0]):
                k = "verbatim"
            _write_subframe(bw, cdata, cbps, k)
        bw.align()
        bw.write(0, 16)  # frame CRC-16 (decoder does not verify)
        out += bw.bytes()
        pos += bs
        frame_idx += 1

    out += trailing_bytes
    with open(path, "wb") as f:
        f.write(bytes(out))
