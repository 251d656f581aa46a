// FLAC stream decoder (native, dependency-free).
//
// Role parity: the reference links libnyquist, whose FLAC backend decodes
// MUSDB-adjacent lossless audio (reference src/dsp.cpp:6-8 loads any
// libnyquist-supported container).  This is an independent implementation
// from the public FLAC format specification: STREAMINFO metadata, frame
// headers (both blocking strategies, all block-size/sample-rate/sample-size
// codes), subframes CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) with
// wasted-bits, partitioned Rice/Rice2 residuals (incl. escape codes), and
// inter-channel decorrelation (left/side, right/side, mid/side).
// CRCs and the MD5 signature are parsed but not verified (decode
// correctness is asserted bit-exactly by tests against a reference
// encoder).  OGG/Vorbis is deliberately NOT supported: it is a lossy
// codec with no role in the MUSDB evaluation chain (documented in
// docs/; loaders raise a clear error).
//
// Exposed via the umxio_read_flac() C ABI at the bottom; the WAV-path
// structs (WavData) are shared with umxio.cpp through umxio_internal.hpp.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "umxio_internal.hpp"

namespace {

struct BitReader {
    const uint8_t *data;
    size_t size;
    size_t byte = 0;
    int bit = 0;  // bits consumed of current byte (0..7)
    bool fail = false;

    bool at_end() const { return byte >= size; }

    uint64_t read_bits(int n) {
        uint64_t v = 0;
        for (int i = 0; i < n; ++i) {
            if (byte >= size) {
                fail = true;
                return 0;
            }
            v = (v << 1) | ((data[byte] >> (7 - bit)) & 1u);
            if (++bit == 8) {
                bit = 0;
                ++byte;
            }
        }
        return v;
    }

    int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((uint64_t(1) << n) - 1);
        return static_cast<int64_t>(v);
    }

    uint32_t read_unary() {
        uint32_t q = 0;
        while (!fail && read_bits(1) == 0) {
            ++q;
            if (q > (1u << 24)) {  // corrupt stream guard
                fail = true;
                return 0;
            }
        }
        return q;
    }

    void align() {
        if (bit) {
            bit = 0;
            ++byte;
        }
    }
};

// UTF-8-style coded number used for frame/sample numbers (up to 36 bits)
bool read_utf8_coded(BitReader &br, uint64_t *out) {
    uint32_t b0 = static_cast<uint32_t>(br.read_bits(8));
    if (br.fail) return false;
    int extra;
    uint64_t v;
    if ((b0 & 0x80) == 0) {
        *out = b0;
        return true;
    } else if ((b0 & 0xE0) == 0xC0) {
        extra = 1;
        v = b0 & 0x1F;
    } else if ((b0 & 0xF0) == 0xE0) {
        extra = 2;
        v = b0 & 0x0F;
    } else if ((b0 & 0xF8) == 0xF0) {
        extra = 3;
        v = b0 & 0x07;
    } else if ((b0 & 0xFC) == 0xF8) {
        extra = 4;
        v = b0 & 0x03;
    } else if ((b0 & 0xFE) == 0xFC) {
        extra = 5;
        v = b0 & 0x01;
    } else if (b0 == 0xFE) {
        extra = 6;
        v = 0;
    } else {
        return false;
    }
    for (int i = 0; i < extra; ++i) {
        uint32_t b = static_cast<uint32_t>(br.read_bits(8));
        if (br.fail || (b & 0xC0) != 0x80) return false;
        v = (v << 6) | (b & 0x3F);
    }
    *out = v;
    return true;
}

bool decode_residual(BitReader &br, int order, int block_size,
                     std::vector<int64_t> &out) {
    uint32_t method = static_cast<uint32_t>(br.read_bits(2));
    if (method > 1) return false;
    int param_bits = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t part_order = static_cast<uint32_t>(br.read_bits(4));
    uint32_t n_parts = 1u << part_order;
    if (block_size % n_parts != 0) return false;
    int idx = order;
    for (uint32_t p = 0; p < n_parts; ++p) {
        int count = block_size >> part_order;
        if (p == 0) count -= order;
        if (count < 0) return false;
        uint32_t param = static_cast<uint32_t>(br.read_bits(param_bits));
        if (param == escape) {
            uint32_t raw_bits = static_cast<uint32_t>(br.read_bits(5));
            for (int i = 0; i < count; ++i)
                out[idx++] = raw_bits ? br.read_signed(static_cast<int>(raw_bits)) : 0;
        } else {
            for (int i = 0; i < count; ++i) {
                uint64_t q = br.read_unary();
                uint64_t u = (q << param) | br.read_bits(static_cast<int>(param));
                out[idx++] = static_cast<int64_t>(u >> 1) ^ -static_cast<int64_t>(u & 1);
            }
        }
        if (br.fail) return false;
    }
    return idx == block_size;
}

bool decode_subframe(BitReader &br, int block_size, int bps,
                     std::vector<int64_t> &out) {
    if (br.read_bits(1) != 0) return false;  // mandatory zero pad
    uint32_t type = static_cast<uint32_t>(br.read_bits(6));
    int wasted = 0;
    if (br.read_bits(1)) wasted = static_cast<int>(br.read_unary()) + 1;
    if (br.fail) return false;
    bps -= wasted;
    if (bps <= 0 || bps > 33) return false;

    out.assign(block_size, 0);
    if (type == 0) {  // CONSTANT
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < block_size; ++i) out[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
    } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
        int order = static_cast<int>(type & 0x07);
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        if (!decode_residual(br, order, block_size, out)) return false;
        // fixed polynomial predictors (orders 0-4)
        for (int i = order; i < block_size; ++i) {
            int64_t pred = 0;
            switch (order) {
                case 0: pred = 0; break;
                case 1: pred = out[i - 1]; break;
                case 2: pred = 2 * out[i - 1] - out[i - 2]; break;
                case 3: pred = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
                case 4:
                    pred = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                           out[i - 4];
                    break;
            }
            out[i] += pred;  // residual was stored in out[i]
        }
    } else if (type & 0x20) {  // LPC
        int order = static_cast<int>(type & 0x1F) + 1;
        if (order > block_size) return false;
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        uint32_t prec_code = static_cast<uint32_t>(br.read_bits(4));
        if (prec_code == 0xF) return false;
        int precision = static_cast<int>(prec_code) + 1;
        int shift = static_cast<int>(br.read_signed(5));
        if (shift < 0) return false;
        std::vector<int64_t> coef(order);
        for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
        if (!decode_residual(br, order, block_size, out)) return false;
        for (int i = order; i < block_size; ++i) {
            int64_t pred = 0;
            for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
            out[i] += pred >> shift;
        }
    } else {
        return false;
    }
    if (br.fail) return false;
    if (wasted)
        for (int i = 0; i < block_size; ++i)
            out[i] = static_cast<int64_t>(static_cast<uint64_t>(out[i]) << wasted);
    return true;
}

const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -1,   -2,
                             256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleRates[16] = {0,     88200, 176400, 192000, 8000,  16000,
                              22050, 24000, 32000,  44100,  48000, 96000,
                              -1,    -2,    -3,     0};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

}  // namespace

bool decode_flac(const std::vector<uint8_t> &buf, WavData *out,
                 std::string *err) {
    if (buf.size() < 42 || std::memcmp(buf.data(), "fLaC", 4) != 0) {
        *err = "not a FLAC stream (bad magic)";
        return false;
    }
    size_t pos = 4;
    int channels = 0, bps = 0, sample_rate = 0;
    uint64_t total_samples = 0;
    bool have_streaminfo = false;
    // metadata blocks
    while (pos + 4 <= buf.size()) {
        uint8_t hdr = buf[pos];
        uint32_t len = (uint32_t(buf[pos + 1]) << 16) | (uint32_t(buf[pos + 2]) << 8) |
                       buf[pos + 3];
        pos += 4;
        if (pos + len > buf.size()) {
            *err = "truncated FLAC metadata";
            return false;
        }
        if ((hdr & 0x7F) == 0) {  // STREAMINFO
            if (len < 34) {
                *err = "short STREAMINFO";
                return false;
            }
            const uint8_t *p = buf.data() + pos;
            sample_rate = (int(p[10]) << 12) | (int(p[11]) << 4) | (p[12] >> 4);
            channels = ((p[12] >> 1) & 0x7) + 1;
            bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
            total_samples = (uint64_t(p[13] & 0x0F) << 32) | (uint64_t(p[14]) << 24) |
                            (uint64_t(p[15]) << 16) | (uint64_t(p[16]) << 8) | p[17];
            have_streaminfo = true;
        }
        pos += len;
        if (hdr & 0x80) break;  // last metadata block
    }
    if (!have_streaminfo || channels <= 0 || sample_rate <= 0 || bps <= 0) {
        *err = "missing/invalid STREAMINFO";
        return false;
    }
    if (channels > 8) {
        *err = "unsupported channel count";
        return false;
    }

    // per-channel output accumulated as float: a frame header may carry
    // its own sample size (spec-legal), so scaling is per-frame
    std::vector<std::vector<float>> chan(channels);
    std::vector<std::vector<int64_t>> frame_ch(channels);

    BitReader br{buf.data(), buf.size()};
    br.byte = pos;

    uint64_t decoded = 0;
    while (!br.at_end() && (total_samples == 0 || decoded < total_samples)) {
        // frame header
        uint64_t sync = br.read_bits(14);
        if (br.fail) break;
        if (sync != 0x3FFE) {
            if (total_samples == 0 && decoded > 0) break;  // trailing
            // bytes after the last frame of an unknown-length stream
            // (total_samples=0 is legal, e.g. pipe encoders)
            *err = "lost frame sync";
            return false;
        }
        br.read_bits(1);  // reserved
        br.read_bits(1);  // blocking strategy
        uint32_t bs_code = static_cast<uint32_t>(br.read_bits(4));
        uint32_t sr_code = static_cast<uint32_t>(br.read_bits(4));
        uint32_t ch_code = static_cast<uint32_t>(br.read_bits(4));
        uint32_t ss_code = static_cast<uint32_t>(br.read_bits(3));
        br.read_bits(1);  // reserved
        uint64_t frame_no;
        if (!read_utf8_coded(br, &frame_no)) {
            *err = "bad frame number coding";
            return false;
        }
        int block_size = bs_code < 16 ? kBlockSizes[bs_code] : 0;
        if (block_size == -1) block_size = static_cast<int>(br.read_bits(8)) + 1;
        else if (block_size == -2) block_size = static_cast<int>(br.read_bits(16)) + 1;
        if (block_size <= 0) {
            *err = "bad block size";
            return false;
        }
        int sr = sr_code < 16 ? kSampleRates[sr_code] : 0;
        if (sr == -1) br.read_bits(8);
        else if (sr == -2 || sr == -3) br.read_bits(16);
        int frame_bps = ss_code < 8 ? kSampleSizes[ss_code] : 0;
        if (frame_bps == 0) frame_bps = bps;
        br.read_bits(8);  // header CRC-8 (not verified)
        if (br.fail) break;

        int n_ch = channels;
        int stereo_mode = 0;  // 0 none, 1 L/S, 2 R/S, 3 M/S
        if (ch_code <= 7) {
            n_ch = static_cast<int>(ch_code) + 1;
            if (n_ch != channels) {
                *err = "frame/stream channel mismatch";
                return false;
            }
        } else if (ch_code <= 10) {
            if (channels != 2) {
                *err = "stereo decorrelation in non-stereo stream";
                return false;
            }
            n_ch = 2;
            stereo_mode = static_cast<int>(ch_code) - 7;
        } else {
            *err = "reserved channel assignment";
            return false;
        }

        for (int c = 0; c < n_ch; ++c) {
            int sub_bps = frame_bps;
            // the side channel carries one extra bit
            if ((stereo_mode == 1 && c == 1) || (stereo_mode == 2 && c == 0) ||
                (stereo_mode == 3 && c == 1))
                sub_bps += 1;
            if (!decode_subframe(br, block_size, sub_bps, frame_ch[c])) {
                *err = "subframe decode failed";
                return false;
            }
        }
        br.align();
        br.read_bits(16);  // frame CRC-16 (not verified)
        if (br.fail) {
            *err = "truncated frame";
            return false;
        }

        // undo inter-channel decorrelation
        if (stereo_mode == 1) {  // left/side: R = L - S
            for (int i = 0; i < block_size; ++i)
                frame_ch[1][i] = frame_ch[0][i] - frame_ch[1][i];
        } else if (stereo_mode == 2) {  // right/side: L = R + S
            for (int i = 0; i < block_size; ++i) {
                int64_t side = frame_ch[0][i];
                frame_ch[0][i] = frame_ch[1][i] + side;
            }
        } else if (stereo_mode == 3) {  // mid/side
            for (int i = 0; i < block_size; ++i) {
                int64_t mid = frame_ch[0][i];
                int64_t side = frame_ch[1][i];
                mid = (mid << 1) | (side & 1);
                frame_ch[0][i] = (mid + side) >> 1;
                frame_ch[1][i] = (mid - side) >> 1;
            }
        }
        const double fscale =
            1.0 / static_cast<double>(int64_t(1) << (frame_bps - 1));
        for (int c = 0; c < channels; ++c)
            for (int i = 0; i < block_size; ++i)
                chan[c].push_back(static_cast<float>(frame_ch[c][i] * fscale));
        decoded += static_cast<uint64_t>(block_size);
    }

    if (total_samples != 0 && decoded < total_samples) {
        *err = "stream ended before STREAMINFO total_samples";
        return false;
    }
    uint64_t n = total_samples ? total_samples : decoded;
    out->sample_rate = sample_rate;
    out->channels = channels;
    out->frames = static_cast<int64_t>(n);
    out->samples.resize(static_cast<size_t>(n) * channels);
    for (uint64_t i = 0; i < n; ++i)
        for (int c = 0; c < channels; ++c)
            out->samples[i * channels + c] = chan[c][i];
    return true;
}
