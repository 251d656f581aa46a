// umxio: native host-side IO runtime for umx-tpu.
//
// Plays the role the reference's C++ host code plays around its compute
// (model.cpp gzip+ggml parse+dequant, dsp.cpp WAV decode/encode via
// libnyquist), exposed through a C ABI for ctypes.  The TPU compute path
// stays in XLA; this accelerates the file boundary:
//   - gzip inflation of .bin.gz model files (zlib)
//   - ggml record parsing + u8/u16 affine dequantization to float32
//   - WAV decode (PCM 16/24/32-bit int, 32/64-bit float) and float32 encode
//
// Build: make -C native   (produces libumxio.so; loaded by umx_tpu.io.native)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

#include "umxio_internal.hpp"

namespace {

// ---------------------------------------------------------------------------
// file reading + gzip
// ---------------------------------------------------------------------------

bool read_file(const char *path, std::vector<uint8_t> &out) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize(static_cast<size_t>(size));
    size_t got = size ? std::fread(out.data(), 1, out.size(), f) : 0;
    std::fclose(f);
    return got == out.size();
}

// streaming inflate of a gzip member sequence
bool gunzip(const std::vector<uint8_t> &in, std::vector<uint8_t> &out) {
    z_stream zs{};
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
    out.clear();
    out.reserve(in.size() * 4);
    std::vector<uint8_t> buf(1 << 20);
    zs.next_in = const_cast<Bytef *>(in.data());
    zs.avail_in = static_cast<uInt>(in.size());
    int ret = Z_OK;
    do {
        zs.next_out = buf.data();
        zs.avail_out = static_cast<uInt>(buf.size());
        ret = inflate(&zs, Z_NO_FLUSH);
        if (ret != Z_OK && ret != Z_STREAM_END) {
            inflateEnd(&zs);
            return false;
        }
        out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
        if (ret == Z_STREAM_END && zs.avail_in > 0) {
            // concatenated gzip members
            if (inflateReset2(&zs, 16 + MAX_WBITS) != Z_OK) break;
            ret = Z_OK;
        }
    } while (ret != Z_STREAM_END && (zs.avail_in > 0 || zs.avail_out == 0));
    // a truncated stream leaves ret==Z_OK with the input exhausted; that is
    // a failure, not a short success (matches Python gzip.decompress raising)
    bool complete = (ret == Z_STREAM_END) && zs.avail_in == 0;
    inflateEnd(&zs);
    return complete;
}

// ---------------------------------------------------------------------------
// ggml model parsing (format: SURVEY.md §2b / umx_tpu/io/ggml.py docstring)
// ---------------------------------------------------------------------------

struct Tensor {
    std::string name;
    int target = 0;
    std::vector<int64_t> dims;  // original (torch) shape
    std::vector<float> data;
};

struct Model {
    int hidden_size = 0;
    std::vector<Tensor> tensors;
};

constexpr int32_t kMagic = 0x756d7867;  // "umxg"

bool is_u16_tensor(const std::string &name) {
    static const char *subs[] = {"bn2", "bn3", "fc2", "fc3"};
    for (const char *s : subs)
        if (name.find(s) != std::string::npos) return true;
    return false;
}

struct Cursor {
    const uint8_t *p;
    size_t left;
    bool take(void *dst, size_t n) {
        if (left < n) return false;
        std::memcpy(dst, p, n);
        p += n;
        left -= n;
        return true;
    }
};

Model *parse_ggml(const std::vector<uint8_t> &raw) {
    Cursor c{raw.data(), raw.size()};
    int32_t magic = 0, hidden = 0;
    if (!c.take(&magic, 4) || magic != kMagic) return nullptr;
    if (!c.take(&hidden, 4)) return nullptr;

    auto model = new Model();
    model->hidden_size = hidden;

    // names repeating marks the start of the next target's records
    int target = 0;
    std::vector<std::string> seen;
    while (c.left >= 16) {
        float scale = 0, offset = 0;
        int32_t n_dims = 0, name_len = 0;
        if (!c.take(&scale, 4) || !c.take(&offset, 4) || !c.take(&n_dims, 4) ||
            !c.take(&name_len, 4))
            break;
        if (n_dims < 0 || n_dims > 4 || name_len <= 0 || name_len > 256) {
            delete model;
            return nullptr;
        }
        std::vector<int32_t> rev_dims(n_dims);
        for (int i = 0; i < n_dims; ++i)
            if (!c.take(&rev_dims[i], 4)) { delete model; return nullptr; }
        std::string name(name_len, '\0');
        if (!c.take(name.data(), static_cast<size_t>(name_len))) {
            delete model;
            return nullptr;
        }

        for (const auto &s : seen)
            if (s == name) {
                ++target;
                seen.clear();
                break;
            }
        seen.push_back(name);

        Tensor t;
        t.name = name;
        t.target = target;
        int64_t count = 1;
        t.dims.resize(n_dims);
        for (int i = 0; i < n_dims; ++i) {
            t.dims[i] = rev_dims[n_dims - 1 - i];  // dims stored reversed
            count *= t.dims[i];
        }
        t.data.resize(static_cast<size_t>(count));
        if (is_u16_tensor(name)) {
            std::vector<uint16_t> q(static_cast<size_t>(count));
            if (!c.take(q.data(), q.size() * 2)) { delete model; return nullptr; }
            for (int64_t i = 0; i < count; ++i)
                t.data[static_cast<size_t>(i)] = q[static_cast<size_t>(i)] * scale + offset;
        } else {
            std::vector<uint8_t> q(static_cast<size_t>(count));
            if (!c.take(q.data(), q.size())) { delete model; return nullptr; }
            for (int64_t i = 0; i < count; ++i)
                t.data[static_cast<size_t>(i)] = q[static_cast<size_t>(i)] * scale + offset;
        }
        model->tensors.push_back(std::move(t));
    }
    return model;
}

// ---------------------------------------------------------------------------
// WAV codec (RIFF PCM int16/24/32, float32/64)
// ---------------------------------------------------------------------------

struct Wav {
    int64_t frames = 0;
    int channels = 0;
    int rate = 0;
    std::vector<float> data;  // interleaved (frames * channels)
};

uint32_t rd_u32(const uint8_t *p) {
    return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
           (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t *p) {
    return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

Wav *parse_wav(const std::vector<uint8_t> &raw) {
    if (raw.size() < 44 || std::memcmp(raw.data(), "RIFF", 4) != 0 ||
        std::memcmp(raw.data() + 8, "WAVE", 4) != 0)
        return nullptr;
    size_t pos = 12;
    int fmt = 0, channels = 0, rate = 0, bits = 0;
    const uint8_t *data_ptr = nullptr;
    size_t data_len = 0;
    while (pos + 8 <= raw.size()) {
        const uint8_t *hdr = raw.data() + pos;
        uint32_t chunk_len = rd_u32(hdr + 4);
        const uint8_t *body = hdr + 8;
        if (pos + 8 + chunk_len > raw.size()) chunk_len = static_cast<uint32_t>(raw.size() - pos - 8);
        if (std::memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
            fmt = rd_u16(body);
            channels = rd_u16(body + 2);
            rate = static_cast<int>(rd_u32(body + 4));
            bits = rd_u16(body + 14);
            if (fmt == 0xFFFE && chunk_len >= 40)  // WAVE_FORMAT_EXTENSIBLE
                fmt = rd_u16(body + 24);
        } else if (std::memcmp(hdr, "data", 4) == 0) {
            data_ptr = body;
            data_len = chunk_len;
        }
        pos += 8 + chunk_len + (chunk_len & 1);
    }
    if (!data_ptr || channels <= 0 || rate <= 0) return nullptr;

    const int bytes = bits / 8;
    if (bytes == 0) return nullptr;
    int64_t n = static_cast<int64_t>(data_len) / bytes;
    auto w = new Wav();
    w->channels = channels;
    w->rate = rate;
    w->frames = n / channels;
    w->data.resize(static_cast<size_t>(n));

    if (fmt == 3 && bits == 32) {
        std::memcpy(w->data.data(), data_ptr, static_cast<size_t>(n) * 4);
    } else if (fmt == 3 && bits == 64) {
        for (int64_t i = 0; i < n; ++i) {
            double v;
            std::memcpy(&v, data_ptr + i * 8, 8);
            w->data[static_cast<size_t>(i)] = static_cast<float>(v);
        }
    } else if (fmt == 1 && bits == 16) {
        for (int64_t i = 0; i < n; ++i) {
            int16_t v;
            std::memcpy(&v, data_ptr + i * 2, 2);
            w->data[static_cast<size_t>(i)] = v / 32768.0f;
        }
    } else if (fmt == 1 && bits == 24) {
        for (int64_t i = 0; i < n; ++i) {
            const uint8_t *b = data_ptr + i * 3;
            int32_t v = (b[0] << 8) | (b[1] << 16) | (static_cast<int32_t>(b[2]) << 24);
            w->data[static_cast<size_t>(i)] = static_cast<float>(v >> 8) / 8388608.0f;
        }
    } else if (fmt == 1 && bits == 32) {
        for (int64_t i = 0; i < n; ++i) {
            int32_t v;
            std::memcpy(&v, data_ptr + i * 4, 4);
            w->data[static_cast<size_t>(i)] = static_cast<float>(v / 2147483648.0);
        }
    } else {
        delete w;
        return nullptr;
    }
    return w;
}

void wr_u32(std::vector<uint8_t> &v, uint32_t x) {
    v.push_back(static_cast<uint8_t>(x));
    v.push_back(static_cast<uint8_t>(x >> 8));
    v.push_back(static_cast<uint8_t>(x >> 16));
    v.push_back(static_cast<uint8_t>(x >> 24));
}
void wr_u16(std::vector<uint8_t> &v, uint16_t x) {
    v.push_back(static_cast<uint8_t>(x));
    v.push_back(static_cast<uint8_t>(x >> 8));
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void *umxio_read_ggml(const char *path) {
    std::vector<uint8_t> raw;
    if (!read_file(path, raw)) return nullptr;
    if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
        std::vector<uint8_t> inflated;
        if (!gunzip(raw, inflated)) return nullptr;
        raw.swap(inflated);
    }
    return parse_ggml(raw);
}

int umxio_model_hidden_size(void *h) { return static_cast<Model *>(h)->hidden_size; }
int umxio_model_num_tensors(void *h) {
    return static_cast<int>(static_cast<Model *>(h)->tensors.size());
}
const char *umxio_tensor_name(void *h, int i) {
    return static_cast<Model *>(h)->tensors[static_cast<size_t>(i)].name.c_str();
}
int umxio_tensor_target(void *h, int i) {
    return static_cast<Model *>(h)->tensors[static_cast<size_t>(i)].target;
}
int umxio_tensor_ndims(void *h, int i) {
    return static_cast<int>(static_cast<Model *>(h)->tensors[static_cast<size_t>(i)].dims.size());
}
const int64_t *umxio_tensor_dims(void *h, int i) {
    return static_cast<Model *>(h)->tensors[static_cast<size_t>(i)].dims.data();
}
const float *umxio_tensor_data(void *h, int i) {
    return static_cast<Model *>(h)->tensors[static_cast<size_t>(i)].data.data();
}
void umxio_model_free(void *h) { delete static_cast<Model *>(h); }

void *umxio_read_flac(const char *path) {
    std::vector<uint8_t> raw;
    if (!read_file(path, raw)) return nullptr;
    WavData d;
    std::string err;
    if (!decode_flac(raw, &d, &err)) {
        std::fprintf(stderr, "umxio: flac decode failed for %s: %s\n", path,
                     err.c_str());
        return nullptr;
    }
    auto w = new Wav();
    w->frames = d.frames;
    w->channels = d.channels;
    w->rate = d.sample_rate;
    w->data = std::move(d.samples);
    return w;
}

void *umxio_read_wav(const char *path) {
    std::vector<uint8_t> raw;
    if (!read_file(path, raw)) return nullptr;
    return parse_wav(raw);
}
int64_t umxio_wav_num_frames(void *h) { return static_cast<Wav *>(h)->frames; }
int umxio_wav_num_channels(void *h) { return static_cast<Wav *>(h)->channels; }
int umxio_wav_sample_rate(void *h) { return static_cast<Wav *>(h)->rate; }
const float *umxio_wav_data(void *h) { return static_cast<Wav *>(h)->data.data(); }
void umxio_wav_free(void *h) { delete static_cast<Wav *>(h); }

int umxio_write_wav(const char *path, const float *interleaved, int64_t frames,
                    int channels, int rate) {
    const uint32_t data_len = static_cast<uint32_t>(frames * channels * 4);
    std::vector<uint8_t> out;
    out.reserve(58 + data_len);
    // RIFF size = file bytes after this field: WAVE(4) + fmt(8+16) +
    // fact(8+4) + data hdr(8) + payload
    out.insert(out.end(), {'R', 'I', 'F', 'F'});
    wr_u32(out, 48 + data_len);
    out.insert(out.end(), {'W', 'A', 'V', 'E', 'f', 'm', 't', ' '});
    wr_u32(out, 16);
    wr_u16(out, 3);  // IEEE float
    wr_u16(out, static_cast<uint16_t>(channels));
    wr_u32(out, static_cast<uint32_t>(rate));
    wr_u32(out, static_cast<uint32_t>(rate * channels * 4));
    wr_u16(out, static_cast<uint16_t>(channels * 4));
    wr_u16(out, 32);
    // fact chunk (required for non-PCM formats)
    out.insert(out.end(), {'f', 'a', 'c', 't'});
    wr_u32(out, 4);
    wr_u32(out, static_cast<uint32_t>(frames));
    out.insert(out.end(), {'d', 'a', 't', 'a'});
    wr_u32(out, data_len);
    const uint8_t *p = reinterpret_cast<const uint8_t *>(interleaved);
    out.insert(out.end(), p, p + data_len);

    FILE *f = std::fopen(path, "wb");
    if (!f) return 1;
    size_t wrote = std::fwrite(out.data(), 1, out.size(), f);
    std::fclose(f);
    return wrote == out.size() ? 0 : 1;
}

}  // extern "C"
