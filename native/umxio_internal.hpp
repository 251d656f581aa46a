// Shared internal types between umxio.cpp and the codec translation units.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

struct WavData {
    int64_t frames = 0;
    int channels = 0;
    int sample_rate = 0;
    std::vector<float> samples;  // interleaved (frames * channels)
};

// native/flac.cpp — decodes a complete FLAC stream held in `buf`.
bool decode_flac(const std::vector<uint8_t> &buf, WavData *out, std::string *err);
