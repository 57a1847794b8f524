// ggufc: native GGUF block-format codecs (threaded bulk dequantization).
//
// The TPU framework keeps GGUF parsing in Python (mmap + struct is fast),
// but bulk dequantization of multi-GB quantized checkpoints is compute-bound;
// this library provides the hot loops in C++ with std::thread fan-out.
// Python binds via ctypes (tts_tpu/core/native.py) with a numpy fallback.
//
// Block layouts match ggml (and tts_tpu/core/quant.py):
//   Q4_0: [f16 d][16B qs]          32 elems, elem j = ((qs>>4b)&0xF) - 8, * d
//   Q5_0: [f16 d][u32 qh][16B qs]  adds a 5th bit per element from qh
//   Q8_0: [f16 d][32 x i8]         elem j = qs[j] * d

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

constexpr int QK = 32;
constexpr size_t Q4_BLOCK = 2 + 16;
constexpr size_t Q5_BLOCK = 2 + 4 + 16;
constexpr size_t Q8_BLOCK = 2 + 32;

float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {
            // subnormal: normalize
            int shift = 0;
            while (!(man & 0x400)) { man <<= 1; ++shift; }
            man &= 0x3FF;
            bits = sign | ((127 - 15 - shift + 1) << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

template <typename Fn>
void parallel_blocks(int64_t n_blocks, int n_threads, Fn fn) {
    n_threads = std::max(1, std::min<int>(n_threads, (int)n_blocks ? n_threads : 1));
    if (n_threads <= 1 || n_blocks < 1024) {
        fn(0, n_blocks);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n_blocks + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = std::min(n_blocks, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([=] { fn(lo, hi); });
    }
    for (auto &th : threads) th.join();
}

}  // namespace

extern "C" {

void ggufc_dequant_q4_0(const uint8_t *raw, float *out, int64_t n_elements,
                        int n_threads) {
    int64_t n_blocks = (n_elements + QK - 1) / QK;
    parallel_blocks(n_blocks, n_threads, [=](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t *blk = raw + b * Q4_BLOCK;
            uint16_t d16;
            std::memcpy(&d16, blk, 2);
            float d = f16_to_f32(d16);
            const uint8_t *qs = blk + 2;
            float *dst = out + b * QK;
            // the caller allocates exactly n_elements floats: bound the last
            // (possibly partial) block's writes
            int64_t remain = std::min<int64_t>(QK, n_elements - b * QK);
            for (int j = 0; j < 16; ++j) {
                if (j < remain)
                    dst[j] = (float)((int)(qs[j] & 0x0F) - 8) * d;
                if (j + 16 < remain)
                    dst[j + 16] = (float)((int)(qs[j] >> 4) - 8) * d;
            }
        }
    });
}

void ggufc_dequant_q5_0(const uint8_t *raw, float *out, int64_t n_elements,
                        int n_threads) {
    int64_t n_blocks = (n_elements + QK - 1) / QK;
    parallel_blocks(n_blocks, n_threads, [=](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t *blk = raw + b * Q5_BLOCK;
            uint16_t d16;
            std::memcpy(&d16, blk, 2);
            float d = f16_to_f32(d16);
            uint32_t qh;
            std::memcpy(&qh, blk + 2, 4);
            const uint8_t *qs = blk + 6;
            float *dst = out + b * QK;
            int64_t remain = std::min<int64_t>(QK, n_elements - b * QK);
            for (int j = 0; j < 16; ++j) {
                int lo5 = (qs[j] & 0x0F) | (((qh >> j) & 1u) << 4);
                int hi5 = (qs[j] >> 4) | (((qh >> (j + 16)) & 1u) << 4);
                if (j < remain) dst[j] = (float)(lo5 - 16) * d;
                if (j + 16 < remain) dst[j + 16] = (float)(hi5 - 16) * d;
            }
        }
    });
}

void ggufc_dequant_q8_0(const uint8_t *raw, float *out, int64_t n_elements,
                        int n_threads) {
    int64_t n_blocks = (n_elements + QK - 1) / QK;
    parallel_blocks(n_blocks, n_threads, [=](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const uint8_t *blk = raw + b * Q8_BLOCK;
            uint16_t d16;
            std::memcpy(&d16, blk, 2);
            float d = f16_to_f32(d16);
            const int8_t *qs = (const int8_t *)(blk + 2);
            float *dst = out + b * QK;
            int64_t remain = std::min<int64_t>(QK, n_elements - b * QK);
            for (int64_t j = 0; j < remain; ++j) {
                dst[j] = (float)qs[j] * d;
            }
        }
    });
}

void ggufc_f16_to_f32(const uint8_t *raw, float *out, int64_t n_elements,
                      int n_threads) {
    parallel_blocks((n_elements + 4095) / 4096, n_threads,
                    [=](int64_t lo, int64_t hi) {
        const uint16_t *src = (const uint16_t *)raw;
        int64_t start = lo * 4096, end = std::min<int64_t>(n_elements, hi * 4096);
        for (int64_t i = start; i < end; ++i) out[i] = f16_to_f32(src[i]);
    });
}

void ggufc_bf16_to_f32(const uint8_t *raw, float *out, int64_t n_elements,
                       int n_threads) {
    parallel_blocks((n_elements + 4095) / 4096, n_threads,
                    [=](int64_t lo, int64_t hi) {
        const uint16_t *src = (const uint16_t *)raw;
        int64_t start = lo * 4096, end = std::min<int64_t>(n_elements, hi * 4096);
        for (int64_t i = start; i < end; ++i) {
            uint32_t bits = (uint32_t)src[i] << 16;
            std::memcpy(&out[i], &bits, 4);
        }
    });
}

// symmetric round-to-nearest Q8_0 quantization (quantize-app hot loop)
void ggufc_quant_q8_0(const float *in, uint8_t *out, int64_t n_elements,
                      int n_threads) {
    int64_t n_blocks = (n_elements + QK - 1) / QK;
    parallel_blocks(n_blocks, n_threads, [=](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            const float *src = in + b * QK;
            int64_t remain = std::min<int64_t>(QK, n_elements - b * QK);
            float amax = 0.0f;
            for (int64_t j = 0; j < remain; ++j)
                amax = std::max(amax, std::abs(src[j]));
            float d = amax / 127.0f;
            float inv = d != 0.0f ? 1.0f / d : 0.0f;
            uint8_t *blk = out + b * Q8_BLOCK;
            // f32 -> f16, round-to-nearest-even incl. subnormals (matches
            // numpy's astype(float16) so both encoders produce identical
            // checkpoints; d=absmax/127 can be subnormal for tiny blocks)
            uint32_t fbits;
            std::memcpy(&fbits, &d, 4);
            uint32_t sign = (fbits >> 16) & 0x8000;
            int32_t exp = (int32_t)((fbits >> 23) & 0xFF) - 127 + 15;
            uint32_t man = fbits & 0x7FFFFF;
            uint16_t h;
            if (exp >= 0x1F) {
                h = (uint16_t)(sign | 0x7C00);
            } else if (exp <= 0) {
                if (exp < -10) {
                    h = (uint16_t)sign;  // underflows even as a subnormal
                } else {
                    // shift the 24-bit significand into subnormal position;
                    // shifted-out bits fold into a sticky bit for exact RNE
                    uint32_t shift = (uint32_t)(1 - exp);
                    uint32_t full = man | 0x800000;
                    uint32_t m = full >> shift;
                    uint32_t sticky = (full & ((1u << shift) - 1)) != 0;
                    uint32_t frac = m & 0x1FFF;
                    uint32_t up = (frac > 0x1000) ||
                                  (frac == 0x1000 && (sticky || ((m >> 13) & 1)));
                    h = (uint16_t)(sign | ((m >> 13) + up));
                }
            } else {
                uint32_t v = ((uint32_t)exp << 23) | man;
                // mantissa carry propagates into the exponent (and to inf)
                h = (uint16_t)(sign | ((v + 0xFFF + ((v >> 13) & 1)) >> 13));
            }
            std::memcpy(blk, &h, 2);
            int8_t *qs = (int8_t *)(blk + 2);
            for (int64_t j = 0; j < QK; ++j) {
                float v = j < remain ? src[j] * inv : 0.0f;
                int q = (int)(v >= 0 ? v + 0.5f : v - 0.5f);
                qs[j] = (int8_t)std::max(-127, std::min(127, q));
            }
        }
    });
}

}  // extern "C"
