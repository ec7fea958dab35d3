// Shared helpers for the bark_tpu native runtime library.
//
// Native counterpart of the reference's C/C++ runtime pieces: ggml's
// quantized block codecs (/root/reference SURVEY §2.7/§2.9), the BERT
// WordPiece tokenizer (bark.cpp:480-662) and the model-file parser
// (bark.cpp:664-1184). The TPU compute path is JAX/XLA/Pallas; this library
// covers the host-side hot paths (multi-GB weight load, dequantization,
// tokenization) and is exposed to Python via ctypes
// (bark_tpu/native/__init__.py), with bit-exact pure-numpy fallbacks.
#pragma once

#include <cstdint>
#include <cstring>

// IEEE half <-> float, bit-exact with numpy's conversions.
// f16 -> f32 is exact; f32 -> f16 rounds to nearest-even. The _soft
// variants are the portable software path, always compiled (and tested
// against numpy) so platforms without _Float16 get identical bits.
static inline float f16_to_f32_soft(uint16_t h) {
    uint32_t sign = (uint32_t)(h >> 15) << 31;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; --exp; }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp + 127 - 15) << 23) | (man << 13);
    }
    float f;
    memcpy(&f, &bits, sizeof(f));
    return f;
}

static inline float f16_to_f32(uint16_t h) {
#if defined(__FLT16_MANT_DIG__)
    _Float16 v;
    memcpy(&v, &h, sizeof(v));
    return (float)v;
#else
    return f16_to_f32_soft(h);
#endif
}

static inline uint16_t f32_to_f16_soft(float f) {
    uint32_t bits;
    memcpy(&bits, &f, sizeof(bits));
    uint32_t sign = (bits >> 16) & 0x8000u;
    int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
    uint32_t man = bits & 0x7FFFFFu;
    if (((bits >> 23) & 0xFF) == 0xFF)  // f32 inf/NaN: keep NaN-ness
        return (uint16_t)(sign | (man ? 0x7E00u : 0x7C00u));
    if (exp >= 31) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        man |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = man >> shift;
        uint32_t rem = man & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(exp << 10) | (man >> 13);
    uint32_t rem = man & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

static inline uint16_t f32_to_f16(float f) {
#if defined(__FLT16_MANT_DIG__)
    _Float16 v = (_Float16)f;
    uint16_t h;
    memcpy(&h, &v, sizeof(h));
    return h;
#else
    return f32_to_f16_soft(f);
#endif
}

// ggml tensor type ids (bark_tpu/io/ggml.py GGMLType)
enum GType : int32_t {
    GT_F32 = 0,
    GT_F16 = 1,
    GT_Q4_0 = 2,
    GT_Q4_1 = 3,
    GT_Q5_0 = 6,
    GT_Q5_1 = 7,
    GT_Q8_0 = 8,
    GT_I8 = 24,
    GT_I16 = 25,
    GT_I32 = 26,
};

static const int QK = 32;  // quant block size

static inline int64_t block_bytes(int32_t t) {
    switch (t) {
        case GT_Q4_0: return 2 + 16;
        case GT_Q4_1: return 2 + 2 + 16;
        case GT_Q5_0: return 2 + 4 + 16;
        case GT_Q5_1: return 2 + 2 + 4 + 16;
        case GT_Q8_0: return 2 + 32;
        default: return -1;
    }
}

static inline int64_t type_size_bytes(int32_t t, int64_t n) {
    switch (t) {
        case GT_F32: return n * 4;
        case GT_F16: return n * 2;
        case GT_I8: return n;
        case GT_I16: return n * 2;
        case GT_I32: return n * 4;
        default: {
            int64_t bb = block_bytes(t);
            if (bb < 0 || n % QK) return -1;
            return (n / QK) * bb;
        }
    }
}
