// ggml block quantization codecs q4_0/q4_1/q5_0/q5_1/q8_0, bit-exact with
// bark_tpu/io/quant.py (itself bit-exact with ggml's reference quantizers,
// /root/reference/bark.cpp:272-478 via ggml_quantize_chunk).
//
// Bit-exactness notes: the float expressions mirror the numpy path op for op
// (scale kept in f32 for the reciprocal, f16 only in storage; int casts
// truncate; q8_0 uses roundf). Compile with -ffp-contract=off so the
// compiler cannot fuse x*inv+8.5 into an FMA with different rounding.

#include "common.h"

#include <cmath>
#include <cstdint>

namespace {

inline float safe_inv(float d) { return d != 0.0f ? 1.0f / d : 0.0f; }

// signed value with the largest magnitude; first occurrence wins on ties
// (matches numpy argmax and ggml's strict-greater update)
inline float signed_absmax(const float* x) {
    float amax = -1.0f, m = 0.0f;
    for (int j = 0; j < QK; ++j) {
        float a = fabsf(x[j]);
        if (a > amax) { amax = a; m = x[j]; }
    }
    return m;
}

}  // namespace

extern "C" {

// dst must hold type_size_bytes(qtype, n) bytes; n % 32 == 0.
// Returns 0 on success, -1 on unsupported type.
int bark_quantize(int32_t qtype, const float* src, uint8_t* dst, int64_t n) {
    int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; ++b) {
        const float* x = src + b * QK;
        switch (qtype) {
            case GT_Q4_0: {
                uint8_t* o = dst + b * 18;
                float d = signed_absmax(x) / -8.0f;
                float id = safe_inv(d);
                uint16_t dh = f32_to_f16(d);
                o[0] = (uint8_t)(dh & 0xFF); o[1] = (uint8_t)(dh >> 8);
                uint8_t q[QK];
                for (int j = 0; j < QK; ++j) {
                    int32_t v = (int32_t)(x[j] * id + 8.5f);
                    q[j] = (uint8_t)(v < 0 ? 0 : (v > 15 ? 15 : v));
                }
                for (int j = 0; j < 16; ++j) o[2 + j] = (uint8_t)(q[j] | (q[j + 16] << 4));
                break;
            }
            case GT_Q4_1: {
                uint8_t* o = dst + b * 20;
                float mn = x[0], mx = x[0];
                for (int j = 1; j < QK; ++j) { if (x[j] < mn) mn = x[j]; if (x[j] > mx) mx = x[j]; }
                float d = (mx - mn) / 15.0f;
                float id = safe_inv(d);
                uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
                o[0] = (uint8_t)(dh & 0xFF); o[1] = (uint8_t)(dh >> 8);
                o[2] = (uint8_t)(mh & 0xFF); o[3] = (uint8_t)(mh >> 8);
                uint8_t q[QK];
                for (int j = 0; j < QK; ++j) {
                    int32_t v = (int32_t)((x[j] - mn) * id + 0.5f);
                    q[j] = (uint8_t)(v < 0 ? 0 : (v > 15 ? 15 : v));
                }
                for (int j = 0; j < 16; ++j) o[4 + j] = (uint8_t)(q[j] | (q[j + 16] << 4));
                break;
            }
            case GT_Q5_0: {
                uint8_t* o = dst + b * 22;
                float d = signed_absmax(x) / -16.0f;
                float id = safe_inv(d);
                uint16_t dh = f32_to_f16(d);
                o[0] = (uint8_t)(dh & 0xFF); o[1] = (uint8_t)(dh >> 8);
                uint8_t q[QK];
                uint32_t qh = 0;
                for (int j = 0; j < QK; ++j) {
                    int32_t v = (int32_t)(x[j] * id + 16.5f);
                    v = v < 0 ? 0 : (v > 31 ? 31 : v);
                    q[j] = (uint8_t)(v & 0x0F);
                    qh |= (uint32_t)((v >> 4) & 1) << j;
                }
                memcpy(o + 2, &qh, 4);
                for (int j = 0; j < 16; ++j) o[6 + j] = (uint8_t)(q[j] | (q[j + 16] << 4));
                break;
            }
            case GT_Q5_1: {
                uint8_t* o = dst + b * 24;
                float mn = x[0], mx = x[0];
                for (int j = 1; j < QK; ++j) { if (x[j] < mn) mn = x[j]; if (x[j] > mx) mx = x[j]; }
                float d = (mx - mn) / 31.0f;
                float id = safe_inv(d);
                uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
                o[0] = (uint8_t)(dh & 0xFF); o[1] = (uint8_t)(dh >> 8);
                o[2] = (uint8_t)(mh & 0xFF); o[3] = (uint8_t)(mh >> 8);
                uint8_t q[QK];
                uint32_t qh = 0;
                for (int j = 0; j < QK; ++j) {
                    int32_t v = (int32_t)((x[j] - mn) * id + 0.5f);
                    v = v < 0 ? 0 : (v > 31 ? 31 : v);
                    q[j] = (uint8_t)(v & 0x0F);
                    qh |= (uint32_t)((v >> 4) & 1) << j;
                }
                memcpy(o + 4, &qh, 4);
                for (int j = 0; j < 16; ++j) o[8 + j] = (uint8_t)(q[j] | (q[j + 16] << 4));
                break;
            }
            case GT_Q8_0: {
                uint8_t* o = dst + b * 34;
                float amax = 0.0f;
                for (int j = 0; j < QK; ++j) { float a = fabsf(x[j]); if (a > amax) amax = a; }
                float d = amax / 127.0f;
                float id = safe_inv(d);
                uint16_t dh = f32_to_f16(d);
                o[0] = (uint8_t)(dh & 0xFF); o[1] = (uint8_t)(dh >> 8);
                int8_t* q = (int8_t*)(o + 2);
                for (int j = 0; j < QK; ++j) q[j] = (int8_t)roundf(x[j] * id);
                break;
            }
            default:
                return -1;
        }
    }
    return 0;
}

// src holds type_size_bytes(qtype, n) bytes of blocks; dst holds n floats.
int bark_dequantize(int32_t qtype, const uint8_t* src, float* dst, int64_t n) {
    int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; ++b) {
        float* y = dst + b * QK;
        switch (qtype) {
            case GT_Q4_0: {
                const uint8_t* o = src + b * 18;
                float d = f16_to_f32((uint16_t)(o[0] | (o[1] << 8)));
                for (int j = 0; j < 16; ++j) {
                    y[j] = ((float)(o[2 + j] & 0x0F) - 8.0f) * d;
                    y[j + 16] = ((float)(o[2 + j] >> 4) - 8.0f) * d;
                }
                break;
            }
            case GT_Q4_1: {
                const uint8_t* o = src + b * 20;
                float d = f16_to_f32((uint16_t)(o[0] | (o[1] << 8)));
                float m = f16_to_f32((uint16_t)(o[2] | (o[3] << 8)));
                for (int j = 0; j < 16; ++j) {
                    y[j] = (float)(o[4 + j] & 0x0F) * d + m;
                    y[j + 16] = (float)(o[4 + j] >> 4) * d + m;
                }
                break;
            }
            case GT_Q5_0: {
                const uint8_t* o = src + b * 22;
                float d = f16_to_f32((uint16_t)(o[0] | (o[1] << 8)));
                uint32_t qh; memcpy(&qh, o + 2, 4);
                for (int j = 0; j < 16; ++j) {
                    uint32_t lo = (uint32_t)(o[6 + j] & 0x0F) | (((qh >> j) & 1) << 4);
                    uint32_t hi = (uint32_t)(o[6 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
                    y[j] = ((float)lo - 16.0f) * d;
                    y[j + 16] = ((float)hi - 16.0f) * d;
                }
                break;
            }
            case GT_Q5_1: {
                const uint8_t* o = src + b * 24;
                float d = f16_to_f32((uint16_t)(o[0] | (o[1] << 8)));
                float m = f16_to_f32((uint16_t)(o[2] | (o[3] << 8)));
                uint32_t qh; memcpy(&qh, o + 4, 4);
                for (int j = 0; j < 16; ++j) {
                    uint32_t lo = (uint32_t)(o[8 + j] & 0x0F) | (((qh >> j) & 1) << 4);
                    uint32_t hi = (uint32_t)(o[8 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
                    y[j] = (float)lo * d + m;
                    y[j + 16] = (float)hi * d + m;
                }
                break;
            }
            case GT_Q8_0: {
                const uint8_t* o = src + b * 34;
                float d = f16_to_f32((uint16_t)(o[0] | (o[1] << 8)));
                const int8_t* q = (const int8_t*)(o + 2);
                for (int j = 0; j < QK; ++j) y[j] = (float)q[j] * d;
                break;
            }
            default:
                return -1;
        }
    }
    return 0;
}

void bark_f16_to_f32(const uint16_t* src, float* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) dst[i] = f16_to_f32(src[i]);
}

void bark_f32_to_f16(const float* src, uint16_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) dst[i] = f32_to_f16(src[i]);
}

// Software-path variants, exported so tests can verify the no-_Float16
// fallback stays bit-exact with numpy on every platform.
void bark_f16_to_f32_soft(const uint16_t* src, float* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) dst[i] = f16_to_f32_soft(src[i]);
}

void bark_f32_to_f16_soft(const float* src, uint16_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) dst[i] = f32_to_f16_soft(src[i]);
}

}  // extern "C"
