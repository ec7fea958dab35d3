"""ggml block-quantization formats q4_0 / q4_1 / q5_0 / q5_1 / q8_0.

Bit-exact re-implementations of the ggml reference quantizers used by
`bark_model_quantize` (/root/reference/bark.cpp:272-478 via ggml_quantize_chunk).
Each block covers QK=32 consecutive f32 values:

  q4_0: {f16 d;            u8 qs[16]}  x = (q - 8) * d,  d = max/-8
  q4_1: {f16 d; f16 m;     u8 qs[16]}  x = q * d + m,    d = (max-min)/15
  q5_0: {f16 d; u32 qh;    u8 qs[16]}  x = (q - 16) * d, d = max/-16
  q5_1: {f16 d; f16 m; u32 qh; u8 qs[16]}  x = q * d + m, d = (max-min)/31
  q8_0: {f16 d;            i8 qs[32]}  x = q * d,        d = amax/127

Nibble layout: qs[j] holds value j in the low nibble and value j+16 in the
high nibble. q5 high bits: bit j of qh is the 5th bit of value j (j<16), and
bit j+16 for the second half.

A vectorized numpy path is provided here; `bark_tpu.io.native` exposes the
same entry points backed by the C++ library when built, and falls back here.
"""

from __future__ import annotations

import numpy as np

QK = 32  # block size shared by all these formats

# Bytes per block of each quantized type.
BLOCK_BYTES = {
    "q4_0": 2 + 16,
    "q4_1": 2 + 2 + 16,
    "q5_0": 2 + 4 + 16,
    "q5_1": 2 + 2 + 4 + 16,
    "q8_0": 2 + 32,
}

# ggml type ids (matches ggml.GGMLType; duplicated to avoid an import cycle)
_QTYPE_IDS = {"q4_0": 2, "q4_1": 3, "q5_0": 6, "q5_1": 7, "q8_0": 8}

# arrays below this many elements aren't worth the ctypes round trip
_NATIVE_MIN = 1 << 14


def _native():
    from bark_tpu import native  # lazy: optional, builds on first use

    return native


def _as_blocks(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    if x.size % QK != 0:
        raise ValueError(f"size {x.size} not a multiple of QK={QK}")
    return x.reshape(-1, QK)


def _signed_absmax(xb: np.ndarray) -> np.ndarray:
    """Per-block value with the largest magnitude, keeping its sign (ggml
    tracks `max` alongside `amax` and divides by the signed value)."""
    idx = np.argmax(np.abs(xb), axis=1)
    return xb[np.arange(xb.shape[0]), idx]


def _safe_inv(d: np.ndarray) -> np.ndarray:
    return np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)


def _pack_nibbles(q: np.ndarray) -> np.ndarray:
    # q: (nb, 32) uint8 -> (nb, 16): low nibble j, high nibble j+16
    return (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)


def _unpack_nibbles(qs: np.ndarray) -> np.ndarray:
    lo = qs & 0x0F
    hi = qs >> 4
    return np.concatenate([lo, hi], axis=1)


def _pack_qh(hi_bit: np.ndarray) -> np.ndarray:
    # hi_bit: (nb, 32) in {0,1}; bit j of qh is element j's 5th bit
    weights = (1 << np.arange(32, dtype=np.uint64))
    qh = (hi_bit.astype(np.uint64) * weights).sum(axis=1)
    return qh.astype(np.uint32)


def _unpack_qh(qh: np.ndarray) -> np.ndarray:
    bits = (qh[:, None].astype(np.uint64) >> np.arange(32, dtype=np.uint64)) & 1
    return bits.astype(np.uint8)


def quantize_blocks(x: np.ndarray, qtype: str) -> np.ndarray:
    """Quantize a float32 array (size divisible by 32) into raw block bytes.

    Dispatches to the native C++ codec (bit-exact, tests/test_native.py)
    for large arrays when the library is available.
    """
    xb = _as_blocks(x)
    nb = xb.shape[0]
    if nb * QK >= _NATIVE_MIN and qtype in _QTYPE_IDS:
        out = _native().quantize(
            _QTYPE_IDS[qtype], xb, nb * BLOCK_BYTES[qtype]
        )
        if out is not None:
            return out
    if qtype == "q4_0":
        d = (_signed_absmax(xb) / -8.0).astype(np.float32)
        q = np.clip((xb * _safe_inv(d)[:, None] + 8.5).astype(np.int32), 0, 15)
        out = np.empty((nb, BLOCK_BYTES["q4_0"]), dtype=np.uint8)
        out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(nb, 2)
        out[:, 2:] = _pack_nibbles(q.astype(np.uint8))
    elif qtype == "q4_1":
        mn = xb.min(axis=1)
        mx = xb.max(axis=1)
        d = ((mx - mn) / 15.0).astype(np.float32)
        q = np.clip(
            ((xb - mn[:, None]) * _safe_inv(d)[:, None] + 0.5).astype(np.int32),
            0, 15,
        )
        out = np.empty((nb, BLOCK_BYTES["q4_1"]), dtype=np.uint8)
        out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(nb, 2)
        out[:, 2:4] = mn.astype(np.float16).view(np.uint8).reshape(nb, 2)
        out[:, 4:] = _pack_nibbles(q.astype(np.uint8))
    elif qtype == "q5_0":
        d = (_signed_absmax(xb) / -16.0).astype(np.float32)
        q = np.clip((xb * _safe_inv(d)[:, None] + 16.5).astype(np.int32), 0, 31)
        out = np.empty((nb, BLOCK_BYTES["q5_0"]), dtype=np.uint8)
        out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(nb, 2)
        out[:, 2:6] = _pack_qh((q >> 4) & 1).view(np.uint8).reshape(nb, 4)
        out[:, 6:] = _pack_nibbles((q & 0x0F).astype(np.uint8))
    elif qtype == "q5_1":
        mn = xb.min(axis=1)
        mx = xb.max(axis=1)
        d = ((mx - mn) / 31.0).astype(np.float32)
        q = np.clip(
            ((xb - mn[:, None]) * _safe_inv(d)[:, None] + 0.5).astype(np.int32),
            0, 31,
        )
        out = np.empty((nb, BLOCK_BYTES["q5_1"]), dtype=np.uint8)
        out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(nb, 2)
        out[:, 2:4] = mn.astype(np.float16).view(np.uint8).reshape(nb, 2)
        out[:, 4:8] = _pack_qh((q >> 4) & 1).view(np.uint8).reshape(nb, 4)
        out[:, 8:] = _pack_nibbles((q & 0x0F).astype(np.uint8))
    elif qtype == "q8_0":
        d = (np.abs(xb).max(axis=1) / 127.0).astype(np.float32)
        v = xb * _safe_inv(d)[:, None]
        # ggml uses roundf (half away from zero), not numpy's half-to-even
        q = np.trunc(v + np.copysign(0.5, v)).astype(np.int8)
        out = np.empty((nb, BLOCK_BYTES["q8_0"]), dtype=np.uint8)
        out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(nb, 2)
        out[:, 2:] = q.view(np.uint8)
    else:
        raise ValueError(f"unsupported quant type: {qtype}")
    return out.reshape(-1)


def dequantize_blocks(raw: np.ndarray, qtype: str, n_elements: int) -> np.ndarray:
    """Dequantize raw block bytes back to float32 (n_elements values).

    Dispatches to the native C++ codec (bit-exact) for large arrays.
    """
    if n_elements >= _NATIVE_MIN and qtype in _QTYPE_IDS:
        arr = (
            raw
            if isinstance(raw, np.ndarray)
            else np.frombuffer(raw, np.uint8)
        )
        out = _native().dequantize(_QTYPE_IDS[qtype], arr, n_elements)
        if out is not None:
            return out
    bb = BLOCK_BYTES[qtype]
    nb = n_elements // QK
    blocks = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)[
        : nb * bb
    ].reshape(nb, bb)
    if qtype == "q4_0":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        q = _unpack_nibbles(blocks[:, 2:]).astype(np.float32)
        x = (q - 8.0) * d
    elif qtype == "q4_1":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
        q = _unpack_nibbles(blocks[:, 4:]).astype(np.float32)
        x = q * d + m
    elif qtype == "q5_0":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        qh = _unpack_qh(blocks[:, 2:6].copy().view(np.uint32).reshape(-1))
        q = _unpack_nibbles(blocks[:, 6:]) | (qh << 4)
        x = (q.astype(np.float32) - 16.0) * d
    elif qtype == "q5_1":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
        qh = _unpack_qh(blocks[:, 4:8].copy().view(np.uint32).reshape(-1))
        q = _unpack_nibbles(blocks[:, 8:]) | (qh << 4)
        x = q.astype(np.float32) * d + m
    elif qtype == "q8_0":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        q = blocks[:, 2:].view(np.int8).astype(np.float32)
        x = q * d
    else:
        raise ValueError(f"unsupported quant type: {qtype}")
    return x.reshape(-1).astype(np.float32)


def repack_to_int8(raw: np.ndarray, qtype: str, n_elements: int):
    """Repack quantized blocks into a TPU-friendly (int8 values, f32 scales,
    f32 mins) triple for the Pallas dequant-matmul path.

    Returns (values int8 [n], scales f32 [n/32], mins f32 [n/32]); the
    dequantized value is `values * scales + mins` broadcast per 32-block.
    For the offset-free formats (q4_0/q5_0/q8_0) mins is all zeros and values
    already include the -8/-16 recentering.
    """
    bb = BLOCK_BYTES[qtype]
    nb = n_elements // QK
    blocks = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)[
        : nb * bb
    ].reshape(nb, bb)
    if qtype == "q4_0":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        q = _unpack_nibbles(blocks[:, 2:]).astype(np.int16) - 8
        return q.astype(np.int8).reshape(-1), d, np.zeros_like(d)
    if qtype == "q4_1":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(-1)
        q = _unpack_nibbles(blocks[:, 4:]).astype(np.int8)
        return q.reshape(-1), d, m
    if qtype == "q5_0":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        qh = _unpack_qh(blocks[:, 2:6].copy().view(np.uint32).reshape(-1))
        q = (_unpack_nibbles(blocks[:, 6:]) | (qh << 4)).astype(np.int16) - 16
        return q.astype(np.int8).reshape(-1), d, np.zeros_like(d)
    if qtype == "q5_1":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(-1)
        qh = _unpack_qh(blocks[:, 4:8].copy().view(np.uint32).reshape(-1))
        q = (_unpack_nibbles(blocks[:, 8:]) | (qh << 4)).astype(np.int8)
        return q.reshape(-1), d, m
    if qtype == "q8_0":
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        q = blocks[:, 2:].view(np.int8)
        return q.reshape(-1).copy(), d, np.zeros_like(d)
    raise ValueError(f"unsupported quant type: {qtype}")
