"""Quantization block-format tests: layout invariants, reconstruction error,
and agreement with a straightforward scalar re-implementation of the ggml
formulas (bark.cpp:272-478 / ggml_quantize_chunk semantics)."""

import numpy as np
import pytest

from bark_tpu.io.quant import (
    BLOCK_BYTES,
    QK,
    dequantize_blocks,
    quantize_blocks,
    repack_to_int8,
)

QTYPES = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]


def scalar_quant_dequant(x, qtype):
    """Scalar reference of ggml quantize->dequantize per 32-block."""
    x = x.reshape(-1, QK).astype(np.float32)
    out = np.zeros_like(x)
    for b in range(x.shape[0]):
        blk = x[b]
        if qtype in ("q4_0", "q5_0"):
            amax_idx = np.argmax(np.abs(blk))
            maxv = blk[amax_idx]
            denom = -8.0 if qtype == "q4_0" else -16.0
            lim = 15 if qtype == "q4_0" else 31
            off = 8.0 if qtype == "q4_0" else 16.0
            d = maxv / denom
            idv = 1.0 / d if d else 0.0
            d16 = np.float32(np.float16(d))
            for j in range(QK):
                q = min(lim, int(blk[j] * idv + off + 0.5))
                out[b, j] = (q - off) * d16
        elif qtype in ("q4_1", "q5_1"):
            mn, mx = blk.min(), blk.max()
            lim = 15 if qtype == "q4_1" else 31
            d = (mx - mn) / lim
            idv = 1.0 / d if d else 0.0
            d16 = np.float32(np.float16(d))
            m16 = np.float32(np.float16(mn))
            for j in range(QK):
                q = min(lim, int((blk[j] - mn) * idv + 0.5))
                out[b, j] = q * d16 + m16
        else:  # q8_0
            d = np.abs(blk).max() / 127.0
            idv = 1.0 / d if d else 0.0
            d16 = np.float32(np.float16(d))
            for j in range(QK):
                q = int(np.trunc(blk[j] * idv + np.copysign(0.5, blk[j])))
                out[b, j] = q * d16
    return out.reshape(-1)


@pytest.mark.parametrize("qtype", QTYPES)
def test_block_byte_count(qtype):
    x = np.random.RandomState(0).randn(4 * QK).astype(np.float32)
    raw = quantize_blocks(x, qtype)
    assert raw.size == 4 * BLOCK_BYTES[qtype]


@pytest.mark.parametrize("qtype", QTYPES)
def test_roundtrip_matches_scalar_reference(qtype):
    rng = np.random.RandomState(42)
    x = (rng.randn(64 * QK) * 3).astype(np.float32)
    raw = quantize_blocks(x, qtype)
    got = dequantize_blocks(raw, qtype, x.size)
    want = scalar_quant_dequant(x, qtype)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


@pytest.mark.parametrize("qtype", QTYPES)
def test_reconstruction_error_bounded(qtype):
    rng = np.random.RandomState(7)
    x = rng.randn(128 * QK).astype(np.float32)
    y = dequantize_blocks(quantize_blocks(x, qtype), qtype, x.size)
    err = np.abs(x - y).max()
    # error bounded by ~half a quantization step of the worst block
    bound = {"q4_0": 0.5, "q4_1": 0.4, "q5_0": 0.25, "q5_1": 0.2, "q8_0": 0.05}
    assert err < bound[qtype], err


@pytest.mark.parametrize("qtype", QTYPES)
def test_zero_block(qtype):
    x = np.zeros(QK, dtype=np.float32)
    y = dequantize_blocks(quantize_blocks(x, qtype), qtype, QK)
    np.testing.assert_array_equal(y, x)


@pytest.mark.parametrize("qtype", QTYPES)
def test_repack_int8_matches_dequant(qtype):
    rng = np.random.RandomState(3)
    x = rng.randn(16 * QK).astype(np.float32)
    raw = quantize_blocks(x, qtype)
    vals, scales, mins = repack_to_int8(raw, qtype, x.size)
    recon = (
        vals.astype(np.float32).reshape(-1, QK) * scales[:, None]
        + mins[:, None]
    ).reshape(-1)
    want = dequantize_blocks(raw, qtype, x.size)
    np.testing.assert_allclose(recon, want, rtol=0, atol=1e-6)
