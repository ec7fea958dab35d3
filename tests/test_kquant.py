"""k-quant (q2_k .. q6_k) format tests.

The reference engine accepts k-quant model files (bark.cpp:287-291); these
tests pin our read path to the ggml super-block layouts with hand-built
blocks (independent of our own quantizer), bound the round-trip error of the
write path, and check the lossless q4_k/q5_k repack used by packed serving.
"""

import numpy as np
import pytest

from bark_tpu.io import ggml
from bark_tpu.io.quant import (
    BLOCK_BYTES,
    BLOCK_ELEMS,
    QK_K,
    dequantize_blocks,
    quantize_blocks,
    repack_to_int8,
)

KTYPES = ["q2_k", "q3_k", "q4_k", "q5_k", "q6_k"]

# worst-case |x - dq(q(x))| for N(0,1) data, per format (bits of mantissa in
# the sub-scale + value grid); loose enough to be stable across seeds
RTOL = {"q2_k": 1.2, "q3_k": 0.7, "q4_k": 0.25, "q5_k": 0.13, "q6_k": 0.06}


@pytest.mark.parametrize("qtype", KTYPES)
def test_block_byte_count(qtype):
    x = np.random.RandomState(0).randn(3 * QK_K).astype(np.float32)
    raw = quantize_blocks(x, qtype)
    assert raw.size == 3 * BLOCK_BYTES[qtype]
    assert BLOCK_ELEMS[qtype] == QK_K


@pytest.mark.parametrize("qtype", KTYPES)
def test_roundtrip_error_bounded(qtype):
    rng = np.random.RandomState(7)
    x = rng.randn(8 * QK_K).astype(np.float32)
    y = dequantize_blocks(quantize_blocks(x, qtype), qtype, x.size)
    assert y.shape == x.shape
    err = np.abs(y - x).max()
    assert err < RTOL[qtype], (qtype, err)


@pytest.mark.parametrize("qtype", KTYPES)
def test_zero_block(qtype):
    x = np.zeros(QK_K, np.float32)
    y = dequantize_blocks(quantize_blocks(x, qtype), qtype, QK_K)
    np.testing.assert_array_equal(y, 0.0)


@pytest.mark.parametrize("qtype", ["q4_k", "q5_k"])
def test_repack_matches_dequant_exactly(qtype):
    """values*scale32 + min32 must reproduce dequantize_blocks bit-for-bit
    (the packed-serving prefill path relies on this)."""
    rng = np.random.RandomState(3)
    x = rng.randn(4 * QK_K).astype(np.float32)
    raw = quantize_blocks(x, qtype)
    q, s, m = repack_to_int8(raw, qtype, x.size)
    assert q.dtype == np.int8 and s.size == x.size // 32
    recon = q.astype(np.float32) * np.repeat(s, 32) + np.repeat(m, 32)
    dq = dequantize_blocks(raw, qtype, x.size)
    np.testing.assert_array_equal(recon, dq)


def _f16b(v):
    return np.array([v], np.float16).view(np.uint8)


def test_q4_k_handbuilt_block():
    """Decode a hand-assembled q4_K block against hand-computed values,
    pinning the byte layout (d, dmin, get_scale_min_k4 packing, nibble
    order) independently of our quantizer."""
    blk = np.zeros(BLOCK_BYTES["q4_k"], np.uint8)
    d, dmin = 0.5, 0.25
    blk[0:2] = _f16b(d)
    blk[2:4] = _f16b(dmin)
    # scales: j<4 -> sc=s12[j]&63, m=s12[j+4]&63;
    # j>=4 -> sc=(s12[j+4]&0xF)|((s12[j-4]>>6)<<4), m=(s12[j+4]>>4)|((s12[j]>>6)<<4)
    Ls = [1, 2, 3, 4, 17, 20, 33, 63]
    Lm = [5, 6, 7, 8, 19, 22, 35, 60]
    s12 = np.zeros(12, np.uint8)
    for j in range(4):
        s12[j] = (Ls[j] & 63) | ((Ls[j + 4] >> 4) << 6)
        s12[j + 4] = (Lm[j] & 63) | ((Lm[j + 4] >> 4) << 6)
        s12[j + 8] = (Ls[j + 4] & 0x0F) | ((Lm[j + 4] & 0x0F) << 4)
    blk[4:16] = s12
    # qs: chunk c's byte l carries sub-block 2c (low nibble), 2c+1 (high)
    qs = np.zeros(128, np.uint8)
    qs[0] = 0x3 | (0x7 << 4)  # sb0 elem0 = 3, sb1 elem0 = 7
    qs[33] = 0xF  # chunk 1, l=1: sb2 elem1 = 15
    blk[16:144] = qs
    y = dequantize_blocks(blk, "q4_k", QK_K)
    d16 = np.float32(np.float16(d))
    m16 = np.float32(np.float16(dmin))
    assert y[0] == d16 * Ls[0] * 3 - m16 * Lm[0]  # sb0 elem 0
    assert y[32] == d16 * Ls[1] * 7 - m16 * Lm[1]  # sb1 elem 0
    assert y[65] == d16 * Ls[2] * 15 - m16 * Lm[2]  # sb2 elem 1
    assert y[1] == d16 * Ls[0] * 0 - m16 * Lm[0]
    # sub-block 7 (all-zero quants) still subtracts its min
    assert np.allclose(y[224:256], -m16 * Lm[7])


def test_q6_k_handbuilt_block():
    """Pin the q6_K layout: ql low/high nibble split, qh 2-bit groups,
    signed 8-bit scales."""
    blk = np.zeros(BLOCK_BYTES["q6_k"], np.uint8)
    d = 0.125
    blk[208:210] = _f16b(d)
    scales = np.arange(-8, 8, dtype=np.int8)  # 16 sub-blocks of 16
    blk[192:208] = scales.view(np.uint8)
    ql = np.zeros(128, np.uint8)
    qh = np.zeros(64, np.uint8)
    # element (half=0, g=0, l=0): ql[0] low nibble + qh[0] bits 0-1
    ql[0] = 0x5
    qh[0] = 0x2  # -> q = 5 | (2<<4) = 37; value 37-32 = 5
    # element (half=1, g=3, l=2): ql[64+32+2] high nibble, qh[32+2] bits 6-7
    ql[98] = 0xA0
    qh[34] = 0xC0  # -> q = 10 | (3<<4) = 58; value 58-32 = 26
    blk[0:128] = ql
    blk[128:192] = qh
    y = dequantize_blocks(blk, "q6_k", QK_K)
    d16 = np.float32(np.float16(d))
    # pos 0: half0 g0 l0, scale idx 0 (= -8)
    assert y[0] == d16 * np.float32(scales[0]) * 5
    # pos half*128 + g*32 + l = 128+96+2 = 226, scale idx 226//16 = 14 (= 6)
    assert y[226] == d16 * np.float32(scales[14]) * 26
    # an untouched element decodes to d*sc*(0-32)
    assert y[16] == d16 * np.float32(scales[1]) * -32


def test_q2_k_handbuilt_block():
    blk = np.zeros(BLOCK_BYTES["q2_k"], np.uint8)
    d, dmin = 1.0, 0.5
    blk[80:82] = _f16b(d)
    blk[82:84] = _f16b(dmin)
    sfield = np.zeros(16, np.uint8)
    sfield[0] = 3 | (2 << 4)  # sb0: scale 3, min 2
    sfield[5] = 15 | (9 << 4)  # sb5: scale 15, min 9
    blk[0:16] = sfield
    qs = np.zeros(64, np.uint8)
    # element order: pos = half*128 + shift*32 + l; qs[half*32+l] >> 2*shift
    # sb5 covers pos 80..95 -> half0, shift 2, l 16..31
    qs[17] = 0x3 << 4  # half0, l=17, shift2 -> pos 64+17? no: shift*32+l
    blk[16:80] = qs
    y = dequantize_blocks(blk, "q2_k", QK_K)
    d16 = np.float32(np.float16(d))
    m16 = np.float32(np.float16(dmin))
    # pos 81 = shift2 (64..95), l=17 -> sb index 81//16 = 5
    assert y[81] == d16 * 15 * 3 - m16 * 9
    assert y[0] == d16 * 3 * 0 - m16 * 2


def test_file_roundtrip_kquant(tmp_path):
    """A model file quantized to q4_k reads back and dequantizes to within
    the format's error of the original (through the full ggml file layer)."""
    from tests.tiny_model import build_tiny_model

    src = tmp_path / "model.bin"
    dst = tmp_path / "model_q4k.bin"
    ggml.write_model_file(str(src), build_tiny_model(n_embd=256))
    from bark_tpu.io.quantize import model_quantize

    assert model_quantize(str(src), str(dst), int(ggml.GGMLFType.MOSTLY_Q4_K))
    orig = ggml.read_model_file(str(src))
    qf = ggml.read_model_file(str(dst))
    rec_o = orig.semantic.tensors["model/h0/attn/c_attn/w"]
    rec_q = qf.semantic.tensors["model/h0/attn/c_attn/w"]
    assert rec_q.ttype == ggml.GGMLType.Q4_K
    a, b = rec_o.to_float32(), rec_q.to_float32()
    assert np.abs(a - b).max() < RTOL["q4_k"]
    # ftype carries the quant version prefix like the reference
    assert qf.semantic.hparams.base_ftype == int(ggml.GGMLFType.MOSTLY_Q4_K)


def test_kquant_file_generates(tmp_path):
    """End-to-end: a q5_k-quantized tiny model loads and generates audio.

    Quantized with q5_k (per-32 sub-scales) so the section is eligible for
    the packed-serving repack; off-TPU it still dequantizes at load."""
    from tests.tiny_model import build_tiny_model, tiny_params

    src = tmp_path / "model.bin"
    dst = tmp_path / "model_q5k.bin"
    ggml.write_model_file(str(src), build_tiny_model(n_embd=256))
    from bark_tpu.io.quantize import model_quantize

    assert model_quantize(str(src), str(dst), int(ggml.GGMLFType.MOSTLY_Q5_K))
    from bark_tpu.api.context import bark_load_model

    ctx = bark_load_model(str(dst), tiny_params(), seed=0)
    assert ctx.generate_audio("hello world")
    assert ctx.get_audio_data_size() > 0
