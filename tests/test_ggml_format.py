"""Round-trip tests for the ggml_weights.bin reader/writer, including the
byte layout invariants the reference loader depends on (bark.cpp:664-1184)."""

import struct

import numpy as np
import pytest

from bark_tpu.io.ggml import (
    GGML_MAGIC,
    CodecHParams,
    CodecSection,
    GGMLType,
    GPTHParams,
    GPTSection,
    ModelFile,
    TensorRecord,
    read_model_file,
    write_model_file,
)


def tiny_gpt_section(rng, n_layer=2, n_embd=32, n_head=2, bias=1,
                     n_in_vocab=64, n_out_vocab=48, n_lm_heads=1, n_wtes=1,
                     block_size=16, ftype=0):
    hp = GPTHParams(
        n_layer=n_layer, n_head=n_head, n_embd=n_embd, block_size=block_size,
        bias=bias, n_in_vocab=n_in_vocab, n_out_vocab=n_out_vocab,
        n_lm_heads=n_lm_heads, n_wtes=n_wtes, ftype=ftype,
    )
    tensors = {}

    def add(name, shape, ttype=GGMLType.F32):
        arr = rng.randn(*shape).astype(np.float32)
        tensors[name] = TensorRecord.from_array(name, arr, ttype)

    for i in range(n_wtes):
        add(f"model/wte/{i}", (n_in_vocab, n_embd))
    add("model/wpe", (block_size, n_embd))
    for i in range(n_lm_heads):
        add(f"model/lm_head/{i}", (n_out_vocab, n_embd))
    add("model/ln_f/g", (n_embd,))
    if bias:
        add("model/ln_f/b", (n_embd,))
    for i in range(n_layer):
        add(f"model/h{i}/ln_1/g", (n_embd,))
        add(f"model/h{i}/ln_2/g", (n_embd,))
        if bias:
            add(f"model/h{i}/ln_1/b", (n_embd,))
            add(f"model/h{i}/ln_2/b", (n_embd,))
        add(f"model/h{i}/attn/c_attn/w", (3 * n_embd, n_embd))
        add(f"model/h{i}/attn/c_proj/w", (n_embd, n_embd))
        add(f"model/h{i}/mlp/c_fc/w", (4 * n_embd, n_embd))
        add(f"model/h{i}/mlp/c_proj/w", (n_embd, 4 * n_embd))
    return GPTSection(hparams=hp, tensors=tensors)


def tiny_codec_section(rng):
    hp = CodecHParams(
        in_channels=1, hidden_dim=8, n_filters=2, kernel_size=7,
        residual_kernel_size=3, n_bins=16, bandwidth=24, sample_rate=24000,
        ftype=0,
    )
    tensors = {}
    for name, shape in [
        ("quantizer.vq.layers.0._codebook.embed", (16, 8)),
        ("decoder.model.0.conv.conv.weight", (32, 8, 7)),
        ("decoder.model.0.conv.conv.bias", (32,)),
    ]:
        arr = rng.randn(*shape).astype(np.float32)
        tensors[name] = TensorRecord.from_array(name, arr, GGMLType.F32)
    return CodecSection(hparams=hp, tensors=tensors)


def tiny_model_file(rng=None):
    rng = rng or np.random.RandomState(0)
    return ModelFile(
        vocab=["[PAD]", "hello", "##o", "wörld"],
        semantic=tiny_gpt_section(rng),
        coarse=tiny_gpt_section(rng, n_in_vocab=48, n_out_vocab=48, bias=0),
        fine=tiny_gpt_section(rng, n_lm_heads=3, n_wtes=4, bias=1),
        codec=tiny_codec_section(rng),
    )


def test_roundtrip(tmp_path):
    mf = tiny_model_file()
    path = str(tmp_path / "weights.bin")
    write_model_file(path, mf)
    got = read_model_file(path)

    assert got.vocab == mf.vocab
    for sec_name in ("semantic", "coarse", "fine"):
        a, b = getattr(mf, sec_name), getattr(got, sec_name)
        assert a.hparams == b.hparams
        assert set(a.tensors) == set(b.tensors)
        for name in a.tensors:
            np.testing.assert_array_equal(
                a.tensors[name].to_float32(), b.tensors[name].to_float32()
            )
    assert got.codec.hparams == mf.codec.hparams
    for name in mf.codec.tensors:
        np.testing.assert_array_equal(
            mf.codec.tensors[name].to_float32(),
            got.codec.tensors[name].to_float32(),
        )


def test_magic_header(tmp_path):
    mf = tiny_model_file()
    path = str(tmp_path / "weights.bin")
    write_model_file(path, mf)
    with open(path, "rb") as f:
        assert struct.unpack("<i", f.read(4))[0] == GGML_MAGIC


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "bad.bin")
    with open(path, "wb") as f:
        f.write(struct.pack("<i", 0xDEAD))
    with pytest.raises(ValueError):
        read_model_file(path)


def test_dims_reversed_on_disk(tmp_path):
    """ggml stores ne[] innermost-first: a numpy (rows, cols) tensor must be
    written as ne = [cols, rows] (convert.py:287)."""
    mf = tiny_model_file()
    path = str(tmp_path / "weights.bin")
    write_model_file(path, mf)
    raw = open(path, "rb").read()
    # find the wte record of the semantic section by name
    name = b"model/wte/0"
    idx = raw.index(name)
    header = raw[idx - 5 * 4 : idx]
    n_dims, name_len, ttype, ne0, ne1 = struct.unpack("<5i", header)
    assert (n_dims, name_len, ttype) == (2, len(name), 0)
    assert (ne0, ne1) == (32, 64)  # (n_embd, n_in_vocab) = reversed numpy


def test_f16_and_quant_tensors_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    mf = tiny_model_file(rng)
    arr = rng.randn(64, 32).astype(np.float32)
    for ttype in (GGMLType.F16, GGMLType.Q4_0, GGMLType.Q5_1, GGMLType.Q8_0):
        name = f"model/extra/{int(ttype)}"
        mf.semantic.tensors[name] = TensorRecord.from_array(name, arr, ttype)
    path = str(tmp_path / "weights.bin")
    write_model_file(path, mf)
    got = read_model_file(path)
    rec = got.semantic.tensors["model/extra/1"]
    np.testing.assert_allclose(
        rec.to_float32(), arr.astype(np.float16).astype(np.float32)
    )
    for ttype in (GGMLType.Q4_0, GGMLType.Q5_1, GGMLType.Q8_0):
        rec = got.semantic.tensors[f"model/extra/{int(ttype)}"]
        assert rec.ttype == ttype
        assert rec.to_float32().shape == arr.shape


def test_qntvr_encoding():
    hp = GPTHParams(2, 2, 32, 16, 1, 64, 48, 1, 1, ftype=2 * 1000 + 2)
    assert hp.qntvr == 2
    assert hp.base_ftype == 2
