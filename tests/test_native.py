"""Native C++ library vs the pure-Python reference paths.

The native quant codecs must be BIT-exact with bark_tpu/io/quant.py (both
mirror ggml's reference quantizers); the native tokenizer must match
bark_tpu/text/tokenizer.py token for token; the scanner's index must locate
every tensor byte-exactly.
"""

import numpy as np
import pytest

from bark_tpu import native
from bark_tpu.io import ggml, quant
from bark_tpu.text import tokenizer
from tests.tiny_model import VOCAB, build_tiny_model

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

QTYPES = [
    ("q4_0", int(ggml.GGMLType.Q4_0)),
    ("q4_1", int(ggml.GGMLType.Q4_1)),
    ("q5_0", int(ggml.GGMLType.Q5_0)),
    ("q5_1", int(ggml.GGMLType.Q5_1)),
    ("q8_0", int(ggml.GGMLType.Q8_0)),
]


@pytest.mark.parametrize("qname,qid", QTYPES)
def test_quantize_bit_exact(qname, qid):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(32 * 257) * 0.3).astype(np.float32)
    x[:32] = 0.0  # all-zero block (d == 0 path)
    x[32] = 100.0  # outlier block
    ref = quant.quantize_blocks(x, qname)
    out = native.quantize(qid, x, ref.size)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("qname,qid", QTYPES)
def test_dequantize_bit_exact(qname, qid):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(32 * 123) * 2.0).astype(np.float32)
    raw = quant.quantize_blocks(x, qname)
    ref = quant.dequantize_blocks(raw, qname, x.size)
    out = native.dequantize(qid, raw, x.size)
    np.testing.assert_array_equal(out, ref)


def test_f16_conversion_exact():
    rng = np.random.default_rng(2)
    f = (rng.standard_normal(4096) * 10).astype(np.float32)
    h = f.astype(np.float16)
    np.testing.assert_array_equal(
        native.f16_to_f32(h.view(np.uint16)), h.astype(np.float32)
    )


def test_f16_soft_path_all_halves():
    """The portable (no-_Float16) decoder over every possible f16 bit
    pattern, bit-exact with numpy — including NaN payloads, infs and
    subnormals."""
    h = np.arange(65536, dtype=np.uint16)
    got = native.f16_to_f32_soft(h)
    ref = h.view(np.float16).astype(np.float32)
    np.testing.assert_array_equal(
        got.view(np.uint32), ref.view(np.uint32)
    )


def test_f32_to_f16_soft_special_values():
    """The portable encoder must keep NaN as NaN (not collapse to +inf) and
    round normals/subnormals exactly like numpy."""
    rng = np.random.default_rng(3)
    vals = np.concatenate([
        (rng.standard_normal(4096) * 10).astype(np.float32),
        rng.standard_normal(256).astype(np.float32) * 1e-7,  # subnormals
        rng.standard_normal(256).astype(np.float32) * 1e6,  # overflow
        np.asarray(
            [np.nan, -np.nan, np.inf, -np.inf, 0.0, -0.0, 65504.0,
             65520.0, 65519.9, 5.96e-8, 6.1e-5], np.float32,
        ),
    ])
    got = native.f32_to_f16_soft(vals)
    ref = vals.astype(np.float16).view(np.uint16)
    # NaNs: numpy keeps payload bits; we require NaN-ness + sign, not payload
    nan = np.isnan(vals)
    np.testing.assert_array_equal(got[~nan], ref[~nan])
    assert np.all((got[nan] & 0x7C00) == 0x7C00)  # max exponent
    assert np.all((got[nan] & 0x03FF) != 0)  # nonzero mantissa => NaN
    assert np.array_equal(got[nan] & 0x8000, ref[nan] & 0x8000)


TEXTS = [
    "hello world",
    "Hello, World!",
    "héllo wörld",  # accent folding
    "a the hello 123 !?.",
    "",
    "日本語 text with ünïcode",
    "hellohellohello unknownword",
]


@pytest.mark.parametrize("text", TEXTS)
def test_tokenizer_matches_python(text):
    vocab = tokenizer.Vocab.from_tokens(VOCAB)
    ref = tokenizer.bert_tokenize(vocab, text, n_max_tokens=256)
    nt = native.NativeTokenizer(VOCAB)
    assert nt.tokenize(text, 256) == ref


def test_tokenizer_truncation():
    vocab = tokenizer.Vocab.from_tokens(VOCAB)
    text = "hello " * 50
    for n_max in (4, 10):
        ref = tokenizer.bert_tokenize(vocab, text, n_max_tokens=n_max)
        nt = native.NativeTokenizer(VOCAB)
        assert nt.tokenize(text, n_max) == ref


def test_native_loader_matches_python(tmp_path):
    path = str(tmp_path / "tiny.bin")
    ggml.write_model_file(path, build_tiny_model())
    a = ggml._read_model_file_native(path)
    b = ggml._read_model_file_py(path)
    assert a is not None
    assert a.vocab == b.vocab
    for sec in ("semantic", "coarse", "fine", "codec"):
        sa, sb = getattr(a, sec), getattr(b, sec)
        assert sa.hparams == sb.hparams
        assert set(sa.tensors) == set(sb.tensors)
        for name, rb in sb.tensors.items():
            ra = sa.tensors[name]
            assert ra.shape == rb.shape and ra.ttype == rb.ttype
            assert bytes(ra.data) == rb.data
            np.testing.assert_array_equal(ra.to_float32(), rb.to_float32())


def test_scan_model_index(tmp_path):
    path = str(tmp_path / "tiny.bin")
    model = build_tiny_model()
    ggml.write_model_file(path, model)
    idx = native.scan_model(path)
    assert idx is not None
    lines = idx.strip().split("\n")
    assert lines[0].startswith("VOCAB ")
    assert lines[0].split()[2] == str(len(model.vocab))

    # every tensor the Python reader sees must be located byte-exactly
    raw = open(path, "rb").read()
    secs = {"semantic": model.semantic, "coarse": model.coarse,
            "fine": model.fine, "codec": model.codec}
    cur = None
    seen = {k: 0 for k in secs}
    for ln in lines[1:]:
        parts = ln.split()
        if parts[0] == "SEC":
            cur = parts[1]
            hp = [int(v) for v in parts[2:]]
            ref_hp = secs[cur].hparams
            if cur == "codec":
                assert hp == [
                    ref_hp.in_channels, ref_hp.hidden_dim, ref_hp.n_filters,
                    ref_hp.kernel_size, ref_hp.residual_kernel_size,
                    ref_hp.n_bins, ref_hp.bandwidth, ref_hp.sample_rate,
                    ref_hp.ftype,
                ]
            else:
                assert hp[:4] == [
                    ref_hp.n_layer, ref_hp.n_head, ref_hp.n_embd,
                    ref_hp.block_size,
                ]
        elif parts[0] == "TEN":
            ttype, off, nbytes, ndims = map(int, parts[1:5])
            ne = [int(v) for v in parts[5 : 5 + ndims]]
            name = " ".join(parts[5 + ndims :])
            rec = secs[cur].tensors[name]
            assert raw[off : off + nbytes] == rec.data
            assert tuple(reversed(ne)) == rec.shape
            assert ttype == int(rec.ttype)
            seen[cur] += 1
        elif parts[0] == "END":
            assert int(parts[1]) == len(raw)
    for k, sec in secs.items():
        assert seen[k] == len(sec.tensors)


def test_tokenizer_fuzz_matches_python():
    """Property test: native and Python tokenizers agree on arbitrary text
    (ascii, accents, unicode, punctuation runs, truncation edges)."""
    import random

    from bark_tpu.text import tokenizer

    rng = random.Random(0)
    alphabet = (
        "abcdefgh ABCDEFGH 0123456789 .,!?#- héàüñÇ 日本語 \t\n"
        "hello world the ##llo"
    )
    vocab = tokenizer.Vocab.from_tokens(VOCAB)
    nt = native.NativeTokenizer(VOCAB)
    for _ in range(300):
        n = rng.randint(0, 40)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        n_max = rng.choice([2, 5, 256])
        # force the pure-Python path by hiding the native handle
        nat_handle, vocab._native = vocab._native, None
        py = tokenizer.bert_tokenize(vocab, text, n_max_tokens=n_max)
        vocab._native = nat_handle
        assert nt.tokenize(text, n_max) == py, repr(text)
