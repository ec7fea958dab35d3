"""Converter tests: synthetic HF suno/bark-style checkpoint -> ggml file.

Builds a torch state dict with the exact HF naming conventions the reference
converter consumes (/root/reference/convert.py:205-267 GPT renames,
:113-167 codec renames + weight-norm folding), converts it, and checks the
resulting file loads and generates end-to-end.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.io.convert import convert, weight_norm_fold
from tests import tiny_model as tm


def _gpt_state(prefix, rng, *, n_layer, n_embd, block, n_in, n_out,
               ln_bias, n_wtes=1, n_heads_lm=1):
    D = n_embd
    s = {}

    def t(*shape):
        return torch.from_numpy(rng.normal(0, 0.08, shape).astype(np.float32))

    if n_wtes == 1:
        s[f"{prefix}.input_embeds_layer.weight"] = t(n_in, D)
    else:
        for i in range(n_wtes):
            s[f"{prefix}.input_embeds_layers.{i}.weight"] = t(n_in, D)
    s[f"{prefix}.position_embeds_layer.weight"] = t(block, D)
    if n_heads_lm == 1:
        s[f"{prefix}.lm_head.weight"] = t(n_out, D)
    else:
        for i in range(n_heads_lm):
            s[f"{prefix}.lm_heads.{i}.weight"] = t(n_out, D)
    s[f"{prefix}.layernorm_final.weight"] = t(D)
    if ln_bias:
        s[f"{prefix}.layernorm_final.bias"] = t(D)
    for i in range(n_layer):
        s[f"{prefix}.layers.{i}.layernorm_1.weight"] = t(D)
        s[f"{prefix}.layers.{i}.layernorm_2.weight"] = t(D)
        if ln_bias:
            s[f"{prefix}.layers.{i}.layernorm_1.bias"] = t(D)
            s[f"{prefix}.layers.{i}.layernorm_2.bias"] = t(D)
        # causal-mask buffer the converter must drop
        s[f"{prefix}.layers.{i}.attn.bias"] = torch.ones(1, 1, block, block)
        s[f"{prefix}.layers.{i}.attn.att_proj.weight"] = t(3 * D, D)
        s[f"{prefix}.layers.{i}.attn.out_proj.weight"] = t(D, D)
        s[f"{prefix}.layers.{i}.mlp.in_proj.weight"] = t(4 * D, D)
        s[f"{prefix}.layers.{i}.mlp.out_proj.weight"] = t(D, 4 * D)
    return s


def _codec_state(rng, *, hidden=16, n_filters=2, n_bins=8, n_q=8, k=7, rk=3):
    s = {}

    def t(*shape):
        return torch.from_numpy(rng.normal(0, 0.1, shape).astype(np.float32))

    def wn_conv(name, cout, cin, kk):
        # weight-norm parametrized conv, as in the HF checkpoint
        s[f"codec_model.{name}.weight_v"] = t(cout, cin, kk)
        s[f"codec_model.{name}.weight_g"] = t(cout, 1, 1).abs() + 0.5
        s[f"codec_model.{name}.bias"] = t(cout)

    def lstm(prefix, dim):
        for l in (0, 1):
            s[f"codec_model.{prefix}.lstm.weight_ih_l{l}"] = t(4 * dim, dim)
            s[f"codec_model.{prefix}.lstm.weight_hh_l{l}"] = t(4 * dim, dim)
            s[f"codec_model.{prefix}.lstm.bias_ih_l{l}"] = t(4 * dim)
            s[f"codec_model.{prefix}.lstm.bias_hh_l{l}"] = t(4 * dim)

    def res(prefix, dim):
        wn_conv(f"{prefix}.block.1.conv", dim // 2, dim, rk)
        wn_conv(f"{prefix}.block.3.conv", dim, dim // 2, 1)
        wn_conv(f"{prefix}.shortcut.conv", dim, dim, 1)

    ratios = (8, 5, 4, 2)
    # encoder: layers.0 conv-in, (res, elu, down) x4, layers.13 lstm, 15 out
    C = n_filters
    wn_conv("encoder.layers.0.conv", C, 1, k)
    for i, r in enumerate(reversed(ratios)):
        res(f"encoder.layers.{1 + 3 * i}", C)
        wn_conv(f"encoder.layers.{3 + 3 * i}.conv", 2 * C, C, 2 * r)
        C *= 2
    lstm("encoder.layers.13", C)
    wn_conv("encoder.layers.15.conv", hidden, C, k)

    # decoder: layers.0 conv-in, layers.1 lstm, (elu, convtr, res) x4, 15 out
    wn_conv("decoder.layers.0.conv", C, hidden, k)
    lstm("decoder.layers.1", C)
    for i, r in enumerate(ratios):
        # ConvTranspose1d weight is (Cin, Cout, K)
        idx = 3 + 3 * i
        s[f"codec_model.decoder.layers.{idx}.conv.weight_v"] = t(C, C // 2, 2 * r)
        s[f"codec_model.decoder.layers.{idx}.conv.weight_g"] = (
            t(C, 1, 1).abs() + 0.5
        )
        s[f"codec_model.decoder.layers.{idx}.conv.bias"] = t(C // 2)
        res(f"decoder.layers.{idx + 1}", C // 2)
        C //= 2
    wn_conv("decoder.layers.15.conv", 1, C, k)

    for q in range(n_q):
        s[f"codec_model.quantizer.layers.{q}.codebook.embed"] = t(n_bins, hidden)
        # EMA bookkeeping the converter must drop
        s[f"codec_model.quantizer.layers.{q}.codebook.inited"] = torch.ones(1)
        s[f"codec_model.quantizer.layers.{q}.codebook.cluster_size"] = t(n_bins)
        s[f"codec_model.quantizer.layers.{q}.codebook.embed_avg"] = t(
            n_bins, hidden
        )
    return s


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_bark")
    rng = np.random.default_rng(7)
    state = {}
    state.update(_gpt_state("semantic", rng, n_layer=2, n_embd=32, block=320,
                            n_in=tm.SEMANTIC_INFER + 1, n_out=tm.SEMANTIC_VOCAB,
                            ln_bias=False))
    state.update(_gpt_state("coarse_acoustics", rng, n_layer=2, n_embd=32,
                            block=384, n_in=tm.COARSE_INFER + 1,
                            n_out=tm.SEMANTIC_VOCAB + 2 * tm.CODEBOOK,
                            ln_bias=False))
    state.update(_gpt_state("fine_acoustics", rng, n_layer=2, n_embd=32,
                            block=64, n_in=tm.CODEBOOK + 1,
                            n_out=tm.CODEBOOK + 1, ln_bias=True,
                            n_wtes=8, n_heads_lm=7))
    state.update(_codec_state(rng))
    torch.save(state, d / "pytorch_model.bin")

    def gpt_cfg(n_layer, n_embd, block, n_in, n_out, fine=False):
        cfg = dict(num_layers=n_layer, num_heads=2, hidden_size=n_embd,
                   block_size=block, bias=False, input_vocab_size=n_in,
                   output_vocab_size=n_out)
        if fine:
            cfg.update(n_codes_total=8, n_codes_given=1)
        return cfg

    config = {
        "semantic_config": gpt_cfg(2, 32, 320, tm.SEMANTIC_INFER + 1,
                                   tm.SEMANTIC_VOCAB),
        "coarse_acoustics_config": gpt_cfg(
            2, 32, 384, tm.COARSE_INFER + 1,
            tm.SEMANTIC_VOCAB + 2 * tm.CODEBOOK),
        "fine_acoustics_config": gpt_cfg(2, 32, 64, tm.CODEBOOK + 1,
                                         tm.CODEBOOK + 1, fine=True),
        "codec_config": dict(audio_channels=1, hidden_size=16, num_filters=2,
                             kernel_size=7, residual_kernel_size=3,
                             codebook_size=tm.CODEBOOK, sampling_rate=24000),
    }
    (d / "config.json").write_text(json.dumps(config))
    (d / "vocab.txt").write_text("".join(t + "\n" for t in tm.VOCAB))
    return d


@pytest.fixture(scope="module")
def converted(hf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("out") / "ggml_weights.bin"
    convert(str(hf_dir), str(out), use_f16=False)
    return str(out)


def test_weight_norm_fold_matches_torch():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(6, 4, 5)).astype(np.float32)
    g = np.abs(rng.normal(size=(6, 1, 1))).astype(np.float32) + 0.1
    ours = weight_norm_fold(v, g)
    theirs = torch._weight_norm(
        torch.from_numpy(v), torch.from_numpy(g), dim=0
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)


def test_converted_file_structure(converted):
    m = ggml.read_model_file(converted)
    assert m.vocab == tm.VOCAB
    assert m.semantic.hparams.n_layer == 2
    assert m.semantic.hparams.bias == 0
    assert m.fine.hparams.bias == 1  # forced for fine (convert.py:91-94)
    assert m.fine.hparams.n_wtes == 8 and m.fine.hparams.n_lm_heads == 7
    # the attn.bias causal mask must not leak into the file
    assert not any("attn/bias" in n for n in m.semantic.tensors)
    # codec renames
    ct = m.codec.tensors
    assert "decoder.model.3.convtr.convtr.weight" in ct
    assert "decoder.model.0.conv.conv.weight" in ct
    assert "encoder.model.1.block.1.conv.conv.weight" in ct
    assert "decoder.model.1.lstm.weight_ih_l0" in ct
    assert "quantizer.vq.layers.0._codebook.embed" in ct
    assert not any("embed_avg" in n or "inited" in n or "cluster_size" in n
                   for n in ct)


def test_f16_conversion_policy(hf_dir, tmp_path):
    out = str(tmp_path / "f16.bin")
    convert(str(hf_dir), out, use_f16=True)
    m = ggml.read_model_file(out)
    assert m.semantic.hparams.ftype == 1
    t = m.semantic.tensors
    assert t["model/h0/attn/c_attn/w"].ttype == ggml.GGMLType.F16
    assert t["model/wte/0"].ttype == ggml.GGMLType.F16
    assert t["model/ln_f/g"].ttype == ggml.GGMLType.F32
    # codec: weights f16, biases + codebooks f32 (convert.py:169-183)
    ct = m.codec.tensors
    assert ct["decoder.model.0.conv.conv.weight"].ttype == ggml.GGMLType.F16
    assert ct["decoder.model.0.conv.conv.bias"].ttype == ggml.GGMLType.F32
    assert (
        ct["quantizer.vq.layers.0._codebook.embed"].ttype == ggml.GGMLType.F32
    )


def test_converted_model_generates(converted):
    ctx = bark_tpu.bark_load_model(converted, tm.tiny_params(), seed=0)
    assert bark_tpu.bark_generate_audio(ctx, "hello world")
    assert bark_tpu.bark_get_audio_data_size(ctx) > 0
