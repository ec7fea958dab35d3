"""End-to-end pipeline tests on the tiny random model.

Mirrors what the reference's CI run.yml does (SURVEY.md §4): load a model
file, generate audio for a short prompt with a fixed seed, and run again
after quantization — except here with real assertions on determinism, shape,
and the WAV round trip rather than exit-code-only checks.
"""

import os

import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.utils.wav import read_wav, write_wav
from tests.tiny_model import build_tiny_model, tiny_params


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("model") / "tiny_weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


@pytest.fixture(scope="module")
def generated(model_path):
    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=0)
    ok = bark_tpu.bark_generate_audio(ctx, "hello world", 4)
    assert ok
    return ctx


def test_generates_audio(generated):
    audio = bark_tpu.bark_get_audio_data(generated)
    n = bark_tpu.bark_get_audio_data_size(generated)
    assert audio is not None and n == audio.size > 0
    assert audio.dtype == np.float32
    assert np.all(np.isfinite(audio))
    # 320 samples per coarse frame
    assert n == generated.coarse_tokens.shape[0] * 320


def test_stage_token_shapes(generated):
    p = tiny_params()
    sem = generated.semantic_tokens
    assert 0 < len(sem) <= p.n_steps_text_encoder
    assert np.all((sem >= 0) & (sem < p.semantic_vocab_size))
    coarse = generated.coarse_tokens
    assert coarse.shape[1] == p.n_coarse_codebooks
    assert np.all((coarse >= 0) & (coarse < p.codebook_size))
    fine = generated.fine_tokens
    assert fine.shape == (coarse.shape[0], p.n_fine_codebooks)
    assert np.all((fine >= 0) & (fine < p.codebook_size))
    # the fine stage must preserve the coarse channels verbatim
    np.testing.assert_array_equal(fine[:, :2], coarse)


def test_statistics(generated):
    s = generated.stats
    assert s.t_semantic_us > 0 and s.t_coarse_us > 0 and s.t_fine_us > 0
    assert s.n_sample_semantic == len(generated.semantic_tokens)
    assert bark_tpu.bark_get_eval_time(generated) >= (
        s.t_semantic_us + s.t_coarse_us + s.t_fine_us
    )
    generated.reset_statistics()
    assert generated.stats.n_sample_semantic == 0
    assert generated.stats.t_load_us == s.t_load_us  # survives reset


def test_deterministic_same_seed(model_path):
    a = bark_tpu.bark_load_model(model_path, tiny_params(), seed=7)
    b = bark_tpu.bark_load_model(model_path, tiny_params(), seed=7)
    assert a.generate_audio("hello world") and b.generate_audio("hello world")
    np.testing.assert_array_equal(a.semantic_tokens, b.semantic_tokens)
    np.testing.assert_array_equal(a.fine_tokens, b.fine_tokens)
    np.testing.assert_allclose(
        a.generated_audio, b.generated_audio, atol=1e-6
    )


def test_temp0_is_argmax_deterministic(model_path):
    p = tiny_params(temp=0.0, fine_temp=0.0)
    a = bark_tpu.bark_load_model(model_path, p, seed=1)
    b = bark_tpu.bark_load_model(model_path, p, seed=99)  # seed must not matter
    assert a.generate_audio("hello") and b.generate_audio("hello")
    np.testing.assert_array_equal(a.fine_tokens, b.fine_tokens)


def test_progress_callback(model_path):
    seen = []
    p = tiny_params()
    p.progress_callback = lambda ctx, step, pct, ud: seen.append((int(step), pct))
    ctx = bark_tpu.bark_load_model(model_path, p, seed=0)
    assert ctx.generate_audio("hello")
    steps = {s for s, _ in seen}
    assert steps == {0, 1, 2}
    assert all(0 <= pct <= 100 for _, pct in seen)


def test_wav_roundtrip(generated, tmp_path):
    audio = bark_tpu.bark_get_audio_data(generated)
    path = str(tmp_path / "out.wav")
    write_wav(path, audio, 24000)
    back, sr = read_wav(path)
    assert sr == 24000
    np.testing.assert_allclose(back, audio, atol=0)


def test_quantized_model_runs(model_path, tmp_path):
    qpath = str(tmp_path / "tiny_q4_0.bin")
    assert bark_tpu.bark_model_quantize(
        model_path, qpath, int(ggml.GGMLFType.MOSTLY_Q4_0)
    )
    assert os.path.getsize(qpath) < os.path.getsize(model_path)
    ctx = bark_tpu.bark_load_model(qpath, tiny_params(), seed=0)
    assert ctx.generate_audio("hello world")
    assert bark_tpu.bark_get_audio_data_size(ctx) > 0
    # quantized hparams carry qntvr*1000 + ftype
    m = ggml.read_model_file(qpath)
    assert m.semantic.hparams.qntvr == ggml.GGML_QNT_VERSION
    assert m.semantic.hparams.base_ftype == int(ggml.GGMLFType.MOSTLY_Q4_0)
    # codec copied through byte-for-byte
    orig = ggml.read_model_file(model_path)
    for name, rec in orig.codec.tensors.items():
        assert m.codec.tensors[name].data == rec.data
