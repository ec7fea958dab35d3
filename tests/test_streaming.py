"""Streaming generation: per-coarse-window audio chunks.

Beyond-reference (the C API is strictly batch, bark.h:171). Key invariants:
- already-yielded samples are FINAL: the concatenated chunks equal decoding
  the final fine sequence in one shot (the SEANet decoder is causal, so the
  per-chunk prefix decode is exact);
- a single-window utterance streams bit-identically to the stepped batch
  path (same key-draw order and per-block fine splits);
- the coarse token stream is identical to the batch paths for any length
  (streaming only changes fine/codec scheduling).
"""

import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from tests.tiny_model import build_tiny_model, tiny_params


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("streammodel") / "tiny_weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


def test_stream_single_window_matches_stepped(model_path):
    """One coarse window => the stream is bit-identical to the batch path."""
    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=9)
    chunks = list(ctx.generate_audio_stream("hello world"))
    assert len(chunks) == 1
    stream_audio = ctx.get_audio_data()
    np.testing.assert_array_equal(stream_audio, np.concatenate(chunks))

    stepped = bark_tpu.bark_load_model(
        model_path, tiny_params(detailed_stats=True), seed=9
    )
    assert stepped.generate_audio("hello world")
    np.testing.assert_array_equal(stream_audio, stepped.generated_audio)


def test_stream_chunks_are_final(model_path):
    """Multi-window: concatenated chunks == one-shot decode of the final
    fine sequence (prefix decodes are exact under the causal codec), and
    the coarse schedule matches the stepped path token for token."""
    params = tiny_params(sliding_window_size=20, max_coarse_history=20)
    ctx = bark_tpu.bark_load_model(model_path, params, seed=3)
    chunks = list(ctx.generate_audio_stream("hello world the a"))
    assert len(chunks) >= 2
    concat = np.concatenate(chunks)
    np.testing.assert_array_equal(concat, ctx.get_audio_data())

    # one-shot decode of the stream's own fine tokens must equal the stream
    ctx2 = bark_tpu.bark_load_model(model_path, params, seed=0)
    ctx2._decode_codec(ctx.fine_tokens, params)
    np.testing.assert_allclose(concat, ctx2.generated_audio, atol=0)

    # coarse tokens: identical to the stepped path with the same seed
    stepped = bark_tpu.bark_load_model(
        model_path,
        tiny_params(sliding_window_size=20, max_coarse_history=20,
                    detailed_stats=True),
        seed=3,
    )
    assert stepped.generate_audio("hello world the a")
    np.testing.assert_array_equal(ctx.coarse_tokens, stepped.coarse_tokens)
    assert ctx.stats.n_sample_coarse == stepped.stats.n_sample_coarse


def test_stream_with_voice(model_path):
    from tests.test_voice import make_preset

    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=5)
    chunks = list(
        ctx.generate_audio_stream("hello world", voice=make_preset())
    )
    assert chunks and all(np.isfinite(c).all() for c in chunks)
    # voice must change the audio vs the same-seed voiceless stream
    plain = bark_tpu.bark_load_model(model_path, tiny_params(), seed=5)
    plain_chunks = list(plain.generate_audio_stream("hello world"))
    a, b = np.concatenate(chunks), np.concatenate(plain_chunks)
    assert a.shape != b.shape or not np.allclose(a, b)


def test_stream_progress_and_stats(model_path):
    seen = []
    params = tiny_params(
        sliding_window_size=20, max_coarse_history=20,
        progress_callback=lambda c, step, pc, ud: seen.append((int(step), pc)),
    )
    ctx = bark_tpu.bark_load_model(model_path, params, seed=1)
    n = sum(c.size for c in ctx.generate_audio_stream("hello world"))
    assert n == ctx.get_audio_data_size() > 0
    stages = {s for s, _ in seen}
    assert stages == {0, 1, 2}  # semantic, coarse, fine all reported
    assert ctx.stats.n_sample_semantic > 0 and ctx.stats.t_eval_us > 0
