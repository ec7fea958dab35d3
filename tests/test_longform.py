"""Long-form generation: sentence splitting + the sentence-chained pipeline
(suno's long-form notebook recipe; the reference truncates long prompts at
its 256-token prompt / 768 semantic steps, bark.cpp:624-651)."""

import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.text import longform
from tests.tiny_model import build_tiny_model, tiny_params


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("longmodel") / "tiny_weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


def test_split_sentences_basic():
    assert longform.split_sentences("Hello world. How are you? Fine!") == [
        "Hello world.", "How are you?", "Fine!"
    ]
    assert longform.split_sentences("  one sentence no ender ") == [
        "one sentence no ender"
    ]
    assert longform.split_sentences("") == []
    assert longform.split_sentences("   \n  ") == []


def test_split_sentences_long_sentence_soft_breaks():
    # an over-long sentence splits at the latest comma before the limit
    words = ", ".join(f"item {i}" for i in range(40)) + "."
    pieces = longform.split_sentences(words, max_chars=80)
    assert len(pieces) > 1
    assert all(len(p) <= 81 for p in pieces)
    # nothing lost: the concatenation covers every word
    joined = " ".join(pieces)
    for i in range(40):
        assert f"item {i}" in joined
    # unbreakable run: hard cut, still bounded
    blob = "x" * 500
    pieces = longform.split_sentences(blob, max_chars=100)
    assert all(len(p) <= 101 for p in pieces)
    assert "".join(pieces) == blob


def test_generate_audio_long(model_path):
    """Two sentences: audio is sentence1 + silence + sentence2, where
    sentence2 was generated with sentence1's tokens as its voice preset;
    stats accumulate across sentences."""
    p = tiny_params()
    ctx = bark_tpu.bark_load_model(model_path, p, seed=0)
    text = "Hello world. How are you?"
    assert ctx.generate_audio_long(text, silence_s=0.1)
    audio = ctx.get_audio_data()
    n_sil = int(0.1 * p.sample_rate)

    # reproduce by hand with the same seed stream
    ref = bark_tpu.bark_load_model(model_path, p, seed=0)
    assert ref.generate_audio("Hello world.")
    part1 = ref.get_audio_data().copy()
    from bark_tpu.pipeline import voice as voice_mod

    preset = voice_mod.preset_from_generation(
        ref.semantic_tokens, ref.coarse_tokens, ref.fine_tokens, p
    )
    assert ref.generate_audio("How are you?", voice=preset)
    part2 = ref.get_audio_data().copy()

    assert audio.size == part1.size + n_sil + part2.size
    np.testing.assert_array_equal(audio[: part1.size], part1)
    assert (audio[part1.size : part1.size + n_sil] == 0).all()
    np.testing.assert_array_equal(audio[part1.size + n_sil :], part2)
    # accumulated stats cover both sentences
    assert ctx.stats.n_sample_semantic == 2 * ref.stats.n_sample_semantic


def test_generate_audio_stream_long(model_path):
    """The streaming variant yields the same concatenation it stores."""
    p = tiny_params()
    ctx = bark_tpu.bark_load_model(model_path, p, seed=0)
    chunks = list(
        ctx.generate_audio_stream_long("Hello world. Fine!", silence_s=0.05)
    )
    streamed = np.concatenate(chunks)
    np.testing.assert_array_equal(streamed, ctx.get_audio_data())
    # two sentences with one silence gap of the requested length
    assert sum(int((c == 0).all()) for c in chunks) >= 1
    assert ctx.stats.n_sample_semantic > 0
