"""Voice presets (speaker history prompts) — layout, trimming, and pipeline
integration.

The C++ reference hardcodes an empty history (bark.cpp:640-651); suno's
history_prompt semantics (bark/generation.py) are the behavioral model for
this beyond-reference feature. The key integration invariant: the fused
(on-device window loop) and stepped (host-orchestrated) paths implement the
history plumbing independently and must produce identical audio.
"""

import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.pipeline import voice
from tests.tiny_model import build_tiny_model, tiny_params


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("voicemodel") / "tiny_weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


def make_preset(n_sem=30, n_frames=14, seed=3) -> voice.VoicePreset:
    rng = np.random.default_rng(seed)
    p = tiny_params()
    return voice.VoicePreset(
        semantic=rng.integers(
            0, p.semantic_vocab_size, n_sem).astype(np.int32),
        coarse=rng.integers(
            0, p.codebook_size, (p.n_coarse_codebooks, n_frames)
        ).astype(np.int32),
        fine=rng.integers(
            0, p.codebook_size, (p.n_fine_codebooks, n_frames)
        ).astype(np.int32),
    )


def test_semantic_history_layout():
    p = tiny_params()
    preset = make_preset(n_sem=10)
    hist = voice.semantic_history_tokens(preset, p)
    assert hist.shape == (256,)
    np.testing.assert_array_equal(hist[:10], preset.semantic)
    assert (hist[10:] == p.semantic_pad_token).all()
    # long history: last 256 tokens
    preset_long = make_preset(n_sem=400)
    hist = voice.semantic_history_tokens(preset_long, p)
    np.testing.assert_array_equal(hist, preset_long.semantic[-256:])
    assert voice.semantic_history_tokens(None, p) is None


def test_coarse_history_trim_matches_suno_float_math():
    """The integer-exact trim must reproduce suno's float arithmetic
    (generate_coarse: mutually consistent lengths, column-major flatten
    with channel offsets + semantic vocab offset, and the [:-2] hack)."""
    p = tiny_params()
    preset = make_preset(n_sem=30, n_frames=14)
    sem_hist, coarse_hist = voice.coarse_history(preset, p)

    # suno reference math in float
    ratio = p.coarse_rate_hz / p.semantic_rate_hz * p.n_coarse_codebooks
    max_sem_hist = int(np.floor(p.max_coarse_history / ratio))
    x_coarse = preset.coarse.copy()
    for n in range(1, x_coarse.shape[0]):
        x_coarse[n] += p.codebook_size * n
    flat = x_coarse.ravel("F") + p.semantic_vocab_size
    n_sem = int(np.min([
        max_sem_hist,
        len(preset.semantic) - len(preset.semantic) % 2,
        int(np.floor(len(flat) / ratio)),
    ]))
    n_coarse = int(round(n_sem * ratio))
    want_sem = preset.semantic[len(preset.semantic) - n_sem:]
    want_coarse = flat[len(flat) - n_coarse:][:-2]

    np.testing.assert_array_equal(sem_hist, want_sem)
    np.testing.assert_array_equal(coarse_hist, want_coarse)
    # interleave check: flat[0::2] is channel 0, flat[1::2] channel 1+offset
    np.testing.assert_array_equal(
        flat[0::2], preset.coarse[0] + p.semantic_vocab_size
    )
    np.testing.assert_array_equal(
        flat[1::2],
        preset.coarse[1] + p.codebook_size + p.semantic_vocab_size,
    )


def test_fine_history_rows():
    p = tiny_params()
    preset = make_preset(n_frames=14)
    fh = voice.fine_history(preset, p)
    assert fh.shape == (14, p.n_fine_codebooks)
    np.testing.assert_array_equal(fh, preset.fine.T)
    assert voice.fine_history(None, p).shape == (0, p.n_fine_codebooks)


def test_save_load_roundtrip_and_validation(tmp_path):
    p = tiny_params()
    preset = make_preset()
    path = str(tmp_path / "speaker.npz")
    voice.save_voice_preset(path, preset)
    back = voice.load_voice_preset(path)
    np.testing.assert_array_equal(back.semantic, preset.semantic)
    np.testing.assert_array_equal(back.coarse, preset.coarse)
    np.testing.assert_array_equal(back.fine, preset.fine)
    back.validate(p)

    bad = voice.VoicePreset(
        semantic=np.asarray([0, p.semantic_vocab_size], np.int32),
        coarse=preset.coarse, fine=preset.fine,
    )
    with pytest.raises(ValueError, match="semantic_prompt"):
        bad.validate(p)
    np.savez(str(tmp_path / "junk.npz"), something=np.zeros(3))
    with pytest.raises(ValueError, match="not a bark voice preset"):
        voice.load_voice_preset(str(tmp_path / "junk.npz"))


def test_voice_fused_equals_stepped(model_path, tmp_path):
    """The fused on-device history plumbing and the host-side stepped
    plumbing are independent implementations; same seed => same audio."""
    preset = make_preset()
    path = str(tmp_path / "v.npz")
    voice.save_voice_preset(path, preset)

    fused = bark_tpu.bark_load_model(model_path, tiny_params(), seed=11)
    assert fused.generate_audio("hello world", voice=path)
    fused_audio = fused.generated_audio

    stepped = bark_tpu.bark_load_model(
        model_path, tiny_params(detailed_stats=True), seed=11
    )
    assert stepped.generate_audio("hello world", voice=preset)
    np.testing.assert_allclose(fused_audio, stepped.generated_audio, atol=1e-5)


def test_voice_changes_output(model_path):
    a = bark_tpu.bark_load_model(model_path, tiny_params(), seed=4)
    assert a.generate_audio("hello world")
    no_voice = a.generated_audio

    b = bark_tpu.bark_load_model(model_path, tiny_params(), seed=4)
    assert b.generate_audio("hello world", voice=make_preset())
    with_voice = b.generated_audio
    # histories condition every stage; outputs must differ
    assert no_voice.shape != with_voice.shape or not np.allclose(
        no_voice, with_voice
    )


def test_batched_voice_matches_single(model_path, tmp_path):
    """generate_audio_batch with per-lane voices reproduces the single
    fused path lane by lane (same injected keys)."""
    import jax

    preset = make_preset()
    voices = [preset, None]
    prompts = ["hello world", "the a hello"]

    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=5)
    outs = ctx.generate_audio_batch(prompts, voices=voices)
    assert len(outs) == 2 and all(o.size > 0 for o in outs)

    key = jax.random.PRNGKey(5)
    keys = []
    for _ in range(6):  # 3 stages x 2 lanes (B=2 buckets to 2)
        key, sub = jax.random.split(key)
        keys.append(sub)
    sem_keys, coarse_keys, fine_keys = keys[0:2], keys[2:4], keys[4:6]
    for i, (prompt, v) in enumerate(zip(prompts, voices)):
        single = bark_tpu.bark_load_model(model_path, tiny_params(), seed=0)
        injected = iter([sem_keys[i], coarse_keys[i], fine_keys[i]])
        single._next_key = lambda it=injected: next(it)
        assert single.generate_audio(prompt, voice=v)
        np.testing.assert_allclose(
            outs[i], single.generated_audio, atol=1e-5, err_msg=f"lane {i}"
        )


def test_save_voice_from_generation(model_path, tmp_path):
    """BarkContext.save_voice (suno save_as_prompt parity): a finished
    generation round-trips into a valid preset whose channels are exactly
    the generation's token buffers, and the preset drives a new generation."""
    p = tiny_params()
    ctx = bark_tpu.bark_load_model(model_path, p, seed=7)
    with pytest.raises(ValueError, match="no finished generation"):
        ctx.save_voice(str(tmp_path / "early.npz"))
    assert ctx.generate_audio("hello world")
    path = str(tmp_path / "gen_voice.npz")
    bark_tpu.bark_save_voice(ctx, path)

    back = voice.load_voice_preset(path)
    back.validate(p)
    np.testing.assert_array_equal(back.semantic, ctx.semantic_tokens)
    np.testing.assert_array_equal(back.coarse, ctx.coarse_tokens.T)
    np.testing.assert_array_equal(back.fine, ctx.fine_tokens.T)
    assert back.fine.shape[0] == p.n_fine_codebooks

    again = bark_tpu.bark_load_model(model_path, p, seed=8)
    assert again.generate_audio("hello world", voice=path)


def test_preset_from_audio(model_path, tmp_path):
    """The EnCodec-encoder path: coarse/fine channels come from encoding the
    waveform; an empty semantic channel validates, yields no semantic/coarse
    history (suno's mutually-consistent trim), and still generates."""
    from bark_tpu.models import encodec

    p = tiny_params()
    ctx = bark_tpu.bark_load_model(model_path, p, seed=9)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(320 * 12).astype(np.float32) * 0.1

    preset = voice.preset_from_audio(ctx.codec_params, audio, p)
    assert preset.fine.shape == (p.n_fine_codebooks, 12)
    np.testing.assert_array_equal(
        preset.coarse, preset.fine[: p.n_coarse_codebooks]
    )
    # channels match a direct encode
    import jax.numpy as jnp
    codes = np.asarray(encodec.encode_audio(
        ctx.codec_params, jnp.asarray(audio), p.n_fine_codebooks))
    np.testing.assert_array_equal(preset.fine, codes.T)
    # empty semantic -> all-pad semantic history, no coarse history
    assert preset.semantic.size == 0
    hist = voice.semantic_history_tokens(preset, p)
    assert (hist == p.semantic_pad_token).all()
    sh, ch = voice.coarse_history(preset, p)
    assert sh.size == 0 and ch.size == 0
    assert voice.fine_history(preset, p).shape == (12, p.n_fine_codebooks)
    assert ctx.generate_audio("hello world", voice=preset)

    # semantic donor threads through
    donor = make_preset(n_sem=20)
    with_sem = voice.preset_from_audio(
        ctx.codec_params, audio, p, semantic_donor=donor
    )
    np.testing.assert_array_equal(with_sem.semantic, donor.semantic)


def test_voice_cli(model_path, tmp_path):
    """cli/voice.py info + from-wav, and cli/main.py --save-voice."""
    from bark_tpu.cli import voice as voice_cli
    from bark_tpu.utils.wav import write_wav

    preset_path = str(tmp_path / "speaker.npz")
    voice.save_voice_preset(preset_path, make_preset())
    assert voice_cli.main(["info", preset_path]) == 0

    rng = np.random.default_rng(1)
    wav_path = str(tmp_path / "in.wav")
    write_wav(wav_path, rng.standard_normal(320 * 10).astype(np.float32) * 0.1)
    out_path = str(tmp_path / "cloned.npz")
    assert voice_cli.main([
        "from-wav", wav_path, "-m", model_path, "-o", out_path,
        "--semantic-from", preset_path,
    ]) == 0
    cloned = voice.load_voice_preset(out_path)
    cloned.validate(tiny_params())
    assert cloned.fine.shape[1] == 10
    assert voice_cli.main(["info", out_path]) == 0
