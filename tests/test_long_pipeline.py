"""Long-utterance schedules: coarse multi-window re-prime + fine multi-block.

The default tiny test params (12 semantic steps) produce a single coarse
window and a single fine block, leaving the sliding-window re-prime
(bark.cpp:1787-1809) and the 1024-block/512-hop fine loop (bark.cpp:1998-2046)
unexercised. Here the semantic budget is raised so the tiny model generates
150 coarse steps -> 3 windows (history capped at max_coarse_history=60) and
75 frames -> 2 fine blocks (tiny fine block_size=64, hop 32), on BOTH the
fused and stepped paths, which must agree token-for-token.
"""

import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.pipeline import coarse as coarse_pipe
from tests.tiny_model import build_tiny_model, tiny_params

LONG = dict(n_steps_text_encoder=50)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("model") / "tiny_weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


def _gen(model_path, **overrides):
    ctx = bark_tpu.bark_load_model(
        model_path, tiny_params(**LONG, **overrides), seed=11
    )
    assert ctx.generate_audio("hello world the a hello world")
    return ctx


def test_long_schedule_shape(model_path):
    ctx = _gen(model_path)
    n_sem = len(ctx.semantic_tokens)
    assert n_sem == 50  # eos disabled -> full budget
    _, _, n_steps, n_windows = coarse_pipe.coarse_schedule(
        n_sem, ctx.params
    )
    assert n_windows >= 3  # multi-window re-prime exercised
    assert ctx.coarse_tokens.shape == (n_steps // 2, 2)
    n_frames = n_steps // 2
    assert n_frames > ctx.fine_cfg.block_size  # multi-block fine exercised
    assert ctx.fine_tokens.shape == (n_frames, 8)
    assert ctx.get_audio_data_size() == n_frames * 320
    # fine preserves coarse channels; all codes in range
    np.testing.assert_array_equal(ctx.fine_tokens[:, :2], ctx.coarse_tokens)
    assert np.all((ctx.fine_tokens >= 0) & (ctx.fine_tokens < 8))


def test_long_fused_matches_stepped(model_path):
    fused = _gen(model_path, detailed_stats=False)
    stepped = _gen(model_path, detailed_stats=True)
    np.testing.assert_array_equal(fused.semantic_tokens, stepped.semantic_tokens)
    np.testing.assert_array_equal(fused.coarse_tokens, stepped.coarse_tokens)
    np.testing.assert_array_equal(fused.fine_tokens, stepped.fine_tokens)
    np.testing.assert_allclose(
        fused.generated_audio, stepped.generated_audio, atol=1e-6
    )
