"""Fused whole-stage programs must match the stepped per-window/per-block
path token-for-token.

The fused path (`BarkContext._generate_fused`) moves the coarse window loop
and fine block loop on-device (`make_coarse_stage_program`,
`make_fine_stage_program`) and chains stages without host syncs; the stepped
path is the reference implementation mirroring bark.cpp's host loops. Same
seed => identical semantic/coarse/fine tokens and identical audio.
"""

import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.params import BarkContextParams
from bark_tpu.pipeline import coarse as coarse_pipe
from tests.tiny_model import build_tiny_model, tiny_params


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("model") / "tiny_weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


def _gen(model_path, seed, **overrides):
    ctx = bark_tpu.bark_load_model(model_path, tiny_params(**overrides), seed=seed)
    assert ctx.generate_audio("hello world the a")
    return ctx


@pytest.mark.parametrize("seed", [0, 7])
def test_fused_matches_stepped(model_path, seed):
    fused = _gen(model_path, seed, detailed_stats=False)
    stepped = _gen(model_path, seed, detailed_stats=True)
    np.testing.assert_array_equal(fused.semantic_tokens, stepped.semantic_tokens)
    np.testing.assert_array_equal(fused.coarse_tokens, stepped.coarse_tokens)
    np.testing.assert_array_equal(fused.fine_tokens, stepped.fine_tokens)
    np.testing.assert_allclose(
        fused.generated_audio, stepped.generated_audio, atol=1e-6
    )


def test_fused_matches_stepped_temp0(model_path):
    fused = _gen(model_path, 3, detailed_stats=False, temp=0.0, fine_temp=0.0)
    stepped = _gen(model_path, 4, detailed_stats=True, temp=0.0, fine_temp=0.0)
    np.testing.assert_array_equal(fused.fine_tokens, stepped.fine_tokens)


def test_integer_schedule_matches_float():
    """The integer-exact coarse schedule must reproduce the reference's
    float schedule (bark.cpp:1775-1789) for every reachable n_semantic."""
    import math

    p = BarkContextParams()
    stc = p.coarse_rate_hz / p.semantic_rate_hz * p.n_coarse_codebooks
    num, den = coarse_pipe.stc_fraction(p)
    assert abs(num / den - stc) < 1e-12
    for n_sem in range(1, 769):
        _, msh, n_steps, n_windows = coarse_pipe.coarse_schedule(n_sem, p)
        assert msh == int(math.floor(p.max_coarse_history / stc))
        assert n_steps == int(math.floor(n_sem * stc / 2)) * 2
        assert n_windows == int(math.ceil(n_steps / p.sliding_window_size))
    for g in range(0, 2400, 60):
        sem_idx = (2 * g * den + num) // (2 * num)
        assert sem_idx == int(math.floor(g / stc + 0.5))


def test_stage_sync_honest_timing(model_path):
    """stage_sync keeps the fused programs and tokens but syncs per stage,
    so the per-stage stats become real device times: every stage is nonzero
    and their sum is bounded by the synced run's eval total."""
    fused = _gen(model_path, 5)
    synced = _gen(model_path, 5, stage_sync=True)
    np.testing.assert_array_equal(fused.fine_tokens, synced.fine_tokens)
    s = synced.stats
    assert s.t_semantic_us > 0 and s.t_coarse_us > 0 and s.t_fine_us > 0
    assert s.t_semantic_us + s.t_coarse_us + s.t_fine_us <= s.t_eval_us


def test_warmup_compiles_fused_programs(tmp_path):
    """ctx.warmup() AOT-lowers the fused stage programs with avals that
    must match what generate_audio passes (a mismatch shows up as a trace
    error here or an extra compile there), without consuming RNG state:
    generate after warmup must equal generate without."""
    import bark_tpu
    from bark_tpu.io import ggml
    from tests.tiny_model import build_tiny_model, tiny_params

    path = str(tmp_path / "w.bin")
    ggml.write_model_file(path, build_tiny_model())

    ctx = bark_tpu.bark_load_model(path, tiny_params(), seed=7)
    dt = ctx.warmup(parallel=True)
    assert dt > 0
    assert ctx.generate_audio("warm start")
    a = np.asarray(ctx.generated_audio)

    ctx2 = bark_tpu.bark_load_model(path, tiny_params(), seed=7)
    assert ctx2.generate_audio("warm start")
    np.testing.assert_array_equal(a, np.asarray(ctx2.generated_audio))
