"""Kernel-preserving dp-sharded serving (parallel.sharding.shard_context_dp).

`shard_context` (TP via GSPMD) re-traces the plain-XLA stage programs and
abandons the Pallas kernels; `shard_context_dp` instead shard_maps the
existing natively-batched stage programs over a 1-axis `dp` mesh so each
device runs the fused single-chip pipeline on its B/dp slice. Per-lane
outputs must equal the unsharded batched path exactly (same compiled batch
bucket -> same host key draws -> same per-lane math).

The reference has no distributed execution (SURVEY.md §2.10 — one device,
a server mutex, bark.cpp:2125-2172 is strictly sequential); this is the
TPU-native scale-out for its server.
"""

import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.parallel import sharding
from tests.tiny_model import build_tiny_model, tiny_params


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("model") / "tiny_weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


@pytest.fixture(scope="module")
def kernel_model_path(tmp_path_factory):
    """128-dim variant: shapes the fused Pallas kernels accept."""
    path = tmp_path_factory.mktemp("model") / "tiny_weights_128.bin"
    ggml.write_model_file(str(path), build_tiny_model(n_embd=128))
    return str(path)


def _match_lanes(out, ref, n):
    assert len(out) == len(ref) == n
    for i in range(n):
        assert out[i].shape == ref[i].shape, f"lane {i}"
        np.testing.assert_allclose(out[i], ref[i], atol=1e-5,
                                   err_msg=f"lane {i}")


def test_dp_batch_matches_unsharded(model_path):
    """dp=2 over 4 lanes: same compiled bucket (Bp=4) as unsharded."""
    prompts = ["hello world", "the a world", "world", "a the hello"]

    base = bark_tpu.bark_load_model(model_path, tiny_params(), seed=7)
    ref = base.generate_audio_batch(prompts)

    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=7)
    sharding.shard_context_dp(ctx, sharding.make_dp_mesh(2))
    out = ctx.generate_audio_batch(prompts)
    _match_lanes(out, ref, 4)


def test_dp_bucketing_and_ragged_batch(model_path):
    """B=3 on dp=4: global bucket is dp*ceil-pow2(B/dp)=4, matching the
    unsharded bucket, so key draws line up lane-for-lane."""
    prompts = ["hello world", "the a hello", "world world the"]

    base = bark_tpu.bark_load_model(model_path, tiny_params(), seed=11)
    ref = base.generate_audio_batch(prompts)

    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=11)
    sharding.shard_context_dp(ctx, sharding.make_dp_mesh(4))
    out = ctx.generate_audio_batch(prompts)
    _match_lanes(out, ref, 3)


def test_dp_keeps_packed_quantized_weights(kernel_model_path, tmp_path):
    """The (dp, tp) GSPMD path serves qpack via in-program densify
    (shard_qpack_params + dense_from_qpack); the dp path instead must keep
    the packed Pallas kernels themselves, serving a packed context
    unchanged per device."""
    qpath = str(tmp_path / "tiny128_q8.bin")
    assert bark_tpu.bark_model_quantize(
        kernel_model_path, qpath, int(ggml.GGMLFType.MOSTLY_Q8_0)
    )
    params = tiny_params(
        dequantize_on_load=False, use_pallas_decode=True,
        n_steps_text_encoder=6,
    )

    base = bark_tpu.bark_load_model(qpath, params, seed=13)
    assert any(base._packed.values())  # the fixture really is packed
    ref = base.generate_audio_batch(["hello world", "the a world"])

    ctx = bark_tpu.bark_load_model(qpath, params, seed=13)
    sharding.shard_context_dp(ctx, sharding.make_dp_mesh(2))
    out = ctx.generate_audio_batch(["hello world", "the a world"])
    _match_lanes(out, ref, 2)


def test_dp_kernel_path_interpret(kernel_model_path):
    """The point of the dp mode: the fused Pallas kernel pipeline itself
    (interpret mode off-TPU) runs under shard_map, per-lane equal to the
    unsharded kernel-path batch."""
    params = tiny_params(use_pallas_decode=True, n_steps_text_encoder=6)
    prompts = ["hello world", "the a world"]

    base = bark_tpu.bark_load_model(kernel_model_path, params, seed=3)
    ref = base.generate_audio_batch(prompts)

    ctx = bark_tpu.bark_load_model(kernel_model_path, params, seed=3)
    sharding.shard_context_dp(ctx, sharding.make_dp_mesh(2))
    out = ctx.generate_audio_batch(prompts)
    _match_lanes(out, ref, 2)
