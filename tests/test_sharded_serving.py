"""Mesh-sharded batched serving: generate_audio_batch with TP/DP-placed
weights on a virtual 8-device mesh must reproduce the unsharded outputs.

GSPMD partitions the vmapped whole-stage programs (column/row-parallel
matmuls over `tp`, batch over `dp`); with temp=0-free tiny weights the
collectives' reduction-order noise stays well under audio tolerance.
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
    """128-dim variant: D//32=4 quant blocks per row, so tp=4 shards the
    packed scale planes with whole blocks per device."""
    path = tmp_path_factory.mktemp("model") / "tiny_weights_128.bin"
    ggml.write_model_file(str(path), build_tiny_model(n_embd=128))
    return str(path)


def test_packed_quantized_tp(kernel_model_path, tmp_path):
    """VERDICT r4 #4 stretch: packed-quantized TP serving. The qpack int8
    value + scale planes shard column/row-parallel (shard_qpack_params);
    the in-program densify is block-local so GSPMD dequantizes shard-
    locally and the TP matmuls run on weights that never existed densely
    on any single device."""
    qpath = str(tmp_path / "tiny128_q8.bin")
    assert bark_tpu.bark_model_quantize(
        kernel_model_path, qpath, int(ggml.GGMLFType.MOSTLY_Q8_0)
    )
    # use_pallas_decode=True admits the packed causal stages at load; the
    # flip after load routes serving through the densify/XLA batched
    # programs, which are what GSPMD partitions. (Each ctx gets its own
    # params object — the flip must not leak into the other load.)
    def load():
        params = tiny_params(
            dequantize_on_load=False, use_pallas_decode=True,
            n_steps_text_encoder=6,
        )
        c = bark_tpu.bark_load_model(qpath, params, seed=13)
        assert all(c._packed.values())
        c.params.use_pallas_decode = False
        return c

    prompts = ["hello world", "the a world"]

    base = load()
    ref = base.generate_audio_batch(prompts)

    ctx = load()
    mesh = sharding.make_mesh(8, dp=2)  # (dp=2, tp=4)
    sharding.shard_context(ctx, mesh)

    # the int8 planes must ACTUALLY be tensor-parallel, not replicated
    blocks = ctx.coarse_params["blocks"]
    assert "tp" in tuple(blocks["qkv_q"].sharding.spec)
    assert "tp" in tuple(blocks["proj_q"].sharding.spec)
    assert "tp" in tuple(blocks["proj_s"].sharding.spec)

    out = ctx.generate_audio_batch(prompts)
    assert len(out) == len(ref) == 2
    for i in range(2):
        assert out[i].shape == ref[i].shape
        np.testing.assert_allclose(
            out[i], ref[i], atol=1e-4, err_msg=f"lane {i}"
        )


def test_sharded_batch_matches_unsharded(model_path):
    prompts = ["hello world", "the a world"]

    base = bark_tpu.bark_load_model(model_path, tiny_params(), seed=3)
    ref = base.generate_audio_batch(prompts)

    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=3)
    mesh = sharding.make_mesh(8, dp=2)  # (dp=2, tp=4)
    sharding.shard_context(ctx, mesh)
    out = ctx.generate_audio_batch(prompts)

    assert len(out) == len(ref) == 2
    for i in range(2):
        assert out[i].shape == ref[i].shape
        np.testing.assert_allclose(out[i], ref[i], atol=1e-4, err_msg=f"lane {i}")
