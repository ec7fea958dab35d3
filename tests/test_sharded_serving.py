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
