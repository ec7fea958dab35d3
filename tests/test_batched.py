"""Batched generation: vmapped fused pipeline vs per-prompt generation.

generate_audio_batch shares one device pipeline across B prompts; with the
same per-stage keys each lane must reproduce the single-prompt fused result
exactly (the vmap batching rules for while_loop mask finished lanes)."""

import jax
import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from tests.tiny_model import build_tiny_model, tiny_params


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("model") / "tiny_weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


def test_batch_matches_singles(model_path):
    prompts = ["hello world", "the a hello", "world world the"]

    # batched: keys are drawn in stage-major order from the context RNG
    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=5)
    outs = ctx.generate_audio_batch(prompts)
    assert len(outs) == 3 and all(o.size > 0 for o in outs)
    assert ctx.stats.n_sample_semantic > 0

    # singles with the same key sequence: re-derive each lane's keys
    ref_ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=5)
    key = jax.random.PRNGKey(5)
    keys = []
    for _ in range(9):  # 3 stages x 3 prompts, stage-major
        key, sub = jax.random.split(key)
        keys.append(sub)
    sem_keys, coarse_keys, fine_keys = keys[0:3], keys[3:6], keys[6:9]

    for i, prompt in enumerate(prompts):
        single = bark_tpu.bark_load_model(model_path, tiny_params(), seed=0)
        # inject the exact keys the batch used for lane i
        injected = iter([sem_keys[i], coarse_keys[i], fine_keys[i]])
        single._next_key = lambda it=injected: next(it)
        assert single.generate_audio(prompt)
        np.testing.assert_allclose(
            outs[i], single.generated_audio, atol=1e-5,
            err_msg=f"lane {i}",
        )


def test_batch_of_one(model_path):
    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=1)
    outs = ctx.generate_audio_batch(["hello"])
    assert len(outs) == 1 and outs[0].size > 0
    assert ctx.generate_audio_batch([]) == []


def test_server_batch_worker(model_path):
    """Two concurrent requests served through one batched generation."""
    from concurrent.futures import ThreadPoolExecutor

    from bark_tpu.cli.server import BatchWorker

    ctx = bark_tpu.bark_load_model(model_path, tiny_params(), seed=2)
    worker = BatchWorker(ctx, max_batch=4, window_ms=200)
    with ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(worker.submit, t) for t in ("hello", "world the")]
        outs = [f.result(timeout=300) for f in futs]
    assert all(o is not None and o.size > 0 for o in outs)
