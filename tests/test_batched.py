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

    # singles with the same key sequence: re-derive each lane's keys.
    # 3 prompts bucket to a compiled batch of 4, so 4 keys are drawn per
    # stage (stage-major); lanes 0..2 are the real prompts.
    key = jax.random.PRNGKey(5)
    keys = []
    for _ in range(12):  # 3 stages x 4 lanes
        key, sub = jax.random.split(key)
        keys.append(sub)
    sem_keys, coarse_keys, fine_keys = keys[0:4], keys[4:8], keys[8:12]

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


def test_batched_with_packed_params():
    """Packed-quantized stages must work through generate_audio_batch: the
    batched pipeline decodes on densified weights (regression: the qpack
    used to reach gpt.decode_step raw -> KeyError)."""
    import jax.numpy as jnp

    from bark_tpu.api.context import BarkContext
    from bark_tpu.io import ggml, loader
    from bark_tpu.models import encodec as enc
    from bark_tpu.models import gpt
    from tests.test_quant_decode import _section

    sec = _section(ggml.GGMLType.Q8_0, block_size=320)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    # reuse the quantized GPT for semantic+coarse; dense fine; tiny codec
    fine_cfg = gpt.GPTConfig(
        n_layer=2, n_head=2, n_embd=32, block_size=64,
        n_in_vocab=9, n_out_vocab=9, n_lm_heads=7, n_wtes=8,
    )
    fine_params = gpt.init_params_host(fine_cfg, 0)
    codec_cfg = enc.CodecConfig(
        in_channels=1, hidden_dim=16, n_filters=2, kernel_size=7,
        residual_kernel_size=3, n_bins=8, sample_rate=24000, n_q_total=8,
    )
    codec_params = enc.init_params_host(codec_cfg, 1)
    params = tiny_params(
        n_steps_text_encoder=4,
        sliding_window_size=20,
        max_coarse_history=20,
        semantic_vocab_size=16,
        semantic_pad_token=16,
        semantic_infer_token=299,
        text_pad_token=290,
        text_encoding_offset=100,
        coarse_infer_token=50,
        coarse_semantic_pad_token=40,
        codebook_size=8,
        compute_dtype="float32",
    )
    ctx = BarkContext.from_parts(
        vocab_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world"],
        semantic=(cfg, qpack),
        coarse=(cfg, qpack),
        fine=(fine_cfg, fine_params),
        codec_cfg=codec_cfg,
        codec_params=codec_params,
        params=params,
        seed=0,
    )
    ctx._packed = {"semantic": True, "coarse": True}
    outs = ctx.generate_audio_batch(["hello world", "world"])
    assert len(outs) == 2 and all(o.size > 0 for o in outs)
