"""Numerics parity vs the REAL Bark implementation (HF transformers).

Instantiates tiny random `BarkSemanticModel` / `BarkFineModel` from
transformers (the canonical suno port), maps their state dicts onto our
param pytrees, and compares stage forwards. This is an external oracle —
unlike tests/reference_gpt.py it shares no code lineage with bark_tpu.

Known deliberate divergence: the ggml reference (and therefore bark_tpu)
uses the tanh GELU approximation while suno/HF use exact erf GELU
(bark.cpp ggml_gelu); tolerances below account for it.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from bark_tpu.models import gpt


def _to_params(cfg: gpt.GPTConfig, sd) -> dict:
    """Map a BarkCausalModel/BarkFineModel state dict onto the gpt pytree."""
    L, D = cfg.n_layer, cfg.n_embd

    def g(k):
        return np.asarray(sd[k].detach().numpy(), np.float32)

    def stacked(fmt, transpose=False):
        arrs = [g(fmt.format(i=i)) for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    if cfg.n_wtes == 1:
        wte = g("input_embeds_layer.weight")[None]
    else:
        wte = np.stack(
            [g(f"input_embeds_layers.{i}.weight") for i in range(cfg.n_wtes)]
        )
    if cfg.n_lm_heads == 1:
        lm = g("lm_head.weight")[None]
    else:
        lm = np.stack(
            [g(f"lm_heads.{i}.weight") for i in range(cfg.n_lm_heads)]
        )
    return {
        "wte": jnp.asarray(wte),
        "wpe": jnp.asarray(g("position_embeds_layer.weight")),
        "lm_head": jnp.asarray(lm),
        "ln_f_g": jnp.asarray(g("layernorm_final.weight")),
        "ln_f_b": jnp.asarray(g("layernorm_final.bias")),
        "blocks": {
            "ln1_g": stacked("layers.{i}.layernorm_1.weight"),
            "ln1_b": stacked("layers.{i}.layernorm_1.bias"),
            "ln2_g": stacked("layers.{i}.layernorm_2.weight"),
            "ln2_b": stacked("layers.{i}.layernorm_2.bias"),
            "qkv_w": stacked("layers.{i}.attn.att_proj.weight", True),
            "qkv_b": stacked("layers.{i}.attn.att_proj.bias"),
            "proj_w": stacked("layers.{i}.attn.out_proj.weight", True),
            "proj_b": stacked("layers.{i}.attn.out_proj.bias"),
            "fc_w": stacked("layers.{i}.mlp.in_proj.weight", True),
            "fc_b": stacked("layers.{i}.mlp.in_proj.bias"),
            "out_w": stacked("layers.{i}.mlp.out_proj.weight", True),
            "out_b": stacked("layers.{i}.mlp.out_proj.bias"),
        },
    }


@pytest.fixture(scope="module")
def semantic_pair():
    from transformers.models.bark.configuration_bark import BarkSemanticConfig
    from transformers.models.bark.modeling_bark import BarkSemanticModel

    torch.manual_seed(0)
    hf_cfg = BarkSemanticConfig(
        vocab_size=300, output_vocab_size=200, num_layers=2, num_heads=2,
        hidden_size=32, block_size=64, dropout=0.0, bias=True,
    )
    m = BarkSemanticModel(hf_cfg).eval()
    cfg = gpt.GPTConfig(
        n_layer=2, n_head=2, n_embd=32, block_size=64,
        n_in_vocab=300, n_out_vocab=200, bias=True,
    )
    return m, cfg, _to_params(cfg, m.state_dict())


def test_semantic_prefill_logits(semantic_pair):
    m, cfg, params = semantic_pair
    ids = torch.arange(10)[None] % 300
    with torch.no_grad():
        hf_logits = m(input_ids=ids).logits[0]  # (T, out_vocab)

    kc, vc = gpt.init_kv_cache(cfg)
    x_emb = jnp.take(params["wte"][0], jnp.asarray(ids[0].numpy()), axis=0)
    ours, _, _ = gpt.prefill(cfg, params, x_emb, kc, vc, jnp.int32(10))
    ref = hf_logits[-1].numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-2, rtol=2e-2)
    assert int(np.argmax(ours)) == int(np.argmax(ref))


def test_semantic_decode_with_cache(semantic_pair):
    m, cfg, params = semantic_pair
    ids = torch.arange(7)[None] % 300
    with torch.no_grad():
        full = m(input_ids=ids).logits[0]  # HF logits at every position

    kc, vc = gpt.init_kv_cache(cfg)
    x_emb = jnp.take(params["wte"][0], jnp.asarray(ids[0, :4].numpy()), axis=0)
    _, kc, vc = gpt.prefill(cfg, params, x_emb, kc, vc, jnp.int32(4))
    for t in range(4, 7):
        logits, kc, vc = gpt.decode_step(
            cfg, params, jnp.int32(int(ids[0, t])), kc, vc, jnp.int32(t)
        )
        np.testing.assert_allclose(
            np.asarray(logits), full[t].numpy(), atol=2e-2, rtol=2e-2,
            err_msg=f"step {t}",
        )
        assert int(np.argmax(logits)) == int(np.argmax(full[t].numpy()))


def test_merged_prompt_first_logits():
    """The 513-token prompt layout + merge_ctx embedding trick vs HF's
    semantic generate preprocessing (text emb + history emb, then the infer
    token): first-step logits must agree. Needs block_size >= 257."""
    from transformers.models.bark.configuration_bark import BarkSemanticConfig
    from transformers.models.bark.modeling_bark import BarkSemanticModel

    torch.manual_seed(2)
    hf_cfg = BarkSemanticConfig(
        vocab_size=300, output_vocab_size=200, num_layers=2, num_heads=2,
        hidden_size=32, block_size=288, dropout=0.0, bias=True,
    )
    m = BarkSemanticModel(hf_cfg).eval()
    cfg = gpt.GPTConfig(
        n_layer=2, n_head=2, n_embd=32, block_size=288,
        n_in_vocab=300, n_out_vocab=200, bias=True,
    )
    params = _to_params(cfg, m.state_dict())
    text_offset, text_pad = 50, 290
    sem_pad, infer = 150, 299
    text_ids = [3, 7, 11, 19]

    # our prompt layout (tokenizer.tokenize_input semantics, tiny ids)
    prompt = [t + text_offset for t in text_ids]
    prompt += [text_pad] * (256 - len(prompt))
    prompt += [sem_pad] * 256 + [infer]
    kc, vc = gpt.init_kv_cache(cfg)
    x_emb = gpt.embed_prompt_merged(
        cfg, params, jnp.asarray(prompt, jnp.int32)
    )
    ours, _, _ = gpt.prefill(cfg, params, x_emb, kc, vc, jnp.int32(257))

    # HF's construction (BarkSemanticModel.generate preamble)
    emb = m.input_embeds_layer
    ids = torch.tensor([t + text_offset for t in text_ids]
                       + [text_pad] * 252)[None]
    hist = torch.tensor([sem_pad] * 256)[None]
    with torch.no_grad():
        input_embeds = torch.cat(
            [emb(ids) + emb(hist), emb(torch.tensor([[infer]]))], dim=1
        )
        hf_logits = m(input_embeds=input_embeds).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(ours), hf_logits, atol=2e-2, rtol=2e-2)
    assert int(np.argmax(ours)) == int(np.argmax(hf_logits))


@pytest.fixture(scope="module")
def encodec_pair():
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(0)
    hf_cfg = EncodecConfig(
        target_bandwidths=[6.0], audio_channels=1, sampling_rate=24000,
        hidden_size=16, num_filters=2, num_residual_layers=1,
        upsampling_ratios=[8, 5, 4, 2], codebook_size=8, codebook_dim=16,
        kernel_size=7, last_kernel_size=7, residual_kernel_size=3,
        use_causal_conv=True, normalize=False, norm_type="weight_norm",
    )
    m = EncodecModel(hf_cfg).eval()

    from bark_tpu.io.convert import _codec_section
    from bark_tpu.models import encodec as enc

    # suno checkpoints store weight-norm as weight_g/weight_v; modern torch
    # emits parametrizations.* — rename so the converter sees the real format
    state = {}
    for k, v in m.state_dict().items():
        k2 = k.replace("parametrizations.weight.original0", "weight_g")
        k2 = k2.replace("parametrizations.weight.original1", "weight_v")
        state["codec_model." + k2] = v.numpy()
    config = {"codec_config": {
        "audio_channels": 1, "hidden_size": 16, "num_filters": 2,
        "kernel_size": 7, "residual_kernel_size": 3, "codebook_size": 8,
        "sampling_rate": 24000,
    }}
    sec = _codec_section(state, config, use_f16=False)
    params = enc.params_from_section(sec, jnp.float32)
    return m, params


def test_encodec_decode_matches_transformers(encodec_pair):
    """Full codec decode (RVQ + SEANet + LSTM + transposed convs) vs the
    real EnCodec implementation, through the converter's weight-norm fold.
    This caught a real bug: EnCodec pads causal convs in REFLECT mode."""
    from bark_tpu.models import encodec as enc

    m, params = encodec_pair
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 8, (20, 8)).astype(np.int64)
    with torch.no_grad():
        ref = m.decode(
            torch.from_numpy(codes.T[None, None]), [None]
        ).audio_values[0, 0].numpy()
    ours = np.asarray(enc.decode_codes(params, jnp.asarray(codes, jnp.int32)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_encodec_encode_matches_transformers(encodec_pair):
    """The compression path: identical RVQ codes to the real encoder."""
    from bark_tpu.models import encodec as enc

    m, params = encodec_pair
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(20 * 320) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = m.encode(
            torch.from_numpy(audio)[None, None], bandwidth=6.0
        ).audio_codes[0, 0].numpy()  # (nq, T)
    ours = np.asarray(enc.encode_audio(params, jnp.asarray(audio), ref.shape[0]))
    np.testing.assert_array_equal(ours, ref.T)


def test_fine_forward(semantic_pair):
    from transformers.models.bark.configuration_bark import BarkFineConfig
    from transformers.models.bark.modeling_bark import BarkFineModel

    torch.manual_seed(1)
    hf_cfg = BarkFineConfig(
        vocab_size=20, output_vocab_size=20, num_layers=2, num_heads=2,
        hidden_size=32, block_size=16, dropout=0.0, bias=True,
        n_codes_total=8, n_codes_given=1,
    )
    m = BarkFineModel(hf_cfg).eval()
    cfg = gpt.GPTConfig(
        n_layer=2, n_head=2, n_embd=32, block_size=16,
        n_in_vocab=20, n_out_vocab=20, n_lm_heads=7, n_wtes=8, bias=True,
    )
    params = _to_params(cfg, m.state_dict())

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 19, (1, 16, 8)).astype(np.int64)
    nn_idx = 3
    with torch.no_grad():
        hf_logits = m(
            codebook_idx=nn_idx, input_ids=torch.from_numpy(codes)
        ).logits[0]  # (T, out_vocab)

    ours = gpt.fine_forward(
        cfg, params, jnp.asarray(codes[0], jnp.int32), nn_idx
    )
    np.testing.assert_allclose(
        np.asarray(ours), hf_logits.numpy(), atol=2e-2, rtol=2e-2
    )
    assert np.array_equal(
        np.argmax(np.asarray(ours), -1), np.argmax(hf_logits.numpy(), -1)
    )


def test_short_utterance_decode_unaffected_by_padding(encodec_pair):
    """Regression: with reflect padding, the first conv mirrors latent rows
    1..k-1 into its left pad, so pad-then-trim decode corrupts utterances
    shorter than kernel_size frames. The codec paths must decode those at
    exact length."""
    from bark_tpu.models import encodec as enc

    m, params = encodec_pair
    rng = np.random.default_rng(2)
    for n_frames in (1, 3, 6, 7, 12):
        codes = rng.integers(0, 8, (n_frames, 8)).astype(np.int64)
        with torch.no_grad():
            ref = m.decode(
                torch.from_numpy(codes.T[None, None]), [None]
            ).audio_values[0, 0].numpy()
        ours = np.asarray(
            enc.decode_codes(params, jnp.asarray(codes, jnp.int32))
        )
        np.testing.assert_allclose(
            ours, ref, atol=1e-5, rtol=1e-4, err_msg=f"n_frames={n_frames}"
        )


def test_context_short_decode_paths(tmp_path):
    """The pipeline's bucketed codec must equal exact-length decode for
    every reachable short length (single + batched paths)."""
    import bark_tpu
    from bark_tpu.io import ggml as ggml_mod
    from bark_tpu.models import encodec as enc
    from tests.tiny_model import build_tiny_model, tiny_params

    path = str(tmp_path / "w.bin")
    ggml_mod.write_model_file(path, build_tiny_model())
    # n_steps_text_encoder=2 -> 3 coarse frames < kernel_size (7)
    ctx = bark_tpu.bark_load_model(
        path, tiny_params(n_steps_text_encoder=2), seed=0
    )
    assert ctx.generate_audio("hello")
    n_frames = ctx.fine_tokens.shape[0]
    assert n_frames < ctx.codec_cfg.kernel_size
    n_q = ctx.codec_cfg.n_q_for_bandwidth(ctx.params.target_bandwidth)
    exact = np.asarray(
        enc.decode_codes(
            ctx.codec_params, jnp.asarray(ctx.fine_tokens[:, :n_q])
        )
    )
    np.testing.assert_allclose(ctx.generated_audio, exact, atol=1e-6)

    outs = ctx.generate_audio_batch(["hello", "world"])
    for o in outs:
        assert o.size > 0 and np.all(np.isfinite(o))
