"""int8 KV-cache tests: the low-bit cache (gpt.init_kv_cache(quant=True),
per-row f32 scales) must behave identically between the XLA and Pallas
paths, bound the attention-score perturbation, and thread through the full
pipeline (fused == stepped token equality still holds since both paths
quantize with the same formula).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.kernels import decode as kdec
from bark_tpu.models import gpt
from tests.tiny_model import build_tiny_model, tiny_params


def test_quantize_kv_rows_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 256).astype(np.float32))
    q, s = gpt.quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    recon = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    # worst per-row error is half a quantization step (amax/254)
    bound = np.abs(np.asarray(x)).max(axis=1) / 127.0 * 0.51
    assert (np.abs(recon - np.asarray(x)).max(axis=1) <= bound).all()
    # zero rows stay exactly zero (scale 0 guarded)
    qz, sz = gpt.quantize_kv_rows(jnp.zeros((2, 64)))
    np.testing.assert_array_equal(np.asarray(qz), 0)
    np.testing.assert_array_equal(np.asarray(sz), 0.0)


def _cfg():
    return gpt.GPTConfig(n_layer=2, n_head=2, n_embd=128, block_size=64,
                         n_in_vocab=300, n_out_vocab=200, bias=True)


def test_xla_decode_int8_close_to_dense():
    """The int8 cache perturbs logits only mildly (sanity bound)."""
    cfg = _cfg()
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    x_emb = jnp.take(params["wte"][0], jnp.arange(9), axis=0)

    def run(quant):
        kc, vc = gpt.init_kv_cache(cfg, quant=quant)
        logits, kc, vc = gpt.prefill(cfg, params, x_emb, kc, vc, jnp.int32(9))
        logits, kc, vc = gpt.decode_step(
            cfg, params, jnp.int32(17), kc, vc, jnp.int32(9)
        )
        return np.asarray(logits)

    dense, low = run(False), run(True)
    assert np.abs(dense - low).max() < 0.15 * max(1.0, np.abs(dense).max())
    assert dense.argmax() == low.argmax()


def test_kernel_matches_xla_int8():
    """Fused kernel (interpret) vs XLA on the SAME int8 cache: logits to
    float tolerance, cache bytes and scales identical.

    Tolerance note: both paths now quantize q for the int8 x int8 MXU
    score dot with the same formula, but from f32 q values that differ by
    matmul-grouping ulps — a q element on a rounding boundary can flip by
    1, shifting scores by ~1/127 relative. Hence 3e-3, not 2e-4."""
    cfg = _cfg()
    params = gpt.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    kc, vc = gpt.init_kv_cache(cfg, quant=True)
    x_emb = jnp.take(params["wte"][0], jnp.arange(5), axis=0)
    _, kc, vc = gpt.prefill(cfg, params, x_emb, kc, vc, jnp.int32(5))
    tok, n_past = jnp.int32(17), jnp.int32(5)
    ref_l, ref_k, ref_v = gpt.decode_step(cfg, params, tok, kc, vc, n_past)
    out_l, out_k, out_v = kdec.decode_step_fused(
        cfg, params, tok, kc, vc, n_past, interpret=True
    )
    np.testing.assert_allclose(out_l, ref_l, rtol=3e-3, atol=3e-3)
    np.testing.assert_array_equal(np.asarray(out_k["q"]), np.asarray(ref_k["q"]))
    np.testing.assert_allclose(
        np.asarray(out_k["s"]), np.asarray(ref_k["s"]), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out_v["q"]), np.asarray(ref_v["q"]))
    assert int(jnp.argmax(out_l)) == int(jnp.argmax(ref_l))


def test_kernel_matches_xla_int8_batched():
    cfg = _cfg()
    params = gpt.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    B = 3
    kc, vc = gpt.init_kv_cache(cfg, batch=B, quant=True)
    x_emb = jnp.stack([
        jnp.take(params["wte"][0], jnp.arange(5) + i, axis=0)
        for i in range(B)
    ])
    _, kc, vc = jax.vmap(
        lambda x, k, v: gpt.prefill(cfg, params, x, k, v, jnp.int32(5)),
        in_axes=(0, 1, 1), out_axes=(0, 1, 1),
    )(x_emb, kc, vc)
    toks = jnp.array([17, 23, 5], jnp.int32)
    n_past = jnp.array([5, 6, 5], jnp.int32)
    vfn = jax.vmap(
        lambda p, t, k, v, n: gpt.decode_step(cfg, p, t, k, v, n),
        in_axes=(None, 0, 1, 1, 0), out_axes=(0, 1, 1),
    )
    ref_l, ref_k, ref_v = vfn(params, toks, kc, vc, n_past)
    out_l, out_k, out_v = kdec.decode_step_fused_batched(
        cfg, params, toks, kc, vc, n_past, interpret=True
    )
    np.testing.assert_allclose(out_l, ref_l, rtol=3e-3, atol=3e-3)
    np.testing.assert_array_equal(np.asarray(out_k["q"]), np.asarray(ref_k["q"]))
    np.testing.assert_allclose(
        np.asarray(out_k["s"]), np.asarray(ref_k["s"]), rtol=1e-6
    )


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("kv") / "weights.bin"
    ggml.write_model_file(str(path), build_tiny_model())
    return str(path)


def test_e2e_int8_kv_fused_matches_stepped(model_path):
    """Full pipeline with the int8 cache: audio generates, and the fused
    and stepped paths still produce identical tokens (both quantize the
    cache with the same formula)."""
    outs = {}
    for name, detailed in (("fused", False), ("stepped", True)):
        ctx = bark_tpu.bark_load_model(
            model_path,
            tiny_params(kv_cache_dtype="int8", detailed_stats=detailed),
            seed=5,
        )
        assert ctx.generate_audio("hello world the a")
        outs[name] = ctx
    np.testing.assert_array_equal(
        outs["fused"].semantic_tokens, outs["stepped"].semantic_tokens
    )
    np.testing.assert_array_equal(
        outs["fused"].fine_tokens, outs["stepped"].fine_tokens
    )
    assert outs["fused"].get_audio_data_size() > 0


def test_e2e_int8_kv_batched(model_path):
    ctx = bark_tpu.bark_load_model(
        model_path, tiny_params(kv_cache_dtype="int8"), seed=5
    )
    outs = ctx.generate_audio_batch(["hello world", "the a world"])
    assert len(outs) == 2 and all(o.size > 0 for o in outs)


def _mk_quant_cache_batched(cfg, B):
    return gpt.init_kv_cache(cfg, batch=B, quant=True)


def test_window_kernel_int8_kv_batched_matches_scan():
    """The batched whole-window kernel with the int8 KV cache must emit
    the same tokens as the scan of the batched single-step kernel on the
    same quantized caches (shared quantization formula; the kernel carries
    the per-row scales as VMEM state across its in-kernel steps)."""
    from bark_tpu.kernels import window as kwin
    from bark_tpu.ops import sampling

    cfg = gpt.GPTConfig(n_layer=2, n_head=2, n_embd=128, block_size=512,
                        n_in_vocab=300, n_out_vocab=200, bias=True)
    svs, cbs, sws, temp = 32, 64, 8, 0.7
    lmw = (svs, svs + 2 * cbs)
    B = 2
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    pp = kdec.prepare_decode_params(cfg, params, lm_window=lmw)
    pp = kwin.prepare_window_params(cfg, pp, svs=svs, cbs=cbs)
    ctx_len = jnp.asarray([24, 32], jnp.int32)
    rng = np.random.RandomState(3)
    x_emb = jnp.take(
        params["wte"][0],
        jnp.asarray(rng.randint(0, cfg.n_in_vocab, (B, 64)), jnp.int32),
        axis=0,
    )
    subs_w = jax.vmap(
        lambda k: jax.random.split(k, sws)
    )(jax.vmap(jax.random.PRNGKey)(jnp.asarray([3, 9]))).swapaxes(0, 1)

    def prefill():
        kc, vc = _mk_quant_cache_batched(cfg, B)
        return jax.vmap(
            lambda x, k, v, cl: gpt.prefill(cfg, params, x, k, v, cl),
            in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
        )(x_emb, kc, vc, ctx_len)

    # scan reference: batched single-step kernel on the int8 cache
    logits, kc, vc = prefill()
    ref = []
    for j in range(sws):
        base = svs + (0 if j % 2 == 0 else cbs)
        toks = base + jnp.asarray([
            int(sampling.sample(
                subs_w[j, b], logits[b, base:base + cbs], temp, 0, 0.0
            )[0])
            for b in range(B)
        ], jnp.int32)
        logits, kc, vc = kdec.decode_step_fused_batched(
            cfg, pp, toks, kc, vc, ctx_len + j,
            lm_window=lmw, interpret=True,
        )
        ref.append(np.asarray(toks))
    ref = np.stack(ref, axis=1)  # (B, sws)

    logits0, kc, vc = prefill()
    out, okc, ovc = kwin.coarse_window_fused_batched(
        cfg, pp, logits0, kc, vc, ctx_len, jnp.int32(0), subs_w,
        sws=sws, temp=temp, semantic_vocab_size=svs, codebook_size=cbs,
        lm_window=lmw, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert isinstance(okc, dict) and okc["q"].dtype == jnp.int8


def test_semantic_kernel_int8_kv_batched_matches_scan():
    """Batched semantic chunk kernel on the int8 KV cache vs the stepped
    batched kernel: bit-equal tokens and stop flags."""
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.ops import sampling

    cfg = gpt.GPTConfig(n_layer=2, n_head=2, n_embd=128, block_size=512,
                        n_in_vocab=300, n_out_vocab=200, bias=True)
    svs, K, ctx0, temp, minp = 150, 6, 24, 0.7, 1.0
    B = 2
    params = gpt.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    pp = kdec.prepare_decode_params(cfg, params)
    pp = ksem.prepare_semantic_params(cfg, pp)
    rng = np.random.RandomState(5)
    x_emb = jnp.take(
        params["wte"][0],
        jnp.asarray(rng.randint(0, cfg.n_in_vocab, (B, ctx0)), jnp.int32),
        axis=0,
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray([5, 12]))
    subs_over = jax.vmap(lambda k: jax.random.split(k, K))(keys)

    def prefill():
        kc, vc = _mk_quant_cache_batched(cfg, B)
        return jax.vmap(
            lambda x, k, v: gpt.prefill(
                cfg, params, x, k, v, jnp.int32(ctx0)
            ),
            in_axes=(0, 1, 1), out_axes=(0, 1, 1),
        )(x_emb, kc, vc)

    logits, kc, vc = prefill()
    ref_t, ref_f = [], []
    for g in range(K):
        toks, flags = [], []
        for b in range(B):
            tok, eos_p = sampling.sample(
                subs_over[b, g], logits[b], temp, 0, 0.0
            )
            toks.append(int(tok))
            flags.append(int(bool(tok == svs) or bool(eos_p >= minp)))
        ref_t.append(toks)
        ref_f.append(flags)
        logits, kc, vc = kdec.decode_step_fused_batched(
            cfg, pp, jnp.asarray(toks, jnp.int32), kc, vc,
            jnp.full((B,), ctx0 + g, jnp.int32), interpret=True,
        )
    ref_t = np.asarray(ref_t).T
    ref_f = np.asarray(ref_f).T

    gum = ksem.make_gumbel_rows_batched(
        jax.vmap(lambda k: jax.random.split(k, K + K))(keys),
        jnp.int32(0), K, cfg.n_out_vocab, kdec._v_pad(cfg), temp,
    )
    logits0, kc, vc = prefill()
    toks, flags, _, okc, _ = ksem.semantic_chunk_fused_batched(
        cfg, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
        gum, jnp.float32(minp), K=K, temp=temp,
        semantic_vocab_size=svs, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), ref_t)
    np.testing.assert_array_equal(np.asarray(flags), ref_f)
    assert isinstance(okc, dict) and okc["q"].dtype == jnp.int8
