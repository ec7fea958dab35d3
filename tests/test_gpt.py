"""GPT stage numerics vs the independent numpy oracle (tests/reference_gpt.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.models import gpt
from tests import reference_gpt as ref


def np_params(params):
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), params)


@pytest.fixture(scope="module")
def small():
    cfg = gpt.GPTConfig(
        n_layer=3, n_head=4, n_embd=32, block_size=64,
        n_in_vocab=700, n_out_vocab=50, n_lm_heads=1, n_wtes=1, bias=True,
    )
    key = jax.random.PRNGKey(0)
    params = gpt.init_params(cfg, key)
    # give the biases/norms non-trivial values so they are actually tested
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b = params["blocks"]
    L, D = cfg.n_layer, cfg.n_embd
    b["qkv_b"] = jax.random.normal(k1, (L, 3 * D)) * 0.05
    b["proj_b"] = jax.random.normal(k2, (L, D)) * 0.05
    b["ln1_g"] = 1.0 + jax.random.normal(k3, (L, D)) * 0.1
    b["ln1_b"] = jax.random.normal(k4, (L, D)) * 0.1
    return cfg, params


def test_prefill_matches_reference(small):
    cfg, params = small
    rng = np.random.RandomState(0)
    T = 17
    tokens = rng.randint(0, cfg.n_in_vocab, size=T).astype(np.int32)

    k_cache, v_cache = gpt.init_kv_cache(cfg)
    wte = params["wte"][0]
    x_emb = jnp.take(wte, jnp.asarray(tokens), axis=0)
    # pad to a static window of 32
    pad = 32 - T
    x_emb = jnp.concatenate([x_emb, jnp.zeros((pad, cfg.n_embd))], axis=0)
    logits, k_cache, v_cache = gpt.prefill(
        cfg, params, x_emb, k_cache, v_cache, jnp.int32(T)
    )

    want, ref_k, _ = ref.causal_forward(
        np_params(params), tokens, cfg.n_head
    )
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-3, atol=2e-3)
    # KV cache holds the same keys in slots [0, T); the cache keeps a flat
    # (L, S, D) feature axis, the reference a (L, T, H, hd) split
    np.testing.assert_allclose(
        np.asarray(k_cache)[:, :T],
        np.stack(ref_k).reshape(cfg.n_layer, T, cfg.n_embd),
        rtol=1e-3, atol=2e-3,
    )


def test_decode_matches_reference(small):
    cfg, params = small
    rng = np.random.RandomState(1)
    T = 9
    tokens = rng.randint(0, cfg.n_in_vocab, size=T + 3).astype(np.int32)
    npp = np_params(params)

    # oracle: prefill T then decode 3 single tokens with growing past
    want, pk, pv = ref.causal_forward(npp, tokens[:T], cfg.n_head)
    k_cache, v_cache = gpt.init_kv_cache(cfg)
    wte = params["wte"][0]
    x_emb = jnp.take(wte, jnp.asarray(tokens[:T]), axis=0)
    got, k_cache, v_cache = gpt.prefill(
        cfg, params, x_emb, k_cache, v_cache, jnp.int32(T)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-3)

    n_past = T
    for t in tokens[T:]:
        want, pk, pv = ref.causal_forward(
            npp, [t], cfg.n_head, past_k=pk, past_v=pv, n_past=n_past
        )
        got, k_cache, v_cache = gpt.decode_step(
            cfg, params, jnp.int32(t), k_cache, v_cache, jnp.int32(n_past)
        )
        n_past += 1
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-3, atol=2e-3
        )


def test_merged_prompt_prefill():
    # needs block_size >= 257 for the merged 513-token prompt
    cfg = gpt.GPTConfig(
        n_layer=2, n_head=2, n_embd=16, block_size=260,
        n_in_vocab=700, n_out_vocab=30, n_lm_heads=1, n_wtes=1, bias=False,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.RandomState(2)
    tokens513 = rng.randint(0, cfg.n_in_vocab, size=513).astype(np.int32)

    x_emb = gpt.embed_prompt_merged(cfg, params, jnp.asarray(tokens513))
    assert x_emb.shape == (257, cfg.n_embd)
    k_cache, v_cache = gpt.init_kv_cache(cfg)
    got, _, _ = gpt.prefill(
        cfg, params, x_emb, k_cache, v_cache, jnp.int32(257)
    )
    want, _, _ = ref.merged_prompt_forward(
        np_params(params), tokens513, cfg.n_head
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-3)


def test_padded_prefill_ignores_padding(small):
    """Right-padding the prefill window must not change the last-real-token
    logits (the coarse stage relies on this)."""
    cfg, params = small
    rng = np.random.RandomState(3)
    T = 13
    tokens = rng.randint(0, cfg.n_in_vocab, size=T).astype(np.int32)
    wte = params["wte"][0]

    def run(pad):
        x = jnp.take(wte, jnp.asarray(tokens), axis=0)
        if pad:
            x = jnp.concatenate([x, jnp.ones((pad, cfg.n_embd))], axis=0)
        kc, vc = gpt.init_kv_cache(cfg)
        lg, _, _ = gpt.prefill(cfg, params, x, kc, vc, jnp.int32(T))
        return np.asarray(lg)

    np.testing.assert_allclose(run(0), run(19), rtol=1e-5, atol=1e-5)


def test_fine_forward_matches_reference():
    cfg = gpt.GPTConfig(
        n_layer=2, n_head=2, n_embd=16, block_size=24,
        n_in_vocab=40, n_out_vocab=40, n_lm_heads=7, n_wtes=8, bias=True,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(5))
    rng = np.random.RandomState(4)
    T = 24
    tokens = rng.randint(0, cfg.n_in_vocab, size=(T, 8)).astype(np.int32)

    for nn in (2, 5, 7):
        got = gpt.fine_forward(cfg, params, jnp.asarray(tokens), nn)
        want = ref.fine_forward_ref(
            np_params(params), tokens, nn, cfg.n_head
        )
        assert got.shape == (T, cfg.n_out_vocab)
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-3, atol=2e-3
        )


def test_decode_jit_cache_donation(small):
    """decode_step must be jittable with donated caches (the pipeline donates
    them every step; shapes/dtypes must allow aliasing)."""
    cfg, params = small
    step = jax.jit(
        lambda p, t, kc, vc, n: gpt.decode_step(cfg, p, t, kc, vc, n),
        donate_argnums=(2, 3),
    )
    kc, vc = gpt.init_kv_cache(cfg)
    logits, kc, vc = step(params, jnp.int32(3), kc, vc, jnp.int32(0))
    logits2, kc, vc = step(params, jnp.int32(4), kc, vc, jnp.int32(1))
    assert np.isfinite(np.asarray(logits2)).all()


@pytest.mark.parametrize("n_valid", [5, 16, 33, 48, 64])
def test_prefill_chunked_equivalent(small, n_valid):
    """prefill_chunked must match the one-shot prefill on the logits and
    the cache slots [0, n_valid) to matmul-reassociation precision (XLA
    tiles a (chunk, D) dot differently from a (T, D) one — ulp-level
    deltas only; the coarse window programs rely on this)."""
    cfg, params = small
    rng = np.random.RandomState(7)
    T = cfg.block_size  # 64: chunk=16 -> 4 blocks
    tokens = rng.randint(0, cfg.n_in_vocab, size=T).astype(np.int32)
    x = jnp.take(params["wte"][0], jnp.asarray(tokens), axis=0)

    kc, vc = gpt.init_kv_cache(cfg)
    lg_f, kc_f, vc_f = gpt.prefill(cfg, params, x, kc, vc,
                                   jnp.int32(n_valid))
    kc, vc = gpt.init_kv_cache(cfg)
    lg_c, kc_c, vc_c = gpt.prefill_chunked(cfg, params, x, kc, vc,
                                           jnp.int32(n_valid), chunk=16)
    np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_c),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(kc_f)[:, :n_valid], np.asarray(kc_c)[:, :n_valid],
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(vc_f)[:, :n_valid], np.asarray(vc_c)[:, :n_valid],
        rtol=1e-6, atol=1e-6,
    )


def test_prefill_chunked_decode_continues(small):
    """Decode after a chunked prefill must match decode after a full
    prefill (pad-slot cache contents are never observable)."""
    cfg, params = small
    rng = np.random.RandomState(11)
    T, n_valid = cfg.block_size, 29
    tokens = rng.randint(0, cfg.n_in_vocab, size=T).astype(np.int32)
    x = jnp.take(params["wte"][0], jnp.asarray(tokens), axis=0)

    def chain(prefill_fn):
        kc, vc = gpt.init_kv_cache(cfg)
        lg, kc, vc = prefill_fn(x, kc, vc)
        toks = []
        tok = jnp.int32(3)
        for j in range(8):
            lg, kc, vc = gpt.decode_step(
                cfg, params, tok, kc, vc, jnp.int32(n_valid + j)
            )
            tok = jnp.argmax(lg).astype(jnp.int32) % cfg.n_in_vocab
            toks.append(int(tok))
        return toks

    full = chain(lambda x, k, v: gpt.prefill(
        cfg, params, x, k, v, jnp.int32(n_valid)))
    chunked = chain(lambda x, k, v: gpt.prefill_chunked(
        cfg, params, x, k, v, jnp.int32(n_valid), chunk=16))
    assert full == chunked
