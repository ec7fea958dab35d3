"""Dynamic-layer kernels (BARK_TPU_DYN_LAYERS=1) vs the default unrolled
kernels: bit-identical tokens, flags and caches.

The dyn variants run the transformer layer loop as a lax.fori_loop over
blocks of kv_slots layers (decode._dense_layer_stack_dyn +
_tile_stream_dyn) instead of a Python unroll — same tile order, same f32
math, ~L-fold smaller Mosaic program. The point is COMPILE time: kernel
compiles through the remote helper dominate cold start (the bark-large
dense kernel set took ~37 min, r4), and program size scales with the
unrolled layer count. Interpret mode on CPU here; hardware legality of
the dynamic-index primitives is probed by tools/tpu_mosaic_probe.py
P4-P6 and token-gated on chip by tools/tpu_check.py.

These configs use n_layer=4 with kv_slots=2 so the fori_loop runs TWO
blocks: cross-block weight prefetch, the lm-region boundary prefetch
under pl.when(l+1 == L), and the traced-index KV slab stream all fire.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.kernels import decode as kdec
from bark_tpu.kernels import semantic as ksem
from bark_tpu.kernels import window as kwin
from bark_tpu.models import gpt

CFG = gpt.GPTConfig(
    n_layer=4,
    n_head=2,
    n_embd=128,
    block_size=512,
    n_in_vocab=300,
    n_out_vocab=200,
    bias=True,
)
SVS, CBS = 32, 64
LMW = (SVS, SVS + 2 * CBS)
SWS = 6
K = 6
SEM_SVS = 150  # semantic stop token < n_out_vocab


def _params():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    key = jax.random.PRNGKey(9)
    params["blocks"] = {
        k: (
            v + 0.01 * jax.random.normal(jax.random.fold_in(key, i), v.shape)
            if k.endswith("_b")
            else v
        )
        for i, (k, v) in enumerate(sorted(params["blocks"].items()))
    }
    return params


def _prefill(pp, x_emb, ctx_len):
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    return gpt.prefill(CFG, pp, x_emb, kc, vc, jnp.int32(ctx_len))


def test_window_dense_dyn_matches_default(monkeypatch):
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1")
    params = _params()
    pp = kdec.prepare_decode_params(CFG, params, lm_window=LMW)
    pp = kwin.prepare_window_params(CFG, pp, svs=SVS, cbs=CBS)
    assert "_lp" in pp  # the dyn path is actually armed

    ctx_len = 40
    ids = (jnp.arange(CFG.block_size, dtype=jnp.int32) * 7) % CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    subs = jax.random.split(jax.random.PRNGKey(5), SWS)

    def run():
        logits0, kc, vc = _prefill(pp, x_emb, ctx_len)
        return kwin.coarse_window_fused(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx_len), jnp.int32(0),
            subs, sws=SWS, temp=0.7, semantic_vocab_size=SVS,
            codebook_size=CBS, lm_window=LMW, interpret=True,
        )

    d_toks, d_kc, d_vc = run()
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "0")
    r_toks, r_kc, r_vc = run()

    np.testing.assert_array_equal(np.asarray(d_toks), np.asarray(r_toks))
    # caches to float tolerance only: in interpret mode XLA CPU compiles
    # the fori_loop body with different fusion/contraction choices than
    # the unrolled straight-line code (~1 ulp); on hardware the gate
    # (tools/tpu_check.py check_dyn_layers) holds tokens bit-equal
    np.testing.assert_allclose(
        np.asarray(d_kc), np.asarray(r_kc), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_vc), np.asarray(r_vc), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("scalar_embed", [False, True])
def test_semantic_dense_dyn_matches_default(monkeypatch, scalar_embed):
    """scalar_embed=True: embed outside the stream (p0 == 0);
    False: wte tiles lead the stream (p0 == nt_wte) — both stream
    layouts of the dyn schedule."""
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1")
    params = _params()
    pp = kdec.prepare_decode_params(CFG, params)
    pp = ksem.prepare_semantic_params(CFG, pp)
    assert "_lp" in pp

    ctx0, temp, min_eos_p = 40, 0.7, 0.006
    ids = (jnp.arange(ctx0, dtype=jnp.int32) * 13) % CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    key = jax.random.PRNGKey(5)
    gum = ksem.make_gumbel_rows(
        key, K, CFG.n_out_vocab, kdec._v_pad(CFG), temp
    )

    def run():
        logits0, kc, vc = _prefill(pp, x_emb, ctx0)
        return ksem.semantic_chunk_fused(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(min_eos_p), K=K, temp=temp,
            semantic_vocab_size=SEM_SVS, scalar_embed=scalar_embed,
            interpret=True,
        )

    d = run()
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "0")
    r = run()
    _assert_same_outputs(d, r)


def _assert_same_outputs(d, r):
    """(toks, flags, logits_out, kc, vc): integer outputs bit-equal,
    float outputs to tolerance (interpret-mode loop-vs-unrolled fusion
    wobble, see test_window_dense_dyn_matches_default)."""
    for a, b in zip(d, r):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "i":
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_prefill_dyn_matches_default(monkeypatch):
    """Dyn prefill (_lane_layers_dyn + _stream_dyn): fori_loop over
    layers, K/V slab write-outs at the traced index (probe P7)."""
    from bark_tpu.kernels import prefill as kpre

    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1")
    params = _params()
    pp = kdec.prepare_decode_params(CFG, params)
    pp = kpre.prepare_prefill_params(CFG, pp)
    assert "_lp" in pp
    assert kpre.supports_fused_prefill(CFG, 40)

    ids = (jnp.arange(40, dtype=jnp.int32) * 11) % CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)

    def run():
        kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
        return kpre.prefill_fused(
            CFG, pp, x_emb, kc, vc, jnp.int32(40), interpret=True
        )

    d_log, d_kc, d_vc = run()
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "0")
    r_log, r_kc, r_vc = run()
    np.testing.assert_allclose(
        np.asarray(d_log), np.asarray(r_log), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_kc), np.asarray(r_kc), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_vc), np.asarray(r_vc), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("kv", ["bf16", "int8"])
def test_window_batched_dyn_matches_default(monkeypatch, kv):
    """Batched dyn window kernel: per-lane loop inside a traced-layer
    fori_loop — static slab slots (kv_slots | B), per-lane write-backs at
    the traced index (probe P8), and with kv=int8 the (L, B, S) scale
    state read/written at the traced leading index."""
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1")
    params = _params()
    pp = kdec.prepare_decode_params(CFG, params, lm_window=LMW)
    pp = kwin.prepare_window_params(CFG, pp, svs=SVS, cbs=CBS)
    assert "_lp" in pp

    B = 2
    ctx_len = jnp.asarray([40, 48], jnp.int32)
    ids = (jnp.arange(CFG.block_size, dtype=jnp.int32) * 7) % CFG.n_in_vocab
    x_emb = jnp.broadcast_to(
        jnp.take(params["wte"][0], ids, axis=0),
        (B, CFG.block_size, CFG.n_embd),
    )
    subs_w = jax.vmap(lambda k: jax.random.split(k, SWS))(
        jax.vmap(jax.random.PRNGKey)(jnp.asarray([3, 9]))
    ).swapaxes(0, 1)

    def run():
        kc, vc = gpt.init_kv_cache(
            CFG, dtype=jnp.float32, batch=B, quant=(kv == "int8")
        )
        logits0, kc, vc = jax.vmap(
            lambda x, k, v, cl: gpt.prefill(CFG, pp, x, k, v, cl),
            in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
        )(x_emb, kc, vc, ctx_len)
        toks, kc, vc = kwin.coarse_window_fused_batched(
            CFG, pp, logits0, kc, vc, ctx_len, jnp.int32(0), subs_w,
            sws=SWS, temp=0.7, semantic_vocab_size=SVS, codebook_size=CBS,
            lm_window=LMW, interpret=True,
        )
        return np.asarray(toks)

    d = run()
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "0")
    r = run()
    np.testing.assert_array_equal(d, r)


def test_semantic_batched_dyn_matches_default(monkeypatch):
    """Batched dyn semantic chunk: shared n_past, one strided (B, 8, D)
    write-back per layer at the traced index."""
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1")
    params = _params()
    pp = kdec.prepare_decode_params(CFG, params)
    pp = ksem.prepare_semantic_params(CFG, pp)
    assert "_lp" in pp

    B, ctx0, temp = 2, 40, 0.7
    B8 = 8
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray([5, 11]))
    subs_over = jax.vmap(lambda k: jax.random.split(k, K))(keys)
    gum = ksem.make_gumbel_rows_batched(
        subs_over, jnp.int32(0), K, CFG.n_out_vocab, kdec._v_pad(CFG), temp
    )
    assert gum.shape == (K * B8, kdec._v_pad(CFG))
    ids = (jnp.arange(ctx0, dtype=jnp.int32) * 13) % CFG.n_in_vocab
    x_emb = jnp.broadcast_to(
        jnp.take(params["wte"][0], ids, axis=0), (B, ctx0, CFG.n_embd)
    )

    def run():
        kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32, batch=B)
        logits0, kc, vc = jax.vmap(
            lambda x, k, v: gpt.prefill(CFG, pp, x, k, v, jnp.int32(ctx0)),
            in_axes=(0, 1, 1), out_axes=(0, 1, 1),
        )(x_emb, kc, vc)
        toks, flags, lout, _, _ = ksem.semantic_chunk_fused_batched(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(1.0), K=K, temp=temp,
            semantic_vocab_size=SEM_SVS, interpret=True,
        )
        return np.asarray(toks), np.asarray(flags), np.asarray(lout)

    d = run()
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "0")
    r = run()
    _assert_same_outputs(d, r)


def test_semantic_quant_dyn_matches_default(monkeypatch):
    """Packed q8_0 through the dyn stream (scale blocks ride the traced
    layer index too; wte rows on the dense side ring)."""
    from bark_tpu.io import ggml
    from tests.test_semantic_kernel import _quant_setup

    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1")
    cfg, pp, dense = _quant_setup(ggml.GGMLType.Q8_0)
    assert "_lp" in pp

    ctx0, temp = 40, 0.7
    key = jax.random.PRNGKey(5)
    gum = ksem.make_gumbel_rows(key, K, cfg.n_out_vocab, kdec._v_pad(cfg), temp)
    ids = (jnp.arange(ctx0, dtype=jnp.int32) * 13) % cfg.n_in_vocab
    x_emb = jnp.take(dense["wte"][0], ids, axis=0)

    def run():
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
        logits0, kc, vc = gpt.prefill(
            cfg, dense, x_emb, kc, vc, jnp.int32(ctx0)
        )
        return ksem.semantic_chunk_fused(
            cfg, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(1.0), K=K, temp=temp,
            semantic_vocab_size=SEM_SVS, quant=True, interpret=True,
        )

    d = run()
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "0")
    r = run()
    _assert_same_outputs(d, r)


def test_window_kv8_dyn_matches_default(monkeypatch):
    """int8-KV single-lane window kernel under dyn layers (bark-large's
    default serving path: --kv int8 + auto-dyn at L>=24): tokens equal to
    the unrolled kernel on the same quantized cache; the (L, 1, S) scale
    refs are read/written at a TRACED layer index in the dyn stack."""
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1")
    params = _params()
    pp = kdec.prepare_decode_params(CFG, params, lm_window=LMW)
    pp = kwin.prepare_window_params(CFG, pp, svs=SVS, cbs=CBS)
    assert "_lp" in pp

    ctx_len = 40
    ids = (jnp.arange(CFG.block_size, dtype=jnp.int32) * 7) % CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    subs = jax.random.split(jax.random.PRNGKey(5), SWS)

    def run():
        kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32, quant=True)
        logits0, kc, vc = gpt.prefill(
            CFG, pp, x_emb, kc, vc, jnp.int32(ctx_len)
        )
        return kwin.coarse_window_fused(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx_len), jnp.int32(0),
            subs, sws=SWS, temp=0.7, semantic_vocab_size=SVS,
            codebook_size=CBS, lm_window=LMW, interpret=True,
        )

    d_toks, d_kc, d_vc = run()
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "0")
    r_toks, r_kc, r_vc = run()

    np.testing.assert_array_equal(np.asarray(d_toks), np.asarray(r_toks))
    # int8 payloads may differ by the same ~1-ulp interpret-mode fusion
    # caveat as the dense caches above (the pre-quantization float wiggles
    # across a rounding boundary); scales to float tolerance
    np.testing.assert_allclose(
        np.asarray(d_kc["s"]), np.asarray(r_kc["s"]), rtol=2e-5, atol=2e-7
    )
    np.testing.assert_allclose(
        np.asarray(d_vc["s"]), np.asarray(r_vc["s"]), rtol=2e-5, atol=2e-7
    )


def test_semantic_kv8_dyn_matches_default(monkeypatch):
    """int8-KV semantic chunk kernel under dyn layers vs unrolled."""
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1")
    params = _params()
    pp = kdec.prepare_decode_params(CFG, params)
    pp = ksem.prepare_semantic_params(CFG, pp)
    assert "_lp" in pp

    ctx0 = 40
    ids = (jnp.arange(CFG.block_size, dtype=jnp.int32) * 7) % CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    key = jax.random.PRNGKey(5)
    gum = ksem.make_gumbel_rows(
        key, K, CFG.n_out_vocab, kdec._v_pad(CFG), 0.7
    )

    def run():
        kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32, quant=True)
        logits0, kc, vc = gpt.prefill(
            CFG, pp, x_emb, kc, vc, jnp.int32(ctx0)
        )
        toks, flags, lout, _, _ = ksem.semantic_chunk_fused(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(1.0), K=K, temp=0.7,
            semantic_vocab_size=SEM_SVS, interpret=True,
        )
        return np.asarray(toks), np.asarray(flags), np.asarray(lout)

    d_toks, d_flags, _ = run()
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "0")
    r_toks, r_flags, _ = run()
    np.testing.assert_array_equal(d_toks, r_toks)
    np.testing.assert_array_equal(d_flags, r_flags)
