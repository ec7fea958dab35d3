"""Whole-window coarse kernel vs the scan-of-single-step-kernel path.

Interpreter mode on CPU. The contract is BIT-EXACT token equality under
the same pre-split step keys: the window kernel's in-kernel sampler is
argmax(rel/temp + gumbel(k)) on the same floats jax.random.categorical
uses, and its layer math mirrors the single-step kernel op-for-op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.kernels import decode as kdec
from bark_tpu.kernels import window as kwin
from bark_tpu.models import gpt
from bark_tpu.ops import sampling

CFG = gpt.GPTConfig(
    n_layer=2,
    n_head=2,
    n_embd=128,
    block_size=512,
    n_in_vocab=300,
    n_out_vocab=200,
    bias=True,
)
SVS, CBS = 32, 64  # token window [32, 160), lm tiles (0, 2)
LMW = (SVS, SVS + 2 * CBS)
SWS = 10


@pytest.fixture(scope="module")
def setup():
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
    pp = kdec.prepare_decode_params(CFG, params, lm_window=LMW)
    pp = kwin.prepare_window_params(CFG, pp, svs=SVS, cbs=CBS)
    rng = np.random.RandomState(3)
    ids = jnp.asarray(
        rng.randint(0, CFG.n_in_vocab, size=CFG.block_size).astype(np.int32)
    )
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    return pp, x_emb


def _prefill(pp, x_emb, ctx_len):
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    return gpt.prefill(CFG, pp, x_emb, kc, vc, jnp.int32(ctx_len))


def _ref_window(pp, logits0, kc, vc, ctx_len, step_idx0, subs, temp):
    """The scan path: sample (pre-split keys) + single-step fused kernel,
    mirroring make_coarse_window_program's step."""
    logits, toks = logits0, []
    for j in range(SWS):
        is_major = (step_idx0 + j) % 2 == 0
        base = SVS + (0 if is_major else CBS)
        rel = jax.lax.dynamic_slice(logits, (base,), (CBS,))
        tok_rel, _ = sampling.sample(subs[j], rel, temp, 0, 0.0)
        tok = base + int(tok_rel)
        logits, kc, vc = kdec.decode_step_fused(
            CFG, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx_len + j),
            lm_window=LMW, interpret=True,
        )
        toks.append(tok)
    return toks, kc, vc


@pytest.mark.parametrize("temp,step_idx0", [(0.7, 0), (0.7, 1), (0.0, 0)])
def test_window_kernel_matches_scan(setup, temp, step_idx0):
    pp, x_emb = setup
    ctx_len = 40
    key = jax.random.PRNGKey(5)
    subs = jax.random.split(key, SWS)

    logits0, kc, vc = _prefill(pp, x_emb, ctx_len)
    ref, rkc, rvc = _ref_window(
        pp, logits0, kc, vc, ctx_len, step_idx0, subs, temp
    )

    logits0, kc, vc = _prefill(pp, x_emb, ctx_len)
    toks, okc, ovc = kwin.coarse_window_fused(
        CFG, pp, logits0, kc, vc,
        jnp.int32(ctx_len), jnp.int32(step_idx0), subs,
        sws=SWS, temp=temp, semantic_vocab_size=SVS, codebook_size=CBS,
        lm_window=LMW, interpret=True,
    )
    assert np.asarray(toks).tolist() == ref
    # the written cache rows must agree too (rows ctx_len..ctx_len+SWS)
    rows = slice(ctx_len, ctx_len + SWS)
    np.testing.assert_allclose(
        np.asarray(okc)[:, rows], np.asarray(rkc)[:, rows],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ovc)[:, rows], np.asarray(rvc)[:, rows],
        rtol=2e-5, atol=2e-5,
    )


def test_stage_program_window_on_off(setup, monkeypatch):
    """The fused coarse stage with the window kernel must produce the
    same codes as with it disabled (scan of single-step kernels)."""
    from bark_tpu.params import BarkContextParams
    from bark_tpu.pipeline import coarse as coarse_pipe

    pp, _ = setup
    p = BarkContextParams(
        semantic_vocab_size=SVS, codebook_size=CBS,
        sliding_window_size=SWS, max_coarse_history=16,
        # defaults index past the tiny 300-row wte: jnp.take fills NaN
        coarse_semantic_pad_token=290, coarse_infer_token=292,
    )
    fn = kdec.select_decode_fn(CFG, use_pallas=True, lm_window=LMW)
    sem_buf = (jnp.arange(64, dtype=jnp.int32) * 7) % SVS
    args = (
        pp, sem_buf, jnp.int32(40), jax.random.PRNGKey(2),
        jnp.zeros((max(1, 16 * 2 // 3),), jnp.int32), jnp.int32(0),
        jnp.zeros((16,), jnp.int32), jnp.int32(0),
    )

    def build():
        return coarse_pipe.make_coarse_stage_program(
            CFG, p, ctx_size=CFG.block_size, max_semantic=64, decode_fn=fn,
        )

    on, n_on = build()(*args)
    monkeypatch.setenv("BARK_TPU_WINDOW_KERNEL", "0")
    off, n_off = build()(*args)
    assert int(n_on) == int(n_off)
    n_frames = int(n_on) // p.n_coarse_codebooks
    assert n_frames > SWS // 2  # multiple windows exercised
    assert np.array_equal(
        np.asarray(on)[:n_frames], np.asarray(off)[:n_frames]
    )


def test_batched_stage_window_on_off(setup, monkeypatch):
    """The batched fused coarse stage with the batched window kernel must
    produce the same per-lane codes as with it disabled (scan of batched
    single-step kernels), including per-lane ctx_len divergence from a
    preloaded coarse history."""
    from bark_tpu.params import BarkContextParams
    from bark_tpu.pipeline import coarse as coarse_pipe

    pp, _ = setup
    B = 2
    p = BarkContextParams(
        semantic_vocab_size=SVS, codebook_size=CBS,
        sliding_window_size=SWS, max_coarse_history=16,
        coarse_semantic_pad_token=290, coarse_infer_token=292,
    )
    fn = kdec.select_decode_fn_batched(CFG, use_pallas=True, lm_window=LMW)
    rng = np.random.RandomState(7)
    sem_buf = jnp.asarray(
        rng.randint(0, SVS, size=(B, 64)).astype(np.int32)
    )
    # lane 1 carries a coarse history -> different ctx_len per lane
    ch = jnp.zeros((B, 16), jnp.int32).at[1, :8].set(
        SVS + jnp.asarray(rng.randint(0, CBS, size=8).astype(np.int32))
    )
    args = (
        pp, sem_buf,
        jnp.asarray([40, 52], jnp.int32),
        jax.vmap(jax.random.PRNGKey)(jnp.asarray([2, 11])),
        jnp.zeros((B, max(1, 16 * 2 // 3)), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        ch, jnp.asarray([0, 8], jnp.int32),
    )

    def build():
        return coarse_pipe.make_coarse_stage_program_batched(
            CFG, p, batch=B, ctx_size=CFG.block_size, max_semantic=64,
            decode_fn=fn,
        )

    on, n_on = build()(*args)
    monkeypatch.setenv("BARK_TPU_WINDOW_KERNEL_B", "0")
    off, n_off = build()(*args)
    np.testing.assert_array_equal(np.asarray(n_on), np.asarray(n_off))
    for b in range(B):
        n_frames = int(np.asarray(n_on)[b]) // p.n_coarse_codebooks
        assert n_frames > SWS // 2
        np.testing.assert_array_equal(
            np.asarray(on)[b, :n_frames], np.asarray(off)[b, :n_frames]
        )


def test_supports_gate(monkeypatch):
    fn = kdec.select_decode_fn(CFG, use_pallas=True, lm_window=LMW)
    assert kwin.supports_window_kernel(CFG, fn)
    assert not kwin.supports_window_kernel(
        CFG, kdec.select_decode_fn(CFG, use_pallas=True)  # no lm_window
    )
    assert not kwin.supports_window_kernel(CFG, fn, top_k=50)
    # int8-KV is in-envelope since r5 (scales ride as VMEM state)
    assert kwin.supports_window_kernel(CFG, fn, kv_quant=True)
    # packed-quantized decode is in-envelope since r4
    qfn = kdec.select_decode_fn(
        CFG, use_pallas=True, quant=True, lm_window=LMW
    )
    assert kwin.supports_window_kernel(CFG, qfn)
    monkeypatch.setenv("BARK_TPU_WINDOW_KERNEL", "0")
    assert not kwin.supports_window_kernel(CFG, fn)


def _quant_setup(qt):
    """Qpack + densified twin for the packed window kernel tests."""
    from bark_tpu.io import loader
    from tests.test_quant_decode import _section

    sec = _section(qt, block_size=CFG.block_size)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    dense = loader.dense_from_qpack(cfg, qpack)
    pp = kdec.prepare_decode_params(cfg, qpack, quant=True, lm_window=LMW)
    pp = kwin.prepare_window_params(
        cfg, pp, svs=SVS, cbs=CBS, dense_wte=dense["wte"][0]
    )
    return cfg, pp, dense


@pytest.mark.parametrize("qt_name", ["Q8_0", "Q5_1"])
def test_window_kernel_quant_matches_scan(qt_name):
    """Packed weights through the whole-window kernel: bit-equal tokens to
    the scan-of-single-step-QUANT-kernel path (same unified quant tile
    stream; the wte window rides the dense side ring)."""
    from bark_tpu.io import ggml

    cfg, pp, dense = _quant_setup(getattr(ggml.GGMLType, qt_name))
    ctx_len, temp, step_idx0 = 40, 0.7, 0
    key = jax.random.PRNGKey(5)
    subs = jax.random.split(key, SWS)
    ids = (jnp.arange(ctx_len, dtype=jnp.int32) * 11) % cfg.n_in_vocab
    x_emb = jnp.take(dense["wte"][0], ids, axis=0)

    def prefill():
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
        return gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(ctx_len))

    logits0, kc, vc = prefill()
    logits, ref = logits0, []
    for j in range(SWS):
        base = SVS + (0 if (step_idx0 + j) % 2 == 0 else CBS)
        rel = jax.lax.dynamic_slice(logits, (base,), (CBS,))
        tok_rel, _ = sampling.sample(subs[j], rel, temp, 0, 0.0)
        tok = base + int(tok_rel)
        logits, kc, vc = kdec.decode_step_fused(
            cfg, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx_len + j),
            quant=True, lm_window=LMW, interpret=True,
        )
        ref.append(tok)

    logits0, kc, vc = prefill()
    toks, _, _ = kwin.coarse_window_fused(
        cfg, pp, logits0, kc, vc,
        jnp.int32(ctx_len), jnp.int32(step_idx0), subs,
        sws=SWS, temp=temp, semantic_vocab_size=SVS, codebook_size=CBS,
        lm_window=LMW, quant=True, interpret=True,
    )
    assert np.asarray(toks).tolist() == ref


def test_stage_program_quant_window_on_off(monkeypatch):
    """The fused coarse stage serving a QPACK must produce the same codes
    with the packed window kernel as with it disabled (scan of packed
    single-step kernels)."""
    from bark_tpu.io import ggml, loader
    from bark_tpu.params import BarkContextParams
    from bark_tpu.pipeline import coarse as coarse_pipe
    from tests.test_quant_decode import _section

    sec = _section(ggml.GGMLType.Q8_0, block_size=CFG.block_size)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    p = BarkContextParams(
        semantic_vocab_size=SVS, codebook_size=CBS,
        sliding_window_size=SWS, max_coarse_history=16,
        coarse_semantic_pad_token=290, coarse_infer_token=292,
    )
    fn = kdec.select_decode_fn(
        cfg, use_pallas=True, quant=True, lm_window=LMW
    )
    densify = lambda q: loader.dense_from_qpack(cfg, q)  # noqa: E731
    sem_buf = (jnp.arange(64, dtype=jnp.int32) * 7) % SVS
    args = (
        qpack, sem_buf, jnp.int32(40), jax.random.PRNGKey(2),
        jnp.zeros((max(1, 16 * 2 // 3),), jnp.int32), jnp.int32(0),
        jnp.zeros((16,), jnp.int32), jnp.int32(0),
    )

    def build():
        return coarse_pipe.make_coarse_stage_program(
            cfg, p, ctx_size=cfg.block_size, max_semantic=64, decode_fn=fn,
            densify=densify,
        )

    on, n_on = build()(*args)
    monkeypatch.setenv("BARK_TPU_WINDOW_KERNEL", "0")
    off, n_off = build()(*args)
    assert int(n_on) == int(n_off)
    n_frames = int(n_on) // p.n_coarse_codebooks
    assert n_frames > SWS // 2
    np.testing.assert_array_equal(
        np.asarray(on)[:n_frames], np.asarray(off)[:n_frames]
    )


def test_window_kernel_quant_batched_matches_single():
    """Batched packed window kernel: each lane bit-equal to the single-lane
    packed window kernel under that lane's keys and ctx_len."""
    from bark_tpu.io import ggml

    cfg, pp, dense = _quant_setup(ggml.GGMLType.Q8_0)
    B, temp, step_idx0 = 2, 0.7, 0
    ctx_lens = [40, 48]
    subs_w = jnp.stack([
        jax.random.split(jax.random.PRNGKey(5 + b), SWS) for b in range(B)
    ], axis=1)  # (sws, B, 2)

    per_lane, l0s, kcs, vcs = [], [], [], []
    for b in range(B):
        ids = (jnp.arange(ctx_lens[b], dtype=jnp.int32) * (7 + b)) \
            % cfg.n_in_vocab
        x_emb = jnp.take(dense["wte"][0], ids, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
        l0, kc, vc = gpt.prefill(
            cfg, dense, x_emb, kc, vc, jnp.int32(ctx_lens[b])
        )
        toks, _, _ = kwin.coarse_window_fused(
            cfg, pp, l0, kc, vc,
            jnp.int32(ctx_lens[b]), jnp.int32(step_idx0), subs_w[:, b],
            sws=SWS, temp=temp, semantic_vocab_size=SVS, codebook_size=CBS,
            lm_window=LMW, quant=True, interpret=True,
        )
        per_lane.append(np.asarray(toks))
        l0s.append(l0)
        kcs.append(kc)
        vcs.append(vc)

    kcb = jnp.stack(kcs, axis=1)  # (L, B, S, D)
    vcb = jnp.stack(vcs, axis=1)
    toks_b, _, _ = kwin.coarse_window_fused_batched(
        cfg, pp, jnp.stack(l0s), kcb, vcb,
        jnp.asarray(ctx_lens, jnp.int32), jnp.int32(step_idx0), subs_w,
        sws=SWS, temp=temp, semantic_vocab_size=SVS, codebook_size=CBS,
        lm_window=LMW, quant=True, interpret=True,
    )
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(toks_b)[b], per_lane[b])


def _prefill_q(pp, x_emb, ctx_len):
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32, quant=True)
    return gpt.prefill(CFG, pp, x_emb, kc, vc, jnp.int32(ctx_len))


@pytest.mark.parametrize("temp", [0.7, 0.0])
def test_window_kernel_kv8_matches_scan(setup, temp):
    """int8-KV whole-window kernel vs scan-of-decode-kernel (both on the
    quantized cache): tokens bit-equal, written cache rows + row scales
    identical. This is the single-lane path bark-large serves with
    --kv int8 (before r5 it fell back to the stepped scan)."""
    pp, x_emb = setup
    ctx_len = 40
    subs = jax.random.split(jax.random.PRNGKey(5), SWS)

    logits0, kc, vc = _prefill_q(pp, x_emb, ctx_len)
    ref, rkc, rvc = _ref_window(
        pp, logits0, kc, vc, ctx_len, 0, subs, temp
    )

    logits0, kc, vc = _prefill_q(pp, x_emb, ctx_len)
    toks, okc, ovc = kwin.coarse_window_fused(
        CFG, pp, logits0, kc, vc,
        jnp.int32(ctx_len), jnp.int32(0), subs,
        sws=SWS, temp=temp, semantic_vocab_size=SVS, codebook_size=CBS,
        lm_window=LMW, interpret=True,
    )
    assert np.asarray(toks).tolist() == ref
    rows = slice(ctx_len, ctx_len + SWS)
    for o, r in ((okc, rkc), (ovc, rvc)):
        np.testing.assert_array_equal(
            np.asarray(o["q"])[:, rows], np.asarray(r["q"])[:, rows]
        )
        np.testing.assert_allclose(
            np.asarray(o["s"])[:, rows], np.asarray(r["s"])[:, rows],
            rtol=1e-6, atol=0,
        )


def test_stage_program_window_kv8_on_off(setup, monkeypatch):
    """The fused kv8 coarse stage with the window kernel vs disabled
    (stepped scan on the same quantized cache) — codes must be equal."""
    from bark_tpu.params import BarkContextParams
    from bark_tpu.pipeline import coarse as coarse_pipe

    pp, _ = setup
    p = BarkContextParams(
        semantic_vocab_size=SVS, codebook_size=CBS,
        sliding_window_size=SWS, max_coarse_history=16,
        coarse_semantic_pad_token=290, coarse_infer_token=292,
    )
    fn = kdec.select_decode_fn(CFG, use_pallas=True, lm_window=LMW)
    sem_buf = (jnp.arange(64, dtype=jnp.int32) * 7) % SVS
    args = (
        pp, sem_buf, jnp.int32(40), jax.random.PRNGKey(2),
        jnp.zeros((max(1, 16 * 2 // 3),), jnp.int32), jnp.int32(0),
        jnp.zeros((16,), jnp.int32), jnp.int32(0),
    )

    def build():
        return coarse_pipe.make_coarse_stage_program(
            CFG, p, ctx_size=CFG.block_size, max_semantic=64, decode_fn=fn,
            kv_quant=True,
        )

    on, n_on = build()(*args)
    monkeypatch.setenv("BARK_TPU_WINDOW_KERNEL", "0")
    off, n_off = build()(*args)
    assert int(n_on) == int(n_off)
    n_frames = int(n_on) // p.n_coarse_codebooks
    assert n_frames > SWS // 2
    assert np.array_equal(
        np.asarray(on)[:n_frames], np.asarray(off)[:n_frames]
    )
