"""Semantic chunk kernel vs the stepped single-step-kernel path.

Interpreter mode on CPU. The contract is BIT-EXACT token/flag equality
under the same pre-split step keys (see kernels/semantic.py): the in-kernel
sampler is argmax(logits/temp + gumbel(k)) on the same floats
jax.random.categorical uses, and the EOS probability mirrors
ops/sampling.sample's softmax-of-last-slot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.kernels import decode as kdec
from bark_tpu.kernels import semantic as ksem
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
SVS = 150  # the stop token; < n_out_vocab so sampling can hit it
K = 8


@pytest.fixture(scope="module")
def setup():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    pp = kdec.prepare_decode_params(CFG, params)
    pp = ksem.prepare_semantic_params(CFG, pp)
    rng = np.random.RandomState(3)
    ids = jnp.asarray(
        rng.randint(0, CFG.n_in_vocab, size=CFG.block_size).astype(np.int32)
    )
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    return pp, x_emb


def _prefill(pp, x_emb, ctx_len):
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    return gpt.prefill(CFG, pp, x_emb, kc, vc, jnp.int32(ctx_len))


def _ref_steps(pp, logits0, kc, vc, ctx0, count0, subs, temp, min_eos_p, n):
    """n steps of the stepped path with the chunk kernel's post-stop
    semantics (decode every step; flags recorded, nothing masked)."""
    logits, toks, flags = logits0, [], []
    for j in range(n):
        g = count0 + j
        tok, eos_p = sampling.sample(subs[g], logits, temp, 0, 0.0)
        stop = bool(tok == SVS) or bool(eos_p >= min_eos_p)
        toks.append(int(tok))
        flags.append(int(stop))
        n_past = min(ctx0 + g, CFG.block_size - 1)
        logits, kc, vc = kdec.decode_step_fused(
            CFG, pp, jnp.int32(tok), kc, vc, jnp.int32(n_past),
            interpret=True,
        )
    return toks, flags, logits, kc, vc


@pytest.mark.parametrize("temp,min_eos_p", [(0.7, 1.0), (0.7, 0.006), (0.0, 1.0)])
def test_chunk_matches_stepped(setup, temp, min_eos_p):
    pp, x_emb = setup
    ctx0 = 40
    key = jax.random.PRNGKey(5)
    max_steps = 2 * K
    subs = jax.random.split(key, max_steps)
    gum = ksem.make_gumbel_rows(
        key, max_steps, CFG.n_out_vocab, kdec._v_pad(CFG), temp
    )

    logits0, kc, vc = _prefill(pp, x_emb, ctx0)
    r_toks, r_flags, r_logits, rkc, rvc = _ref_steps(
        pp, logits0, kc, vc, ctx0, 0, subs, temp, min_eos_p, max_steps
    )

    logits0, kc, vc = _prefill(pp, x_emb, ctx0)
    o_toks, o_flags = [], []
    logits = logits0
    for count0 in (0, K):  # second chunk exercises a dynamic gumbel base
        toks, flags, logits, kc, vc = ksem.semantic_chunk_fused(
            CFG, pp, logits, kc, vc, jnp.int32(ctx0), jnp.int32(count0),
            gum, jnp.float32(min_eos_p), K=K, temp=temp,
            semantic_vocab_size=SVS, interpret=True,
        )
        o_toks += np.asarray(toks).tolist()
        o_flags += np.asarray(flags).tolist()

    assert o_toks == r_toks
    assert o_flags == r_flags
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(r_logits), rtol=2e-5, atol=2e-5
    )
    rows = slice(ctx0, ctx0 + max_steps)
    np.testing.assert_allclose(
        np.asarray(kc)[:, rows], np.asarray(rkc)[:, rows],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(vc)[:, rows], np.asarray(rvc)[:, rows],
        rtol=2e-5, atol=2e-5,
    )


def test_scalar_embed_matches_onehot(setup):
    """scalar_embed=True (SMEM-scalar-indexed 8-row wte DMA) must produce
    bit-identical tokens/flags/logits to the streamed one-hot embed."""
    pp, x_emb = setup
    ctx0, temp = 40, 0.7
    key = jax.random.PRNGKey(5)
    gum = ksem.make_gumbel_rows(
        key, K, CFG.n_out_vocab, kdec._v_pad(CFG), temp
    )
    outs = {}
    for scalar in (False, True):
        logits0, kc, vc = _prefill(pp, x_emb, ctx0)
        toks, flags, lout, _, _ = ksem.semantic_chunk_fused(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(1.0), K=K, temp=temp,
            semantic_vocab_size=SVS, scalar_embed=scalar, interpret=True,
        )
        outs[scalar] = (
            np.asarray(toks), np.asarray(flags), np.asarray(lout)
        )
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    if kdec._group_dots():
        # grouped-dot mode: the two embed layouts shift the tile ring's
        # phase, so a qkv/fc group can wrap the ring at different points
        # and split into different-width run dots. XLA CPU computes
        # different-N dots with ~1-ulp differences; on the MXU the
        # per-column K-order accumulation is fixed regardless of output
        # width, so hardware logits stay bit-equal (tools/tpu_check.py
        # check_att_flags gates tokens on chip).
        np.testing.assert_allclose(
            outs[True][2], outs[False][2], rtol=2e-5, atol=2e-5
        )
    else:
        np.testing.assert_array_equal(outs[True][2], outs[False][2])


@pytest.mark.parametrize("min_eos_p", [1.0, 0.006])
def test_while_variant_matches_fori(setup, min_eos_p):
    """use_while=True (in-kernel EOS while_loop, whole stage in one call)
    must match the fori chunk up to and including the first stop step;
    steps after it stay zero (the while exited)."""
    pp, x_emb = setup
    ctx0, temp = 40, 0.7
    key = jax.random.PRNGKey(5)
    gum = ksem.make_gumbel_rows(
        key, 2 * K, CFG.n_out_vocab, kdec._v_pad(CFG), temp
    )
    args = lambda: _prefill(pp, x_emb, ctx0)  # noqa: E731

    outs = {}
    for use_while in (False, True):
        logits0, kc, vc = args()
        toks, flags, lout, _, _ = ksem.semantic_chunk_fused(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(min_eos_p), K=2 * K, temp=temp,
            semantic_vocab_size=SVS, use_while=use_while, interpret=True,
        )
        outs[use_while] = (
            np.asarray(toks), np.asarray(flags), np.asarray(lout)
        )
    f_t, f_f, f_l = outs[False]
    w_t, w_f, w_l = outs[True]
    stops = np.nonzero(f_f)[0]
    upto = (stops[0] + 1) if len(stops) else 2 * K
    assert w_t[:upto].tolist() == f_t[:upto].tolist()
    assert w_f[:upto].tolist() == f_f[:upto].tolist()
    assert not w_t[upto:].any() and not w_f[upto:].any()
    if upto == 2 * K:  # no early exit: final logits identical too
        np.testing.assert_array_equal(w_l, f_l)
    if min_eos_p < 1.0:
        assert len(stops) > 0  # the EOS stop actually fired


@pytest.mark.parametrize("min_eos_p", [1.0, 0.006])
def test_stage_program_chunk_on_off(setup, monkeypatch, min_eos_p):
    """make_semantic_program with the chunk kernel must produce the same
    (tokens, count) as with it disabled (stepped while_loop), including
    the EOS early exit landing mid-chunk."""
    from bark_tpu.pipeline import semantic as sem_pipe

    pp, _ = setup
    monkeypatch.setenv("BARK_TPU_SEM_CHUNK", "4")
    fn = kdec.select_decode_fn(CFG, use_pallas=True)
    rng = np.random.RandomState(11)
    tokens513 = jnp.asarray(
        rng.randint(0, CFG.n_in_vocab, size=513).astype(np.int32)
    )
    args = (pp, tokens513, jax.random.PRNGKey(2), jnp.float32(min_eos_p))

    def build():
        return sem_pipe.make_semantic_program(
            CFG, temp=0.7, max_steps=18, semantic_vocab_size=SVS,
            decode_fn=fn,
        )

    out_on, n_on = build()(*args)
    monkeypatch.setenv("BARK_TPU_SEM_WHILE", "1")
    out_w, n_w = build()(*args)
    monkeypatch.setenv("BARK_TPU_SEM_WHILE", "0")
    monkeypatch.setenv("BARK_TPU_SEM_KERNEL", "0")
    out_off, n_off = build()(*args)
    assert int(n_on) == int(n_off) == int(n_w)
    if min_eos_p < 1.0:
        assert int(n_on) < 18  # the early exit actually fired
    np.testing.assert_array_equal(np.asarray(out_on), np.asarray(out_off))
    np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_off))


@pytest.mark.parametrize("min_eos_p", [1.0, 0.006])
def test_batched_stage_chunk_on_off(setup, monkeypatch, min_eos_p):
    """The batched semantic stage with the batched chunk kernel must
    produce the same per-lane (tokens, count) as with it disabled
    (stepped batched while_loop), with lanes stopping at different
    steps."""
    from bark_tpu.pipeline import semantic as sem_pipe

    pp, _ = setup
    B = 2
    monkeypatch.setenv("BARK_TPU_SEM_CHUNK", "4")
    fn = kdec.select_decode_fn_batched(CFG, use_pallas=True)
    rng = np.random.RandomState(13)
    tokens513 = jnp.asarray(
        rng.randint(0, CFG.n_in_vocab, size=(B, 513)).astype(np.int32)
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray([2, 9]))
    args = (pp, tokens513, keys, jnp.float32(min_eos_p))

    def build():
        return sem_pipe.make_semantic_program_batched(
            CFG, batch=B, temp=0.7, max_steps=18, semantic_vocab_size=SVS,
            decode_fn=fn,
        )

    out_on, n_on = build()(*args)
    monkeypatch.setenv("BARK_TPU_SEM_KERNEL_B", "0")
    out_off, n_off = build()(*args)
    np.testing.assert_array_equal(np.asarray(n_on), np.asarray(n_off))
    np.testing.assert_array_equal(np.asarray(out_on), np.asarray(out_off))
    if min_eos_p < 1.0:
        assert all(int(n) < 18 for n in np.asarray(n_on))


def _quant_setup(qt):
    """Qpack + densified twin for the packed semantic kernel tests."""
    from bark_tpu.io import loader
    from tests.test_quant_decode import _section

    sec = _section(qt, block_size=CFG.block_size)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    dense = loader.dense_from_qpack(cfg, qpack)
    pp = kdec.prepare_decode_params(cfg, qpack, quant=True)
    pp = ksem.prepare_semantic_params(cfg, pp, dense_wte=dense["wte"][0])
    return cfg, pp, dense


@pytest.mark.parametrize("qt_name", ["Q8_0", "Q4_K"])
def test_chunk_quant_matches_stepped(qt_name):
    """Packed weights through the chunk kernel: bit-equal tokens/flags to
    the stepped single-step-QUANT-kernel path (unified quant tile stream;
    the wte rows ride the dense side ring)."""
    from bark_tpu.io import ggml

    cfg, pp, dense = _quant_setup(getattr(ggml.GGMLType, qt_name))
    ctx0, temp, min_eos_p = 40, 0.7, 1.0
    key = jax.random.PRNGKey(5)
    subs = jax.random.split(key, K)
    gum = ksem.make_gumbel_rows(
        key, K, cfg.n_out_vocab, kdec._v_pad(cfg), temp
    )
    ids = (jnp.arange(ctx0, dtype=jnp.int32) * 13) % cfg.n_in_vocab
    x_emb = jnp.take(dense["wte"][0], ids, axis=0)

    def prefill():
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
        return gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(ctx0))

    logits, kc, vc = prefill()
    r_toks, r_flags = [], []
    for j in range(K):
        tok, eos_p = sampling.sample(subs[j], logits, temp, 0, 0.0)
        r_toks.append(int(tok))
        r_flags.append(int(bool(tok == SVS) or bool(eos_p >= min_eos_p)))
        logits, kc, vc = kdec.decode_step_fused(
            cfg, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx0 + j),
            quant=True, interpret=True,
        )

    logits0, kc, vc = prefill()
    toks, flags, lout, _, _ = ksem.semantic_chunk_fused(
        cfg, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
        gum, jnp.float32(min_eos_p), K=K, temp=temp,
        semantic_vocab_size=SVS, quant=True, interpret=True,
    )
    assert np.asarray(toks).tolist() == r_toks
    assert np.asarray(flags).tolist() == r_flags
    np.testing.assert_allclose(
        np.asarray(lout), np.asarray(logits), rtol=2e-5, atol=2e-5
    )


def test_chunk_quant_batched_matches_single():
    """Batched packed chunk kernel: lanes bit-equal to the single-lane
    packed chunk kernel under per-lane keys (shared ctx/step base)."""
    from bark_tpu.io import ggml

    cfg, pp, dense = _quant_setup(ggml.GGMLType.Q8_0)
    B, ctx0, temp = 2, 40, 0.7
    B8 = 8
    keys = [jax.random.PRNGKey(5 + b) for b in range(B)]
    gums = [
        ksem.make_gumbel_rows(k, K, cfg.n_out_vocab, kdec._v_pad(cfg), temp)
        for k in keys
    ]
    v_pad = kdec._v_pad(cfg)
    gum_b = jnp.zeros((K * B8, v_pad), jnp.float32)
    for j in range(K):
        for b in range(B):
            gum_b = gum_b.at[j * B8 + b].set(gums[b][j])

    per_lane, l0s, kcs, vcs = [], [], [], []
    for b in range(B):
        ids = (jnp.arange(ctx0, dtype=jnp.int32) * (13 + b)) \
            % cfg.n_in_vocab
        x_emb = jnp.take(dense["wte"][0], ids, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
        l0, kc, vc = gpt.prefill(
            cfg, dense, x_emb, kc, vc, jnp.int32(ctx0)
        )
        toks, flags, _, _, _ = ksem.semantic_chunk_fused(
            cfg, pp, l0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gums[b], jnp.float32(1.0), K=K, temp=temp,
            semantic_vocab_size=SVS, quant=True, interpret=True,
        )
        per_lane.append((np.asarray(toks), np.asarray(flags)))
        l0s.append(l0)
        kcs.append(kc)
        vcs.append(vc)

    toks_b, flags_b, _, _, _ = ksem.semantic_chunk_fused_batched(
        cfg, pp, jnp.stack(l0s),
        jnp.stack(kcs, axis=1), jnp.stack(vcs, axis=1),
        jnp.int32(ctx0), jnp.int32(0), gum_b, jnp.float32(1.0),
        K=K, temp=temp, semantic_vocab_size=SVS, quant=True,
        interpret=True,
    )
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(toks_b)[b], per_lane[b][0])
        np.testing.assert_array_equal(
            np.asarray(flags_b)[b], per_lane[b][1]
        )


def test_scalar_embed_quant_matches_onehot():
    """Quant + scalar_embed (raw dense wte rows via _wte_raw) must match
    the quant side-ring one-hot embed bit-for-bit."""
    from bark_tpu.io import ggml

    cfg, pp, dense = _quant_setup(ggml.GGMLType.Q8_0)
    ctx0, temp = 40, 0.7
    key = jax.random.PRNGKey(5)
    gum = ksem.make_gumbel_rows(
        key, K, cfg.n_out_vocab, kdec._v_pad(cfg), temp
    )
    ids = (jnp.arange(ctx0, dtype=jnp.int32) * 13) % cfg.n_in_vocab
    x_emb = jnp.take(dense["wte"][0], ids, axis=0)
    outs = {}
    for scalar in (False, True):
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
        logits0, kc, vc = gpt.prefill(
            cfg, dense, x_emb, kc, vc, jnp.int32(ctx0)
        )
        toks, flags, lout, _, _ = ksem.semantic_chunk_fused(
            cfg, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(1.0), K=K, temp=temp,
            semantic_vocab_size=SVS, scalar_embed=scalar, quant=True,
            interpret=True,
        )
        outs[scalar] = (
            np.asarray(toks), np.asarray(flags), np.asarray(lout)
        )
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    np.testing.assert_array_equal(outs[True][2], outs[False][2])


def test_supports_gate(monkeypatch):
    fn = kdec.select_decode_fn(CFG, use_pallas=True)
    assert ksem.supports_semantic_kernel(CFG, fn)
    # packed-quantized decode is in-envelope since r4
    assert ksem.supports_semantic_kernel(
        CFG, kdec.select_decode_fn(CFG, use_pallas=True, quant=True)
    )
    assert not ksem.supports_semantic_kernel(
        CFG, kdec.select_decode_fn(CFG, use_pallas=True, lm_window=(0, 64))
    )
    assert not ksem.supports_semantic_kernel(CFG, fn, top_k=50)
    assert not ksem.supports_semantic_kernel(CFG, fn, top_p=0.9)
    # int8-KV is in-envelope since r5 (scales ride as VMEM state)
    assert ksem.supports_semantic_kernel(CFG, fn, kv_quant=True)
    monkeypatch.setenv("BARK_TPU_SEM_KERNEL", "0")
    assert not ksem.supports_semantic_kernel(CFG, fn)


def _prefill_q(pp, x_emb, ctx_len):
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32, quant=True)
    return gpt.prefill(CFG, pp, x_emb, kc, vc, jnp.int32(ctx_len))


@pytest.mark.parametrize("temp,min_eos_p", [(0.7, 1.0), (0.7, 0.006)])
def test_chunk_kv8_matches_stepped(setup, temp, min_eos_p):
    """int8-KV semantic chunk kernel vs the stepped path on the same
    quantized cache: tokens+flags bit-equal, cache rows + scales agree
    (the single-lane path bark-large serves with --kv int8)."""
    pp, x_emb = setup
    ctx0 = 40
    key = jax.random.PRNGKey(5)
    max_steps = 2 * K
    subs = jax.random.split(key, max_steps)
    gum = ksem.make_gumbel_rows(
        key, max_steps, CFG.n_out_vocab, kdec._v_pad(CFG), temp
    )

    logits0, kc, vc = _prefill_q(pp, x_emb, ctx0)
    r_toks, r_flags, r_logits, rkc, rvc = _ref_steps(
        pp, logits0, kc, vc, ctx0, 0, subs, temp, min_eos_p, max_steps
    )

    logits0, kc, vc = _prefill_q(pp, x_emb, ctx0)
    o_toks, o_flags = [], []
    logits = logits0
    for count0 in (0, K):
        toks, flags, logits, kc, vc = ksem.semantic_chunk_fused(
            CFG, pp, logits, kc, vc, jnp.int32(ctx0), jnp.int32(count0),
            gum, jnp.float32(min_eos_p), K=K, temp=temp,
            semantic_vocab_size=SVS, interpret=True,
        )
        o_toks += np.asarray(toks).tolist()
        o_flags += np.asarray(flags).tolist()

    assert o_toks == r_toks
    assert o_flags == r_flags
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(r_logits), rtol=2e-5, atol=2e-5
    )
    rows = slice(ctx0, ctx0 + max_steps)
    for o, r in ((kc, rkc), (vc, rvc)):
        np.testing.assert_array_equal(
            np.asarray(o["q"])[:, rows], np.asarray(r["q"])[:, rows]
        )
        np.testing.assert_allclose(
            np.asarray(o["s"])[:, rows], np.asarray(r["s"])[:, rows],
            rtol=1e-6, atol=0,
        )
