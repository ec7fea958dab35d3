"""One on-TPU verification gate for the fused decode kernel.

The pytest suite can only run the Pallas kernel in interpret mode on CPU
(correct numerics, but Mosaic compilation, real DMA semantics and the
8-row-aligned cache write-back never execute). This tool asserts, on the
real chip, every kernel contract a bench number depends on:

  dense     fused kernel vs XLA decode: greedy token equality over a step
            chain that crosses 8-row write-back windows
  q8_0      packed (in-kernel dequant, symmetric format) vs XLA on
            dense-from-qpack weights: token equality
  q4_k      packed offset format (scales+mins stream) vs XLA: token equality
  int8-kv   low-bit cache: kernel vs XLA — quantized cache contents
            bit-equal, tokens equal
  batched   B-lane kernel with divergent n_past vs per-lane single kernel:
            token equality
  e2e       file -> quantize q5_0 -> dense-load vs packed serving through
            the full BarkContext pipeline: bit-identical tokens + audio

Run on a TPU host BEFORE trusting any bench number:

    python tools/tpu_check.py            # all checks
    python tools/tpu_check.py --quick    # skip the (slow-compile) e2e check

Prints one PASS/FAIL line per check; exit code 0 iff all pass.
Uses tiny lane-aligned shapes (D=128) so uploads stay in the KB range —
runnable even on a degraded remote-TPU tunnel.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.io import ggml, loader
from bark_tpu.kernels import decode as kdec
from bark_tpu.models import gpt

RESULTS = []


def report(name: str, ok: bool, detail: str = ""):
    RESULTS.append((name, ok))
    print(f"{'PASS' if ok else 'FAIL'} {name}" + (f"  {detail}" if detail else ""),
          flush=True)


def _check(name):
    def deco(fn):
        def wrapper(*a, **kw):
            t0 = time.perf_counter()
            try:
                detail = fn(*a, **kw) or ""
                report(name, True, f"{detail} [{time.perf_counter()-t0:.0f}s]")
            except Exception as e:
                report(name, False, f"{type(e).__name__}: {e}")
            return None
        return wrapper
    return deco


def _model(qt=ggml.GGMLType.F32, block_size=320):
    from test_quant_decode import _section

    return _section(qt, block_size=block_size)


def _greedy_chain(cfg, step_fn, params, kc, vc, n0, steps, batch=None):
    """One jitted program: prefill-free greedy decode chain; returns the
    token sequence (host numpy) after a single device sync."""

    def run(params, kc, vc):
        if hasattr(step_fn, "prepare"):
            params = step_fn.prepare(params)

        def body(carry, i):
            tok, kc, vc = carry
            if batch:
                n_past = n0 + i
                logits, kc, vc = step_fn(params, tok, kc, vc, n_past)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                logits, kc, vc = step_fn(params, tok, kc, vc, n0[0] + i)
                tok = jnp.argmax(logits).astype(jnp.int32)
            return (tok, kc, vc), tok

        tok0 = (jnp.full((batch,), 7, jnp.int32) if batch
                else jnp.int32(7))
        (_, kc, vc), toks = jax.lax.scan(
            body, (tok0, kc, vc), jnp.arange(steps, dtype=jnp.int32)
        )
        return toks, kc, vc

    toks, kc, vc = jax.jit(run, donate_argnums=(1, 2))(params, kc, vc)
    return np.asarray(toks), kc, vc


STEPS = 20  # crosses two 8-row write-back windows from n0=5


@_check("dense fused-vs-XLA token equality (semantic-like)")
def check_dense(dtype):
    sec = _model()
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    n0 = jnp.full((1,), 5, jnp.int32)

    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    ref, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=False), dense,
        kc, vc, n0, STEPS,
    )
    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    out, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=True), dense,
        kc, vc, n0, STEPS,
    )
    assert np.array_equal(ref, out), f"tokens diverged: {ref} vs {out}"
    return f"{STEPS} steps equal"


@_check("dense fused-vs-XLA with lm_window (coarse-like)")
def check_dense_window(dtype):
    sec = _model()
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    n0 = jnp.full((1,), 5, jnp.int32)
    win = (0, 128)  # sample from the first logits tile only

    def xla_win(params, tok, kc, vc, n_past):
        l, kc, vc = gpt.decode_step(cfg, params, tok, kc, vc, n_past)
        return jnp.where(jnp.arange(l.shape[0]) < win[1], l, -1e30), kc, vc

    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    ref, _, _ = _greedy_chain(cfg, xla_win, dense, kc, vc, n0, STEPS)
    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    out, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=True, lm_window=win),
        dense, kc, vc, n0, STEPS,
    )
    assert np.array_equal(ref, out), f"tokens diverged: {ref} vs {out}"
    return f"{STEPS} steps equal"


@_check("packed quant vs dense-from-qpack")
def check_quant(dtype, qt, label):
    sec = _model(qt)
    cfg, qpack = loader.gpt_qparams_from_section(sec, dtype)
    dense = loader.dense_from_qpack(cfg, qpack)
    n0 = jnp.full((1,), 5, jnp.int32)

    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    ref, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=False), dense,
        kc, vc, n0, STEPS,
    )
    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    out, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=True, quant=True),
        qpack, kc, vc, n0, STEPS,
    )
    assert np.array_equal(ref, out), f"{label}: tokens diverged {ref} vs {out}"
    return f"{label}: {STEPS} steps equal"


@_check("fused Pallas prefill vs XLA (coarse window re-prime)")
def check_prefill(dtype, T):
    # the coarse stage re-primes its cache per sliding window through
    # kernels/prefill.py on supported shapes; assert on hardware that the
    # fused prefill's logits match XLA's and that a decode chain continuing
    # from its aliased-slab cache write-back produces the same greedy
    # tokens as the all-XLA path. T < block_size exercises the right-pad
    # contract (pad rows causally invisible, cache rows overwritten).
    from bark_tpu.kernels import prefill as kpre

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    assert kpre.supports_fused_prefill(cfg, T, dense)
    rng = np.random.default_rng(11)
    toks = jnp.asarray(rng.integers(0, sec.hparams.n_in_vocab, T), jnp.int32)
    n_valid = jnp.int32(T)

    def chain(prefill_fn, decode_fn):
        def run(params):
            dparams = params
            if hasattr(decode_fn, "prepare"):
                dparams = decode_fn.prepare(params)
            x_emb = jnp.take(params["wte"][0], toks, axis=0)
            kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
            logits, kc, vc = prefill_fn(params, x_emb, kc, vc, n_valid)
            tok0 = jnp.argmax(logits).astype(jnp.int32)

            def body(carry, i):
                tok, kc, vc = carry
                lg, kc, vc = decode_fn(dparams, tok, kc, vc, n_valid + i)
                tok = jnp.argmax(lg).astype(jnp.int32)
                return (tok, kc, vc), tok

            (_, kc, vc), out = jax.lax.scan(
                body, (tok0, kc, vc), jnp.arange(12, dtype=jnp.int32)
            )
            return jnp.concatenate([tok0[None], out]), logits, kc, vc

        return jax.jit(run)(dense)

    ref, rlg, _, _ = chain(
        lambda p, x, kc, vc, nv: gpt.prefill(cfg, p, x, kc, vc, nv),
        kdec.select_decode_fn(cfg, use_pallas=False),
    )
    pre = kpre.prepare_prefill_params(cfg, dense)

    def fused(p, x, kc, vc, nv):
        return kpre.prefill_fused(
            cfg, pre, x, kc, vc, nv,
            interpret=jax.default_backend() != "tpu",
        )

    out, olg, _, _ = chain(fused, kdec.select_decode_fn(cfg, use_pallas=True))
    np.testing.assert_allclose(
        np.asarray(olg), np.asarray(rlg), rtol=2e-5, atol=2e-5,
        err_msg="prefill logits",
    )
    assert np.array_equal(np.asarray(ref), np.asarray(out)), \
        f"tokens diverged: {ref} vs {out}"
    return f"T={T}: logits close, 13 greedy tokens equal"


@_check("whole-window coarse kernel vs scan-of-decode-kernel")
def check_window(dtype, temp, step_idx0):
    # the window kernel (kernels/window.py) runs 60 decode steps +
    # sampling inside one pallas_call; on hardware this exercises the
    # in-kernel gumbel-argmax sampler, the one-hot wte lookup, the
    # intra-kernel cache write-back->slab-reread ordering, and the
    # fori_loop-wrapped tile ring. Tokens must equal the scan path's
    # under the same pre-split keys.
    from bark_tpu.kernels import window as kwin
    from bark_tpu.ops import sampling

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    svs, cbs = 32, 64
    lmw = (svs, svs + 2 * cbs)
    sws, ctx_len = 10, 40
    pp = kdec.prepare_decode_params(cfg, dense, lm_window=lmw)
    pp = kwin.prepare_window_params(cfg, pp, svs=svs, cbs=cbs)
    assert kwin.supports_window_kernel(
        cfg, kdec.select_decode_fn(cfg, use_pallas=True, lm_window=lmw)
    )
    rng = np.random.default_rng(13)
    toks_ctx = jnp.asarray(
        rng.integers(0, sec.hparams.n_in_vocab, ctx_len), jnp.int32
    )
    subs = jax.random.split(jax.random.PRNGKey(5), sws)
    interp = jax.default_backend() != "tpu"

    def prefill():
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
        return gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(ctx_len))

    # scan reference (single-step fused kernel + XLA sampling)
    logits, kc, vc = prefill()
    ref = []
    for j in range(sws):
        base = svs + (0 if (step_idx0 + j) % 2 == 0 else cbs)
        rel = jax.lax.dynamic_slice(logits, (base,), (cbs,))
        tok_rel, _ = sampling.sample(subs[j], rel, temp, 0, 0.0)
        tok = base + int(tok_rel)
        logits, kc, vc = kdec.decode_step_fused(
            cfg, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx_len + j),
            lm_window=lmw, interpret=interp,
        )
        ref.append(tok)

    logits0, kc, vc = prefill()
    toks, _, _ = kwin.coarse_window_fused(
        cfg, pp, logits0, kc, vc,
        jnp.int32(ctx_len), jnp.int32(step_idx0), subs,
        sws=sws, temp=temp, semantic_vocab_size=svs, codebook_size=cbs,
        lm_window=lmw, interpret=interp,
    )
    out = np.asarray(toks).tolist()
    assert out == ref, f"tokens diverged: {out} vs {ref}"
    return f"temp={temp} s0={step_idx0}: {sws} tokens equal"


@_check("batched whole-window kernel vs scan-of-batched-decode")
def check_window_batched(dtype, temp):
    # the batched window kernel (kernels/window.py) runs 60 steps for all
    # B lanes in one pallas_call; on hardware this exercises per-lane
    # 8-aligned write-backs at diverging n_past, per-lane gated slab
    # streams read through the aliased outputs, and the (8, B, nw) gumbel
    # window DMA. Per-lane tokens must equal the scan path's.
    from bark_tpu.kernels import window as kwin
    from bark_tpu.ops import sampling

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    B, svs, cbs = 2, 32, 64
    lmw = (svs, svs + 2 * cbs)
    sws = 10
    ctx_len = jnp.asarray([40, 48], jnp.int32)  # per-lane divergence
    pp = kdec.prepare_decode_params(cfg, dense, lm_window=lmw)
    pp = kwin.prepare_window_params(cfg, pp, svs=svs, cbs=cbs)
    assert kwin.supports_window_kernel_batched(
        cfg, kdec.select_decode_fn_batched(cfg, use_pallas=True, lm_window=lmw)
    )
    rng = np.random.default_rng(23)
    interp = jax.default_backend() != "tpu"
    subs_w = jax.vmap(
        lambda k: jax.random.split(k, sws)
    )(jax.vmap(jax.random.PRNGKey)(jnp.asarray([3, 9]))).swapaxes(0, 1)

    def prefill():
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, batch=B)
        toks_ctx = jnp.asarray(
            rng.integers(0, sec.hparams.n_in_vocab, (B, 64)), jnp.int32
        )
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        return jax.vmap(
            lambda x, k, v, cl: gpt.prefill(cfg, dense, x, k, v, cl),
            in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
        )(x_emb, kc, vc, ctx_len)

    rng = np.random.default_rng(23)
    logits, kc, vc = prefill()
    ref = []
    for j in range(sws):
        base = svs + (0 if j % 2 == 0 else cbs)
        rel = logits[:, base : base + cbs]
        toks = base + jnp.asarray([
            int(sampling.sample(subs_w[j, b], rel[b], temp, 0, 0.0)[0])
            for b in range(B)
        ], jnp.int32)
        logits, kc, vc = kdec.decode_step_fused_batched(
            cfg, pp, toks, kc, vc, ctx_len + j,
            lm_window=lmw, interpret=interp,
        )
        ref.append(np.asarray(toks))
    ref = np.stack(ref, axis=1)  # (B, sws)

    rng = np.random.default_rng(23)
    logits0, kc, vc = prefill()
    out, _, _ = kwin.coarse_window_fused_batched(
        cfg, pp, logits0, kc, vc, ctx_len, jnp.int32(0), subs_w,
        sws=sws, temp=temp, semantic_vocab_size=svs, codebook_size=cbs,
        lm_window=lmw, interpret=interp,
    )
    out = np.asarray(out)
    assert np.array_equal(out, ref), f"tokens diverged: {out} vs {ref}"
    return f"temp={temp}: {B}x{sws} tokens equal"


@_check("packed whole-window kernel vs scan-of-packed-decode")
def check_window_quant(dtype, qt, label, batched=False):
    # the r4 quant window kernel: packed layer/LM tiles on the unified
    # quant tile stream + the dense wte side ring. On hardware this
    # exercises the in-kernel dequant inside the fori_loop step body and
    # the side ring's DMA chain. Tokens must equal the scan of the packed
    # single-step kernel (the proven q8_0/q4_k path) under the same keys.
    from bark_tpu.kernels import window as kwin
    from bark_tpu.ops import sampling

    sec = _model(qt, block_size=256)
    cfg, qpack = loader.gpt_qparams_from_section(sec, dtype)
    dense = loader.dense_from_qpack(cfg, qpack)
    svs, cbs = 32, 64
    lmw = (svs, svs + 2 * cbs)
    sws, ctx_len, temp = 10, 40, 0.7
    pp = kdec.prepare_decode_params(cfg, qpack, quant=True, lm_window=lmw)
    pp = kwin.prepare_window_params(
        cfg, pp, svs=svs, cbs=cbs, dense_wte=dense["wte"][0]
    )
    rng = np.random.default_rng(13)
    toks_ctx = jnp.asarray(
        rng.integers(0, sec.hparams.n_in_vocab, ctx_len), jnp.int32
    )
    subs = jax.random.split(jax.random.PRNGKey(5), sws)
    interp = jax.default_backend() != "tpu"

    def prefill():
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
        return gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(ctx_len))

    logits, kc, vc = prefill()
    ref = []
    for j in range(sws):
        base = svs + (0 if j % 2 == 0 else cbs)
        rel = jax.lax.dynamic_slice(logits, (base,), (cbs,))
        tok_rel, _ = sampling.sample(subs[j], rel, temp, 0, 0.0)
        tok = base + int(tok_rel)
        logits, kc, vc = kdec.decode_step_fused(
            cfg, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx_len + j),
            quant=True, lm_window=lmw, interpret=interp,
        )
        ref.append(tok)

    logits0, kc, vc = prefill()
    toks, _, _ = kwin.coarse_window_fused(
        cfg, pp, logits0, kc, vc,
        jnp.int32(ctx_len), jnp.int32(0), subs,
        sws=sws, temp=temp, semantic_vocab_size=svs, codebook_size=cbs,
        lm_window=lmw, quant=True, interpret=interp,
    )
    out = np.asarray(toks).tolist()
    assert out == ref, f"tokens diverged: {out} vs {ref}"
    if batched:
        # batched packed window: both lanes from the same start must equal
        # the single-lane packed kernel's tokens
        B = 2
        logits0, kc, vc = prefill()
        kcb = jnp.stack([kc] * B, axis=1)
        vcb = jnp.stack([vc] * B, axis=1)
        subs_w = jnp.stack([subs] * B, axis=1)  # (sws, B, 2)
        toks_b, _, _ = kwin.coarse_window_fused_batched(
            cfg, pp, jnp.stack([logits0] * B), kcb, vcb,
            jnp.full((B,), ctx_len, jnp.int32), jnp.int32(0), subs_w,
            sws=sws, temp=temp, semantic_vocab_size=svs,
            codebook_size=cbs, lm_window=lmw, quant=True,
            interpret=interp,
        )
        for b in range(B):
            assert np.asarray(toks_b)[b].tolist() == ref, f"lane {b}"
    return f"{label}: {sws} tokens equal" + (" (+batched)" if batched else "")


@_check("packed semantic chunk kernel vs stepped packed decode")
def check_semantic_quant(dtype, qt, label, batched=False):
    # r4 quant chunk kernel: packed tile stream + dense wte side ring +
    # in-kernel full-vocab sampling/EOS. Tokens AND flags must equal the
    # stepped packed path's.
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.ops import sampling

    sec = _model(qt, block_size=256)
    cfg, qpack = loader.gpt_qparams_from_section(sec, dtype)
    dense = loader.dense_from_qpack(cfg, qpack)
    svs = cfg.n_out_vocab // 2
    K, ctx0, temp, min_eos_p = 6, 40, 0.7, 1.0
    pp = kdec.prepare_decode_params(cfg, qpack, quant=True)
    pp = ksem.prepare_semantic_params(cfg, pp, dense_wte=dense["wte"][0])
    rng = np.random.default_rng(17)
    toks_ctx = jnp.asarray(
        rng.integers(0, sec.hparams.n_in_vocab, ctx0), jnp.int32
    )
    key = jax.random.PRNGKey(5)
    subs = jax.random.split(key, K)
    gum = ksem.make_gumbel_rows(
        key, K, cfg.n_out_vocab, kdec._v_pad(cfg), temp
    )
    interp = jax.default_backend() != "tpu"

    def prefill():
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
        return gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(ctx0))

    logits, kc, vc = prefill()
    ref_t, ref_f = [], []
    for g in range(K):
        tok, eos_p = sampling.sample(subs[g], logits, temp, 0, 0.0)
        ref_t.append(int(tok))
        ref_f.append(int(bool(tok == svs) or bool(eos_p >= min_eos_p)))
        logits, kc, vc = kdec.decode_step_fused(
            cfg, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx0 + g),
            quant=True, interpret=interp,
        )

    logits0, kc, vc = prefill()
    toks, flags, _, _, _ = ksem.semantic_chunk_fused(
        cfg, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
        gum, jnp.float32(min_eos_p), K=K, temp=temp,
        semantic_vocab_size=svs, quant=True, interpret=interp,
    )
    out_t = np.asarray(toks).tolist()
    out_f = np.asarray(flags).tolist()
    assert out_t == ref_t, f"tokens diverged: {out_t} vs {ref_t}"
    assert out_f == ref_f, f"flags diverged: {out_f} vs {ref_f}"
    if batched:
        B, B8 = 2, 8
        v_pad = kdec._v_pad(cfg)
        gum_b = jnp.zeros((K * B8, v_pad), jnp.float32)
        for j in range(K):
            for b in range(B):
                gum_b = gum_b.at[j * B8 + b].set(gum[j])
        logits0, kc, vc = prefill()
        toks_b, flags_b, _, _, _ = ksem.semantic_chunk_fused_batched(
            cfg, pp, jnp.stack([logits0] * B),
            jnp.stack([kc] * B, axis=1), jnp.stack([vc] * B, axis=1),
            jnp.int32(ctx0), jnp.int32(0), gum_b, jnp.float32(min_eos_p),
            K=K, temp=temp, semantic_vocab_size=svs, quant=True,
            interpret=interp,
        )
        for b in range(B):
            assert np.asarray(toks_b)[b].tolist() == ref_t, f"lane {b}"
            assert np.asarray(flags_b)[b].tolist() == ref_f, f"lane {b}"
    return f"{label}: {K} tokens+flags equal" + (" (+batched)" if batched else "")


@_check("semantic kernel variants (scalar embed / in-kernel EOS while)")
def check_semantic_variants(dtype):
    # The two probe-gated variants (tools/tpu_mosaic_probe.py P1/P2b, all
    # PASS on v5e r4): scalar_embed DMAs exactly one 8-row wte window at
    # the sampled token index (vs streaming the whole [0, v_pad) wte
    # through the MXU — ~16-21 MB/step on production shapes), and
    # use_while runs the whole stage in one call with an in-kernel EOS
    # exit. Both must be token/flag-identical to the fori chunk kernel on
    # hardware.
    from bark_tpu.kernels import semantic as ksem

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    svs = cfg.n_out_vocab // 2
    K, ctx0, temp = 8, 40, 0.7
    pp = kdec.prepare_decode_params(cfg, dense)
    pp = ksem.prepare_semantic_params(cfg, pp)
    rng = np.random.default_rng(31)
    toks_ctx = jnp.asarray(
        rng.integers(0, sec.hparams.n_in_vocab, ctx0), jnp.int32
    )
    key = jax.random.PRNGKey(5)
    gum = ksem.make_gumbel_rows(
        key, K, cfg.n_out_vocab, kdec._v_pad(cfg), temp
    )
    interp = jax.default_backend() != "tpu"

    def run(**kw):
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
        logits0, kc, vc = gpt.prefill(
            cfg, dense, x_emb, kc, vc, jnp.int32(ctx0)
        )
        toks, flags, lout, _, _ = ksem.semantic_chunk_fused(
            cfg, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(1.0), K=K, temp=temp,
            semantic_vocab_size=svs, interpret=interp, **kw,
        )
        return (
            np.asarray(toks), np.asarray(flags), np.asarray(lout),
        )

    base_t, base_f, base_l = run()
    sc_t, sc_f, sc_l = run(scalar_embed=True)
    assert np.array_equal(sc_t, base_t), f"scalar tokens: {sc_t} vs {base_t}"
    assert np.array_equal(sc_f, base_f), "scalar flags diverged"
    assert np.array_equal(sc_l, base_l), "scalar logits diverged"
    w_t, w_f, _ = run(use_while=True)
    assert np.array_equal(w_t, base_t), f"while tokens: {w_t} vs {base_t}"
    assert np.array_equal(w_f, base_f), "while flags diverged"
    return f"scalar+while == fori chunk ({K} tokens bit-equal)"


@_check("dynamic-layer kernels vs unrolled (window + semantic q8_0 + prefill)")
def check_dyn_layers(dtype):
    # BARK_TPU_DYN_LAYERS=1 swaps the multi-step kernels' Python-unrolled
    # layer loop for a lax.fori_loop over kv_slots-layer blocks
    # (decode._dense_layer_stack_dyn + _tile_stream_dyn) — the compile-time
    # / cold-start lever. On hardware this exercises every probed
    # primitive in anger (P3-P6: traced-leading-index HBM DMA, VMEM
    # reads/writes, pl.when-guarded cross-boundary prefetch). Tokens must
    # be bit-equal to the default kernels'.
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.kernels import window as kwin
    from bark_tpu.ops import sampling

    interp = jax.default_backend() != "tpu"
    old = os.environ.get("BARK_TPU_DYN_LAYERS")
    try:
        os.environ["BARK_TPU_DYN_LAYERS"] = "1"

        # ---- window, dense (wte tiles lead the stream: p0 > 0) ----
        sec = _model(block_size=256)
        cfg, dense = loader.gpt_params_from_section(sec, dtype)
        svs, cbs, sws, ctx_len = 32, 64, 10, 40
        lmw = (svs, svs + 2 * cbs)
        pp = kdec.prepare_decode_params(cfg, dense, lm_window=lmw)
        pp = kwin.prepare_window_params(cfg, pp, svs=svs, cbs=cbs)
        assert "_lp" in pp
        rng = np.random.default_rng(13)
        toks_ctx = jnp.asarray(
            rng.integers(0, sec.hparams.n_in_vocab, ctx_len), jnp.int32
        )
        subs = jax.random.split(jax.random.PRNGKey(5), sws)

        def run_window():
            x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
            kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
            logits0, kc, vc = gpt.prefill(
                cfg, dense, x_emb, kc, vc, jnp.int32(ctx_len)
            )
            toks, _, _ = kwin.coarse_window_fused(
                cfg, pp, logits0, kc, vc, jnp.int32(ctx_len), jnp.int32(0),
                subs, sws=sws, temp=0.7, semantic_vocab_size=svs,
                codebook_size=cbs, lm_window=lmw, interpret=interp,
            )
            return np.asarray(toks)

        dyn_w = run_window()
        os.environ["BARK_TPU_DYN_LAYERS"] = "0"
        ref_w = run_window()
        assert np.array_equal(dyn_w, ref_w), f"window: {dyn_w} vs {ref_w}"

        # ---- semantic, packed q8_0 (scales on the traced stream too) ----
        os.environ["BARK_TPU_DYN_LAYERS"] = "1"
        qsec = _model(block_size=256, qt=ggml.GGMLType.Q8_0)
        qcfg, qpack = loader.gpt_qparams_from_section(qsec, dtype)
        qdense = loader.dense_from_qpack(qcfg, qpack, dtype=dtype)
        qpp = kdec.prepare_decode_params(qcfg, qpack, quant=True)
        qpp = ksem.prepare_semantic_params(
            qcfg, qpp, dense_wte=qdense["wte"][0]
        )
        assert "_lp" in qpp
        qsvs, K, qctx = qcfg.n_out_vocab // 2, 8, 40
        qtoks_ctx = jnp.asarray(
            rng.integers(0, qsec.hparams.n_in_vocab, qctx), jnp.int32
        )
        gum = ksem.make_gumbel_rows(
            jax.random.PRNGKey(5), K, qcfg.n_out_vocab,
            kdec._v_pad(qcfg), 0.7,
        )

        def run_sem():
            x_emb = jnp.take(qdense["wte"][0], qtoks_ctx, axis=0)
            kc, vc = gpt.init_kv_cache(qcfg, dtype=dtype)
            logits0, kc, vc = gpt.prefill(
                qcfg, qdense, x_emb, kc, vc, jnp.int32(qctx)
            )
            toks, flags, _, _, _ = ksem.semantic_chunk_fused(
                qcfg, qpp, logits0, kc, vc, jnp.int32(qctx), jnp.int32(0),
                gum, jnp.float32(1.0), K=K, temp=0.7,
                semantic_vocab_size=qsvs, quant=True, interpret=interp,
            )
            return np.asarray(toks), np.asarray(flags)

        dyn_t, dyn_f = run_sem()
        os.environ["BARK_TPU_DYN_LAYERS"] = "0"
        ref_t, ref_f = run_sem()
        assert np.array_equal(dyn_t, ref_t), f"semantic: {dyn_t} vs {ref_t}"
        assert np.array_equal(dyn_f, ref_f), "semantic flags diverged"

        # ---- prefill (K/V slab writes at the traced layer index, P7) ----
        os.environ["BARK_TPU_DYN_LAYERS"] = "1"
        from bark_tpu.kernels import prefill as kpre

        ppre = kdec.prepare_decode_params(cfg, dense, lm_window=lmw)
        ppre = kpre.prepare_prefill_params(cfg, ppre, lm_window=lmw)
        assert "_lp" in ppre and kpre.supports_fused_prefill(cfg, ctx_len)

        def run_prefill():
            x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
            kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
            logits, kc, vc = kpre.prefill_fused(
                cfg, ppre, x_emb, kc, vc, jnp.int32(ctx_len),
                interpret=interp,
            )
            return np.asarray(logits), np.asarray(kc), np.asarray(vc)

        d_log, d_kc, d_vc = run_prefill()
        os.environ["BARK_TPU_DYN_LAYERS"] = "0"
        r_log, r_kc, r_vc = run_prefill()
        np.testing.assert_allclose(
            d_log[lmw[0]:lmw[1]], r_log[lmw[0]:lmw[1]],
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(d_kc, r_kc, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(d_vc, r_vc, rtol=2e-5, atol=2e-5)
    finally:
        if old is None:
            os.environ.pop("BARK_TPU_DYN_LAYERS", None)
        else:
            os.environ["BARK_TPU_DYN_LAYERS"] = old
    return (f"window {sws} + semantic q8_0 {K} tokens bit-equal; "
            "prefill logits/caches close")


@_check("dynamic-layer BATCHED kernels vs unrolled (window int8-KV + semantic)")
def check_dyn_batched(dtype):
    # The BARK_TPU_DYN_LAYERS=auto default routes batched serving of
    # L>=24 models through the dyn batched kernels, so their hardware
    # contract needs its own gate: per-lane slab write-backs at
    # k_out[l, b, base8(b)] with a TRACED l (probe P8), slab slot
    # b % kv_slots static via _dyn_kv_slots_batched, and with int8-KV the
    # (L, B, S) scale state read/written at the traced leading index.
    # Tokens must be bit-equal to the unrolled batched kernels'.
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.kernels import window as kwin

    interp = jax.default_backend() != "tpu"
    old = os.environ.get("BARK_TPU_DYN_LAYERS")
    try:
        sec = _model(block_size=256)
        cfg, dense = loader.gpt_params_from_section(sec, dtype)
        B, svs, cbs, sws = 2, 32, 64, 10
        lmw = (svs, svs + 2 * cbs)
        ctx_len = jnp.asarray([40, 48], jnp.int32)
        pp = kdec.prepare_decode_params(cfg, dense, lm_window=lmw)
        pp = kwin.prepare_window_params(cfg, pp, svs=svs, cbs=cbs)
        rng = np.random.default_rng(23)
        toks_ctx = jnp.asarray(
            rng.integers(0, sec.hparams.n_in_vocab, (B, 64)), jnp.int32
        )
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        subs_w = jax.vmap(
            lambda k: jax.random.split(k, sws)
        )(jax.vmap(jax.random.PRNGKey)(jnp.asarray([3, 9]))).swapaxes(0, 1)

        def run_window(kv_quant):
            kc, vc = gpt.init_kv_cache(
                cfg, dtype=dtype, batch=B, quant=kv_quant
            )
            logits0, kc, vc = jax.vmap(
                lambda x, k, v, cl: gpt.prefill(cfg, dense, x, k, v, cl),
                in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
            )(x_emb, kc, vc, ctx_len)
            toks, _, _ = kwin.coarse_window_fused_batched(
                cfg, pp, logits0, kc, vc, ctx_len, jnp.int32(0), subs_w,
                sws=sws, temp=0.7, semantic_vocab_size=svs,
                codebook_size=cbs, lm_window=lmw, interpret=interp,
            )
            return np.asarray(toks)

        for kv_quant in (False, True):
            os.environ["BARK_TPU_DYN_LAYERS"] = "1"
            dyn_t = run_window(kv_quant)
            os.environ["BARK_TPU_DYN_LAYERS"] = "0"
            ref_t = run_window(kv_quant)
            assert np.array_equal(dyn_t, ref_t), \
                f"window kv_quant={kv_quant}: {dyn_t} vs {ref_t}"

        # batched semantic chunk (shared n_past, strided write-back)
        psem = kdec.prepare_decode_params(cfg, dense)
        psem = ksem.prepare_semantic_params(cfg, psem)
        K, ctx0, temp = 8, 40, 0.7
        ssvs = cfg.n_out_vocab // 2
        keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray([5, 11]))
        subs_over = jax.vmap(lambda k: jax.random.split(k, K))(keys)
        gum = ksem.make_gumbel_rows_batched(
            subs_over, jnp.int32(0), K, cfg.n_out_vocab,
            kdec._v_pad(cfg), temp,
        )
        ids = (jnp.arange(ctx0, dtype=jnp.int32) * 13) % cfg.n_in_vocab
        x_sem = jnp.broadcast_to(
            jnp.take(dense["wte"][0], ids, axis=0), (B, ctx0, cfg.n_embd)
        )

        def run_sem():
            kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, batch=B)
            logits0, kc, vc = jax.vmap(
                lambda x, k, v: gpt.prefill(
                    cfg, dense, x, k, v, jnp.int32(ctx0)
                ),
                in_axes=(0, 1, 1), out_axes=(0, 1, 1),
            )(x_sem, kc, vc)
            toks, flags, _, _, _ = ksem.semantic_chunk_fused_batched(
                cfg, psem, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
                gum, jnp.float32(1.0), K=K, temp=temp,
                semantic_vocab_size=ssvs, interpret=interp,
            )
            return np.asarray(toks), np.asarray(flags)

        os.environ["BARK_TPU_DYN_LAYERS"] = "1"
        dyn_t, dyn_f = run_sem()
        os.environ["BARK_TPU_DYN_LAYERS"] = "0"
        ref_t, ref_f = run_sem()
        assert np.array_equal(dyn_t, ref_t), f"semantic: {dyn_t} vs {ref_t}"
        assert np.array_equal(dyn_f, ref_f), "semantic flags diverged"
    finally:
        if old is None:
            os.environ.pop("BARK_TPU_DYN_LAYERS", None)
        else:
            os.environ["BARK_TPU_DYN_LAYERS"] = old
    return (f"window {B}x{sws} (bf16 + int8-KV) + semantic {B}x{K} "
            "tokens bit-equal")


@_check("semantic chunk kernel vs stepped decode (full-vocab sampling + EOS)")
def check_semantic(dtype, temp, min_eos_p):
    # the semantic chunk kernel (kernels/semantic.py) runs K decode steps,
    # full-vocab gumbel-argmax sampling and the EOS stop test inside one
    # pallas_call; on hardware this exercises the dynamic-base gumbel-row
    # DMA, the in-kernel softmax eos_p and the dynamic count0 base. Tokens
    # AND stop flags must equal the stepped path's under the same keys.
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.ops import sampling

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    svs = cfg.n_out_vocab // 2
    K, ctx0 = 6, 40
    max_steps = 2 * K
    pp = kdec.prepare_decode_params(cfg, dense)
    pp = ksem.prepare_semantic_params(cfg, pp)
    assert ksem.supports_semantic_kernel(
        cfg, kdec.select_decode_fn(cfg, use_pallas=True)
    )
    rng = np.random.default_rng(17)
    toks_ctx = jnp.asarray(
        rng.integers(0, sec.hparams.n_in_vocab, ctx0), jnp.int32
    )
    key = jax.random.PRNGKey(5)
    subs = jax.random.split(key, max_steps)
    gum = ksem.make_gumbel_rows(
        key, max_steps, cfg.n_out_vocab, kdec._v_pad(cfg), temp
    )
    interp = jax.default_backend() != "tpu"

    def prefill():
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
        return gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(ctx0))

    # stepped reference (single-step fused kernel + XLA sampling); decodes
    # every step like the chunk kernel — post-stop effects are masked by
    # the stage wrapper, not by either kernel
    logits, kc, vc = prefill()
    ref_t, ref_f = [], []
    for g in range(max_steps):
        tok, eos_p = sampling.sample(subs[g], logits, temp, 0, 0.0)
        ref_t.append(int(tok))
        ref_f.append(int(bool(tok == svs) or bool(eos_p >= min_eos_p)))
        logits, kc, vc = kdec.decode_step_fused(
            cfg, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx0 + g),
            interpret=interp,
        )

    logits, kc, vc = prefill()
    out_t, out_f = [], []
    for count0 in (0, K):
        toks, flags, logits, kc, vc = ksem.semantic_chunk_fused(
            cfg, pp, logits, kc, vc, jnp.int32(ctx0), jnp.int32(count0),
            gum, jnp.float32(min_eos_p), K=K, temp=temp,
            semantic_vocab_size=svs, interpret=interp,
        )
        out_t += np.asarray(toks).tolist()
        out_f += np.asarray(flags).tolist()
    assert out_t == ref_t, f"tokens diverged: {out_t} vs {ref_t}"
    assert out_f == ref_f, f"stop flags diverged: {out_f} vs {ref_f}"
    return f"temp={temp} minp={min_eos_p}: {max_steps} tokens+flags equal"


@_check("batched semantic chunk kernel vs stepped batched decode")
def check_semantic_batched(dtype, temp, min_eos_p):
    # batched mirror of check_semantic: per-lane full-vocab sampling, the
    # (B8, nv) aligned gumbel row-group DMA, the shared-n_past one-DMA-per-
    # layer write-back, and per-lane EOS flags. Active-lane tokens/flags
    # must equal the stepped batched path's.
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.ops import sampling

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    svs = cfg.n_out_vocab // 2
    B, K, ctx0 = 2, 6, 40
    max_steps = 2 * K
    pp = kdec.prepare_decode_params(cfg, dense)
    pp = ksem.prepare_semantic_params(cfg, pp)
    assert ksem.supports_semantic_kernel_batched(
        cfg, kdec.select_decode_fn_batched(cfg, use_pallas=True)
    )
    rng = np.random.default_rng(29)
    toks_ctx = jnp.asarray(
        rng.integers(0, sec.hparams.n_in_vocab, (B, ctx0)), jnp.int32
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray([5, 12]))
    subs_over = jax.vmap(
        lambda k: jax.random.split(k, max_steps + K)
    )(keys)
    interp = jax.default_backend() != "tpu"

    def prefill():
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, batch=B)
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        return jax.vmap(
            lambda x, k, v: gpt.prefill(cfg, dense, x, k, v, jnp.int32(ctx0)),
            in_axes=(0, 1, 1), out_axes=(0, 1, 1),
        )(x_emb, kc, vc)

    # stepped reference (batched single-step kernel + XLA sampling),
    # decoding every step with the chunk kernel's shared n_past
    logits, kc, vc = prefill()
    ref_t, ref_f = [], []
    for g in range(max_steps):
        toks, eos = [], []
        for b in range(B):
            tok, eos_p = sampling.sample(
                subs_over[b, g], logits[b], temp, 0, 0.0
            )
            toks.append(int(tok))
            eos.append(float(eos_p))
        ref_t.append(toks)
        ref_f.append([
            int(toks[b] == svs or eos[b] >= min_eos_p) for b in range(B)
        ])
        logits, kc, vc = kdec.decode_step_fused_batched(
            cfg, pp, jnp.asarray(toks, jnp.int32), kc, vc,
            jnp.full((B,), ctx0 + g, jnp.int32), interpret=interp,
        )
    ref_t = np.asarray(ref_t).T  # (B, max_steps)
    ref_f = np.asarray(ref_f).T

    logits, kc, vc = prefill()
    out_t, out_f = [], []
    for g0 in (0, K):
        gum = ksem.make_gumbel_rows_batched(
            subs_over, jnp.int32(g0), K, cfg.n_out_vocab,
            kdec._v_pad(cfg), temp,
        )
        toks, flags, logits, kc, vc = ksem.semantic_chunk_fused_batched(
            cfg, pp, logits, kc, vc, jnp.int32(ctx0), jnp.int32(g0),
            gum, jnp.float32(min_eos_p), K=K, temp=temp,
            semantic_vocab_size=svs, interpret=interp,
        )
        out_t.append(np.asarray(toks))
        out_f.append(np.asarray(flags))
    out_t = np.concatenate(out_t, axis=1)
    out_f = np.concatenate(out_f, axis=1)
    assert np.array_equal(out_t, ref_t), f"tokens: {out_t} vs {ref_t}"
    assert np.array_equal(out_f, ref_f), f"flags: {out_f} vs {ref_f}"
    return f"temp={temp} minp={min_eos_p}: {B}x{max_steps} tokens+flags equal"


@_check("int8 KV cache XLA-vs-Pallas")
def check_int8_kv(dtype):
    sec = _model()
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    n0 = jnp.full((1,), 5, jnp.int32)

    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, quant=True)
    ref, rkc, rvc = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=False), dense,
        kc, vc, n0, STEPS,
    )
    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, quant=True)
    out, okc, ovc = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=True), dense,
        kc, vc, n0, STEPS,
    )
    assert np.array_equal(ref, out), f"tokens diverged: {ref} vs {out}"
    # the quantized cache CONTENTS are the shared contract — both paths use
    # the same quantization formula (gpt.quantize_kv_rows == _quant_row),
    # but the pre-quantization K/V rows come from differently-accumulated
    # f32 matmuls (XLA whole-row dot vs kernel per-tile dots), so the int8
    # values may flip by 1 at rounding boundaries and scales by ulps
    for a, b, nm in ((rkc, okc, "k"), (rvc, ovc, "v")):
        dq = np.abs(np.asarray(a["q"], np.int32) - np.asarray(b["q"], np.int32))
        assert dq.max() <= 1, f"{nm} int8 values differ by {dq.max()}"
        np.testing.assert_allclose(
            np.asarray(a["s"]), np.asarray(b["s"]), rtol=1e-4, atol=1e-7,
            err_msg=f"{nm} row scales",
        )
    return f"{STEPS} steps equal + cache contents match (±1 int8)"


@_check("int8-KV whole-window kernel vs scan-of-decode (single-lane)")
def check_window_kv8(dtype, temp=0.7):
    # bark-large's recommended serving config is --kv int8; before r5 its
    # single-lane coarse stage fell back to the stepped scan (the window
    # kernel rejected kv_quant) and paid ~0.2 ms/token of per-step glue.
    # This check compiles + runs the kv8 window kernel on hardware: int8
    # slab streaming, in-kernel fresh-row quantization, and the (L, 1, S)
    # VMEM scale state carried across the window's steps.
    from bark_tpu.kernels import window as kwin
    from bark_tpu.ops import sampling

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    svs, cbs = 32, 64
    lmw = (svs, svs + 2 * cbs)
    sws, ctx_len = 10, 40
    pp = kdec.prepare_decode_params(cfg, dense, lm_window=lmw)
    pp = kwin.prepare_window_params(cfg, pp, svs=svs, cbs=cbs)
    assert kwin.supports_window_kernel(
        cfg, kdec.select_decode_fn(cfg, use_pallas=True, lm_window=lmw),
        kv_quant=True,
    )
    rng = np.random.default_rng(13)
    toks_ctx = jnp.asarray(
        rng.integers(0, sec.hparams.n_in_vocab, ctx_len), jnp.int32
    )
    subs = jax.random.split(jax.random.PRNGKey(5), sws)
    interp = jax.default_backend() != "tpu"

    def prefill():
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, quant=True)
        return gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(ctx_len))

    logits, kc, vc = prefill()
    ref = []
    for j in range(sws):
        base = svs + (0 if j % 2 == 0 else cbs)
        rel = jax.lax.dynamic_slice(logits, (base,), (cbs,))
        tok_rel, _ = sampling.sample(subs[j], rel, temp, 0, 0.0)
        tok = base + int(tok_rel)
        logits, kc, vc = kdec.decode_step_fused(
            cfg, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx_len + j),
            lm_window=lmw, interpret=interp,
        )
        ref.append(tok)

    logits0, kc, vc = prefill()
    toks, okc, ovc = kwin.coarse_window_fused(
        cfg, pp, logits0, kc, vc,
        jnp.int32(ctx_len), jnp.int32(0), subs,
        sws=sws, temp=temp, semantic_vocab_size=svs, codebook_size=cbs,
        lm_window=lmw, interpret=interp,
    )
    out = np.asarray(toks).tolist()
    assert out == ref, f"tokens diverged: {out} vs {ref}"
    assert isinstance(okc, dict) and okc["q"].dtype == jnp.int8
    return f"temp={temp}: {sws} tokens equal (int8 slabs + VMEM scales)"


@_check("int8-KV semantic chunk kernel vs stepped decode (single-lane)")
def check_semantic_kv8(dtype, temp=0.7, min_eos_p=0.01):
    # same contract as check_semantic but on the quantized cache: tokens
    # AND stop flags equal, with the scale state carried across chunks
    # through the (L, S) f32 outputs.
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.ops import sampling

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    svs = cfg.n_out_vocab // 2
    K, ctx0 = 6, 40
    max_steps = 2 * K
    pp = kdec.prepare_decode_params(cfg, dense)
    pp = ksem.prepare_semantic_params(cfg, pp)
    rng = np.random.default_rng(17)
    toks_ctx = jnp.asarray(
        rng.integers(0, sec.hparams.n_in_vocab, ctx0), jnp.int32
    )
    key = jax.random.PRNGKey(5)
    subs = jax.random.split(key, max_steps)
    gum = ksem.make_gumbel_rows(
        key, max_steps, cfg.n_out_vocab, kdec._v_pad(cfg), temp
    )
    interp = jax.default_backend() != "tpu"

    def prefill():
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, quant=True)
        return gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(ctx0))

    logits, kc, vc = prefill()
    ref_t, ref_f = [], []
    for g in range(max_steps):
        tok, eos_p = sampling.sample(subs[g], logits, temp, 0, 0.0)
        ref_t.append(int(tok))
        ref_f.append(int(bool(tok == svs) or bool(eos_p >= min_eos_p)))
        logits, kc, vc = kdec.decode_step_fused(
            cfg, pp, jnp.int32(tok), kc, vc, jnp.int32(ctx0 + g),
            interpret=interp,
        )

    logits, kc, vc = prefill()
    out_t, out_f = [], []
    for count0 in (0, K):
        toks, flags, logits, kc, vc = ksem.semantic_chunk_fused(
            cfg, pp, logits, kc, vc, jnp.int32(ctx0), jnp.int32(count0),
            gum, jnp.float32(min_eos_p), K=K, temp=temp,
            semantic_vocab_size=svs, interpret=interp,
        )
        out_t += np.asarray(toks).tolist()
        out_f += np.asarray(flags).tolist()
    assert out_t == ref_t, f"tokens diverged: {out_t} vs {ref_t}"
    assert out_f == ref_f, f"stop flags diverged: {out_f} vs {ref_f}"
    return f"temp={temp} minp={min_eos_p}: {max_steps} tokens+flags equal"


@_check("attention levers: QHEAD exact / GATE token parity")
def check_att_flags(dtype, block_size=512, start=250):
    """BARK_TPU_ATT_QHEAD builds the (H, D) q-head with a row-broadcast
    multiply and contracts dim1 x dim1 (no q transpose) — same per-element
    contraction sums, so tokens must EQUAL the default path (dense AND
    int8-KV). BARK_TPU_ATT_GATE cond-skips score/context dots on dead KV
    chunks; the chunked ctx_h accumulation regroups f32 sums, so it is
    held to the same token-equality bar empirically (n0=start puts the
    chain mid-slab: 1 of 2 chunks dead, going live mid-chain)."""
    sec = _model(block_size=block_size)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    n0 = jnp.full((1,), start, jnp.int32)

    def fused_chain(kv_quant=False):
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, quant=kv_quant)
        out, _, _ = _greedy_chain(
            cfg, kdec.select_decode_fn(cfg, use_pallas=True), dense,
            kc, vc, n0, STEPS,
        )
        return out

    ref = fused_chain()
    ref_kv8 = fused_chain(kv_quant=True)
    os.environ["BARK_TPU_ATT_QHEAD"] = "1"
    try:
        qh = fused_chain()
        qh_kv8 = fused_chain(kv_quant=True)
    finally:
        del os.environ["BARK_TPU_ATT_QHEAD"]
    assert np.array_equal(ref, qh), f"QHEAD diverged: {ref} vs {qh}"
    assert np.array_equal(ref_kv8, qh_kv8), \
        f"QHEAD int8-KV diverged: {ref_kv8} vs {qh_kv8}"
    os.environ["BARK_TPU_ATT_GATE"] = "1"
    try:
        gt = fused_chain()
    finally:
        del os.environ["BARK_TPU_ATT_GATE"]
    assert np.array_equal(ref, gt), f"GATE diverged: {ref} vs {gt}"
    return f"{STEPS} steps: qhead == default (dense + int8-KV); gate =="


@_check("kv chunk-gated slab stream (crosses chunk boundary)")
def check_kv_gated(dtype, block_size=512, start=250):
    # S=512 -> two 256-row chunks (_pick_kv_chunks); the chain starts at
    # n_past=250 so chunk 1 goes live mid-chain — exercising the gated DMA,
    # the dead-region zero-fill (uninitialized VMEM junk on real hardware)
    # and the boundary transition. Ungated (BARK_TPU_KV_CHUNKS=1) and XLA
    # must all produce the same tokens. Also run at block_size=1024 /
    # start=760 — the production serving shape (4 chunks, 3 live).
    sec = _model(block_size=block_size)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    n0 = jnp.full((1,), start, jnp.int32)

    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    ref, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=False), dense,
        kc, vc, n0, STEPS,
    )
    # single-lane default is ungated (no measured win at B=1); request the
    # gated stream explicitly so this check still exercises it on hardware
    os.environ["BARK_TPU_KV_CHUNKS"] = str(block_size // 256)
    try:
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
        out, _, _ = _greedy_chain(
            cfg, kdec.select_decode_fn(cfg, use_pallas=True), dense,
            kc, vc, n0, STEPS,
        )
    finally:
        del os.environ["BARK_TPU_KV_CHUNKS"]
    assert np.array_equal(ref, out), f"gated vs XLA diverged: {ref} vs {out}"
    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    ung, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn(cfg, use_pallas=True), dense,
        kc, vc, n0, STEPS,
    )
    assert np.array_equal(out, ung), \
        f"gated vs ungated diverged: {out} vs {ung}"
    return (f"S={block_size} n0={start}: {STEPS} steps equal "
            f"(XLA == gated == ungated)")


@_check("kv chunk-gated batched lanes (divergent chunk bounds)")
def check_kv_gated_batched(dtype):
    # lanes on both sides of the 256-row chunk boundary: the per-lane gate
    # streams 1 chunk for lanes 0-1 and 2 chunks for lanes 2-3, and the
    # zero-fill must keep the shared scratch junk-free for the small lanes
    sec = _model(block_size=512)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    B = 4
    n0_lanes = jnp.asarray([5, 100, 260, 470], jnp.int32)

    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, batch=B)
    out, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn_batched(cfg, use_pallas=True), dense,
        kc, vc, n0_lanes, STEPS, batch=B,
    )
    for b in range(B):
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
        ref, _, _ = _greedy_chain(
            cfg, kdec.select_decode_fn(cfg, use_pallas=True), dense,
            kc, vc, n0_lanes[b : b + 1], STEPS,
        )
        assert np.array_equal(ref, out[:, b]), \
            f"lane {b} diverged: {ref} vs {out[:, b]}"
    return f"B={B} lanes straddling the chunk boundary equal"


@_check("batched kernel vs single-lane")
def check_batched(dtype):
    sec = _model()
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    B = 4
    # divergent lanes: different starting n_past (crossing different
    # 8-row windows at different steps)
    n0_lanes = jnp.asarray([5, 8, 13, 21], jnp.int32)

    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, batch=B)
    out, _, _ = _greedy_chain(
        cfg, kdec.select_decode_fn_batched(cfg, use_pallas=True), dense,
        kc, vc, n0_lanes, STEPS, batch=B,
    )
    for b in range(B):
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
        ref, _, _ = _greedy_chain(
            cfg, kdec.select_decode_fn(cfg, use_pallas=True), dense,
            kc, vc, n0_lanes[b : b + 1], STEPS,
        )
        assert np.array_equal(ref, out[:, b]), \
            f"lane {b} diverged: {ref} vs {out[:, b]}"
    return f"B={B} divergent lanes equal"


@_check("batched window kernel at serving-saturation B=32 (int8-KV)")
def check_batched_b32(dtype):
    # The batch-scaling sweep (bench.py --batch-sweep, README) saturates
    # throughput at B~16-32 with --kv int8; this gates the exact serving
    # configuration at the LARGEST served B: the batched whole-window
    # kernel at B=32 with the int8 KV cache must produce per-lane tokens
    # bit-equal to the stepped batched path, with lanes straddling many
    # different 8-row cache windows.
    from bark_tpu.kernels import window as kwin
    from bark_tpu.ops import sampling

    sec = _model(block_size=256)
    cfg, dense = loader.gpt_params_from_section(sec, dtype)
    B, svs, cbs = 32, 32, 64
    lmw = (svs, svs + 2 * cbs)
    sws = 10
    # 32 divergent lanes: ctx_len 33..64, crossing different 8-row
    # windows at different steps
    ctx_len = jnp.asarray(33 + np.arange(B), jnp.int32)
    pp = kdec.prepare_decode_params(cfg, dense, lm_window=lmw)
    pp = kwin.prepare_window_params(cfg, pp, svs=svs, cbs=cbs)
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(29)
    subs_w = jax.vmap(
        lambda k: jax.random.split(k, sws)
    )(jax.vmap(jax.random.PRNGKey)(jnp.arange(B))).swapaxes(0, 1)

    def prefill():
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, batch=B, quant=True)
        toks_ctx = jnp.asarray(
            rng.integers(0, sec.hparams.n_in_vocab, (B, 64)), jnp.int32
        )
        x_emb = jnp.take(dense["wte"][0], toks_ctx, axis=0)
        return jax.vmap(
            lambda x, k, v, cl: gpt.prefill(cfg, dense, x, k, v, cl),
            in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
        )(x_emb, kc, vc, ctx_len)

    rng = np.random.default_rng(29)
    logits, kc, vc = prefill()
    ref = []
    for j in range(sws):
        base = svs + (0 if j % 2 == 0 else cbs)
        rel = logits[:, base : base + cbs]
        toks = base + jnp.asarray([
            int(sampling.sample(subs_w[j, b], rel[b], 0.7, 0, 0.0)[0])
            for b in range(B)
        ], jnp.int32)
        logits, kc, vc = kdec.decode_step_fused_batched(
            cfg, pp, toks, kc, vc, ctx_len + j,
            lm_window=lmw, interpret=interp,
        )
        ref.append(np.asarray(toks))
    ref = np.stack(ref, axis=1)  # (B, sws)

    rng = np.random.default_rng(29)
    logits0, kc, vc = prefill()
    out, _, _ = kwin.coarse_window_fused_batched(
        cfg, pp, logits0, kc, vc, ctx_len, jnp.int32(0), subs_w,
        sws=sws, temp=0.7, semantic_vocab_size=svs, codebook_size=cbs,
        lm_window=lmw, interpret=interp,
    )
    out = np.asarray(out)
    assert np.array_equal(out, ref), \
        f"lanes diverged at B={B}: {np.argwhere(out != ref)[:8]}"
    return f"{B}x{sws} tokens equal (int8-KV)"


@_check("e2e packed serving (file->quantize->generate)")
def check_e2e():
    # the tpu_e2e_quant flow: quantized file served dense vs packed must be
    # bit-identical at temp 0 through the whole text->wav pipeline
    import tempfile

    import bark_tpu
    import tests.tiny_model as tm
    from bark_tpu.params import BarkContextParams
    from test_quant_decode import _section
    from tests.tiny_model import _codec_section

    rng = np.random.default_rng(7)
    # 512-row caches (vs the old 320): block_size % 256 == 0 makes the
    # coarse/semantic stages eligible for the fused Pallas prefill
    # (kernels/prefill.py), so this e2e also exercises prefill-kernel ->
    # decode-kernel cache hand-off on hardware, in both dense and packed
    # serving
    sem = _section(ggml.GGMLType.F32, block_size=512)
    coarse = _section(ggml.GGMLType.F32, block_size=512)
    from bark_tpu.kernels import prefill as kpre

    assert kpre.supports_fused_prefill(
        loader.gpt_params_from_section(sem, jnp.float32)[0], 257
    ), "e2e model shape should support the fused prefill"
    fine_t = {}
    Df = 32

    def addf(name, arr):
        fine_t[name] = ggml.TensorRecord.from_array(
            name, arr.astype(np.float32), ggml.GGMLType.F32
        )

    for i in range(8):
        addf(f"model/wte/{i}", rng.normal(0, .08, (9, Df)))
    addf("model/wpe", rng.normal(0, .08, (64, Df)))
    for i in range(7):
        addf(f"model/lm_head/{i}", rng.normal(0, .08, (9, Df)))
    addf("model/ln_f/g", np.ones(Df))
    addf("model/ln_f/b", np.zeros(Df))
    for i in range(2):
        addf(f"model/h{i}/ln_1/g", np.ones(Df))
        addf(f"model/h{i}/ln_1/b", np.zeros(Df))
        addf(f"model/h{i}/ln_2/g", np.ones(Df))
        addf(f"model/h{i}/ln_2/b", np.zeros(Df))
        addf(f"model/h{i}/attn/c_attn/w", rng.normal(0, .08, (3 * Df, Df)))
        addf(f"model/h{i}/attn/c_proj/w", rng.normal(0, .08, (Df, Df)))
        addf(f"model/h{i}/mlp/c_fc/w", rng.normal(0, .08, (4 * Df, Df)))
        addf(f"model/h{i}/mlp/c_proj/w", rng.normal(0, .08, (Df, 4 * Df)))
        addf(f"model/h{i}/attn/c_attn/b", rng.normal(0, .08, (3 * Df,)))
        addf(f"model/h{i}/attn/c_proj/b", rng.normal(0, .08, (Df,)))
        addf(f"model/h{i}/mlp/c_fc/b", rng.normal(0, .08, (4 * Df,)))
        addf(f"model/h{i}/mlp/c_proj/b", rng.normal(0, .08, (Df,)))
    fine = ggml.GPTSection(
        ggml.GPTHParams(n_layer=2, n_head=2, n_embd=Df, block_size=64,
                        bias=1, n_in_vocab=9, n_out_vocab=9, n_lm_heads=7,
                        n_wtes=8, ftype=0),
        fine_t)
    codec = _codec_section(np.random.default_rng(1))
    mf = ggml.ModelFile(vocab=tm.VOCAB, semantic=sem, coarse=coarse,
                        fine=fine, codec=codec)
    tmp = tempfile.mkdtemp(prefix="tpu_check_")
    src = os.path.join(tmp, "aligned.bin")
    dst = os.path.join(tmp, "aligned_q5.bin")
    ggml.write_model_file(src, mf)
    assert bark_tpu.bark_model_quantize(
        src, dst, int(ggml.GGMLFType.MOSTLY_Q5_0)
    )

    def params(**kw):
        return BarkContextParams(
            temp=0.0, fine_temp=0.0, min_eos_p=2.0, n_steps_text_encoder=6,
            sliding_window_size=20, max_coarse_history=20,
            semantic_vocab_size=16, semantic_pad_token=16,
            semantic_infer_token=299, text_pad_token=290,
            text_encoding_offset=100, coarse_infer_token=50,
            coarse_semantic_pad_token=40, codebook_size=8,
            compute_dtype="float32", **kw)

    dense = bark_tpu.bark_load_model(
        dst, params(dequantize_on_load=True), seed=0
    )
    assert dense.generate_audio("hello world")
    packed = bark_tpu.bark_load_model(
        dst, params(dequantize_on_load=False), seed=0
    )
    # on TPU the causal stages must serve packed (in-kernel dequant); the
    # CPU smoke run of this tool falls back to dense there
    on_tpu = jax.default_backend() == "tpu"
    assert packed._packed.get("semantic") == on_tpu, packed._packed
    assert packed._packed.get("coarse") == on_tpu, packed._packed
    assert packed.generate_audio("hello world")
    assert np.array_equal(dense.semantic_tokens, packed.semantic_tokens), \
        "semantic tokens diverged"
    assert np.array_equal(dense.fine_tokens, packed.fine_tokens), \
        "fine tokens diverged"
    assert np.array_equal(dense.generated_audio, packed.generated_audio), \
        "audio diverged"
    return f"audio {dense.generated_audio.shape} bit-identical"


@_check("bark-large kernel compile (scoped-vmem guard)")
def check_large(quant_label=""):
    # The scoped-vmem overflow class is invisible to interpret mode AND to
    # the gate's tiny shapes: Mosaic's compiled stack for the multi-step
    # loops only blows the 16 MB limit at production depth/width (measured
    # r3: bark-large semantic chunk, 12.07 MB modeled -> 16.23 MB real).
    # This check COMPILES AND RUNS one production-shaped invocation of the
    # three big kernels — semantic chunk (K=16, full 10240-lane vocab),
    # coarse whole-window (sws=60, production lm_window), fused prefill
    # (T=1024) — on bf16 bark-large weights generated on-device (no
    # uploads). Any VMEM plan regression fails here, not in a bench.
    from bark_tpu.kernels import prefill as kpre
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.kernels import window as kwin
    from bark_tpu.models.presets import BARK_LARGE

    quant = bool(quant_label)
    dtype = jnp.bfloat16
    details = []

    # ---- coarse: whole-window kernel at sws=60 ----
    cfg = BARK_LARGE["coarse"]
    svs, cbs, sws = 10000, 1024, 60
    lmw = (svs, svs + 2 * cbs)
    if quant:
        from bench import _pack_quantized_device

        qpack = _pack_quantized_device(cfg, quant_label, dtype, 0)
        dense = loader.dense_from_qpack(cfg, qpack, dtype=dtype)
        pp = kdec.prepare_decode_params(
            cfg, qpack, quant=True, lm_window=lmw
        )
    else:
        dense = gpt.init_params_device(cfg, 0, dtype=dtype)
        pp = kdec.prepare_decode_params(cfg, dense, lm_window=lmw)
    pp = kwin.prepare_window_params(
        cfg, pp, svs=svs, cbs=cbs, dense_wte=dense["wte"][0]
    )
    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    logits0 = jnp.zeros((cfg.n_out_vocab,), jnp.float32)
    subs = jax.random.split(jax.random.PRNGKey(0), sws)
    toks, kc, vc = kwin.coarse_window_fused(
        cfg, pp, logits0, kc, vc, jnp.int32(887), jnp.int32(0), subs,
        sws=sws, temp=0.7, semantic_vocab_size=svs, codebook_size=cbs,
        lm_window=lmw, quant=quant,
        interpret=jax.default_backend() != "tpu",
    )
    t = np.asarray(toks)
    assert t.shape == (sws,) and (t >= svs).all() and (t < svs + 2 * cbs).all()
    details.append("window60")
    if not quant:
        # int8-KV window at production shape — the `--kv int8` serving
        # config (r5): int8 slabs + (L, 1, S) VMEM scale state
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, quant=True)
        toks, kc, vc = kwin.coarse_window_fused(
            cfg, pp, logits0, kc, vc, jnp.int32(887), jnp.int32(0), subs,
            sws=sws, temp=0.7, semantic_vocab_size=svs, codebook_size=cbs,
            lm_window=lmw, interpret=jax.default_backend() != "tpu",
        )
        t = np.asarray(toks)
        assert t.shape == (sws,) and (t >= svs).all() \
            and (t < svs + 2 * cbs).all()
        details.append("window60kv8")
    del pp, kc, vc, dense
    if quant:
        del qpack

    # ---- semantic: chunk kernel K=16 over the full padded vocab ----
    cfg = BARK_LARGE["semantic"]
    K = 16
    if quant:
        from bench import _pack_quantized_device

        qpack = _pack_quantized_device(cfg, quant_label, dtype, 1)
        dense_wte = loader.dense_from_qpack(cfg, qpack, dtype=dtype)["wte"][0]
        pp = kdec.prepare_decode_params(cfg, qpack, quant=True)
        pp = ksem.prepare_semantic_params(cfg, pp, dense_wte=dense_wte)
    else:
        dense = gpt.init_params_device(cfg, 1, dtype=dtype)
        pp = kdec.prepare_decode_params(cfg, dense)
        pp = ksem.prepare_semantic_params(cfg, pp)
    kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
    key = jax.random.PRNGKey(0)
    gum = ksem.make_gumbel_rows(
        key, K, cfg.n_out_vocab, kdec._v_pad(cfg), 0.7
    )
    logits0 = jnp.zeros((cfg.n_out_vocab,), jnp.float32)
    toks, flags, _, _, _ = ksem.semantic_chunk_fused(
        cfg, pp, logits0, kc, vc, jnp.int32(257), jnp.int32(0),
        gum, jnp.float32(0.2), K=K, temp=0.7,
        semantic_vocab_size=10000, quant=quant,
        interpret=jax.default_backend() != "tpu",
    )
    t = np.asarray(toks)
    assert t.shape == (K,) and (t >= 0).all() and (t < cfg.n_out_vocab).all()
    details.append(f"chunk{K}")
    if not quant:
        kc, vc = gpt.init_kv_cache(cfg, dtype=dtype, quant=True)
        toks, flags, _, _, _ = ksem.semantic_chunk_fused(
            cfg, pp, logits0, kc, vc, jnp.int32(257), jnp.int32(0),
            gum, jnp.float32(0.2), K=K, temp=0.7,
            semantic_vocab_size=10000,
            interpret=jax.default_backend() != "tpu",
        )
        t = np.asarray(toks)
        assert t.shape == (K,) and (t >= 0).all() \
            and (t < cfg.n_out_vocab).all()
        details.append(f"chunk{K}kv8")

    # ---- prefill kernel at the full 1024-row context (dense only) ----
    if not quant:
        cfg = BARK_LARGE["coarse"]
        if kpre.supports_fused_prefill(cfg, cfg.block_size):
            dense = gpt.init_params_device(cfg, 2, dtype=dtype)
            dense = kpre.prepare_prefill_params(cfg, dense, lm_window=lmw)
            kc, vc = gpt.init_kv_cache(cfg, dtype=dtype)
            x_emb = jnp.take(
                dense["wte"][0],
                jnp.arange(cfg.block_size, dtype=jnp.int32) % 1000,
                axis=0,
            )
            logits, _, _ = kpre.prefill_fused(
                cfg, dense, x_emb, kc, vc, jnp.int32(887),
                interpret=jax.default_backend() != "tpu",
            )
            assert np.isfinite(np.asarray(logits[lmw[0]:lmw[1]])).all()
            details.append("prefill1024")

    return (quant_label or "dense bf16") + ": " + "+".join(details)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the e2e (whole-pipeline compile) check")
    ap.add_argument("--large", action="store_true",
                    help="ONLY run the bark-large-shaped kernel compile "
                    "checks (scoped-vmem guard; slow compiles, on-device "
                    "weights)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype for the kernel checks (f32 gives "
                    "the tightest XLA-vs-kernel agreement)")
    args = ap.parse_args(argv)

    from bark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # TPU f32 matmuls default to single-pass bf16 on the MXU; both the XLA
    # and kernel paths then carry ~1e-2-magnitude rounding that flips
    # argmax near-ties (measured r3: q4_k's coarse 4-bit lattice produced
    # top-2 logit margins of ~0.02 and spurious token "divergence"; at
    # highest precision the paths agree to ~7e-6 and 100% argmax). The
    # gate's token-equality contract is only meaningful with real f32 dots.
    jax.config.update("jax_default_matmul_precision", "highest")
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind} "
          f"(backend={jax.default_backend()})", flush=True)
    if jax.default_backend() != "tpu":
        print("WARNING: not a TPU backend — kernels run in interpret mode; "
              "this does NOT validate Mosaic/DMA behavior", flush=True)
    dtype = jnp.dtype(args.dtype)

    if args.large:
        # production-shape compile guard only (see check_large); the bf16
        # run needs default matmul precision (it IS the serving config)
        jax.config.update("jax_default_matmul_precision", "default")
        check_large()
        check_large("q8_0")
        failed = [n for n, ok in RESULTS if not ok]
        print(f"{len(RESULTS) - len(failed)}/{len(RESULTS)} checks passed"
              + (f"; FAILED: {failed}" if failed else ""), flush=True)
        return 1 if failed else 0

    check_dense(dtype)
    check_dense_window(dtype)
    check_quant(dtype, ggml.GGMLType.Q8_0, "q8_0")
    check_quant(dtype, ggml.GGMLType.Q4_K, "q4_k")
    check_prefill(dtype, 256)
    check_prefill(dtype, 130)
    check_window(dtype, 0.7, 0)
    check_window(dtype, 0.0, 1)
    check_window_batched(dtype, 0.7)
    check_window_quant(dtype, ggml.GGMLType.Q8_0, "q8_0", batched=True)
    check_window_quant(dtype, ggml.GGMLType.Q4_K, "q4_k")
    check_semantic(dtype, 0.7, 1.0)
    check_semantic(dtype, 0.7, 0.01)
    check_semantic(dtype, 0.0, 1.0)
    check_semantic_batched(dtype, 0.7, 1.0)
    check_semantic_variants(dtype)
    check_dyn_layers(dtype)
    check_dyn_batched(dtype)
    check_semantic_quant(dtype, ggml.GGMLType.Q8_0, "q8_0", batched=True)
    check_int8_kv(dtype)
    check_window_kv8(dtype)
    check_semantic_kv8(dtype)
    check_att_flags(dtype)
    check_kv_gated(dtype)
    check_kv_gated(dtype, block_size=1024, start=760)
    check_kv_gated_batched(dtype)
    check_batched(dtype)
    if not args.quick:
        check_batched_b32(dtype)
        check_e2e()

    failed = [n for n, ok in RESULTS if not ok]
    print(f"{len(RESULTS) - len(failed)}/{len(RESULTS)} checks passed"
          + (f"; FAILED: {failed}" if failed else ""), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
