"""Coarse stage: sliding-window re-prime + 60-step on-device decode scan.

Mirrors bark_eval_coarse_encoder (/root/reference/bark.cpp:1745-1863):

- stc_ratio = coarse_rate/semantic_rate * 2 codebooks (~3.006)
- n_steps = floor(len(semantic) * stc_ratio / 2) * 2
- every `sliding_window_size` (60) steps the context is rebuilt from the last
  ~209 semantic tokens (right-padded to 256 with coarse_semantic_pad_token,
  then coarse_infer_token) plus the last <=630 generated coarse tokens, and
  n_past resets to 0
- step sampling alternates the two codebook logit windows
  [10000, 11024) / [11024, 12048) and the emitted token keeps the offset
- final de-offset into [seq_len][2] codes

One jitted program evaluates a whole window (prefill over a static 887-slot
right-padded context + a 60-step lax.scan); the host only rebuilds the
(cheap, int32) context between windows, so there are ~n_steps/60 syncs per
utterance instead of n_steps.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.models import gpt
from bark_tpu.ops import sampling
from bark_tpu.params import BarkContextParams
from bark_tpu.utils import aot
from bark_tpu.utils.aot import aot_jit

# 256 semantic slots + 1 infer token + up to max_coarse_history coarse tokens
CTX_SEMANTIC = 256


def _pick_prefill(cfg, decode_fn, kv_quant, ctx_size):
    """See kernels/prefill.pick_prefill (shared with the semantic stage)."""
    from bark_tpu.kernels import prefill as kpre

    return kpre.pick_prefill(cfg, decode_fn, kv_quant, ctx_size)


def stc_fraction(params: BarkContextParams) -> Tuple[int, int]:
    """The semantic->coarse step ratio as an exact small fraction num/den.

    The reference computes `stc_ratio = coarse_rate/semantic_rate * 2` in
    floating point (bark.cpp:1775) and floors products of it. We do the same
    schedule in exact integer arithmetic so the host- and device-side
    schedules agree bit-for-bit (the device has no float64). For the default
    rates 75.0/49.9*2 this is exactly 1500/499; for arbitrary float rates the
    fraction is the closest rational with denominator <= 10^4, which matches
    the float schedule for every reachable n_semantic (<= block_size).
    """
    stc = (
        params.coarse_rate_hz
        / params.semantic_rate_hz
        * params.n_coarse_codebooks
    )
    frac = Fraction(stc).limit_denominator(10_000)
    return frac.numerator, frac.denominator


def coarse_schedule(n_semantic: int, params: BarkContextParams):
    """(stc_ratio, max_semantic_history, n_steps, n_windows).

    Integer-exact version of the reference's float schedule
    (bark.cpp:1775-1787); see `stc_fraction`.
    """
    num, den = stc_fraction(params)
    stc_ratio = num / den
    n_cc = params.n_coarse_codebooks
    max_semantic_history = params.max_coarse_history * den // num
    n_steps = (n_semantic * num) // (den * n_cc) * n_cc
    n_windows = -(-n_steps // params.sliding_window_size)
    return stc_ratio, max_semantic_history, n_steps, n_windows


def max_coarse_steps(max_semantic: int, params: BarkContextParams) -> int:
    """Static upper bound on n_steps for a given semantic-length bound."""
    num, den = stc_fraction(params)
    n_cc = params.n_coarse_codebooks
    return (max_semantic * num) // (den * n_cc) * n_cc


def make_coarse_window_program(
    cfg: gpt.GPTConfig,
    *,
    temp: float,
    sliding_window_size: int,
    semantic_vocab_size: int,
    codebook_size: int,
    ctx_size: int,
    top_k: int = 0,
    top_p: float = 0.0,
    decode_fn=None,
    kv_quant: bool = False,
):
    """fn(dparams, dense, ctx (ctx_size,) i32, ctx_len i32, step_idx0 i32,
    key) -> tokens (sliding_window_size,) i32 (offset-carrying, as the ref).

    Unlike the whole-stage programs (invoked once per utterance), this runs
    once PER WINDOW, so the expensive per-invocation weight passes — packed
    -quantized densify and the decode-kernel tile prep — happen in the
    caller, once per generate call (BarkContext._coarse_window_inputs):
    `dparams` arrives decode-ready (qpack or dense, tiles attached) and
    `dense` dequantized (for prefill/embedding)."""
    if decode_fn is None:
        decode_fn = partial(gpt.decode_step, cfg)
    pal_prefill = _pick_prefill(cfg, decode_fn, kv_quant, ctx_size)
    from bark_tpu.kernels import window as kwin

    use_window = kwin.supports_window_kernel(
        cfg, decode_fn, top_k=top_k, top_p=top_p, kv_quant=kv_quant
    )

    @aot_jit("coarse_win", fingerprint=aot.describe(
        cfg, temp, sliding_window_size, semantic_vocab_size,
        codebook_size, ctx_size, top_k, top_p, kv_quant,
        pal_prefill is not None, use_window,
        aot.describe_decode_fn(decode_fn),
    ))
    def run(dparams, dense, ctx_tokens, ctx_len, step_idx0, key):
        wte = dense["wte"][0]
        x_emb = jnp.take(wte, ctx_tokens, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=x_emb.dtype, quant=kv_quant)
        if pal_prefill is not None and "_prefill_tiles" in dense:
            # fused Pallas prefill writes the caches straight into the
            # decode kernel's aliased slabs (kernels/prefill.py); the
            # caller pre-attached the prefill tiles (once per generate)
            logits, kc, vc = pal_prefill(dense, x_emb, kc, vc, ctx_len)
        else:
            # chunked: skip dead right-pad rows (ulp-equivalent, gpt.py)
            logits, kc, vc = gpt.prefill_chunked(
                cfg, dense, x_emb, kc, vc, ctx_len
            )

        # step keys pre-split outside the scan (one vectorized threefry);
        # the fused stage program derives identically — keep in lockstep
        subs = jax.random.split(key, sliding_window_size)

        if use_window and "_wte_win" in dparams:
            # the whole window — 60 decode steps + sampling — as ONE
            # Pallas kernel (kernels/window.py); token-identical to the
            # scan below under the same subs
            toks, _, _ = kwin.coarse_window_fused(
                cfg, dparams, logits, kc, vc, ctx_len, step_idx0, subs,
                sws=sliding_window_size, temp=temp,
                semantic_vocab_size=semantic_vocab_size,
                codebook_size=codebook_size,
                lm_window=decode_fn.lm_window,
                quant=getattr(decode_fn, "quant", False),
                interpret=getattr(decode_fn, "interpret", False),
            )
            return toks

        def step(carry, xs):
            j, sub = xs
            logits, kc, vc = carry
            sidx = step_idx0 + j
            is_major = (sidx % 2) == 0
            base = jnp.int32(semantic_vocab_size) + jnp.where(
                is_major, 0, codebook_size
            )
            rel = jax.lax.dynamic_slice(
                logits, (base,), (codebook_size,)
            )
            tok_rel, _ = sampling.sample(sub, rel, temp, top_k, top_p)
            tok = base + tok_rel
            slot = ctx_len + j
            logits, kc, vc = decode_fn(dparams, tok, kc, vc, slot)
            return (logits, kc, vc), tok

        (_, _, _), toks = jax.lax.scan(
            step,
            (logits, kc, vc),
            (jnp.arange(sliding_window_size, dtype=jnp.int32), subs),
        )
        return toks

    return run


def generate_coarse(
    program,
    params,
    semantic_tokens: np.ndarray,
    bparams: BarkContextParams,
    key,
    ctx_size: int,
    progress_cb=None,
    sem_hist: np.ndarray = None,
    coarse_hist: np.ndarray = None,
) -> np.ndarray:
    """Host-side window orchestration. Returns codes [seq_len, 2] (de-offset).

    `params` is the (dparams, dense) pair the window program expects
    (BarkContext._coarse_window_inputs; plain params can be passed as
    (params, params) when nothing is packed/tiled).

    `sem_hist`/`coarse_hist` are a voice preset's trimmed histories
    (pipeline/voice.coarse_history): the semantic history prepends on the
    semantic axis (suno's base_semantic_idx) and the flattened
    offset-carrying coarse history seeds the output sequence; None/empty
    reproduces the reference's hardcoded empty history (bark.cpp:640-651).
    """
    sem_new = np.asarray(semantic_tokens, np.int32)
    num, den = stc_fraction(bparams)
    stc_ratio, max_semantic_history, n_steps, n_windows = coarse_schedule(
        len(sem_new), bparams
    )
    assert n_steps > 0 and n_steps % bparams.n_coarse_codebooks == 0

    base_sem = 0 if sem_hist is None else len(sem_hist)
    sem = sem_new if base_sem == 0 else np.concatenate(
        [np.asarray(sem_hist, np.int32), sem_new]
    )
    out: List[int] = (
        [] if coarse_hist is None else np.asarray(coarse_hist).tolist()
    )
    n_ch = len(out)

    sws = bparams.sliding_window_size
    for w in range(n_windows):
        step_idx = w * sws
        # rebuild context exactly like bark.cpp:1788-1807
        # roundf (half away from zero), like bark.cpp:1789; integer-exact
        semantic_idx = base_sem + (2 * step_idx * den + num) // (2 * num)
        lo = max(semantic_idx - max_semantic_history, 0)
        sem_part = sem[lo:][:CTX_SEMANTIC]
        ctx = np.full((ctx_size,), 0, np.int32)
        ctx[:CTX_SEMANTIC] = bparams.coarse_semantic_pad_token
        ctx[: len(sem_part)] = sem_part
        ctx[CTX_SEMANTIC] = bparams.coarse_infer_token
        hist = out[-bparams.max_coarse_history :]
        ctx[CTX_SEMANTIC + 1 : CTX_SEMANTIC + 1 + len(hist)] = hist
        ctx_len = CTX_SEMANTIC + 1 + len(hist)

        key, sub = jax.random.split(key)
        toks = program(
            *params,
            jnp.asarray(ctx),
            jnp.int32(ctx_len),
            jnp.int32(step_idx),
            sub,
        )
        n_valid = min(sws, n_steps - step_idx)
        out.extend(np.asarray(toks)[:n_valid].tolist())
        if progress_cb is not None:
            progress_cb(min(100, 100 * (step_idx + n_valid) // n_steps))

    assert len(out) - n_ch == n_steps
    arr = np.asarray(out[n_ch:], np.int32).reshape(
        -1, bparams.n_coarse_codebooks
    )
    # de-offset (bark.cpp:1851-1857)
    arr = arr - bparams.semantic_vocab_size
    arr[:, 1] -= bparams.codebook_size
    return arr


def make_coarse_stage_program(
    cfg: gpt.GPTConfig,
    bparams: BarkContextParams,
    *,
    ctx_size: int,
    max_semantic: int,
    decode_fn=None,
    densify=None,
    decode_on_dense: bool = False,
    kv_quant: bool = False,
):
    """The whole coarse stage as ONE on-device program.

    The stepped path (`generate_coarse`) syncs with the host once per
    60-token window; through a remote-TPU tunnel each sync costs tens of ms.
    Here the window loop — schedule math, context rebuild, prefill, 60-step
    decode scan — is a `lax.while_loop`, so the host dispatches once and
    never reads back until the fine stage's output. The schedule uses the
    same exact integer arithmetic as `coarse_schedule`, so the two paths
    produce identical tokens for identical keys (tested).

    Voice-preset histories (suno generate_coarse; pipeline/voice.py) enter
    as left-aligned fixed-size buffers + lengths: the semantic history is
    prepended on the semantic axis (window indices offset by n_sem_hist,
    suno's base_semantic_idx) and the flattened coarse history preloads the
    output buffer (generation appends after it; the de-offset slice skips
    it). Zero lengths reproduce the reference's empty history exactly.

    fn(params, sem_buf (max_semantic,) i32, n_sem i32, key,
       sem_hist (max_sem_hist,) i32, n_sem_hist i32,
       coarse_hist (max_coarse_history,) i32 offset-carrying,
       n_coarse_hist i32)
      -> (codes (max_steps//n_cc, n_cc) i32 de-offset, n_steps i32)
    """
    if decode_fn is None:
        decode_fn = partial(gpt.decode_step, cfg)
    has_densify = densify is not None
    if densify is None:
        densify = lambda p: p  # noqa: E731
    prepare = getattr(decode_fn, "prepare", lambda p: p)
    pal_prefill = _pick_prefill(cfg, decode_fn, kv_quant, ctx_size)
    p = bparams
    num, den = stc_fraction(p)
    n_cc = p.n_coarse_codebooks
    sws = p.sliding_window_size
    hist_cap = p.max_coarse_history
    max_sem_hist = max(1, hist_cap * den // num)
    max_steps = max_coarse_steps(max_semantic, p)
    # out buffer: preloaded coarse history (<= hist_cap) + generated tokens
    # (the last window may overrun by < sws); padded so a static-size
    # history slice never reads past it
    out_size = hist_cap + max_steps + sws
    sem_tot = max_sem_hist + max_semantic + CTX_SEMANTIC
    pad = p.coarse_semantic_pad_token
    temp = p.temp
    top_k, top_p = p.top_k, p.top_p
    svs = p.semantic_vocab_size
    cbs = p.codebook_size
    from bark_tpu.kernels import window as kwin

    use_window = n_cc == 2 and kwin.supports_window_kernel(
        cfg, decode_fn, top_k=top_k, top_p=top_p, kv_quant=kv_quant
    )

    @aot_jit("coarse_stage", fingerprint=aot.describe(
        cfg, p, ctx_size, max_semantic, decode_on_dense, kv_quant,
        has_densify, use_window,
        aot.describe_decode_fn(decode_fn),
    ))
    def run(params, sem_buf, n_sem, key, sem_hist, n_sem_hist, coarse_hist,
            n_coarse_hist):
        dense = densify(params)
        dparams = prepare(dense if decode_on_dense else params)
        dparams_w = (
            kwin.prepare_window_params(
                cfg, dparams, svs=svs, cbs=cbs,
                dense_wte=dense["wte"][0],
            )
            if use_window else None
        )
        if pal_prefill is not None:
            # prefill tile relayout ONCE per invocation (outside the
            # window while_loop — XLA does not hoist it)
            from bark_tpu.kernels import prefill as kpre

            dense = kpre.prepare_prefill_params(
                cfg, dense, lm_window=getattr(decode_fn, "lm_window", None)
            )
        n_steps = (n_sem * num) // (den * n_cc) * n_cc
        n_h = n_sem_hist
        n_ch = n_coarse_hist

        # combined semantic axis: [history | new tokens | pad...] — slots
        # beyond n_h + n_sem read as the pad token; extended by CTX_SEMANTIC
        # so a 256-slot slice never reads out of bounds
        ids = jnp.arange(sem_tot)
        hist_val = jnp.take(sem_hist, jnp.clip(ids, 0, max_sem_hist - 1))
        new_val = jnp.take(
            sem_buf, jnp.clip(ids - n_h, 0, max_semantic - 1)
        )
        sem_full = jnp.where(
            ids < n_h,
            hist_val,
            jnp.where(ids < n_h + n_sem, new_val, jnp.int32(pad)),
        )
        infer = jnp.full((1,), p.coarse_infer_token, jnp.int32)
        oids = jnp.arange(out_size)
        out0 = jnp.where(
            oids < n_ch,
            jnp.take(coarse_hist, jnp.clip(oids, 0, hist_cap - 1)),
            0,
        )

        def cond(carry):
            _, _, w = carry
            return w * sws < n_steps

        def body(carry):
            out, key, w = carry
            g = w * sws  # NEW tokens generated so far
            tot = n_ch + g  # position on the coarse axis incl. history
            # base_semantic_idx + roundf(g / stc_ratio), integer-exact
            # (bark.cpp:1789 / suno generate_coarse)
            semantic_idx = n_h + (2 * g * den + num) // (2 * num)
            lo = jnp.maximum(semantic_idx - max_sem_hist, 0)
            sem_part = jax.lax.dynamic_slice(sem_full, (lo,), (CTX_SEMANTIC,))
            hist_start = jnp.maximum(tot - hist_cap, 0)
            hist = jax.lax.dynamic_slice(out, (hist_start,), (hist_cap,))
            ctx = jnp.concatenate([sem_part, infer, hist])[:ctx_size]
            ctx_len = CTX_SEMANTIC + 1 + jnp.minimum(tot, hist_cap)

            # prefill + 60-step decode scan (same body as the stepped path)
            wte = dense["wte"][0]
            x_emb = jnp.take(wte, ctx, axis=0)
            kc, vc = gpt.init_kv_cache(
                cfg, dtype=x_emb.dtype, quant=kv_quant
            )
            if pal_prefill is not None:
                # fused Pallas prefill: caches land in the decode kernel's
                # aliased slab form, no hand-off (kernels/prefill.py)
                logits, kc, vc = pal_prefill(dense, x_emb, kc, vc, ctx_len)
            else:
                # chunked: live rows only (ulp-equivalent to full, gpt.py)
                logits, kc, vc = gpt.prefill_chunked(
                    cfg, dense, x_emb, kc, vc, ctx_len
                )

            key, sub = jax.random.split(key)
            # pre-split the window's step keys (lockstep with the window
            # program: subs = split(window_key, sws))
            subs = jax.random.split(sub, sws)

            if use_window:
                # whole window in one Pallas kernel (kernels/window.py);
                # token-identical to the scan under the same subs
                toks, _, _ = kwin.coarse_window_fused(
                    cfg, dparams_w, logits, kc, vc, ctx_len, g, subs,
                    sws=sws, temp=temp, semantic_vocab_size=svs,
                    codebook_size=cbs, lm_window=decode_fn.lm_window,
                    quant=getattr(decode_fn, "quant", False),
                    interpret=getattr(decode_fn, "interpret", False),
                )
                out = jax.lax.dynamic_update_slice(out, toks, (tot,))
                return (out, key, w + 1)

            def step(c, xs):
                j, s = xs
                logits, kc, vc = c
                sidx = g + j
                is_major = (sidx % n_cc) == 0
                base = jnp.int32(svs) + jnp.where(is_major, 0, cbs)
                rel = jax.lax.dynamic_slice(logits, (base,), (cbs,))
                tok_rel, _ = sampling.sample(s, rel, temp, top_k, top_p)
                tok = base + tok_rel
                logits, kc, vc = decode_fn(dparams, tok, kc, vc, ctx_len + j)
                return (logits, kc, vc), tok

            (_, _, _), toks = jax.lax.scan(
                step,
                (logits, kc, vc),
                (jnp.arange(sws, dtype=jnp.int32), subs),
            )
            out = jax.lax.dynamic_update_slice(out, toks, (tot,))
            return (out, key, w + 1)

        out, _, _ = jax.lax.while_loop(cond, body, (out0, key, jnp.int32(0)))

        # de-offset (bark.cpp:1851-1857), skipping the preloaded history;
        # invalid tail rows carry garbage, consumers slice [:n_steps//n_cc]
        gen = jax.lax.dynamic_slice(out, (n_ch,), (max_steps,))
        codes = gen.reshape(-1, n_cc) - svs
        codes = codes - jnp.arange(n_cc, dtype=jnp.int32)[None, :] * cbs
        return codes, n_steps

    return run


def make_coarse_stage_program_batched(
    cfg: gpt.GPTConfig,
    bparams: BarkContextParams,
    *,
    batch: int,
    ctx_size: int,
    max_semantic: int,
    decode_fn=None,
    densify=None,
    decode_on_dense: bool = False,
    kv_quant: bool = False,
):
    """Natively-batched whole coarse stage: the window while_loop and the
    60-step decode scan run once for all B lanes (the batched Pallas kernel
    streams each weight tile once per step; see
    make_semantic_program_batched for why this beats vmapping the
    single-lane program).

    Lanes share the window counter — the window/step schedule is a pure
    function of each lane's semantic count, so a lane past its own n_steps
    keeps decoding garbage whose writes into its `out` are masked off.
    Token-identical per lane to make_coarse_stage_program for the same
    per-lane key (tested). Voice-preset histories are per-lane (see the
    single-lane program's docstring for the layout).

    fn(params, sem_buf (B, max_semantic) i32, n_sem (B,) i32, keys (B, 2),
       sem_hist (B, max_sem_hist) i32, n_sem_hist (B,) i32,
       coarse_hist (B, max_coarse_history) i32, n_coarse_hist (B,) i32)
      -> (codes (B, max_steps//n_cc, n_cc) i32 de-offset, n_steps (B,) i32)
    """
    B = batch
    if decode_fn is None:
        decode_fn = jax.vmap(
            partial(gpt.decode_step, cfg),
            in_axes=(None, 0, 1, 1, 0), out_axes=(0, 1, 1),
        )
    has_densify = densify is not None
    if densify is None:
        densify = lambda p: p  # noqa: E731
    prepare = getattr(decode_fn, "prepare", lambda p: p)
    p = bparams
    num, den = stc_fraction(p)
    n_cc = p.n_coarse_codebooks
    sws = p.sliding_window_size
    hist_cap = p.max_coarse_history
    max_sem_hist = max(1, hist_cap * den // num)
    max_steps = max_coarse_steps(max_semantic, p)
    out_size = hist_cap + max_steps + sws
    sem_tot = max_sem_hist + max_semantic + CTX_SEMANTIC
    pad = p.coarse_semantic_pad_token
    temp = p.temp
    top_k, top_p = p.top_k, p.top_p
    svs = p.semantic_vocab_size
    cbs = p.codebook_size
    from bark_tpu.kernels import prefill as kpre
    from bark_tpu.kernels import window as kwin

    use_window = n_cc == 2 and kwin.supports_window_kernel_batched(
        cfg, decode_fn, top_k=top_k, top_p=top_p, kv_quant=kv_quant
    )
    pal_prefill_b = kpre.pick_prefill_batched(
        cfg, decode_fn, kv_quant, ctx_size, B
    )

    @aot_jit(f"coarse_stage_b{B}", fingerprint=aot.describe(
        cfg, p, ctx_size, max_semantic, decode_on_dense, kv_quant,
        has_densify, use_window,
        aot.describe_decode_fn(decode_fn),
    ))
    def run(params, sem_buf, n_sem, keys, sem_hist, n_sem_hist,
            coarse_hist, n_coarse_hist):
        dense = densify(params)
        dparams = prepare(dense if decode_on_dense else params)
        dparams_w = (
            kwin.prepare_window_params(
                cfg, dparams, svs=svs, cbs=cbs,
                dense_wte=dense["wte"][0],
            )
            if use_window else None
        )
        if pal_prefill_b is not None:
            # prefill tile relayout once per invocation (outside the
            # window while_loop)
            dense = kpre.prepare_prefill_params(
                cfg, dense, lm_window=getattr(decode_fn, "lm_window", None)
            )
        n_steps = (n_sem * num) // (den * n_cc) * n_cc  # (B,)

        def build_sem_full(hist_b, buf_b, n_h, n_s):
            ids = jnp.arange(sem_tot)
            hist_val = jnp.take(hist_b, jnp.clip(ids, 0, max_sem_hist - 1))
            new_val = jnp.take(
                buf_b, jnp.clip(ids - n_h, 0, max_semantic - 1)
            )
            return jnp.where(
                ids < n_h,
                hist_val,
                jnp.where(ids < n_h + n_s, new_val, jnp.int32(pad)),
            )

        sem_full = jax.vmap(build_sem_full)(
            sem_hist, sem_buf, n_sem_hist, n_sem
        )  # (B, sem_tot)
        infer = jnp.full((1,), p.coarse_infer_token, jnp.int32)
        oids = jnp.arange(out_size)
        out0 = jnp.where(
            oids[None, :] < n_coarse_hist[:, None],
            jnp.take(
                coarse_hist, jnp.clip(oids, 0, hist_cap - 1), axis=1
            ),
            0,
        )  # (B, out_size)
        wte = dense["wte"][0]

        def build_ctx(sem_full_b, out_b, n_h, tot, g):
            semantic_idx = n_h + (2 * g * den + num) // (2 * num)
            lo = jnp.maximum(semantic_idx - max_sem_hist, 0)
            sem_part = jax.lax.dynamic_slice(
                sem_full_b, (lo,), (CTX_SEMANTIC,)
            )
            hist_start = jnp.maximum(tot - hist_cap, 0)
            hist = jax.lax.dynamic_slice(out_b, (hist_start,), (hist_cap,))
            return jnp.concatenate([sem_part, infer, hist])[:ctx_size]

        def cond(carry):
            _, _, w = carry
            return jnp.any(w * sws < n_steps)

        def body(carry):
            out, keys, w = carry
            g = w * sws  # scalar: lanes share the window schedule
            lane_active = g < n_steps  # (B,)
            tot = n_coarse_hist + g  # (B,)
            ctx = jax.vmap(build_ctx, in_axes=(0, 0, 0, 0, None))(
                sem_full, out, n_sem_hist, tot, g
            )  # (B, ctx_size)
            ctx_len = CTX_SEMANTIC + 1 + jnp.minimum(tot, hist_cap)  # (B,)

            x_emb = jnp.take(wte, ctx, axis=0)  # (B, ctx_size, D)
            kc, vc = gpt.init_kv_cache(
                cfg, dtype=x_emb.dtype, batch=B, quant=kv_quant
            )
            if pal_prefill_b is not None:
                # batched fused Pallas prefill: every lane's K/V lands in
                # the batched decode kernels' aliased slabs — no XLA
                # prefill, no cache hand-off (kernels/prefill.py)
                logits, kc, vc = pal_prefill_b(
                    dense, x_emb, kc, vc, ctx_len
                )
            else:
                # full (not chunked) prefill: vmap of prefill_chunked's
                # while_loop would run every lane to the max block count
                # AND select the whole per-lane KV carry each iteration —
                # costlier than the dead-row compute it avoids
                logits, kc, vc = jax.vmap(
                    lambda x, k, v, cl: gpt.prefill(cfg, dense, x, k, v, cl),
                    in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
                )(x_emb, kc, vc, ctx_len)

            ks = jax.vmap(jax.random.split)(keys)
            keys, subs = ks[:, 0], ks[:, 1]
            # per-lane step keys pre-split, lockstep with the single-lane
            # programs (subs_w[b, j] == split(sub_b, sws)[j])
            subs_w = jax.vmap(
                lambda k: jax.random.split(k, sws)
            )(subs).swapaxes(0, 1)  # (sws, B, 2)

            if use_window:
                # whole window for all lanes in one Pallas kernel
                # (kernels/window.py); per-lane token-identical to the
                # scan under the same subs_w
                toks, _, _ = kwin.coarse_window_fused_batched(
                    cfg, dparams_w, logits, kc, vc, ctx_len, g, subs_w,
                    sws=sws, temp=temp, semantic_vocab_size=svs,
                    codebook_size=cbs, lm_window=decode_fn.lm_window,
                    quant=getattr(decode_fn, "quant", False),
                    interpret=getattr(decode_fn, "interpret", False),
                )  # (B, sws)
                out = jax.vmap(
                    lambda o, t, a, tt: jnp.where(
                        a, jax.lax.dynamic_update_slice(o, t, (tt,)), o
                    )
                )(out, toks, lane_active, tot)
                return (out, keys, w + 1)

            def step(c, xs):
                j, s = xs
                logits, kc, vc = c
                sidx = g + j
                is_major = (sidx % n_cc) == 0
                base = jnp.int32(svs) + jnp.where(is_major, 0, cbs)
                rel = jax.vmap(
                    lambda lg: jax.lax.dynamic_slice(lg, (base,), (cbs,))
                )(logits)
                toks_rel = jax.vmap(
                    lambda sk, r: sampling.sample(sk, r, temp, top_k, top_p)[0]
                )(s, rel)
                toks = base + toks_rel
                logits, kc, vc = decode_fn(dparams, toks, kc, vc, ctx_len + j)
                return (logits, kc, vc), toks

            (_, _, _), toks = jax.lax.scan(
                step,
                (logits, kc, vc),
                (jnp.arange(sws, dtype=jnp.int32), subs_w),
            )
            toks = toks.T  # (B, sws)
            out = jax.vmap(
                lambda o, t, a, tt: jnp.where(
                    a, jax.lax.dynamic_update_slice(o, t, (tt,)), o
                )
            )(out, toks, lane_active, tot)
            return (out, keys, w + 1)

        out, _, _ = jax.lax.while_loop(cond, body, (out0, keys, jnp.int32(0)))

        gen = jax.vmap(
            lambda o, nc: jax.lax.dynamic_slice(o, (nc,), (max_steps,))
        )(out, n_coarse_hist)
        codes = gen.reshape(B, -1, n_cc) - svs
        codes = codes - jnp.arange(n_cc, dtype=jnp.int32)[None, None, :] * cbs
        return codes, n_steps

    return run
