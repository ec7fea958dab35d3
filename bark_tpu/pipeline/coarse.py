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
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.models import gpt
from bark_tpu.ops import sampling
from bark_tpu.params import BarkContextParams

# 256 semantic slots + 1 infer token + up to max_coarse_history coarse tokens
CTX_SEMANTIC = 256


def coarse_schedule(n_semantic: int, params: BarkContextParams):
    """(stc_ratio, max_semantic_history, n_steps, n_windows)."""
    stc_ratio = (
        params.coarse_rate_hz / params.semantic_rate_hz * params.n_coarse_codebooks
    )
    max_semantic_history = int(
        math.floor(params.max_coarse_history / stc_ratio)
    )
    n_steps = (
        int(math.floor(n_semantic * stc_ratio / params.n_coarse_codebooks))
        * params.n_coarse_codebooks
    )
    n_windows = int(math.ceil(n_steps / params.sliding_window_size))
    return stc_ratio, max_semantic_history, n_steps, n_windows


def make_coarse_window_program(
    cfg: gpt.GPTConfig,
    *,
    temp: float,
    sliding_window_size: int,
    semantic_vocab_size: int,
    codebook_size: int,
    ctx_size: int,
):
    """fn(params, ctx (ctx_size,) i32, ctx_len i32, step_idx0 i32, key)
    -> tokens (sliding_window_size,) i32 (offset-carrying, as the ref)."""

    @jax.jit
    def run(params, ctx_tokens, ctx_len, step_idx0, key):
        wte = params["wte"][0]
        x_emb = jnp.take(wte, ctx_tokens, axis=0)
        kc, vc = gpt.init_kv_cache(cfg, dtype=x_emb.dtype)
        logits, kc, vc = gpt.prefill(cfg, params, x_emb, kc, vc, ctx_len)

        def step(carry, j):
            logits, kc, vc, key = carry
            key, sub = jax.random.split(key)
            sidx = step_idx0 + j
            is_major = (sidx % 2) == 0
            base = jnp.int32(semantic_vocab_size) + jnp.where(
                is_major, 0, codebook_size
            )
            rel = jax.lax.dynamic_slice(
                logits, (base,), (codebook_size,)
            )
            tok_rel, _ = sampling.sample(sub, rel, temp)
            tok = base + tok_rel
            slot = ctx_len + j
            logits, kc, vc = gpt.decode_step(cfg, params, tok, kc, vc, slot)
            return (logits, kc, vc, key), tok

        (_, _, _, _), toks = jax.lax.scan(
            step,
            (logits, kc, vc, key),
            jnp.arange(sliding_window_size, dtype=jnp.int32),
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
) -> np.ndarray:
    """Host-side window orchestration. Returns codes [seq_len, 2] (de-offset)."""
    sem = np.asarray(semantic_tokens, np.int32)
    stc_ratio, max_semantic_history, n_steps, n_windows = coarse_schedule(
        len(sem), bparams
    )
    assert n_steps > 0 and n_steps % bparams.n_coarse_codebooks == 0

    sws = bparams.sliding_window_size
    out: List[int] = []
    for w in range(n_windows):
        step_idx = w * sws
        # rebuild context exactly like bark.cpp:1788-1807
        # roundf (half away from zero), like bark.cpp:1789
        semantic_idx = int(math.floor(step_idx / stc_ratio + 0.5))
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
            params,
            jnp.asarray(ctx),
            jnp.int32(ctx_len),
            jnp.int32(step_idx),
            sub,
        )
        n_valid = min(sws, n_steps - step_idx)
        out.extend(np.asarray(toks)[:n_valid].tolist())
        if progress_cb is not None:
            progress_cb(min(100, 100 * (step_idx + n_valid) // n_steps))

    assert len(out) == n_steps
    arr = np.asarray(out, np.int32).reshape(-1, bparams.n_coarse_codebooks)
    # de-offset (bark.cpp:1851-1857)
    arr = arr - bparams.semantic_vocab_size
    arr[:, 1] -= bparams.codebook_size
    return arr
