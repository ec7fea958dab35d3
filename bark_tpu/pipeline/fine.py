"""Fine stage: non-causal block refinement of the coarse codes.

Mirrors bark_eval_fine_encoder (/root/reference/bark.cpp:1961-2059):

- input [seq_len, 2] coarse codes; channels 2..7 padded with codebook_size
  (1024); sequence right-padded to >= 1024 rows of all-1024
- n_loops = max(0, ceil((len-1024)/512)) + 1 blocks of 1024 positions with a
  512-position hop
- per block, for each codebook nn in [2, 8): one full non-causal forward,
  every position sampled at fine_temp from the first `codebook_size` of its
  1056 logits, and the sampled column written back so later codebooks
  condition on it

Divergence from the reference, on purpose: for multi-block sequences the
reference writes position i's sample into slot `rel_start_fill_idx + i` of
the block (bark.cpp:2038) — shifting samples by rel_start_fill_idx and
overrunning into the next codebook's buffer row. That is a bug in the C++
port (suno's reference implementation samples positions
[rel_start_fill_idx, 1024) and writes them in place); we implement the suno
semantics: sample all positions, keep [rel_start_fill_idx, 1024).

The whole 6-codebook refinement of one block is a single jitted program.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.models import gpt
from bark_tpu.ops import sampling
from bark_tpu.params import BarkContextParams
from bark_tpu.utils import aot
from bark_tpu.utils.aot import aot_jit


def make_fine_block_program(
    cfg: gpt.GPTConfig,
    *,
    fine_temp: float,
    n_coarse: int,
    n_fine: int,
    codebook_size: int,
):
    """fn(params, codes (block,n_fine) i32, rel_start i32, key)
    -> refined codes (block, n_fine) i32.

    Runs once PER BLOCK, so `params` must arrive dense — packed-quantized
    contexts densify once per generate call in the caller
    (BarkContext._stage_dense_params), not here."""
    block = cfg.block_size

    @aot_jit("fine_block", fingerprint=aot.describe(
        cfg, fine_temp, n_coarse, n_fine, codebook_size,
    ))
    def run(params, codes, rel_start, key):
        keep = jnp.arange(block, dtype=jnp.int32) >= rel_start
        buf = codes
        for nn in range(n_coarse, n_fine):
            key, sub = jax.random.split(key)
            logits = gpt.fine_forward(cfg, params, buf, nn)
            toks = sampling.sample_rows(
                sub, logits[:, :codebook_size], fine_temp
            )
            buf = buf.at[:, nn].set(jnp.where(keep, toks, buf[:, nn]))
        return buf

    return run


def make_fine_stage_program(
    cfg: gpt.GPTConfig,
    bparams: BarkContextParams,
    *,
    max_frames: int,
    densify=None,
):
    """The whole fine stage as ONE on-device program.

    Block schedule (1024-position blocks, 512 hop) and per-block refinement
    are identical to the stepped path (`generate_fine`, mirroring
    bark.cpp:1990-2046), but run in a `lax.while_loop` so the host never
    syncs between blocks. Produces identical tokens to the stepped path for
    identical keys (tested).

    Voice-preset fine history (suno generate_fine): up to 512 history rows
    prepend the input and condition the first block(s); the fill schedule
    skips them (start_fill_idx = n_hist + n*hop) and the returned buffer is
    shifted so rows [:n_frames] are still the generated result. n_hist=0
    reproduces the reference exactly.

    fn(params, codes (max_frames, n_coarse) i32, n_frames i32, key,
       fine_hist (512, n_fine) i32, n_hist i32)
      -> in_arr (P, n_fine) i32; rows [:n_frames] are the result.
    """
    from bark_tpu.pipeline.voice import FINE_HISTORY_MAX

    block = cfg.block_size
    hop = block // 2
    n_coarse = bparams.n_coarse_codebooks
    n_fine = bparams.n_fine_codebooks
    cbs = bparams.codebook_size
    fine_temp = bparams.fine_temp
    # static buffer: worst-case padded length incl. a full history prefix,
    # plus FINE_HISTORY_MAX so the shifted return slice stays in bounds
    t_cap = max(block, FINE_HISTORY_MAX + max_frames)
    P = block + hop * max(0, -(-(t_cap - block) // hop))

    @aot_jit("fine_stage", fingerprint=aot.describe(
        cfg, bparams, max_frames, densify is not None, P,
    ))
    def run(params, codes, n_frames, key, fine_hist, n_hist):
        if densify is not None:
            # packed-quantized fine: ONE on-device dequant per stage
            # invocation, hoisted above the block while_loop; weights stay
            # int8 in HBM between calls
            params = densify(params)
        rows = jnp.arange(P + FINE_HISTORY_MAX, dtype=jnp.int32)[:, None]
        cols = jnp.arange(n_fine, dtype=jnp.int32)[None, :]
        # [history rows | coarse codes (pad channels cbs) | cbs padding]
        hist_val = jnp.take(
            fine_hist,
            jnp.clip(rows[:, 0], 0, FINE_HISTORY_MAX - 1),
            axis=0,
        )
        code_val = jnp.take(
            codes, jnp.clip(rows[:, 0] - n_hist, 0, max_frames - 1), axis=0
        )
        code_val = jnp.pad(code_val, ((0, 0), (0, n_fine - n_coarse)))
        in_arr = jnp.where(
            rows < n_hist,
            hist_val,
            jnp.where(
                (rows < n_hist + n_frames) & (cols < n_coarse),
                code_val,
                jnp.int32(cbs),
            ),
        )
        padded_len = jnp.maximum(n_hist + n_frames, block)
        n_loops = jnp.maximum(0, -(-(padded_len - block) // hop)) + 1

        def cond(carry):
            _, _, n = carry
            return n < n_loops

        def body(carry):
            in_arr, key, n = carry
            start_idx = jnp.minimum(n * hop, padded_len - block)
            start_fill_idx = jnp.minimum(n_hist + n * hop, padded_len - hop)
            rel = start_fill_idx - start_idx
            buf = jax.lax.dynamic_slice(
                in_arr, (start_idx, 0), (block, n_fine)
            )
            key, sub = jax.random.split(key)
            keep = jnp.arange(block, dtype=jnp.int32) >= rel
            for nn in range(n_coarse, n_fine):
                sub, s = jax.random.split(sub)
                logits = gpt.fine_forward(cfg, params, buf, nn)
                toks = sampling.sample_rows(s, logits[:, :cbs], fine_temp)
                buf = buf.at[:, nn].set(jnp.where(keep, toks, buf[:, nn]))
            # rows < rel and cols < n_coarse are untouched in `buf`, so a
            # whole-block write-back equals the reference's partial fill
            in_arr = jax.lax.dynamic_update_slice(in_arr, buf, (start_idx, 0))
            return (in_arr, key, n + 1)

        in_arr, _, _ = jax.lax.while_loop(
            cond, body, (in_arr, key, jnp.int32(0))
        )
        # shift past the history rows so rows [:n_frames] are the result
        return jax.lax.dynamic_slice(in_arr, (n_hist, 0), (P, n_fine))

    return run


def generate_fine(
    program,
    params,
    coarse_codes: np.ndarray,  # [seq_len, n_coarse]
    bparams: BarkContextParams,
    key,
    block_size: int = 1024,
    progress_cb=None,
    fine_hist: np.ndarray = None,  # (n_hist <= 512, n_fine) voice history
) -> np.ndarray:
    """Host-side block orchestration. Returns codes [seq_len, n_fine].

    `fine_hist` rows (a voice preset's last <= 512 fine frames,
    pipeline/voice.fine_history) prepend the input to condition the first
    block(s) and are sliced off the result; the fill schedule skips them
    exactly as suno's generate_fine (start_fill_idx = n_hist + n*hop).
    """
    n_coarse = coarse_codes.shape[1]
    n_fine = bparams.n_fine_codebooks
    cbs = bparams.codebook_size
    original_len = coarse_codes.shape[0]
    n_hist = 0 if fine_hist is None else len(fine_hist)

    # history prefix + channel + spatial padding (bark.cpp:1983-1996)
    total = n_hist + original_len
    in_arr = np.full((max(total, block_size), n_fine), cbs, dtype=np.int32)
    if n_hist:
        in_arr[:n_hist] = fine_hist
    in_arr[n_hist:total, :n_coarse] = coarse_codes

    hop = block_size // 2
    n_loops = max(0, math.ceil((in_arr.shape[0] - block_size) / hop)) + 1

    for n in range(n_loops):
        start_idx = min(n * hop, in_arr.shape[0] - block_size)
        start_fill_idx = min(n_hist + n * hop, in_arr.shape[0] - hop)
        rel_start_fill_idx = start_fill_idx - start_idx

        block = in_arr[start_idx : start_idx + block_size]
        key, sub = jax.random.split(key)
        refined = np.asarray(
            program(
                params,
                jnp.asarray(block),
                jnp.int32(rel_start_fill_idx),
                sub,
            )
        )
        in_arr[
            start_fill_idx : start_idx + block_size, n_coarse:
        ] = refined[rel_start_fill_idx:, n_coarse:]
        if progress_cb is not None:
            progress_cb(min(100, 100 * (n + 1) // n_loops))

    return in_arr[n_hist : n_hist + original_len]
