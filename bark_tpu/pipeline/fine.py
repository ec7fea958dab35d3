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


def make_fine_block_program(
    cfg: gpt.GPTConfig,
    *,
    fine_temp: float,
    n_coarse: int,
    n_fine: int,
    codebook_size: int,
):
    """fn(params, codes (block,n_fine) i32, rel_start i32, key)
    -> refined codes (block, n_fine) i32."""
    block = cfg.block_size

    @jax.jit
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
):
    """The whole fine stage as ONE on-device program.

    Block schedule (1024-position blocks, 512 hop) and per-block refinement
    are identical to the stepped path (`generate_fine`, mirroring
    bark.cpp:1990-2046), but run in a `lax.while_loop` so the host never
    syncs between blocks. Produces identical tokens to the stepped path for
    identical keys (tested).

    fn(params, codes (max_frames, n_coarse) i32, n_frames i32, key)
      -> in_arr (P, n_fine) i32; rows [:n_frames] are the result.
    """
    block = cfg.block_size
    hop = block // 2
    n_coarse = bparams.n_coarse_codebooks
    n_fine = bparams.n_fine_codebooks
    cbs = bparams.codebook_size
    fine_temp = bparams.fine_temp
    # static buffer: enough for the worst-case padded length
    P = block + hop * max(0, -(-(max_frames - block) // hop))

    @jax.jit
    def run(params, codes, n_frames, key):
        rows = jnp.arange(P, dtype=jnp.int32)[:, None]
        cols = jnp.arange(n_fine, dtype=jnp.int32)[None, :]
        codes_p = jnp.pad(codes, ((0, P - max_frames), (0, n_fine - n_coarse)))
        in_arr = jnp.where(
            (rows < n_frames) & (cols < n_coarse), codes_p, jnp.int32(cbs)
        )
        padded_len = jnp.maximum(n_frames, block)
        n_loops = jnp.maximum(0, -(-(padded_len - block) // hop)) + 1

        def cond(carry):
            _, _, n = carry
            return n < n_loops

        def body(carry):
            in_arr, key, n = carry
            start_idx = jnp.minimum(n * hop, padded_len - block)
            start_fill_idx = jnp.minimum(n * hop, padded_len - hop)
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
        return in_arr

    return run


def generate_fine(
    program,
    params,
    coarse_codes: np.ndarray,  # [seq_len, n_coarse]
    bparams: BarkContextParams,
    key,
    block_size: int = 1024,
    progress_cb=None,
) -> np.ndarray:
    """Host-side block orchestration. Returns codes [seq_len, n_fine]."""
    n_coarse = coarse_codes.shape[1]
    n_fine = bparams.n_fine_codebooks
    cbs = bparams.codebook_size
    original_len = coarse_codes.shape[0]

    # channel + spatial padding (bark.cpp:1983-1996)
    in_arr = np.full(
        (max(original_len, block_size), n_fine), cbs, dtype=np.int32
    )
    in_arr[:original_len, :n_coarse] = coarse_codes

    hop = block_size // 2
    n_loops = max(0, math.ceil((in_arr.shape[0] - block_size) / hop)) + 1

    for n in range(n_loops):
        start_idx = min(n * hop, in_arr.shape[0] - block_size)
        start_fill_idx = min(n * hop, in_arr.shape[0] - hop)
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

    return in_arr[:original_len]
