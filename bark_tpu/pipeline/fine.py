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
