"""On-device token sampling.

Mirrors gpt_sample (/root/reference/bark.cpp:184-270):

- temp > 0: logits/temp -> softmax -> multinomial draw; the EOS probability
  reported is the softmax mass of the LAST logit slot (bark.cpp:216-218).
- temp == 0: argmax, with the reference's hardcoded /0.7 "testing" divide
  applied before the softmax used for the EOS probability (bark.cpp:223-230);
  the argmax itself is unaffected by the divide.

The RNG is JAX's threaded PRNG (categorical via Gumbel trick) rather than
std::mt19937 / discrete_distribution; bit-exact token parity with the C++ RNG
is explicitly a non-goal (SURVEY.md §7) — temp=0 paths are deterministic and
match exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_top_k(logits, top_k: int):
    """Keep the top_k largest logits, -inf the rest (static top_k > 0).

    Clamped to the logits width like suno's min(top_k, size) — the coarse
    sampler calls this on 1024-wide slices while top_k may be set for the
    10k-wide semantic distribution."""
    top_k = max(1, min(top_k, logits.shape[-1]))
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(logits, top_p: float):
    """Nucleus filtering: keep the smallest set of logits whose softmax mass
    reaches top_p (the most probable token always survives).

    Matches suno's semantics: removal is by *sorted index* with a
    shifted-right boundary (tokens whose cumulative mass *before* them is
    already >= top_p are removed), so duplicate-valued logits straddling the
    cutoff are split exactly as in the sorted order, not all kept."""
    order = jnp.argsort(logits, axis=-1, descending=True)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum > top_p
    # shift right: a token is removed only if the mass BEFORE it reached
    # top_p; sorted index 0 always survives
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
        axis=-1,
    )
    inv_order = jnp.argsort(order, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv_order, axis=-1)
    return jnp.where(remove, -jnp.inf, logits)


def sample(key, logits, temp: float, top_k: int = 0, top_p: float = 0.0):
    """Draw a token. `temp`/`top_k`/`top_p` are static. Returns
    (token i32, eos_p f32). eos_p is computed over the UNfiltered
    distribution (the reference has no filtering; bark.cpp:216-218).

    Filter order mirrors suno's generate_text_semantic: top_p then top_k on
    the RAW logits, temperature applied afterward for the draw (top_k is
    scale-invariant but the top_p nucleus is not)."""
    logits = logits.astype(jnp.float32)
    if temp == 0.0:
        scaled = logits / 0.7
        eos_p = jax.nn.softmax(scaled)[-1]
        return jnp.argmax(logits).astype(jnp.int32), eos_p
    eos_p = jax.nn.softmax(logits / temp)[-1]
    filtered = logits
    if top_p:
        filtered = apply_top_p(filtered, top_p)
    if top_k:
        filtered = apply_top_k(filtered, top_k)
    tok = jax.random.categorical(key, filtered / temp).astype(jnp.int32)
    return tok, eos_p


def sample_rows(key, logits, temp: float):
    """Vectorized per-row sampling for (N, V) logits -> (N,) int32 tokens.

    Used by the fine stage, which samples all 1024 positions independently
    (bark.cpp:2027-2038).
    """
    logits = logits.astype(jnp.float32)
    if temp == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, logits / temp, axis=-1).astype(jnp.int32)
