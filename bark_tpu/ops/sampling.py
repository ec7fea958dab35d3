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


def sample(key, logits, temp: float):
    """Draw a token. `temp` is a static float. Returns (token i32, eos_p f32)."""
    logits = logits.astype(jnp.float32)
    if temp == 0.0:
        scaled = logits / 0.7
        eos_p = jax.nn.softmax(scaled)[-1]
        return jnp.argmax(logits).astype(jnp.int32), eos_p
    scaled = logits / temp
    tok = jax.random.categorical(key, scaled).astype(jnp.int32)
    eos_p = jax.nn.softmax(scaled)[-1]
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
