"""Semantic stage: one jitted program for the whole autoregressive loop.

The reference crosses host<->device on every token (bark.cpp:1586-1701,
SURVEY.md §3.2); here prefill + up-to-768 decode/sample steps + the EOS stop
all run inside a single `lax.while_loop` on device, and the host syncs once
at the end of the stage.

Reference semantics preserved (bark.cpp:1645-1701):
- sampling is over the FULL n_out_vocab logits (the reference computes a
  `relevant_logits` slice but never uses it — dead code);
- eos_p is the softmax mass of the last logit slot;
- the loop stops when `next == semantic_vocab_size` (10000) or
  `eos_p >= min_eos_p`, WITHOUT appending the stopping token;
- at most n_steps_text_encoder (768) tokens are generated.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from bark_tpu.models import gpt
from bark_tpu.ops import sampling
from bark_tpu.utils import aot
from bark_tpu.utils.aot import aot_jit


def make_semantic_program(
    cfg: gpt.GPTConfig,
    *,
    temp: float,
    max_steps: int,
    semantic_vocab_size: int,
    top_k: int = 0,
    top_p: float = 0.0,
    cache_dtype=None,
    decode_fn=None,
    densify=None,
    decode_on_dense: bool = False,
    kv_quant: bool = False,
):
    """Build the jitted whole-stage program.

    `decode_fn(params, tok, kc, vc, n_past)` is the single-token decode
    implementation (XLA op-by-op or the fused Pallas kernel,
    kernels/decode.py); defaults to the XLA path.

    Returns fn(params, tokens513 (513,) i32, key, min_eos_p f32)
      -> (tokens (max_steps,) i32, n_generated i32).
    """
    cache_dtype = cache_dtype or jnp.float32
    if decode_fn is None:
        decode_fn = partial(gpt.decode_step, cfg)
    has_densify = densify is not None
    if densify is None:
        densify = lambda p: p  # noqa: E731 — packed-quantized params hook
    # one-time per-invocation decode-param prep (contiguous weight tiles for
    # the fused kernel) — must run OUTSIDE the decode loop
    prepare = getattr(decode_fn, "prepare", lambda p: p)
    from bark_tpu.kernels import prefill as kpre
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.kernels.decode import _v_pad

    # the 257-row merged prompt prefills through the fused Pallas kernel
    # when the fused decode kernel serves the loop (one 512-row kernel
    # call writing straight into the decode kernel's aliased cache slabs)
    pal_prefill = kpre.pick_prefill(cfg, decode_fn, kv_quant, 257)
    # K decode steps + sampling + EOS test per pallas_call when the fused
    # dense kernel serves the loop (kernels/semantic.py); token-identical
    # to the stepped while body under the same pre-split keys
    use_chunk = ksem.supports_semantic_kernel(
        cfg, decode_fn, top_k=top_k, top_p=top_p, kv_quant=kv_quant
    )
    # BARK_TPU_SEM_WHILE=1: the whole stage is one kernel call whose
    # in-kernel while_loop exits at the stop step (the XLA wrapper loop
    # then runs exactly one iteration)
    use_while = use_chunk and ksem.use_while_stage()
    use_scalar = use_chunk and ksem.use_scalar_embed()
    K = (max_steps if use_while else ksem.chunk_size()) if use_chunk else 0

    @aot_jit("sem_stage", fingerprint=aot.describe(
        cfg, temp, max_steps, semantic_vocab_size, top_k, top_p,
        jnp.dtype(cache_dtype).name, decode_on_dense, kv_quant,
        has_densify, pal_prefill is not None,
        use_chunk, use_while, use_scalar, K,
        aot.describe_decode_fn(decode_fn),
    ))
    def run(params, tokens513, key, min_eos_p):
        # prefill/embedding use dense weights (dequantized once per call for
        # packed-quantized params — XLA hoists it); decode uses `params` raw
        # (the Pallas kernel consumes the qpack) unless decode_on_dense (the
        # XLA decode path in batched mode needs dense weights)
        dense = densify(params)
        dparams = prepare(dense if decode_on_dense else params)
        x_emb = gpt.embed_prompt_merged(cfg, dense, tokens513)
        kc, vc = gpt.init_kv_cache(
            cfg, dtype=x_emb.dtype, quant=kv_quant
        )
        if pal_prefill is not None:
            dense_t = kpre.prepare_prefill_params(cfg, dense)
            logits, kc, vc = pal_prefill(
                dense_t, x_emb, kc, vc, jnp.int32(257)
            )
        else:
            logits, kc, vc = gpt.prefill(
                cfg, dense, x_emb, kc, vc, jnp.int32(257)
            )

        if use_chunk:
            # chunked whole-stage kernel: K steps (decode + full-vocab
            # sample + EOS test) per pallas_call; the XLA loop around it
            # only appends tokens and handles the early exit. Post-stop
            # in-chunk steps are computed and discarded (<= K-1 wasted
            # steps per utterance) — their tokens/cache rows are
            # unobservable, exactly like the stepped loop's stop step.
            quant = getattr(decode_fn, "quant", False)
            dparams_s = (
                dparams if (use_scalar and not quant)
                else ksem.prepare_semantic_params(
                    cfg, dparams, dense_wte=dense["wte"][0]
                )
            )
            gum = ksem.make_gumbel_rows(
                key, max_steps, cfg.n_out_vocab, _v_pad(cfg), temp
            )
            # out is padded by K: the last chunk's dynamic_update_slice
            # writes K slots from `count` and must not clamp backwards
            # over valid tokens
            out0c = jnp.zeros((max_steps + K,), jnp.int32)
            interp = getattr(decode_fn, "interpret", False)

            def cond_c(carry):
                _, _, _, _, count, done = carry
                return (~done) & (count < max_steps)

            def body_c(carry):
                logits, kc, vc, out, count, done = carry
                toks, flags, logits2, kc, vc = ksem.semantic_chunk_fused(
                    cfg, dparams_s, logits, kc, vc, jnp.int32(257),
                    count, gum, min_eos_p, K=K, temp=temp,
                    semantic_vocab_size=semantic_vocab_size,
                    use_while=use_while, scalar_embed=use_scalar,
                    quant=quant, interpret=interp,
                )
                j = jnp.arange(K, dtype=jnp.int32)
                first_stop = jnp.min(
                    jnp.where(flags != 0, j, jnp.int32(K))
                )
                appended = jnp.minimum(first_stop, max_steps - count)
                toks_w = jnp.where(j < appended, toks, 0)
                out = jax.lax.dynamic_update_slice(out, toks_w, (count,))
                return (
                    logits2, kc, vc, out, count + appended,
                    first_stop < K,
                )

            carry = (
                logits, kc, vc, out0c, jnp.int32(0), jnp.bool_(False),
            )
            _, _, _, out, count, _ = jax.lax.while_loop(
                cond_c, body_c, carry
            )
            return out[:max_steps], count

        out0 = jnp.zeros((max_steps,), jnp.int32)
        # all step keys derived up front in ONE vectorized threefry —
        # keeps the serialized per-step jax.random.split out of the loop
        # body (the loop then indexes subs[count]; iteration i always has
        # count == i at entry, including the final stopping iteration)
        subs = jax.random.split(key, max_steps)

        def cond(carry):
            _, _, _, _, count, done = carry
            return (~done) & (count < max_steps)

        def body(carry):
            logits, kc, vc, out, count, done = carry
            sub = subs[count]
            tok, eos_p = sampling.sample(sub, logits, temp, top_k, top_p)
            stop = (tok == semantic_vocab_size) | (eos_p >= min_eos_p)
            out = jnp.where(
                stop, out, out.at[count].set(tok)
            )
            count = jnp.where(stop, count, count + 1)

            # Decode UNconditionally, matching the batched program: a
            # lax.cond(more, decode, skip) here makes XLA reconcile the two
            # branches' carried KV caches, a structure that CAN force
            # whole-cache copies (~192 MB on bark-large). Measured r3: the
            # per-step cost is within tunnel noise either way (the probe
            # put the full semantic step at ~0.95 ms/tok vs the raw kernel
            # chain's 0.84, with or without the cond), so the simpler
            # branch-free loop wins by default. Decoding on the stop step
            # wastes ONE step per utterance; the while_loop exits right
            # after, and its logits are never sampled.
            #
            # The n_past clamp is deliberate: with the default layout (257
            # prompt slots + up to 768 steps) the final slot index can
            # reach block_size; the reference has the same latent overflow
            # and survives only via ggml's view clamping
            # (bark.cpp:1220-1256), as XLA's dynamic-slice clamp would
            # here. The sampled-token path never reads those logits (the
            # loop has stopped), but make the bound explicit rather than
            # accidental.
            n_past = jnp.minimum(
                jnp.int32(257) + count - 1, cfg.block_size - 1
            )
            logits2, kc, vc = decode_fn(dparams, tok, kc, vc, n_past)
            return (logits2, kc, vc, out, count, stop)

        carry = (
            logits, kc, vc, out0, jnp.int32(0), jnp.bool_(False),
        )
        _, _, _, out, count, _ = jax.lax.while_loop(cond, body, carry)
        return out, count

    return run


def make_semantic_program_batched(
    cfg: gpt.GPTConfig,
    *,
    batch: int,
    temp: float,
    max_steps: int,
    semantic_vocab_size: int,
    top_k: int = 0,
    top_p: float = 0.0,
    decode_fn=None,
    densify=None,
    decode_on_dense: bool = False,
    kv_quant: bool = False,
):
    """Natively-batched semantic stage: ONE while_loop whose decode step
    serves all B lanes at once (with the batched Pallas kernel each weight
    tile streams from HBM once per step instead of once per lane; a
    vmap-of-the-single-program would also re-select the whole KV carry per
    lane through the masked while_loop).

    Per-lane outputs are token-identical to `make_semantic_program` under
    the same per-lane key (tested): sampling order, EOS semantics and
    append masking mirror the single-lane loop. Finished lanes keep
    decoding (their sampled garbage rewrites the cache row of their final
    slot), which is unobservable — their out/count are frozen and their
    logits never read again.

    fn(params, tokens513 (B, 513), keys (B, 2), min_eos_p)
      -> (tokens (B, max_steps) i32, counts (B,) i32)
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
    from bark_tpu.kernels import prefill as kpre
    from bark_tpu.kernels import semantic as ksem
    from bark_tpu.kernels.decode import _v_pad

    use_chunk = ksem.supports_semantic_kernel_batched(
        cfg, decode_fn, top_k=top_k, top_p=top_p, kv_quant=kv_quant
    )
    K = ksem.chunk_size() if use_chunk else 0
    pal_prefill_b = kpre.pick_prefill_batched(
        cfg, decode_fn, kv_quant, 257, B
    )

    @aot_jit(f"sem_stage_b{B}", fingerprint=aot.describe(
        cfg, temp, max_steps, semantic_vocab_size, top_k, top_p,
        decode_on_dense, kv_quant, has_densify,
        pal_prefill_b is not None, use_chunk, K,
        aot.describe_decode_fn(decode_fn),
    ))
    def run(params, tokens513, keys, min_eos_p):
        dense = densify(params)
        dparams = prepare(dense if decode_on_dense else params)
        x_emb = jax.vmap(
            lambda t: gpt.embed_prompt_merged(cfg, dense, t)
        )(tokens513)  # (B, 257, D)
        kc, vc = gpt.init_kv_cache(
            cfg, dtype=x_emb.dtype, batch=B, quant=kv_quant
        )
        if pal_prefill_b is not None:
            # batched fused Pallas prefill straight into the batched decode
            # kernels' aliased cache slabs (kernels/prefill.py)
            dense_t = kpre.prepare_prefill_params(cfg, dense)
            logits, kc, vc = pal_prefill_b(
                dense_t, x_emb, kc, vc, jnp.full((B,), 257, jnp.int32)
            )
        else:
            logits, kc, vc = jax.vmap(
                lambda x, k, v: gpt.prefill(
                    cfg, dense, x, k, v, jnp.int32(257)
                ),
                in_axes=(0, 1, 1), out_axes=(0, 1, 1),
            )(x_emb, kc, vc)

        if use_chunk:
            # chunked whole-stage kernel, batched: K steps for all lanes
            # per pallas_call. Active lanes' count == the global step
            # base g0 (they advance in lockstep until they stop), so the
            # kernel runs on shared scalars; stopped lanes keep decoding
            # unobservably (out/count frozen here, logits never read).
            quant = getattr(decode_fn, "quant", False)
            dparams_s = ksem.prepare_semantic_params(
                cfg, dparams, dense_wte=dense["wte"][0]
            )
            # jax.random.split is prefix-stable: [:max_steps] IS the
            # stepped loop's subs_all; the +K tail only feeds post-cap
            # in-kernel steps whose samples are never observed
            subs_over = jax.vmap(
                lambda k: jax.random.split(k, max_steps + K)
            )(keys)  # (B, max_steps + K, 2)
            out0c = jnp.zeros((B, max_steps + K), jnp.int32)
            interp = getattr(decode_fn, "interpret", False)
            jK = jnp.arange(K, dtype=jnp.int32)

            def cond_c(carry):
                _, _, _, _, _, done, g0 = carry
                return jnp.any(~done) & (g0 < max_steps)

            def body_c(carry):
                logits, kc, vc, out, count, done, g0 = carry
                gum = ksem.make_gumbel_rows_batched(
                    subs_over, g0, K, cfg.n_out_vocab, _v_pad(cfg), temp
                )
                toks, flags, logits2, kc, vc = (
                    ksem.semantic_chunk_fused_batched(
                        cfg, dparams_s, logits, kc, vc, jnp.int32(257),
                        g0, gum, min_eos_p, K=K, temp=temp,
                        semantic_vocab_size=semantic_vocab_size,
                        quant=quant, interpret=interp,
                    )
                )
                first_stop = jnp.min(
                    jnp.where(flags != 0, jK[None, :], jnp.int32(K)),
                    axis=1,
                )  # (B,)
                appended = jnp.where(
                    done, 0, jnp.minimum(first_stop, max_steps - g0)
                )
                out = jax.vmap(
                    lambda o, t, a, c: jax.lax.dynamic_update_slice(
                        o, jnp.where(jK < a, t, 0), (c,)
                    )
                )(out, toks, appended, count)
                count = count + appended
                done = done | (first_stop < K) | (count >= max_steps)
                return (logits2, kc, vc, out, count, done, g0 + K)

            carry = (
                logits, kc, vc, out0c,
                jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool),
                jnp.int32(0),
            )
            _, _, _, out, count, _, _ = jax.lax.while_loop(
                cond_c, body_c, carry
            )
            return out[:, :max_steps], count

        out0 = jnp.zeros((B, max_steps), jnp.int32)
        # per-lane step keys pre-split outside the loop; lane b's i-th key
        # equals the single-lane program's subs[i] for the same lane key
        # (the tested batched == single token-equality contract). A done
        # lane's frozen count re-reads one key — its samples are never
        # observed (out/count frozen, cache row rewrite unobservable).
        subs_all = jax.vmap(
            lambda k: jax.random.split(k, max_steps)
        )(keys)  # (B, max_steps, 2)

        def cond(carry):
            _, _, _, _, count, done = carry
            return jnp.any((~done) & (count < max_steps))

        def body(carry):
            logits, kc, vc, out, count, done = carry
            subs = jax.vmap(lambda s, c: s[c])(
                subs_all, jnp.clip(count, 0, max_steps - 1)
            )  # (B, 2)
            toks, eos_p = jax.vmap(
                lambda s, lg: sampling.sample(s, lg, temp, top_k, top_p)
            )(subs, logits)
            stop = (toks == semantic_vocab_size) | (eos_p >= min_eos_p)
            active = (~done) & (~stop) & (count < max_steps)
            out = jax.vmap(
                lambda o, c, t, a: jnp.where(
                    a, jax.lax.dynamic_update_slice(o, t[None], (c,)), o
                )
            )(out, count, toks, active)
            count = count + active.astype(jnp.int32)
            done = done | stop | (count >= max_steps)
            # slot of the just-appended token; inactive lanes clamp to a
            # valid row (their rewrite of it is never observed)
            n_past = jnp.clip(
                jnp.int32(257) + count - 1, 0, cfg.block_size - 1
            )
            logits, kc, vc = decode_fn(dparams, toks, kc, vc, n_past)
            return (logits, kc, vc, out, count, done)

        carry = (
            logits, kc, vc, out0,
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool),
        )
        _, _, _, out, count, _ = jax.lax.while_loop(cond, body, carry)
        return out, count

    return run
