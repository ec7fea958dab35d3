"""Bisect the semantic stage's per-token overhead on the real TPU.

bench --stage-times measured bark-large semantic at ~1.2-1.3 ms/tok while
the raw fused-kernel chain runs 0.84 (tools/tpu_decode_bench.py). This
probe times the semantic stage as a ladder of program variants, each
adding one ingredient of the real program, to attribute the difference:

  A  scan + argmax           the decode-bench shape on the SEMANTIC cfg
                             (full 10240-row LM head, no lm_window)
  B  scan + sampling         + temp-0.7 categorical + eos_p softmax mass
  C  while_loop + bookkeeping+ dynamic stop, out-buffer writes, count
                             (the make_semantic_program body, no prefill)
  D  full stage program      make_semantic_program incl. prefill

All weights are generated on-device (nothing crosses the tunnel).
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bark_tpu.kernels import decode as kdec
from bark_tpu.models import gpt
from bark_tpu.models.presets import BARK_LARGE, BARK_SMALL
from bark_tpu.ops import sampling
from bark_tpu.pipeline import semantic as semantic_pipe


def _sync_floor():
    empty = jax.jit(lambda: jnp.int32(0))
    int(empty())
    t0 = time.perf_counter()
    for _ in range(3):
        int(empty())
    return (time.perf_counter() - t0) / 3


def _time(tag, prog, args, steps, n_runs=3):
    t0 = time.perf_counter()
    out = prog(*args)
    res = int(jax.tree.leaves(out)[0].reshape(-1)[0])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s "
          f"(out {res})", file=sys.stderr)
    floor = _sync_floor()
    best = None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        out = prog(*args)
        int(jax.tree.leaves(out)[0].reshape(-1)[0])
        dt = time.perf_counter() - t0 - floor
        best = dt if best is None else min(best, dt)
    print(f"{tag}: {best*1e3:.1f} ms ({best*1e3/steps:.3f} ms/token)",
          flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large", choices=["small", "large"])
    ap.add_argument("--steps", type=int, default=138)
    ap.add_argument("--variants", default="ABCD")
    args = ap.parse_args()

    from bark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    preset = BARK_SMALL if args.model == "small" else BARK_LARGE
    cfg = preset["semantic"]
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    params = gpt.init_params_device(cfg, 0, dtype=jnp.bfloat16)
    N = args.steps
    fn = kdec.select_decode_fn(cfg, use_pallas=True)
    SVS = 10_000  # semantic_vocab_size

    if "0" in args.variants:
        # glue-free baseline: fixed token chain, logits never read
        def run_0(params, kc, vc):
            dparams = fn.prepare(params)

            def step(carry, i):
                tok, kc, vc = carry
                logits, kc, vc = fn(dparams, tok, kc, vc, jnp.int32(257) + i)
                return (tok, kc, vc), ()

            (tok, kc, _), _ = jax.lax.scan(
                step, (jnp.int32(7), kc, vc),
                jnp.arange(N, dtype=jnp.int32))
            return kc[0, 0, 0].astype(jnp.int32)

        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.bfloat16)
        _time("0 fixed-token chain", jax.jit(run_0, donate_argnums=(1, 2)),
              (params, kc, vc), N)

    if "A" in args.variants:
        def run_a(params, kc, vc):
            dparams = fn.prepare(params)

            def step(carry, i):
                tok, kc, vc = carry
                logits, kc, vc = fn(dparams, tok, kc, vc, jnp.int32(257) + i)
                tok = jnp.argmax(
                    jax.lax.dynamic_slice(logits, (0,), (SVS,))
                ).astype(jnp.int32)
                return (tok, kc, vc), ()

            (tok, _, _), _ = jax.lax.scan(
                step, (jnp.int32(7), kc, vc),
                jnp.arange(N, dtype=jnp.int32))
            return tok

        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.bfloat16)
        _time("A scan+argmax", jax.jit(run_a, donate_argnums=(1, 2)),
              (params, kc, vc), N)

    if "B" in args.variants:
        def run_b(params, kc, vc, key):
            dparams = fn.prepare(params)

            def step(carry, i):
                tok, kc, vc, key = carry
                logits, kc, vc = fn(dparams, tok, kc, vc, jnp.int32(257) + i)
                key, sub = jax.random.split(key)
                tok, eos_p = sampling.sample(
                    sub, logits[: SVS + 1], 0.7, 0, 0.0
                )
                tok = jnp.minimum(tok, SVS - 1).astype(jnp.int32)
                return (tok, kc, vc, key), ()

            (tok, _, _, _), _ = jax.lax.scan(
                step, (jnp.int32(7), kc, vc, key),
                jnp.arange(N, dtype=jnp.int32))
            return tok

        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.bfloat16)
        _time("B scan+sampling", jax.jit(run_b, donate_argnums=(1, 2)),
              (params, kc, vc, jax.random.PRNGKey(0)), N)

    if "C" in args.variants:
        def run_c(params, kc, vc, key):
            dparams = fn.prepare(params)
            out0 = jnp.zeros((N,), jnp.int32)

            def cond(carry):
                _, _, _, _, _, count, done = carry
                return (~done) & (count < N)

            def body(carry):
                logits, kc, vc, key, out, count, done = carry
                key, sub = jax.random.split(key)
                tok, eos_p = sampling.sample(
                    sub, logits[: SVS + 1], 0.7, 0, 0.0
                )
                tok = jnp.minimum(tok, SVS - 1).astype(jnp.int32)
                stop = eos_p >= jnp.float32(2.0)
                out = jnp.where(stop, out, out.at[count].set(tok))
                count = jnp.where(stop, count, count + 1)
                n_past = jnp.minimum(
                    jnp.int32(257) + count - 1, cfg.block_size - 1
                )
                logits2, kc, vc = fn(dparams, tok, kc, vc, n_past)
                return (logits2, kc, vc, key, out, count, stop)

            logits0 = jnp.zeros((cfg.n_out_vocab,), jnp.float32)
            carry = (logits0, kc, vc, key, out0, jnp.int32(0),
                     jnp.bool_(False))
            _, _, _, _, out, count, _ = jax.lax.while_loop(cond, body, carry)
            return count

        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.bfloat16)
        _time("C while+bookkeeping", jax.jit(run_c, donate_argnums=(1, 2)),
              (params, kc, vc, jax.random.PRNGKey(0)), N)

    if "D" in args.variants:
        prog = semantic_pipe.make_semantic_program(
            cfg, temp=0.7, max_steps=N, semantic_vocab_size=SVS,
            decode_fn=fn,
        )
        toks = jnp.full((513,), 17, jnp.int32)
        _time("D full stage", prog,
              (params, toks, jax.random.PRNGKey(0), jnp.float32(2.0)), N)


if __name__ == "__main__":
    main()
