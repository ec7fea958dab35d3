"""Bisect the coarse stage's overhead above the raw kernel chain (TPU).

bench --stage-times puts bark-large coarse at ~1.1 ms/tok while the raw
fused-kernel chain runs ~0.84 (tools/tpu_decode_bench.py) — ~0.2 ms/tok
of window overhead. Ladder (all weights generated on-device):

  K  kernel chain         N fixed-token steps, lm_window, no windows
  P  stage, no prefill    stage program with BOTH prefill routes no-op'd
                          (isolates context-rebuild/scan/bookkeeping)
  X  stage, XLA prefill   Pallas prefill route disabled (the pre-r3 path)
  F  full stage           as shipped (fused Pallas prefill when eligible)

prefill cost = F - P (or X - P for the XLA path); fused-prefill win =
X - F; re-prime/bookkeeping = P - K (same step count).
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
from bark_tpu.params import BarkContextParams
from bark_tpu.pipeline import coarse as coarse_pipe


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
    ap.add_argument("--n-sem", type=int, default=138)
    ap.add_argument("--variants", default="KPF")
    args = ap.parse_args()

    from bark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    preset = BARK_SMALL if args.model == "small" else BARK_LARGE
    cfg = preset["coarse"]
    p = BarkContextParams()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    params = gpt.init_params_device(cfg, 0, dtype=jnp.bfloat16)

    num, den = coarse_pipe.stc_fraction(p)
    n_steps = (args.n_sem * num) // (den * p.n_coarse_codebooks) \
        * p.n_coarse_codebooks
    print(f"n_sem={args.n_sem} -> {n_steps} coarse steps, "
          f"{-(-n_steps // p.sliding_window_size)} windows", file=sys.stderr)

    svs = p.semantic_vocab_size
    lm_window = (svs, svs + 2 * p.codebook_size)
    fn = kdec.select_decode_fn(cfg, use_pallas=True, lm_window=lm_window)

    if "K" in args.variants:
        def run_k(params, kc, vc):
            dparams = fn.prepare(params)

            def step(carry, i):
                tok, kc, vc = carry
                logits, kc, vc = fn(dparams, tok, kc, vc,
                                    jnp.int32(317) + i % 600)
                return (tok, kc, vc), ()

            (tok, kc, _), _ = jax.lax.scan(
                step, (jnp.int32(svs + 3), kc, vc),
                jnp.arange(n_steps, dtype=jnp.int32))
            return kc[0, 0, 0].astype(jnp.int32)

        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.bfloat16)
        _time("K kernel chain", jax.jit(run_k, donate_argnums=(1, 2)),
              (params, kc, vc), n_steps)

    def make_stage():
        return coarse_pipe.make_coarse_stage_program(
            cfg, p, ctx_size=cfg.block_size, max_semantic=256,
            decode_fn=fn,
        )

    sem_buf = (jnp.arange(256, dtype=jnp.int32) * 7) % svs
    stage_args = (
        params, sem_buf, jnp.int32(args.n_sem), jax.random.PRNGKey(0),
        jnp.zeros((max(1, p.max_coarse_history * den // num),), jnp.int32),
        jnp.int32(0),
        jnp.zeros((p.max_coarse_history,), jnp.int32), jnp.int32(0),
    )

    from bark_tpu.kernels import prefill as kpre

    def _no_pallas_prefill():
        # the stage program routes through the fused Pallas prefill when
        # eligible; variants that monkeypatch gpt.prefill_chunked must
        # ALSO disable that route or they measure nothing
        real_pick = kpre.pick_prefill
        kpre.pick_prefill = lambda *a, **kw: None
        return real_pick

    if "P" in args.variants:
        real = gpt.prefill_chunked
        real_pick = _no_pallas_prefill()

        def no_prefill(cfg_, params_, x_emb, kc, vc, n_valid, chunk=256):
            logits = jnp.zeros((cfg_.n_out_vocab,), jnp.float32)
            del x_emb, n_valid
            return logits, kc, vc

        gpt.prefill_chunked = no_prefill
        try:
            prog = make_stage()
            _time("P stage-no-prefill", prog, stage_args, n_steps)
        finally:
            gpt.prefill_chunked = real
            kpre.pick_prefill = real_pick

    if "X" in args.variants:
        # stage with the chunked XLA prefill (the pre-r3 path): F - X is
        # the fused Pallas prefill's end-to-end win
        real_pick = _no_pallas_prefill()
        try:
            prog = make_stage()
            _time("X stage-xla-prefill", prog, stage_args, n_steps)
        finally:
            kpre.pick_prefill = real_pick

    if "G" in args.variants:
        # stage with the one-shot (non-chunked) XLA prefill
        real = gpt.prefill_chunked
        real_pick = _no_pallas_prefill()
        gpt.prefill_chunked = (
            lambda cfg_, params_, x, kc, vc, n_valid, chunk=256:
            gpt.prefill(cfg_, params_, x, kc, vc, n_valid)
        )
        try:
            prog = make_stage()
            _time("G stage-full-prefill", prog, stage_args, n_steps)
        finally:
            gpt.prefill_chunked = real
            kpre.pick_prefill = real_pick

    if "F" in args.variants:
        prog = make_stage()
        _time("F full stage (pallas prefill when eligible)", prog,
              stage_args, n_steps)


if __name__ == "__main__":
    main()
