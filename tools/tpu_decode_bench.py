"""Micro-bench: fused decode kernel ms/token on the real TPU.

Times a scan of N decode steps as one program (single device sync at the
end — `jax.block_until_ready` does not block under the axon tunnel, so the
sync is a host transfer of one scalar; see CLAUDE.md).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="small", choices=["small", "large"])
    ap.add_argument("--stage", default="coarse",
                    choices=["semantic", "coarse"])
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--n-past0", type=int, default=317)
    ap.add_argument("--block-size", type=int, default=0,
                    help="override cache size (KV-traffic probing)")
    ap.add_argument("--batch", type=int, default=0,
                    help="B>0: bench the natively-batched kernel")
    args = ap.parse_args()

    preset = BARK_SMALL if args.model == "small" else BARK_LARGE
    cfg = preset[args.stage]
    if args.block_size:
        import dataclasses
        cfg = dataclasses.replace(cfg, block_size=args.block_size)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    params = gpt.init_params_host(cfg, 0, dtype=jnp.bfloat16)
    kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.bfloat16)

    lm_window = None
    if args.stage == "coarse":
        lm_window = (10000, 12048)

    B = args.batch
    if B:
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.bfloat16, batch=B)

    def run(params, kc, vc):
        params = kdec.prepare_decode_params(cfg, params, lm_window=lm_window)

        def step(carry, i):
            tok, kc, vc = carry
            if B:
                n_past = jnp.int32(args.n_past0) + i + jnp.arange(
                    B, dtype=jnp.int32) % 8  # divergent lanes
                logits, kc, vc = kdec.decode_step_fused_batched(
                    cfg, params, tok, kc, vc, n_past, lm_window=lm_window)
                tok = jnp.argmax(
                    jax.lax.dynamic_slice(logits, (0, 0), (B, 1024)), axis=-1
                ).astype(jnp.int32)
            else:
                logits, kc, vc = kdec.decode_step_fused(
                    cfg, params, tok, kc, vc, jnp.int32(args.n_past0) + i,
                    lm_window=lm_window)
                tok = jnp.argmax(
                    jax.lax.dynamic_slice(logits, (0,), (1024,))
                ).astype(jnp.int32)
            return (tok, kc, vc), ()
        tok0 = jnp.full((B,), 7, jnp.int32) if B else jnp.int32(7)
        (tok, kc, vc), _ = jax.lax.scan(
            step, (tok0, kc, vc),
            jnp.arange(args.steps, dtype=jnp.int32))
        return tok[0] if B else tok

    prog = jax.jit(run, donate_argnums=(1, 2))
    t0 = time.perf_counter()
    tok = int(prog(params, kc, vc))  # compile + run; int() forces sync
    print(f"compile+first: {time.perf_counter()-t0:.1f}s tok={tok}",
          file=sys.stderr)

    # dispatch+sync floor through the remote tunnel (an empty program),
    # subtracted from the per-token numbers
    floor_prog = jax.jit(lambda x: x + 1)
    int(floor_prog(jnp.int32(0)))
    floor = min(
        _timed(lambda: int(floor_prog(jnp.int32(i)))) for i in range(5)
    )
    print(f"sync floor: {floor*1e3:.1f} ms", file=sys.stderr)

    best = None
    for i in range(3):
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.bfloat16,
                                   batch=B if B else None)
        t0 = time.perf_counter()
        tok = int(prog(params, kc, vc))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        print(f"run {i}: {dt*1e3:.1f} ms "
              f"({(dt-floor)/args.steps*1e3:.3f} ms/token)", file=sys.stderr)
    print(f"BEST {args.model}/{args.stage}: "
          f"{(best-floor)/args.steps*1e3:.3f} ms/token "
          f"(wall {best/args.steps*1e3:.3f})")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
