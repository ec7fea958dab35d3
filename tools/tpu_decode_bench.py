"""Micro-bench: fused decode kernel ms/token on the real TPU.

Times a scan of N decode steps as one program (single device sync at the
end — `jax.block_until_ready` does not block under the axon tunnel, so the
sync is a host transfer of one scalar; see CLAUDE.md).

Weights are generated ON DEVICE by default (gpt.init_params_device /
bench._pack_quantized_device): nothing crosses the tunnel, so this stays
usable even at the 0.1 MB/s tunnel throughput measured r3.
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
    ap.add_argument("--layers", type=int, default=0,
                    help="override n_layer (DMA-overhead probing)")
    ap.add_argument("--embd", type=int, default=0,
                    help="override n_embd/n_head (DMA-overhead probing: "
                    "same total bytes in fewer, bigger tiles)")
    ap.add_argument("--batch", type=int, default=0,
                    help="B>0: bench the natively-batched kernel")
    ap.add_argument("--quant", default="",
                    choices=["", "q4_0", "q4_1", "q5_0", "q5_1", "q8_0",
                             "q4_k", "q5_k"],
                    help="bench the packed-quantized kernel (synthetic "
                    "on-device qpack)")
    ap.add_argument("--kv", default="params", choices=["params", "int8"])
    ap.add_argument("--init", default="auto",
                    choices=["auto", "host", "device"])
    args = ap.parse_args()

    from bark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    preset = BARK_SMALL if args.model == "small" else BARK_LARGE
    cfg = preset[args.stage]
    if args.block_size or args.layers or args.embd:
        import dataclasses
        repl = {}
        if args.block_size:
            repl["block_size"] = args.block_size
        if args.layers:
            repl["n_layer"] = args.layers
        if args.embd:
            repl["n_embd"] = args.embd
            repl["n_head"] = cfg.n_head * args.embd // cfg.n_embd
        cfg = dataclasses.replace(cfg, **repl)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    init = args.init
    if init == "auto":
        init = "device" if jax.default_backend() == "tpu" else "host"
    t0 = time.perf_counter()
    if args.quant:
        sys.path.insert(0, "/root/repo")
        from bench import _pack_quantized_device, _pack_quantized

        if init == "device":
            params = _pack_quantized_device(cfg, args.quant, jnp.bfloat16, 0)
        else:
            params = _pack_quantized(
                cfg, gpt.init_params_numpy(cfg, 0), args.quant, jnp.bfloat16
            )
    elif init == "device":
        params = gpt.init_params_device(cfg, 0, dtype=jnp.bfloat16)
    else:
        params = gpt.init_params_host(cfg, 0, dtype=jnp.bfloat16)
    print(f"weights ({init}): {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    kv_quant = args.kv == "int8"

    def fresh_cache():
        return gpt.init_kv_cache(
            cfg, dtype=jnp.bfloat16, batch=args.batch or None,
            quant=kv_quant,
        )

    kc, vc = fresh_cache()

    lm_window = None
    if args.stage == "coarse":
        lm_window = (10000, 12048)

    B = args.batch

    def run(params, kc, vc):
        fn = (kdec.select_decode_fn_batched(
                  cfg, use_pallas=True, quant=bool(args.quant),
                  lm_window=lm_window)
              if B else
              kdec.select_decode_fn(
                  cfg, use_pallas=True, quant=bool(args.quant),
                  lm_window=lm_window))
        params = fn.prepare(params)

        def step(carry, i):
            tok, kc, vc = carry
            if B:
                n_past = jnp.int32(args.n_past0) + i + jnp.arange(
                    B, dtype=jnp.int32) % 8  # divergent lanes
                logits, kc, vc = fn(params, tok, kc, vc, n_past)
                tok = jnp.argmax(
                    jax.lax.dynamic_slice(logits, (0, 0), (B, 1024)), axis=-1
                ).astype(jnp.int32)
            else:
                logits, kc, vc = fn(
                    params, tok, kc, vc, jnp.int32(args.n_past0) + i)
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
        kc, vc = fresh_cache()
        t0 = time.perf_counter()
        tok = int(prog(params, kc, vc))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        print(f"run {i}: {dt*1e3:.1f} ms "
              f"({(dt-floor)/args.steps*1e3:.3f} ms/token)", file=sys.stderr)
    tag = f"{args.model}/{args.stage}" + (f"/{args.quant}" if args.quant
                                          else "") + \
        (f"/kv8" if kv_quant else "") + (f"/B{B}" if B else "")
    print(f"BEST {tag}: "
          f"{(best-floor)/args.steps*1e3:.3f} ms/token "
          f"(wall {best/args.steps*1e3:.3f})")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
