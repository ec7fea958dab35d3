"""`precompile` CLI: warm the persistent XLA compilation cache.

A cold bark-tpu process pays minutes of Mosaic/XLA compilation before the
first audio (the whole-stage programs + the Pallas kernels inside them).
The compiled executables are keyed only by shapes/config — not weights —
so compiling them ONCE per (machine, model size, serving options) into the
persistent cache (utils/cache.py) makes every later process start in
seconds. Run this at deploy time, per serving configuration:

    python -m bark_tpu.cli.precompile -m ggml_weights.bin
    python -m bark_tpu.cli.precompile -m weights_q8.bin --packed
    python -m bark_tpu.cli.precompile -m ggml_weights.bin --batch 8

The command simply runs one short end-to-end generate per requested
configuration (that is exactly the set of executables a server will need)
and reports the first/second generate wall times — the second is the
warm-process floor.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="bark-tpu-precompile",
        description="Populate the persistent compile cache for a model "
        "+ serving configuration",
    )
    ap.add_argument("-m", "--model", default="./ggml_weights.bin")
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--packed", action="store_true",
                    help="packed-quantized serving (requires a quantized "
                    "model file)")
    ap.add_argument("--kv", default="params", choices=["params", "int8"],
                    help="KV-cache dtype to compile for")
    ap.add_argument("--batch", type=int, default=0,
                    help="also compile the batched pipeline at this B")
    ap.add_argument("--prompt", default="warm up the cache",
                    help="short prompt used for the compile-driving "
                    "generate")
    return ap


def main(argv=None) -> int:
    from bark_tpu.utils.cache import enable_compilation_cache

    path = enable_compilation_cache()
    args = build_parser().parse_args(argv)

    import bark_tpu
    from bark_tpu.params import BarkContextParams

    print(f"compilation cache: {path}", flush=True)
    params = BarkContextParams(
        compute_dtype=args.dtype,
        dequantize_on_load=not args.packed,
        kv_cache_dtype=args.kv,
    )
    t0 = time.time()
    ctx = bark_tpu.bark_load_model(args.model, params, seed=args.seed)
    print(f"model loaded in {time.time() - t0:.1f}s", flush=True)

    if args.batch <= 0:
        # AOT-compile the fused stage programs concurrently first (the
        # remote compile helper overlaps independent compiles); the
        # generates below then only compile the remaining glue
        dt = ctx.warmup(parallel=True)
        print(f"parallel stage warmup: {dt:.1f}s", flush=True)

    def once(label):
        t = time.time()
        if args.batch > 0:
            outs = ctx.generate_audio_batch([args.prompt] * args.batch)
            ok = all(o is not None for o in outs)
        else:
            ok = ctx.generate_audio(args.prompt)
        dt = time.time() - t
        print(f"{label}: {dt:.1f}s", flush=True)
        return ok, dt

    ok, cold = once("first generate (compiles)")
    if not ok:
        print("generate FAILED", file=sys.stderr)
        return 1
    ok, warm = once("second generate (all cached)")
    print(
        f"done: cache warm at {path}; this process compiled for "
        f"{cold - warm:.1f}s — the next process with the same "
        f"configuration skips that.",
        flush=True,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
