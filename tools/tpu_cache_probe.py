"""Instrument the persistent compilation cache under the axon remote-TPU
backend: which programs hit, which write, which silently skip.

r2 observed only PARTIAL cross-process reuse (~450 s of warm-start programs
never appeared as cache entries — ROADMAP). This probe compiles three
representative program shapes (plain XLA, a Pallas kernel, a scan-of-Pallas
like the stage programs), with DEBUG logging from jax's compilation-cache
modules, and reports per-program hit/miss/write. Run it twice (two
processes); the second run should be 3/3 hits.

    python tools/tpu_cache_probe.py [--tag run1]
"""
import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    args = ap.parse_args()

    from bark_tpu.utils.cache import enable_compilation_cache

    path = enable_compilation_cache()
    jax.config.update("jax_explain_cache_misses", True)

    logging.basicConfig(stream=sys.stderr, level=logging.WARNING)
    for name in ("jax._src.compilation_cache", "jax._src.compiler",
                 "jax._src.cache_key"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(logging.StreamHandler(sys.stderr))

    print(f"cache dir: {path} entries before: "
          f"{len(os.listdir(path)) if os.path.isdir(path) else 0}",
          flush=True)

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"[{args.tag}] {name}: {time.perf_counter() - t0:.2f}s "
              f"-> {np.asarray(out).ravel()[0]:.3f}", flush=True)

    # 1) plain XLA program
    a = jnp.ones((256, 256), jnp.float32)
    timed("xla_matmul", lambda: jax.jit(
        lambda x: (x @ x.T).sum())(a))

    # 2) a Pallas kernel
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    timed("pallas_kernel", lambda: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.ones((8, 128), jnp.float32)).sum())

    # 3) scan-of-Pallas (the stage-program shape)
    def scan_prog(x):
        def body(c, _):
            y = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(c)
            return y * 0.5, ()
        c, _ = jax.lax.scan(body, x, None, length=4)
        return c.sum()

    timed("scan_of_pallas", lambda: jax.jit(scan_prog)(
        jnp.ones((8, 128), jnp.float32)))

    print(f"entries after: {len(os.listdir(path))}", flush=True)


if __name__ == "__main__":
    main()
