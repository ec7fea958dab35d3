"""Does the remote compile helper parallelize concurrent compiles?

Cold start dispatches the stage-program compiles serially (the first
generate executes them in data order). If compiles submitted from multiple
Python threads overlap on the backend, a parallel `warmup()` can collapse
wall time toward max(per-program) instead of sum(). This probe measures:

  serial:   compile N distinct programs one after another
  parallel: compile N distinct programs from N threads

Distinctness comes from a static marker (loop trip count) so the
persistent cache cannot serve one to the other. Run twice with different
--salt values to defeat the cache across runs.
"""

import argparse
import threading
import time

import jax
import jax.numpy as jnp


def _program(i: int, salt: int, n_layers: int = 48):
    """A compile-heavy (many fused loops) but cheap-to-run program."""

    @jax.jit
    def fn(x):
        def body(j, acc):
            w = jnp.sin(acc * (1.0 + 1e-6 * (i + salt))) @ jnp.eye(
                acc.shape[-1], dtype=acc.dtype
            )
            return acc + 0.001 * w

        for l in range(n_layers):
            x = jax.lax.fori_loop(0, 3 + (i + salt) % 2, body, x)
            x = jnp.tanh(x @ x.T) @ x
        return x

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    x = jnp.ones((args.size, args.size), jnp.bfloat16)

    # serial
    t0 = time.perf_counter()
    per = []
    for i in range(args.n):
        t = time.perf_counter()
        _program(2 * i, args.salt).lower(x).compile()
        per.append(time.perf_counter() - t)
    serial = time.perf_counter() - t0
    print(f"serial: {serial:.1f}s  per-program {[f'{p:.1f}' for p in per]}")

    # parallel (distinct programs via odd markers)
    fns = [_program(2 * i + 1, args.salt) for i in range(args.n)]
    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=lambda f=f: f.lower(x).compile())
        for f in fns
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    parallel = time.perf_counter() - t0
    print(f"parallel: {parallel:.1f}s  speedup {serial / parallel:.2f}x")


if __name__ == "__main__":
    main()
