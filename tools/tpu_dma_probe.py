"""Pure-DMA bandwidth probe: HBM -> VMEM ring streaming, no compute.

The fused decode kernel's weight stream runs at ~690 GB/s on v5e (580 MB
of bark-large tiles in 0.838 ms/token) — ~84% of the 819 GB/s spec. This
probe isolates the stream: a kernel that DMAs an (N, R, 1024) bf16 array
tile-by-tile through a VMEM ring and touches one vector per tile, for a
grid of tile sizes (R rows = 2*R KB/tile) and ring depths. If bigger
tiles / deeper rings push GB/s toward spec, per-DMA fixed cost is the
kernel's limiter and grouped-tile DMAs are worth the VMEM surgery.

Timing: the host sync through the axon tunnel costs ~30 ms — far more
than one stream pass — so each program loops the stream `passes` times
(lax.fori_loop) and the reported GB/s comes from the DELTA between a
high- and a low-pass-count run (the sync floor and dispatch cost cancel).
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def make_stream(N, R, ring, passes):
    def kernel(src, out, wtile, sem):
        def start(i):
            if i >= N:
                return
            pltpu.make_async_copy(
                src.at[i], wtile.at[i % ring], sem.at[i % ring]
            ).start()

        def one_pass(p, acc):
            for i in range(ring - 1):
                start(i)
            for i in range(N):
                start(i + ring - 1)
                pltpu.make_async_copy(
                    src.at[i], wtile.at[i % ring], sem.at[i % ring]
                ).wait()
                acc = acc + jnp.sum(
                    wtile[i % ring, 0:1, 0:128].astype(jnp.float32)
                )
            return acc

        acc = jax.lax.fori_loop(0, passes, one_pass, jnp.float32(0))
        out[0, :] = jnp.full((128,), acc, jnp.float32)

    def run(src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ring, R, 1024), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
        )(src)

    return jax.jit(run)


def make_stream_dot(N, R, ring, passes):
    """Consume each tile with a (1, R) @ (R, 1024) MXU dot — the decode
    kernel's per-tile work pattern. If the reported GB/s drops well below
    the pure-stream rate at the same tile size, Mosaic is NOT hiding the
    MXU consumption behind the DMA chain (per-tile wait->dot->start
    serializes), and fewer/wider dots (op-level tiles: qkv (D,3D), fc
    (D,4D), out (4D,D)) are the lever; if it holds, the kernels' gap to
    the isolated chain rate lives elsewhere (KV stream, attention, LN)."""

    def kernel(src, x, out, wtile, sem):
        def start(i):
            if i >= N:
                return
            pltpu.make_async_copy(
                src.at[i], wtile.at[i % ring], sem.at[i % ring]
            ).start()

        def one_pass(p, acc):
            for i in range(ring - 1):
                start(i)
            for i in range(N):
                start(i + ring - 1)
                pltpu.make_async_copy(
                    src.at[i], wtile.at[i % ring], sem.at[i % ring]
                ).wait()
                d = jax.lax.dot_general(
                    x[...], wtile[i % ring],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + d[0, 0]
            return acc

        acc = jax.lax.fori_loop(0, passes, one_pass, jnp.float32(0))
        out[0, :] = jnp.full((128,), acc, jnp.float32)

    def run(src, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ring, R, 1024), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
        )(src, x)

    return jax.jit(run)


def make_stream_dotgroup(N, R, ring, passes, group):
    """Wait `group` consecutive ring slots, then consume them with ONE
    (1, group*R) @ (group*R, 1024) dot on the contiguous multi-slot view
    (rhs-transposed row-block layout — the op-level dot-fusion candidate:
    qkv/fc/out as single MXU ops instead of 3-4 tile dots each). Needs
    group | ring and N % group == 0 so groups never wrap. Compare against
    --dot at the same tile size: the delta is the per-MXU-op overhead the
    fusion would reclaim."""
    assert ring % group == 0 and N % group == 0

    def kernel(src, x, out, wtile, sem):
        def start(i):
            if i >= N:
                return
            pltpu.make_async_copy(
                src.at[i], wtile.at[i % ring], sem.at[i % ring]
            ).start()

        def one_pass(p, acc):
            for i in range(ring - 1):
                start(i)
            for g in range(N // group):
                base = (g * group) % ring
                for j in range(group):
                    i = g * group + j
                    start(i + ring - 1)
                    pltpu.make_async_copy(
                        src.at[i], wtile.at[i % ring], sem.at[i % ring]
                    ).wait()
                w = wtile[base : base + group].reshape(group * R, 1024)
                d = jax.lax.dot_general(
                    x[...], w,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + d[0, 0]
            return acc

        acc = jax.lax.fori_loop(0, passes, one_pass, jnp.float32(0))
        out[0, :] = jnp.full((128,), acc, jnp.float32)

    def run(src, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ring, R, 1024), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
        )(src, x)

    return jax.jit(run)


def make_stream_chain(N, R, ring, passes, group):
    """DEPENDENT-chain variant: the dot lhs derives from the previous
    group's result — the real layer stack's structure (x -> qkv -> proj
    -> fc -> out -> x), which --dot cannot model (its dots are
    independent, so Mosaic hides them under the stream entirely).

    group=1: per-tile dots like the production kernel (g separate
    (1,1024) @ transposed-tile d1xd1 dots, summed). group>1: ONE
    (1,1024) x (g*1024,1024) d1xd1 dot on the contiguous multi-slot view
    (probe P9), then the same fold. Same bytes, same FLOPs, same per-
    group tanh nonlinearity — the delta between group=1 and group=g at
    the same tile size is the SERIAL per-MXU-op overhead the fused
    qkv/fc/out dots would reclaim in the kernels. Requires R == 1024
    (square tiles so the chain feeds back) and group | ring."""
    assert R == 1024 and ring % group == 0 and N % group == 0

    def kernel(src, x_in, out, wtile, sem):
        def start(i):
            if i >= N:
                return
            pltpu.make_async_copy(
                src.at[i], wtile.at[i % ring], sem.at[i % ring]
            ).start()

        def one_pass(p, x):
            for i in range(ring - 1):
                start(i)
            for g in range(N // group):
                base = (g * group) % ring
                for j in range(group):
                    i = g * group + j
                    start(i + ring - 1)
                    pltpu.make_async_copy(
                        src.at[i], wtile.at[i % ring], sem.at[i % ring]
                    ).wait()
                if group == 1:
                    # production-like per-tile dot (standard contraction)
                    d = jax.lax.dot_general(
                        x, wtile[base],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, 1024)
                else:
                    w = wtile[base: base + group].reshape(group * R, 1024)
                    dg = jax.lax.dot_general(
                        x, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, group*1024)
                    d = jnp.sum(dg.reshape(group, 1024), axis=0,
                                keepdims=True)
                x = jnp.tanh(d * 1e-3).astype(jnp.bfloat16)
            return x

        x = jax.lax.fori_loop(0, passes, one_pass, x_in[...])
        out[0, :] = x[0, :128].astype(jnp.float32)

    def run(src, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ring, R, 1024), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
        )(src, x)

    return jax.jit(run)


def make_stream2(N, R, ring, passes):
    """Dual-chain variant: even tiles stream through ring A, odd tiles
    through ring B (independent semaphore arrays). If Mosaic maps the two
    chains onto different DMA queues/engines, the combined rate should
    exceed the single-chain plateau (~690 GB/s r3) toward the HBM
    aggregate — the decision datum for splitting the decode kernel's
    weight stream."""

    def kernel(src, out, wa, wb, sa, sb):
        def start(i):
            if i >= N:
                return
            half, j = i % 2, i // 2
            w, s = (wa, sa) if half == 0 else (wb, sb)
            pltpu.make_async_copy(
                src.at[i], w.at[j % ring], s.at[j % ring]
            ).start()

        def one_pass(p, acc):
            for i in range(2 * ring - 2):
                start(i)
            for i in range(N):
                start(i + 2 * ring - 2)
                half, j = i % 2, i // 2
                w, s = (wa, sa) if half == 0 else (wb, sb)
                pltpu.make_async_copy(
                    src.at[i], w.at[j % ring], s.at[j % ring]
                ).wait()
                acc = acc + jnp.sum(
                    w[j % ring, 0:1, 0:128].astype(jnp.float32)
                )
            return acc

        acc = jax.lax.fori_loop(0, passes, one_pass, jnp.float32(0))
        out[0, :] = jnp.full((128,), acc, jnp.float32)

    def run(src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ring, R, 1024), jnp.bfloat16),
                pltpu.VMEM((ring, R, 1024), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((ring,)),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
        )(src)

    return jax.jit(run)


def _best(prog, src, *extra, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        float(prog(src, *extra)[0, 0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256, help="array MB per pass")
    ap.add_argument("--rows", default="512,1024,2048,4096",
                    help="tile rows (tile bytes = rows * 2 KB)")
    ap.add_argument("--rings", default="2,3,4")
    ap.add_argument("--p-lo", type=int, default=4)
    ap.add_argument("--p-hi", type=int, default=24)
    ap.add_argument("--dual", action="store_true",
                    help="two interleaved DMA chains (separate semaphores)")
    ap.add_argument("--dot", action="store_true",
                    help="consume each tile with a (1,R)@(R,1024) MXU dot "
                    "(the decode kernel's per-tile pattern)")
    ap.add_argument("--dotgroup", type=int, default=0,
                    help="consume G consecutive tiles with ONE "
                    "(1,G*R)@(G*R,1024) dot on the multi-slot view "
                    "(op-level dot-fusion candidate); needs G | ring")
    ap.add_argument("--chain", default="",
                    help="comma list of group sizes for the DEPENDENT-"
                    "chain variant (each dot feeds the next; 1 = per-tile "
                    "like the production kernel, 4 = fused transposed "
                    "group dots); R must be 1024 and G | ring")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    total = args.mb * (1 << 20)
    for R in [int(r) for r in args.rows.split(",")]:
        tile_b = R * 1024 * 2
        N = total // tile_b
        src = jax.jit(
            lambda k: jax.random.normal(k, (N, R, 1024), jnp.bfloat16)
        )(jax.random.PRNGKey(0))
        G = args.dotgroup
        xcols = G * R if G else R
        x = jax.jit(
            lambda k: jax.random.normal(k, (1, xcols), jnp.bfloat16)
        )(jax.random.PRNGKey(1)) if (args.dot or G) else None
        for ring in [int(r) for r in args.rings.split(",")]:
            if args.chain:
                if R != 1024:
                    continue
                xc = jax.jit(
                    lambda k: jax.random.normal(k, (1, 1024), jnp.bfloat16)
                )(jax.random.PRNGKey(1))
                for CG in [int(g) for g in args.chain.split(",")]:
                    if ring % CG or N % CG or ring * tile_b > 26 << 20:
                        continue
                    try:
                        lo = make_stream_chain(N, R, ring, args.p_lo, CG)
                        hi = make_stream_chain(N, R, ring, args.p_hi, CG)
                        float(lo(src, xc)[0, 0])
                        float(hi(src, xc)[0, 0])
                    except Exception as e:
                        print(f"chain{CG} tile {tile_b / (1 << 20):>4.1f} MB "
                              f"ring {ring}: FAIL {type(e).__name__}: {e}",
                              flush=True)
                        continue
                    dt = _best(hi, src, xc) - _best(lo, src, xc)
                    n_pass = args.p_hi - args.p_lo
                    gbs = total * n_pass / dt / 1e9
                    print(f"chain{CG} tile {tile_b / (1 << 20):>4.1f} MB "
                          f"ring {ring}: {gbs:6.1f} GB/s  "
                          f"({dt * 1e6 / (n_pass * N):.2f} us/tile)",
                          flush=True)
                continue
            if G and (ring % G or N % G):
                continue
            mk = (make_stream_dot if args.dot
                  else make_stream2 if args.dual else make_stream)
            n_bufs = 2 if args.dual else 1
            if n_bufs * ring * tile_b > 12 << 20:
                continue
            extra = (x,) if (args.dot or G) else ()
            try:
                if G:
                    lo = make_stream_dotgroup(N, R, ring, args.p_lo, G)
                    hi = make_stream_dotgroup(N, R, ring, args.p_hi, G)
                else:
                    lo = mk(N, R, ring, args.p_lo)
                    hi = mk(N, R, ring, args.p_hi)
                float(lo(src, *extra)[0, 0])
                float(hi(src, *extra)[0, 0])
            except Exception as e:
                print(f"tile {tile_b / (1 << 20):>4.1f} MB ring {ring}: "
                      f"FAIL {type(e).__name__}", flush=True)
                continue
            dt = _best(hi, src, *extra) - _best(lo, src, *extra)
            n_pass = args.p_hi - args.p_lo
            gbs = total * n_pass / dt / 1e9
            tag = (f"dotgroup{G} " if G
                   else "dot " if args.dot else "dual " if args.dual else "")
            print(f"{tag}tile {tile_b / (1 << 20):>4.1f} MB ring {ring}: "
                  f"{gbs:6.1f} GB/s  ({dt * 1e6 / (n_pass * N):.2f} us/DMA)",
                  flush=True)
        del src


if __name__ == "__main__":
    main()
