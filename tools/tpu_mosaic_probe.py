"""Mosaic capability probes for the semantic whole-stage kernel design.

Three questions (ROADMAP "unexplored next" for kernels/window.py):
  P1  lax.while_loop inside a Pallas TPU kernel body with a cond read from
      an SMEM scratch scalar the body updates.
  P2  vector-domain reduction -> SMEM scalar (jnp.max over a VMEM tile
      stored into SMEM scratch), then used as a DMA base index — the piece
      that would let a kernel DMA exactly one wte row for a sampled token
      instead of streaming the whole wte window through the MXU.
  P3  dynamic LEADING-index HBM read (gumbel row j of a (N, nw) buffer)
      inside a fori_loop — per-step noise rows for in-kernel sampling.

Four more for the DYNAMIC-LAYER kernels (fori_loop over transformer
layers instead of Python unrolling — the cold-start lever: kernel program
size, and with it Mosaic compile time, drops ~L-fold):
  P4  dynamic LEADING-index VMEM read (per-layer LN/bias rows of a packed
      (L, 16, D) VMEM ref, layer index traced by the loop).
  P5  dynamic LEADING-index VMEM write (staging the layer's fresh KV rows
      into a (L, 8, D) scratch at a traced layer index).
  P6  the block-unrolled weight-ring pattern: fori_loop over layer BLOCKS,
      DMA sources addressed by the traced block index, ring slots static
      (ring | tiles-per-block), cross-boundary prefetch under pl.when,
      vector loop carry.
  P7  VMEM -> HBM DMA with a traced leading index on the TARGET (the dyn
      prefill kernel's per-layer K/V slab write-out).
  P8  the same combined with a traced 8-aligned row offset (the batched
      dyn kernels' per-lane aligned-window write-back).

Run on the real chip: `python tools/tpu_mosaic_probe.py` (each probe
compiles a tiny kernel; failures print the Mosaic error and continue).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, fn):
    try:
        out = fn()
        print(f"PASS {name}: {out}")
        return True
    except Exception as e:  # noqa: BLE001 — report and continue probing
        msg = str(e).splitlines()
        head = "\n  ".join(msg[:6])
        print(f"FAIL {name}:\n  {head}")
        return False


# ---------------------------------------------------------------- P1
def probe_while_loop():
    def kernel(x_ref, o_ref, cnt):
        cnt[0] = 0

        def cond(c):
            return cnt[0] < x_ref[0, 0].astype(jnp.int32)

        def body(c):
            cnt[0] = cnt[0] + 1
            return c + 1

        n = jax.lax.while_loop(cond, body, jnp.int32(0))
        o_ref[0, 0] = n

    x = jnp.full((1, 1), 7, jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(x)
    got = int(np.asarray(out)[0, 0])
    assert got == 7, got
    return f"while_loop ran 7 iters -> {got}"


# ---------------------------------------------------------------- P2
def probe_vector_to_smem_scalar():
    # argmax lane index of a (1, 256) f32 row reduced in the vector domain,
    # stored to SMEM, read back as a scalar into scalar arithmetic
    def kernel(v_ref, o_ref, idx):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        m = jnp.max(v_ref[:, :])
        tok = jnp.min(jnp.where(v_ref[:, :] == m, lane, jnp.int32(2**30)))
        idx[0] = tok  # vector-reduced value stored to SMEM
        o_ref[0, 0] = idx[0] * 2 + 1

    v = jnp.zeros((1, 256), jnp.float32).at[0, 93].set(5.0)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(v)
    got = int(np.asarray(out)[0, 0])
    assert got == 187, got
    return "argmax lane -> SMEM scalar -> scalar arithmetic OK"


# ---------------------------------------------------------------- P2b
def probe_scalar_dma_row():
    # SMEM scalar (from a vector reduction) as the base of an 8-row HBM DMA
    def kernel2(v_ref, tbl_hbm, o_ref, idx, row, sem):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        m = jnp.max(v_ref[:, :])
        tok = jnp.min(jnp.where(v_ref[:, :] == m, lane, jnp.int32(2**30)))
        base = (tok // 8) * 8
        idx[0] = base
        cp = pltpu.make_async_copy(tbl_hbm.at[pl.ds(idx[0], 8)], row, sem)
        cp.start()
        cp.wait()
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        o_ref[:, :] = jnp.sum(
            jnp.where(sub == (tok - idx[0]), row[:, :], 0.0),
            axis=0, keepdims=True,
        )

    v = jnp.zeros((1, 256), jnp.float32).at[0, 93].set(5.0)
    tbl = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    out = pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(v, tbl)
    got = np.asarray(out)
    assert np.allclose(got, np.asarray(tbl)[93]), got[0, :4]
    return "vector argmax -> SMEM scalar -> dynamic HBM row DMA OK"


# ---------------------------------------------------------------- P3
def probe_dynamic_leading_dma():
    def kernel(g_hbm, o_ref, row, sem):
        def body(j, acc):
            cp = pltpu.make_async_copy(
                g_hbm.at[pl.ds(j * 1, 1)], row, sem
            )
            cp.start()
            cp.wait()
            return acc + row[0, :]

        o_ref[0, :] = jax.lax.fori_loop(
            0, 4, body, jnp.zeros((128,), jnp.float32)
        )

    g = jnp.arange(4 * 128, dtype=jnp.float32).reshape(4, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(g)
    got = np.asarray(out)
    want = np.asarray(g).sum(axis=0)
    assert np.allclose(got[0], want), got[0, :4]
    return "fori_loop dynamic leading-index HBM row DMA OK"


# ---------------------------------------------------------------- P4
def probe_dynamic_vmem_read():
    # per-layer packed params: (L, 16, 128) f32 VMEM ref, row reads at a
    # TRACED layer index (both the (16, 128) block form and the single
    # (128,) row form the dynamic-layer stack uses)
    L = 6

    def kernel(p_ref, o_ref):
        def body(l, acc):
            blk = p_ref[l]            # (16, 128) dynamic leading index
            row = p_ref[l, 3]         # (128,) dynamic leading + static row
            return acc + blk[0] + row * 2.0

        o_ref[0, :] = jax.lax.fori_loop(
            0, L, body, jnp.zeros((128,), jnp.float32)
        )

    p = jnp.arange(L * 16 * 128, dtype=jnp.float32).reshape(L, 16, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p)
    got = np.asarray(out)[0]
    pn = np.asarray(p)
    want = pn[:, 0].sum(axis=0) + 2.0 * pn[:, 3].sum(axis=0)
    assert np.allclose(got, want), got[:4]
    return "fori_loop dynamic leading-index VMEM reads OK"


# ---------------------------------------------------------------- P5
def probe_dynamic_vmem_write():
    # stage (8, 128) KV rows into a (L, 8, 128) VMEM scratch at a traced
    # layer index, then DMA the whole stack out (the decode kernels'
    # batched row write-back)
    L = 6

    def kernel(x_ref, o_ref, stage, sem):
        def body(l, c):
            stage[l] = x_ref[:, :] + l.astype(jnp.float32)
            return c

        jax.lax.fori_loop(0, L, body, jnp.int32(0))
        cp = pltpu.make_async_copy(stage, o_ref, sem)
        cp.start()
        cp.wait()

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((L, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    got = np.asarray(out)
    want = np.asarray(x)[None] + np.arange(L, dtype=np.float32)[:, None, None]
    assert np.allclose(got, want), got[0, 0, :4]
    return "fori_loop dynamic leading-index VMEM stores OK"


# ---------------------------------------------------------------- P6
def probe_dyn_ring_stream():
    # the dynamic-layer weight stream in miniature: L layers x 2 tiles per
    # layer, ring of 2 VMEM slots (ring | tiles-per-layer -> slots static),
    # DMA sources at a traced layer index, cross-boundary prefetch of the
    # NEXT layer's first tile under pl.when, vector fori_loop carry.
    L, T, ring = 6, 2, 2

    def kernel(w_hbm, o_ref, wtile, sem):
        def start(l, t):
            slot = t % ring
            pltpu.make_async_copy(
                w_hbm.at[l, t], wtile.at[slot], sem.at[slot]
            ).start()

        # warm-up: first ring-1 tiles of layer 0
        start(0, 0)

        def body(l, x):
            for t in range(T):
                # prefetch position +ring-1 (crosses into layer l+1)
                t2 = t + ring - 1
                if t2 < T:
                    start(l, t2)
                else:
                    @pl.when(l + 1 < L)
                    def _():
                        start(l + 1, t2 - T)
                slot = t % ring
                pltpu.make_async_copy(
                    w_hbm.at[0, 0], wtile.at[slot], sem.at[slot]
                ).wait()
                x = x + wtile[slot][0]
            return x

        o_ref[0, :] = jax.lax.fori_loop(
            0, L, body, jnp.zeros((128,), jnp.float32)
        )

    w = jnp.arange(L * T * 8 * 128, dtype=jnp.float32).reshape(L, T, 8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ring, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
    )(w)
    got = np.asarray(out)[0]
    want = np.asarray(w)[:, :, 0].sum(axis=(0, 1))
    assert np.allclose(got, want), got[:4]
    return "block-unrolled dynamic ring stream OK"


# ---------------------------------------------------------------- P7
def probe_dynamic_hbm_write():
    # VMEM -> HBM DMA whose TARGET row block is addressed by a traced
    # loop index (the dyn prefill kernel's per-layer K/V slab write-out)
    L = 6

    def kernel(x_ref, o_ref, sem):
        def body(l, c):
            cp = pltpu.make_async_copy(x_ref, o_ref.at[l], sem)
            cp.start()
            cp.wait()
            return c

        jax.lax.fori_loop(0, L, body, jnp.int32(0))

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    got = np.asarray(out)
    want = np.broadcast_to(np.asarray(x)[None], (L, 8, 128))
    assert np.allclose(got, want), got[0, 0, :4]
    return "fori_loop dynamic leading-index HBM write target OK"


# ---------------------------------------------------------------- P8
def probe_dynamic_hbm_write_rowoff():
    # the batched dyn kernels' write-back shape: VMEM -> HBM DMA whose
    # target combines a TRACED leading index (layer) with a TRACED
    # 8-aligned row offset (the lane's n_past window)
    L = 4

    def kernel(x_ref, off_ref, o_ref, sem):
        def body(l, c):
            base = pl.multiple_of((off_ref[0, 0] // 8) * 8, 8)
            cp = pltpu.make_async_copy(
                x_ref, o_ref.at[l, pl.ds(base, 8)], sem
            )
            cp.start()
            cp.wait()
            return c

        jax.lax.fori_loop(0, L, body, jnp.int32(0))

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    off = jnp.full((1, 1), 19, jnp.int32)  # base rounds to 16
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 32, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x, off)
    got = np.asarray(out)[:, 16:24]
    want = np.broadcast_to(np.asarray(x)[None], (L, 8, 128))
    assert np.allclose(got, want), got[0, 0, :4]
    return "traced leading index + traced row offset HBM write OK"


# ---------------------------------------------------------------- P9
def probe_transposed_group_dot():
    """Wide-dot prerequisite (op-level dot fusion): one dot_general with
    BOTH operands contracting on their minor (lane) dim — x (1, D) against
    a transposed weight view W' (gD, D) reshaped from g consecutive (D, D)
    ring-slot blocks — i.e. x @ W'^T without a relayout. This is how the
    fused qkv (g=3) / fc (g=4) dots consume column-block weights stored
    row-major-transposed. Checks against the g separate per-tile dots."""
    D, g = 128, 3
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (1, D), jnp.float32)
    wt = jax.random.normal(k2, (g, D, D), jnp.float32)  # g transposed blocks

    def kernel(x_ref, w_ref, o_ref, wtile, sem):
        for t in range(g):
            pltpu.make_async_copy(w_ref.at[t], wtile.at[t], sem.at[t]).start()
        for t in range(g):
            pltpu.make_async_copy(w_ref.at[t], wtile.at[t], sem.at[t]).wait()
        wv = wtile[...].reshape(g * D, D)  # (gD, D) multi-slot view
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], wv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, g * D), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((g, D, D), jnp.float32),
            pltpu.SemaphoreType.DMA((g,)),
        ],
    )(x, wt)
    want = np.concatenate(
        [np.asarray(x) @ np.asarray(wt[t]).T for t in range(g)], axis=1
    )
    assert np.allclose(np.asarray(out), want, atol=1e-4), (
        np.abs(np.asarray(out) - want).max()
    )
    return "x(1,D) . W'(gD,D) dim1xdim1 on a multi-slot view OK"


def main():
    interp = "--interpret" in sys.argv
    if interp:
        jax.config.update("jax_platforms", "cpu")
        _orig = pl.pallas_call
        pl.pallas_call = functools.partial(_orig, interpret=True)
    print("backend:", jax.default_backend())
    results = [
        _run("P1 while_loop in kernel", probe_while_loop),
        _run("P2 vector->SMEM scalar", probe_vector_to_smem_scalar),
        _run("P2b scalar-indexed HBM DMA", probe_scalar_dma_row),
        _run("P3 dynamic leading DMA", probe_dynamic_leading_dma),
        _run("P4 dynamic leading VMEM read", probe_dynamic_vmem_read),
        _run("P5 dynamic leading VMEM write", probe_dynamic_vmem_write),
        _run("P6 dynamic ring stream", probe_dyn_ring_stream),
        _run("P7 dynamic HBM write target", probe_dynamic_hbm_write),
        _run("P8 dynamic HBM write + row offset", probe_dynamic_hbm_write_rowoff),
        _run("P9 transposed group dot", probe_transposed_group_dot),
    ]
    print(f"{sum(results)}/{len(results)} probes passed")


if __name__ == "__main__":
    main()
