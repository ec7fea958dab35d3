"""Fused whole-context GPT prefill as one Pallas TPU kernel.

Why: the coarse stage re-primes its KV cache every sliding window (the
reference rebuilds a ggml graph per window, /root/reference/bark.cpp:
1770-1848; our XLA `gpt.prefill` costs ~4.9 ms per 1024-row bark-large
window on a v5e) and, worse, handing XLA-written caches to the fused Pallas
decode kernel costs another ~3.7 ms/window of scheduling overhead that no
aliasing hint removes (measured r3: zeros+60-step decode scan 53.9 ms,
prefill+scan 62.5, prefill+scan-on-fresh-zeros 58.8; an optimization
barrier and a hoisted first step both made it worse). This kernel runs the
whole prefill — all layers, causal attention, final-LN LM-head row — as one
pallas_call that streams weight tiles from HBM like the decode kernel and
writes each layer's K/V directly into the decode kernel's aliased
(L, S, D) HBM cache slabs: kernel-rate compute, zero hand-off.

Design (one invocation per window; T = the context rows right-padded to
the 256-row block size — NOT to the cache length, so the 257-row semantic
prompt computes 512 rows, not 1024):
- VMEM residents: the residual stream x, this layer's Q/K/V (each (T, D)
  params-dtype) and one (T, D) f32 scratch that serves as the x1
  staging in the QKV phase and the MLP out-accumulator later. Weight tiles
  stream through a ring whose depth (and the attention query-row block)
  shrinks on big shapes to fit VMEM (`_vmem_plan`).
- weights stream as COLUMN sub-tiles (D, D/split), pre-relaid contiguous
  by `prepare_prefill_params` (a column slice of the row-major weights
  would DMA in tiny strided chunks). Each sub-tile yields FINAL output
  columns — no cross-sub-tile partial sums, so the split changes nothing
  numerically and needs no staging. The per-layer schedule interleaves
  fc_t/out_t so h never materializes as (T, 4D) (8 MB on bark-large).
- attention avoids per-head (hd=64) lane slices, which Mosaic cannot
  address: heads process in 128-lane PAIRS with even/odd lane masks —
  scores_h = (Q_pair . m_h) x K_pair^T contracts the pair's 128 lanes with
  the other head zeroed (2x score/context MACs vs ideal ~= +0.5 ms of a
  ~4 ms window; the decode kernel's (S, H) head-segment trick does not
  extend to multi-row queries). Softmax is f32 row-wise, queries process
  in 256-row blocks to bound the (rows, T) f32 score live-range, and the
  context overwrites Q's pair lanes in place.
- numerics mirror models/gpt.py prefill: f32 layernorm cast to the params
  dtype, dots accumulate f32 then cast before the bias add, scale applied
  to f32 scores, f32 softmax, att cast to params dtype for the context
  dot, params-dtype residual, gelu(tanh) on params-dtype activations,
  final row selected at n_valid-1 (mask-reduce — Mosaic has no dynamic
  sublane indexing), ln_f on that row, streamed LM-head tail (lm_window
  supported, untouched logits zero).

Shape support (`supports_fused_prefill`): T == cfg.block_size, T % 256
== 0, D % 128 == 0, head_dim 64, n_head even, dense unquantized weights,
flat (L, S, D) caches.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bark_tpu.models.gpt import GPTConfig
from bark_tpu.kernels.decode import (
    _compiler_params,
    _ln_f32,
    _v_pad,
    ensure_layer_params,
)

_RB = 256  # attention query-row block


def supports_fused_prefill(cfg: GPTConfig, T: int, params=None) -> bool:
    # T may be < block_size: the wrapper right-pads to S. Pad rows sit at
    # positions AFTER every live row, so the causal mask keeps them out of
    # live rows' attention; their cache rows are always overwritten by a
    # decode step before any mask admits them (same argument as
    # gpt.prefill_chunked's dead-slot contract).
    ok = (
        T <= cfg.block_size
        and cfg.block_size % _RB == 0
        and cfg.n_embd % 128 == 0
        and cfg.n_embd % cfg.n_head == 0
        and cfg.n_embd // cfg.n_head == 64
        and cfg.n_head % 2 == 0
    )
    if ok:
        # a VMEM plan must exist for the padded context (estimated at the
        # production bf16 itemsize, or the params dtype when given);
        # prefill_fused re-plans at the real dtype and falls back to
        # gpt.prefill itself if that stricter plan fails
        item = (
            2 if params is None
            else jnp.dtype(params["wpe"].dtype).itemsize
        )
        T_k = min(cfg.block_size, -(-max(T, 1) // _RB) * _RB)
        ok = _vmem_plan(cfg, T_k, _pick_split(cfg.n_embd), item) is not None
    if ok and params is not None:
        ok = "blocks" in params and "qkv_w" in params["blocks"]
    return ok


def pick_prefill(cfg: GPTConfig, decode_fn, kv_quant: bool, ctx_size: int):
    """The fused Pallas prefill when the decode side is the fused kernel
    and shapes allow — it writes the caches straight into the decode
    kernel's aliased HBM slabs, killing both the XLA prefill's gap to
    kernel-rate and the ~3.7 ms/window cache hand-off penalty (measured
    r3). Returns None for the XLA fallback (tiny test shapes, XLA decode,
    quantized KV)."""
    if (
        getattr(decode_fn, "is_fused", False)
        and not kv_quant
        and supports_fused_prefill(cfg, ctx_size)
    ):
        return functools.partial(
            prefill_fused, cfg,
            interpret=getattr(decode_fn, "interpret", False),
        )
    return None


def _pick_split(D: int) -> int:
    if D >= 1024:
        return 4
    if D >= 512:
        return 2
    return 1


def _vmem_budget() -> int:
    """Planner budget derived from the per-kernel scoped-VMEM limit the
    kernels request (decode._compiler_params): the limit minus a ~3 MB
    margin for Mosaic's compiled stack (measured r4: the T=D=1024 plan
    modeled 15.7 MB and used 18.01 real). Under the default 64 MiB limit
    every production shape keeps the preferred (4, 256) plan — the old
    16 MiB default forced bark-large coarse down to (2, 64), quartering
    the attention MXU op rows. BARK_TPU_VMEM_LIMIT_MB=0 restores XLA's
    default limit and the conservative 15 MB budget."""
    mb = int(os.environ.get("BARK_TPU_VMEM_LIMIT_MB", "64"))
    if mb <= 0:
        return 15 * 2**20
    return mb * 2**20 - 3 * 2**20


def _vmem_plan(cfg: GPTConfig, T: int, split: int, itemsize: int,
               extra_bytes: int = 0):
    """(ring, rb, fits_default_window) fitting the VMEM budget, or None
    when no candidate fits
    (pick_prefill then falls back to the XLA prefill rather than risking a
    Mosaic VMEM-OOM at stage-compile time). Prefer a 4-deep tile ring and
    256-row attention query blocks; shrink the ring first (the prefill is
    compute-bound, so a shallow ring costs less than smaller MXU ops),
    then the query block."""
    D, L = cfg.n_embd, cfg.n_layer
    fixed = (
        4 * T * D * itemsize  # xbuf qb kb vb
        + T * D * 4  # acc (x1 staging + MLP out accumulator, f32)
        + L * 17 * D * itemsize  # ln/bias inputs (3D+4D+2D+8 rows ~ 17D)
        + _v_pad(cfg) * 4  # logits row
        + 2 * T * 128 * itemsize  # vpe/vpo head-pair V columns
        + extra_bytes
    )
    tile = D * (D // split) * itemsize
    # pass 1: plans that fit XLA's default scoped-vmem window (no raised
    # limit — see decode._compiler_params; measured ~15-20% runtime loss
    # from an unnecessary raise at bark-small). The 13 MiB bound leaves
    # ~3.8 MiB for the compiled stack (measured r4: T=D=1024 modeled
    # 15.7 MB -> 18.01 real, i.e. ~2.3 MB of stack at the LARGE shape).
    # Pass 2: the raised budget for shapes that can't fit the default
    # window at any depth (bark-large, even at (2, 64)).
    for budget, fits in ((13 * 2**20, True), (_vmem_budget(), False)):
        for ring, rb in ((4, _RB), (3, _RB), (2, _RB), (2, 128), (2, 64)):
            # live attention temporaries: s + e (rb, T) f32, att (rb, T)
            # cdt, ctx (rb, 128) f32 — ~2.5 score planes together
            temps = rb * T * (2 * 4 + itemsize) + rb * 128 * 4
            need = fixed + ring * tile + temps
            if need <= budget:
                return ring, rb, fits
    return None


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _LMSpan:
    """Static (lm_t0, lm_t1) carried inside the prepared-params pytree.

    Plain ints in a pytree become traced i32 scalars when the prepared
    params cross a jit boundary as an ARGUMENT (the stepped/streaming
    coarse window program passes `dense` that way), and the kernel needs
    them as Python ints (`range(lm_count)`) — register_static keeps them
    in the treedef instead of the leaves."""
    t0: int
    t1: int


def prepare_prefill_params(cfg: GPTConfig, params, *, lm_window=None):
    """Return `params` extended with contiguous column-sub-tile copies of
    the weights ("_prefill_tiles"). MUST be called outside the window loop
    (stage programs call it once per invocation, next to
    prepare_decode_params — XLA does not hoist the relayouts out of a
    while_loop)."""
    params = ensure_layer_params(cfg, params)  # no-op unless dyn layers
    if "_prefill_tiles" in params:
        return params
    L, D = cfg.n_layer, cfg.n_embd
    v_pad = _v_pad(cfg)
    nt = v_pad // D
    split = _pick_split(D)
    Dc = D // split
    b = params["blocks"]
    if lm_window is None:
        lm_t0, lm_t1 = 0, nt
    else:
        lo, hi = lm_window
        lm_t0, lm_t1 = lo // D, -(-min(hi, v_pad) // D)

    lm = params["lm_head"][0]  # (V, D)
    lm_pad = jnp.zeros((v_pad, D), lm.dtype).at[: cfg.n_out_vocab].set(lm)
    # tile jt = lm_pad[jt*D:(jt+1)*D].T, then column sub-tiles
    lm_tiles = (
        lm_pad.reshape(nt, D, D).swapaxes(1, 2)[lm_t0:lm_t1]
        .reshape(-1, D, split, Dc).transpose(0, 2, 1, 3)
    )
    out = dict(params)
    out["_prefill_tiles"] = {
        # (L, D, 3D) -> (L, 3, split, D, Dc)
        "qkv": b["qkv_w"].reshape(L, D, 3, split, Dc).transpose(0, 2, 3, 1, 4),
        # (L, D, D) -> (L, split, D, Dc)
        "proj": b["proj_w"].reshape(L, D, split, Dc).transpose(0, 2, 1, 3),
        # (L, D, 4D) -> (L, 4, split, D, Dc)
        "fc": b["fc_w"].reshape(L, D, 4, split, Dc).transpose(0, 2, 3, 1, 4),
        # (L, 4D, D) -> (L, 4, split, D, Dc)
        "out": b["out_w"].reshape(L, 4, D, split, Dc).transpose(0, 1, 3, 2, 4),
        "lm": lm_tiles,
        "lm_tiles": _LMSpan(lm_t0, lm_t1),
    }
    return out


def _dyn_ring_pre(ring: int, split: int) -> int:
    """Largest ring <= `ring` dividing the per-layer sub-tile count
    (12*split): makes every slot static under a traced layer index."""
    s12 = 12 * split
    for r in range(min(ring, s12), 1, -1):
        if s12 % r == 0:
            return r
    return 2


def _stream_dyn(L, split, lm_count, ring, qkv, proj, fc, outw, lm,
                wtile, sem_w):
    """TRACED-layer-index weight stream for the dyn prefill kernel —
    same flat schedule as `_sources` ([12*split sub-tiles per layer]
    [lm_count*split LM sub-tiles]) with the layer region addressed by a
    traced index. Ring slots static because ring | 12*split. Returns
    (warmup, consume_layer, consume_lm)."""
    s12 = 12 * split
    assert s12 % ring == 0 and ring >= 2, (ring, split)
    n_lm = lm_count * split

    def _lsrc(l, c):
        if c < 3 * split:
            return qkv.at[l, c // split, c % split]
        if c < 4 * split:
            return proj.at[l, c - 3 * split]
        j = c - 4 * split
        t, r = j // (2 * split), j % (2 * split)
        if r < split:
            return fc.at[l, t, r]
        return outw.at[l, t, r - split]

    def _start(src, slot):
        pltpu.make_async_copy(src, wtile.at[slot], sem_w.at[slot]).start()

    def _start_lm(m, slot):
        if m < n_lm:
            _start(lm.at[m // split, m % split], slot)

    def warmup():
        for i in range(ring - 1):
            if i < L * s12:
                _start(_lsrc(i // s12, i % s12), i % ring)
            else:
                _start_lm(i - L * s12, i % ring)

    def _consume_at(slot):
        pltpu.make_async_copy(
            proj.at[0, 0], wtile.at[slot], sem_w.at[slot]
        ).wait()
        return wtile[slot]

    def consume_layer(l, c):
        c2 = c + ring - 1
        slot2 = c2 % ring
        if c2 < s12:
            _start(_lsrc(l, c2), slot2)
        else:
            c3 = c2 - s12

            @pl.when(l + 1 < L)
            def _():
                _start(_lsrc(l + 1, c3), slot2)

            if c3 < n_lm:
                @pl.when(l + 1 == L)
                def _():
                    _start_lm(c3, slot2)
        return _consume_at(c % ring)

    def consume_lm(m):
        _start_lm(m + ring - 1, (m + ring - 1) % ring)
        return _consume_at(m % ring)

    return warmup, consume_layer, consume_lm


def _lane_layers_dyn(
    cfg: GPTConfig, T: int, split: int, rb: int, consume_layer,
    lp, xbuf, qb, kb, vb, acc,
    start_k, start_v, wait_k, wait_v,
    col_ids, m_even, m_odd,
):
    """Dynamic-layer twin of `_lane_layers`: a lax.fori_loop over layers
    instead of a Python unroll (~L-fold smaller Mosaic program — compile
    time is the prefill kernel's dominant cold-start cost at bark-large).
    Per-layer LN/bias rows come from the packed (L, 16, D) f32 `lp`
    (decode.pack_layer_params) at the traced index; the K/V slab
    write-outs target k_out.at[l] with the traced index (probe P7).
    Bit-identical math to the unrolled pass."""
    L, D, H = cfg.n_layer, cfg.n_embd, cfg.n_head
    hd = D // H
    NB = T // rb
    Dc = D // split
    cdt = xbuf.dtype
    scale = jnp.float32(1.0 / np.sqrt(hd))

    def ck(k):
        return pl.ds(k * Dc, Dc)

    def body(l, carry):
        acc[:, :D] = _ln_f32(xbuf[:], lp[l, 0], lp[l, 1]).astype(cdt) \
            .astype(jnp.float32)

        for t, dst in enumerate((qb, kb, vb)):
            b_row = lp[l, 6 + t].astype(cdt)
            for k in range(split):
                w = consume_layer(l, t * split + k)
                x1 = acc[:, :D].astype(cdt)
                dst[:, ck(k)] = (
                    _dotf(x1, w).astype(cdt)
                    + b_row[k * Dc : (k + 1) * Dc]
                )
            if t == 1:
                start_k(l)
            elif t == 2:
                start_v(l)

        for c in range(H // 2):
            cs = pl.ds(c * 128, 128)
            kp = kb[:, cs]
            vpe = vb[:, cs] * m_even
            vpo = vb[:, cs] * m_odd
            for b in range(NB):
                rs = pl.ds(b * rb, rb)
                qp = qb[rs, cs]
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (rb, 1), 0
                ) + b * rb
                causal = col_ids <= rows
                ctx = None
                for m, vp in ((m_even, vpe), (m_odd, vpo)):
                    s = _dotf_nt(qp * m, kp) * scale
                    s = jnp.where(causal, s, jnp.float32(-1e9))
                    mx = jnp.max(s, axis=1, keepdims=True)
                    e = jnp.exp(s - mx)
                    att = (e / jnp.sum(e, axis=1, keepdims=True)).astype(cdt)
                    p = _dotf(att, vp)
                    ctx = p if ctx is None else ctx + p
                qb[rs, cs] = ctx.astype(cdt)

        pb = lp[l, 4].astype(cdt)
        for k in range(split):
            w = consume_layer(l, 3 * split + k)
            proj = _dotf(qb[:], w).astype(cdt) + pb[k * Dc : (k + 1) * Dc]
            xbuf[:, ck(k)] = xbuf[:, ck(k)] + proj

        wait_v(l)
        vb[:, :] = _ln_f32(xbuf[:], lp[l, 2], lp[l, 3]).astype(cdt)
        wait_k(l)
        for t in range(4):
            fb = lp[l, 9 + t].astype(cdt)
            for k in range(split):
                w = consume_layer(l, (4 + 2 * t) * split + k)
                kb[:, ck(k)] = jax.nn.gelu(
                    _dotf(vb[:], w).astype(cdt)
                    + fb[k * Dc : (k + 1) * Dc],
                    approximate=True,
                )
            for k in range(split):
                w = consume_layer(l, (5 + 2 * t) * split + k)
                part = _dotf(kb[:], w)
                if t == 0:
                    acc[:, ck(k)] = part
                else:
                    acc[:, ck(k)] = acc[:, ck(k)] + part
        xbuf[:, :] = xbuf[:] + (
            acc[:, :D].astype(cdt) + lp[l, 5].astype(cdt)
        )
        return carry

    jax.lax.fori_loop(0, L, body, jnp.int32(0))


def _dotf(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dotf_nt(a, b):
    """a @ b^T (contract both lane dims), f32 accumulate."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _sources(L, split, lm_count, qkv, proj, fc, outw, lm):
    """Flat schedule: per layer [qkv t0..t2, proj, fc0, out0, .., fc3,
    out3] x split column sub-tiles each, then the LM tiles."""
    src = []
    for l in range(L):
        for t in range(3):
            for k in range(split):
                src.append(qkv.at[l, t, k])
        for k in range(split):
            src.append(proj.at[l, k])
        for t in range(4):
            for k in range(split):
                src.append(fc.at[l, t, k])
            for k in range(split):
                src.append(outw.at[l, t, k])
    for i in range(lm_count):
        for k in range(split):
            src.append(lm.at[i, k])
    return src


def _lane_layers(
    cfg: GPTConfig, T: int, split: int, rb: int, consume, si: int,
    xbuf, qb, kb, vb, acc,
    ln1_g, ln1_b, ln2_g, ln2_b, qkv_b, proj_b, fc_b, out_b,
    start_k, start_v, wait_k, wait_v,
    col_ids, m_even, m_odd,
):
    """One context's full transformer pass — the SINGLE shared copy of the
    prefill layer math (the batched kernel runs it once per lane). `consume`
    yields weight sub-tiles off the flat schedule starting at `si`;
    `start_k(l)`/`start_v(l)` DMA the just-computed kb/vb slab to that
    lane's HBM cache rows and `wait_k`/`wait_v` drain them before the
    buffers are reused as MLP scratch. Returns the schedule cursor after
    the last layer (the LM tiles follow)."""
    L, D, H = cfg.n_layer, cfg.n_embd, cfg.n_head
    hd = D // H
    NB = T // rb
    Dc = D // split
    cdt = xbuf.dtype
    scale = jnp.float32(1.0 / np.sqrt(hd))

    def ck(k):  # output column range of sub-tile k
        return pl.ds(k * Dc, Dc)

    for l in range(L):
        # ---- x1 staging (f32 container holds the cdt-cast LN values)
        acc[:, :D] = _ln_f32(xbuf[:], ln1_g[l], ln1_b[l]).astype(cdt) \
            .astype(jnp.float32)

        # ---- Q/K/V columns; K/V slabs go straight to the HBM cache
        for t, dst in enumerate((qb, kb, vb)):
            for k in range(split):
                w = consume(si)
                si += 1
                x1 = acc[:, :D].astype(cdt)
                dst[:, ck(k)] = (
                    _dotf(x1, w).astype(cdt)
                    + qkv_b[l, pl.ds(t * D + k * Dc, Dc)]
                )
            if t == 1:
                start_k(l)
            elif t == 2:
                start_v(l)

        # ---- causal attention, head pairs, ctx overwrites qb's lanes
        for c in range(H // 2):
            cs = pl.ds(c * 128, 128)
            kp = kb[:, cs]
            vpe = vb[:, cs] * m_even
            vpo = vb[:, cs] * m_odd
            for b in range(NB):
                rs = pl.ds(b * rb, rb)
                qp = qb[rs, cs]
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (rb, 1), 0
                ) + b * rb
                causal = col_ids <= rows  # (RB, T) static
                ctx = None
                for m, vp in ((m_even, vpe), (m_odd, vpo)):
                    s = _dotf_nt(qp * m, kp) * scale
                    s = jnp.where(causal, s, jnp.float32(-1e9))
                    mx = jnp.max(s, axis=1, keepdims=True)
                    e = jnp.exp(s - mx)
                    att = (e / jnp.sum(e, axis=1, keepdims=True)).astype(cdt)
                    p = _dotf(att, vp)
                    ctx = p if ctx is None else ctx + p
                qb[rs, cs] = ctx.astype(cdt)

        # ---- proj + residual
        for k in range(split):
            w = consume(si)
            si += 1
            proj = _dotf(qb[:], w).astype(cdt) \
                + proj_b[l, pl.ds(k * Dc, Dc)]
            xbuf[:, ck(k)] = xbuf[:, ck(k)] + proj

        # ---- MLP; vb becomes x2, kb becomes h_t, acc accumulates out
        wait_v(l)
        vb[:, :] = _ln_f32(xbuf[:], ln2_g[l], ln2_b[l]).astype(cdt)
        wait_k(l)
        for t in range(4):
            for k in range(split):
                w = consume(si)
                si += 1
                kb[:, ck(k)] = jax.nn.gelu(
                    _dotf(vb[:], w).astype(cdt)
                    + fc_b[l, pl.ds(t * D + k * Dc, Dc)],
                    approximate=True,
                )
            for k in range(split):
                w = consume(si)
                si += 1
                part = _dotf(kb[:], w)
                if t == 0:
                    acc[:, ck(k)] = part
                else:
                    acc[:, ck(k)] = acc[:, ck(k)] + part
        xbuf[:, :] = xbuf[:] + (
            acc[:, :D].astype(cdt) + out_b[l]
        )
    return si


def _prefill_kernel(
    cfg: GPTConfig,
    T: int,
    v_pad: int,
    lm_tiles: tuple,
    split: int,
    ring: int,
    rb: int,
    dyn: bool,
    *refs,
):
    """Kernel body; refs (built by prefill_fused):

      ln1_g ln1_b ln2_g ln2_b qkv_b proj_b fc_b out_b — or, when dyn, the
      single packed lp (L, 16, D) f32 (the layer loop is then a
      lax.fori_loop, _lane_layers_dyn) — then lnf_g lnf_b (VMEM),
      nv (1,1) i32 SMEM, x_in (T, D) HBM,
      qkv proj fc out lm sub-tile trees (HBM),
      k_hbm v_hbm (HBM, aliased) -> k_out v_out, logits (1, v_pad) VMEM
      scratch: xbuf qb kb vb (T, D) cdt, acc (T, D) f32,
               wtile (ring, D, D/split), sem_w (ring,), sem_x, sem_kv (2,)
    """
    it = iter(refs)
    if dyn:
        lp = next(it)
        ln1_g = ln1_b = ln2_g = ln2_b = None
        qkv_b = proj_b = fc_b = out_b = None
    else:
        ln1_g, ln1_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
        qkv_b, proj_b, fc_b, out_b = next(it), next(it), next(it), next(it)
    lnf_g, lnf_b = next(it), next(it)
    nv_ref, x_in = next(it), next(it)
    qkv_w, proj_w, fc_w, out_w, lm_w = (next(it) for _ in range(5))
    _k_in, _v_in = next(it), next(it)  # aliased to k_out/v_out below
    k_out, v_out, logits_ref = next(it), next(it), next(it)
    xbuf, qb, kb, vb, acc = (next(it) for _ in range(5))
    wtile = next(it)
    sem_w, sem_x, sem_kv = next(it), next(it), next(it)

    L, D, H = cfg.n_layer, cfg.n_embd, cfg.n_head
    hd = D // H
    Dc = D // split
    lm_t0, lm_t1 = lm_tiles
    n_valid = nv_ref[0, 0]
    cdt = xbuf.dtype

    start_k = lambda l: pltpu.make_async_copy(
        kb, k_out.at[l, pl.ds(0, T)], sem_kv.at[0]
    ).start()
    start_v = lambda l: pltpu.make_async_copy(
        vb, v_out.at[l, pl.ds(0, T)], sem_kv.at[1]
    ).start()
    wait_k = lambda l: pltpu.make_async_copy(
        kb, k_out.at[0, pl.ds(0, T)], sem_kv.at[0]
    ).wait()
    wait_v = lambda l: pltpu.make_async_copy(
        vb, v_out.at[0, pl.ds(0, T)], sem_kv.at[1]
    ).wait()

    if dyn:
        warmup, consume_layer, consume_lm = _stream_dyn(
            L, split, lm_t1 - lm_t0, ring,
            qkv_w, proj_w, fc_w, out_w, lm_w, wtile, sem_w,
        )
    else:
        sources = _sources(
            L, split, lm_t1 - lm_t0, qkv_w, proj_w, fc_w, out_w, lm_w
        )

        def start(i):
            if i >= len(sources):
                return
            pltpu.make_async_copy(
                sources[i], wtile.at[i % ring], sem_w.at[i % ring]
            ).start()

        def consume(i):
            start(i + ring - 1)
            pltpu.make_async_copy(
                sources[i], wtile.at[i % ring], sem_w.at[i % ring]
            ).wait()
            return wtile[i % ring]

    pltpu.make_async_copy(x_in, xbuf, sem_x).start()
    pltpu.make_async_copy(x_in, xbuf, sem_x).wait()
    if dyn:
        warmup()
    else:
        for i in range(ring - 1):
            start(i)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    m_even = (lane_ids < hd).astype(cdt)
    m_odd = (lane_ids >= hd).astype(cdt)

    if dyn:
        _lane_layers_dyn(
            cfg, T, split, rb, consume_layer, lp,
            xbuf, qb, kb, vb, acc,
            start_k, start_v, wait_k, wait_v,
            col_ids, m_even, m_odd,
        )
    else:
        si = _lane_layers(
            cfg, T, split, rb, consume, 0,
            xbuf, qb, kb, vb, acc,
            ln1_g, ln1_b, ln2_g, ln2_b, qkv_b, proj_b, fc_b, out_b,
            start_k, start_v, wait_k, wait_v,
            col_ids, m_even, m_odd,
        )

    # ---- row n_valid-1 -> ln_f -> streamed LM head ---------------------
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    hit = (rows_t == n_valid - 1).astype(jnp.float32)
    last = jnp.sum(
        xbuf[:].astype(jnp.float32) * hit, axis=0, keepdims=True
    )  # (1, D) exact: single nonzero row
    hfin = _ln_f32(last.astype(cdt), lnf_g[0], lnf_b[0]).astype(cdt)

    if lm_t0 > 0 or lm_t1 < v_pad // D:
        logits_ref[:, :] = jnp.zeros((1, v_pad), jnp.float32)
    for jt in range(lm_t0, lm_t1):
        for k in range(split):
            m = (jt - lm_t0) * split + k
            w = consume_lm(m) if dyn else consume(si)
            if not dyn:
                si += 1
            logits_ref[0, pl.ds(jt * D + k * Dc, Dc)] = _dotf(hfin, w)[0]


def prefill_fused(
    cfg: GPTConfig,
    params,
    x_emb,  # (T, D) token embeddings, positions NOT yet added
    k_cache,  # (L, S, D), aliased in -> out
    v_cache,
    n_valid,
    *,
    interpret: bool = False,
):
    """Drop-in replacement for gpt.prefill on supported shapes (the coarse
    window re-prime, the semantic prompt). Returns (logits (n_out_vocab,)
    f32, k_cache, v_cache); cache rows [0, ceil(T/256)*256) are written in
    place (further rows keep their prior content — the decode contract
    admits a row only after a decode step wrote it). `params` must carry
    "_prefill_tiles"
    (prepare_prefill_params); its lm_window decides which logit columns
    are real (outside-window logits are zero — the coarse sampler only
    reads inside, kernels/decode.decode_step_fused has the same contract).
    """
    T = x_emb.shape[0]
    L, D, S = cfg.n_layer, cfg.n_embd, cfg.block_size
    v_pad = _v_pad(cfg)
    blocks = params["blocks"]
    cdt = params["wpe"].dtype
    tiled = params.get("_prefill_tiles")
    if tiled is None:
        tiled = prepare_prefill_params(cfg, params)["_prefill_tiles"]
    span = tiled["lm_tiles"]
    lm_tiles = (span.t0, span.t1)
    split = _pick_split(D)
    T_k = min(S, -(-max(T, 1) // _RB) * _RB)
    plan = _vmem_plan(cfg, T_k, split, jnp.dtype(cdt).itemsize)
    if plan is None:
        # no VMEM plan at this dtype (e.g. f32 compute on a big shape):
        # run the XLA prefill instead of risking a Mosaic VMEM OOM
        from bark_tpu.models import gpt

        return gpt.prefill(cfg, params, x_emb, k_cache, v_cache, n_valid)

    dyn = "_lp" in params  # injected by ensure_layer_params iff dyn enabled
    x = (x_emb + params["wpe"][:T]).astype(cdt)
    if T != T_k:
        # right-pad to the row-block size only — NOT the full cache length
        # (the semantic prompt is 257 rows in a 1024 cache; computing the
        # dead tail would double the prefill FLOPs). Pad rows are causally
        # invisible to live rows; cache rows T..S-1 stay whatever they
        # were, which the decode contract already allows (a row is only
        # admitted by the mask after a decode step has written it).
        x = jnp.zeros((T_k, D), cdt).at[:T].set(x)
        T = T_k
    ring, rb, vfit = plan
    if dyn:
        ring = _dyn_ring_pre(ring, split)
    kernel = functools.partial(
        _prefill_kernel, cfg, T, v_pad, lm_tiles, split, ring, rb, dyn
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    nv = jnp.reshape(n_valid.astype(jnp.int32), (1, 1))
    if dyn:
        small = [params["_lp"]]
    else:
        small = [
            blocks["ln1_g"], blocks["ln1_b"],
            blocks["ln2_g"], blocks["ln2_b"],
            blocks["qkv_b"], blocks["proj_b"],
            blocks["fc_b"], blocks["out_b"],
        ]
    n0 = len(small) + 2 + 1 + 1 + 5  # + lnf, nv, x, tiles -> k_cache index
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        ),
        in_specs=(
            [vmem] * (len(small) + 2)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [hbm] * 6
            + [hbm, hbm]
        ),
        out_specs=(hbm, hbm, vmem),
        scratch_shapes=[
            pltpu.VMEM((T, D), cdt),  # xbuf
            pltpu.VMEM((T, D), cdt),  # q / ctx
            pltpu.VMEM((T, D), cdt),  # k / h_t
            pltpu.VMEM((T, D), cdt),  # v / x2
            pltpu.VMEM((T, D), jnp.float32),  # x1 + out acc
            pltpu.VMEM((ring, D, D // split), cdt),  # weight ring
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={n0: 0, n0 + 1: 1},
        interpret=interpret,
        compiler_params=_compiler_params(vfit),
    )(
        *small,
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        nv,
        x,
        tiled["qkv"], tiled["proj"], tiled["fc"], tiled["out"], tiled["lm"],
        k_cache, v_cache,
    )
    kc, vc, logits = outs
    return logits[0, : cfg.n_out_vocab], kc, vc


def pick_prefill_batched(cfg: GPTConfig, decode_fn, kv_quant: bool,
                         ctx_size: int, B: int):
    """Batched mirror of `pick_prefill` for the natively-batched stage
    programs: one pallas_call prefills all B lanes (lane-sequential inside
    the kernel — weights re-stream per lane, ~1/sws of the decode side's
    per-token weight traffic — writing each lane's K/V straight into the
    batched decode kernels' aliased (L, B, S, D) slabs, killing the
    vmap(gpt.prefill)->kernel hand-off the r3 batched path still paid).
    BARK_TPU_PREFILL_B=0 disables. None -> the XLA fallback."""
    import os

    if os.environ.get("BARK_TPU_PREFILL_B", "1") == "0":
        return None
    if (
        getattr(decode_fn, "is_fused", False)
        and not kv_quant
        and supports_fused_prefill(cfg, ctx_size)
        and B >= 1
    ):
        return functools.partial(
            prefill_fused_batched, cfg,
            interpret=getattr(decode_fn, "interpret", False),
        )
    return None


def _prefill_kernel_batched(
    cfg: GPTConfig,
    B: int,
    T: int,
    v_pad: int,
    lm_tiles: tuple,
    split: int,
    ring: int,
    rb: int,
    dyn: bool,
    *refs,
):
    """Batched kernel body: a lane fori_loop around the shared
    `_lane_layers` pass. Per lane: DMA its (T, D) context in, run the full
    transformer with slab DMAs targeting k_out[l, b] (a traced lane index
    — the DMA base is linear in b), then select its n_valid-1 row
    arithmetically (hit mask column) and blend its logits row into the
    (B, v_pad) output (no dynamic sublane writes). dyn=True additionally
    runs the LAYER loop as a fori_loop (_lane_layers_dyn + _stream_dyn) —
    the program shrinks ~(L*B/ B)-fold relative to the lane-loop-only
    form.

    refs: <10 ln/bias VMEM — or lp + lnf when dyn>, hit (T, B) f32 VMEM,
    x_in (B, T, D) HBM,
    qkv proj fc out lm sub-tile trees (HBM), k_hbm v_hbm (L, B, S, D)
    aliased -> k_out v_out, logits (B, v_pad) VMEM;
    scratch: xbuf qb kb vb (T, D) cdt, acc (T, D) f32,
    wtile (ring, D, D/split), sem_w (ring,), sem_x, sem_kv (2,)
    """
    it = iter(refs)
    if dyn:
        lp = next(it)
        ln1_g = ln1_b = ln2_g = ln2_b = None
        qkv_b = proj_b = fc_b = out_b = None
    else:
        ln1_g, ln1_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
        qkv_b, proj_b, fc_b, out_b = next(it), next(it), next(it), next(it)
    lnf_g, lnf_b = next(it), next(it)
    hit_ref, x_in = next(it), next(it)
    qkv_w, proj_w, fc_w, out_w, lm_w = (next(it) for _ in range(5))
    _k_in, _v_in = next(it), next(it)  # aliased to k_out/v_out below
    k_out, v_out, logits_ref = next(it), next(it), next(it)
    xbuf, qb, kb, vb, acc = (next(it) for _ in range(5))
    wtile = next(it)
    sem_w, sem_x, sem_kv = next(it), next(it), next(it)

    L, D, H = cfg.n_layer, cfg.n_embd, cfg.n_head
    hd = D // H
    Dc = D // split
    lm_t0, lm_t1 = lm_tiles
    cdt = xbuf.dtype

    if dyn:
        warmup, consume_layer, consume_lm = _stream_dyn(
            L, split, lm_t1 - lm_t0, ring,
            qkv_w, proj_w, fc_w, out_w, lm_w, wtile, sem_w,
        )
    else:
        sources = _sources(
            L, split, lm_t1 - lm_t0, qkv_w, proj_w, fc_w, out_w, lm_w
        )

        def start(i):
            if i >= len(sources):
                return
            pltpu.make_async_copy(
                sources[i], wtile.at[i % ring], sem_w.at[i % ring]
            ).start()

        def consume(i):
            start(i + ring - 1)
            pltpu.make_async_copy(
                sources[i], wtile.at[i % ring], sem_w.at[i % ring]
            ).wait()
            return wtile[i % ring]

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    m_even = (lane_ids < hd).astype(cdt)
    m_odd = (lane_ids >= hd).astype(cdt)
    lane_B = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
    row_B = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

    logits_ref[:, :] = jnp.zeros((B, v_pad), jnp.float32)

    def lane_body(b, _):
        cp = pltpu.make_async_copy(x_in.at[b], xbuf, sem_x)
        cp.start()
        cp.wait()
        if dyn:
            warmup()
        else:
            for i in range(ring - 1):
                start(i)

        start_k = lambda l: pltpu.make_async_copy(
            kb, k_out.at[l, b, pl.ds(0, T)], sem_kv.at[0]
        ).start()
        start_v = lambda l: pltpu.make_async_copy(
            vb, v_out.at[l, b, pl.ds(0, T)], sem_kv.at[1]
        ).start()
        wait_k = lambda l: pltpu.make_async_copy(
            kb, k_out.at[0, 0, pl.ds(0, T)], sem_kv.at[0]
        ).wait()
        wait_v = lambda l: pltpu.make_async_copy(
            vb, v_out.at[0, 0, pl.ds(0, T)], sem_kv.at[1]
        ).wait()

        if dyn:
            _lane_layers_dyn(
                cfg, T, split, rb, consume_layer, lp,
                xbuf, qb, kb, vb, acc,
                start_k, start_v, wait_k, wait_v,
                col_ids, m_even, m_odd,
            )
        else:
            si = _lane_layers(
                cfg, T, split, rb, consume, 0,
                xbuf, qb, kb, vb, acc,
                ln1_g, ln1_b, ln2_g, ln2_b, qkv_b, proj_b, fc_b, out_b,
                start_k, start_v, wait_k, wait_v,
                col_ids, m_even, m_odd,
            )

        # ---- this lane's n_valid-1 row via its hit-mask column ----
        hit_col = jnp.sum(
            jnp.where(lane_B == b, hit_ref[:, :], jnp.float32(0.0)),
            axis=1, keepdims=True,
        )  # (T, 1)
        last = jnp.sum(
            xbuf[:].astype(jnp.float32) * hit_col, axis=0, keepdims=True
        )  # (1, D) exact: single nonzero row
        hfin = _ln_f32(last.astype(cdt), lnf_g[0], lnf_b[0]).astype(cdt)

        for jt in range(lm_t0, lm_t1):
            for k in range(split):
                m = (jt - lm_t0) * split + k
                if dyn:
                    w = consume_lm(m)
                else:
                    w = consume(si)
                    si += 1
                cols = pl.ds(jt * D + k * Dc, Dc)
                val = _dotf(hfin, w)  # (1, Dc) f32
                logits_ref[:, cols] = jnp.where(
                    row_B == b, val, logits_ref[:, cols]
                )
        return 0

    jax.lax.fori_loop(0, B, lane_body, 0)


def prefill_fused_batched(
    cfg: GPTConfig,
    params,
    x_emb,  # (B, T, D) token embeddings, positions NOT yet added
    k_cache,  # (L, B, S, D), aliased in -> out
    v_cache,
    n_valid,  # (B,) i32 per-lane live-row counts
    *,
    interpret: bool = False,
):
    """Batched drop-in for vmap(gpt.prefill) over the flat (L, B, S, D)
    caches. Returns (logits (B, n_out_vocab) f32, k_cache, v_cache); each
    lane's cache rows [0, ceil(T/256)*256) are written in place. Per-lane
    semantics are exactly `prefill_fused`'s (pad rows causally invisible,
    rows past the padded context untouched)."""
    B, T = x_emb.shape[0], x_emb.shape[1]
    L, D, S = cfg.n_layer, cfg.n_embd, cfg.block_size
    v_pad = _v_pad(cfg)
    blocks = params["blocks"]
    cdt = params["wpe"].dtype
    tiled = params.get("_prefill_tiles")
    if tiled is None:
        tiled = prepare_prefill_params(cfg, params)["_prefill_tiles"]
    span = tiled["lm_tiles"]
    lm_tiles = (span.t0, span.t1)
    split = _pick_split(D)
    T_k = min(S, -(-max(T, 1) // _RB) * _RB)
    plan = _vmem_plan(
        cfg, T_k, split, jnp.dtype(cdt).itemsize,
        extra_bytes=T_k * B * 4 + (B - 1) * v_pad * 4,
    )
    if plan is None:
        from bark_tpu.models import gpt

        return jax.vmap(
            lambda x, k, v, n: gpt.prefill(cfg, params, x, k, v, n),
            in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
        )(x_emb, k_cache, v_cache, n_valid)

    dyn = "_lp" in params  # injected by ensure_layer_params iff dyn enabled
    x = (x_emb + params["wpe"][None, :T]).astype(cdt)
    if T != T_k:
        x = jnp.zeros((B, T_k, D), cdt).at[:, :T].set(x)
        T = T_k
    ring, rb, vfit = plan
    if dyn:
        ring = _dyn_ring_pre(ring, split)
    rows_t = jnp.arange(T, dtype=jnp.int32)[:, None]  # (T, 1)
    hit = (rows_t == (n_valid.astype(jnp.int32) - 1)[None, :]) \
        .astype(jnp.float32)  # (T, B)
    kernel = functools.partial(
        _prefill_kernel_batched, cfg, B, T, v_pad, lm_tiles, split,
        ring, rb, dyn,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    if dyn:
        small = [params["_lp"]]
    else:
        small = [
            blocks["ln1_g"], blocks["ln1_b"],
            blocks["ln2_g"], blocks["ln2_b"],
            blocks["qkv_b"], blocks["proj_b"],
            blocks["fc_b"], blocks["out_b"],
        ]
    n0 = len(small) + 2 + 1 + 1 + 5  # + lnf, hit, x, tiles -> k_cache
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((B, v_pad), jnp.float32),
        ),
        in_specs=(
            [vmem] * (len(small) + 2)
            + [vmem]  # hit mask
            + [hbm] * 6
            + [hbm, hbm]
        ),
        out_specs=(hbm, hbm, vmem),
        scratch_shapes=[
            pltpu.VMEM((T, D), cdt),  # xbuf
            pltpu.VMEM((T, D), cdt),  # q / ctx
            pltpu.VMEM((T, D), cdt),  # k / h_t
            pltpu.VMEM((T, D), cdt),  # v / x2
            pltpu.VMEM((T, D), jnp.float32),  # x1 + out acc
            pltpu.VMEM((ring, D, D // split), cdt),  # weight ring
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={n0: 0, n0 + 1: 1},
        interpret=interpret,
        compiler_params=_compiler_params(vfit),
    )(
        *small,
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        hit,
        x,
        tiled["qkv"], tiled["proj"], tiled["fc"], tiled["out"], tiled["lm"],
        k_cache, v_cache,
    )
    kc, vc, logits = outs
    return logits[:, : cfg.n_out_vocab], kc, vc
