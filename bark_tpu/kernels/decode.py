"""Fused single-token GPT decode as one Pallas TPU kernel.

Why: autoregressive decode at batch=1 is pure HBM streaming — every step must
read all layer weights + the KV cache once. The XLA op-by-op path issues
~10 kernels per layer and reaches only ~25% of HBM bandwidth on a v5e; this
kernel runs the WHOLE decode step (all layers + LM head) as a single
pallas_call that streams (D, D) weight tiles from HBM into VMEM through a
multi-slot ring, so weight DMA runs back-to-back at full bandwidth while the
MXU/VPU chew earlier tiles.

Design (one kernel invocation per token):
- weights live in HBM (`pltpu.ANY`); a (ring, D, D) VMEM scratch cycles
  tiles through a flat schedule — per layer qkv (3 tiles), proj (1), fc (4),
  out (4), then the streamed LM-head tiles — with up to ring-1 tile DMAs in
  flight at once (DMA issue latency, not bandwidth, is the binding
  constraint at these tile sizes; a 2-slot ping-pong leaves the copy engine
  idle between issues).
- the KV cache stays in HBM, aliased input->output; each layer's (S, D) slab
  is DMA'd into a kv_slots-deep VMEM ring for attention (prefetched up to
  kv_slots layers ahead). The fresh K/V row is NOT patched into the slab:
  attention is computed against the stale slab plus a rank-1 correction
  (below), and the row write-backs for all layers are batched into two
  strided (L, 8, D) DMAs at the end of the kernel — the cache is never
  rewritten wholesale, and only 2 row DMAs are issued per step instead of 2L.
- attention avoids per-head matmul shapes and minor-dim reshapes with a
  constant head-segment matrix, and keeps ALL (S, D)-sized work on the MXU:
  scores(S,H) = K(S,D) @ (q*seg)(D,H); the fresh row's score is patched in
  the (S,H) domain, softmax is computed explicitly, and the fresh row's V
  contribution is added post-softmax as a rank-1 term — no (S, D)
  element-wise selects/products ever run on the VPU.
- numerics mirror models/gpt.py (f32 layernorm/softmax/logits, tanh GELU,
  params-dtype residual stream), so the kernel is a drop-in replacement for
  gpt.decode_step (same tokens at temp=0; float-tolerance elsewhere).

Replaces the reference's per-token ggml graph execution
(/root/reference/bark.cpp:1586-1643) — there a graph is rebuilt and
dispatched per token with host round-trips; here the whole step is one fused
device program living inside the stage's lax.scan/while_loop.

Mosaic constraints that shaped this kernel: no dynamic sublane indexing
(layers unrolled in Python), DMA row slices must be 8-row aligned (the
aligned-window row write-back), minor-dim insertion is 32-bit only (the
q transpose runs in f32), VMEM ~16 MB (ring/kv depth chosen to fit).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bark_tpu.models.gpt import EPS_NORM, GPTConfig

# VMEM budget for picking the tile-ring and KV-slab depth (the chip has
# ~16 MB; leave headroom for Mosaic's own temporaries)
_VMEM_BUDGET = 14 * 2**20


def supports_fused_decode(cfg: GPTConfig) -> bool:
    """Shapes the kernel handles: lane-aligned model dim, 8-aligned cache."""
    return (
        cfg.n_embd % 128 == 0
        and cfg.block_size % 8 == 0
        and cfg.n_embd % cfg.n_head == 0
    )


def _ln_f32(x, g, b):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + EPS_NORM)
    return y * g.astype(jnp.float32) + b.astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pick_depths(cfg: GPTConfig, quant: bool, has_min: bool, itemsize: int):
    """(ring, kv_slots) fitting the VMEM budget; prefer a deeper tile ring
    (DMA issue latency is the constraint), then earlier KV prefetch."""
    D, S, L = cfg.n_embd, cfg.block_size, cfg.n_layer
    tile = D * D * (1 if quant else itemsize)
    if quant:
        tile += (D // 32) * D * 4 * (2 if has_min else 1)
    kv = 2 * S * D * itemsize  # K + V slab per slot
    fixed = (
        2 * L * 8 * D * itemsize  # krows/vrows
        + L * (3 + 1 + 4 + 1 + 4) * D * 4  # biases/ln as f32 upper bound
        + 16 * D * 4  # x / hfin / small temporaries
        + (-(-cfg.n_out_vocab // D)) * D * 4  # logits row
    )
    for ring, kv_slots in ((4, 2), (4, 1), (3, 1), (2, 1)):
        if fixed + ring * tile + kv_slots * kv <= _VMEM_BUDGET:
            return ring, kv_slots
    return 2, 1


def _decode_kernel(
    cfg: GPTConfig,
    v_pad: int,
    quant: bool,  # weights are (int8 values, f32 block scales[, mins])
    has_min: bool,
    lm_tiles: tuple,  # (first, last+1) LM-head tile range to stream
    ring: int,  # weight-tile ring depth (ring-1 DMAs in flight)
    kv_slots: int,  # KV slab ring depth (layers prefetched ahead)
    *refs,
):
    """Kernel body; refs layout (built by decode_step_fused):

      np_ref (1,1) i32 SMEM, x (1,D) VMEM,
      ln1_g ln1_b ln2_g ln2_b qkv_b proj_b fc_b out_b lnf_g lnf_b  (VMEM),
      dense:  qkv_w proj_w fc_w out_w lm_t                         (HBM),
      quant:  qkv_q proj_q fc_q out_q lm_q  qkv_s proj_s fc_s out_s lm_s
              [qkv_m proj_m fc_m out_m lm_m]                       (HBM),
      k_hbm v_hbm (HBM, aliased to outputs),
      -> outputs logits (VMEM), k_out v_out (aliased),
      scratch: wtile (ring,D,D) [stile [mtile]] kbuf vbuf (kv_slots,S,D)
               krows vrows (L,8,D)  sem_w (ring,) [sem_s [sem_m]]
               sem_kv (kv_slots,2) sem_row (2,)
    """
    it = iter(refs)
    np_ref, x_ref = next(it), next(it)
    ln1_g, ln1_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
    qkv_b, proj_b, fc_b, out_b = next(it), next(it), next(it), next(it)
    lnf_g, lnf_b = next(it), next(it)
    qkv_w, proj_w, fc_w, out_w, lm_t = (next(it) for _ in range(5))
    if quant:
        qkv_s, proj_s, fc_s, out_s, lm_s = (next(it) for _ in range(5))
        if has_min:
            qkv_m, proj_m, fc_m, out_m, lm_m = (next(it) for _ in range(5))
    k_hbm, v_hbm = next(it), next(it)
    logits_ref, k_out, v_out = next(it), next(it), next(it)
    wtile = next(it)
    if quant:
        stile = next(it)
        mtile = next(it) if has_min else None
    kbuf, vbuf, krows, vrows = next(it), next(it), next(it), next(it)
    sem_w = next(it)
    if quant:
        sem_s = next(it)
        sem_m = next(it) if has_min else None
    sem_kv, sem_row = next(it), next(it)

    L, D, S, H = cfg.n_layer, cfg.n_embd, cfg.block_size, cfg.n_head
    hd = D // H
    Bs = D // 32  # scale rows per (D, D) tile
    nt_qkv, nt_fc, nt_out = 3, 4, 4
    lm_t0, lm_t1 = lm_tiles
    n_past = np_ref[0, 0]
    cdt = x_ref.dtype  # compute/params dtype (bf16 or f32)

    # ---- flat weight-tile schedule: 12 tiles per layer, then the LM tiles.
    # Each entry is (value source, scale source, min source); every source
    # is a CONTIGUOUS (D, D) / (Bs, D) HBM block (the caller pre-tiles the
    # column-split weights — a column slice of a row-major (D, 3D) array
    # would DMA in 2*D-byte strided chunks and throttle far below HBM
    # bandwidth).
    s_refs = (qkv_s, proj_s, fc_s, out_s) if quant else None
    m_refs = (qkv_m, proj_m, fc_m, out_m) if quant and has_min else None

    def _sel(refs4, l, t):
        # qkv (L,3,D,D) / fc (L,4,D,D) pre-tiled; proj (L,D,D);
        # out (L,4D,D) row-sliced (already contiguous). Scale trees mirror
        # the value trees with Bs-row tiles.
        if refs4 is None:
            return None
        if t < nt_qkv:
            return refs4[0].at[l, t]
        if t == nt_qkv:
            return refs4[1].at[l]
        if t < nt_qkv + 1 + nt_fc:
            j = t - nt_qkv - 1
            return refs4[2].at[l, j]
        j = t - nt_qkv - 1 - nt_fc
        if refs4 is s_refs or refs4 is m_refs:
            return refs4[3].at[l, pl.ds(j * Bs, Bs), :]
        return refs4[3].at[l, pl.ds(j * D, D), :]

    w_refs = (qkv_w, proj_w, fc_w, out_w)
    sources = []
    for l in range(L):
        for t in range(12):
            sources.append((
                _sel(w_refs, l, t),
                _sel(s_refs, l, t),
                _sel(m_refs, l, t),
            ))
    for i in range(lm_t1 - lm_t0):
        # lm_t is pre-tiled (n_used_tiles, D, D), already sliced to the
        # streamed window
        sources.append((
            lm_t.at[i],
            lm_s.at[i] if quant else None,
            lm_m.at[i] if quant and has_min else None,
        ))

    def start(i: int):
        if i >= len(sources):
            return
        w, s, m = sources[i]
        slot = i % ring
        pltpu.make_async_copy(w, wtile.at[slot], sem_w.at[slot]).start()
        if quant:
            pltpu.make_async_copy(s, stile.at[slot], sem_s.at[slot]).start()
            if has_min:
                pltpu.make_async_copy(
                    m, mtile.at[slot], sem_m.at[slot]
                ).start()

    def consume(i: int):
        """Start tile i+ring-1, wait tile i, return its dequantized value."""
        start(i + ring - 1)
        slot = i % ring
        pltpu.make_async_copy(
            sources[i][0], wtile.at[slot], sem_w.at[slot]
        ).wait()
        if not quant:
            return wtile[slot]
        pltpu.make_async_copy(
            sources[i][1], stile.at[slot], sem_s.at[slot]
        ).wait()
        sc = jnp.broadcast_to(
            stile[slot][:, None, :], (Bs, 32, D)
        ).reshape(D, D)
        w = wtile[slot].astype(jnp.float32) * sc
        if has_min:
            pltpu.make_async_copy(
                sources[i][2], mtile.at[slot], sem_m.at[slot]
            ).wait()
            w = w + jnp.broadcast_to(
                mtile[slot][:, None, :], (Bs, 32, D)
            ).reshape(D, D)
        return w.astype(cdt)

    def start_kv(l: int):
        if l >= L:
            return
        slot = l % kv_slots
        pltpu.make_async_copy(
            k_hbm.at[l], kbuf.at[slot], sem_kv.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[l], vbuf.at[slot], sem_kv.at[slot, 1]
        ).start()

    def wait_kv(l: int):
        slot = l % kv_slots
        pltpu.make_async_copy(
            k_hbm.at[0], kbuf.at[slot], sem_kv.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[0], vbuf.at[slot], sem_kv.at[slot, 1]
        ).wait()

    # head-segment constants: seg[d, h] = (d // hd == h)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    seg = (d_ids == h_ids).astype(cdt)  # (D, H)
    seg_t = seg.T  # (H, D)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
    live = slot_ids <= n_past  # this token occupies slot n_past
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    row8_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    # the fresh K/V row is written back through an 8-row aligned window
    # (DMA row slices must be 8-row aligned); neighbor rows are rewritten
    # with the bytes just fetched into the VMEM slab (identical values)
    base8 = pl.multiple_of((n_past // 8) * 8, 8)
    in_win = row8_ids == (n_past - base8)  # (8, 1)

    # warm-up: fill the tile ring and the KV slab ring
    for i in range(ring - 1):
        start(i)
    for l in range(kv_slots):
        start_kv(l)

    def layer_body(l, x):
        ti = l * 12  # this layer's first tile index
        # ---- attention: ln1 -> qkv -> cache row stage -> softmax(QK)V -> proj
        x1 = _ln_f32(x, ln1_g[l], ln1_b[l]).astype(cdt)
        qkv_parts = []
        for t in range(nt_qkv):
            w = consume(ti + t)
            qkv_parts.append(
                _dot(x1, w) + qkv_b[l, pl.ds(t * D, D)].astype(jnp.float32)
            )
        q = (qkv_parts[0] * (1.0 / np.sqrt(hd))).astype(cdt)  # (1, D)
        k_new = qkv_parts[1].astype(cdt)
        v_new = qkv_parts[2].astype(cdt)

        wait_kv(l)
        kb, vb = kbuf.at[l % kv_slots], vbuf.at[l % kv_slots]
        # stage the fresh row (plus refetched neighbors) for the batched
        # end-of-kernel write-back
        krows[l] = jnp.where(in_win, k_new, kb[pl.ds(base8, 8), :])
        vrows[l] = jnp.where(in_win, v_new, vb[pl.ds(base8, 8), :])

        # attention over the stale VMEM slab + a rank-1 fresh-token term.
        # The fresh K/V row is NOT folded into the (S, D) slabs (that would
        # cost element-wise (S, D) VPU selects); its score is patched in the
        # (S, H) domain and its V contribution added post-softmax. Rows
        # beyond n_past get exactly-zero attention (exp underflow after the
        # -1e9 mask), so stale slab bytes never leak into the context.
        # The lane->sublane transpose of q runs in f32 (Mosaic: minor-dim
        # insertion is 32-bit only).
        q_col = q.astype(jnp.float32)[0][:, None]  # (D, 1)
        qseg = (q_col * seg.astype(jnp.float32)).astype(cdt)  # (D, H)
        scores = _dot(kb[...].astype(cdt), qseg)  # (S, H) f32 via MXU
        s_new = _dot(k_new, qseg)  # (1, H) fresh row's score
        is_new = row_ids == n_past  # (S, 1)
        scores = jnp.where(is_new, s_new, scores)
        scores = jnp.where(live, scores, jnp.float32(-1e9))
        m = jnp.max(scores, axis=0, keepdims=True)  # (1, H)
        e = jnp.exp(scores - m)  # (S, H)
        denom = jnp.sum(e, axis=0, keepdims=True)  # (1, H)
        att_stale = jnp.where(is_new, 0.0, e / denom)  # (S, H)
        att_new = jnp.exp(s_new - m) / denom  # (1, H) == att[n_past]
        # ctx_h[h, d] = sum_s att[s, h] * V[s, d]; the head-diagonal is then
        # collapsed with the seg mask (H*D element-wise, trivial)
        ctx_h = jax.lax.dot_general(
            att_stale.astype(cdt), vb[...],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, D)
        ctxv = jnp.sum(
            ctx_h * seg_t.astype(jnp.float32), axis=0, keepdims=True
        )  # (1, D)
        att_new_e = _dot(att_new.astype(cdt), seg_t)  # (1, D) f32
        ctxv = ctxv + att_new_e * v_new.astype(jnp.float32)

        # prefetch the next free KV slot's layer while the MLP streams
        start_kv(l + kv_slots)

        proj = _dot(ctxv.astype(cdt), consume(ti + 3)) + proj_b[l].astype(
            jnp.float32
        )
        x = (x.astype(jnp.float32) + proj).astype(cdt)

        # ---- MLP: ln2 -> fc (gelu) -> out
        x2 = _ln_f32(x, ln2_g[l], ln2_b[l]).astype(cdt)
        h_parts = []
        for t in range(nt_fc):
            w = consume(ti + 4 + t)
            h_parts.append(
                _dot(x2, w) + fc_b[l, pl.ds(t * D, D)].astype(jnp.float32)
            )
        h = [jax.nn.gelu(p, approximate=True).astype(cdt) for p in h_parts]

        acc = out_b[l].astype(jnp.float32)
        for t in range(nt_out):
            acc = acc + _dot(h[t], consume(ti + 8 + t))
        x = (x.astype(jnp.float32) + acc).astype(cdt)
        return x

    # layers unrolled in Python: VMEM loads with a traced layer index would
    # need dynamic-sublane-alignment proofs Mosaic can't make
    x = x_ref[:]
    for l in range(L):
        x = layer_body(l, x)

    # batched KV row write-back: two strided (L, 8, D) DMAs instead of 2L
    # little ones (DMA issue cost dominates at this size)
    pltpu.make_async_copy(
        krows, k_out.at[:, pl.ds(base8, 8), :], sem_row.at[0]
    ).start()
    pltpu.make_async_copy(
        vrows, v_out.at[:, pl.ds(base8, 8), :], sem_row.at[1]
    ).start()

    # ---- final LN + LM head, streaming only tiles [lm_t0, lm_t1): a stage
    # whose sampler reads a logits sub-range (the coarse codebook windows)
    # skips the rest of the head entirely; untouched logits stay zero
    if lm_t0 > 0 or lm_t1 < v_pad // D:
        logits_ref[:] = jnp.zeros((1, v_pad), jnp.float32)
    hfin = _ln_f32(x, lnf_g[0], lnf_b[0]).astype(cdt)
    for i, j in enumerate(range(lm_t0, lm_t1)):
        w = consume(L * 12 + i)
        logits_ref[0, pl.ds(j * D, D)] = _dot(hfin, w)[0]

    # drain the KV row write-back before the kernel retires
    pltpu.make_async_copy(
        krows, k_out.at[:, pl.ds(base8, 8), :], sem_row.at[0]
    ).wait()
    pltpu.make_async_copy(
        vrows, v_out.at[:, pl.ds(base8, 8), :], sem_row.at[1]
    ).wait()


def _v_pad(cfg: GPTConfig) -> int:
    return -(-cfg.n_out_vocab // cfg.n_embd) * cfg.n_embd


def _build_decode_tiles(cfg: GPTConfig, params, quant, has_min, lm_tiles):
    """Contiguous (.., D, D) tile copies of the column-split weights (and
    their quant scales/mins), plus the transposed LM head restricted to the
    streamed tile window."""
    L, D = cfg.n_layer, cfg.n_embd
    v_pad = _v_pad(cfg)
    nt = v_pad // D
    lm_t0, lm_t1 = lm_tiles
    blocks = params["blocks"]

    def col_tiles(w, n):  # (L, Din, n*Dout) -> (L, n, Din, Dout)
        return w.reshape(L, w.shape[1], n, w.shape[2] // n).swapaxes(1, 2)

    def head_tiles(h):  # (Din, v_pad) -> (used tiles, Din, D)
        return h.reshape(h.shape[0], nt, D).swapaxes(0, 1)[lm_t0:lm_t1]

    if quant:
        tiled = {
            "qkv": col_tiles(blocks["qkv_q"], 3),
            "fc": col_tiles(blocks["fc_q"], 4),
            "lm": head_tiles(params["lm_q"]),
            "qkv_s": col_tiles(blocks["qkv_s"], 3),
            "fc_s": col_tiles(blocks["fc_s"], 4),
            "lm_s": head_tiles(params["lm_s"]),
        }
        if has_min:
            tiled.update(
                qkv_m=col_tiles(blocks["qkv_m"], 3),
                fc_m=col_tiles(blocks["fc_m"], 4),
                lm_m=head_tiles(params["lm_m"]),
            )
        return tiled

    lm = params["lm_head"][0]  # (V, D)
    lm_pad = jnp.zeros((v_pad, D), lm.dtype).at[: cfg.n_out_vocab].set(lm)
    return {
        "qkv": col_tiles(blocks["qkv_w"], 3),
        "fc": col_tiles(blocks["fc_w"], 4),
        "lm": lm_pad.reshape(nt, D, D).swapaxes(1, 2)[lm_t0:lm_t1],
    }


def prepare_decode_params(cfg: GPTConfig, params, *, quant=False,
                          lm_window=None):
    """Return `params` extended with the contiguous decode tiles.

    MUST be called OUTSIDE the stage's decode scan/while_loop (stage
    programs do this once per invocation right after densify) — XLA does
    not hoist the tiling transposes out of a loop, and recomputing them per
    token costs more than the whole decode step.
    """
    if "_decode_tiles" in params:
        return params
    v_pad = _v_pad(cfg)
    D = cfg.n_embd
    if lm_window is None:
        lm_tiles = (0, v_pad // D)
    else:
        lo, hi = lm_window
        lm_tiles = (lo // D, -(-min(hi, v_pad) // D))
    has_min = quant and "wte_m" in params
    out = dict(params)
    out["_decode_tiles"] = _build_decode_tiles(
        cfg, params, quant, has_min, lm_tiles
    )
    return out


def _embed_token(cfg: GPTConfig, params, token, n_past, quant: bool):
    """wte row + wpe row -> (1, D) in the compute dtype."""
    wpe_row = jax.lax.dynamic_slice_in_dim(params["wpe"], n_past, 1, axis=0)
    if not quant:
        return jnp.take(params["wte"][0], token[None], axis=0) + wpe_row
    row_q = jnp.take(params["wte_q"][0], token[None], axis=0)  # (1, D) i8
    row_s = jnp.repeat(
        jnp.take(params["wte_s"][0], token[None], axis=0), 32, axis=1
    )
    row = row_q.astype(jnp.float32) * row_s
    if "wte_m" in params:
        row = row + jnp.repeat(
            jnp.take(params["wte_m"][0], token[None], axis=0), 32, axis=1
        )
    return row.astype(wpe_row.dtype) + wpe_row


def decode_step_fused(
    cfg: GPTConfig,
    params,
    token,  # scalar i32
    k_cache,  # (L, S, H, hd)
    v_cache,
    n_past,  # scalar i32
    *,
    quant: bool = False,  # params is a qpack (io.loader.gpt_qparams_*)
    lm_window=None,  # (col_start, col_end): only these logits are needed
    interpret: bool = False,
):
    """Drop-in replacement for gpt.decode_step using the fused kernel.

    Returns (logits (n_out_vocab,) f32, k_cache, v_cache); caches are
    updated in place (aliased buffers) at row n_past. With quant=True the
    projection weights stream from HBM as int8 + f32 block scales[, mins]
    and are dequantized tile-by-tile in VMEM. With lm_window=(lo, hi) only
    the LM-head tiles covering columns [lo, hi) are streamed; logits outside
    the covered tiles are zero (the coarse stage samples a 2-codebook
    window, ~16% of its head — bark.cpp:1829-1838).
    """
    L, D, S = cfg.n_layer, cfg.n_embd, cfg.block_size
    v_pad = _v_pad(cfg)
    blocks = params["blocks"]
    has_min = quant and "wte_m" in params
    cdt = params["wpe"].dtype

    x = _embed_token(cfg, params, token, n_past, quant)

    if lm_window is None:
        lm_tiles = (0, v_pad // D)
    else:
        lo, hi = lm_window
        lm_tiles = (lo // D, -(-min(hi, v_pad) // D))

    # Contiguous tile views of the column-split weights (strided column
    # slices throttle the DMA engine to ~1.5 KB chunks). These MUST be
    # computed outside the decode loop — XLA does not hoist the transposes
    # out of a scan/while_loop — so stage programs call
    # `prepare_decode_params` once per invocation; the inline fallback here
    # only serves direct single-step calls (tests).
    tiled = params.get("_decode_tiles")
    if tiled is None:
        tiled = _build_decode_tiles(cfg, params, quant, has_min, lm_tiles)
    if quant:
        big_inputs = [
            tiled["qkv"], blocks["proj_q"], tiled["fc"], blocks["out_q"],
            tiled["lm"],
            tiled["qkv_s"], blocks["proj_s"], tiled["fc_s"], blocks["out_s"],
            tiled["lm_s"],
        ]
        if has_min:
            big_inputs += [
                tiled["qkv_m"], blocks["proj_m"], tiled["fc_m"],
                blocks["out_m"], tiled["lm_m"],
            ]
    else:
        big_inputs = [
            tiled["qkv"], blocks["proj_w"], tiled["fc"], blocks["out_w"],
            tiled["lm"],
        ]

    kc = k_cache.reshape(L, S, D)
    vc = v_cache.reshape(L, S, D)
    np_arr = jnp.reshape(n_past.astype(jnp.int32), (1, 1))
    ring, kv_slots = _pick_depths(cfg, quant, has_min, kc.dtype.itemsize)
    kernel = functools.partial(
        _decode_kernel, cfg, v_pad, quant, has_min, lm_tiles, ring, kv_slots
    )
    out_shape = (
        jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        jax.ShapeDtypeStruct(kc.shape, kc.dtype),
        jax.ShapeDtypeStruct(vc.shape, vc.dtype),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    n_big = len(big_inputs)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]  # n_past
        + [vmem] * 11  # x, ln/biases, ln_f
        + [hbm] * n_big
        + [hbm, hbm]  # caches
    )
    cache_in_idx = 1 + 11 + n_big
    scratch = [pltpu.VMEM((ring, D, D), jnp.int8 if quant else cdt)]
    if quant:
        scratch.append(pltpu.VMEM((ring, D // 32, D), jnp.float32))
        if has_min:
            scratch.append(pltpu.VMEM((ring, D // 32, D), jnp.float32))
    scratch += [
        pltpu.VMEM((kv_slots, S, D), kc.dtype),
        pltpu.VMEM((kv_slots, S, D), vc.dtype),
        pltpu.VMEM((L, 8, D), kc.dtype),
        pltpu.VMEM((L, 8, D), vc.dtype),
        pltpu.SemaphoreType.DMA((ring,)),
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((ring,)))
        if has_min:
            scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    scratch += [
        pltpu.SemaphoreType.DMA((kv_slots, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    logits, kc, vc = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=(vmem, hbm, hbm),
        scratch_shapes=scratch,
        input_output_aliases={cache_in_idx: 1, cache_in_idx + 1: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        np_arr,
        x.astype(cdt),
        blocks["ln1_g"], blocks["ln1_b"], blocks["ln2_g"], blocks["ln2_b"],
        blocks["qkv_b"], blocks["proj_b"], blocks["fc_b"], blocks["out_b"],
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        *big_inputs,
        kc, vc,
    )
    logits = logits[0, : cfg.n_out_vocab]
    hd = D // cfg.n_head
    return (
        logits,
        kc.reshape(L, S, cfg.n_head, hd),
        vc.reshape(L, S, cfg.n_head, hd),
    )


def select_decode_fn(
    cfg: GPTConfig,
    use_pallas: Optional[bool] = None,
    quant: bool = False,
    lm_window=None,
):
    """Pick the decode implementation for a stage program.

    None (auto): the fused kernel on TPU when shapes allow, else the XLA
    op-by-op path (models/gpt.py). True forces the kernel (interpret mode
    off-TPU — slow, for tests). False forces XLA. quant=True means the
    stage's params pytree is a qpack (requires the kernel).
    """
    from bark_tpu.models import gpt

    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu and supports_fused_decode(cfg)
    if not use_pallas:
        if quant:
            raise ValueError(
                "packed-quantized serving requires the Pallas decode kernel"
            )
        fn = functools.partial(gpt.decode_step, cfg)
        fn.prepare = lambda p: p
        return fn
    fn = functools.partial(
        decode_step_fused, cfg, quant=quant, lm_window=lm_window,
        interpret=not on_tpu,
    )
    # stage programs call this once per invocation, outside the decode loop
    fn.prepare = functools.partial(
        prepare_decode_params, cfg, quant=quant, lm_window=lm_window
    )
    return fn
