"""Whole-window coarse decode as ONE Pallas TPU kernel: 60 decode steps,
token sampling included.

Why: chaining 60 single-step kernel calls (kernels/decode.py) through a
`lax.scan` leaves an inter-call gap per token — XLA sampling glue, carry
shuffling, and a weight-DMA pipeline that drains and refills at every call
boundary. The gap measured ~0.1 ms/token on bark-large (stage 1.1 ms/token
vs 0.84 raw-chain, r3 probes), i.e. ~12% of dense serving. This kernel
runs the whole sliding window (the reference evaluates it graph-per-token,
/root/reference/bark.cpp:1808-1848) inside one `pallas_call`: a
`fori_loop` whose body is the full unrolled-L decode step PLUS the coarse
sampler, so the tile ring only drains once per window, not once per token.

Exact-token contract with the scan path (tested bit-equal in interpret):
- sampling: `jax.random.categorical(k, rel/temp)` IS
  `argmax(rel/temp + gumbel(k, (cbs,)))`; the caller precomputes the
  gumbel rows from the SAME pre-split step keys the scan path uses and the
  kernel does the argmax — identical floats, identical first-max
  tie-break (min-index-of-max), identical tokens.
- no dynamic lane slicing: the 2-codebook logit window lives in a COMPACT
  (1, nw) buffer covering the streamed LM tiles [lm_t0, lm_t1); the
  sampler masks lanes outside [base, base+cbs) to -inf instead of slicing
  (base alternates by step parity, a scalar the mask absorbs).
- no dynamic DMA for the embedding: sampled tokens always land in
  [svs, svs+2*cbs), so those wte rows are pre-tiled and streamed with the
  weight schedule; x = onehot(tok) @ wte_win on the MXU selects the row
  exactly (one nonzero product per column). wpe uses the same 8-row
  aligned window + mask-select as the cache write-back.
- per-step cache rows write back through the aligned-8 (L, 8, D) batched
  DMA and are drained before the next step's slab stream starts (the
  slabs are read from the SAME aliased HBM buffers).

Packed-quantized weights (r4): the layer/LM tiles ride the SAME unified
quant tile stream the single-step kernel uses (int8 values + packed
scale[,min] blocks, in-VMEM dequant); only the wte token-window rows are
block-quantized along D (the embedding's OUTPUT dim), which that stream's
row-block dequant cannot express — they stream DENSE (dequantized once at
prepare, bit-identical to dequantize-at-load) through a small side ring
(decode._wte_side_stream). 2*cbs rows ≈ 3-4 MB/step of dense side traffic
vs the ~300 MB/step of packed layer weights it unlocks.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bark_tpu.models.gpt import GPTConfig
from bark_tpu.kernels.decode import (
    _dense_layer_refs,
    _gate_for,
    _group_dots,
    _attend_lane_scr,
    _compiler_params,
    _dense_layer_stack,
    _dense_layer_stack_dyn,
    _dyn_kv_slots,
    _dyn_kv_slots_batched,
    _dyn_ring,
    _head_seg,
    _ln_f32,
    _MULTISTEP_STACK_MARGIN,
    _pick_depths,
    _pick_depths_batched,
    _pick_kv_chunks,
    _quant_row,
    _tile_stream,
    _tile_stream_dyn,
    _v_pad,
    _weight_sources,
    _wte_side_stream,
    ensure_layer_params,
)

# side-ring depth for the quant path's dense wte row-tile stream: 3 DMAs
# in flight (r4 lesson: a 2-deep ring of small side tiles serialized on
# DMA issue latency — ~42 tiles/step at RW=256 cost ~0.17 ms/step on the
# semantic stage)
_WRING = 4


def supports_window_kernel(
    cfg: GPTConfig, decode_fn, *,
    top_k: int = 0, top_p: float = 0.0, kv_quant: bool = False,
) -> bool:
    """Fused decode (dense or packed-quantized), default sampler (no
    top-k/top-p — the in-kernel sampler is plain gumbel-argmax), an
    lm_window on the decode side (the compact logit buffer covers
    exactly its tiles). The 2-codebook parity flip is hardwired, matching
    the window program's own `sidx % 2`. int8-KV is served like the
    batched flavor (per-row scales ride as VMEM state, fresh rows
    quantize in-kernel) — before r5 the single-lane kv8 coarse stage fell
    back to scan-of-decode-kernel and paid ~0.2 ms/token of per-step
    dispatch+sampling glue at bark-large (perf/r5/seq16.log: coarse 1.05
    e2e vs 0.85-0.89 step rate). BARK_TPU_WINDOW_KERNEL=0 disables."""
    if os.environ.get("BARK_TPU_WINDOW_KERNEL", "1") == "0":
        return False
    return (
        getattr(decode_fn, "is_fused", False)
        and getattr(decode_fn, "lm_window", None) is not None
        and top_k == 0
        and not top_p
        and cfg.n_embd % 128 == 0
        and cfg.block_size % 8 == 0
        and cfg.n_embd % cfg.n_head == 0
    )


def _row_tiles(wte, start, n_rows, D, quant):
    """The kernel's wte token-window tile stack: (nt, D, D) riding the
    unified stream (dense path) or (nt, RW, D) for the quant path's side
    ring. RW matches the unified stream's D-row tiles (few large DMAs —
    r4 measured many small side tiles serializing on issue latency) but
    caps at the window size for tiny test shapes."""
    win = jax.lax.dynamic_slice_in_dim(wte, start, n_rows, axis=0)
    RW = min(D, -(-n_rows // 8) * 8) if quant else D
    np_rows = -(-n_rows // RW) * RW
    win = jnp.zeros((np_rows, D), wte.dtype).at[:n_rows].set(win)
    return win.reshape(np_rows // RW, RW, D)


def prepare_window_params(cfg: GPTConfig, params, *, svs: int, cbs: int,
                          dense_wte=None):
    """Extend decode-prepared `params` with the row-tiled copy of wte rows
    [svs, svs+2*cbs) (zero-padded to a tile multiple) the kernel streams
    for its one-hot embedding lookup. Packed-quantized callers pass the
    densified wte via `dense_wte` (dense_from_qpack — bit-identical to the
    stepped path's dequantize-at-embed)."""
    params = ensure_layer_params(cfg, params)  # no-op unless dyn layers
    if "_wte_win" in params:
        return params
    quant = "qkv_q" in params["blocks"]
    wte = params["wte"][0] if "wte" in params else dense_wte
    assert wte is not None, "packed params need dense_wte"
    out = dict(params)
    out["_wte_win"] = _row_tiles(wte, svs, 2 * cbs, cfg.n_embd, quant)
    return out


def _window_kernel(
    cfg: GPTConfig,
    sws: int,
    temp: float,
    svs: int,
    cbs: int,
    lm_tiles: tuple,
    nt_wte: int,
    ring: int,
    kv_slots: int,
    quant: bool,
    has_min: bool,
    kv_quant: bool,
    dyn: bool,
    grouped: bool,
    *refs,
):
    """refs: ctx_len step0 (SMEM (1,1) i32),
    ln1_g ln1_b ln2_g ln2_b qkv_b proj_b fc_b out_b — or, when dyn, the
    single packed lp (L, 16, D) f32 — then lnf_g lnf_b (VMEM),
    logits0 (1, nw) f32, gumbel (sws, nw) f32 (VMEM),
    qkv_w proj_w fc_w out_w lm_t [qkv_s proj_s fc_s out_s lm_s]
    wte_win wpe (HBM),
    k_hbm v_hbm (HBM, aliased) -> toks (1, TP) i32 VMEM, k_out v_out,
    scratch: rel (1, nw) f32, wtile (ring, D, D) [stile], kbuf vbuf
    (kv_slots, S, D), krows vrows (L, 8, D), wpe8 (8, D),
    [wbuf (wring, RW, D)],
    sem_w (ring,) [sem_s], sem_kv (kv_slots, 2), sem_row (2,), sem_wpe
    [sem_e (wring,)]

    dyn=True (decode.dyn_layers_enabled): the layer loop is a lax.fori_loop
    over blocks of kv_slots layers (decode._dense_layer_stack_dyn /
    _tile_stream_dyn) — bit-identical tokens, ~L-fold smaller Mosaic
    program (the compile-time / cold-start lever)."""
    it = iter(refs)
    cl_ref, s0_ref = next(it), next(it)
    if dyn:
        lp = next(it)
        ln1_g = ln1_b = ln2_g = ln2_b = None
        qkv_b = proj_b = fc_b = out_b = None
    else:
        ln1_g, ln1_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
        qkv_b, proj_b, fc_b, out_b = next(it), next(it), next(it), next(it)
    lnf_g, lnf_b = next(it), next(it)
    logits0, gum = next(it), next(it)
    qkv_w, proj_w, fc_w, out_w, lm_t = (next(it) for _ in range(5))
    if quant:
        qkv_s, proj_s, fc_s, out_s, lm_s = (next(it) for _ in range(5))
    wte_win, wpe = next(it), next(it)
    _k_in, _v_in = next(it), next(it)  # aliased to k_out/v_out
    ks_in = vs_in = ks_out = vs_out = None
    if kv_quant:
        ks_in, vs_in = next(it), next(it)  # (L, 1, S) f32 row scales
    toks_ref, k_out, v_out = next(it), next(it), next(it)
    if kv_quant:
        ks_out, vs_out = next(it), next(it)
    rel_ref = next(it)
    wtile = next(it)
    stile = next(it) if quant else None
    kbuf, vbuf, krows, vrows, wpe8 = (next(it) for _ in range(5))
    wbuf = next(it) if quant else None
    sem_w = next(it)
    sem_s = next(it) if quant else None
    sem_kv, sem_row, sem_wpe = next(it), next(it), next(it)
    sem_e = next(it) if quant else None

    L, D, S, H = cfg.n_layer, cfg.n_embd, cfg.block_size, cfg.n_head
    hd = D // H
    lm_t0, lm_t1 = lm_tiles
    nw = (lm_t1 - lm_t0) * D
    cdt = wpe8.dtype
    ctx_len = cl_ref[0, 0]
    step0 = s0_ref[0, 0]
    n_tiles_layer = 12

    if quant:
        # packed layer/LM tiles ride the unified quant stream; the dense
        # wte token-window rows go through the side ring (module docstring)
        start_w, embed_w = _wte_side_stream(wte_win, wbuf, sem_e, _WRING)
        n_wlane = nt_wte * wbuf.shape[1]
        embed_srcs = []
        ti0 = 0
    else:
        embed_srcs = [wte_win.at[t] for t in range(nt_wte)]
        n_wlane = nt_wte * D
        ti0 = nt_wte
    if dyn:
        warmup, qdot_embed, qdot_layer, qdot_lm = _tile_stream_dyn(
            (qkv_w, proj_w, fc_w, out_w),
            (qkv_s, proj_s, fc_s, out_s) if quant else None,
            (lm_t, lm_s if quant else None), embed_srcs,
            L, lm_t1 - lm_t0, ring, quant, has_min,
            wtile, stile, sem_w, sem_s, D, cdt,
        )
    else:
        sources = (
            [(s, None) for s in embed_srcs]
            + _weight_sources(
                L, D, lm_t1 - lm_t0,
                (qkv_w, proj_w, fc_w, out_w),
                (qkv_s, proj_s, fc_s, out_s) if quant else None,
                (lm_t, lm_s if quant else None), 1,
            )
        )
        start, qdot = _tile_stream(
            sources, ring, quant, has_min, wtile, stile, sem_w, sem_s,
            D, D // 32, cdt, 1,
        )

    def _start_kv_slot(l, slot):
        # slabs are read from the OUTPUT refs: on hardware they alias the
        # inputs (same HBM), and in interpret mode the outputs start as a
        # copy of the aliased inputs — either way a later step's slab read
        # sees every earlier step's row write-back
        pltpu.make_async_copy(
            k_out.at[l], kbuf.at[slot], sem_kv.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            v_out.at[l], vbuf.at[slot], sem_kv.at[slot, 1]
        ).start()

    def start_kv(l):
        # static layer index (warm-up / unrolled stack)
        if isinstance(l, int):
            if l >= L:
                return
            _start_kv_slot(l, l % kv_slots)
        else:
            raise AssertionError("traced l must go through start_kv_dyn")

    def start_kv_dyn(l, slot):
        # traced layer index, static slab slot (dyn stack prefetch)
        @pl.when(l < L)
        def _():
            _start_kv_slot(l, slot)

    def wait_kv(l, slot=None):
        slot = (l % kv_slots) if slot is None else slot
        pltpu.make_async_copy(
            k_out.at[0], kbuf.at[slot], sem_kv.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            v_out.at[0], vbuf.at[slot], sem_kv.at[slot, 1]
        ).wait()

    seg, seg_t = _head_seg(D, H, hd, cdt)
    row8_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    lane_nw = jax.lax.broadcasted_iota(jnp.int32, (1, nw), 1) + lm_t0 * D
    lane_wte = jax.lax.broadcasted_iota(jnp.int32, (1, n_wlane), 1)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (sws, 1), 0)
    lane_tp = jax.lax.broadcasted_iota(
        jnp.int32, toks_ref.shape, len(toks_ref.shape) - 1
    )

    rel_ref[:, :] = logits0[:, :]
    toks_ref[:, :] = jnp.zeros(toks_ref.shape, jnp.int32)
    col_ids = None
    if kv_quant:
        # scale state lives in the VMEM outputs for the whole window:
        # seed from the inputs once, then every step reads/updates ks_out
        # in place (the int8 slabs round-trip HBM per layer; the tiny
        # (L, 1, S) f32 scales never need to)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        ks_out[...] = ks_in[...]
        vs_out[...] = vs_in[...]

    def step_body(j, _):
        n_past = ctx_len + j

        # ---- sample tok from the previous logits (or the prefill's) ----
        is_major = ((step0 + j) % 2) == 0
        base = jnp.int32(svs) + jnp.where(is_major, 0, cbs)
        in_win = (lane_nw >= base) & (lane_nw < base + cbs)
        g_row = jnp.sum(
            jnp.where(row_g == j, gum[:, :], jnp.float32(0.0)),
            axis=0, keepdims=True,
        )  # (1, nw)
        vals = rel_ref[:, :]
        if temp != 0.0:
            vals = vals / jnp.float32(temp) + g_row
        cand = jnp.where(in_win, vals, jnp.float32(-jnp.inf))
        m = jnp.max(cand)
        tok = jnp.min(jnp.where(cand == m, lane_nw, jnp.int32(2**30)))
        toks_ref[:, :] = jnp.where(
            lane_tp == j, tok, toks_ref[:, :]
        )

        # ---- warm-up: tile ring + KV slabs + wpe row window ----
        base8 = pl.multiple_of((n_past // 8) * 8, 8)
        in_row8 = row8_ids == (n_past - base8)
        pltpu.make_async_copy(
            wpe.at[pl.ds(base8, 8)], wpe8, sem_wpe
        ).start()
        if dyn:
            warmup()
        else:
            for i in range(ring - 1):
                start(i)
        if quant:
            for t in range(min(_WRING, nt_wte)):
                start_w(t)
        for l in range(kv_slots):
            start_kv(l)

        # ---- embedding: onehot(tok) @ wte_win tiles (exact row select)
        onehot = (lane_wte == (tok - svs)).astype(cdt)
        if quant:
            x_emb = embed_w(onehot)
        else:
            x_emb = None
            for t in range(nt_wte):
                oh_t = onehot[:, t * D : (t + 1) * D]
                part = qdot_embed(oh_t, t) if dyn else qdot(oh_t, t)
                x_emb = part if x_emb is None else x_emb + part
        pltpu.make_async_copy(
            wpe.at[pl.ds(base8, 8)], wpe8, sem_wpe
        ).wait()
        wpe_row = jnp.sum(
            jnp.where(in_row8, wpe8[:, :].astype(jnp.float32), 0.0),
            axis=0, keepdims=True,
        )
        x = (x_emb + wpe_row).astype(cdt)

        # ---- layers (shared stack, decode._dense_layer_stack[_dyn]; the
        # qdot carries the packed dequant when quant) ----
        kvq = dict(kv_quant=kv_quant, ks=ks_out, vs=vs_out, col_ids=col_ids)
        if dyn:
            x = _dense_layer_stack_dyn(
                cfg, cdt, qdot_layer, lp,
                wait_kv, start_kv_dyn, kbuf, vbuf, krows, vrows, kv_slots,
                in_row8, base8, n_past, seg, seg_t, slot_ids, row_ids, x,
                gate_chunks=_gate_for(S, _pick_kv_chunks(S), cfg.n_embd),
                grouped=grouped, **kvq,
            )
        else:
            x = _dense_layer_stack(
                cfg, cdt, qdot, ti0,
                ln1_g, ln1_b, ln2_g, ln2_b, qkv_b, proj_b, fc_b, out_b,
                wait_kv, start_kv, kbuf, vbuf, krows, vrows, kv_slots,
                in_row8, base8, n_past, seg, seg_t, slot_ids, row_ids, x,
                gate_chunks=_gate_for(S, _pick_kv_chunks(S), cfg.n_embd),
                grouped=grouped, **kvq,
            )

        # ---- cache row write-back (this step's rows) ----
        pltpu.make_async_copy(
            krows, k_out.at[:, pl.ds(base8, 8), :], sem_row.at[0]
        ).start()
        pltpu.make_async_copy(
            vrows, v_out.at[:, pl.ds(base8, 8), :], sem_row.at[1]
        ).start()

        # ---- LM head into the compact window buffer ----
        hfin = _ln_f32(x, lnf_g[0], lnf_b[0]).astype(cdt)
        for i in range(lm_t1 - lm_t0):
            rel_ref[0, pl.ds(i * D, D)] = (
                qdot_lm(hfin, i) if dyn
                else qdot(hfin, ti0 + L * n_tiles_layer + i)
            )[0]

        # drain BEFORE the next step's slab stream reads these rows
        pltpu.make_async_copy(
            krows, k_out.at[:, pl.ds(base8, 8), :], sem_row.at[0]
        ).wait()
        pltpu.make_async_copy(
            vrows, v_out.at[:, pl.ds(base8, 8), :], sem_row.at[1]
        ).wait()
        return 0

    jax.lax.fori_loop(0, sws, step_body, 0)


def coarse_window_fused(
    cfg: GPTConfig,
    params,  # decode-prepared AND window-prepared (prepare_window_params)
    logits0,  # (n_out_vocab,) f32 from the window's prefill
    k_cache,  # (L, S, D), aliased in -> out
    v_cache,
    ctx_len,  # i32 scalar
    step_idx0,  # i32 scalar
    subs,  # (sws, 2) pre-split step keys (the scan path's subs)
    *,
    sws: int,
    temp: float,
    semantic_vocab_size: int,
    codebook_size: int,
    lm_window: tuple,
    quant: bool = False,
    interpret: bool = False,
):
    """Run one whole coarse sliding window. Returns (toks (sws,) i32
    offset-carrying, k_cache, v_cache) — token-identical to the
    scan-of-decode_step_fused path under the same `subs` (the gumbel
    noise is drawn here from those keys exactly as
    `jax.random.categorical` would). quant=True: `params` is a
    decode-prepared qpack (+ the dense wte window tiles from
    prepare_window_params). int8-KV: pass the caches as {"q": (L, S, D)
    int8, "s": (L, S) f32} dicts (gpt.init_kv_cache(quant=True)) — the
    kernel streams int8 slabs (half the per-step HBM traffic that
    dominates at bark-large) and keeps the scale rows resident in VMEM
    across the window, quantizing fresh rows exactly like
    decode._decode_kernel / gpt.quantize_kv_rows."""
    L, D, S = cfg.n_layer, cfg.n_embd, cfg.block_size
    svs, cbs = semantic_vocab_size, codebook_size
    v_pad = _v_pad(cfg)
    lo, hi = lm_window
    lm_tiles = (lo // D, -(-min(hi, v_pad) // D))
    lm_t0, lm_t1 = lm_tiles
    nw = (lm_t1 - lm_t0) * D
    blocks = params["blocks"]
    tiled = params["_decode_tiles"]
    wte_win = params["_wte_win"]
    nt_wte = wte_win.shape[0]
    cdt = params["wpe"].dtype
    has_min = quant and "wte_m" in params
    sdt = jnp.dtype(blocks["proj_s"].dtype) if quant else jnp.dtype("float32")
    RW = wte_win.shape[1]
    kv_quant = isinstance(k_cache, dict)
    if kv_quant:
        kc, vc = k_cache["q"], v_cache["q"]
        ks = k_cache["s"].reshape(L, 1, S)
        vs = v_cache["s"].reshape(L, 1, S)
    else:
        kc, vc = k_cache, v_cache
        ks = vs = None
    # extra VMEM beyond the single-step model: the whole (sws, nw) gumbel
    # buffer + logits0_c + rel live in VMEM, plus the multi-step loop's
    # Mosaic stack (see decode._MULTISTEP_STACK_MARGIN); quant adds the
    # dense wte side ring
    dyn = "_lp" in params  # injected by ensure_layer_params iff dyn enabled
    extra = (sws + 2) * nw * 4 + 8 * D * cdt.itemsize \
        + _MULTISTEP_STACK_MARGIN
    if quant:
        extra += _WRING * RW * D * cdt.itemsize
    if dyn:
        extra += L * 16 * D * 4  # the packed lp ref
    ring, kv_slots, vfit = _pick_depths(
        cfg, quant, has_min, kc.dtype.itemsize, kv_quant=kv_quant,
        s_itemsize=sdt.itemsize, extra_bytes=extra,
        w_itemsize=cdt.itemsize,
    )
    if dyn:
        ring = _dyn_ring(ring)
        kv_slots = _dyn_kv_slots(kv_slots, L)

    # gumbel rows placed at each step's parity window, 0 elsewhere (the
    # kernel masks non-window lanes to -inf before the argmax)
    if temp != 0.0:
        g_rel = jax.vmap(
            lambda k: jax.random.gumbel(k, (cbs,), jnp.float32)
        )(subs)  # (sws, cbs)
        j_ids = jnp.arange(sws, dtype=jnp.int32)[:, None]
        base = svs + jnp.where((step_idx0 + j_ids) % 2 == 0, 0, cbs)
        lane = jnp.arange(nw, dtype=jnp.int32)[None, :] + lm_t0 * D
        off = lane - base  # (sws, nw)
        gum = jnp.where(
            (off >= 0) & (off < cbs),
            jnp.take_along_axis(g_rel, jnp.clip(off, 0, cbs - 1), axis=1),
            0.0,
        )
    else:
        gum = jnp.zeros((sws, nw), jnp.float32)

    logits0_c = jax.lax.dynamic_slice_in_dim(
        jnp.pad(logits0, (0, v_pad - logits0.shape[0])),
        lm_t0 * D, nw,
    )[None, :].astype(jnp.float32)

    TP = max(128, -(-sws // 128) * 128)
    grouped = False
    if quant:
        big = [
            tiled["qkv"], blocks["proj_q"], tiled["fc"], blocks["out_q"],
            tiled["lm"],
            tiled["qkv_s"], tiled["proj_s"], tiled["fc_s"], tiled["out_s"],
            tiled["lm_s"],
        ]
    else:
        (qkv_r, proj_r, fc_r, out_r), grouped = _dense_layer_refs(
            tiled, blocks
        )
        # group consume holds up to 4 un-dotted tiles in distinct ring
        # slots (see decode.decode_step_fused); the ref orientation must
        # match `grouped`
        grouped = grouped and ring >= 4
        if not grouped:
            qkv_r, proj_r, fc_r, out_r = (
                tiled["qkv"], blocks["proj_w"], tiled["fc"],
                blocks["out_w"],
            )
        big = [qkv_r, proj_r, fc_r, out_r, tiled["lm"]]
    kernel = functools.partial(
        _window_kernel, cfg, sws, temp, svs, cbs, lm_tiles, nt_wte,
        ring, kv_slots, quant, has_min, kv_quant, dyn, grouped,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [
        pltpu.VMEM((1, nw), jnp.float32),  # rel
        pltpu.VMEM((ring, D, D), jnp.int8 if quant else cdt),  # weight ring
    ]
    if quant:
        scratch.append(pltpu.VMEM(
            (ring, (2 if has_min else 1) * (D // 32), D), sdt
        ))
    scratch += [
        pltpu.VMEM((kv_slots, S, D), kc.dtype),
        pltpu.VMEM((kv_slots, S, D), vc.dtype),
        pltpu.VMEM((L, 8, D), kc.dtype),
        pltpu.VMEM((L, 8, D), vc.dtype),
        pltpu.VMEM((8, D), cdt),  # wpe window
    ]
    if quant:
        scratch.append(pltpu.VMEM((_WRING, RW, D), cdt))  # wte side ring
    scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    scratch += [
        pltpu.SemaphoreType.DMA((kv_slots, 2)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((_WRING,)))
    if dyn:
        small = [params["_lp"]]
    else:
        small = [
            blocks["ln1_g"], blocks["ln1_b"],
            blocks["ln2_g"], blocks["ln2_b"],
            blocks["qkv_b"], blocks["proj_b"],
            blocks["fc_b"], blocks["out_b"],
        ]
    n_vm = len(small) + 4  # + lnf_g lnf_b logits0 gum
    n_in = 2 + n_vm + len(big) + 2 + 2  # smem, vmem, big, wte/wpe, caches
    out_shape = [
        jax.ShapeDtypeStruct((1, TP), jnp.int32),
        jax.ShapeDtypeStruct(kc.shape, kc.dtype),
        jax.ShapeDtypeStruct(vc.shape, vc.dtype),
    ]
    out_specs = [vmem, hbm, hbm]
    in_specs = (
        [smem, smem] + [vmem] * n_vm + [hbm] * (len(big) + 2)
        + [hbm, hbm]
    )
    cache_inputs = [kc, vc]
    if kv_quant:
        in_specs += [vmem, vmem]  # (L, 1, S) f32 row scales
        out_shape += [
            jax.ShapeDtypeStruct(ks.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs.shape, jnp.float32),
        ]
        out_specs += [vmem, vmem]
        cache_inputs += [ks, vs]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        input_output_aliases={n_in - 2: 1, n_in - 1: 2},
        interpret=interpret,
        compiler_params=_compiler_params(vfit),
    )(
        jnp.reshape(ctx_len.astype(jnp.int32), (1, 1)),
        jnp.reshape(step_idx0.astype(jnp.int32), (1, 1)),
        *small,
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        logits0_c, gum,
        *big, wte_win, params["wpe"],
        *cache_inputs,
    )
    if kv_quant:
        toks, kco, vco, kso, vso = outs
        return (
            toks[0, :sws],
            {"q": kco, "s": kso.reshape(L, S)},
            {"q": vco, "s": vso.reshape(L, S)},
        )
    toks, kco, vco = outs
    return toks[0, :sws], kco, vco


def supports_window_kernel_batched(
    cfg: GPTConfig, decode_fn, *,
    top_k: int = 0, top_p: float = 0.0, kv_quant: bool = False,
) -> bool:
    """Batched mirror of `supports_window_kernel` — additionally serves
    the int8 KV cache (per-row scales ride as VMEM state, fresh rows
    quantize in-kernel): int8-KV pays exactly at B>=8 where the per-lane
    slab stream dominates step traffic (+13.8% measured r2), so the
    batched kernels keep it in-envelope while the single-lane ones skip
    it (measured ~8% SLOWER at B=1). BARK_TPU_WINDOW_KERNEL_B=0 disables
    (BARK_TPU_WINDOW_KERNEL=0 disables both flavors)."""
    if os.environ.get("BARK_TPU_WINDOW_KERNEL_B", "1") == "0":
        return False
    return supports_window_kernel(
        cfg, decode_fn, top_k=top_k, top_p=top_p, kv_quant=False
    )


def _window_kernel_batched(
    cfg: GPTConfig,
    B: int,
    sws: int,
    temp: float,
    svs: int,
    cbs: int,
    lm_tiles: tuple,
    nt_wte: int,
    ring: int,
    kv_slots: int,
    kv_chunks: int,
    quant: bool,
    has_min: bool,
    kv_quant: bool,
    dyn: bool,
    *refs,
):
    """refs: ctx (B, 1) i32 SMEM, s0 (1, 1) i32 SMEM,
    ln1_g ln1_b ln2_g ln2_b qkv_b proj_b fc_b out_b — or, when dyn, the
    single packed lp (L, 16, D) f32 (the layer loop is then a
    lax.fori_loop; kv_slots | B keeps the slab slots static) — then
    lnf_g lnf_b (VMEM), logits0 (B, nw) f32 (VMEM),
    qkv_w proj_w fc_w out_w lm_t [qkv_s proj_s fc_s out_s lm_s]
    wte_win wpe gum(sws8, B, nw) (HBM),
    k_hbm v_hbm (L, B, S, D) (HBM, aliased)
    [ks_in vs_in (L*B, S) f32 — (L, B, S) when dyn — VMEM when kv_quant]
    -> toks (B, TP) i32 VMEM, k_out v_out [, ks_out vs_out],
    scratch: rel (B, nw) f32, gbuf (8, B, nw) f32, wtile (ring, D, D)
    [stile], kbuf vbuf (kv_slots, S, D), krows vrows (B, 8, D),
    wpe8 (B, 8, D), [wbuf (wring, RW, D)],
    att_scr (S, H) f32, mask_scr new_scr (S, B) f32,
    sem_w (ring,) [sem_s], sem_kv (kv_slots, 2, kv_chunks), sem_row (B, 2),
    sem_wpe (B,), sem_g [sem_e (wring,)]
    """
    it = iter(refs)
    ctx_ref, s0_ref = next(it), next(it)
    if dyn:
        lp = next(it)
        ln1_g = ln1_b = ln2_g = ln2_b = None
        qkv_b = proj_b = fc_b = out_b = None
    else:
        ln1_g, ln1_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
        qkv_b, proj_b, fc_b, out_b = next(it), next(it), next(it), next(it)
    lnf_g, lnf_b = next(it), next(it)
    logits0 = next(it)
    qkv_w, proj_w, fc_w, out_w, lm_t = (next(it) for _ in range(5))
    if quant:
        qkv_s, proj_s, fc_s, out_s, lm_s = (next(it) for _ in range(5))
    wte_win, wpe, gum = next(it), next(it), next(it)
    _k_in, _v_in = next(it), next(it)  # aliased to k_out/v_out
    ks_in = vs_in = ks_out = vs_out = None
    if kv_quant:
        ks_in, vs_in = next(it), next(it)
    toks_ref, k_out, v_out = next(it), next(it), next(it)
    if kv_quant:
        ks_out, vs_out = next(it), next(it)
    rel_ref, gbuf = next(it), next(it)
    wtile = next(it)
    stile = next(it) if quant else None
    kbuf, vbuf, krows, vrows, wpe8 = (next(it) for _ in range(5))
    wbuf = next(it) if quant else None
    att_scr, mask_scr, new_scr = next(it), next(it), next(it)
    sem_w = next(it)
    sem_s = next(it) if quant else None
    sem_kv, sem_row, sem_wpe, sem_g = (next(it) for _ in range(4))
    sem_e = next(it) if quant else None

    L, D, S, H = cfg.n_layer, cfg.n_embd, cfg.block_size, cfg.n_head
    hd = D // H
    lm_t0, lm_t1 = lm_tiles
    nw = (lm_t1 - lm_t0) * D
    cdt = wpe8.dtype
    step0 = s0_ref[0, 0]
    ctx = [ctx_ref[b, 0] for b in range(B)]
    KC = S // kv_chunks

    if quant:
        ti0 = 0
        embed_srcs = []
        start_w, embed_w = _wte_side_stream(wte_win, wbuf, sem_e, _WRING)
        n_wlane = nt_wte * wbuf.shape[1]
    else:
        embed_srcs = [wte_win.at[t] for t in range(nt_wte)]
        ti0 = nt_wte
        n_wlane = nt_wte * D
    if dyn:
        warmup, qdot_embed, qdot_layer, qdot_lm = _tile_stream_dyn(
            (qkv_w, proj_w, fc_w, out_w),
            (qkv_s, proj_s, fc_s, out_s) if quant else None,
            (lm_t, lm_s if quant else None), embed_srcs,
            L, lm_t1 - lm_t0, ring, quant, has_min,
            wtile, stile, sem_w, sem_s, D, cdt,
        )
    else:
        sources = (
            [(s, None) for s in embed_srcs]
            + _weight_sources(
                L, D, lm_t1 - lm_t0,
                (qkv_w, proj_w, fc_w, out_w),
                (qkv_s, proj_s, fc_s, out_s) if quant else None,
                (lm_t, lm_s if quant else None), 1,
            )
        )
        start, qdot = _tile_stream(
            sources, ring, quant, has_min, wtile, stile, sem_w, sem_s,
            D, D // 32, cdt, 1,
        )

    seg, seg_t = _head_seg(D, H, hd, cdt)
    row8_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    lane_nw = jax.lax.broadcasted_iota(jnp.int32, (1, nw), 1) + lm_t0 * D
    lane_wte = jax.lax.broadcasted_iota(jnp.int32, (1, n_wlane), 1)
    lane_tp = jax.lax.broadcasted_iota(
        jnp.int32, toks_ref.shape, len(toks_ref.shape) - 1
    )

    if kv_quant:
        # per-row scale state lives in the OUTPUT refs across the
        # in-kernel steps (step j+1's attention needs step j's fresh-row
        # scales); seeded once from the inputs
        ks_out[:, :] = ks_in[:, :]
        vs_out[:, :] = vs_in[:, :]

    # zero-fill chunks past EVERY lane's first-step bound once (liveness
    # per lane is monotone in j; a chunk turning live is DMA'd from then
    # on). BOTH slabs zero: the batched attention's row mask is ADDITIVE
    # (-1e9 into the scores) so K junk must not out-score it, and 0-weight
    # * junk V could be 0 * NaN (decode.py `_decode_kernel_batched`).
    if kv_chunks > 1:
        np_min = ctx[0]
        for b in range(1, B):
            np_min = jnp.minimum(np_min, ctx[b])
        for slot in range(kv_slots):
            for c in range(1, kv_chunks):
                def _zfill(slot=slot, c=c):
                    kbuf[slot, pl.ds(c * KC, KC), :] = jnp.zeros(
                        (KC, D), kbuf.dtype
                    )
                    vbuf[slot, pl.ds(c * KC, KC), :] = jnp.zeros(
                        (KC, D), vbuf.dtype
                    )
                pl.when(c * KC > np_min)(_zfill)

    rel_ref[:, :] = logits0[:, :]
    toks_ref[:, :] = jnp.zeros(toks_ref.shape, jnp.int32)

    def step_body(j, _):
        n_past = [ctx[b] + j for b in range(B)]
        base8 = [pl.multiple_of((n_past[b] // 8) * 8, 8) for b in range(B)]
        in_win8 = [row8_ids == (n_past[b] - base8[b]) for b in range(B)]

        # slabs read from the OUTPUT refs (aliased): later steps see every
        # earlier step's row write-back; gated per lane to ITS n_past
        def start_kv(idx):
            if idx >= L * B:
                return
            l, b = idx // B, idx % B
            slot = idx % kv_slots
            for c in range(kv_chunks):
                def _start(c=c):
                    rows = pl.ds(c * KC, KC)
                    pltpu.make_async_copy(
                        k_out.at[l, b, rows], kbuf.at[slot, rows],
                        sem_kv.at[slot, 0, c],
                    ).start()
                    pltpu.make_async_copy(
                        v_out.at[l, b, rows], vbuf.at[slot, rows],
                        sem_kv.at[slot, 1, c],
                    ).start()
                if c == 0:
                    _start()
                else:
                    pl.when(c * KC <= n_past[b])(_start)

        def wait_kv(idx):
            b = idx % B
            slot = idx % kv_slots
            for c in range(kv_chunks):
                def _wait(c=c):
                    rows = pl.ds(c * KC, KC)
                    pltpu.make_async_copy(
                        k_out.at[0, 0, rows], kbuf.at[slot, rows],
                        sem_kv.at[slot, 0, c],
                    ).wait()
                    pltpu.make_async_copy(
                        v_out.at[0, 0, rows], vbuf.at[slot, rows],
                        sem_kv.at[slot, 1, c],
                    ).wait()
                if c == 0:
                    _wait()
                else:
                    pl.when(c * KC <= n_past[b])(_wait)

        def start_kv_dyn(l, b, guard):
            # traced layer index, STATIC lane -> static slot (kv_slots | B)
            slot = b % kv_slots
            for c in range(kv_chunks):
                def _start(c=c):
                    rows = pl.ds(c * KC, KC)
                    pltpu.make_async_copy(
                        k_out.at[l, b, rows], kbuf.at[slot, rows],
                        sem_kv.at[slot, 0, c],
                    ).start()
                    pltpu.make_async_copy(
                        v_out.at[l, b, rows], vbuf.at[slot, rows],
                        sem_kv.at[slot, 1, c],
                    ).start()
                cond = (c * KC <= n_past[b]) if c > 0 else None
                if guard:
                    cond = (l < L) if cond is None else ((l < L) & cond)
                if cond is None:
                    _start()
                else:
                    pl.when(cond)(_start)

        # ---- this step's gumbel rows + per-lane wpe rows ----
        gbase = pl.multiple_of((j // 8) * 8, 8)
        cp_g = pltpu.make_async_copy(gum.at[pl.ds(gbase, 8)], gbuf, sem_g)
        cp_g.start()
        for b in range(B):
            pltpu.make_async_copy(
                wpe.at[pl.ds(base8[b], 8)], wpe8.at[b], sem_wpe.at[b]
            ).start()

        # ---- warm-up: weight-tile ring + first KV slabs ----
        if dyn:
            warmup()
        else:
            for i in range(ring - 1):
                start(i)
        if quant:
            for t in range(min(_WRING, nt_wte)):
                start_w(t)
        for idx in range(kv_slots):
            start_kv(idx)

        # per-lane additive row masks for this step's n_past
        for b in range(B):
            mask_scr[:, b : b + 1] = jnp.where(
                row_ids <= n_past[b], 0.0, jnp.float32(-1e9)
            )
            new_scr[:, b : b + 1] = (
                row_ids == n_past[b]
            ).astype(jnp.float32)

        # ---- sample every lane from the previous logits ----
        is_major = ((step0 + j) % 2) == 0
        base = jnp.int32(svs) + jnp.where(is_major, 0, cbs)
        in_win = (lane_nw >= base) & (lane_nw < base + cbs)  # (1, nw)
        cp_g.wait()
        g_row = None
        for r in range(8):
            part = jnp.where(
                jnp.int32(r) == (j - gbase), gbuf[r], jnp.float32(0.0)
            )  # (B, nw)
            g_row = part if g_row is None else g_row + part
        vals = rel_ref[:, :]
        if temp != 0.0:
            vals = vals / jnp.float32(temp) + g_row
        cand = jnp.where(in_win, vals, jnp.float32(-jnp.inf))
        m = jnp.max(cand, axis=1, keepdims=True)  # (B, 1)
        tok = jnp.min(
            jnp.where(cand == m, lane_nw, jnp.int32(2**30)),
            axis=1, keepdims=True,
        )  # (B, 1)
        toks_ref[:, :] = jnp.where(lane_tp == j, tok, toks_ref[:, :])

        # ---- embedding: per-lane onehot @ wte_win tiles ----
        onehot = (lane_wte == (tok - svs)).astype(cdt)  # (B, n_wlane)
        if quant:
            x_emb = embed_w(onehot)
        else:
            x_emb = None
            for t in range(nt_wte):
                oh_t = onehot[:, t * D : (t + 1) * D]
                part = qdot_embed(oh_t, t) if dyn else qdot(oh_t, t)
                x_emb = part if x_emb is None else x_emb + part
        wpe_rows = []
        for b in range(B):
            pltpu.make_async_copy(
                wpe.at[pl.ds(base8[b], 8)], wpe8.at[b], sem_wpe.at[b]
            ).wait()
            wpe_rows.append(jnp.sum(
                jnp.where(
                    in_win8[b], wpe8[b].astype(jnp.float32), 0.0
                ),
                axis=0, keepdims=True,
            ))
        x = (x_emb + jnp.concatenate(wpe_rows, axis=0)).astype(cdt)

        # ---- layers (mirror of _decode_kernel_batched's lane loop; dyn
        # runs it as a fori_loop with a traced layer index) ----
        def layer_pass(l, x, dyn_l):
            if dyn_l:
                ln1 = (lp[l, 0], lp[l, 1])
                ln2 = (lp[l, 2], lp[l, 3])
                b_qkv = [lp[l, 6 + t] for t in range(3)]
                b_proj, b_out = lp[l, 4], lp[l, 5]
                b_fc = [lp[l, 9 + t] for t in range(4)]
                qd = lambda v, c: qdot_layer(v, l, c)
            else:
                ti = ti0 + l * 12
                ln1 = (ln1_g[l], ln1_b[l])
                ln2 = (ln2_g[l], ln2_b[l])
                b_qkv = [qkv_b[l, pl.ds(t * D, D)] for t in range(3)]
                b_proj, b_out = proj_b[l], out_b[l]
                b_fc = [fc_b[l, pl.ds(t * D, D)] for t in range(4)]
                qd = lambda v, c: qdot(v, ti + c)

            x1 = _ln_f32(x, *ln1).astype(cdt)  # (B, D)
            qkv_parts = []
            for t in range(3):
                qkv_parts.append(
                    qd(x1, t) + b_qkv[t].astype(jnp.float32)
                )
            q = (qkv_parts[0] * (1.0 / (hd ** 0.5))).astype(cdt)
            if kv_quant:
                # fresh rows quantize exactly like gpt.quantize_kv_rows;
                # K stays int8 (it feeds the int8 MXU score dot)
                k_new_q, ks_new = _quant_row(qkv_parts[1])
                v_new_q, vs_new = _quant_row(qkv_parts[2])
                k_new = k_new_q
                v_new = v_new_q.astype(cdt)
            else:
                k_new = qkv_parts[1].astype(cdt)
                v_new = qkv_parts[2].astype(cdt)

            ctx_rows = []
            for b in range(B):
                slot = b % kv_slots if dyn_l else (l * B + b) % kv_slots
                if dyn_l:
                    wait_kv(b)  # slot/chunk conds are lane-determined
                else:
                    wait_kv(l * B + b)
                kb, vb = kbuf.at[slot], vbuf.at[slot]

                # the staging buffer is reused next layer, guarded by the
                # lane's row semaphores (layer 0's wait is the
                # end-of-step drain below)
                def _wait_rows(b=b):
                    pltpu.make_async_copy(
                        krows.at[b], k_out.at[0, 0, pl.ds(0, 8), :],
                        sem_row.at[b, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        vrows.at[b], v_out.at[0, 0, pl.ds(0, 8), :],
                        sem_row.at[b, 1],
                    ).wait()
                if dyn_l:
                    pl.when(l > 0)(_wait_rows)
                elif l > 0:
                    _wait_rows()
                staged_k = k_new_q if kv_quant else k_new
                staged_v = v_new_q if kv_quant else v_new
                krows[b] = jnp.where(
                    in_win8[b], staged_k[b : b + 1],
                    kb[pl.ds(base8[b], 8), :],
                )
                vrows[b] = jnp.where(
                    in_win8[b], staged_v[b : b + 1],
                    vb[pl.ds(base8[b], 8), :],
                )
                pltpu.make_async_copy(
                    krows.at[b], k_out.at[l, b, pl.ds(base8[b], 8), :],
                    sem_row.at[b, 0],
                ).start()
                pltpu.make_async_copy(
                    vrows.at[b], v_out.at[l, b, pl.ds(base8[b], 8), :],
                    sem_row.at[b, 1],
                ).start()
                ks_col = vs_col = ksn = vsn = None
                if kv_quant:
                    ksn = ks_new[b : b + 1]  # (1, 1)
                    vsn = vs_new[b : b + 1]
                    if dyn_l:
                        # (L, B, S) state, traced leading index
                        ks_out[l, b] = jnp.where(
                            col_ids == n_past[b], ksn,
                            ks_out[l, b][None, :],
                        )[0]
                        vs_out[l, b] = jnp.where(
                            col_ids == n_past[b], vsn,
                            vs_out[l, b][None, :],
                        )[0]
                        # post-update reads are exact: the fresh row's
                        # stale term is zeroed in the blend
                        ks_col = ks_out[l, b][:, None]  # (S, 1)
                        vs_col = vs_out[l, b][:, None]
                    else:
                        r = l * B + b  # row of the (L*B, S) scale state
                        ks_out[pl.ds(r, 1), :] = jnp.where(
                            col_ids == n_past[b], ksn,
                            ks_out[pl.ds(r, 1), :],
                        )
                        vs_out[pl.ds(r, 1), :] = jnp.where(
                            col_ids == n_past[b], vsn,
                            vs_out[pl.ds(r, 1), :],
                        )
                        ks_col = ks_out[pl.ds(r, 1), :][0][:, None]
                        vs_col = vs_out[pl.ds(r, 1), :][0][:, None]
                ctx_rows.append(_attend_lane_scr(
                    kb, vb, q[b : b + 1], k_new[b : b + 1],
                    v_new[b : b + 1], seg, seg_t, cdt, att_scr,
                    mask_scr[:, b : b + 1], new_scr[:, b : b + 1],
                    ks_col, vs_col, ksn, vsn,
                ))
                if dyn_l:
                    # next slab in (layer, lane)-major order
                    b2 = (b + kv_slots) % B
                    dl = (b + kv_slots) // B
                    start_kv_dyn(l + dl, b2, guard=dl > 0)
                else:
                    start_kv(l * B + b + kv_slots)
            ctxv = jnp.concatenate(ctx_rows, axis=0)  # (B, D) f32

            proj = qd(ctxv.astype(cdt), 3) + b_proj.astype(jnp.float32)
            x = (x.astype(jnp.float32) + proj).astype(cdt)

            x2 = _ln_f32(x, *ln2).astype(cdt)
            h_parts = []
            for t in range(4):
                h_parts.append(
                    qd(x2, 4 + t) + b_fc[t].astype(jnp.float32)
                )
            h = [
                jax.nn.gelu(p, approximate=True).astype(cdt)
                for p in h_parts
            ]
            acc = b_out.astype(jnp.float32)
            for t in range(4):
                acc = acc + qd(h[t], 8 + t)
            return (x.astype(jnp.float32) + acc).astype(cdt)

        if dyn:
            x = jax.lax.fori_loop(
                0, L, lambda l, x: layer_pass(l, x, True), x
            )
        else:
            for l in range(L):
                x = layer_pass(l, x, False)

        # ---- LM head into the compact window buffer ----
        hfin = _ln_f32(x, lnf_g[0], lnf_b[0]).astype(cdt)
        for i in range(lm_t1 - lm_t0):
            rel_ref[:, pl.ds(i * D, D)] = (
                qdot_lm(hfin, i) if dyn
                else qdot(hfin, ti0 + L * 12 + i)
            )

        # drain every lane's last-layer write-back BEFORE the next step's
        # slab stream reads those rows
        for b in range(B):
            pltpu.make_async_copy(
                krows.at[b], k_out.at[0, 0, pl.ds(0, 8), :],
                sem_row.at[b, 0],
            ).wait()
            pltpu.make_async_copy(
                vrows.at[b], v_out.at[0, 0, pl.ds(0, 8), :],
                sem_row.at[b, 1],
            ).wait()
        return 0

    jax.lax.fori_loop(0, sws, step_body, 0)


def coarse_window_fused_batched(
    cfg: GPTConfig,
    params,  # decode-prepared AND window-prepared (prepare_window_params)
    logits0,  # (B, n_out_vocab) f32 from the window's batched prefill
    k_cache,  # (L, B, S, D), aliased in -> out
    v_cache,
    ctx_len,  # (B,) i32 — per-lane context length (voice histories differ)
    step_idx0,  # i32 scalar: lanes share the window schedule
    subs_w,  # (sws, B, 2) pre-split per-lane step keys (the scan path's)
    *,
    sws: int,
    temp: float,
    semantic_vocab_size: int,
    codebook_size: int,
    lm_window: tuple,
    quant: bool = False,
    interpret: bool = False,
):
    """Run one whole coarse sliding window for all B lanes. Returns
    (toks (B, sws) i32 offset-carrying, k_cache, v_cache) — per-lane
    token-identical to the scan-of-decode_step_fused_batched path under
    the same `subs_w`. quant=True: `params` is a decode-prepared qpack
    (+ dense wte window tiles, prepare_window_params). A {"q": int8,
    "s": f32} cache pytree selects the int8-KV path (fresh rows quantize
    in-kernel, per-row scales carried as VMEM state across the steps)."""
    L, D, S = cfg.n_layer, cfg.n_embd, cfg.block_size
    B = logits0.shape[0]
    svs, cbs = semantic_vocab_size, codebook_size
    kv_quant = isinstance(k_cache, dict)
    v_pad = _v_pad(cfg)
    lo, hi = lm_window
    lm_tiles = (lo // D, -(-min(hi, v_pad) // D))
    lm_t0, lm_t1 = lm_tiles
    nw = (lm_t1 - lm_t0) * D
    blocks = params["blocks"]
    tiled = params["_decode_tiles"]
    wte_win = params["_wte_win"]
    nt_wte = wte_win.shape[0]
    cdt = params["wpe"].dtype
    has_min = quant and "wte_m" in params
    sdt = jnp.dtype(blocks["proj_s"].dtype) if quant else jnp.dtype("float32")
    RW = wte_win.shape[1]
    dyn = "_lp" in params  # injected by ensure_layer_params iff dyn enabled
    if kv_quant:
        kc, vc = k_cache["q"], v_cache["q"]  # (L, B, S, D) int8
        # dyn keeps the scale state (L, B, S): the traced layer index
        # reads row [l, b] (leading-dim dynamic, static sublane)
        ks = k_cache["s"] if dyn else k_cache["s"].reshape(L * B, S)
        vs = v_cache["s"] if dyn else v_cache["s"].reshape(L * B, S)
    else:
        kc, vc = k_cache, v_cache
        ks = vs = None
    extra = _WRING * RW * D * cdt.itemsize if quant else 0
    if dyn:
        extra += L * 16 * D * 4  # the packed lp ref
    ring, kv_slots, vfit = _pick_depths_batched(
        cfg, B, quant, has_min, kc.dtype.itemsize, kv_quant=kv_quant,
        s_itemsize=sdt.itemsize, extra_bytes=extra, multi_step=True,
        w_itemsize=cdt.itemsize,
    )
    if dyn:
        ring = _dyn_ring(ring)
        kv_slots = _dyn_kv_slots_batched(kv_slots, B)
    kv_chunks = _pick_kv_chunks(S, batched=True)
    sws8 = -(-sws // 8) * 8

    # per-lane gumbel rows at each step's parity window (see
    # coarse_window_fused; here there is one row per (step, lane))
    if temp != 0.0:
        g_rel = jax.vmap(jax.vmap(
            lambda k: jax.random.gumbel(k, (cbs,), jnp.float32)
        ))(subs_w)  # (sws, B, cbs)
        j_ids = jnp.arange(sws, dtype=jnp.int32)[:, None, None]
        base = svs + jnp.where((step_idx0 + j_ids) % 2 == 0, 0, cbs)
        lane = jnp.arange(nw, dtype=jnp.int32)[None, None, :] + lm_t0 * D
        off = jnp.broadcast_to(lane - base, (sws, B, nw))
        gum = jnp.where(
            (off >= 0) & (off < cbs),
            jnp.take_along_axis(g_rel, jnp.clip(off, 0, cbs - 1), axis=2),
            0.0,
        )
    else:
        gum = jnp.zeros((sws, B, nw), jnp.float32)
    gum = jnp.zeros((sws8, B, nw), jnp.float32).at[:sws].set(gum)

    logits0_c = jax.lax.dynamic_slice_in_dim(
        jnp.pad(logits0, ((0, 0), (0, v_pad - logits0.shape[1]))),
        lm_t0 * D, nw, axis=1,
    ).astype(jnp.float32)

    TP = max(128, -(-sws // 128) * 128)
    kernel = functools.partial(
        _window_kernel_batched, cfg, B, sws, temp, svs, cbs, lm_tiles,
        nt_wte, ring, kv_slots, kv_chunks, quant, has_min, kv_quant, dyn,
    )
    if quant:
        big = [
            tiled["qkv"], blocks["proj_q"], tiled["fc"], blocks["out_q"],
            tiled["lm"],
            tiled["qkv_s"], tiled["proj_s"], tiled["fc_s"], tiled["out_s"],
            tiled["lm_s"],
        ]
    else:
        big = [
            tiled["qkv"], blocks["proj_w"], tiled["fc"], blocks["out_w"],
            tiled["lm"],
        ]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [
        pltpu.VMEM((B, nw), jnp.float32),  # rel
        pltpu.VMEM((8, B, nw), jnp.float32),  # gumbel row window
        pltpu.VMEM((ring, D, D), jnp.int8 if quant else cdt),  # weight ring
    ]
    if quant:
        scratch.append(pltpu.VMEM(
            (ring, (2 if has_min else 1) * (D // 32), D), sdt
        ))
    scratch += [
        pltpu.VMEM((kv_slots, S, D), kc.dtype),
        pltpu.VMEM((kv_slots, S, D), vc.dtype),
        pltpu.VMEM((B, 8, D), kc.dtype),
        pltpu.VMEM((B, 8, D), vc.dtype),
        pltpu.VMEM((B, 8, D), cdt),  # per-lane wpe windows
    ]
    if quant:
        scratch.append(pltpu.VMEM((_WRING, RW, D), cdt))  # wte side ring
    scratch += [
        pltpu.VMEM((S, cfg.n_head), jnp.float32),  # shared att scratch
        pltpu.VMEM((S, B), jnp.float32),  # per-lane -1e9 row masks
        pltpu.VMEM((S, B), jnp.float32),  # per-lane fresh-row flags
        pltpu.SemaphoreType.DMA((ring,)),
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    scratch += [
        pltpu.SemaphoreType.DMA((kv_slots, 2, kv_chunks)),
        pltpu.SemaphoreType.DMA((B, 2)),
        pltpu.SemaphoreType.DMA((B,)),
        pltpu.SemaphoreType.DMA,
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((_WRING,)))
    out_shape = [
        jax.ShapeDtypeStruct((B, TP), jnp.int32),
        jax.ShapeDtypeStruct(kc.shape, kc.dtype),
        jax.ShapeDtypeStruct(vc.shape, vc.dtype),
    ]
    out_specs = [vmem, hbm, hbm]
    cache_inputs = [kc, vc]
    if dyn:
        small = [params["_lp"]]
    else:
        small = [
            blocks["ln1_g"], blocks["ln1_b"],
            blocks["ln2_g"], blocks["ln2_b"],
            blocks["qkv_b"], blocks["proj_b"],
            blocks["fc_b"], blocks["out_b"],
        ]
    n_vm = len(small) + 3  # + lnf_g lnf_b logits0
    in_specs = (
        [smem, smem] + [vmem] * n_vm + [hbm] * (len(big) + 3)
        + [hbm, hbm]
    )
    if kv_quant:
        in_specs += [vmem, vmem]
        out_shape += [
            jax.ShapeDtypeStruct(ks.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs.shape, jnp.float32),
        ]
        out_specs += [vmem, vmem]
        cache_inputs += [ks, vs]
    cache_in_idx = 2 + n_vm + len(big) + 3
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        input_output_aliases={cache_in_idx: 1, cache_in_idx + 1: 2},
        interpret=interpret,
        compiler_params=_compiler_params(vfit),
    )(
        ctx_len.astype(jnp.int32).reshape(B, 1),
        jnp.reshape(jnp.asarray(step_idx0, jnp.int32), (1, 1)),
        *small,
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        logits0_c,
        *big, wte_win, params["wpe"], gum,
        *cache_inputs,
    )
    if kv_quant:
        toks, kc, vc, ks, vs = outs
        return (
            toks[:, :sws],
            {"q": kc, "s": ks.reshape(L, B, S)},
            {"q": vc, "s": vs.reshape(L, B, S)},
        )
    toks, kc, vc = outs
    return toks[:, :sws], kc, vc
