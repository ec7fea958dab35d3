"""Semantic-stage chunk decode as ONE Pallas TPU kernel: K decode steps,
full-vocab sampling AND the EOS stop test included.

Why: the semantic loop (pipeline/semantic.py) chains single-step fused
kernel calls through a `lax.while_loop`; each call boundary pays the same
~0.1 ms of XLA glue the coarse stage paid before kernels/window.py (carry
shuffling, full-vocab sampling HLOs, a weight-DMA pipeline that drains and
refills per token). The reference evaluates this loop graph-per-token
(/root/reference/bark.cpp:1586-1701). Here K steps run inside one
`pallas_call`; an XLA while_loop around it handles the EOS early-exit with
at most K-1 wasted in-kernel steps after a stop.

Exact-token contract with the stepped path (tested in interpret mode and
by tools/tpu_check.py check_semantic on hardware):
- sampling: `jax.random.categorical(k, logits/temp)` IS
  `argmax(logits/temp + gumbel(k, (V,)))`; the caller precomputes ALL
  max_steps gumbel rows from the same pre-split step keys into an HBM
  buffer; step g DMAs its row through an 8-row aligned window (the same
  aligned-window + mask-select trick the wpe row uses).
- the EOS stop mirrors ops/sampling.sample + the while body: eos_p is the
  softmax mass of the LAST logit slot over logits/temp (logits/0.7 when
  temp == 0, the reference's hardcoded "testing" divide), and
  stop = (tok == semantic_vocab_size) | (eos_p >= min_eos_p). eos_p's
  denominator is a lane-reduction whose summation tree may differ from
  XLA's softmax by last-ulp — a stop-flag flip needs eos_p within 1 ulp
  of min_eos_p.
- post-stop steps inside a chunk keep decoding; their tokens/cache rows
  are unobservable (the XLA wrapper masks appended tokens at the first
  stop flag and the stage's caches die with the stage), matching the
  stepped loop's exit-after-stop semantics.
- the token embed is onehot(tok) @ streamed wte tiles (rows [0, v_pad)),
  exactly kernels/window.py's scheme — no dynamic lane slicing, no
  vector->scalar DMA index.

Weights may be dense or packed-quantized (r4): packed layer/LM tiles ride
the unified quant tile stream (in-VMEM dequant, same as the single-step
kernel); the full-vocab wte rows — block-quantized along D, inexpressible
in that stream — ride a DENSE side ring (decode._wte_side_stream,
dequantized once at prepare). Default sampler (no top-k/top-p), bf16/f32
KV — the same envelope as the coarse window kernel. BARK_TPU_SEM_KERNEL=0
disables; BARK_TPU_SEM_CHUNK sets K (default 16).
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
# in flight (see kernels/window._WRING — small 2-deep side rings serialize
# on DMA issue latency)
_WRING = 4


def chunk_size() -> int:
    return max(1, int(os.environ.get("BARK_TPU_SEM_CHUNK", "16")))


def use_while_stage() -> bool:
    """Whole stage in ONE kernel call with an in-kernel EOS while_loop
    (no post-stop waste, no chunk boundaries) instead of fixed-K chunks.
    Default off: requires Mosaic to lower a while_loop whose cond reads a
    vector-reduced carry scalar — probe with tools/tpu_mosaic_probe.py
    before enabling on hardware (interpret mode always works)."""
    return os.environ.get("BARK_TPU_SEM_WHILE", "0") == "1"


def use_scalar_embed() -> bool:
    """Embed the sampled token via a scalar-indexed 8-row wte DMA instead
    of streaming the whole [0, v_pad) wte window through the MXU — saves
    ~nt_wte tiles (16-21 MB on production shapes) of HBM traffic per step,
    and the wte tiles sit ON the critical weight stream, so the bytes are
    a direct win. Default ON since r4: the Mosaic capabilities it needs
    (vector-reduced scalar -> SMEM -> dynamic DMA base) PASS on v5e
    (tools/tpu_mosaic_probe.py P2/P2b) and the on-TPU gate asserts
    bit-equal tokens/flags/logits vs the streamed one-hot embed
    (tpu_check check_semantic_variants). BARK_TPU_SCALAR_EMBED=0 restores
    the streamed embed."""
    return os.environ.get("BARK_TPU_SCALAR_EMBED", "1") == "1"


def supports_semantic_kernel(
    cfg: GPTConfig, decode_fn, *,
    top_k: int = 0, top_p: float = 0.0, kv_quant: bool = False,
) -> bool:
    """Fused decode (dense or packed-quantized) over the FULL LM head (the
    semantic sampler reads every logit), default sampler. int8-KV is
    served like the batched flavor (per-row scales as VMEM state, fresh
    rows quantize in-kernel; before r5 single-lane kv8 fell back to the
    stepped path — see kernels/window.supports_window_kernel).
    BARK_TPU_SEM_KERNEL=0 disables."""
    if os.environ.get("BARK_TPU_SEM_KERNEL", "1") == "0":
        return False
    return (
        getattr(decode_fn, "is_fused", False)
        and getattr(decode_fn, "lm_window", None) is None
        and top_k == 0
        and not top_p
        and cfg.n_embd % 128 == 0
        and cfg.block_size % 8 == 0
        and cfg.n_embd % cfg.n_head == 0
    )


def prepare_semantic_params(cfg: GPTConfig, params, dense_wte=None):
    """Extend decode-prepared `params` with the row-tiled copy of wte rows
    [0, v_pad) (zero-padded past n_in_vocab if needed; the sampler only
    produces tokens < n_out_vocab <= n_in_vocab) streamed for the in-kernel
    one-hot embedding lookup: (nt, D, D) riding the unified stream (dense)
    or (nt, RW, D) for the quant path's side ring. Packed callers pass the
    densified wte (`dense_wte`, bit-identical to dequantize-at-embed); it
    is also kept raw (`_wte_raw`) for the scalar-embed variant."""
    params = ensure_layer_params(cfg, params)  # no-op unless dyn layers
    if "_wte_sem" in params:
        return params
    D = cfg.n_embd
    v_pad = _v_pad(cfg)
    quant = "qkv_q" in params["blocks"]
    wte = params["wte"][0] if "wte" in params else dense_wte
    assert wte is not None, "packed params need dense_wte"
    n_rows = min(v_pad, wte.shape[0])
    out = dict(params)
    if quant:
        # D-row side tiles, same granularity as the dense path's unified
        # stream (RW=256 measured ~42 DMAs/step serializing on issue
        # latency, r4)
        RW = D
        win = jnp.zeros((v_pad, D), wte.dtype).at[:n_rows].set(
            wte[:n_rows]
        )
        out["_wte_sem"] = win.reshape(v_pad // RW, RW, D)
        out["_wte_raw"] = wte  # scalar-embed variant reads raw rows
    else:
        nt = v_pad // D
        win = jnp.zeros((v_pad, D), wte.dtype).at[:n_rows].set(
            wte[:n_rows]
        )
        out["_wte_sem"] = win.reshape(nt, D, D)
    return out


def _semantic_kernel(
    cfg: GPTConfig,
    K: int,
    temp: float,
    svs: int,
    nv: int,  # streamed logit lanes == v_pad
    n_out: int,  # live logit lanes (n_out_vocab); eos lane is n_out - 1
    msp8: int,  # gumbel buffer rows (8-aligned)
    nt_wte: int,  # 0 with scalar_embed (no wte tiles in the stream)
    ring: int,
    kv_slots: int,
    kv_chunks: int,
    use_while: bool,
    scalar_embed: bool,
    quant: bool,
    has_min: bool,
    kv_quant: bool,
    dyn: bool,
    grouped: bool,
    *refs,
):
    """refs: ctx0 cnt0 (SMEM (1,1) i32), minp (SMEM (1,1) f32),
    ln1_g ln1_b ln2_g ln2_b qkv_b proj_b fc_b out_b — or, when dyn, the
    single packed lp (L, 16, D) f32 (decode.pack_layer_params; the layer
    loop is then a lax.fori_loop, decode._dense_layer_stack_dyn) — then
    lnf_g lnf_b (VMEM), logits0 (1, nv) f32 (VMEM),
    qkv_w proj_w fc_w out_w lm_t [qkv_s proj_s fc_s out_s lm_s]
    wte_sem wpe gum (HBM)
    [wte_sem is the (nt, D, D) tile stack, the quant path's (nt, RW, D)
    dense side tiles, or the RAW (V_in, D) wte when scalar_embed],
    k_hbm v_hbm (HBM, aliased) ->
    toks (1, TP) i32, flags (1, TP) i32, logits_out (1, nv) f32 (VMEM),
    k_out v_out (HBM),
    scratch: rel (1, nv) f32, gbuf (8, nv) f32, wtile (ring, D, D)
    [stile], kbuf vbuf (kv_slots, S, D), krows vrows (L, 8, D),
    wpe8 (8, D), wrow8 (8, D), [wbuf (wring, RW, D)], tok_s (SMEM (1,) i32),
    sem_w (ring,) [sem_s], sem_kv (kv_slots, 2, kv_chunks), sem_row (2,),
    sem_wpe, sem_g, sem_e [sem_e2 (wring,)]
    """
    it = iter(refs)
    ctx0_ref, cnt0_ref, minp_ref = next(it), next(it), next(it)
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
    wte_sem, wpe, gum = next(it), next(it), next(it)
    _k_in, _v_in = next(it), next(it)  # aliased to k_out/v_out
    ks_in = vs_in = ks_out = vs_out = None
    if kv_quant:
        ks_in, vs_in = next(it), next(it)  # (L, 1, S) f32 row scales
    toks_ref, flags_ref, lout_ref = next(it), next(it), next(it)
    k_out, v_out = next(it), next(it)
    if kv_quant:
        ks_out, vs_out = next(it), next(it)
    rel_ref, gbuf = next(it), next(it)
    wtile = next(it)
    stile = next(it) if quant else None
    kbuf, vbuf, krows, vrows, wpe8 = (next(it) for _ in range(5))
    wrow8 = next(it)
    wbuf = next(it) if (quant and not scalar_embed) else None
    tok_s = next(it)
    sem_w = next(it)
    sem_s = next(it) if quant else None
    sem_kv, sem_row, sem_wpe, sem_g, sem_e = (next(it) for _ in range(5))
    sem_e2 = next(it) if (quant and not scalar_embed) else None

    L, D, S, H = cfg.n_layer, cfg.n_embd, cfg.block_size, cfg.n_head
    hd = D // H
    cdt = wpe8.dtype
    ctx0 = ctx0_ref[0, 0]
    cnt0 = cnt0_ref[0, 0]
    minp = minp_ref[0, 0]
    nt_lm = nv // D
    n_tiles_layer = 12
    KC = S // kv_chunks

    if quant:
        ti0 = 0
        embed_srcs = []
        if not scalar_embed:
            start_w, embed_w = _wte_side_stream(
                wte_sem, wbuf, sem_e2, _WRING
            )
            n_wlane = nt_wte * wbuf.shape[1]
    else:
        embed_srcs = [wte_sem.at[t] for t in range(nt_wte)]
        ti0 = nt_wte  # 0 with scalar_embed (no wte tiles in the stream)
        n_wlane = nt_wte * D
    if dyn:
        warmup, qdot_embed, qdot_layer, qdot_lm = _tile_stream_dyn(
            (qkv_w, proj_w, fc_w, out_w),
            (qkv_s, proj_s, fc_s, out_s) if quant else None,
            (lm_t, lm_s if quant else None), embed_srcs,
            L, nt_lm, ring, quant, has_min,
            wtile, stile, sem_w, sem_s, D, cdt,
        )
    else:
        sources = (
            [(s, None) for s in embed_srcs]
            + _weight_sources(
                L, D, nt_lm,
                (qkv_w, proj_w, fc_w, out_w),
                (qkv_s, proj_s, fc_s, out_s) if quant else None,
                (lm_t, lm_s if quant else None), 1,
            )
        )
        start, qdot = _tile_stream(
            sources, ring, quant, has_min, wtile, stile, sem_w, sem_s,
            D, D // 32, cdt, 1,
        )

    # gated KV slab stream (decode.py `_decode_kernel`): chunk c streams
    # only while c*KC <= n_past. n_past GROWS across the in-kernel steps, so
    # liveness is monotone — a chunk dead at step j that turns live at step
    # j' > j is simply DMA'd from j' on, overwriting the start-of-kernel
    # zero fill below. `guard_l` carries the dyn stack's traced-bounds
    # check (l < L), folded into each chunk's pl.when condition.
    def _start_kv_chunks(l, slot, n_past, guard_l=None):
        for c in range(kv_chunks):
            def _start(c=c):
                rows = pl.ds(c * KC, KC)
                pltpu.make_async_copy(
                    k_out.at[l, rows], kbuf.at[slot, rows],
                    sem_kv.at[slot, 0, c],
                ).start()
                pltpu.make_async_copy(
                    v_out.at[l, rows], vbuf.at[slot, rows],
                    sem_kv.at[slot, 1, c],
                ).start()
            cond = (c * KC <= n_past) if c > 0 else None
            if guard_l is not None:
                cond = guard_l if cond is None else (guard_l & cond)
            if cond is None:
                _start()
            else:
                pl.when(cond)(_start)

    def start_kv(l, n_past):
        if l >= L:  # static layer index (warm-up / unrolled stack)
            return
        _start_kv_chunks(l, l % kv_slots, n_past)

    def wait_kv(l, n_past, slot=None):
        slot = (l % kv_slots) if slot is None else slot
        for c in range(kv_chunks):
            def _wait(c=c):
                rows = pl.ds(c * KC, KC)
                pltpu.make_async_copy(
                    k_out.at[0, rows], kbuf.at[slot, rows],
                    sem_kv.at[slot, 0, c],
                ).wait()
                pltpu.make_async_copy(
                    v_out.at[0, rows], vbuf.at[slot, rows],
                    sem_kv.at[slot, 1, c],
                ).wait()
            if c == 0:
                _wait()
            else:
                pl.when(c * KC <= n_past)(_wait)

    seg, seg_t = _head_seg(D, H, hd, cdt)
    row8_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    lane_nv = jax.lax.broadcasted_iota(jnp.int32, (1, nv), 1)
    lane_wte = (
        None if scalar_embed
        else jax.lax.broadcasted_iota(jnp.int32, (1, n_wlane), 1)
    )
    lane_tp = jax.lax.broadcasted_iota(
        jnp.int32, toks_ref.shape, len(toks_ref.shape) - 1
    )
    live = lane_nv < n_out

    # zero-fill dead V chunks once: the first step has the smallest n_past,
    # later steps only ADD live chunks (overwritten by their DMAs). Dead V
    # rows must be 0.0 (0-weight * junk-bits could be 0 * NaN); dead K rows
    # are harmless — their scores go through a SELECT against -1e9.
    if kv_chunks > 1:
        np0 = jnp.minimum(ctx0 + cnt0, S - 1)
        for slot in range(kv_slots):
            for c in range(1, kv_chunks):
                def _zfill(slot=slot, c=c):
                    vbuf[slot, pl.ds(c * KC, KC), :] = jnp.zeros(
                        (KC, D), vbuf.dtype
                    )
                pl.when(c * KC > np0)(_zfill)

    rel_ref[:, :] = logits0[:, :]
    toks_ref[:, :] = jnp.zeros(toks_ref.shape, jnp.int32)
    flags_ref[:, :] = jnp.zeros(flags_ref.shape, jnp.int32)
    col_ids = None
    if kv_quant:
        # scale state lives in the VMEM outputs for the whole chunk: seed
        # from the inputs once, then every step reads/updates ks_out in
        # place (the int8 slabs round-trip HBM per layer; the tiny
        # (L, 1, S) f32 scales never need to)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        ks_out[...] = ks_in[...]
        vs_out[...] = vs_in[...]

    def step_body(j, _):
        g = cnt0 + j  # global step index == this step's key/gumbel row
        n_past = jnp.minimum(ctx0 + g, S - 1)

        # ---- this step's gumbel row + wpe row (8-aligned windows) ----
        gbase = pl.multiple_of(
            (jnp.minimum(g, msp8 - 1) // 8) * 8, 8
        )
        cp_g = pltpu.make_async_copy(gum.at[pl.ds(gbase, 8)], gbuf, sem_g)
        cp_g.start()
        base8 = pl.multiple_of((n_past // 8) * 8, 8)
        cp_w = pltpu.make_async_copy(
            wpe.at[pl.ds(base8, 8)], wpe8, sem_wpe
        )
        cp_w.start()

        # ---- warm-up: weight-tile ring + first KV slabs ----
        if dyn:
            warmup()
        else:
            for i in range(ring - 1):
                start(i)
        if quant and not scalar_embed:
            for t in range(min(_WRING, nt_wte)):
                start_w(t)
        for l in range(kv_slots):
            start_kv(l, n_past)

        # ---- sample tok from the previous logits (or the prefill's) ----
        cp_g.wait()
        in_g = row8_ids == (jnp.minimum(g, msp8 - 1) - gbase)  # (8, 1)
        g_row = jnp.sum(
            jnp.where(in_g, gbuf[:, :], jnp.float32(0.0)),
            axis=0, keepdims=True,
        )  # (1, nv)
        if temp != 0.0:
            vals = rel_ref[:, :] / jnp.float32(temp)
            cand = jnp.where(live, vals + g_row, jnp.float32(-jnp.inf))
            sm = jnp.where(live, vals, jnp.float32(-jnp.inf))
        else:
            cand = jnp.where(
                live, rel_ref[:, :], jnp.float32(-jnp.inf)
            )
            sm = jnp.where(
                live, rel_ref[:, :] / jnp.float32(0.7),
                jnp.float32(-jnp.inf),
            )
        m = jnp.max(cand)
        tok = jnp.min(jnp.where(cand == m, lane_nv, jnp.int32(2**30)))
        # eos_p: softmax mass of the last live lane (ops/sampling.sample)
        mm = jnp.max(sm)
        e = jnp.exp(sm - mm)  # pad lanes: exp(-inf) == 0
        eos_p = jnp.sum(
            jnp.where(lane_nv == (n_out - 1), e, jnp.float32(0.0))
        ) / jnp.sum(e)
        stop = (tok == svs) | (eos_p >= minp)
        toks_ref[:, :] = jnp.where(lane_tp == j, tok, toks_ref[:, :])
        flags_ref[:, :] = jnp.where(
            lane_tp == j, stop.astype(jnp.int32), flags_ref[:, :]
        )

        if scalar_embed:
            # ---- embedding: scalar-indexed 8-row wte DMA (wte_sem is
            # the RAW (V_in, D) wte here). The vector-reduced tok round-
            # trips through SMEM to become a DMA base — the Mosaic
            # capability tools/tpu_mosaic_probe.py P2/P2b tests.
            tok_s[0] = tok
            base_t = (tok_s[0] // 8) * 8
            cp_e = pltpu.make_async_copy(
                wte_sem.at[pl.ds(base_t, 8)], wrow8, sem_e
            )
            cp_e.start()
            cp_e.wait()
            in_t = row8_ids == (tok_s[0] - base_t)
            x_emb = jnp.sum(
                jnp.where(in_t, wrow8[:, :].astype(jnp.float32), 0.0),
                axis=0, keepdims=True,
            )
        elif quant:
            # ---- embedding: onehot @ dense side-ring tiles ----
            onehot = (lane_wte == tok).astype(cdt)
            x_emb = embed_w(onehot)
        else:
            # ---- embedding: onehot(tok) @ wte tiles (exact row select)
            onehot = (lane_wte == tok).astype(cdt)
            x_emb = None
            for t in range(nt_wte):
                oh_t = onehot[:, t * D : (t + 1) * D]
                part = qdot_embed(oh_t, t) if dyn else qdot(oh_t, t)
                x_emb = part if x_emb is None else x_emb + part
        cp_w.wait()
        in_row8 = row8_ids == (n_past - base8)
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
                lambda l, slot: wait_kv(l, n_past, slot),
                lambda l, slot: _start_kv_chunks(
                    l, slot, n_past, guard_l=l < L
                ),
                kbuf, vbuf, krows, vrows, kv_slots,
                in_row8, base8, n_past, seg, seg_t, slot_ids, row_ids, x,
                gate_chunks=_gate_for(S, kv_chunks, cfg.n_embd),
                grouped=grouped, **kvq,
            )
        else:
            x = _dense_layer_stack(
                cfg, cdt, qdot, ti0,
                ln1_g, ln1_b, ln2_g, ln2_b, qkv_b, proj_b, fc_b, out_b,
                lambda l: wait_kv(l, n_past),
                lambda l: start_kv(l, n_past),
                kbuf, vbuf, krows, vrows, kv_slots,
                in_row8, base8, n_past, seg, seg_t, slot_ids, row_ids, x,
                gate_chunks=_gate_for(S, kv_chunks, cfg.n_embd),
                grouped=grouped, **kvq,
            )

        # ---- cache row write-back (this step's rows) ----
        pltpu.make_async_copy(
            krows, k_out.at[:, pl.ds(base8, 8), :], sem_row.at[0]
        ).start()
        pltpu.make_async_copy(
            vrows, v_out.at[:, pl.ds(base8, 8), :], sem_row.at[1]
        ).start()

        # ---- LM head over the full padded vocab ----
        hfin = _ln_f32(x, lnf_g[0], lnf_b[0]).astype(cdt)
        for i in range(nt_lm):
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
        # i32 loop carry (the while variant's exit flag): bool (i1)
        # scalars are a riskier Mosaic carry type than i32
        return stop.astype(jnp.int32)

    if use_while:
        # whole stage in this one call: the loop exits right after the
        # stop step's decode, exactly like the stepped while_loop — no
        # post-stop waste, no chunk boundaries. Needs Mosaic to lower a
        # while_loop whose cond reads a vector-reduced carry scalar
        # (probed by tools/tpu_mosaic_probe.py; interpret mode always
        # works). The stop step itself still decodes (its logits land in
        # lout and are never sampled), matching the stepped semantics.
        jax.lax.while_loop(
            lambda c: (c[1] == 0) & (c[0] < K),
            lambda c: (c[0] + 1, step_body(c[0], None)),
            (jnp.int32(0), jnp.int32(0)),
        )
    else:
        jax.lax.fori_loop(
            0, K, lambda j, c: step_body(j, None), jnp.int32(0)
        )
    lout_ref[:, :] = rel_ref[:, :]


def semantic_chunk_fused(
    cfg: GPTConfig,
    params,  # decode-prepared AND semantic-prepared
    logits,  # (n_out_vocab,) f32 — the previous step's (or prefill's)
    k_cache,  # (L, S, D), aliased in -> out
    v_cache,
    ctx_len,  # i32 scalar (257 for the semantic stage)
    count0,  # i32 scalar: tokens appended so far == first step's key index
    gum,  # (msp8, v_pad) f32 HBM: per-step gumbel rows (zeros if temp==0)
    min_eos_p,  # f32 scalar
    *,
    K: int,
    temp: float,
    semantic_vocab_size: int,
    use_while: bool = False,
    scalar_embed: bool = False,
    quant: bool = False,
    interpret: bool = False,
):
    """Run K semantic decode steps. Returns (toks (K,) i32, flags (K,) i32
    stop-at-step-j, logits_out (n_out_vocab,) f32, k_cache, v_cache) —
    token- and flag-identical to K iterations of the stepped while body
    under the same pre-split keys (see module docstring for the one
    last-ulp eos_p caveat). quant=True: `params` is a decode-prepared
    qpack (+ dense wte tiles from prepare_semantic_params). int8-KV:
    pass the caches as {"q": (L, S, D) int8, "s": (L, S) f32} dicts —
    the kernel streams int8 slabs and keeps the scale rows resident in
    VMEM across the chunk (see kernels/window.coarse_window_fused)."""
    L, D, S = cfg.n_layer, cfg.n_embd, cfg.block_size
    v_pad = _v_pad(cfg)
    nv = v_pad
    n_out = cfg.n_out_vocab
    blocks = params["blocks"]
    tiled = params["_decode_tiles"]
    kv_quant = isinstance(k_cache, dict)
    if kv_quant:
        kc_in, vc_in = k_cache["q"], v_cache["q"]
        ks = k_cache["s"].reshape(L, 1, S)
        vs = v_cache["s"].reshape(L, 1, S)
    else:
        kc_in, vc_in = k_cache, v_cache
        ks = vs = None
    if scalar_embed:
        # raw wte rows, DMA'd 8 at a time at the sampled token's index —
        # no tile stream for the embedding at all (the quant path keeps a
        # densified copy in _wte_raw)
        wte_sem = params["wte"][0] if "wte" in params else params["_wte_raw"]
        nt_wte = 0
        assert wte_sem.shape[0] >= ((n_out - 1) // 8) * 8 + 8, (
            wte_sem.shape, n_out,
        )
    else:
        wte_sem = params["_wte_sem"]
        nt_wte = wte_sem.shape[0]
    cdt = params["wpe"].dtype
    has_min = quant and "wte_m" in params
    sdt = jnp.dtype(blocks["proj_s"].dtype) if quant else jnp.dtype("float32")
    side = quant and not scalar_embed
    RW = wte_sem.shape[1] if side else 0
    # extra VMEM beyond the single-step model: full-vocab logits in/out +
    # rel scratch, the 8-row gumbel window, wpe/wte row windows, and the
    # multi-step loop's Mosaic stack (see decode._MULTISTEP_STACK_MARGIN);
    # quant adds the dense wte side ring
    extra = (
        3 * nv * 4
        + 8 * nv * 4
        + 2 * 8 * D * cdt.itemsize
        + _MULTISTEP_STACK_MARGIN
    )
    if side:
        extra += _WRING * RW * D * cdt.itemsize
    dyn = "_lp" in params  # injected by ensure_layer_params iff dyn enabled
    if dyn:
        extra += L * 16 * D * 4  # the packed lp ref
    ring, kv_slots, vfit = _pick_depths(
        cfg, quant, has_min, kc_in.dtype.itemsize, kv_quant=kv_quant,
        s_itemsize=sdt.itemsize, extra_bytes=extra,
        w_itemsize=cdt.itemsize,
    )
    if dyn:
        ring = _dyn_ring(ring)
        kv_slots = _dyn_kv_slots(kv_slots, L)
    kv_chunks = _pick_kv_chunks(S)
    msp8 = gum.shape[0]
    assert gum.shape == (msp8, nv) and msp8 % 8 == 0, gum.shape

    logits0 = jnp.pad(
        logits.astype(jnp.float32), (0, nv - logits.shape[0])
    )[None, :]

    TP = max(128, -(-K // 128) * 128)
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
        _semantic_kernel, cfg, K, temp, semantic_vocab_size, nv, n_out,
        msp8, nt_wte, ring, kv_slots, kv_chunks, use_while, scalar_embed,
        quant, has_min, kv_quant, dyn, grouped,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [
        pltpu.VMEM((1, nv), jnp.float32),  # rel
        pltpu.VMEM((8, nv), jnp.float32),  # gumbel row window
        pltpu.VMEM((ring, D, D), jnp.int8 if quant else cdt),  # weight ring
    ]
    if quant:
        scratch.append(pltpu.VMEM(
            (ring, (2 if has_min else 1) * (D // 32), D), sdt
        ))
    scratch += [
        pltpu.VMEM((kv_slots, S, D), kc_in.dtype),
        pltpu.VMEM((kv_slots, S, D), vc_in.dtype),
        pltpu.VMEM((L, 8, D), kc_in.dtype),
        pltpu.VMEM((L, 8, D), vc_in.dtype),
        pltpu.VMEM((8, D), cdt),  # wpe window
        pltpu.VMEM((8, D), cdt),  # scalar-embed wte row window
    ]
    if side:
        scratch.append(pltpu.VMEM((_WRING, RW, D), cdt))  # wte side ring
    scratch.append(pltpu.SMEM((1,), jnp.int32))  # scalar-embed token index
    scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    scratch += [
        pltpu.SemaphoreType.DMA((kv_slots, 2, kv_chunks)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if side:
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
    n_vm = len(small) + 3  # + lnf_g lnf_b logits0
    n_in = 3 + n_vm + len(big) + 3 + 2  # smem, vmem, big, wte/wpe/gum, caches
    out_shape = [
        jax.ShapeDtypeStruct((1, TP), jnp.int32),
        jax.ShapeDtypeStruct((1, TP), jnp.int32),
        jax.ShapeDtypeStruct((1, nv), jnp.float32),
        jax.ShapeDtypeStruct(kc_in.shape, kc_in.dtype),
        jax.ShapeDtypeStruct(vc_in.shape, vc_in.dtype),
    ]
    out_specs = [vmem, vmem, vmem, hbm, hbm]
    in_specs = (
        [smem, smem, smem] + [vmem] * n_vm + [hbm] * (len(big) + 3)
        + [hbm, hbm]
    )
    cache_inputs = [kc_in, vc_in]
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
        input_output_aliases={n_in - 2: 3, n_in - 1: 4},
        interpret=interpret,
        compiler_params=_compiler_params(vfit),
    )(
        jnp.reshape(ctx_len.astype(jnp.int32), (1, 1)),
        jnp.reshape(count0.astype(jnp.int32), (1, 1)),
        jnp.reshape(min_eos_p.astype(jnp.float32), (1, 1)),
        *small,
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        logits0,
        *big, wte_sem, params["wpe"], gum,
        *cache_inputs,
    )
    if kv_quant:
        toks, flags, lout, kco, vco, kso, vso = outs
        return (
            toks[0, :K], flags[0, :K], lout[0, :n_out],
            {"q": kco, "s": kso.reshape(L, S)},
            {"q": vco, "s": vso.reshape(L, S)},
        )
    toks, flags, lout, kco, vco = outs
    return toks[0, :K], flags[0, :K], lout[0, :n_out], kco, vco


def supports_semantic_kernel_batched(
    cfg: GPTConfig, decode_fn, *,
    top_k: int = 0, top_p: float = 0.0, kv_quant: bool = False,
) -> bool:
    """Batched mirror of `supports_semantic_kernel` — additionally serves
    the int8 KV cache (see kernels/window.supports_window_kernel_batched:
    int8-KV pays at B>=8, where the slab stream dominates, and only the
    batched kernels keep it in-envelope). BARK_TPU_SEM_KERNEL_B=0
    disables (BARK_TPU_SEM_KERNEL=0 disables both flavors)."""
    if os.environ.get("BARK_TPU_SEM_KERNEL_B", "1") == "0":
        return False
    return supports_semantic_kernel(
        cfg, decode_fn, top_k=top_k, top_p=top_p, kv_quant=False
    )


def _semantic_kernel_batched(
    cfg: GPTConfig,
    B: int,
    B8: int,  # B rounded up to 8 (gumbel row-group stride, DMA-aligned)
    K: int,
    temp: float,
    svs: int,
    nv: int,
    n_out: int,
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
    """B-lane batched semantic chunk. Every lane shares the step's n_past
    (the semantic context is always 257 rows and active lanes advance in
    lockstep; a stopped lane's in-kernel continuation is unobservable), so
    the per-step cache write-back is ONE strided (B, 8, D) DMA per layer
    per K/V — not per lane (they all target the same aligned row window).

    refs: ctx0 g0 (SMEM (1,1) i32), minp (SMEM (1,1) f32),
    ln1_g..out_b — or, when dyn, the packed lp (L, 16, D) f32 (the layer
    loop is then a lax.fori_loop; kv_slots | B keeps slab slots static) —
    then lnf_g lnf_b (VMEM), logits0 (B, nv) f32 (VMEM),
    qkv_w proj_w fc_w out_w lm_t [qkv_s proj_s fc_s out_s lm_s]
    wte_sem wpe gum(K*B8, nv) (HBM),
    k_hbm v_hbm (L, B, S, D) (HBM, aliased)
    [ks_in vs_in (L*B, S) f32 — (L, B, S) when dyn — VMEM when kv_quant]
    -> toks flags (B, TP) i32, logits_out (B, nv) f32, k_out v_out,
    scratch: rel (B, nv) f32, gbuf (B8, nv) f32, wtile [stile], kbuf vbuf
    (kv_slots, S, D), krows vrows (B, 8, D), wpe8 (8, D),
    [wbuf (wring, RW, D)], att_scr (S, H) f32, mask_scr new_scr (S, B) f32,
    sem_w (ring,) [sem_s], sem_kv (kv_slots, 2, kv_chunks), sem_row (2,),
    sem_wpe, sem_g [sem_e (wring,)]
    """
    it = iter(refs)
    ctx0_ref, g0_ref, minp_ref = next(it), next(it), next(it)
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
    wte_sem, wpe, gum = next(it), next(it), next(it)
    _k_in, _v_in = next(it), next(it)  # aliased to k_out/v_out
    ks_in = vs_in = ks_out = vs_out = None
    if kv_quant:
        ks_in, vs_in = next(it), next(it)
    toks_ref, flags_ref, lout_ref = next(it), next(it), next(it)
    k_out, v_out = next(it), next(it)
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
    cdt = wpe8.dtype
    ctx0 = ctx0_ref[0, 0]
    g0 = g0_ref[0, 0]
    minp = minp_ref[0, 0]
    nt_lm = nv // D
    KC = S // kv_chunks

    if quant:
        ti0 = 0
        embed_srcs = []
        start_w, embed_w = _wte_side_stream(wte_sem, wbuf, sem_e, _WRING)
        n_wlane = nt_wte * wbuf.shape[1]
    else:
        embed_srcs = [wte_sem.at[t] for t in range(nt_wte)]
        ti0 = nt_wte
        n_wlane = nt_wte * D
    if dyn:
        warmup, qdot_embed, qdot_layer, qdot_lm = _tile_stream_dyn(
            (qkv_w, proj_w, fc_w, out_w),
            (qkv_s, proj_s, fc_s, out_s) if quant else None,
            (lm_t, lm_s if quant else None), embed_srcs,
            L, nt_lm, ring, quant, has_min,
            wtile, stile, sem_w, sem_s, D, cdt,
        )
    else:
        sources = (
            [(s, None) for s in embed_srcs]
            + _weight_sources(
                L, D, nt_lm,
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
    lane_nv = jax.lax.broadcasted_iota(jnp.int32, (1, nv), 1)
    lane_wte = jax.lax.broadcasted_iota(jnp.int32, (1, n_wlane), 1)
    lane_tp = jax.lax.broadcasted_iota(
        jnp.int32, toks_ref.shape, len(toks_ref.shape) - 1
    )
    live = lane_nv < n_out

    if kv_quant:
        # per-row scale state lives in the OUTPUT refs across the
        # in-kernel steps (kernels/window._window_kernel_batched)
        ks_out[:, :] = ks_in[:, :]
        vs_out[:, :] = vs_in[:, :]

    # zero-fill dead V AND K chunks once (first step's n_past is the
    # minimum; liveness is monotone). The batched attention's row mask is
    # ADDITIVE (-1e9) so K junk must not out-score it (decode.py
    # `_decode_kernel_batched`).
    if kv_chunks > 1:
        np0 = jnp.minimum(ctx0 + g0, S - 1)
        for slot in range(kv_slots):
            for c in range(1, kv_chunks):
                def _zfill(slot=slot, c=c):
                    kbuf[slot, pl.ds(c * KC, KC), :] = jnp.zeros(
                        (KC, D), kbuf.dtype
                    )
                    vbuf[slot, pl.ds(c * KC, KC), :] = jnp.zeros(
                        (KC, D), vbuf.dtype
                    )
                pl.when(c * KC > np0)(_zfill)

    rel_ref[:, :] = logits0[:, :]
    toks_ref[:, :] = jnp.zeros(toks_ref.shape, jnp.int32)
    flags_ref[:, :] = jnp.zeros(flags_ref.shape, jnp.int32)

    def step_body(j, _):
        g = g0 + j
        n_past = jnp.minimum(ctx0 + g, S - 1)  # shared by every lane
        base8 = pl.multiple_of((n_past // 8) * 8, 8)
        in_row8 = row8_ids == (n_past - base8)

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
                    pl.when(c * KC <= n_past)(_start)

        def wait_kv(idx):
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
                    pl.when(c * KC <= n_past)(_wait)

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
                cond = (c * KC <= n_past) if c > 0 else None
                if guard:
                    cond = (l < L) if cond is None else ((l < L) & cond)
                if cond is None:
                    _start()
                else:
                    pl.when(cond)(_start)

        # ---- this step's gumbel row group + shared wpe row ----
        cp_g = pltpu.make_async_copy(
            gum.at[pl.ds(j * B8, B8)], gbuf, sem_g
        )
        cp_g.start()
        cp_w = pltpu.make_async_copy(
            wpe.at[pl.ds(base8, 8)], wpe8, sem_wpe
        )
        cp_w.start()

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

        # shared additive row masks (n_past identical across lanes; the
        # (S, B) scratch keeps _attend_lane_scr's per-lane column shape)
        mcol = jnp.where(row_ids <= n_past, 0.0, jnp.float32(-1e9))
        ncol = (row_ids == n_past).astype(jnp.float32)
        for b in range(B):
            mask_scr[:, b : b + 1] = mcol
            new_scr[:, b : b + 1] = ncol

        # ---- sample every lane from the previous logits ----
        cp_g.wait()
        g_rows = gbuf[pl.ds(0, B), :]  # (B, nv) per-lane gumbel
        if temp != 0.0:
            vals = rel_ref[:, :] / jnp.float32(temp)
            cand = jnp.where(live, vals + g_rows, jnp.float32(-jnp.inf))
            sm = jnp.where(live, vals, jnp.float32(-jnp.inf))
        else:
            cand = jnp.where(live, rel_ref[:, :], jnp.float32(-jnp.inf))
            sm = jnp.where(
                live, rel_ref[:, :] / jnp.float32(0.7),
                jnp.float32(-jnp.inf),
            )
        m = jnp.max(cand, axis=1, keepdims=True)  # (B, 1)
        tok = jnp.min(
            jnp.where(cand == m, lane_nv, jnp.int32(2**30)),
            axis=1, keepdims=True,
        )  # (B, 1)
        mm = jnp.max(sm, axis=1, keepdims=True)
        e = jnp.exp(sm - mm)
        eos_p = jnp.sum(
            jnp.where(lane_nv == (n_out - 1), e, jnp.float32(0.0)),
            axis=1, keepdims=True,
        ) / jnp.sum(e, axis=1, keepdims=True)  # (B, 1)
        stop = ((tok == svs) | (eos_p >= minp)).astype(jnp.int32)
        toks_ref[:, :] = jnp.where(lane_tp == j, tok, toks_ref[:, :])
        flags_ref[:, :] = jnp.where(lane_tp == j, stop, flags_ref[:, :])

        # ---- embedding: per-lane onehot @ wte tiles + shared wpe ----
        onehot = (lane_wte == tok).astype(cdt)  # (B, n_wlane)
        if quant:
            x_emb = embed_w(onehot)
        else:
            x_emb = None
            for t in range(nt_wte):
                oh_t = onehot[:, t * D : (t + 1) * D]
                part = qdot_embed(oh_t, t) if dyn else qdot(oh_t, t)
                x_emb = part if x_emb is None else x_emb + part
        cp_w.wait()
        wpe_row = jnp.sum(
            jnp.where(in_row8, wpe8[:, :].astype(jnp.float32), 0.0),
            axis=0, keepdims=True,
        )  # (1, D), broadcast over lanes
        x = (x_emb + wpe_row).astype(cdt)

        # ---- layers (mirror of _decode_kernel_batched's lane loop; one
        # write-back DMA per layer — all lanes share the row window; dyn
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

            x1 = _ln_f32(x, *ln1).astype(cdt)
            qkv_parts = []
            for t in range(3):
                qkv_parts.append(
                    qd(x1, t) + b_qkv[t].astype(jnp.float32)
                )
            q = (qkv_parts[0] * (1.0 / (hd ** 0.5))).astype(cdt)
            if kv_quant:
                # fresh rows quantize exactly like gpt.quantize_kv_rows;
                # K stays int8 for the int8 MXU score dot
                k_new_q, ks_new = _quant_row(qkv_parts[1])
                v_new_q, vs_new = _quant_row(qkv_parts[2])
                k_new = k_new_q
                v_new = v_new_q.astype(cdt)
            else:
                k_new = qkv_parts[1].astype(cdt)
                v_new = qkv_parts[2].astype(cdt)

            def _wait_rows():
                pltpu.make_async_copy(
                    krows, k_out.at[0, :, pl.ds(0, 8), :], sem_row.at[0]
                ).wait()
                pltpu.make_async_copy(
                    vrows, v_out.at[0, :, pl.ds(0, 8), :], sem_row.at[1]
                ).wait()
            if dyn_l:
                pl.when(l > 0)(_wait_rows)
            elif l > 0:
                _wait_rows()
            ctx_rows = []
            for b in range(B):
                slot = b % kv_slots if dyn_l else (l * B + b) % kv_slots
                wait_kv(b if dyn_l else l * B + b)
                kb, vb = kbuf.at[slot], vbuf.at[slot]
                staged_k = k_new_q if kv_quant else k_new
                staged_v = v_new_q if kv_quant else v_new
                krows[b] = jnp.where(
                    in_row8, staged_k[b : b + 1], kb[pl.ds(base8, 8), :]
                )
                vrows[b] = jnp.where(
                    in_row8, staged_v[b : b + 1], vb[pl.ds(base8, 8), :]
                )
                ks_col = vs_col = ksn = vsn = None
                if kv_quant:
                    ksn = ks_new[b : b + 1]
                    vsn = vs_new[b : b + 1]
                    if dyn_l:
                        # (L, B, S) state, traced leading index
                        ks_out[l, b] = jnp.where(
                            col_ids == n_past, ksn,
                            ks_out[l, b][None, :],
                        )[0]
                        vs_out[l, b] = jnp.where(
                            col_ids == n_past, vsn,
                            vs_out[l, b][None, :],
                        )[0]
                        ks_col = ks_out[l, b][:, None]
                        vs_col = vs_out[l, b][:, None]
                    else:
                        r = l * B + b  # row of the (L*B, S) scale state
                        ks_out[pl.ds(r, 1), :] = jnp.where(
                            col_ids == n_past, ksn,
                            ks_out[pl.ds(r, 1), :],
                        )
                        vs_out[pl.ds(r, 1), :] = jnp.where(
                            col_ids == n_past, vsn,
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
                    b2 = (b + kv_slots) % B
                    dl = (b + kv_slots) // B
                    start_kv_dyn(l + dl, b2, guard=dl > 0)
                else:
                    start_kv(l * B + b + kv_slots)
            pltpu.make_async_copy(
                krows, k_out.at[l, :, pl.ds(base8, 8), :], sem_row.at[0]
            ).start()
            pltpu.make_async_copy(
                vrows, v_out.at[l, :, pl.ds(base8, 8), :], sem_row.at[1]
            ).start()
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

        # ---- LM head over the full padded vocab ----
        hfin = _ln_f32(x, lnf_g[0], lnf_b[0]).astype(cdt)
        for i in range(nt_lm):
            rel_ref[:, pl.ds(i * D, D)] = (
                qdot_lm(hfin, i) if dyn
                else qdot(hfin, ti0 + L * 12 + i)
            )

        # drain the last layer's write-back BEFORE the next step's slab
        # stream reads those rows
        pltpu.make_async_copy(
            krows, k_out.at[0, :, pl.ds(0, 8), :], sem_row.at[0]
        ).wait()
        pltpu.make_async_copy(
            vrows, v_out.at[0, :, pl.ds(0, 8), :], sem_row.at[1]
        ).wait()
        return 0

    jax.lax.fori_loop(0, K, step_body, 0)
    lout_ref[:, :] = rel_ref[:, :]


def semantic_chunk_fused_batched(
    cfg: GPTConfig,
    params,  # decode-prepared AND semantic-prepared
    logits,  # (B, n_out_vocab) f32
    k_cache,  # (L, B, S, D), aliased in -> out
    v_cache,
    ctx_len,  # i32 scalar (257): shared — semantic prompts are fixed-size
    g0,  # i32 scalar: global steps taken (== every ACTIVE lane's count)
    gum,  # (K*B8, v_pad) f32 HBM (make_gumbel_rows_batched)
    min_eos_p,  # f32 scalar
    *,
    K: int,
    temp: float,
    semantic_vocab_size: int,
    quant: bool = False,
    interpret: bool = False,
):
    """Run K batched semantic decode steps. Returns (toks (B, K) i32,
    flags (B, K) i32, logits_out (B, n_out_vocab) f32, k_cache, v_cache).
    Active lanes (count == g0) are token/flag-identical to the stepped
    batched loop; already-stopped lanes keep decoding with the SHARED
    n_past instead of their frozen one — unobservable, their out/count are
    frozen by the wrapper and their logits never read. quant=True:
    `params` is a decode-prepared qpack (+ dense wte tiles). A
    {"q": int8, "s": f32} cache pytree selects the int8-KV path."""
    L, D, S = cfg.n_layer, cfg.n_embd, cfg.block_size
    B = logits.shape[0]
    B8 = -(-B // 8) * 8
    kv_quant = isinstance(k_cache, dict)
    v_pad = _v_pad(cfg)
    nv = v_pad
    n_out = cfg.n_out_vocab
    blocks = params["blocks"]
    tiled = params["_decode_tiles"]
    wte_sem = params["_wte_sem"]
    nt_wte = wte_sem.shape[0]
    cdt = params["wpe"].dtype
    has_min = quant and "wte_m" in params
    sdt = jnp.dtype(blocks["proj_s"].dtype) if quant else jnp.dtype("float32")
    RW = wte_sem.shape[1]
    dyn = "_lp" in params  # injected by ensure_layer_params iff dyn enabled
    if kv_quant:
        kc, vc = k_cache["q"], v_cache["q"]  # (L, B, S, D) int8
        # dyn keeps the scale state (L, B, S) for traced-leading reads
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
    assert gum.shape == (K * B8, nv), (gum.shape, K, B8, nv)

    logits0 = jnp.pad(
        logits.astype(jnp.float32), ((0, 0), (0, nv - logits.shape[1]))
    )

    TP = max(128, -(-K // 128) * 128)
    kernel = functools.partial(
        _semantic_kernel_batched, cfg, B, B8, K, temp,
        semantic_vocab_size, nv, n_out, nt_wte, ring, kv_slots, kv_chunks,
        quant, has_min, kv_quant, dyn,
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
        pltpu.VMEM((B, nv), jnp.float32),  # rel
        pltpu.VMEM((B8, nv), jnp.float32),  # gumbel row group
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
        pltpu.VMEM((8, D), cdt),  # shared wpe window
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
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((_WRING,)))
    out_shape = [
        jax.ShapeDtypeStruct((B, TP), jnp.int32),
        jax.ShapeDtypeStruct((B, TP), jnp.int32),
        jax.ShapeDtypeStruct((B, nv), jnp.float32),
        jax.ShapeDtypeStruct(kc.shape, kc.dtype),
        jax.ShapeDtypeStruct(vc.shape, vc.dtype),
    ]
    out_specs = [vmem, vmem, vmem, hbm, hbm]
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
        [smem, smem, smem] + [vmem] * n_vm + [hbm] * (len(big) + 3)
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
    cache_in_idx = 3 + n_vm + len(big) + 3
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        input_output_aliases={cache_in_idx: 3, cache_in_idx + 1: 4},
        interpret=interpret,
        compiler_params=_compiler_params(vfit),
    )(
        jnp.reshape(ctx_len.astype(jnp.int32), (1, 1)),
        jnp.reshape(g0.astype(jnp.int32), (1, 1)),
        jnp.reshape(min_eos_p.astype(jnp.float32), (1, 1)),
        *small,
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        logits0,
        *big, wte_sem, params["wpe"], gum,
        *cache_inputs,
    )
    if kv_quant:
        toks, flags, lout, kc, vc, ks, vs = outs
        return (
            toks[:, :K], flags[:, :K], lout[:, :n_out],
            {"q": kc, "s": ks.reshape(L, B, S)},
            {"q": vc, "s": vs.reshape(L, B, S)},
        )
    toks, flags, lout, kc, vc = outs
    return toks[:, :K], flags[:, :K], lout[:, :n_out], kc, vc


def make_gumbel_rows_batched(
    subs_over, g0, K: int, n_out: int, v_pad: int, temp: float,
):
    """Per-(step, lane) gumbel rows for chunk steps g0..g0+K-1, laid out
    (K*B8, v_pad) so the kernel's per-step (B8, nv) row-group DMA is always
    8-row aligned (B8 = ceil8(B)). `subs_over` is (B, max_steps + K, 2) —
    jax.random.split is prefix-stable, so rows [:max_steps] are the stepped
    loop's subs_all and the overallocation only feeds steps whose samples
    are never observed."""
    B = subs_over.shape[0]
    B8 = -(-B // 8) * 8
    if temp == 0.0:
        return jnp.zeros((K * B8, v_pad), jnp.float32)
    sl = jax.lax.dynamic_slice(
        subs_over, (0, g0, 0), (B, K, 2)
    )  # (B, K, 2)
    g = jax.vmap(jax.vmap(
        lambda k: jax.random.gumbel(k, (n_out,), jnp.float32)
    ))(sl)  # (B, K, n_out)
    out = jnp.zeros((K, B8, v_pad), jnp.float32).at[
        :, :B, :n_out
    ].set(g.swapaxes(0, 1))
    return out.reshape(K * B8, v_pad)


def make_gumbel_rows(key, max_steps: int, n_out: int, v_pad: int, temp: float):
    """(msp8, v_pad) f32 HBM buffer of per-step gumbel rows from the SAME
    pre-split step keys the stepped loop uses — row i added to logits/temp
    reproduces `jax.random.categorical(subs[i], logits/temp)` bit-exactly.
    Zeros when temp == 0 (argmax path, no noise)."""
    msp8 = -(-max_steps // 8) * 8
    if temp == 0.0:
        return jnp.zeros((msp8, v_pad), jnp.float32)
    subs = jax.random.split(key, max_steps)
    g = jax.vmap(
        lambda k: jax.random.gumbel(k, (n_out,), jnp.float32)
    )(subs)  # (max_steps, n_out)
    return jnp.zeros((msp8, v_pad), jnp.float32).at[
        :max_steps, :n_out
    ].set(g)
