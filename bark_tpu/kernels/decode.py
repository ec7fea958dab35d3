"""Fused single-token GPT decode as one Pallas TPU kernel.

Why: autoregressive decode at batch=1 is pure HBM streaming — every step must
read all layer weights + the KV cache once. The XLA op-by-op path issues
~10 kernels per layer and reaches only ~25% of HBM bandwidth on a v5e; this
kernel runs the WHOLE decode step (all layers + LM head) as a single
pallas_call that manually double-buffers (D, D) weight tiles from HBM into
VMEM, so weight DMA runs back-to-back at full bandwidth while the MXU/VPU
chew the previous tile.

Design (one kernel invocation per token):
- weights live in HBM (`pltpu.ANY`); a (2, D, D) VMEM scratch ping-pongs
  tiles: qkv (3 tiles) -> proj (1) -> fc (4) -> out (4) per layer — an even
  12 tiles, so the ping-pong parity is static per unrolled tile slot — then
  the transposed LM head (v_pad/D tiles). Tile t+1's DMA is started before
  waiting on tile t.
- the KV cache stays in HBM, aliased input->output; the layer's (S, D) slab
  is DMA'd into VMEM for attention (prefetched during the previous layer's
  MLP), the fresh K/V row is patched into the VMEM copy and DMA'd back to
  HBM row `n_past` — the cache is never rewritten wholesale.
- attention avoids per-head matmul shapes and minor-dim reshapes with a
  constant head-segment matrix: scores(S,H) = (K*q)(S,D) @ seg(D,H),
  att_e(S,D) = att(S,H) @ segT(H,D), context = sum_s(att_e * V).
- numerics mirror models/gpt.py (f32 layernorm/softmax/logits, tanh GELU,
  params-dtype residual stream), so the kernel is a drop-in replacement for
  gpt.decode_step (same tokens at temp=0; float-tolerance elsewhere).

Replaces the reference's per-token ggml graph execution
(/root/reference/bark.cpp:1586-1643) — there a graph is rebuilt and
dispatched per token with host round-trips; here the whole step is one fused
device program living inside the stage's lax.scan/while_loop.
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


def _decode_kernel(
    cfg: GPTConfig,
    v_pad: int,
    quant: bool,  # weights are (int8 values, f32 block scales[, mins])
    has_min: bool,
    lm_tiles: tuple,  # (first, last+1) LM-head tile range to stream
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
      scratch: wtile [stile [mtile]] kbuf vbuf krow vrow
               sem_w [sem_s [sem_m]] sem_kv sem_row
    """
    it = iter(refs)
    np_ref, x_ref = next(it), next(it)
    ln1_g, ln1_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
    qkv_b, proj_b, fc_b, out_b = next(it), next(it), next(it), next(it)
    lnf_g, lnf_b = next(it), next(it)
    if quant:
        qkv_w, proj_w, fc_w, out_w, lm_t = (next(it) for _ in range(5))
        qkv_s, proj_s, fc_s, out_s, lm_s = (next(it) for _ in range(5))
        if has_min:
            qkv_m, proj_m, fc_m, out_m, lm_m = (next(it) for _ in range(5))
    else:
        qkv_w, proj_w, fc_w, out_w, lm_t = (next(it) for _ in range(5))
    k_hbm, v_hbm = next(it), next(it)
    logits_ref, k_out, v_out = next(it), next(it), next(it)
    wtile = next(it)
    if quant:
        stile = next(it)
        mtile = next(it) if has_min else None
    kbuf, vbuf, krow, vrow = next(it), next(it), next(it), next(it)
    sem_w = next(it)
    if quant:
        sem_s = next(it)
        sem_m = next(it) if has_min else None
    sem_kv, sem_row = next(it), next(it)

    L, D, S, H = cfg.n_layer, cfg.n_embd, cfg.block_size, cfg.n_head
    hd = D // H
    B = D // 32  # scale rows per (D, D) tile
    nt_qkv, nt_fc, nt_out = 3, 4, 4
    lm_t0, lm_t1 = lm_tiles
    n_past = np_ref[0, 0]
    cdt = x_ref.dtype  # compute/params dtype (bf16 or f32)

    # tile t (0..11) of layer l -> (D, D) HBM value source (+ scale source)
    def tile_src(l, t: int):
        if t < nt_qkv:
            return qkv_w.at[l, :, pl.ds(t * D, D)]
        if t == nt_qkv:
            return proj_w.at[l]
        if t < nt_qkv + 1 + nt_fc:
            j = t - nt_qkv - 1
            return fc_w.at[l, :, pl.ds(j * D, D)]
        j = t - nt_qkv - 1 - nt_fc
        return out_w.at[l, pl.ds(j * D, D), :]

    def scale_src(ref, l, t: int):
        if t < nt_qkv:
            return ref[0].at[l, :, pl.ds(t * D, D)]
        if t == nt_qkv:
            return ref[1].at[l]
        if t < nt_qkv + 1 + nt_fc:
            j = t - nt_qkv - 1
            return ref[2].at[l, :, pl.ds(j * D, D)]
        j = t - nt_qkv - 1 - nt_fc
        return ref[3].at[l, pl.ds(j * B, B), :]

    s_refs = (qkv_s, proj_s, fc_s, out_s) if quant else None
    m_refs = (qkv_m, proj_m, fc_m, out_m) if quant and has_min else None

    def start_tile(parity: int, src, ssrc=None, msrc=None):
        pltpu.make_async_copy(src, wtile.at[parity], sem_w.at[parity]).start()
        if quant:
            pltpu.make_async_copy(
                ssrc, stile.at[parity], sem_s.at[parity]
            ).start()
            if has_min:
                pltpu.make_async_copy(
                    msrc, mtile.at[parity], sem_m.at[parity]
                ).start()

    def start_layer_tile(parity: int, l, t: int):
        start_tile(
            parity,
            tile_src(l, t),
            scale_src(s_refs, l, t) if quant else None,
            scale_src(m_refs, l, t) if quant and has_min else None,
        )

    def start_lm_tile(parity: int, j: int):
        start_tile(
            parity,
            lm_t.at[:, pl.ds(j * D, D)],
            lm_s.at[:, pl.ds(j * D, D)] if quant else None,
            lm_m.at[:, pl.ds(j * D, D)] if quant and has_min else None,
        )

    def wait_tile(parity: int):
        pltpu.make_async_copy(
            tile_src(0, 0), wtile.at[parity], sem_w.at[parity]
        ).wait()
        if not quant:
            return wtile[parity]
        pltpu.make_async_copy(
            scale_src(s_refs, 0, 0), stile.at[parity], sem_s.at[parity]
        ).wait()
        sc = jnp.broadcast_to(
            stile[parity][:, None, :], (B, 32, D)
        ).reshape(D, D)
        w = wtile[parity].astype(jnp.float32) * sc
        if has_min:
            pltpu.make_async_copy(
                scale_src(m_refs, 0, 0), mtile.at[parity], sem_m.at[parity]
            ).wait()
            w = w + jnp.broadcast_to(
                mtile[parity][:, None, :], (B, 32, D)
            ).reshape(D, D)
        return w.astype(cdt)

    def start_kv(l):
        pltpu.make_async_copy(k_hbm.at[l], kbuf, sem_kv.at[0]).start()
        pltpu.make_async_copy(v_hbm.at[l], vbuf, sem_kv.at[1]).start()

    def wait_kv():
        pltpu.make_async_copy(k_hbm.at[0], kbuf, sem_kv.at[0]).wait()
        pltpu.make_async_copy(v_hbm.at[0], vbuf, sem_kv.at[1]).wait()

    def wait_rows():
        pltpu.make_async_copy(
            krow, k_out.at[0, pl.ds(0, 8), :], sem_row.at[0]
        ).wait()
        pltpu.make_async_copy(
            vrow, v_out.at[0, pl.ds(0, 8), :], sem_row.at[1]
        ).wait()

    # head-segment constants: seg[d, h] = (d // hd == h)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    seg = (d_ids == h_ids).astype(cdt)  # (D, H)
    seg_t = seg.T  # (H, D)

    slot = jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
    live = slot <= n_past  # this token occupies slot n_past
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    row8_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    # warm-up: first weight tile + layer-0 KV slab
    start_layer_tile(0, 0, 0)
    start_kv(0)

    def layer_body(l, x):
        # ---- attention: ln1 -> qkv -> cache update -> softmax(QK)V -> proj
        x1 = _ln_f32(x, ln1_g[l], ln1_b[l]).astype(cdt)
        qkv_parts = []
        for t in range(nt_qkv):  # tiles 0..2, parity == t % 2
            nxt = t + 1
            start_layer_tile(nxt % 2, l, nxt)
            w = wait_tile(t % 2)
            qkv_parts.append(
                _dot(x1, w) + qkv_b[l, pl.ds(t * D, D)].astype(jnp.float32)
            )
        q = (qkv_parts[0] * (1.0 / np.sqrt(hd))).astype(cdt)  # (1, D)
        k_new = qkv_parts[1].astype(cdt)
        v_new = qkv_parts[2].astype(cdt)

        # write the fresh K/V row back to the HBM cache. DMA slices along the
        # cache's sublane dim must be 8-row aligned, so write an aligned
        # 8-row window: the 7 neighbor rows are rewritten with the values
        # just fetched into the VMEM slab (identical bytes).
        if l > 0:
            wait_rows()
        wait_kv()
        base8 = pl.multiple_of((n_past // 8) * 8, 8)
        in_win = row8_ids == (n_past - base8)  # (8, 1)
        krow[:] = jnp.where(in_win, k_new, kbuf[pl.ds(base8, 8), :])
        vrow[:] = jnp.where(in_win, v_new, vbuf[pl.ds(base8, 8), :])
        pltpu.make_async_copy(
            krow, k_out.at[l, pl.ds(base8, 8), :], sem_row.at[0]
        ).start()
        pltpu.make_async_copy(
            vrow, v_out.at[l, pl.ds(base8, 8), :], sem_row.at[1]
        ).start()

        # the fresh row is folded in with a masked select instead of a
        # dynamic-row VMEM store (unaligned sublane stores are not provable
        # for Mosaic); rows > n_past are masked out of the softmax anyway
        is_new = row_ids == n_past  # (S, 1)
        k_all = jnp.where(is_new, k_new, kbuf[:])  # (S, D)
        v_all = jnp.where(is_new, v_new, vbuf[:])
        prod = (k_all * q).astype(cdt)  # (S, D)
        scores = _dot(prod, seg)  # (S, H) f32: per-head sums
        scores = jnp.where(live, scores, jnp.float32(-1e9))
        att = jax.nn.softmax(scores, axis=0)  # over slots
        att_e = _dot(att.astype(cdt), seg_t).astype(cdt)  # (S, D)
        ctxv = (att_e * v_all).astype(jnp.float32).sum(
            axis=0, keepdims=True
        )  # (1, D)

        # prefetch next layer's KV slab while the MLP streams weights
        if l + 1 < L:
            start_kv(l + 1)

        # proj: tile 3 (parity 1), started by the qkv loop's last iteration
        start_layer_tile(0, l, 4)
        w = wait_tile(1)
        proj = _dot(ctxv.astype(cdt), w) + proj_b[l].astype(jnp.float32)
        x = (x.astype(jnp.float32) + proj).astype(cdt)

        # ---- MLP: ln2 -> fc (gelu) -> out
        x2 = _ln_f32(x, ln2_g[l], ln2_b[l]).astype(cdt)
        h_parts = []
        for t in range(nt_fc):  # tiles 4..7, parity == t % 2
            start_layer_tile((t + 1) % 2, l, 4 + t + 1)
            w = wait_tile(t % 2)
            h_parts.append(
                _dot(x2, w) + fc_b[l, pl.ds(t * D, D)].astype(jnp.float32)
            )
        h = [jax.nn.gelu(p, approximate=True).astype(cdt) for p in h_parts]

        acc = out_b[l].astype(jnp.float32)
        for t in range(nt_out):  # tiles 8..11, parity == t % 2
            if t + 1 < nt_out:
                start_layer_tile((t + 1) % 2, l, 8 + t + 1)
            else:
                # last tile of the layer: prefetch the next layer's tile 0
                # (parity 0 again: 12 tiles/layer keeps parity aligned) or
                # the first LM-head tile
                if l + 1 < L:
                    start_layer_tile(0, l + 1, 0)
                else:
                    start_lm_tile(0, lm_t0)

            w = wait_tile(t % 2)
            acc = acc + _dot(h[t], w)
        x = (x.astype(jnp.float32) + acc).astype(cdt)
        return x

    # layers unrolled in Python: VMEM loads with a traced layer index would
    # need dynamic-sublane-alignment proofs Mosaic can't make
    x = x_ref[:]
    for l in range(L):
        x = layer_body(l, x)

    # ---- final LN + LM head, streaming only tiles [lm_t0, lm_t1): a stage
    # whose sampler reads a logits sub-range (the coarse codebook windows)
    # skips the rest of the head entirely; untouched logits stay zero
    if lm_t0 > 0 or lm_t1 < v_pad // D:
        logits_ref[:] = jnp.zeros((1, v_pad), jnp.float32)
    hfin = _ln_f32(x, lnf_g[0], lnf_b[0]).astype(cdt)
    for i, j in enumerate(range(lm_t0, lm_t1)):  # parity == i % 2
        if j + 1 < lm_t1:
            start_lm_tile((i + 1) % 2, j + 1)
        w = wait_tile(i % 2)
        logits_ref[0, pl.ds(j * D, D)] = _dot(hfin, w)[0]

    # drain the last KV row write-back before the kernel retires
    wait_rows()


def _v_pad(cfg: GPTConfig) -> int:
    return -(-cfg.n_out_vocab // cfg.n_embd) * cfg.n_embd


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

    if quant:
        big_inputs = [
            blocks["qkv_q"], blocks["proj_q"], blocks["fc_q"], blocks["out_q"],
            params["lm_q"],
            blocks["qkv_s"], blocks["proj_s"], blocks["fc_s"], blocks["out_s"],
            params["lm_s"],
        ]
        if has_min:
            big_inputs += [
                blocks["qkv_m"], blocks["proj_m"], blocks["fc_m"],
                blocks["out_m"], params["lm_m"],
            ]
    else:
        # (D, v_pad) transposed LM head, zero-padded tail. Loop-invariant
        # w.r.t. the surrounding scan/while_loop, so XLA hoists it.
        lm = params["lm_head"][0]  # (V, D)
        lm_t = (
            jnp.zeros((D, v_pad), lm.dtype)
            .at[:, : cfg.n_out_vocab]
            .set(lm.T)
        )
        big_inputs = [
            blocks["qkv_w"], blocks["proj_w"], blocks["fc_w"],
            blocks["out_w"], lm_t,
        ]

    kc = k_cache.reshape(L, S, D)
    vc = v_cache.reshape(L, S, D)
    np_arr = jnp.reshape(n_past.astype(jnp.int32), (1, 1))

    if lm_window is None:
        lm_tiles = (0, v_pad // D)
    else:
        lo, hi = lm_window
        lm_tiles = (lo // D, -(-min(hi, v_pad) // D))
    kernel = functools.partial(
        _decode_kernel, cfg, v_pad, quant, has_min, lm_tiles
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
    scratch = [pltpu.VMEM((2, D, D), jnp.int8 if quant else cdt)]
    if quant:
        scratch.append(pltpu.VMEM((2, D // 32, D), jnp.float32))
        if has_min:
            scratch.append(pltpu.VMEM((2, D // 32, D), jnp.float32))
    scratch += [
        pltpu.VMEM((S, D), kc.dtype),
        pltpu.VMEM((S, D), vc.dtype),
        pltpu.VMEM((8, D), kc.dtype),
        pltpu.VMEM((8, D), vc.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
        if has_min:
            scratch.append(pltpu.SemaphoreType.DMA((2,)))
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
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
        return functools.partial(gpt.decode_step, cfg)
    return functools.partial(
        decode_step_fused, cfg, quant=quant, lm_window=lm_window,
        interpret=not on_tpu,
    )
