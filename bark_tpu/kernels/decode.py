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
import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bark_tpu.models.gpt import EPS_NORM, GPTConfig

# Legacy planner budget under XLA's default 16 MB scoped-vmem window
# (BARK_TPU_VMEM_LIMIT_MB=0); the live budget is _depth_budget()
_VMEM_BUDGET = 14 * 2**20


# a modeled-VMEM total at or below this fits XLA's 16 MiB default window
# with room for Mosaic's compiled stack (measured r3/r4: ~4.2 MB at
# bark-large multi-step depth on top of the modeled buffers — which
# already carry _MULTISTEP_STACK_MARGIN; small-shape kernels fit with
# room). Batched kernels get a tighter bound: their B-way-unrolled lane
# loops give Mosaic scheduling freedom that keeps several lanes'
# attention temporaries live at once.
_FIT_DEFAULT = 11 * 2**20
_FIT_DEFAULT_B = 10 * 2**20


def _compiler_params(fits_default: bool = False):
    """CompilerParams for the big streaming kernels, raising the
    per-kernel scoped-VMEM limit ONLY when the kernel needs it.

    XLA's default scoped-vmem limit is 16 MiB, but a v5e core has 128 MiB
    of physical VMEM — and Mosaic's compiled STACK for deeply-unrolled
    multi-step/prefill bodies rides on top of the modeled buffers (measured
    r3/r4: bark-large semantic chunk 12.07 MB modeled -> 16.23 MB real;
    bark-large T=1024 prefill 18.01 MB real vs the 16 MB limit, killing
    the whole coarse stage compile). Raising the limit per kernel keeps
    those production shapes compiling without shrinking the DMA rings the
    planners picked — but raising it on kernels that DON'T need it is a
    measured ~15-20% runtime loss at bark-small (seq4 r4: RTF 0.063 under
    the 16 MiB default vs 0.073-0.082 with a blanket 64 MiB request;
    Mosaic schedules against the whole window). The VMEM planners run two
    passes — default-window plans first — and report `fits_default`;
    callers pass it here so only overflow shapes (bark-large) raise.
    BARK_TPU_VMEM_LIMIT_MB overrides the raised value (0 = never raise)."""
    mb = int(os.environ.get("BARK_TPU_VMEM_LIMIT_MB", "64"))
    if mb <= 0 or fits_default:
        return pltpu.CompilerParams(has_side_effects=True)
    return pltpu.CompilerParams(
        has_side_effects=True, vmem_limit_bytes=mb * 2**20
    )

# perf-diagnosis knob (wrong numerics when flipped): skip the row-scale
# folding in the int8-KV path to isolate cast cost from scale-handling cost
_KV_DEBUG_NO_SCALE = False

# Probe-only ablations (WRONG numerics when set) for the single-lane
# decode kernel: split a decode step's serial time on hardware
# (tools/tpu_decode_bench.py A/Bs these). "att" replaces the attention
# math with ctx := q (KV slab DMA still runs and is still waited on);
# "kvdma" additionally drops the KV slab stream entirely, leaving only
# the weight stream + dots + LN/GELU chain.
_PROBE_ABLATE = frozenset(
    p for p in os.environ.get("BARK_TPU_PROBE_ABLATE", "").split(",") if p
)


def _att_qhead() -> bool:
    """Score dots via a dim1xdim1 dot_general against a (H, D) q-head
    matrix built with a row-broadcast multiply — kills `_attend_lane`'s
    (D, 1) f32 lane->sublane q transpose and the (D, H) qseg build
    (Mosaic inserts a relayout for minor-dim insertion; probe P9
    validated the transposed dot_general on v5e). Same per-element
    contraction sums, so tokens match the legacy path."""
    return os.environ.get("BARK_TPU_ATT_QHEAD", "0") == "1"


_GATE_AUTO_MAX_D = 768


def _att_gate(D: int | None = None) -> bool:
    """Gate the attention score/context MXU dots by live KV chunks, like
    the slab DMA gating: rows past n_past are select-masked anyway, so a
    chunk that is entirely beyond n_past can skip its (KC, D) x (D, H)
    and (H, KC) x (KC, D) dots — early in a stage only ~half the padded
    cache is live. Value-returning lax.cond inside the kernel.

    BARK_TPU_ATT_GATE: "1" always, "0" never, unset/"auto" = on for
    single-lane kernels of models with n_embd <= 768 — measured on v5e
    (seq15 r5): bark-small coarse step 0.179 gated vs 0.192, e2e 0.0634
    vs 0.0642 (twice); bark-large SEMANTIC step regressed (0.949 vs
    0.936), so D=1024 stays ungated. Batched call sites pass D=None
    (auto-off there: unmeasured; env "1" still forces them on)."""
    env = os.environ.get("BARK_TPU_ATT_GATE", "auto")
    if env in ("auto", ""):
        return D is not None and D <= _GATE_AUTO_MAX_D
    return env == "1"


def _group_dots() -> bool:
    """Fuse the per-layer weight dots into group dots (BARK_TPU_GROUP_DOTS):
    qkv's 3 tiles as ONE (1, D) x (3D, D) dim1xdim1 dot on the contiguous
    multi-slot ring view (transposed tile content, probe P9), fc's 4
    likewise, and out's 4 as one standard (1, 4D) @ (4D, D) dot — 12
    serial MXU ops per layer drop to 4. Dense kernels only (the packed
    path's per-tile dequant would need a (gD, D) VPU concat that costs
    more than the op fusion saves). seq12 ablations put the target: the
    decode step runs ~0.13 ms/token of serial non-attention compute above
    the HBM floor at bark-large."""
    return os.environ.get("BARK_TPU_GROUP_DOTS", "0") == "1"


def _att_gate_chunks(S: int, D: int | None = None) -> int:
    """Compute-gate chunk count for an (S, D) slab: 256-row chunks when
    the gate is on and S divides cleanly."""
    if not _att_gate(D) or S % 256 or S < 512:
        return 1
    return S // 256


def _gate_for(S: int, kv_chunks: int, D: int | None = None) -> int:
    """Compute-gate chunk count honoring an existing DMA gating: when the
    slab DMA streams in kv_chunks > 1 gated chunks, the compute gate MUST
    align to them (a live compute chunk then only spans streamed-or-
    zfilled rows — misaligned chunks could put never-streamed junk rows,
    possibly NaN, inside a live context dot). Ungated slabs (kv_chunks=1,
    the single-lane default: the whole slab is always streamed) are safe
    at any granularity, so the 256-row default applies. The gate grouping
    changes ctx_h's f32 accumulation grouping, so every single-lane path
    must pick the SAME chunk count for the fused-vs-stepped token-equality
    contract to hold — all three call sites route through here."""
    if not _att_gate(D):
        return 1
    if kv_chunks > 1:
        return kv_chunks
    return _att_gate_chunks(S, D)


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


def _doti(a, b):
    """int8 x int8 -> int32 dot (MXU int path; exact integer accumulate).

    Precision is pinned to DEFAULT: integer accumulation is already exact,
    and inheriting jax_default_matmul_precision=highest (which parity
    tools set for the FLOAT checks) lowers to an fp32 contract precision
    Mosaic rejects on int8 operands ("Bad lhs type", measured r3)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dot_t(a, b):
    """a (M, D) x b (N, D) -> (M, N) f32: dim1 x dim1 contraction (both
    operands row-major over the contracted dim; probe P9)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _doti_t(a, b):
    """int8 dim1 x dim1 dot (see _doti for the precision pin)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _f16_bits_to_f32(u):
    """i32 tensor of u16 f16 bit patterns -> exact f32 (finite values;
    scales are finite by construction — an inf/NaN scale fails the loader's
    lossless check and falls back to f32). Mosaic cannot compile the f16
    dtype itself (measured r3: even a trivial f16 DMA+convert kernel fails
    to compile), so f16 scale streams ship as int16 and are decoded here
    with integer ops: a normal f16's value is bit-exactly representable as
    f32 bits [sign | e-15+127 | m << 13]; subnormals are m * 2^-24."""
    e = (u >> 10) & 31
    m = u & 1023
    f_norm = jax.lax.bitcast_convert_type(
        ((e - 15 + 127) << 23) | (m << 13), jnp.float32
    )
    f_sub = m.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    v = jnp.where(e == 0, f_sub, f_norm)
    return jnp.where((u >> 15) & 1 == 1, -v, v)


def _stile_f32(x):
    """VMEM scale block -> f32 (int16 blocks are f16 bit patterns)."""
    if x.dtype == jnp.int16:
        return _f16_bits_to_f32(x.astype(jnp.int32) & 0xFFFF)
    return x.astype(jnp.float32)


def _pick_split(cfg: GPTConfig, quant: bool, has_min: bool, itemsize: int,
                s_itemsize: int = 4) -> int:
    """Row-split factor for the weight-tile stream.

    A (D, D) tile is streamed as `split` contiguous row sub-tiles of
    (D/split, D); x @ W becomes a sum of half-dots (different f32
    summation grouping, within the kernel's float tolerance). Halving the
    per-slot VMEM lets `_pick_depths` choose a ~2x deeper ring — at
    24L/1024D (bark-large dense bf16, 2 MB tiles) the un-split ring only
    fits 3 slots (2 DMAs in flight); split tiles fit 6.

    MEASURED r3 (large coarse, v5e): split=2/ring=6 is 0.852 ms/token vs
    split=1/ring=3 at 0.843 — queue depth is NOT the binding constraint
    at 1-2 MB tiles, so the default stays 1 everywhere. The path is kept
    (hardware-validated token equality) for shapes where it may win;
    opt in with BARK_TPU_TILE_SPLIT=2.
    """
    import os

    env = os.environ.get("BARK_TPU_TILE_SPLIT", "")
    if env:
        return max(1, int(env))
    return 1


def _pick_wqueues() -> int:
    """Parallel weight-stream chains (BARK_TPU_W_QUEUES, default 1).

    The single weight-tile chain plateaus at ~690 GB/s on v5e while the
    KV slabs stream concurrently on spare HBM bandwidth — evidence the
    chain is DMA-queue-limited, not HBM-limited. With N > 1 the tile
    schedule interleaves over N semaphore groups so Mosaic can issue the
    copies on independent queues; consumption order (and numerics) is
    unchanged. Experiment knob until tools/tpu_dma_probe --dual
    establishes the win; default stays 1."""
    env = os.environ.get("BARK_TPU_W_QUEUES", "")
    return max(1, min(4, int(env))) if env.isdigit() else 1


def _pick_kv_chunks(S: int, batched: bool = False) -> int:
    """Chunk count for the gated KV slab stream.

    The KV cache is allocated at the full context length S, but a decode
    step only ever attends rows [0, n_past] — slabs can stream in NC row
    chunks of S/NC rows each, and chunks whose start exceeds n_past are
    never DMAed. Rows past n_past get exactly-zero attention weight (exp
    underflow after the -1e9 mask), so skipping their bytes cannot change
    the result — the dead V region is zero-filled once per kernel call so
    the full-(S, D) attention dot sees 0*0 instead of 0*<uninitialized
    VMEM bits, possibly NaN> (0*NaN would poison the context row).

    MEASURED (v5e, bark-large coarse, r3): at B=1 gating is a no-op even
    when 3 of 4 chunks are dead (0.872 gated vs 0.865 ungated ms/token at
    n_past=10; 0.838 vs 0.833 at n_past~450) — the weight-tile stream is
    the critical path at ~690 GB/s and the KV slabs ride entirely on the
    spare HBM bandwidth, so skipped KV bytes buy nothing. Single-lane
    default is therefore UNGATED (1 chunk). The batched kernel keeps
    256-row gating: at B lanes the per-lane slabs dominate step traffic
    (bark-small B=8: ~288 MB KV vs ~145 MB weights) and the KV stream IS
    the critical path. BARK_TPU_KV_CHUNKS overrides either default.
    """
    env = os.environ.get("BARK_TPU_KV_CHUNKS", "")
    if env:
        nc = max(1, int(env))
        return nc if S % nc == 0 else 1
    if batched and S >= 512 and S % 256 == 0:
        return S // 256
    return 1


# Multi-step kernels (kernels/window.py, kernels/semantic.py) carry VMEM
# the single-step model below doesn't: sampling buffers sized by the vocab
# plus Mosaic's compiled stack for the step loop (measured on v5e: the
# bark-large semantic chunk kernel at ring=3/kv_slots=1 — modeled 12.07 MB
# — hit the 16 MB scoped-vmem hardware limit at 16.23 MB). Callers pass
# their exact extra buffer bytes + this stack margin via `extra_bytes`.
_MULTISTEP_STACK_MARGIN = 2 * 2**20


def _depth_budget(batched: bool = False) -> int:
    """Planner budget derived from the per-kernel scoped-VMEM limit
    (_compiler_params): the limit minus a compiled-stack margin (measured
    r3/r4: ~4.2 MB at bark-large multi-step depth; doubled for headroom,
    and doubled again for the batched kernels whose B-way-unrolled lane
    loops give Mosaic scheduling freedom that keeps several lanes'
    attention temporaries live at once). Under the old 16 MiB default this
    reduces to the conservative r2/r3 budgets — which forced bark-large's
    multi-step kernels down to ring=2/kv_slots=1 (ONE weight DMA in
    flight) and cost ~0.3-0.5 ms/token of pure DMA-issue stalls (measured
    r4: stage 1.18-1.40 ms/tok vs the 0.84 raw chain at ring 3)."""
    mb = int(os.environ.get("BARK_TPU_VMEM_LIMIT_MB", "64"))
    if mb <= 0:
        return (10 * 2**20) if batched else _VMEM_BUDGET
    return mb * 2**20 - (16 if batched else 8) * 2**20


def _pick_depths(cfg: GPTConfig, quant: bool, has_min: bool, itemsize: int,
                 kv_quant: bool = False, s_itemsize: int = 4,
                 split: int = 1, extra_bytes: int = 0,
                 w_itemsize: int = 0):
    """(ring, kv_slots, fits_default) fitting the VMEM budget; prefer a
    deeper tile ring (DMA issue latency is the constraint), then earlier
    KV prefetch. `fits_default` (did the plan fit XLA's 16 MiB default
    scoped-vmem window?) feeds `_compiler_params` so only kernels that
    overflow the default request a raised limit.

    `itemsize` prices the KV slabs (the cache dtype); `w_itemsize` prices
    the weight-tile ring (the params dtype). They differ under int8-KV
    with dense bf16 weights — pricing tiles at the cache itemsize modeled
    the large kv8 ring at HALF its real size and produced a plan whose
    real stack sat at 16.00 MB exactly (seq15 r5: +24 KB of gate stack
    tipped it into the compile-OOM class)."""
    D, S, L = cfg.n_embd, cfg.block_size, cfg.n_layer
    tile = D * D * (1 if quant else (w_itemsize or itemsize))
    if quant:
        tile += (D // 32) * D * s_itemsize * (2 if has_min else 1)
    tile //= split
    kv = 2 * S * D * itemsize  # K + V slab per slot
    fixed = (
        2 * L * 8 * D * itemsize  # krows/vrows
        + L * (3 + 1 + 4 + 1 + 4) * D * 4  # biases/ln as f32 upper bound
        + 16 * D * 4  # x / hfin / small temporaries
        + (-(-cfg.n_out_vocab // D)) * D * 4  # logits row
    )
    if kv_quant:
        fixed += 4 * L * S * 4  # (L, S) f32 row scales, k/v x in/out
    # NOTE the gated attention form (BARK_TPU_ATT_GATE) adds a few tens
    # of KB of real cond-closure stack on top of the model; the ~5 MB
    # real-stack slack behind the 11 MB proxy budget absorbs it. (A
    # trial 512 KB explicit gate margin here demoted the bark-small
    # semantic plan off its measured-best depths and cost ~6% e2e —
    # perf/r5/seq16.log; the honest w_itemsize pricing is what actually
    # fixed the seq15 overflow class.)
    # split=1 keeps the r2-measured candidate order (bark-small's proven
    # config); split>1 exists to buy DEEP rings, so those candidates lead
    if split > 1:
        candidates = ((8, 2), (8, 1), (6, 2), (6, 1), (5, 1),
                      (4, 2), (4, 1), (3, 1), (2, 1))
    else:
        candidates = ((4, 2), (4, 1), (3, 1), (2, 1))
    # BARK_TPU_RING=r forces the tile-ring depth (experiment knob — the
    # r4 --dot probe showed per-tile MXU consumption costs ~24% of the
    # stream at 1 MB tiles with ring 4 but hides at ring 8; the raised
    # scoped-vmem window a deep ring usually needs costs ~15-20%, so the
    # net is an on-chip A/B, not a calculation)
    renv = os.environ.get("BARK_TPU_RING", "")
    if renv.isdigit() and int(renv) >= 2:
        r = int(renv)
        candidates = tuple(
            (r, s) for s in sorted({s for _, s in candidates}, reverse=True)
        )
    # pass 1: plans that fit XLA's DEFAULT scoped-vmem window (no raised
    # limit — a raised limit on kernels that don't need it is a measured
    # ~15-20% runtime loss at bark-small, seq4 r4); pass 2: the raised
    # budget for shapes (bark-large) whose real usage overflows the
    # default window even at minimal depths (the r3 compile-OOM class)
    for budget, fits in ((_FIT_DEFAULT, True), (_depth_budget(), False)):
        for ring, kv_slots in candidates:
            need = fixed + ring * tile + kv_slots * kv + extra_bytes
            if need <= budget:
                _vmem_debug("pick_depths", cfg, ring, kv_slots, need, fits)
                return ring, kv_slots, fits
    _vmem_debug("pick_depths", cfg, 2, 1, -1, False)
    return 2, 1, False


def _vmem_debug(which, cfg, ring, kv_slots, modeled, fits):
    """BARK_TPU_VMEM_DEBUG=1: log every VMEM plan decision (which pass a
    kernel took decides whether it compiles under XLA's default 16 MiB
    scoped-vmem window or requests the raised limit — the difference
    between the r4 compile-OOM class and the r4 perf-regression class)."""
    if os.environ.get("BARK_TPU_VMEM_DEBUG", "") == "1":
        print(
            f"[vmem-plan] {which} L={cfg.n_layer} D={cfg.n_embd}: "
            f"ring={ring} kv_slots={kv_slots} modeled={modeled/2**20:.2f}MB "
            f"fits_default={fits}",
            file=sys.stderr,
        )


def _weight_sources(L, D, lm_count, w_refs, s_refs, lm_refs, split=1):
    """Flat weight-tile schedule: 12 tiles per layer, then the LM tiles.

    Each entry is (value source, scale source); every source is a
    CONTIGUOUS (D, D) / (R, D) HBM block (the caller pre-tiles the
    column-split weights — a column slice of a row-major (D, 3D) array
    would DMA in 2*D-byte strided chunks and throttle far below HBM
    bandwidth). Layout per layer: qkv (L,3,D,D) and fc (L,4,D,D) pre-tiled,
    proj (L,D,D), out (L,4D,D) row-sliced (already contiguous). Scale trees
    are all pre-tiled with R rows per tile, where R = Bs for symmetric
    formats and 2*Bs for offset formats (mins packed below the scales,
    _build_decode_tiles) so each tile needs exactly two DMA streams.

    With `split` > 1 every logical tile streams as `split` contiguous ROW
    sub-tiles of (D/split, D) — row slices of the pre-tiled blocks stay
    contiguous, so no extra relayout is needed; only the offset formats'
    scales+mins packing is interleaved per sub-tile (_build_decode_tiles)
    so each sub-tile still needs exactly two DMA streams (schedule order:
    sub-tiles of a tile are consecutive, so logical tile j occupies
    schedule slots [j*split, (j+1)*split))."""

    def _sel(refs4, l, t, k, value):
        if refs4 is None:
            return None
        if value:
            rows, off = D // split, (t - 8) * D if t >= 8 else 0
        else:
            # scale rows per LOGICAL tile: R (= Bs or 2*Bs, layout-packed);
            # every scale tree is pre-tiled with R on the -2 axis
            R = (refs4[0].shape[-2] if t < 3 else
                 refs4[1].shape[-2] if t == 3 else
                 refs4[2].shape[-2] if t < 8 else refs4[3].shape[-2])
            rows, off = R // split, 0
        r = pl.ds(off + k * rows, rows)
        if t < 3:
            return refs4[0].at[l, t, r, :]
        if t == 3:
            return refs4[1].at[l, r, :]
        if t < 8:
            return refs4[2].at[l, t - 4, r, :]
        if value:
            return refs4[3].at[l, r, :]  # out values are (L, 4D, D)
        return refs4[3].at[l, t - 8, r, :]  # out scales (L, 4, R, D)

    sources = []
    for l in range(L):
        for t in range(12):
            for k in range(split):
                sources.append((
                    _sel(w_refs, l, t, k, True),
                    _sel(s_refs, l, t, k, False),
                ))
    lm_t, lm_s = lm_refs
    rows = D // split
    srows = None if lm_s is None else lm_s.shape[-2] // split
    for i in range(lm_count):
        # the LM head is pre-tiled (n_used_tiles, D, D), already sliced to
        # the streamed window
        for k in range(split):
            sources.append((
                lm_t.at[i, pl.ds(k * rows, rows), :],
                lm_s.at[i, pl.ds(k * srows, srows), :]
                if lm_s is not None else None,
            ))
    return sources


def _tile_stream(sources, ring, quant, has_min, wtile, stile,
                 sem_w, sem_s, D, Bs, cdt, split=1, queues=1):
    """(start, qdot) over the flat sub-tile schedule with a ring-buffered
    VMEM scratch: consuming sub-tile i starts sub-tile i+ring-1 and waits
    sub-tile i, keeping ring-1 DMAs in flight; quantized tiles are
    dequantized in VMEM.

    qdot(x, j) computes x @ W_j for LOGICAL tile j (the (D, D) projection
    block): with split>1 it sums `split` row-sub-tile dots, slicing x's
    lane dim per sub-tile — a different f32 summation grouping than the
    single dot, within the kernel's float tolerance.

    Offset formats ship each sub-tile's mins packed below its scales in
    the SAME block (one DMA — a third per-tile stream measured ~30% of a
    packed decode step in issue latency, q4_k vs q8_0 on v5e). Mins are
    NOT folded into the tile: the broadcast+reshape relayout plus the add
    are pure VPU cost; the min contribution is exact rank-1-per-block and
    is added post-dot (x @ (m broadcast) == blocksums(x) @ m).
    Scales/mins may stream as f16 (lossless for the non-k formats,
    io/loader._scales_f16_lossless) — upcast to f32 before the dequant
    arithmetic, which keeps it bit-identical to dequantize-at-load."""
    Dsub = D // split
    Ss = Bs // split  # scale rows per sub-tile
    blk = _block_seg(Dsub, cdt) if (quant and has_min) else None

    def _semw(i, slot):
        return sem_w.at[i % queues, slot] if queues > 1 else sem_w.at[slot]

    def _sems(i, slot):
        return sem_s.at[i % queues, slot] if queues > 1 else sem_s.at[slot]

    def start(i: int):
        if i >= len(sources):
            return
        w, s = sources[i]
        slot = i % ring
        pltpu.make_async_copy(w, wtile.at[slot], _semw(i, slot)).start()
        if quant:
            pltpu.make_async_copy(s, stile.at[slot], _sems(i, slot)).start()

    def consume(i: int):
        """-> (sub-tile (Dsub, D) cdt, mins (Ss, D) f32 or None)."""
        start(i + ring - 1)
        slot = i % ring
        pltpu.make_async_copy(
            sources[i][0], wtile.at[slot], _semw(i, slot)
        ).wait()
        if not quant:
            return wtile[slot], None
        pltpu.make_async_copy(
            sources[i][1], stile.at[slot], _sems(i, slot)
        ).wait()
        sc = jnp.broadcast_to(
            _stile_f32(stile[slot][:Ss])[:, None, :], (Ss, 32, D)
        ).reshape(Dsub, D)
        w = (wtile[slot].astype(jnp.float32) * sc).astype(cdt)
        if has_min:
            return w, _stile_f32(stile[slot][Ss:])
        return w, None

    def qdot(x, j: int):
        """x ([B,] D) @ logical tile j -> ([B,] D) f32."""
        out = None
        for k in range(split):
            xk = x[:, k * Dsub : (k + 1) * Dsub] if split > 1 else x
            part = _qdot(xk, consume(j * split + k), blk)
            out = part if out is None else out + part
        return out

    def _wait_group(j0, g):
        """Wait tiles [j0, j0+g), then return the contiguous slot runs
        [(slot0, len), ...] (a group wraps the ring at most once).

        Prefetch order matters: the per-tile consume starts tile i+ring-1
        as it waits tile i — safe there because slot (i-1)%ring was
        already dotted. In group mode the dots happen AFTER all g waits,
        so only the start for j0+ring-1 (slot (j0-1)%ring, pre-group) is
        issued now; the remaining g-1 starts would overwrite un-dotted
        group slots and are deferred to _refill after the dots."""
        start(j0 + ring - 1)
        for j in range(j0, j0 + g):
            slot = j % ring
            pltpu.make_async_copy(
                sources[j][0], wtile.at[slot], _semw(j, slot)
            ).wait()
        runs, j = [], j0
        while j < j0 + g:
            s0 = j % ring
            ln = min(ring - s0, j0 + g - j)
            runs.append((s0, ln))
            j += ln
        return runs

    def _refill(j0, g):
        # the deferred prefetches (see _wait_group): restore the
        # started-up-to invariant of g per-tile consumes
        for k in range(j0 + ring, j0 + g + ring - 1):
            start(k)

    def qdot_group_t(x, j0: int, g: int):
        """ONE x (1, D) x (view (g*D, D)) dim1 x dim1 dot over g
        consecutive TRANSPOSED tiles -> (1, g*D) f32 (dense only)."""
        assert not quant and split == 1
        parts = [
            jax.lax.dot_general(
                x, wtile[s0:s0 + ln].reshape(ln * D, D),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for s0, ln in _wait_group(j0, g)
        ]
        _refill(j0, g)
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=1
        )

    qdot.group_t = qdot_group_t
    return start, qdot


def _wte_side_stream(wte_win, wbuf, sem_e, wring):
    """Dense wte row-tile side-stream for the QUANT multi-step kernels.

    Packed wte rows are block-quantized along D (the embedding's OUTPUT
    dim), which the unified tile stream's row-block dequant cannot express
    — so the multi-step kernels stream the token-window rows DENSE
    (dequantized once at prepare time, bit-identical to dequantize-at-load)
    through a separate small ring while the layer weights stream packed.
    `wte_win` is (nt, RW, D) HBM; `wbuf` (wring, RW, D) VMEM; returns
    (start_w, embed) where embed(onehot ([B,] nt*RW)) -> ([B,] D) f32 is
    the exact one-hot row select (one nonzero product per column)."""
    nt = wte_win.shape[0]
    RW = wbuf.shape[1]

    def start_w(t: int):
        if t >= nt:
            return
        pltpu.make_async_copy(
            wte_win.at[t], wbuf.at[t % wring], sem_e.at[t % wring]
        ).start()

    def embed(onehot):
        x = None
        for t in range(nt):
            pltpu.make_async_copy(
                wte_win.at[t], wbuf.at[t % wring], sem_e.at[t % wring]
            ).wait()
            part = _dot(onehot[:, t * RW : (t + 1) * RW], wbuf[t % wring])
            start_w(t + wring)
            x = part if x is None else x + part
        return x

    return start_w, embed


_DYN_AUTO_LAYERS = 24


def dyn_layers_enabled(cfg: GPTConfig | None = None) -> bool:
    """Should the multi-step/batched/prefill kernels run their layer loop
    as a lax.fori_loop over kv_slots-layer blocks instead of a Python
    unroll? Bit-identical tokens (tested); the point is COMPILE time —
    Mosaic program size drops ~L-fold, which is the dominant cold-start
    cost at bark-large (dense kernel set 97 s dyn vs 2220 s unrolled,
    perf/r4). Requires the dynamic-index Mosaic capabilities probed by
    tools/tpu_mosaic_probe.py P1-P8 (all PASS on v5e).

    BARK_TPU_DYN_LAYERS: "1" always, "0" never, unset/"auto" = on for
    models with n_layer >= 24 — measured on v5e: bark-large q8_0 RTF
    0.1582 dyn vs 0.1627 unrolled (at-worst-equal) with ~23x faster cold
    start; bark-small pays ~4% RTF for a compile win it doesn't need
    (perf/r4/RESULTS.md)."""
    env = os.environ.get("BARK_TPU_DYN_LAYERS", "auto")
    if env in ("auto", ""):
        return cfg is not None and cfg.n_layer >= _DYN_AUTO_LAYERS
    return env == "1"


def pack_layer_params(cfg: GPTConfig, blocks):
    """(L, 16, D) f32 packed per-layer LN/bias rows for the dynamic-layer
    kernels: rows [ln1_g, ln1_b, ln2_g, ln2_b, proj_b, out_b, qkv_b (3),
    fc_b (4), zero-pad (3)]. One VMEM ref read at a TRACED layer index
    replaces eight (L, ..) refs whose sublane reads would need dynamic
    alignment proofs. f32 packing is exact for bf16/f32 params, and the
    kernels upcast these rows to f32 anyway — bit-identical math."""
    L, D = cfg.n_layer, cfg.n_embd

    def f(k):
        return blocks[k].astype(jnp.float32)

    return jnp.concatenate([
        f("ln1_g")[:, None], f("ln1_b")[:, None],
        f("ln2_g")[:, None], f("ln2_b")[:, None],
        f("proj_b")[:, None], f("out_b")[:, None],
        f("qkv_b").reshape(L, 3, D), f("fc_b").reshape(L, 4, D),
        jnp.zeros((L, 3, D), jnp.float32),
    ], axis=1)


def ensure_layer_params(cfg: GPTConfig, params):
    """Cache `pack_layer_params` into the params dict (key "_lp") when the
    dynamic-layer kernels are enabled — called by the multi-step prepare
    fns OUTSIDE the stage loops so the pack isn't re-traced per window."""
    if not dyn_layers_enabled(cfg) or "_lp" in params:
        return params
    out = dict(params)
    out["_lp"] = pack_layer_params(cfg, params["blocks"])
    return out


def _dyn_ring(ring: int) -> int:
    """Largest ring depth <= `ring` with ring | 12 — makes every tile's
    VMEM slot static under a traced layer index (slot of layer tile
    (l, c) = (p0 + c) % ring because l*12 = 0 mod ring)."""
    for r in range(min(ring, 12), 1, -1):
        if 12 % r == 0:
            return r
    return 2


def _dyn_kv_slots(kv_slots: int, L: int) -> int:
    """Largest slab-ring depth <= kv_slots dividing L: the layer loop
    unrolls blocks of kv_slots layers so slab slots stay static."""
    for s in range(min(kv_slots, L), 1, -1):
        if L % s == 0:
            return s
    return 1


def _dyn_kv_slots_batched(kv_slots: int, B: int) -> int:
    """Largest slab-ring depth <= kv_slots dividing B: the batched
    kernels stream slabs in (layer, lane)-major order (idx = l*B + b),
    so slot = idx % kv_slots = b % kv_slots is static iff kv_slots | B."""
    for s in range(min(kv_slots, B), 1, -1):
        if B % s == 0:
            return s
    return 1


def _tile_stream_dyn(w_refs, s_refs, lm_refs, embed_srcs, L, lm_count,
                     ring, quant, has_min, wtile, stile, sem_w, sem_s,
                     D, cdt):
    """TRACED-layer-index weight-tile stream for the dynamic-layer kernels.

    Static schedule [p0 embed tiles][L*12 layer tiles][lm_count LM tiles],
    identical order and numerics to `_weight_sources` + `_tile_stream`
    (split=1, single queue), but the layer region's DMA sources are
    addressed by a traced layer index so the layer loop can be a
    lax.fori_loop instead of a Python unroll. Ring slots stay STATIC
    because ring | 12. Cross-layer prefetch (position + ring - 1 landing
    in layer l+1 or the LM region) is emitted under pl.when(l+1 < L) /
    pl.when(l+1 == L) — at most one boundary is crossed since ring <= 12.

    Returns (warmup, qdot_embed, qdot_layer, qdot_lm):
      warmup()            start the first ring-1 schedule positions
      qdot_embed(x, j)    x @ embed tile j (static j < p0)
      qdot_layer(x, l, c) x @ tile c of layer l (l traced, c static 0..11)
      qdot_lm(x, m)       x @ LM tile m (static m < lm_count)
    """
    p0 = len(embed_srcs)
    assert 12 % ring == 0 and 2 <= ring <= 12, ring
    assert p0 == 0 or not quant  # quant kernels embed via the side stream
    total = p0 + L * 12 + lm_count
    blk = _block_seg(D, cdt) if (quant and has_min) else None
    Bs = D // 32
    lm_t, lm_s = lm_refs

    def _lsrc(l, t, value):
        refs4 = w_refs if value else s_refs
        if t < 3:
            return refs4[0].at[l, t]
        if t == 3:
            return refs4[1].at[l]
        if t < 8:
            return refs4[2].at[l, t - 4]
        if value:
            return refs4[3].at[l, pl.ds((t - 8) * D, D)]
        return refs4[3].at[l, t - 8]

    def _start_at(slot, wsrc, ssrc):
        pltpu.make_async_copy(wsrc, wtile.at[slot], sem_w.at[slot]).start()
        if quant:
            pltpu.make_async_copy(
                ssrc, stile.at[slot], sem_s.at[slot]
            ).start()

    def _start_layer(l, c, slot):
        _start_at(
            slot, _lsrc(l, c, True), _lsrc(l, c, False) if quant else None
        )

    def _start_lm(m, slot):
        _start_at(slot, lm_t.at[m], lm_s.at[m] if quant else None)

    def _start_pos(i: int):
        # static schedule position (warm-up and embed-phase prefetch)
        if i >= total:
            return
        slot = i % ring
        if i < p0:
            _start_at(slot, embed_srcs[i], None)
        elif i < p0 + L * 12:
            j = i - p0
            _start_layer(j // 12, j % 12, slot)
        else:
            _start_lm(i - p0 - L * 12, slot)

    def warmup():
        for i in range(ring - 1):
            _start_pos(i)

    # wait descriptors only need a same-shape source ref; all value tiles
    # are (D, D) and all scale tiles (R, D) with the layout-packed R
    w_rep = w_refs[1].at[0]
    s_rep = s_refs[1].at[0] if quant else None

    def _consume(slot):
        pltpu.make_async_copy(w_rep, wtile.at[slot], sem_w.at[slot]).wait()
        if not quant:
            return wtile[slot], None
        pltpu.make_async_copy(s_rep, stile.at[slot], sem_s.at[slot]).wait()
        sc = jnp.broadcast_to(
            _stile_f32(stile[slot][:Bs])[:, None, :], (Bs, 32, D)
        ).reshape(D, D)
        w = (wtile[slot].astype(jnp.float32) * sc).astype(cdt)
        if has_min:
            return w, _stile_f32(stile[slot][Bs:])
        return w, None

    def qdot_embed(x, j):
        _start_pos(j + ring - 1)
        return _qdot(x, _consume(j % ring), blk)

    def _start_rel(l, c2):
        """Start the DMA for schedule offset c2 relative to layer l's
        first tile, crossing into layer l+1 / the LM region when c2 >= 12
        (at most one boundary: c2 <= 22 for ring <= 12, groups <= 4)."""
        slot2 = (p0 + c2) % ring
        if c2 < 12:
            _start_layer(l, c2, slot2)
        else:
            c3 = c2 - 12

            @pl.when(l + 1 < L)
            def _():
                _start_layer(l + 1, c3, slot2)

            if c3 < lm_count:
                @pl.when(l + 1 == L)
                def _():
                    _start_lm(c3, slot2)

    def qdot_layer(x, l, c):
        _start_rel(l, c + ring - 1)
        return _qdot(x, _consume((p0 + c) % ring), blk)

    def _wait_group(l, t0, g):
        """Group analogue of qdot_layer's wait (see _tile_stream's
        _wait_group for the deferred-prefetch rationale); returns the
        contiguous slot runs of tiles [t0, t0+g) of layer l."""
        _start_rel(l, t0 + ring - 1)
        for c in range(t0, t0 + g):
            slot = (p0 + c) % ring
            pltpu.make_async_copy(
                w_rep, wtile.at[slot], sem_w.at[slot]
            ).wait()
        runs, c = [], t0
        while c < t0 + g:
            s0 = (p0 + c) % ring
            ln = min(ring - s0, t0 + g - c)
            runs.append((s0, ln))
            c += ln
        return runs

    def _refill(l, t0, g):
        for c2 in range(t0 + ring, t0 + g + ring - 1):
            _start_rel(l, c2)

    def qdot_layer_group_t(x, l, t0, g):
        """ONE dim1 x dim1 dot over g consecutive transposed layer tiles
        -> (1, g*D) f32 (dense only; grouped-dot mode)."""
        assert not quant
        parts = [
            jax.lax.dot_general(
                x, wtile[s0:s0 + ln].reshape(ln * D, D),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for s0, ln in _wait_group(l, t0, g)
        ]
        _refill(l, t0, g)
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=1
        )

    qdot_layer.group_t = qdot_layer_group_t

    def qdot_lm(x, m):
        m2 = m + ring - 1
        if m2 < lm_count:
            _start_lm(m2, (p0 + m2) % ring)
        return _qdot(x, _consume((p0 + m) % ring), blk)

    return warmup, qdot_embed, qdot_layer, qdot_lm


def _dense_layer_stack_dyn(
    cfg: GPTConfig, cdt, qdot_layer, lp,
    wait_kv, start_kv, kbuf, vbuf, krows, vrows, kv_slots,
    in_row8, base8, n_past, seg, seg_t, slot_ids, row_ids, x,
    gate_chunks=1, grouped=False,
    kv_quant=False, ks=None, vs=None, col_ids=None,
):
    """Dynamic-layer twin of `_dense_layer_stack`: a lax.fori_loop over
    BLOCKS of kv_slots layers (slab slots static inside a block) instead
    of a Python unroll over all L — bit-identical math, ~(L/kv_slots)-fold
    smaller Mosaic program (the cold-start lever). Per-layer LN/bias rows
    come from the packed (L, 16, D) f32 ref `lp` (pack_layer_params) via
    dynamic leading-index reads; the fresh-row staging writes krows/vrows
    at the traced layer index (Mosaic capabilities probed by
    tools/tpu_mosaic_probe.py P4-P6). wait_kv/start_kv take
    (layer, static slab slot)."""
    L, D, H = cfg.n_layer, cfg.n_embd, cfg.n_head
    hd = D // H
    LU = kv_slots
    assert L % LU == 0, (L, LU)

    def one_layer(l, u, x):
        x1 = _ln_f32(x, lp[l, 0], lp[l, 1]).astype(cdt)
        if grouped:
            qkv_all = qdot_layer.group_t(x1, l, 0, 3)  # (1, 3D) f32
            qkv_parts = [
                qkv_all[:, t * D:(t + 1) * D]
                + lp[l, 6 + t].astype(jnp.float32)
                for t in range(3)
            ]
        else:
            qkv_parts = []
            for t in range(3):
                qkv_parts.append(
                    qdot_layer(x1, l, t) + lp[l, 6 + t].astype(jnp.float32)
                )
        q = (qkv_parts[0] * (1.0 / np.sqrt(hd))).astype(cdt)

        wait_kv(l, u)
        kb, vb = kbuf.at[u], vbuf.at[u]
        k_new, v_new, ks_col, vs_col, ks_new, vs_new = _stage_kv_rows(
            l, kv_quant, qkv_parts[1], qkv_parts[2], cdt,
            kb, vb, krows, vrows, in_row8, base8,
            ks, vs, col_ids, n_past,
        )

        ctxv = _attend_lane(
            kb, vb, q, k_new, v_new, n_past, seg, seg_t, cdt,
            slot_ids, row_ids, ks_col, vs_col, ks_new, vs_new,
            gate_chunks=gate_chunks,
        )
        start_kv(l + kv_slots, u)

        proj = qdot_layer(
            ctxv.astype(cdt), l, 3
        ) + lp[l, 4].astype(jnp.float32)
        x = (x.astype(jnp.float32) + proj).astype(cdt)

        x2 = _ln_f32(x, lp[l, 2], lp[l, 3]).astype(cdt)
        if grouped:
            fc_all = qdot_layer.group_t(x2, l, 4, 4)  # (1, 4D) f32
            h_parts = [
                fc_all[:, t * D:(t + 1) * D]
                + lp[l, 9 + t].astype(jnp.float32)
                for t in range(4)
            ]
        else:
            h_parts = []
            for t in range(4):
                h_parts.append(
                    qdot_layer(x2, l, 4 + t)
                    + lp[l, 9 + t].astype(jnp.float32)
                )
        h = [
            jax.nn.gelu(p, approximate=True).astype(cdt)
            for p in h_parts
        ]
        acc = lp[l, 5].astype(jnp.float32)
        for t in range(4):
            acc = acc + qdot_layer(h[t], l, 8 + t)
        return (x.astype(jnp.float32) + acc).astype(cdt)

    def block(b, x):
        for u in range(LU):
            x = one_layer(b * LU + u, u, x)
        return x

    return jax.lax.fori_loop(0, L // LU, block, x)


def _block_seg(D, cdt):
    """blk (D, D // 32) with blk[i, b] = (i // 32 == b): x @ blk sums each
    32-block of x (the contraction half of `_qdot`'s min correction)."""
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (D, D // 32), 0) // 32
    b_ids = jax.lax.broadcasted_iota(jnp.int32, (D, D // 32), 1)
    return (i_ids == b_ids).astype(cdt)


def _qdot(x, wm, blk):
    """x @ dequantized-tile for a `consume` result: the scaled int8 part on
    the MXU plus (when the format carries per-block mins) the exact rank-1
    -per-block min term blocksums(x) @ m — two tiny extra dots instead of a
    (D, D) broadcast relayout + add per tile."""
    w, m = wm
    out = _dot(x, w)
    if m is not None:
        xb = _dot(x, blk)  # ([B,]1, D // 32) f32 block sums
        out = out + jax.lax.dot_general(
            xb, m,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out


def _quant_qseg(q_col, seg):
    """Quantize the (D, H) q-segment matrix per COLUMN (= per head) with
    quantize_kv_rows' exact formula; returns (int8 (D, H), f32 (1, H)
    scales). Feeds the int8 x int8 MXU score dot — mirrors the XLA path's
    gpt._attention_int8, which quantizes per (position, head) rows."""
    qseg32 = q_col * seg.astype(jnp.float32)  # (D, H) f32
    sq = jnp.max(jnp.abs(qseg32), axis=0, keepdims=True) / 127.0  # (1, H)
    inv = jnp.where(sq > 0, 1.0 / jnp.where(sq == 0, 1.0, sq), 0.0)
    q_i8 = jnp.clip(jnp.round(qseg32 * inv), -127, 127).astype(jnp.int8)
    return q_i8, sq


def _quant_row(x32):
    """(T, D) f32 -> (int8 (T, D), f32 scale (T, 1)); EXACTLY
    gpt.quantize_kv_rows so the XLA and kernel paths agree on the low-bit
    cache's effective contents."""
    s = jnp.max(jnp.abs(x32), axis=1, keepdims=True) / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s == 0, 1.0, s), 0.0)
    q = jnp.clip(jnp.round(x32 * inv), -127, 127).astype(jnp.int8)
    return q, s


def _attend_lane_scr(kb, vb, q_row, k_new, v_new, seg, seg_t, cdt,
                     att_scr, bias_col, new_col,
                     ks_col=None, vs_col=None, ks_new=None, vs_new=None):
    """Batched-kernel lane attention: same math as `_attend_lane`, but all
    (S, H) intermediates materialize into the one shared `att_scr` scratch
    and the per-lane row masks come as compact (S, 1) columns (`bias_col`:
    0 for live slots, -1e9 beyond n_past; `new_col`: 1.0 at the fresh row).
    Boolean per-lane masks are (S, 128)-padded and layer-invariant — left
    to the scheduler, B lanes' worth stay live at once and blow the ~16 MB
    VMEM; the arithmetic blend against shared scratch columns bounds the
    footprint to one lane's working set.

    Low-bit cache (`ks_col`/`vs_col` (S, 1) row scales, `ks_new`/`vs_new`
    (1, 1) fresh-row scales, slabs int8): the K scales fold into the (S, H)
    score domain and the V scales into the post-softmax attention weights —
    the only (S, D)-sized extra work is the int8->cdt cast feeding the MXU.
    """
    q_col = q_row.astype(jnp.float32)[0][:, None]  # (D, 1)
    if ks_col is not None:
        # int8 MXU score path (see _attend_lane)
        q_i8, sq = _quant_qseg(q_col, seg)
        s_new = _doti(k_new, q_i8).astype(jnp.float32) * (ks_new * sq)
        scores = _doti(kb[...], q_i8).astype(jnp.float32) * (ks_col * sq)
    else:
        qseg = (q_col * seg.astype(jnp.float32)).astype(cdt)  # (D, H)
        s_new = _dot(k_new, qseg)  # (1, H) fresh row's score
        if ks_new is not None:
            s_new = s_new * ks_new
        scores = _dot(kb[...].astype(cdt), qseg)  # (S, H)
    stale = 1.0 - new_col  # (S, 1)
    # fresh-row blend is exact: its stale term is multiplied by 0
    att_scr[...] = scores * stale + s_new * new_col + bias_col
    m = jnp.max(att_scr[...], axis=0, keepdims=True)  # (1, H)
    att_scr[...] = jnp.exp(att_scr[...] - m)
    denom = jnp.sum(att_scr[...], axis=0, keepdims=True)  # (1, H)
    att_new = jnp.exp(s_new - m) / denom  # (1, H) == att[n_past]
    att_w = att_scr[...] * (stale / denom)
    if vs_col is not None:
        att_w = att_w * vs_col
    ctx_h = jax.lax.dot_general(
        att_w.astype(cdt), vb[...].astype(cdt),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, D)
    ctxv = jnp.sum(
        ctx_h * seg_t.astype(jnp.float32), axis=0, keepdims=True
    )  # (1, D)
    att_new_e = _dot(att_new.astype(cdt), seg_t)  # (1, D) f32
    v_fresh = v_new.astype(jnp.float32)
    if vs_new is not None:
        v_fresh = v_fresh * vs_new
    return ctxv + att_new_e * v_fresh


def _attend_lane(kb, vb, q_row, k_new, v_new, n_past, seg, seg_t, cdt,
                 slot_ids, row_ids,
                 ks_col=None, vs_col=None, ks_new=None, vs_new=None,
                 gate_chunks=1):
    """Single-lane attention against a stale (S, D) KV slab + a rank-1
    fresh-token correction; all (S, D)-sized work on the MXU.

    The fresh K/V row is NOT folded into the slabs (that would cost
    element-wise (S, D) VPU selects); its score is patched in the (S, H)
    domain and its V contribution added post-softmax. Rows beyond n_past
    get exactly-zero attention (exp underflow after the -1e9 mask), so
    stale slab bytes never leak into the context. The lane->sublane
    transpose of q runs in f32 (Mosaic: minor-dim insertion is 32-bit
    only) — unless BARK_TPU_ATT_QHEAD builds the (H, D) q-head matrix
    with a row-broadcast multiply and contracts dim1 x dim1 instead
    (probe P9), which needs no transpose at all.

    kb/vb: (S, D) VMEM refs; q_row/k_new/v_new: (1, D); slot_ids (S, H) /
    row_ids (S, 1) are caller-hoisted iotas (shared across layers).
    Low-bit cache: int8 slabs with per-row scales — K scales fold into the
    (S, H) scores (multiplied BEFORE the -1e9 mask so masked slots stay
    -1e9), V scales into the post-softmax weights; the fresh k_new/v_new
    arrive already quantized with their (1, 1) scales.

    `gate_chunks` > 1 (BARK_TPU_ATT_GATE) splits the slab-sized dots into
    row chunks and lax.cond-skips chunks entirely beyond n_past (their
    rows are select-masked to -1e9 / zero attention anyway), mirroring
    the slab DMA gating — the MXU then only touches live cache rows.
    Returns the (1, D) f32 context row.
    """
    S, H = slot_ids.shape
    D = q_row.shape[1]

    # per-path raw score function over slab rows [r0, r0+n) (K scales
    # folded), shared by the full and chunk-gated forms below
    if _att_qhead():
        q32 = q_row.astype(jnp.float32)  # (1, D), no transpose
        if ks_col is not None:
            # per-head quantization over (H, D) rows — same per-head
            # scales/values as _quant_qseg's per-column form, exact
            qh32 = q32 * seg_t.astype(jnp.float32)  # (H, D)
            sqh = jnp.max(jnp.abs(qh32), axis=1, keepdims=True) / 127.0
            inv = jnp.where(sqh > 0, 1.0 / jnp.where(sqh == 0, 1.0, sqh), 0.0)
            q_i8t = jnp.clip(jnp.round(qh32 * inv), -127, 127).astype(
                jnp.int8
            )  # (H, D)
            sq = sqh.reshape(1, H)
            s_new = _doti_t(k_new, q_i8t).astype(jnp.float32) * (ks_new * sq)

            def score_rows(r0, n):
                return _doti_t(
                    kb[pl.ds(r0, n), :], q_i8t
                ).astype(jnp.float32) * (ks_col[r0:r0 + n] * sq)
        else:
            qhead = (q32 * seg_t.astype(jnp.float32)).astype(cdt)  # (H, D)
            s_new = _dot_t(k_new, qhead)  # (1, H)
            if ks_new is not None:
                s_new = s_new * ks_new

            def score_rows(r0, n):
                return _dot_t(kb[pl.ds(r0, n), :].astype(cdt), qhead)
    else:
        q_col = q_row.astype(jnp.float32)[0][:, None]  # (D, 1)
        if ks_col is not None:
            # int8 x int8 MXU score dot: slab stays int8 (no (S, D) upcast
            # on the VPU), q is quantized per head, and BOTH scales fold
            # into the (S, H) score domain; the int32 accumulate is exact
            q_i8, sq = _quant_qseg(q_col, seg)
            s_new = _doti(k_new, q_i8).astype(jnp.float32) * (ks_new * sq)

            def score_rows(r0, n):
                return _doti(
                    kb[pl.ds(r0, n), :], q_i8
                ).astype(jnp.float32) * (ks_col[r0:r0 + n] * sq)
        else:
            qseg = (q_col * seg.astype(jnp.float32)).astype(cdt)  # (D, H)
            s_new = _dot(k_new, qseg)  # (1, H) fresh row's score
            if ks_new is not None:
                s_new = s_new * ks_new

            def score_rows(r0, n):
                return _dot(kb[pl.ds(r0, n), :].astype(cdt), qseg)

    if gate_chunks == 1:
        scores = score_rows(0, S)  # (S, H) f32 via MXU
        is_new = row_ids == n_past  # (S, 1)
        scores = jnp.where(is_new, s_new, scores)
        scores = jnp.where(slot_ids <= n_past, scores, jnp.float32(-1e9))
        m = jnp.max(scores, axis=0, keepdims=True)  # (1, H)
        e = jnp.exp(scores - m)  # (S, H)
        denom = jnp.sum(e, axis=0, keepdims=True)  # (1, H)
        att_stale = jnp.where(is_new, 0.0, e / denom)  # (S, H)
        att_new = jnp.exp(s_new - m) / denom  # (1, H) == att[n_past]
        if vs_col is not None:
            att_stale = att_stale * vs_col
        # ctx_h[h, d] = sum_s att[s, h] * V[s, d]; the head-diagonal is
        # collapsed with the seg mask (H*D element-wise, trivial)
        ctx_h = jax.lax.dot_general(
            att_stale.astype(cdt), vb[...].astype(cdt),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, D)
    else:
        # flash-style chunk gating: BOTH the MXU dots AND the (S, H) VPU
        # softmax work run per 'live' chunk and lax.cond-skip chunks
        # entirely beyond n_past. seq12 ablation: attention math is ~19%
        # of a bark-small decode step, most of it full-S VPU ops over a
        # mostly-dead slab. Dead chunks contribute exact zeros (their
        # rows underflow to 0 in the ungated form too); max is exactly
        # associative, the denominator/context regroup f32 sums within
        # ulps — every single-lane path gates identically (_gate_for).
        KC = S // gate_chunks
        neg = jnp.float32(-1e9)

        def _live(c):
            return c * KC <= n_past

        s_cs, m_cs = [], []
        for c in range(gate_chunks):
            def _mk(c=c):
                r0 = c * KC
                s_c = score_rows(r0, KC)
                s_c = jnp.where(row_ids[r0:r0 + KC] == n_past, s_new, s_c)
                s_c = jnp.where(
                    slot_ids[r0:r0 + KC] <= n_past, s_c, neg
                )
                return s_c, jnp.max(s_c, axis=0, keepdims=True)

            s_c, m_c = _mk() if c == 0 else jax.lax.cond(
                _live(c), _mk,
                lambda: (jnp.full((KC, H), neg, jnp.float32),
                         jnp.full((1, H), neg, jnp.float32)),
            )
            s_cs.append(s_c)
            m_cs.append(m_c)
        m = m_cs[0]
        for mc in m_cs[1:]:
            m = jnp.maximum(m, mc)  # (1, H); max over the fresh-patched,
            # masked scores — identical to the ungated m (max is exact)

        e_cs, denom = [], None
        for c in range(gate_chunks):
            def _e(c=c):
                e_c = jnp.exp(s_cs[c] - m)
                return e_c, jnp.sum(e_c, axis=0, keepdims=True)

            e_c, d_c = _e() if c == 0 else jax.lax.cond(
                _live(c), _e,
                lambda: (jnp.zeros((KC, H), jnp.float32),
                         jnp.zeros((1, H), jnp.float32)),
            )
            e_cs.append(e_c)
            denom = d_c if denom is None else denom + d_c
        att_new = jnp.exp(s_new - m) / denom  # (1, H)

        ctx_h = None
        for c in range(gate_chunks):
            def _ctx(c=c):
                r0 = c * KC
                att_c = jnp.where(
                    row_ids[r0:r0 + KC] == n_past, 0.0, e_cs[c] / denom
                )
                if vs_col is not None:
                    att_c = att_c * vs_col[r0:r0 + KC]
                return jax.lax.dot_general(
                    att_c.astype(cdt), vb[pl.ds(r0, KC), :].astype(cdt),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            part = _ctx() if c == 0 else jax.lax.cond(
                _live(c), _ctx, lambda: jnp.zeros((H, D), jnp.float32)
            )
            ctx_h = part if ctx_h is None else ctx_h + part
    ctxv = jnp.sum(
        ctx_h * seg_t.astype(jnp.float32), axis=0, keepdims=True
    )  # (1, D)
    att_new_e = _dot(att_new.astype(cdt), seg_t)  # (1, D) f32
    v_fresh = v_new.astype(jnp.float32)
    if vs_new is not None:
        v_fresh = v_fresh * vs_new
    return ctxv + att_new_e * v_fresh


def _head_seg(D, H, hd, cdt):
    """seg (D, H) with seg[d, h] = (d // hd == h), and its transpose."""
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    seg = (d_ids == h_ids).astype(cdt)
    return seg, seg.T


def _stage_kv_rows(
    l, kv_quant, qkv_k, qkv_v, cdt,
    kbuf_slot, vbuf_slot, krows, vrows, in_row8, base8,
    ks, vs, col_ids, n_past,
):
    """Shared fresh-row handling for the multi-step layer stacks: stage the
    aligned-8 cache rows into krows/vrows and — when `kv_quant` — quantize
    the fresh K/V exactly like `_decode_kernel`'s layer_body (mirroring
    gpt.quantize_kv_rows), update this layer's scale row in the (L, 1, S)
    f32 VMEM refs `ks`/`vs` at column n_past, and return the column scales
    the attention folds in. Returns (k_new, v_new, ks_col, vs_col, ks_new,
    vs_new) ready for `_attend_lane`. `l` may be a Python int (unrolled
    stack) or a traced index (dyn stack — dynamic leading-dim read/write,
    the same Mosaic pattern as the batched kernels' (L, B, S) scales)."""
    ks_new = vs_new = ks_col = vs_col = None
    if kv_quant:
        k_new_q, ks_new = _quant_row(qkv_k)
        v_new_q, vs_new = _quant_row(qkv_v)
        k_new = k_new_q if not _KV_DEBUG_NO_SCALE else k_new_q.astype(cdt)
        v_new = v_new_q.astype(cdt)
        krows[l] = jnp.where(in_row8, k_new_q, kbuf_slot[pl.ds(base8, 8), :])
        vrows[l] = jnp.where(in_row8, v_new_q, vbuf_slot[pl.ds(base8, 8), :])
        ks_row = ks[l]  # (1, S) current scales (all prior steps applied)
        vs_row = vs[l]
        ks[l] = jnp.where(col_ids == n_past, ks_new, ks_row)
        vs[l] = jnp.where(col_ids == n_past, vs_new, vs_row)
        if not _KV_DEBUG_NO_SCALE:
            ks_col = ks_row[0][:, None]  # (S, 1) pre-update, like
            vs_col = vs_row[0][:, None]  # _decode_kernel (the fresh
            # row's score/weight is patched via ks_new/vs_new)
    else:
        k_new = qkv_k.astype(cdt)
        v_new = qkv_v.astype(cdt)
        krows[l] = jnp.where(in_row8, k_new, kbuf_slot[pl.ds(base8, 8), :])
        vrows[l] = jnp.where(in_row8, v_new, vbuf_slot[pl.ds(base8, 8), :])
    return k_new, v_new, ks_col, vs_col, ks_new, vs_new


def _dense_layer_stack(
    cfg: GPTConfig, cdt, qdot, ti0,
    ln1_g, ln1_b, ln2_g, ln2_b, qkv_b, proj_b, fc_b, out_b,
    wait_kv, start_kv, kbuf, vbuf, krows, vrows, kv_slots,
    in_row8, base8, n_past, seg, seg_t, slot_ids, row_ids, x,
    gate_chunks=1, grouped=False,
    kv_quant=False, ks=None, vs=None, col_ids=None,
):
    """One decode step's dense transformer stack — the multi-step kernels
    (kernels/window.py, kernels/semantic.py) share this single copy of the
    layer math, a dense-only mirror of `_decode_kernel`'s layer_body
    (f32 LN/softmax, tanh GELU, params-dtype residual; the tests assert
    bit-equality against the single-step kernel). `wait_kv(l)`/`start_kv(l)`
    come pre-bound to the step's n_past; `qdot` consumes logical tiles
    ti0 + l*12 + t from the caller's tile stream. Stages this step's
    aligned-8 cache rows into krows/vrows and returns the residual x.

    kv_quant=True: int8 cache slabs with per-row f32 scales — `ks`/`vs`
    are (L, 1, S) VMEM refs the kernel keeps current across its steps
    (see _stage_kv_rows); `col_ids` is a (1, S) iota."""
    L, D, H = cfg.n_layer, cfg.n_embd, cfg.n_head
    hd = D // H
    for l in range(L):
        ti = ti0 + l * 12
        x1 = _ln_f32(x, ln1_g[l], ln1_b[l]).astype(cdt)
        if grouped:
            # one (1, D) x (3D, D) dim1 x dim1 dot on transposed tiles;
            # bias math unchanged on the static lane slices
            qkv_all = qdot.group_t(x1, ti, 3)  # (1, 3D) f32
            qkv_parts = [
                qkv_all[:, t * D:(t + 1) * D]
                + qkv_b[l, pl.ds(t * D, D)].astype(jnp.float32)
                for t in range(3)
            ]
        else:
            qkv_parts = []
            for t in range(3):
                qkv_parts.append(
                    qdot(x1, ti + t)
                    + qkv_b[l, pl.ds(t * D, D)].astype(jnp.float32)
                )
        q = (qkv_parts[0] * (1.0 / np.sqrt(hd))).astype(cdt)

        wait_kv(l)
        kb, vb = kbuf.at[l % kv_slots], vbuf.at[l % kv_slots]
        k_new, v_new, ks_col, vs_col, ks_new, vs_new = _stage_kv_rows(
            l, kv_quant, qkv_parts[1], qkv_parts[2], cdt,
            kb, vb, krows, vrows, in_row8, base8,
            ks, vs, col_ids, n_past,
        )

        ctxv = _attend_lane(
            kb, vb, q, k_new, v_new, n_past, seg, seg_t, cdt,
            slot_ids, row_ids, ks_col, vs_col, ks_new, vs_new,
            gate_chunks=gate_chunks,
        )
        start_kv(l + kv_slots)

        proj = qdot(
            ctxv.astype(cdt), ti + 3
        ) + proj_b[l].astype(jnp.float32)
        x = (x.astype(jnp.float32) + proj).astype(cdt)

        x2 = _ln_f32(x, ln2_g[l], ln2_b[l]).astype(cdt)
        if grouped:
            fc_all = qdot.group_t(x2, ti + 4, 4)  # (1, 4D) f32
            h_parts = [
                fc_all[:, t * D:(t + 1) * D]
                + fc_b[l, pl.ds(t * D, D)].astype(jnp.float32)
                for t in range(4)
            ]
        else:
            h_parts = []
            for t in range(4):
                h_parts.append(
                    qdot(x2, ti + 4 + t)
                    + fc_b[l, pl.ds(t * D, D)].astype(jnp.float32)
                )
        h = [
            jax.nn.gelu(p, approximate=True).astype(cdt)
            for p in h_parts
        ]
        acc = out_b[l].astype(jnp.float32)
        for t in range(4):
            acc = acc + qdot(h[t], ti + 8 + t)
        x = (x.astype(jnp.float32) + acc).astype(cdt)
    return x


def _decode_kernel(
    cfg: GPTConfig,
    v_pad: int,
    quant: bool,  # weights are (int8 values, f32 block scales[, mins])
    has_min: bool,
    kv_quant: bool,  # int8 KV cache with per-row f32 scales
    lm_tiles: tuple,  # (first, last+1) LM-head tile range to stream
    ring: int,  # weight-tile ring depth (ring-1 DMAs in flight)
    kv_slots: int,  # KV slab ring depth (layers prefetched ahead)
    split: int,  # row-split factor of the tile stream (_pick_split)
    kv_chunks: int,  # gated KV slab chunk count (_pick_kv_chunks)
    queues: int,  # weight-stream semaphore groups (_pick_wqueues)
    grouped: bool,  # grouped dots on transposed qkv/fc tiles (_group_dots)
    *refs,
):
    """Kernel body; refs layout (built by decode_step_fused):

      np_ref (1,1) i32 SMEM, x (1,D) VMEM,
      ln1_g ln1_b ln2_g ln2_b qkv_b proj_b fc_b out_b lnf_g lnf_b  (VMEM),
      dense:  qkv_w proj_w fc_w out_w lm_t                         (HBM),
      quant:  qkv_q proj_q fc_q out_q lm_q  qkv_s proj_s fc_s out_s lm_s
              (scale tiles carry the mins packed below, offset formats)
                                                                   (HBM),
      k_hbm v_hbm (HBM, aliased to outputs),
      kv_quant: ks_in vs_in (L,S) f32 row scales                   (VMEM),
      -> outputs logits (VMEM), k_out v_out (aliased)
         [, ks_out vs_out (L,S) VMEM when kv_quant],
      scratch: wtile (ring,D,D) [stile] kbuf vbuf (kv_slots,S,D)
               krows vrows (L,8,D)  sem_w (ring,) [sem_s]
               sem_kv (kv_slots,2,kv_chunks) sem_row (2,)
    """
    it = iter(refs)
    np_ref, x_ref = next(it), next(it)
    ln1_g, ln1_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
    qkv_b, proj_b, fc_b, out_b = next(it), next(it), next(it), next(it)
    lnf_g, lnf_b = next(it), next(it)
    qkv_w, proj_w, fc_w, out_w, lm_t = (next(it) for _ in range(5))
    if quant:
        qkv_s, proj_s, fc_s, out_s, lm_s = (next(it) for _ in range(5))
    k_hbm, v_hbm = next(it), next(it)
    ks_in = vs_in = ks_out = vs_out = None
    if kv_quant:
        ks_in, vs_in = next(it), next(it)
    logits_ref, k_out, v_out = next(it), next(it), next(it)
    if kv_quant:
        ks_out, vs_out = next(it), next(it)
    wtile = next(it)
    if quant:
        stile = next(it)
    kbuf, vbuf, krows, vrows = next(it), next(it), next(it), next(it)
    sem_w = next(it)
    if quant:
        sem_s = next(it)
    sem_kv, sem_row = next(it), next(it)

    L, D, S, H = cfg.n_layer, cfg.n_embd, cfg.block_size, cfg.n_head
    hd = D // H
    Bs = D // 32  # scale rows per (D, D) tile
    nt_qkv, nt_fc, nt_out = 3, 4, 4
    lm_t0, lm_t1 = lm_tiles
    n_past = np_ref[0, 0]
    cdt = x_ref.dtype  # compute/params dtype (bf16 or f32)

    sources = _weight_sources(
        L, D, lm_t1 - lm_t0,
        (qkv_w, proj_w, fc_w, out_w),
        (qkv_s, proj_s, fc_s, out_s) if quant else None,
        (lm_t, lm_s if quant else None),
        split,
    )
    start, qdot = _tile_stream(
        sources, ring, quant, has_min, wtile, stile if quant else None,
        sem_w, sem_s if quant else None, D, Bs, cdt, split, queues,
    )

    # gated KV slab stream: chunk c (rows [c*KC, (c+1)*KC)) is streamed only
    # while c*KC <= n_past — rows past n_past get exactly-zero attention, so
    # their bytes never need to leave HBM (_pick_kv_chunks)
    KC = S // kv_chunks

    def _kv_live(c: int):
        return c * KC <= n_past

    def start_kv(l: int):
        if l >= L or "kvdma" in _PROBE_ABLATE:
            return
        slot = l % kv_slots
        for c in range(kv_chunks):
            def _start(c=c):
                rows = pl.ds(c * KC, KC)
                pltpu.make_async_copy(
                    k_hbm.at[l, rows], kbuf.at[slot, rows],
                    sem_kv.at[slot, 0, c],
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[l, rows], vbuf.at[slot, rows],
                    sem_kv.at[slot, 1, c],
                ).start()
            if c == 0:
                _start()
            else:
                pl.when(_kv_live(c))(_start)

    def wait_kv(l: int):
        if "kvdma" in _PROBE_ABLATE:
            return
        slot = l % kv_slots
        for c in range(kv_chunks):
            def _wait(c=c):
                rows = pl.ds(c * KC, KC)
                pltpu.make_async_copy(
                    k_hbm.at[0, rows], kbuf.at[slot, rows],
                    sem_kv.at[slot, 0, c],
                ).wait()
                pltpu.make_async_copy(
                    v_hbm.at[0, rows], vbuf.at[slot, rows],
                    sem_kv.at[slot, 1, c],
                ).wait()
            if c == 0:
                _wait()
            else:
                pl.when(_kv_live(c))(_wait)

    seg, seg_t = _head_seg(D, H, hd, cdt)
    row8_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    # the fresh K/V row is written back through an 8-row aligned window
    # (DMA row slices must be 8-row aligned); neighbor rows are rewritten
    # with the bytes just fetched into the VMEM slab (identical values)
    base8 = pl.multiple_of((n_past // 8) * 8, 8)
    in_win = row8_ids == (n_past - base8)  # (8, 1)

    # gated stream: zero every slot's dead V region ONCE (n_past is fixed
    # for the whole call, so un-streamed chunks stay zero across slot
    # reuse). Dead rows contribute 0-weight * V to the context dot; the
    # zero-fill makes that 0*0 instead of 0*<uninitialized VMEM bits> —
    # 0*NaN would poison the (H, D) contraction. K needs no fill: junk
    # scores are killed by a SELECT against -1e9 (not an additive mask).
    if kv_chunks > 1:
        for slot in range(kv_slots):
            for c in range(1, kv_chunks):
                def _zfill(slot=slot, c=c):
                    vbuf[slot, pl.ds(c * KC, KC), :] = jnp.zeros(
                        (KC, D), vbuf.dtype
                    )
                pl.when(jnp.logical_not(_kv_live(c)))(_zfill)

    # warm-up: fill the tile ring and the KV slab ring
    for i in range(ring - 1):
        start(i)
    for l in range(kv_slots):
        start_kv(l)

    def layer_body(l, x):
        ti = l * 12  # this layer's first tile index
        # ---- attention: ln1 -> qkv -> cache row stage -> softmax(QK)V -> proj
        x1 = _ln_f32(x, ln1_g[l], ln1_b[l]).astype(cdt)
        if grouped:
            qkv_all = qdot.group_t(x1, ti, nt_qkv)  # (1, 3D) f32
            qkv_parts = [
                qkv_all[:, t * D:(t + 1) * D]
                + qkv_b[l, pl.ds(t * D, D)].astype(jnp.float32)
                for t in range(nt_qkv)
            ]
        else:
            qkv_parts = []
            for t in range(nt_qkv):
                qkv_parts.append(
                    qdot(x1, ti + t)
                    + qkv_b[l, pl.ds(t * D, D)].astype(jnp.float32)
                )
        q = (qkv_parts[0] * (1.0 / np.sqrt(hd))).astype(cdt)  # (1, D)
        ks_new = vs_new = ks_col = vs_col = None
        if kv_quant:
            # quantize the fresh rows exactly like gpt.quantize_kv_rows;
            # attention then uses the quantized values so the XLA path
            # (which reads the row back from the cache) agrees. K stays
            # int8 (it feeds the int8 MXU score dot); V upcasts for the
            # f32-weighted context dot.
            k_new_q, ks_new = _quant_row(qkv_parts[1])
            v_new_q, vs_new = _quant_row(qkv_parts[2])
            k_new = k_new_q if not _KV_DEBUG_NO_SCALE else k_new_q.astype(cdt)
            v_new = v_new_q.astype(cdt)
        else:
            k_new = qkv_parts[1].astype(cdt)
            v_new = qkv_parts[2].astype(cdt)

        wait_kv(l)
        kb, vb = kbuf.at[l % kv_slots], vbuf.at[l % kv_slots]
        # stage the fresh row (plus refetched neighbors) for the batched
        # end-of-kernel write-back
        if kv_quant:
            krows[l] = jnp.where(in_win, k_new_q, kb[pl.ds(base8, 8), :])
            vrows[l] = jnp.where(in_win, v_new_q, vb[pl.ds(base8, 8), :])
            # row-scale update: one (1, S) select per layer into the VMEM
            # output (the scale arrays are small enough to rewrite whole)
            ks_out[pl.ds(l, 1), :] = jnp.where(
                col_ids == n_past, ks_new, ks_in[pl.ds(l, 1), :]
            )
            vs_out[pl.ds(l, 1), :] = jnp.where(
                col_ids == n_past, vs_new, vs_in[pl.ds(l, 1), :]
            )
            if not _KV_DEBUG_NO_SCALE:
                ks_col = ks_in[pl.ds(l, 1), :][0][:, None]  # (S, 1)
                vs_col = vs_in[pl.ds(l, 1), :][0][:, None]
        else:
            krows[l] = jnp.where(in_win, k_new, kb[pl.ds(base8, 8), :])
            vrows[l] = jnp.where(in_win, v_new, vb[pl.ds(base8, 8), :])

        if _PROBE_ABLATE:
            # timing ablation (wrong numerics): attention collapses to the
            # scaled q row; the slab DMAs above still ran and were waited
            # on unless "kvdma" dropped them too
            ctxv = q.astype(jnp.float32)
        else:
            ctxv = _attend_lane(
                kb, vb, q, k_new, v_new, n_past, seg, seg_t, cdt,
                slot_ids, row_ids, ks_col, vs_col, ks_new, vs_new,
                gate_chunks=_gate_for(S, kv_chunks, cfg.n_embd),
            )

        # prefetch the next free KV slot's layer while the MLP streams
        start_kv(l + kv_slots)

        proj = qdot(
            ctxv.astype(cdt), ti + 3
        ) + proj_b[l].astype(jnp.float32)
        x = (x.astype(jnp.float32) + proj).astype(cdt)

        # ---- MLP: ln2 -> fc (gelu) -> out
        x2 = _ln_f32(x, ln2_g[l], ln2_b[l]).astype(cdt)
        if grouped:
            fc_all = qdot.group_t(x2, ti + 4, nt_fc)  # (1, 4D) f32
            h_parts = [
                fc_all[:, t * D:(t + 1) * D]
                + fc_b[l, pl.ds(t * D, D)].astype(jnp.float32)
                for t in range(nt_fc)
            ]
        else:
            h_parts = []
            for t in range(nt_fc):
                h_parts.append(
                    qdot(x2, ti + 4 + t)
                    + fc_b[l, pl.ds(t * D, D)].astype(jnp.float32)
                )
        h = [jax.nn.gelu(p, approximate=True).astype(cdt) for p in h_parts]

        acc = out_b[l].astype(jnp.float32)
        for t in range(nt_out):
            acc = acc + qdot(h[t], ti + 8 + t)
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
        logits_ref[0, pl.ds(j * D, D)] = qdot(hfin, L * 12 + i)[0]

    # drain the KV row write-back before the kernel retires
    pltpu.make_async_copy(
        krows, k_out.at[:, pl.ds(base8, 8), :], sem_row.at[0]
    ).wait()
    pltpu.make_async_copy(
        vrows, v_out.at[:, pl.ds(base8, 8), :], sem_row.at[1]
    ).wait()


def _pick_depths_batched(cfg: GPTConfig, B: int, quant: bool, has_min: bool,
                         itemsize: int, kv_quant: bool = False,
                         s_itemsize: int = 4, split: int = 1,
                         extra_bytes: int = 0, multi_step: bool = False,
                         w_itemsize: int = 0):
    """(ring, kv_slots, fits_default) for the batched kernel. At B lanes
    the per-lane KV slab stream dominates the traffic (weights amortize
    across lanes), so slab-ring depth is preferred over tile-ring depth.

    multi_step=True (the batched window/semantic kernels) skips the
    default-window pass entirely: their B-lane × step-loop Mosaic stack
    measured 16.23 MB REAL at bark-small B=8 int8-KV (seq5 r4) — over the
    16 MiB default window even though the modeled buffers fit — so those
    kernels always request the raised limit. `w_itemsize` prices the
    weight-tile ring separately from the KV-slab `itemsize` (see
    _pick_depths — they differ under int8-KV with dense weights)."""
    D, S, L = cfg.n_embd, cfg.block_size, cfg.n_layer
    tile = D * D * (1 if quant else (w_itemsize or itemsize))
    if quant:
        tile += (D // 32) * D * s_itemsize * (2 if has_min else 1)
    tile //= split
    kv = 2 * S * D * itemsize
    fixed = (
        2 * B * 8 * D * itemsize  # krows/vrows staging
        + L * 13 * D * 4
        + 4 * B * D * 4
        + B * (-(-cfg.n_out_vocab // D)) * D * 4  # logits
    )
    if kv_quant:
        fixed += 4 * L * B * S * 4  # (L*B, S) f32 row scales, k/v x in/out
    # tighter budget than the single-lane kernel: the B-way unrolled lane
    # loop gives Mosaic scheduling freedom that keeps several lanes'
    # (S, H)-padded attention temporaries live at once (_depth_budget)
    # two-pass like _pick_depths: default-window plans first (no raised
    # scoped-vmem limit), the raised budget only when nothing fits
    passes = ((_FIT_DEFAULT_B, True), (_depth_budget(batched=True), False))
    if multi_step:
        passes = passes[1:]
    for budget, fits in passes:
        for ring, kv_slots in ((6, 3), (6, 2), (4, 3), (4, 2), (3, 3),
                               (3, 2), (2, 2), (2, 1)):
            need = fixed + ring * tile + kv_slots * kv + extra_bytes
            if need <= budget:
                _vmem_debug("pick_depths_batched", cfg, ring, kv_slots,
                            need, fits)
                return ring, kv_slots, fits
    _vmem_debug("pick_depths_batched", cfg, 2, 1, -1, False)
    return 2, 1, False


def _decode_kernel_batched(
    cfg: GPTConfig,
    B: int,  # static lane count
    v_pad: int,
    quant: bool,
    has_min: bool,
    kv_quant: bool,  # int8 KV cache with per-row f32 scales
    lm_tiles: tuple,
    ring: int,
    kv_slots: int,
    split: int,  # row-split factor of the tile stream (_pick_split)
    kv_chunks: int,  # gated KV slab chunk count (_pick_kv_chunks)
    *refs,
):
    """B-lane batched decode: one weight stream serves all lanes.

    Same tile schedule and attention math as `_decode_kernel`, but x is
    (B, D), every projection is a (B, D) @ (D, D) matmul, the KV cache is
    (L, B, S, D) with per-lane slabs streamed through a kv_slots-deep ring
    in (layer, lane)-major order, and n_past is per-lane — lanes inside a
    vmapped while_loop diverge (different EOS steps, different coarse
    window fills), so each lane masks and writes its own cache row.

    refs layout: np_ref (B, 1) i32 SMEM, x (B, D) VMEM, <ln/bias tensors as
    _decode_kernel>, <weights as _decode_kernel>, k_hbm v_hbm (L, B, S, D)
    HBM aliased [, ks_in vs_in (L*B, S) f32 VMEM when kv_quant]
    -> outputs logits (B, v_pad), k_out, v_out [, ks_out vs_out]; scratch:
    wtile [stile] kbuf vbuf (kv_slots,S,D) krows vrows (B,8,D)
    sem_w [sem_s] sem_kv (kv_slots,2,kv_chunks) sem_row (B,2).
    """
    it = iter(refs)
    np_ref, x_ref = next(it), next(it)
    ln1_g, ln1_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
    qkv_b, proj_b, fc_b, out_b = next(it), next(it), next(it), next(it)
    lnf_g, lnf_b = next(it), next(it)
    qkv_w, proj_w, fc_w, out_w, lm_t = (next(it) for _ in range(5))
    if quant:
        qkv_s, proj_s, fc_s, out_s, lm_s = (next(it) for _ in range(5))
    k_hbm, v_hbm = next(it), next(it)
    ks_in = vs_in = ks_out = vs_out = None
    if kv_quant:
        ks_in, vs_in = next(it), next(it)
    logits_ref, k_out, v_out = next(it), next(it), next(it)
    if kv_quant:
        ks_out, vs_out = next(it), next(it)
    wtile = next(it)
    if quant:
        stile = next(it)
    kbuf, vbuf, krows, vrows = next(it), next(it), next(it), next(it)
    att_scr, mask_scr, new_scr = next(it), next(it), next(it)
    sem_w = next(it)
    if quant:
        sem_s = next(it)
    sem_kv, sem_row = next(it), next(it)

    L, D, S, H = cfg.n_layer, cfg.n_embd, cfg.block_size, cfg.n_head
    hd = D // H
    Bs = D // 32
    lm_t0, lm_t1 = lm_tiles
    cdt = x_ref.dtype

    sources = _weight_sources(
        L, D, lm_t1 - lm_t0,
        (qkv_w, proj_w, fc_w, out_w),
        (qkv_s, proj_s, fc_s, out_s) if quant else None,
        (lm_t, lm_s if quant else None),
        split,
    )
    start, qdot = _tile_stream(
        sources, ring, quant, has_min, wtile, stile if quant else None,
        sem_w, sem_s if quant else None, D, Bs, cdt, split,
    )

    # KV slabs stream in (layer, lane)-major order: idx = l * B + b.
    # Gated chunk stream (_pick_kv_chunks): each lane streams only chunks
    # up to ITS OWN n_past — at B lanes the per-lane slabs dominate step
    # traffic, so the per-lane bound saves the most exactly where it
    # matters most.
    KC = S // kv_chunks

    def start_kv(idx: int):
        if idx >= L * B:
            return
        l, b = idx // B, idx % B
        slot = idx % kv_slots
        for c in range(kv_chunks):
            def _start(c=c):
                rows = pl.ds(c * KC, KC)
                pltpu.make_async_copy(
                    k_hbm.at[l, b, rows], kbuf.at[slot, rows],
                    sem_kv.at[slot, 0, c],
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[l, b, rows], vbuf.at[slot, rows],
                    sem_kv.at[slot, 1, c],
                ).start()
            if c == 0:
                _start()
            else:
                pl.when(c * KC <= n_past[b])(_start)

    def wait_kv(idx: int):
        b = idx % B
        slot = idx % kv_slots
        for c in range(kv_chunks):
            def _wait(c=c):
                rows = pl.ds(c * KC, KC)
                pltpu.make_async_copy(
                    k_hbm.at[0, 0, rows], kbuf.at[slot, rows],
                    sem_kv.at[slot, 0, c],
                ).wait()
                pltpu.make_async_copy(
                    v_hbm.at[0, 0, rows], vbuf.at[slot, rows],
                    sem_kv.at[slot, 1, c],
                ).wait()
            if c == 0:
                _wait()
            else:
                pl.when(c * KC <= n_past[b])(_wait)

    seg, seg_t = _head_seg(D, H, hd, cdt)
    row8_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    n_past = [np_ref[b, 0] for b in range(B)]
    base8 = [pl.multiple_of((n_past[b] // 8) * 8, 8) for b in range(B)]
    in_win = [row8_ids == (n_past[b] - base8[b]) for b in range(B)]
    # per-lane row masks packed into (S, B) scratch columns; see
    # _attend_lane_scr for why these are not kept as (S, H) booleans
    for b in range(B):
        mask_scr[:, b : b + 1] = jnp.where(
            row_ids <= n_past[b], 0.0, jnp.float32(-1e9)
        )
        new_scr[:, b : b + 1] = (row_ids == n_past[b]).astype(jnp.float32)

    # gated stream: chunks past EVERY lane's bound are never streamed, so
    # zero them once in every slot. Chunks between one lane's bound and
    # another's hold finite bytes (a previous occupant's real slab rows or
    # this fill) — junk would break the ADDITIVE -1e9 mask (NaN + -1e9 is
    # NaN, and 3e38 junk out-scores the mask) and 0-weight * NaN would
    # poison the context dot. min over lanes: unrolled jnp.minimum chain.
    if kv_chunks > 1:
        np_min = n_past[0]
        for b in range(1, B):
            np_min = jnp.minimum(np_min, n_past[b])
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

    for i in range(ring - 1):
        start(i)
    for idx in range(kv_slots):
        start_kv(idx)

    def layer_body(l, x):
        ti = l * 12
        x1 = _ln_f32(x, ln1_g[l], ln1_b[l]).astype(cdt)  # (B, D)
        qkv_parts = []
        for t in range(3):
            qkv_parts.append(
                qdot(x1, ti + t)
                + qkv_b[l, pl.ds(t * D, D)].astype(jnp.float32)
            )
        q = (qkv_parts[0] * (1.0 / np.sqrt(hd))).astype(cdt)  # (B, D)
        if kv_quant:
            k_new_q, ks_new = _quant_row(qkv_parts[1])  # (B, D) i8, (B, 1)
            v_new_q, vs_new = _quant_row(qkv_parts[2])
            # K stays int8 for the int8 MXU score dot (see _attend_lane)
            k_new = k_new_q if not _KV_DEBUG_NO_SCALE else k_new_q.astype(cdt)
            v_new = v_new_q.astype(cdt)
        else:
            k_new = qkv_parts[1].astype(cdt)
            v_new = qkv_parts[2].astype(cdt)

        ctx_rows = []
        for b in range(B):
            idx = l * B + b
            wait_kv(idx)
            kb, vb = kbuf.at[idx % kv_slots], vbuf.at[idx % kv_slots]
            # stage + write back this lane's fresh row through its own
            # 8-aligned window; the per-lane staging buffer is reused next
            # layer, guarded by the lane's row semaphores
            if l > 0:
                pltpu.make_async_copy(
                    krows.at[b], k_out.at[0, 0, pl.ds(0, 8), :],
                    sem_row.at[b, 0],
                ).wait()
                pltpu.make_async_copy(
                    vrows.at[b], v_out.at[0, 0, pl.ds(0, 8), :],
                    sem_row.at[b, 1],
                ).wait()
            staged_k = k_new_q if kv_quant else k_new
            staged_v = v_new_q if kv_quant else v_new
            krows[b] = jnp.where(
                in_win[b], staged_k[b : b + 1], kb[pl.ds(base8[b], 8), :]
            )
            vrows[b] = jnp.where(
                in_win[b], staged_v[b : b + 1], vb[pl.ds(base8[b], 8), :]
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
                r = l * B + b  # row of the (L*B, S) scale arrays
                ksn = ks_new[b : b + 1]  # (1, 1)
                vsn = vs_new[b : b + 1]
                ks_out[pl.ds(r, 1), :] = jnp.where(
                    col_ids == n_past[b], ksn, ks_in[pl.ds(r, 1), :]
                )
                vs_out[pl.ds(r, 1), :] = jnp.where(
                    col_ids == n_past[b], vsn, vs_in[pl.ds(r, 1), :]
                )
                ks_col = ks_in[pl.ds(r, 1), :][0][:, None]  # (S, 1)
                vs_col = vs_in[pl.ds(r, 1), :][0][:, None]

            ctx_rows.append(_attend_lane_scr(
                kb, vb, q[b : b + 1], k_new[b : b + 1], v_new[b : b + 1],
                seg, seg_t, cdt, att_scr,
                mask_scr[:, b : b + 1], new_scr[:, b : b + 1],
                ks_col, vs_col, ksn, vsn,
            ))
            start_kv(idx + kv_slots)
        ctxv = jnp.concatenate(ctx_rows, axis=0)  # (B, D) f32

        proj = qdot(
            ctxv.astype(cdt), ti + 3
        ) + proj_b[l].astype(jnp.float32)
        x = (x.astype(jnp.float32) + proj).astype(cdt)

        x2 = _ln_f32(x, ln2_g[l], ln2_b[l]).astype(cdt)
        h_parts = []
        for t in range(4):
            h_parts.append(
                qdot(x2, ti + 4 + t)
                + fc_b[l, pl.ds(t * D, D)].astype(jnp.float32)
            )
        h = [jax.nn.gelu(p, approximate=True).astype(cdt) for p in h_parts]
        acc = out_b[l].astype(jnp.float32)
        for t in range(4):
            acc = acc + qdot(h[t], ti + 8 + t)
        x = (x.astype(jnp.float32) + acc).astype(cdt)
        return x

    x = x_ref[:]
    for l in range(L):
        x = layer_body(l, x)

    if lm_t0 > 0 or lm_t1 < v_pad // D:
        logits_ref[:] = jnp.zeros((B, v_pad), jnp.float32)
    hfin = _ln_f32(x, lnf_g[0], lnf_b[0]).astype(cdt)
    for i, j in enumerate(range(lm_t0, lm_t1)):
        logits_ref[:, pl.ds(j * D, D)] = qdot(hfin, L * 12 + i)

    # drain the last layer's row write-backs
    for b in range(B):
        pltpu.make_async_copy(
            krows.at[b], k_out.at[0, 0, pl.ds(0, 8), :], sem_row.at[b, 0]
        ).wait()
        pltpu.make_async_copy(
            vrows.at[b], v_out.at[0, 0, pl.ds(0, 8), :], sem_row.at[b, 1]
        ).wait()


def decode_step_fused_batched(
    cfg: GPTConfig,
    params,
    tokens,  # (B,) i32
    k_cache,  # (L, B, S, D)
    v_cache,
    n_past,  # (B,) i32 — per-lane slot of this token
    *,
    quant: bool = False,
    lm_window=None,
    interpret: bool = False,
):
    """Natively-batched drop-in for vmap(gpt.decode_step): one fused kernel
    serves all B lanes, streaming each weight tile ONCE (the vmap-of-kernel
    alternative adds a grid dimension and re-streams weights per lane).

    Returns (logits (B, n_out_vocab) f32, k_cache, v_cache); caches are
    updated in place (aliased) at each lane's own n_past row. A
    {"q": int8, "s": f32} cache selects the low-bit cache path (see
    decode_step_fused).
    """
    kv_quant = isinstance(k_cache, dict)
    kq = k_cache["q"] if kv_quant else k_cache
    L, B2, S = cfg.n_layer, kq.shape[1], cfg.block_size
    B = tokens.shape[0]
    assert B == B2, (B, B2)
    D = cfg.n_embd
    v_pad = _v_pad(cfg)
    blocks = params["blocks"]
    has_min = quant and "wte_m" in params
    cdt = params["wpe"].dtype

    x = jax.vmap(
        lambda t, n: _embed_token(cfg, params, t, n, quant)[0]
    )(tokens, n_past)  # (B, D)

    if lm_window is None:
        lm_tiles = (0, v_pad // D)
    else:
        lo, hi = lm_window
        lm_tiles = (lo // D, -(-min(hi, v_pad) // D))

    sdt = jnp.dtype(blocks["proj_s"].dtype if quant else jnp.float32)
    split = _pick_split(cfg, quant, has_min, cdt.itemsize, sdt.itemsize)
    tiled = params.get("_decode_tiles")
    if tiled is None:
        tiled = _build_decode_tiles(
            cfg, params, quant, has_min, lm_tiles, split
        )
    if quant:
        big_inputs = [
            tiled["qkv"], blocks["proj_q"], tiled["fc"], blocks["out_q"],
            tiled["lm"],
            tiled["qkv_s"], tiled["proj_s"], tiled["fc_s"], tiled["out_s"],
            tiled["lm_s"],
        ]
    else:
        big_inputs = [
            tiled["qkv"], blocks["proj_w"], tiled["fc"], blocks["out_w"],
            tiled["lm"],
        ]

    if kv_quant:
        kc, vc = k_cache["q"], v_cache["q"]  # (L, B, S, D) int8
        ks = k_cache["s"].reshape(L * B, S)  # row (l, b) -> l*B + b
        vs = v_cache["s"].reshape(L * B, S)
    else:
        kc, vc = k_cache, v_cache  # canonical flat (L, B, S, D) layout
        ks = vs = None
    np_arr = n_past.astype(jnp.int32).reshape(B, 1)

    ring, kv_slots, vfit = _pick_depths_batched(
        cfg, B, quant, has_min, kc.dtype.itemsize, kv_quant, sdt.itemsize,
        split, w_itemsize=cdt.itemsize,
    )
    kv_chunks = _pick_kv_chunks(S, batched=True)
    kernel = functools.partial(
        _decode_kernel_batched, cfg, B, v_pad, quant, has_min, kv_quant,
        lm_tiles, ring, kv_slots, split, kv_chunks,
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, v_pad), jnp.float32),
        jax.ShapeDtypeStruct(kc.shape, kc.dtype),
        jax.ShapeDtypeStruct(vc.shape, vc.dtype),
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    n_big = len(big_inputs)
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem] * 11
        + [hbm] * n_big
        + [hbm, hbm]
    )
    cache_in_idx = 1 + 11 + n_big
    out_specs = [vmem, hbm, hbm]
    cache_inputs = [kc, vc]
    if kv_quant:
        in_specs += [vmem, vmem]
        out_shape += [
            jax.ShapeDtypeStruct(ks.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs.shape, jnp.float32),
        ]
        out_specs += [vmem, vmem]
        cache_inputs += [ks, vs]
    scratch = [pltpu.VMEM(
        (ring, D // split, D), jnp.int8 if quant else cdt
    )]
    if quant:
        # scale tile rows per sub-tile: Bs, or 2*Bs with the mins packed
        # below, over split; dtype follows the qpack (f16 when lossless —
        # halves the stream)
        scratch.append(pltpu.VMEM(
            (ring, (2 if has_min else 1) * (D // 32) // split, D), sdt
        ))
    scratch += [
        pltpu.VMEM((kv_slots, S, D), kc.dtype),
        pltpu.VMEM((kv_slots, S, D), vc.dtype),
        pltpu.VMEM((B, 8, D), kc.dtype),
        pltpu.VMEM((B, 8, D), vc.dtype),
        pltpu.VMEM((S, cfg.n_head), jnp.float32),  # shared attention scratch
        pltpu.VMEM((S, B), jnp.float32),  # per-lane -1e9 row masks
        pltpu.VMEM((S, B), jnp.float32),  # per-lane fresh-row indicators
        pltpu.SemaphoreType.DMA((ring,)),
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    scratch += [
        pltpu.SemaphoreType.DMA((kv_slots, 2, kv_chunks)),
        pltpu.SemaphoreType.DMA((B, 2)),
    ]
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
        np_arr,
        x.astype(cdt),
        blocks["ln1_g"], blocks["ln1_b"], blocks["ln2_g"], blocks["ln2_b"],
        blocks["qkv_b"], blocks["proj_b"], blocks["fc_b"], blocks["out_b"],
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        *big_inputs,
        *cache_inputs,
    )
    if kv_quant:
        logits, kc, vc, ks, vs = outs
        return (
            logits[:, : cfg.n_out_vocab],
            {"q": kc, "s": ks.reshape(L, B, S)},
            {"q": vc, "s": vs.reshape(L, B, S)},
        )
    logits, kc, vc = outs
    return logits[:, : cfg.n_out_vocab], kc, vc


def select_decode_fn_batched(
    cfg: GPTConfig,
    use_pallas: Optional[bool] = None,
    quant: bool = False,
    lm_window=None,
):
    """Batched decode implementation for the natively-batched stage
    programs: fn(params, tokens (B,), kc (L,B,S,D), vc, n_past (B,)).

    Auto (None): the batched fused kernel on TPU when shapes allow, else a
    vmap of the XLA decode. `.prepare` mirrors select_decode_fn.
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
        vfn = jax.vmap(
            functools.partial(gpt.decode_step, cfg),
            in_axes=(None, 0, 1, 1, 0), out_axes=(0, 1, 1),
        )
        wrapped = lambda p, t, kc, vc, n: vfn(p, t, kc, vc, n)  # noqa: E731
        wrapped.prepare = lambda p: p
        return wrapped
    fn = functools.partial(
        decode_step_fused_batched, cfg, quant=quant, lm_window=lm_window,
        interpret=not on_tpu,
    )
    fn.prepare = functools.partial(
        prepare_decode_params, cfg, quant=quant, lm_window=lm_window
    )
    # introspection for stage programs (mirrors select_decode_fn; the
    # batched coarse windows pair this kernel with the batched whole-window
    # kernel when shapes allow — kernels/window.py)
    fn.is_fused = True
    fn.quant = quant
    fn.lm_window = lm_window
    fn.interpret = not on_tpu
    return fn


def _v_pad(cfg: GPTConfig) -> int:
    return -(-cfg.n_out_vocab // cfg.n_embd) * cfg.n_embd


def _build_decode_tiles(cfg: GPTConfig, params, quant, has_min, lm_tiles,
                        split: int = 1):
    """Contiguous (.., D, D) tile copies of the column-split weights (and
    their quant scales/mins), plus the transposed LM head restricted to the
    streamed tile window.

    With split > 1 the kernel streams each tile as `split` row sub-tiles;
    values and symmetric-format scales need no relayout (row slices stay
    contiguous), but offset formats interleave scales+mins PER SUB-TILE so
    every sub-tile's scales+mins remain one contiguous DMA block:
    rows = [s_0; m_0; s_1; m_1; ...] instead of [s; m]."""
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
        Bs = D // 32

        def sm(s, m):
            # offset formats: mins ride BELOW the scales on the row axis so
            # a tile's scales+mins arrive in ONE contiguous DMA — a third
            # per-tile stream costs ~30% of a packed decode step in DMA
            # issue latency (measured q4_k vs q8_0, v5e); with split > 1
            # the (scales, mins) pair is interleaved per row sub-tile
            if m is None:
                return s
            Ss = s.shape[-2] // split
            parts = []
            for k in range(split):
                sl = slice(k * Ss, (k + 1) * Ss)
                parts += [s[..., sl, :], m[..., sl, :]]
            return jnp.concatenate(parts, axis=-2)

        # proj/out scales are pre-tiled too (out per (Bs, D) row block) so
        # the packed layout stays per-tile contiguous
        out_s = blocks["out_s"].reshape(L, 4, Bs, D)
        out_m = blocks["out_m"].reshape(L, 4, Bs, D) if has_min else None
        return {
            "qkv": col_tiles(blocks["qkv_q"], 3),
            "fc": col_tiles(blocks["fc_q"], 4),
            "lm": head_tiles(params["lm_q"]),
            "qkv_s": sm(col_tiles(blocks["qkv_s"], 3),
                        col_tiles(blocks["qkv_m"], 3) if has_min else None),
            "proj_s": sm(blocks["proj_s"],
                         blocks["proj_m"] if has_min else None),
            "fc_s": sm(col_tiles(blocks["fc_s"], 4),
                       col_tiles(blocks["fc_m"], 4) if has_min else None),
            "out_s": sm(out_s, out_m),
            "lm_s": sm(head_tiles(params["lm_s"]),
                       head_tiles(params["lm_m"]) if has_min else None),
        }

    lm = params["lm_head"][0]  # (V, D)
    lm_pad = jnp.zeros((v_pad, D), lm.dtype).at[: cfg.n_out_vocab].set(lm)
    tiles = {
        "qkv": col_tiles(blocks["qkv_w"], 3),
        "fc": col_tiles(blocks["fc_w"], 4),
        "lm": lm_pad.reshape(nt, D, D).swapaxes(1, 2)[lm_t0:lm_t1],
    }
    if _group_dots() and split == 1:
        # transposed tile copies for the grouped-dot single-lane kernels:
        # a (3, D, D)/(4, D, D) ring-slot view then reshapes to (gD, D)
        # and one dim1 x dim1 dot replaces the per-tile dots (probe P9).
        # Separate keys: the batched kernels keep per-tile dots on the
        # normal-orientation trees.
        tiles["qkv_t"] = tiles["qkv"].swapaxes(2, 3)
        tiles["fc_t"] = tiles["fc"].swapaxes(2, 3)
    return tiles


def _dense_layer_refs(tiled, blocks):
    """(qkv, proj, fc, out) HBM value trees for the dense SINGLE-LANE
    kernels + whether the grouped-dot math applies (transposed qkv/fc tile
    content; see _group_dots)."""
    if _group_dots() and "qkv_t" in tiled:
        return (tiled["qkv_t"], blocks["proj_w"], tiled["fc_t"],
                blocks["out_w"]), True
    return (tiled["qkv"], blocks["proj_w"], tiled["fc"],
            blocks["out_w"]), False


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
    cdt = params["wpe"].dtype
    sdt = jnp.dtype(params["blocks"]["proj_s"].dtype if quant else jnp.float32)
    split = _pick_split(cfg, quant, has_min, cdt.itemsize, sdt.itemsize)
    out = dict(params)
    out["_decode_tiles"] = _build_decode_tiles(
        cfg, params, quant, has_min, lm_tiles, split
    )
    return out


def _embed_token(cfg: GPTConfig, params, token, n_past, quant: bool):
    """wte row + wpe row -> (1, D) in the compute dtype."""
    wpe_row = jax.lax.dynamic_slice_in_dim(params["wpe"], n_past, 1, axis=0)
    if not quant:
        return jnp.take(params["wte"][0], token[None], axis=0) + wpe_row
    from bark_tpu.io.loader import scales_to_f32

    row_q = jnp.take(params["wte_q"][0], token[None], axis=0)  # (1, D) i8
    row_s = jnp.repeat(
        scales_to_f32(jnp.take(params["wte_s"][0], token[None], axis=0)),
        32, axis=1,
    )
    row = row_q.astype(jnp.float32) * row_s
    if "wte_m" in params:
        row = row + jnp.repeat(
            scales_to_f32(jnp.take(params["wte_m"][0], token[None], axis=0)),
            32, axis=1,
        )
    return row.astype(wpe_row.dtype) + wpe_row


def decode_step_fused(
    cfg: GPTConfig,
    params,
    token,  # scalar i32
    k_cache,  # (L, S, D)
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

    A {"q": int8, "s": f32} cache pytree (gpt.init_kv_cache(quant=True))
    selects the low-bit cache path: int8 slabs stream at half/quarter the
    bytes and the per-row scales ride along as small VMEM arrays.
    """
    L, D, S = cfg.n_layer, cfg.n_embd, cfg.block_size
    v_pad = _v_pad(cfg)
    blocks = params["blocks"]
    has_min = quant and "wte_m" in params
    kv_quant = isinstance(k_cache, dict)
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
    sdt = jnp.dtype(blocks["proj_s"].dtype if quant else jnp.float32)
    split = _pick_split(cfg, quant, has_min, cdt.itemsize, sdt.itemsize)
    tiled = params.get("_decode_tiles")
    if tiled is None:
        tiled = _build_decode_tiles(
            cfg, params, quant, has_min, lm_tiles, split
        )
    if kv_quant:
        kc, vc = k_cache["q"], v_cache["q"]
        ks, vs = k_cache["s"], v_cache["s"]
    else:
        kc, vc = k_cache, v_cache  # canonical flat (L, S, D) layout
        ks = vs = None
    np_arr = jnp.reshape(n_past.astype(jnp.int32), (1, 1))
    ring, kv_slots, vfit = _pick_depths(
        cfg, quant, has_min, kc.dtype.itemsize, kv_quant, sdt.itemsize,
        split, w_itemsize=cdt.itemsize,
    )
    grouped = False
    if quant:
        big_inputs = [
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
        # slots at once — a shallower ring would let a group member's DMA
        # overwrite another's slot before the group dot reads it. The ref
        # orientation MUST match `grouped` (transposed content needs the
        # group dots), so demotion re-picks the normal trees.
        grouped = grouped and split == 1 and ring >= 4
        if not grouped:
            qkv_r, proj_r, fc_r, out_r = (
                tiled["qkv"], blocks["proj_w"], tiled["fc"],
                blocks["out_w"],
            )
        big_inputs = [qkv_r, proj_r, fc_r, out_r, tiled["lm"]]
    kv_chunks = _pick_kv_chunks(S)
    queues = _pick_wqueues()
    kernel = functools.partial(
        _decode_kernel, cfg, v_pad, quant, has_min, kv_quant, lm_tiles,
        ring, kv_slots, split, kv_chunks, queues, grouped,
    )
    out_shape = [
        jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        jax.ShapeDtypeStruct(kc.shape, kc.dtype),
        jax.ShapeDtypeStruct(vc.shape, vc.dtype),
    ]
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
    out_specs = [vmem, hbm, hbm]
    cache_inputs = [kc, vc]
    if kv_quant:
        in_specs += [vmem, vmem]  # (L, S) row scales
        out_shape += [
            jax.ShapeDtypeStruct(ks.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs.shape, jnp.float32),
        ]
        out_specs += [vmem, vmem]
        cache_inputs += [ks, vs]
    scratch = [pltpu.VMEM(
        (ring, D // split, D), jnp.int8 if quant else cdt
    )]
    if quant:
        # scale tile rows per sub-tile: Bs, or 2*Bs with the mins packed
        # below, over split; dtype follows the qpack (f16 when lossless —
        # halves the stream)
        scratch.append(pltpu.VMEM(
            (ring, (2 if has_min else 1) * (D // 32) // split, D), sdt
        ))
    sem_shape = (queues, ring) if queues > 1 else (ring,)
    scratch += [
        pltpu.VMEM((kv_slots, S, D), kc.dtype),
        pltpu.VMEM((kv_slots, S, D), vc.dtype),
        pltpu.VMEM((L, 8, D), kc.dtype),
        pltpu.VMEM((L, 8, D), vc.dtype),
        pltpu.SemaphoreType.DMA(sem_shape),
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA(sem_shape))
    scratch += [
        pltpu.SemaphoreType.DMA((kv_slots, 2, kv_chunks)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
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
        np_arr,
        x.astype(cdt),
        blocks["ln1_g"], blocks["ln1_b"], blocks["ln2_g"], blocks["ln2_b"],
        blocks["qkv_b"], blocks["proj_b"], blocks["fc_b"], blocks["out_b"],
        params["ln_f_g"].reshape(1, D), params["ln_f_b"].reshape(1, D),
        *big_inputs,
        *cache_inputs,
    )
    if kv_quant:
        logits, kc, vc, ks, vs = outs
        return (
            logits[0, : cfg.n_out_vocab],
            {"q": kc, "s": ks},
            {"q": vc, "s": vs},
        )
    logits, kc, vc = outs
    return logits[0, : cfg.n_out_vocab], kc, vc


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
    # introspection for stage programs (the coarse windows pair this kernel
    # with the fused Pallas prefill when shapes allow — kernels/prefill.py)
    fn.is_fused = True
    fn.quant = quant
    fn.lm_window = lm_window
    fn.interpret = not on_tpu
    return fn
