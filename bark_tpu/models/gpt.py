"""Bark's GPT-2-style stages as pure JAX functions.

Numerics contract (matches the ggml graph builders,
/root/reference/bark.cpp:1186-1584):

- pre-LN blocks with LayerNorm eps = 1e-5 (EPS_NORM, bark.cpp:30)
- fused QKV projection; attention scale 1/sqrt(n_embd/n_head)
- GELU is the tanh approximation (ggml_gelu)
- linear projections carry optional biases (only present when hparams.bias;
  absent biases are stored as zeros, which is numerically identical)
- the causal stages keep a KV cache of `block_size` slots per layer; the fine
  stage is non-causal, bidirectional, cache-free (bark.cpp:1509-1513)
- LM head has no bias; the causal stages apply it to the last position only
  (bark.cpp:1403-1405), the fine stage to all positions (bark.cpp:1572-1577)
- semantic prefill uses the "merge_ctx" trick: the 513-token prompt embeds
  rows 0-255 (text) and 256-511 (history) separately, adds them elementwise,
  and appends the infer token -> 257 effective positions (bark.cpp:1230-1251)

Layer parameters are stacked along a leading n_layer axis and scanned with
`lax.scan`, which keeps compile time flat in depth and lets XLA pipeline the
per-layer HBM reads.

TPU-first design notes: static shapes everywhere (padded contexts + length
masks instead of dynamic sequence lengths); attention always runs against the
full `block_size` cache so prefill/decode share one code path; caches are
donated across steps by the pipeline layer.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS_NORM = 1e-5


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    n_layer: int
    n_head: int
    n_embd: int
    block_size: int
    n_in_vocab: int
    n_out_vocab: int
    n_lm_heads: int = 1
    n_wtes: int = 1
    bias: bool = False
    n_codes_given: int = 1

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


# Params pytree layout (all arrays in the compute dtype unless noted):
#   wte:     (n_wtes, n_in_vocab, n_embd)
#   wpe:     (block_size, n_embd)
#   lm_head: (n_lm_heads, n_out_vocab, n_embd)
#   ln_f_g, ln_f_b: (n_embd,)
#   blocks:
#     ln1_g, ln1_b, ln2_g, ln2_b: (L, D)
#     qkv_w: (L, D, 3D)   qkv_b: (L, 3D)
#     proj_w: (L, D, D)   proj_b: (L, D)
#     fc_w: (L, D, 4D)    fc_b: (L, 4D)
#     out_w: (L, 4D, D)   out_b: (L, D)
Params = Dict[str, object]


def init_params(cfg: GPTConfig, key, dtype=jnp.float32, scale=0.02) -> Params:
    """Random params with GPT-2-ish init; used for tests and benchmarks."""
    L, D = cfg.n_layer, cfg.n_embd
    ks = jax.random.split(key, 8)

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    return {
        "wte": rnd(ks[0], (cfg.n_wtes, cfg.n_in_vocab, D)),
        "wpe": rnd(ks[1], (cfg.block_size, D)),
        "lm_head": rnd(ks[2], (cfg.n_lm_heads, cfg.n_out_vocab, D)),
        "ln_f_g": jnp.ones((D,), dtype),
        "ln_f_b": jnp.zeros((D,), dtype),
        "blocks": {
            "ln1_g": jnp.ones((L, D), dtype),
            "ln1_b": jnp.zeros((L, D), dtype),
            "ln2_g": jnp.ones((L, D), dtype),
            "ln2_b": jnp.zeros((L, D), dtype),
            "qkv_w": rnd(ks[3], (L, D, 3 * D)),
            "qkv_b": jnp.zeros((L, 3 * D), dtype),
            "proj_w": rnd(ks[4], (L, D, D)),
            "proj_b": jnp.zeros((L, D), dtype),
            "fc_w": rnd(ks[5], (L, D, 4 * D)),
            "fc_b": jnp.zeros((L, 4 * D), dtype),
            "out_w": rnd(ks[6], (L, 4 * D, D)),
            "out_b": jnp.zeros((L, D), dtype),
        },
    }


def init_params_numpy(cfg: GPTConfig, seed: int, scale=0.02) -> Params:
    """Host-side (pure numpy f32) random params — for benchmarks that need
    to transform weights on the host (e.g. quantize-pack) WITHOUT a
    device round-trip first."""
    rng = np.random.RandomState(seed)
    L, D = cfg.n_layer, cfg.n_embd

    def rnd(*shape):
        return (rng.randn(*shape) * scale).astype(np.float32)

    host = {
        "wte": rnd(cfg.n_wtes, cfg.n_in_vocab, D),
        "wpe": rnd(cfg.block_size, D),
        "lm_head": rnd(cfg.n_lm_heads, cfg.n_out_vocab, D),
        "ln_f_g": np.ones((D,), np.float32),
        "ln_f_b": np.zeros((D,), np.float32),
        "blocks": {
            "ln1_g": np.ones((L, D), np.float32),
            "ln1_b": np.zeros((L, D), np.float32),
            "ln2_g": np.ones((L, D), np.float32),
            "ln2_b": np.zeros((L, D), np.float32),
            "qkv_w": rnd(L, D, 3 * D),
            "qkv_b": np.zeros((L, 3 * D), np.float32),
            "proj_w": rnd(L, D, D),
            "proj_b": np.zeros((L, D), np.float32),
            "fc_w": rnd(L, D, 4 * D),
            "fc_b": np.zeros((L, 4 * D), np.float32),
            "out_w": rnd(L, 4 * D, D),
            "out_b": np.zeros((L, D), np.float32),
        },
    }
    return host


def init_params_host(cfg: GPTConfig, seed: int, dtype=jnp.float32, scale=0.02) -> Params:
    """Numpy-side random init, uploaded in one device_put.

    `init_params` traces/compiles a jax.random program per tensor shape; on a
    remote TPU that costs minutes of round-trips for benchmark-sized models.
    This builds the same pytree layout on the host in ~1 s.
    """
    host = init_params_numpy(cfg, seed, scale)
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), host)


def init_params_device(cfg: GPTConfig, seed: int, dtype=jnp.float32,
                       scale=0.02) -> Params:
    """Random params generated ON the device in one jitted program —
    nothing but the PRNG key crosses the host link.

    For benchmarks over a remote-TPU tunnel: a bark-large stage's dense
    bf16 pytree is ~600 MB (hours of upload on a degraded tunnel), vs one
    compile + seconds of on-device RNG. Identical shapes/dtypes (and thus
    identical decode traffic/FLOPs) to `init_params_host`; values differ.
    """
    gen = jax.jit(
        lambda key: init_params(cfg, key, dtype=dtype, scale=scale)
    )
    return gen(jax.random.PRNGKey(seed))


def init_kv_cache(cfg: GPTConfig, dtype=jnp.float32, batch: Optional[int] = None,
                  quant: bool = False):
    """(k, v) caches shaped (L, [B,] block_size, n_embd).

    The feature axis is deliberately FLAT (D, not (n_head, head_dim)): with
    head_dim 64 a trailing (H, 64) pair gets lane-padded to (H, 128) in the
    TPU tiled layout, doubling the cache's HBM footprint and turning every
    reshape to (…, D) — which the fused decode kernel and its DMA slabs
    need — into a full relayout copy. Profiling showed two such copies per
    cache per decode step eating ~3x the kernel's own time. Heads are split
    transiently inside `_attention`, where XLA fuses the view into the dot.

    quant=True: the low-bit cache — each of k/v is a pytree
    {"q": int8 same shape, "s": f32 per-row scales (L, [B,] block_size)}
    with dequant = q * s[..., None]. Halves (bf16) or quarters (f32) the
    per-step cache stream; the fused decode kernel reads the int8 slabs
    directly and folds the row scales into the (S, H) score/attention
    domain. All cache-consuming entry points dispatch on the pytree type.
    """
    shape = (cfg.n_layer, cfg.block_size, cfg.n_embd)
    if batch is not None:
        shape = (cfg.n_layer, batch, cfg.block_size, cfg.n_embd)
    if quant:
        cache = {
            "q": jnp.zeros(shape, jnp.int8),
            "s": jnp.zeros(shape[:-1], jnp.float32),
        }
        return cache, {k: v.copy() for k, v in cache.items()}
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def quantize_kv_rows(x: jnp.ndarray):
    """Per-row symmetric int8 quantization of K/V rows: (T, D) float ->
    (int8 (T, D), f32 scales (T,)) with dequant = q * s[:, None].

    The fused decode kernel quantizes its fresh rows with this exact
    formula (f32 amax/127, round-to-nearest-even, clip) so the XLA and
    kernel paths see identical effective cache contents.
    """
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32), axis=-1) / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s == 0, 1.0, s), 0.0)
    q = jnp.clip(jnp.round(x32 * inv[:, None]), -127, 127).astype(jnp.int8)
    return q, s


def _kv_update(cache, rows, n_past):
    """Write (T, D) float rows into a per-layer cache slice at row n_past;
    dispatches on dense array vs {"q","s"} quantized pytree."""
    z = jnp.zeros_like(n_past)
    if isinstance(cache, dict):
        q, s = quantize_kv_rows(rows)
        return {
            "q": jax.lax.dynamic_update_slice(cache["q"], q, (n_past, z)),
            "s": jax.lax.dynamic_update_slice(cache["s"], s, (n_past,)),
        }
    return jax.lax.dynamic_update_slice(cache, rows, (n_past, z))


def _kv_read(cache, dtype):
    """Full (S, D) cache slab in `dtype` (dequantized when low-bit)."""
    if isinstance(cache, dict):
        return (
            cache["q"].astype(jnp.float32) * cache["s"][:, None]
        ).astype(dtype)
    return cache


def layer_norm(x, g, b):
    # ggml_norm: mean/var over the feature axis, eps inside the sqrt
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + EPS_NORM)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _attention(q, k_all, v_all, mask, cfg: GPTConfig):
    """q: (T, D); k_all/v_all: (S, D); mask: (T, S) bool.

    Computed in f32 for softmax stability regardless of the param dtype.
    Heads are split here as transient views (fused into the dots by XLA);
    caches stay flat (see init_kv_cache).
    """
    scale = 1.0 / np.sqrt(cfg.head_dim)
    H, hd = cfg.n_head, cfg.head_dim
    q = q.reshape(q.shape[0], H, hd)
    k_all = k_all.reshape(k_all.shape[0], H, hd)
    v_all = v_all.reshape(v_all.shape[0], H, hd)
    scores = jnp.einsum(
        "thd,shd->hts", q, k_all, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask[None, :, :], scores, jnp.float32(-1e9))
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "hts,shd->thd",
        att.astype(v_all.dtype),
        v_all,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype).reshape(out.shape[0], cfg.n_embd)


def _attention_int8(cfg: GPTConfig, q, k_cache, v_cache, mask):
    """Low-bit-cache attention with an int8 x int8 MXU score dot.

    q is quantized per (position, head) with quantize_kv_rows' exact
    formula — the Pallas kernel mirrors it in its (D, H) column domain —
    so the int32 score accumulation is EXACT integer arithmetic and the
    two paths agree up to the fp grouping of q itself. Both per-row K
    scales and per-(t,h) q scales fold into the f32 score domain before
    the mask. V stays on the dequantize path (per-row scale folded
    post-softmax would need att-weight quantization, whose ~4% context
    error is too coarse — ROADMAP r2).
    """
    H, hd = cfg.n_head, cfg.head_dim
    T = q.shape[0]
    scale = 1.0 / np.sqrt(hd)
    qs = (q.astype(jnp.float32) * scale).reshape(T * H, hd)
    q_i8, s_q = quantize_kv_rows(qs)  # (T*H, hd) i8, (T*H,) f32
    scores = jnp.einsum(
        "thd,shd->hts",
        q_i8.reshape(T, H, hd),
        k_cache["q"].reshape(-1, H, hd),
        preferred_element_type=jnp.int32,
        # integer accumulate is exact; a global highest-precision hint
        # (parity tooling) must not turn this into an fp32 contract
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.float32)
    scores = (
        scores
        * s_q.reshape(T, H).T[:, :, None]
        * k_cache["s"][None, None, :]
    )
    scores = jnp.where(mask[None, :, :], scores, jnp.float32(-1e9))
    att = jax.nn.softmax(scores, axis=-1)
    v_all = _kv_read(v_cache, q.dtype).reshape(-1, H, hd)
    out = jnp.einsum(
        "hts,shd->thd", att.astype(v_all.dtype), v_all,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype).reshape(T, cfg.n_embd)


def _make_block_fn(cfg: GPTConfig, use_cache: bool):
    def block(x, layer, k_cache, v_cache, n_past, mask):
        # x: (T, D); k_cache/v_cache: (block, D) or None
        h = layer_norm(x, layer["ln1_g"], layer["ln1_b"])
        qkv = (
            jnp.dot(h, layer["qkv_w"], preferred_element_type=jnp.float32)
            .astype(x.dtype)
            + layer["qkv_b"]
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if use_cache:
            k_cache = _kv_update(k_cache, k, n_past)
            v_cache = _kv_update(v_cache, v, n_past)
            if isinstance(k_cache, dict):
                attn = _attention_int8(cfg, q, k_cache, v_cache, mask)
            else:
                attn = _attention(
                    q, _kv_read(k_cache, x.dtype),
                    _kv_read(v_cache, x.dtype), mask, cfg,
                )
        else:
            attn = _attention(q, k, v, mask, cfg)
        proj = (
            jnp.dot(attn, layer["proj_w"], preferred_element_type=jnp.float32)
            .astype(x.dtype)
            + layer["proj_b"]
        )
        x = x + proj
        h = layer_norm(x, layer["ln2_g"], layer["ln2_b"])
        h = gelu(
            jnp.dot(h, layer["fc_w"], preferred_element_type=jnp.float32)
            .astype(x.dtype)
            + layer["fc_b"]
        )
        mlp = (
            jnp.dot(h, layer["out_w"], preferred_element_type=jnp.float32)
            .astype(x.dtype)
            + layer["out_b"]
        )
        return x + mlp, k_cache, v_cache

    return block


def transformer(
    cfg: GPTConfig,
    params: Params,
    x: jnp.ndarray,  # (T, D) embedded input
    k_caches,  # (L, block, D) or None
    v_caches,
    n_past,  # scalar int32 (ignored when cache-free)
    mask,  # (T, S) bool; S = block_size when cached else T
):
    """Run all layers via lax.scan. Returns (hidden (T,D), k_caches, v_caches)."""
    use_cache = k_caches is not None
    block = _make_block_fn(cfg, use_cache)

    if use_cache:
        def body(x, xs):
            layer, kc, vc = xs
            x, kc, vc = block(x, layer, kc, vc, n_past, mask)
            return x, (kc, vc)

        x, (k_out, v_out) = jax.lax.scan(
            body, x, (params["blocks"], k_caches, v_caches)
        )
    else:
        def body(x, layer):
            x, _, _ = block(x, layer, None, None, None, mask)
            return x, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        k_out = v_out = None

    x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    return x, k_out, v_out


def logits_last(cfg: GPTConfig, params: Params, hidden_last: jnp.ndarray):
    """LM head on a single position: (D,) -> (n_out_vocab,) float32."""
    return jnp.dot(
        params["lm_head"][0], hidden_last, preferred_element_type=jnp.float32
    )


# ------------------------------------------------------------ entry points


def embed_prompt_merged(cfg: GPTConfig, params: Params, tokens513):
    """merge_ctx embedding for the 513-token semantic prompt -> (257, D)."""
    wte = params["wte"][0]
    text = jnp.take(wte, tokens513[:256], axis=0)
    hist = jnp.take(wte, tokens513[256:512], axis=0)
    infer = jnp.take(wte, tokens513[512:], axis=0)
    return jnp.concatenate([text + hist, infer], axis=0)


def prefill(
    cfg: GPTConfig,
    params: Params,
    x_emb: jnp.ndarray,  # (T, D) token embeddings (no positions yet)
    k_caches,
    v_caches,
    n_valid,  # number of real (non-pad) rows in x_emb
):
    """Causal prefill from n_past=0 over a right-padded window.

    Returns (logits_last (n_out_vocab,) f32, k_caches, v_caches). The logits
    are taken at row n_valid-1 (the last real token), matching the
    reference's last-position LM head (bark.cpp:1403-1405).
    """
    T = x_emb.shape[0]
    x = x_emb + params["wpe"][:T]
    S = cfg.block_size
    pos = jnp.arange(T)[:, None]
    slot = jnp.arange(S)[None, :]
    mask = slot <= pos  # causal; pad rows only see real prefix + themselves
    hidden, k_caches, v_caches = transformer(
        cfg, params, x, k_caches, v_caches, jnp.int32(0), mask
    )
    last = jax.lax.dynamic_index_in_dim(
        hidden, n_valid - 1, axis=0, keepdims=False
    )
    return logits_last(cfg, params, last), k_caches, v_caches


def prefill_chunked(
    cfg: GPTConfig,
    params: Params,
    x_emb: jnp.ndarray,  # (T, D) token embeddings (no positions yet)
    k_caches,
    v_caches,
    n_valid,  # number of real (non-pad) rows in x_emb
    chunk: int = 256,
):
    """`prefill` that skips the computation of dead (padded) rows.

    The coarse window programs right-pad the re-primed context to a static
    ctx_size (1024) and n_valid averages ~half of it over a full schedule,
    so a full prefill wastes ~half its FLOPs on pad rows (r3 stage-timing
    attributed ~40-50 ms of the bark-large coarse stage to window
    prefills). This variant runs a while_loop over `chunk`-row blocks and
    stops after ceil(n_valid/chunk) iterations.

    Numerically equivalent to `prefill` for the returned logits and every
    cache slot < n_valid: per-row ops are row-independent, and masked
    attention weights underflow to exactly 0.0, so dead V rows contribute
    exact zeros either way. The only deltas are matmul-reassociation ulps
    (XLA tiles a (chunk, D) dot differently from a (T, D) one — measured
    ~5e-8 in f32); downstream greedy token chains match (tested). Cache
    slots >= n_valid keep their incoming values instead of pad-row
    projections — downstream reads never see them: decode masks slots >
    n_past and writes its token at slot n_valid onward, overwriting
    before any mask admits them.
    """
    T = x_emb.shape[0]
    if T % chunk or T <= chunk:
        return prefill(cfg, params, x_emb, k_caches, v_caches, n_valid)
    D = cfg.n_embd
    S = cfg.block_size
    x = x_emb + params["wpe"][:T]
    slot = jnp.arange(S)[None, :]
    n_blocks = (n_valid + chunk - 1) // chunk

    def cond(carry):
        return carry[-1] < n_blocks

    def body(carry):
        kc, vc, last, b = carry
        base = b * chunk
        xb = jax.lax.dynamic_slice(x, (base, 0), (chunk, D))
        pos = base + jnp.arange(chunk)[:, None]
        mask = slot <= pos  # causal, same formula as `prefill`
        hidden, kc, vc = transformer(cfg, params, xb, kc, vc, base, mask)
        # row n_valid-1 lives in the last executed block
        idx = jnp.clip(n_valid - 1 - base, 0, chunk - 1)
        row = jax.lax.dynamic_index_in_dim(hidden, idx, axis=0,
                                           keepdims=False)
        last = jnp.where(n_valid - 1 < base + chunk, row, last)
        return kc, vc, last, b + 1

    last0 = jnp.zeros((D,), x.dtype)
    k_caches, v_caches, last, _ = jax.lax.while_loop(
        cond, body, (k_caches, v_caches, last0, jnp.int32(0))
    )
    return logits_last(cfg, params, last), k_caches, v_caches


def decode_step(
    cfg: GPTConfig,
    params: Params,
    token,  # scalar int32
    k_caches,
    v_caches,
    n_past,  # scalar int32: this token's slot/position
):
    """Single-token causal decode against the KV cache.

    Returns (logits (n_out_vocab,) f32, k_caches, v_caches).
    """
    wte = params["wte"][0]
    x = jnp.take(wte, token[None], axis=0) + jax.lax.dynamic_slice_in_dim(
        params["wpe"], n_past, 1, axis=0
    )
    S = cfg.block_size
    mask = (jnp.arange(S) <= n_past)[None, :]  # (1, S)
    hidden, k_caches, v_caches = transformer(
        cfg, params, x, k_caches, v_caches, n_past, mask
    )
    return logits_last(cfg, params, hidden[0]), k_caches, v_caches


def fine_forward(
    cfg: GPTConfig,
    params: Params,
    tokens: jnp.ndarray,  # (T, n_channels) int32, T == block_size (1024)
    codebook_idx: int,  # static python int in [n_codes_given, n_channels)
):
    """Non-causal fine-stage forward (bark_build_fine_gpt_graph,
    bark.cpp:1416-1584).

    Token embedding is the sum of wtes[0..codebook_idx] applied to channels
    0..codebook_idx; the LM head for `codebook_idx - n_codes_given` is applied
    to every position. Returns logits (T, n_out_vocab) float32.
    """
    T = tokens.shape[0]
    # (cb+1, T, D) gathered then summed; wtes stacked on axis 0
    wtes = params["wte"][: codebook_idx + 1]  # (cb+1, V, D)
    embs = jnp.take_along_axis(
        wtes,
        tokens.T[: codebook_idx + 1][:, :, None],
        axis=1,
    )  # (cb+1, T, D)
    x = embs.sum(axis=0).astype(wtes.dtype) + params["wpe"][:T]
    mask = jnp.ones((T, T), dtype=bool)
    hidden, _, _ = transformer(cfg, params, x, None, None, None, mask)
    head = params["lm_head"][codebook_idx - cfg.n_codes_given]
    return jnp.dot(hidden, head.T, preferred_element_type=jnp.float32)
