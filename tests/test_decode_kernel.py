"""Fused Pallas decode kernel vs the XLA op-by-op decode path.

Runs the kernel in interpreter mode on CPU (tests never see a real TPU) over
lane-aligned shapes and checks logits + KV cache updates against
gpt.decode_step to float tolerance, including multi-step consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.kernels import decode as kdec
from bark_tpu.models import gpt

CFG = gpt.GPTConfig(
    n_layer=2,
    n_head=2,
    n_embd=128,
    block_size=64,
    n_in_vocab=300,
    n_out_vocab=200,  # pads to 256
    bias=True,
)


@pytest.fixture(scope="module")
def setup():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    # non-zero biases so bias handling is actually exercised
    key = jax.random.PRNGKey(9)
    params["blocks"] = {
        k: (
            v + 0.01 * jax.random.normal(jax.random.fold_in(key, i), v.shape)
            if k.endswith("_b")
            else v
        )
        for i, (k, v) in enumerate(sorted(params["blocks"].items()))
    }
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    # prefill a short prompt with the XLA path so the cache is non-trivial
    x_emb = jnp.take(params["wte"][0], jnp.arange(5), axis=0)
    _, kc, vc = gpt.prefill(CFG, params, x_emb, kc, vc, jnp.int32(5))
    return params, kc, vc


def test_supports():
    assert kdec.supports_fused_decode(CFG)
    tiny = gpt.GPTConfig(
        n_layer=2, n_head=2, n_embd=32, block_size=320,
        n_in_vocab=10, n_out_vocab=10,
    )
    assert not kdec.supports_fused_decode(tiny)


def test_single_step_matches_xla(setup):
    params, kc, vc = setup
    tok = jnp.int32(17)
    n_past = jnp.int32(5)
    ref_logits, ref_k, ref_v = gpt.decode_step(CFG, params, tok, kc, vc, n_past)
    out_logits, out_k, out_v = kdec.decode_step_fused(
        CFG, params, tok, kc, vc, n_past, interpret=True
    )
    np.testing.assert_allclose(out_logits, ref_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_k, ref_k, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_v, ref_v, rtol=2e-4, atol=2e-4)


def test_multi_step_matches_xla(setup):
    params, kc, vc = setup
    kk, vk = kc, vc
    kx, vx = kc, vc
    for i, tok in enumerate([3, 250, 42]):
        n_past = jnp.int32(5 + i)
        lx, kx, vx = gpt.decode_step(CFG, params, jnp.int32(tok), kx, vx, n_past)
        lk, kk, vk = kdec.decode_step_fused(
            CFG, params, jnp.int32(tok), kk, vk, n_past, interpret=True
        )
        np.testing.assert_allclose(lk, lx, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(kk, kx, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(vk, vx, rtol=5e-4, atol=5e-4)


def test_argmax_token_parity(setup):
    """temp=0 decode must pick identical tokens through either path."""
    params, kc, vc = setup
    tok = jnp.int32(3)
    for i in range(3):
        n_past = jnp.int32(5 + i)
        lx, _, _ = gpt.decode_step(CFG, params, tok, kc, vc, n_past)
        lk, kc, vc = kdec.decode_step_fused(
            CFG, params, tok, kc, vc, n_past, interpret=True
        )
        assert int(jnp.argmax(lx)) == int(jnp.argmax(lk))
        tok = jnp.argmax(lk).astype(jnp.int32) % CFG.n_in_vocab


def test_batched_kernel_matches_vmapped_xla(setup):
    """decode_step_fused_batched vs vmap(gpt.decode_step) with per-lane
    divergent n_past (lanes in a batched loop stop at different steps)."""
    params, kc, vc = setup
    B = 3
    kcb = jnp.stack([kc] * B, axis=1)  # (L, B, S, H, hd)
    vcb = jnp.stack([vc] * B, axis=1)
    toks = jnp.asarray([17, 3, 199], jnp.int32)
    n_past = jnp.asarray([5, 9, 24], jnp.int32)

    ref = jax.vmap(
        lambda t, k, v, n: gpt.decode_step(CFG, params, t, k, v, n),
        in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
    )(toks, kcb, vcb, n_past)
    out = kdec.decode_step_fused_batched(
        CFG, params, toks, kcb, vcb, n_past, interpret=True
    )
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=2e-4, atol=2e-4)


def test_batched_kernel_multi_step(setup):
    """Three consecutive batched steps keep caches and logits in lockstep
    with the per-lane XLA path (covers the staged row write-back reuse)."""
    params, kc, vc = setup
    B = 2
    kk = jnp.stack([kc] * B, axis=1)
    vk = jnp.stack([vc] * B, axis=1)
    kx, vx = kk, vk
    n_past = jnp.asarray([5, 12], jnp.int32)
    toks = jnp.asarray([3, 250], jnp.int32)
    vstep = jax.vmap(
        lambda t, k, v, n: gpt.decode_step(CFG, params, t, k, v, n),
        in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
    )
    for i in range(3):
        lx, kx, vx = vstep(toks, kx, vx, n_past)
        lk, kk, vk = kdec.decode_step_fused_batched(
            CFG, params, toks, kk, vk, n_past, interpret=True
        )
        np.testing.assert_allclose(lk, lx, rtol=5e-4, atol=5e-4)
        toks = jnp.argmax(lx, axis=-1).astype(jnp.int32) % CFG.n_in_vocab
        n_past = n_past + 1
    np.testing.assert_allclose(kk, kx, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(vk, vx, rtol=5e-4, atol=5e-4)


def test_lm_window_streams_partial_head(setup):
    """lm_window=(lo, hi): logits inside the covered tiles match the full
    computation; logits outside the tile range are zero (the coarse stage
    samples only its codebook windows)."""
    params, kc, vc = setup
    tok, n_past = jnp.int32(9), jnp.int32(5)
    full, _, _ = kdec.decode_step_fused(
        CFG, params, tok, kc, vc, n_past, interpret=True
    )
    lo, hi = 130, 190  # covers tile 1 (cols 128..256) of the padded head
    win, _, _ = kdec.decode_step_fused(
        CFG, params, tok, kc, vc, n_past, lm_window=(lo, hi), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(win)[128:], np.asarray(full)[128:], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(win)[:128], 0.0)


def test_fused_decode_row_split(monkeypatch):
    """split=2 tile streaming (BARK_TPU_TILE_SPLIT): the summed half-dots
    must stay within the kernel's float tolerance of the XLA path, dense
    and packed (incl. the offset formats' interleaved scales+mins layout).
    """
    from bark_tpu.io import ggml, loader
    from tests.test_quant_decode import _section

    monkeypatch.setenv("BARK_TPU_TILE_SPLIT", "2")
    for qt in (None, ggml.GGMLType.Q8_0, ggml.GGMLType.Q5_1,
               ggml.GGMLType.Q4_K):
        sec = _section(qt if qt is not None else ggml.GGMLType.F32)
        if qt is None:
            cfg, params = loader.gpt_params_from_section(sec, jnp.float32)
            dense = params
            quant = False
        else:
            cfg, params = loader.gpt_qparams_from_section(sec, jnp.float32)
            dense = loader.dense_from_qpack(cfg, params)
            quant = True
        kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
        x_emb = jnp.take(dense["wte"][0], jnp.arange(5), axis=0)
        _, kc, vc = gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(5))
        tok, n_past = jnp.int32(17), jnp.int32(5)
        ref_l, _, _ = gpt.decode_step(cfg, dense, tok, kc, vc, n_past)
        out_l, _, _ = kdec.decode_step_fused(
            cfg, params, tok, kc, vc, n_past, quant=quant, interpret=True
        )
        np.testing.assert_allclose(
            out_l, ref_l, rtol=5e-4, atol=5e-4,
            err_msg=f"qt={qt}",
        )
        assert int(jnp.argmax(out_l)) == int(jnp.argmax(ref_l)), f"qt={qt}"


def test_fused_decode_row_split_batched(monkeypatch):
    """split=2 through the batched kernel."""
    from bark_tpu.io import ggml, loader
    from tests.test_quant_decode import _section

    monkeypatch.setenv("BARK_TPU_TILE_SPLIT", "2")
    sec = _section(ggml.GGMLType.Q5_1)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    dense = loader.dense_from_qpack(cfg, qpack)
    B = 2
    kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32, batch=B)
    toks = jnp.asarray([17, 23], jnp.int32)
    n_past = jnp.asarray([0, 3], jnp.int32)
    out_l, _, _ = kdec.decode_step_fused_batched(
        cfg, qpack, toks, kc, vc, n_past, quant=True, interpret=True
    )
    for b in range(B):
        kc1, vc1 = gpt.init_kv_cache(cfg, dtype=jnp.float32)
        ref_l, _, _ = gpt.decode_step(
            cfg, dense, toks[b], kc1, vc1, n_past[b]
        )
        np.testing.assert_allclose(
            out_l[b], ref_l, rtol=5e-4, atol=5e-4
        )


GATED_CFG = gpt.GPTConfig(
    n_layer=2,
    n_head=2,
    n_embd=128,
    block_size=512,  # -> two 256-row KV chunks (_pick_kv_chunks)
    n_in_vocab=300,
    n_out_vocab=200,
    bias=True,
)


@pytest.fixture(scope="module")
def gated_setup():
    """Long-context fixture: 250 prefilled rows so decode steps straddle
    the 256-row chunk boundary of the gated KV slab stream."""
    params = gpt.init_params(GATED_CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    kc, vc = gpt.init_kv_cache(GATED_CFG, dtype=jnp.float32)
    ids = jnp.arange(250) % GATED_CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    _, kc, vc = gpt.prefill(GATED_CFG, params, x_emb, kc, vc, jnp.int32(250))
    return params, kc, vc


def test_kv_chunk_gated_crosses_boundary(gated_setup, monkeypatch):
    """Chunk 1 (rows 256..511) goes live mid-chain: n_past 253..258. The
    gated DMA must skip it while dead, zero-fill keeps the V dot clean,
    and logits/caches must track the XLA path through the transition.
    (Single-lane default is ungated — measured no win at B=1 — so the
    gated stream is requested explicitly.)"""
    monkeypatch.setenv("BARK_TPU_KV_CHUNKS", "2")
    params, kc, vc = gated_setup
    kk, vk = kc, vc
    kx, vx = kc, vc
    tok = jnp.int32(7)
    for i in range(6):
        n_past = jnp.int32(253 + i)
        lx, kx, vx = gpt.decode_step(GATED_CFG, params, tok, kx, vx, n_past)
        lk, kk, vk = kdec.decode_step_fused(
            GATED_CFG, params, tok, kk, vk, n_past, interpret=True
        )
        np.testing.assert_allclose(lk, lx, rtol=5e-4, atol=5e-4)
        assert int(jnp.argmax(lx)) == int(jnp.argmax(lk)), f"step {i}"
        tok = jnp.argmax(lk).astype(jnp.int32) % GATED_CFG.n_in_vocab
    np.testing.assert_allclose(kk, kx, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(vk, vx, rtol=5e-4, atol=5e-4)


def test_kv_chunk_gated_ungated_agree(gated_setup, monkeypatch):
    """BARK_TPU_KV_CHUNKS=1 (ungated) and the 2-chunk gated stream must
    produce identical logits — gating only skips rows whose attention
    weight is exactly zero."""
    params, kc, vc = gated_setup
    tok, n_past = jnp.int32(11), jnp.int32(260)
    monkeypatch.setenv("BARK_TPU_KV_CHUNKS", "2")
    lg, _, _ = kdec.decode_step_fused(
        GATED_CFG, params, tok, kc, vc, n_past, interpret=True
    )
    monkeypatch.setenv("BARK_TPU_KV_CHUNKS", "1")
    lu, _, _ = kdec.decode_step_fused(
        GATED_CFG, params, tok, kc, vc, n_past, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lu))


def test_kv_chunk_gated_batched_divergent_lanes(gated_setup):
    """Per-lane chunk bounds: lane 0 stays in chunk 0, lane 1 attends into
    chunk 1 — vs vmapped XLA."""
    params, kc, vc = gated_setup
    B = 2
    kcb = jnp.stack([kc] * B, axis=1)
    vcb = jnp.stack([vc] * B, axis=1)
    toks = jnp.asarray([17, 3], jnp.int32)
    n_past = jnp.asarray([40, 260], jnp.int32)

    ref = jax.vmap(
        lambda t, k, v, n: gpt.decode_step(GATED_CFG, params, t, k, v, n),
        in_axes=(0, 1, 1, 0), out_axes=(0, 1, 1),
    )(toks, kcb, vcb, n_past)
    out = kdec.decode_step_fused_batched(
        GATED_CFG, params, toks, kcb, vcb, n_past, interpret=True
    )
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=2e-4, atol=2e-4)


def test_kv_chunk_gated_int8_cache(gated_setup, monkeypatch):
    """Gated chunk stream over the int8 low-bit cache (int8 slabs cannot
    hold NaN, but the scale folding must still see only live rows)."""
    monkeypatch.setenv("BARK_TPU_KV_CHUNKS", "2")
    params, _, _ = gated_setup
    kc, vc = gpt.init_kv_cache(GATED_CFG, dtype=jnp.float32, quant=True)
    ids = jnp.arange(250) % GATED_CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    _, kc, vc = gpt.prefill(GATED_CFG, params, x_emb, kc, vc, jnp.int32(250))
    kk, vk = kc, vc
    kx, vx = kc, vc
    tok = jnp.int32(7)
    for i in range(3):
        n_past = jnp.int32(254 + i)
        lx, kx, vx = gpt.decode_step(GATED_CFG, params, tok, kx, vx, n_past)
        lk, kk, vk = kdec.decode_step_fused(
            GATED_CFG, params, tok, kk, vk, n_past, interpret=True
        )
        np.testing.assert_allclose(lk, lx, rtol=5e-4, atol=5e-4)
        tok = jnp.argmax(lk).astype(jnp.int32) % GATED_CFG.n_in_vocab
