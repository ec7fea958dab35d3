"""Attention/dot-fusion experiment flags vs the default kernels:
token-identical outputs.

Three env levers built from the seq12 decode-step ablations
(perf/r5/seq12.log — at bark-large attention math is only ~0.06 ms/token
of 0.888 and the remaining ~0.13 over the HBM floor is the serial
per-tile dot chain):

- BARK_TPU_GROUP_DOTS: qkv's 3 tiles / fc's 4 dotted as ONE dim1xdim1
  group dot on a contiguous transposed-tile ring view (7 serial MXU ops
  per layer instead of 12). Bit-exact: each output column block is the
  same (1, D) x (D, D) contraction, just batched.
- BARK_TPU_ATT_GATE (flash-style v2): score/softmax/context work runs
  per 256-row KV chunk and lax.cond-skips chunks entirely beyond n_past.
  All single-lane paths pick the same chunking (decode._gate_for), so
  fused-vs-stepped token equality is preserved by construction.
- BARK_TPU_ATT_QHEAD: transpose-free scores via a row-broadcast (H, D)
  q-head and dim1xdim1 contractions.

Interpret mode on CPU here; hardware token equality is gated on chip by
tools/tpu_check.py (check_att_flags). Float comparisons use the same
tolerance rationale as tests/test_dyn_layers.py: interpret-mode XLA CPU
may fuse the restructured straight-line code differently (~1 ulp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.kernels import decode as kdec
from bark_tpu.kernels import semantic as ksem
from bark_tpu.kernels import window as kwin
from bark_tpu.models import gpt

CFG = gpt.GPTConfig(
    n_layer=3,
    n_head=2,
    n_embd=128,
    block_size=512,
    n_in_vocab=300,
    n_out_vocab=200,
    bias=True,
)
SVS, CBS = 32, 64
LMW = (SVS, SVS + 2 * CBS)
SWS = 6
K = 6
SEM_SVS = 150

ALL_FLAGS = ("BARK_TPU_GROUP_DOTS", "BARK_TPU_ATT_GATE",
             "BARK_TPU_ATT_QHEAD")


def _params():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    key = jax.random.PRNGKey(9)
    params["blocks"] = {
        k: (
            v + 0.01 * jax.random.normal(jax.random.fold_in(key, i), v.shape)
            if k.endswith("_b")
            else v
        )
        for i, (k, v) in enumerate(sorted(params["blocks"].items()))
    }
    return params


def _prefill(pp, x_emb, ctx_len):
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    return gpt.prefill(CFG, pp, x_emb, kc, vc, jnp.int32(ctx_len))


def _set(monkeypatch, flags, on):
    for f in flags:
        monkeypatch.setenv(f, "1" if on else "0")


@pytest.mark.parametrize("flags", [
    ("BARK_TPU_GROUP_DOTS",),
    ("BARK_TPU_ATT_GATE",),
    ("BARK_TPU_ATT_QHEAD",),
    ALL_FLAGS,
])
def test_decode_step_flags_match_default(monkeypatch, flags):
    _set(monkeypatch, flags, True)
    params = _params()
    pp = kdec.prepare_decode_params(CFG, params)
    if "BARK_TPU_GROUP_DOTS" in flags:
        # the grouped path must actually arm (transposed tile copies)
        assert "qkv_t" in pp["_decode_tiles"]

    ctx_len = 40
    ids = (jnp.arange(ctx_len, dtype=jnp.int32) * 13) % CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)

    def run():
        _, kc, vc = _prefill(pp, x_emb, ctx_len)
        logits, kc, vc = kdec.decode_step_fused(
            CFG, pp, jnp.int32(7), kc, vc, jnp.int32(ctx_len),
            interpret=True,
        )
        return logits, kc, vc

    d_log, d_kc, d_vc = run()
    _set(monkeypatch, flags, False)
    r_log, r_kc, r_vc = run()
    np.testing.assert_allclose(
        np.asarray(d_log), np.asarray(r_log), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_kc), np.asarray(r_kc), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_vc), np.asarray(r_vc), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("dyn", [False, True])
def test_window_flags_match_default(monkeypatch, dyn):
    _set(monkeypatch, ALL_FLAGS, True)
    monkeypatch.setenv("BARK_TPU_DYN_LAYERS", "1" if dyn else "0")
    params = _params()

    def run():
        pp = kdec.prepare_decode_params(CFG, params, lm_window=LMW)
        pp = kwin.prepare_window_params(CFG, pp, svs=SVS, cbs=CBS)
        ctx_len = 40
        ids = (
            jnp.arange(CFG.block_size, dtype=jnp.int32) * 7
        ) % CFG.n_in_vocab
        x_emb = jnp.take(params["wte"][0], ids, axis=0)
        subs = jax.random.split(jax.random.PRNGKey(5), SWS)
        logits0, kc, vc = _prefill(pp, x_emb, ctx_len)
        return kwin.coarse_window_fused(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx_len), jnp.int32(0),
            subs, sws=SWS, temp=0.7, semantic_vocab_size=SVS,
            codebook_size=CBS, lm_window=LMW, interpret=True,
        )

    d_toks, d_kc, d_vc = run()
    _set(monkeypatch, ALL_FLAGS, False)
    r_toks, r_kc, r_vc = run()
    np.testing.assert_array_equal(np.asarray(d_toks), np.asarray(r_toks))
    np.testing.assert_allclose(
        np.asarray(d_kc), np.asarray(r_kc), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_vc), np.asarray(r_vc), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("scalar_embed", [False, True])
def test_semantic_flags_match_default(monkeypatch, scalar_embed):
    _set(monkeypatch, ALL_FLAGS, True)
    params = _params()

    ctx0, temp, min_eos_p = 40, 0.7, 0.006
    ids = (jnp.arange(ctx0, dtype=jnp.int32) * 13) % CFG.n_in_vocab
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    key = jax.random.PRNGKey(5)
    gum = ksem.make_gumbel_rows(
        key, K, CFG.n_out_vocab, kdec._v_pad(CFG), temp
    )

    def run():
        pp = kdec.prepare_decode_params(CFG, params)
        pp = ksem.prepare_semantic_params(CFG, pp)
        logits0, kc, vc = _prefill(pp, x_emb, ctx0)
        return ksem.semantic_chunk_fused(
            CFG, pp, logits0, kc, vc, jnp.int32(ctx0), jnp.int32(0),
            gum, jnp.float32(min_eos_p), K=K, temp=temp,
            semantic_vocab_size=SEM_SVS, scalar_embed=scalar_embed,
            interpret=True,
        )

    d = run()
    _set(monkeypatch, ALL_FLAGS, False)
    r = run()
    for a, b in zip(d, r):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "i":
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
