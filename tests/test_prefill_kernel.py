"""Fused Pallas prefill kernel vs the XLA gpt.prefill path.

Interpreter mode on CPU (tests never see a real TPU): logits, full cache
contents, lm_window zeroing, and decode-chain continuation are checked
against gpt.prefill to float tolerance. The real-hardware Mosaic build is
gated by tools/tpu_check.py (check_prefill)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.kernels import decode as kdec
from bark_tpu.kernels import prefill as kpre
from bark_tpu.models import gpt

# hd must be 64 and T == block_size % 256 == 0 for the fused prefill
CFG = gpt.GPTConfig(
    n_layer=2,
    n_head=2,
    n_embd=128,
    block_size=512,
    n_in_vocab=300,
    n_out_vocab=200,  # pads to 256: 2 LM tiles of 128
    bias=True,
)
T = CFG.block_size


@pytest.fixture(scope="module")
def setup():
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
    rng = np.random.RandomState(3)
    ids = jnp.asarray(
        rng.randint(0, CFG.n_in_vocab, size=T).astype(np.int32)
    )
    x_emb = jnp.take(params["wte"][0], ids, axis=0)
    return params, x_emb


def test_supports():
    assert kpre.supports_fused_prefill(CFG, T)
    assert kpre.supports_fused_prefill(CFG, T // 2)  # short ctx pads
    assert not kpre.supports_fused_prefill(CFG, T + 1)  # over cache len
    odd = gpt.GPTConfig(
        n_layer=2, n_head=3, n_embd=192, block_size=512,
        n_in_vocab=10, n_out_vocab=10,
    )
    assert not kpre.supports_fused_prefill(odd, 512)  # odd head count


@pytest.mark.parametrize("n_valid", [5, 256, 300, T])
def test_matches_xla_prefill(setup, n_valid):
    params, x_emb = setup
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    ref_lg, ref_k, ref_v = gpt.prefill(
        CFG, params, x_emb, kc, vc, jnp.int32(n_valid)
    )
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    pp = kpre.prepare_prefill_params(CFG, params)
    lg, kk, vv = kpre.prefill_fused(
        CFG, pp, x_emb, kc, vc, jnp.int32(n_valid), interpret=True
    )
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ref_lg),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kk), np.asarray(ref_k),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(ref_v),
                               rtol=2e-4, atol=2e-4)


def test_short_context_pads(setup):
    """T < block_size (the production coarse window is 887 of 1024): the
    wrapper right-pads; live cache rows and logits must still match the
    unpadded XLA prefill (pad rows are causally invisible)."""
    params, x_emb = setup
    Tshort, n_valid = 384, 300
    xs = x_emb[:Tshort]
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    ref_lg, ref_k, ref_v = gpt.prefill(
        CFG, params, xs, kc, vc, jnp.int32(n_valid)
    )
    pp = kpre.prepare_prefill_params(CFG, params)
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    lg, kk, vv = kpre.prefill_fused(
        CFG, pp, xs, kc, vc, jnp.int32(n_valid), interpret=True
    )
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ref_lg),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kk)[:, :Tshort],
                               np.asarray(ref_k)[:, :Tshort],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vv)[:, :Tshort],
                               np.asarray(ref_v)[:, :Tshort],
                               rtol=2e-4, atol=2e-4)


def test_block_rounded_context_writes_partial_slab(setup):
    """T pads to the next 256-row block, NOT the cache length: a 200-row
    context computes 256 rows; cache rows [0,256) match the XLA prefill
    and rows [256, S) keep their prior content (decode-overwrite
    contract)."""
    params, x_emb = setup
    Tshort, n_valid = 200, 200
    xs = x_emb[:Tshort]
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    ref_lg, ref_k, ref_v = gpt.prefill(
        CFG, params, xs, kc, vc, jnp.int32(n_valid)
    )
    pp = kpre.prepare_prefill_params(CFG, params)
    kc = jnp.full_like(kc, 7.5)  # sentinel beyond the written block
    vc = jnp.full_like(vc, -3.25)
    lg, kk, vv = kpre.prefill_fused(
        CFG, pp, xs, kc, vc, jnp.int32(n_valid), interpret=True
    )
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ref_lg),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kk)[:, :Tshort],
                               np.asarray(ref_k)[:, :Tshort],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vv)[:, :Tshort],
                               np.asarray(ref_v)[:, :Tshort],
                               rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(kk)[:, 256:] == 7.5)
    assert np.all(np.asarray(vv)[:, 256:] == -3.25)


def test_lm_window_zeroing(setup):
    """Windowed head: in-window logits match, outside stays zero."""
    params, x_emb = setup
    lo, hi = 128, 200  # second tile only
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    ref_lg, _, _ = gpt.prefill(
        CFG, params, x_emb, kc, vc, jnp.int32(77)
    )
    pp = kpre.prepare_prefill_params(CFG, params, lm_window=(lo, hi))
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    lg, _, _ = kpre.prefill_fused(
        CFG, pp, x_emb, kc, vc, jnp.int32(77), interpret=True
    )
    np.testing.assert_allclose(np.asarray(lg)[128:200],
                               np.asarray(ref_lg)[128:200],
                               rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(lg)[:128] == 0.0)


def test_decode_continues_from_fused_prefill(setup):
    """Greedy decode after the fused prefill must match decode after the
    XLA prefill (the coarse window contract)."""
    params, x_emb = setup
    n_valid = 260

    def chain(prefill_fn):
        kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
        lg, kc, vc = prefill_fn(x_emb, kc, vc)
        toks = [int(jnp.argmax(lg))]
        tok = jnp.int32(toks[0] % CFG.n_in_vocab)
        for j in range(4):
            lg, kc, vc = gpt.decode_step(
                CFG, params, tok, kc, vc, jnp.int32(n_valid + j)
            )
            tok = jnp.argmax(lg).astype(jnp.int32) % CFG.n_in_vocab
            toks.append(int(tok))
        return toks

    pp = kpre.prepare_prefill_params(CFG, params)
    ref = chain(lambda x, k, v: gpt.prefill(
        CFG, params, x, k, v, jnp.int32(n_valid)))
    out = chain(lambda x, k, v: kpre.prefill_fused(
        CFG, pp, x, k, v, jnp.int32(n_valid), interpret=True))
    assert ref == out


def test_min_vmem_plan_matches(setup, monkeypatch):
    """The shrunken plan (ring 2, 128-row attention blocks) — what
    bark-large's 1024-row coarse window gets from _vmem_plan — must be
    numerically identical to the default plan."""
    params, x_emb = setup
    monkeypatch.setattr(kpre, "_vmem_plan", lambda *a: (2, 128, True))
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    ref_lg, ref_k, ref_v = gpt.prefill(
        CFG, params, x_emb, kc, vc, jnp.int32(300)
    )
    pp = kpre.prepare_prefill_params(CFG, params)
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    lg, kk, vv = kpre.prefill_fused(
        CFG, pp, x_emb, kc, vc, jnp.int32(300), interpret=True
    )
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ref_lg),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kk), np.asarray(ref_k),
                               rtol=2e-4, atol=2e-4)


def test_semantic_program_uses_fused_prefill(setup):
    """make_semantic_program picks the fused prefill when served by the
    fused decode kernel; temp-0 tokens must match the all-XLA program."""
    from bark_tpu.pipeline import semantic as semantic_pipe

    params, _ = setup
    svs = CFG.n_in_vocab - 44
    common = dict(
        temp=0.0, max_steps=6, semantic_vocab_size=svs,
    )
    ref_prog = semantic_pipe.make_semantic_program(CFG, **common)
    fn = kdec.select_decode_fn(CFG, use_pallas=True)
    assert kpre.pick_prefill(CFG, fn, False, 257) is not None
    fused_prog = semantic_pipe.make_semantic_program(
        CFG, decode_fn=fn, **common
    )
    toks513 = jnp.asarray(
        (np.arange(513) * 11 % CFG.n_in_vocab).astype(np.int32)
    )
    key = jax.random.PRNGKey(4)
    ref, n_ref = ref_prog(params, toks513, key, jnp.float32(2.0))
    out, n_out = fused_prog(params, toks513, key, jnp.float32(2.0))
    assert int(n_ref) == int(n_out)
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_fused_prefill_feeds_fused_decode(setup):
    """The production pair: Pallas prefill -> Pallas decode chain equals
    the all-XLA chain at temp 0."""
    params, x_emb = setup
    n_valid = 300

    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    lgx, kx, vx = gpt.prefill(
        CFG, params, x_emb, kc, vc, jnp.int32(n_valid)
    )
    pp = kpre.prepare_prefill_params(CFG, params)
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    lgk, kk, vk = kpre.prefill_fused(
        CFG, pp, x_emb, kc, vc, jnp.int32(n_valid), interpret=True
    )
    tokx = jnp.argmax(lgx).astype(jnp.int32) % CFG.n_in_vocab
    tokk = jnp.argmax(lgk).astype(jnp.int32) % CFG.n_in_vocab
    assert int(tokx) == int(tokk)
    for j in range(3):
        lgx, kx, vx = gpt.decode_step(
            CFG, params, tokx, kx, vx, jnp.int32(n_valid + j)
        )
        lgk, kk, vk = kdec.decode_step_fused(
            CFG, params, tokk, kk, vk, jnp.int32(n_valid + j),
            interpret=True,
        )
        tokx = jnp.argmax(lgx).astype(jnp.int32) % CFG.n_in_vocab
        tokk = jnp.argmax(lgk).astype(jnp.int32) % CFG.n_in_vocab
        assert int(tokx) == int(tokk)


def test_batched_matches_single_lane(setup):
    """prefill_fused_batched: each lane's logits and written cache rows
    must match the single-lane fused prefill at that lane's n_valid."""
    params, x_emb = setup
    B = 3
    n_valid = jnp.asarray([5, 130, 300], jnp.int32)
    rng = np.random.RandomState(7)
    x_b = jnp.stack([
        jnp.take(
            params["wte"][0],
            jnp.asarray(
                rng.randint(0, CFG.n_in_vocab, size=T).astype(np.int32)
            ),
            axis=0,
        )
        for _ in range(B)
    ])  # (B, T, D)

    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32, batch=B)
    logits_b, kcb, vcb = kpre.prefill_fused_batched(
        CFG, params, x_b, kc, vc, n_valid, interpret=True
    )
    for b in range(B):
        kc1, vc1 = gpt.init_kv_cache(CFG, dtype=jnp.float32)
        l1, kc1, vc1 = kpre.prefill_fused(
            CFG, params, x_b[b], kc1, vc1, n_valid[b], interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(logits_b)[b], np.asarray(l1), rtol=2e-5, atol=2e-5,
            err_msg=f"lane {b} logits",
        )
        rows = slice(0, int(n_valid[b]))
        np.testing.assert_allclose(
            np.asarray(kcb)[:, b, rows], np.asarray(kc1)[:, rows],
            rtol=2e-5, atol=2e-5, err_msg=f"lane {b} K",
        )
        np.testing.assert_allclose(
            np.asarray(vcb)[:, b, rows], np.asarray(vc1)[:, rows],
            rtol=2e-5, atol=2e-5, err_msg=f"lane {b} V",
        )


def test_batched_stage_program_uses_batched_prefill(setup, monkeypatch):
    """The batched semantic stage with the batched Pallas prefill must
    produce the same per-lane outputs as with it disabled (vmap XLA
    prefill)."""
    from bark_tpu.pipeline import semantic as sem_pipe

    params, _ = setup
    B = 2
    fn = kdec.select_decode_fn_batched(CFG, use_pallas=True)
    assert kpre.pick_prefill_batched(CFG, fn, False, 257, B) is not None
    rng = np.random.RandomState(11)
    tokens513 = jnp.asarray(
        rng.randint(0, CFG.n_in_vocab, size=(B, 513)).astype(np.int32)
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray([2, 9]))
    args = (params, tokens513, keys, jnp.float32(1.0))

    def build():
        return sem_pipe.make_semantic_program_batched(
            CFG, batch=B, temp=0.7, max_steps=6,
            semantic_vocab_size=CFG.n_out_vocab // 2, decode_fn=fn,
        )

    out_on, n_on = build()(*args)
    monkeypatch.setenv("BARK_TPU_PREFILL_B", "0")
    out_off, n_off = build()(*args)
    np.testing.assert_array_equal(np.asarray(n_on), np.asarray(n_off))
    np.testing.assert_array_equal(np.asarray(out_on), np.asarray(out_off))


def test_prepared_params_as_jit_argument(setup):
    """The stepped/streaming coarse window program passes PREPARED params
    across its jit boundary as an argument — the static lm-tile span must
    survive that (plain ints in the pytree become traced i32 scalars and
    the kernel's `range(lm_count)` raises TracerIntegerConversionError;
    hit for real by `bench.py --ttfa` on TPU, perf/r5/seq11.log)."""
    params, x_emb = setup
    kc, vc = gpt.init_kv_cache(CFG, dtype=jnp.float32)
    pp = kpre.prepare_prefill_params(CFG, params)

    @jax.jit
    def run(pp, x_emb, kc, vc, n_valid):
        return kpre.prefill_fused(
            CFG, pp, x_emb, kc, vc, n_valid, interpret=True
        )

    n_valid = 200
    lg, kk, vv = run(pp, x_emb, kc, vc, jnp.int32(n_valid))
    ref_lg, ref_k, ref_v = kpre.prefill_fused(
        CFG, pp, x_emb, kc, vc, jnp.int32(n_valid), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref_lg), rtol=1e-5, atol=1e-5
    )
