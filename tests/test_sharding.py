"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Checks that TP+DP sharded decode/prefill produce the same numbers as the
single-device path and that params actually land sharded (conftest forces
xla_force_host_platform_device_count=8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.models import gpt
from bark_tpu.parallel import sharding


@pytest.fixture(scope="module")
def setup():
    cfg = gpt.GPTConfig(
        n_layer=2, n_head=4, n_embd=64, block_size=32,
        n_in_vocab=96, n_out_vocab=64, bias=True,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_mesh_shapes():
    mesh = sharding.make_mesh(8, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        sharding.make_mesh(8, dp=3)


def test_params_are_sharded(setup):
    cfg, params = setup
    mesh = sharding.make_mesh(8, dp=2)
    sp = sharding.shard_gpt_params(mesh, cfg, params)
    qkv = sp["blocks"]["qkv_w"]
    # column-parallel: last dim split over tp=4
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(2, 64, 3 * 64 // 4)}
    # norms replicated
    assert sp["ln_f_g"].addressable_shards[0].data.shape == (64,)


def test_sharded_decode_matches_single_device(setup):
    cfg, params = setup
    mesh = sharding.make_mesh(8, dp=2)
    B = 4
    tokens = jnp.asarray(np.arange(B) + 3, jnp.int32)
    n_past = jnp.int32(5)

    # single-device reference, per batch row
    kc0, vc0 = gpt.init_kv_cache(cfg)
    refs = []
    for b in range(B):
        logits, _, _ = gpt.decode_step(
            cfg, params, tokens[b], kc0, vc0, n_past
        )
        refs.append(np.asarray(logits))
    ref = np.stack(refs)

    sp = sharding.shard_gpt_params(mesh, cfg, params)
    kc, vc = gpt.init_kv_cache(cfg, batch=B)
    step = sharding.make_batched_decode_step(cfg, mesh)
    logits, kc, vc = step(sp, tokens, kc, vc, n_past)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-5, atol=2e-5)


def test_sharded_prefill_then_decode(setup):
    cfg, params = setup
    mesh = sharding.make_mesh(8, dp=2)
    B, T = 2, 8
    rng = np.random.RandomState(0)
    toks = rng.randint(0, cfg.n_in_vocab, size=(B, T)).astype(np.int32)

    sp = sharding.shard_gpt_params(mesh, cfg, params)
    x_emb = jnp.take(params["wte"][0], jnp.asarray(toks), axis=0)
    kc, vc = gpt.init_kv_cache(cfg, batch=B)
    prefill = sharding.make_batched_prefill(cfg, mesh)
    n_valid = jnp.full((B,), T, jnp.int32)
    logits, kc, vc = prefill(sp, x_emb, kc, vc, n_valid)

    # reference: unbatched prefill per row
    for b in range(B):
        kc1, vc1 = gpt.init_kv_cache(cfg)
        x1 = jnp.take(params["wte"][0], jnp.asarray(toks[b]), axis=0)
        ref, _, _ = gpt.prefill(cfg, params, x1, kc1, vc1, jnp.int32(T))
        np.testing.assert_allclose(
            np.asarray(logits[b]), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    # decode continues from the sharded caches
    step = sharding.make_batched_decode_step(cfg, mesh)
    logits2, _, _ = step(
        sp, jnp.asarray([1, 2], jnp.int32), kc, vc, jnp.int32(T)
    )
    assert logits2.shape == (B, cfg.n_out_vocab)
    assert np.all(np.isfinite(np.asarray(logits2)))
