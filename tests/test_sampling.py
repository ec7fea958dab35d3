"""Sampler filters: top-k and nucleus (top-p).

The reference sampler has no filtering (gpt_sample, bark.cpp:184-270); these
are the suno-Python-side options exposed as TPU-native extensions
(BarkContextParams.top_k/top_p, default off = reference behavior).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.ops import sampling


def test_top_k_restricts_support():
    logits = jnp.asarray([1.0, 5.0, 3.0, 4.0, -2.0, 0.5])
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    toks = {int(sampling.sample(k, logits, 1.0, top_k=3)[0]) for k in keys}
    assert toks <= {1, 2, 3}  # the three largest logits


def test_top_p_restricts_support():
    # one dominant token (prob ~0.96): nucleus 0.5 keeps only it
    logits = jnp.asarray([10.0, 5.0, 4.0, 3.0])
    keys = jax.random.split(jax.random.PRNGKey(1), 100)
    toks = {int(sampling.sample(k, logits, 1.0, top_p=0.5)[0]) for k in keys}
    assert toks == {0}
    # flat distribution: top_p=1.0 keeps everything
    flat = jnp.zeros((4,))
    toks = {int(sampling.sample(k, flat, 1.0, top_p=1.0)[0]) for k in keys}
    assert toks == {0, 1, 2, 3}


def test_top_p_nucleus_is_temperature_invariant():
    """suno filters the RAW logits with top_p before temperature scaling, so
    the surviving set must not depend on temp."""
    logits = jnp.asarray([3.0, 2.0, 1.0, 0.0, -1.0, -5.0])
    mask_cold = np.isfinite(np.asarray(sampling.apply_top_p(logits, 0.8)))
    keys = jax.random.split(jax.random.PRNGKey(2), 300)
    for temp in (0.2, 0.7, 1.5):
        toks = {
            int(sampling.sample(k, logits, temp, top_p=0.8)[0]) for k in keys
        }
        assert toks <= set(np.flatnonzero(mask_cold).tolist())


def test_top_p_duplicate_logits_split_by_sorted_index():
    """Removal is by sorted index with a shifted <= boundary (suno
    semantics): duplicate-valued logits straddling the cutoff must NOT all
    survive just because they tie with a kept one."""
    # four equal logits, each p=0.25. suno removes token i iff the
    # cumulative mass BEFORE it strictly exceeds top_p, so top_p=0.5 keeps
    # three (cum-before of the third is exactly 0.5) and top_p=0.49 keeps two.
    logits = jnp.zeros((4,))
    kept = np.isfinite(np.asarray(sampling.apply_top_p(logits, 0.5)))
    assert kept.sum() == 3
    kept = np.isfinite(np.asarray(sampling.apply_top_p(logits, 0.49)))
    assert kept.sum() == 2
    # the most probable token always survives, even for tiny top_p
    kept1 = np.isfinite(np.asarray(sampling.apply_top_p(logits, 1e-9)))
    assert kept1.sum() == 1


def test_filters_off_match_plain():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=64), jnp.float32)
    k = jax.random.PRNGKey(7)
    t0, e0 = sampling.sample(k, logits, 0.7)
    t1, e1 = sampling.sample(k, logits, 0.7, top_k=0, top_p=0.0)
    assert int(t0) == int(t1) and float(e0) == float(e1)


def test_eos_p_unaffected_by_filters():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=64), jnp.float32)
    k = jax.random.PRNGKey(3)
    _, e0 = sampling.sample(k, logits, 0.7)
    _, e1 = sampling.sample(k, logits, 0.7, top_k=5, top_p=0.9)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-6)


def test_pipeline_with_filters(tmp_path):
    import bark_tpu
    from bark_tpu.io import ggml
    from tests.tiny_model import build_tiny_model, tiny_params

    path = str(tmp_path / "w.bin")
    ggml.write_model_file(path, build_tiny_model())
    ctx = bark_tpu.bark_load_model(
        path, tiny_params(top_k=4, top_p=0.9), seed=0
    )
    assert ctx.generate_audio("hello world")
    assert ctx.get_audio_data_size() > 0
