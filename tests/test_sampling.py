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
