"""AOT program cache (utils/aot.py): exported stage programs round-trip.

Warm starts re-trace/re-lower every stage program (97% of a measured
warm start, perf/r5/seq11.log); aot_jit serializes the lowered module to
disk and a fresh wrapper must reload it instead of re-tracing. CPU here
(interpret-mode shapes); the on-TPU validation is the seq13 warm-start
A/B."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.utils import aot


def _fn(params, x):
    def body(c, _):
        return jnp.tanh(c @ params), ()
    out, _ = jax.lax.scan(body, x, None, length=4)
    return out


@pytest.fixture()
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("BARK_TPU_AOT", "1")
    monkeypatch.setenv("BARK_TPU_AOT_DIR", str(tmp_path))
    return tmp_path


def test_disabled_on_cpu_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("BARK_TPU_AOT", raising=False)
    monkeypatch.setenv("BARK_TPU_AOT_DIR", str(tmp_path))
    f = aot.aot_jit("t0", _fn)
    p = jnp.eye(8, dtype=jnp.float32)
    x = jnp.ones((1, 8), jnp.float32)
    np.testing.assert_allclose(f(p, x), _fn(p, x), rtol=1e-6)
    assert not list(tmp_path.iterdir())  # no blobs written on CPU default


def test_export_roundtrip_and_hit(aot_env):
    p = jnp.eye(8, dtype=jnp.float32) * 0.5
    x = jnp.ones((1, 8), jnp.float32)
    f1 = aot.aot_jit("t1", _fn, fingerprint="v1")
    want = np.asarray(f1(p, x))
    blobs = [q for q in os.listdir(aot_env) if q.endswith(".jaxexp")]
    assert len(blobs) == 1, blobs

    # a FRESH wrapper (fresh process stand-in) must reload, not re-export
    f2 = aot.aot_jit("t1", _fn, fingerprint="v1")
    got = np.asarray(f2(p, x))
    np.testing.assert_array_equal(got, want)
    assert len([q for q in os.listdir(aot_env)
                if q.endswith(".jaxexp")]) == 1
    # and it really used the artifact, not a silent jit fallback
    sig = aot._sig((p, x))
    assert f2._calls[sig] is not f2._jit


def test_key_separates_fingerprint_shape_and_knobs(aot_env, monkeypatch):
    p = jnp.eye(8, dtype=jnp.float32)
    x = jnp.ones((1, 8), jnp.float32)
    aot.aot_jit("t2", _fn, fingerprint="a")(p, x)
    aot.aot_jit("t2", _fn, fingerprint="b")(p, x)  # new key
    aot.aot_jit("t2", _fn, fingerprint="a")(
        p, jnp.ones((2, 8), jnp.float32)
    )  # new signature
    monkeypatch.setenv("BARK_TPU_SEM_CHUNK", "48")
    aot.aot_jit("t2", _fn, fingerprint="a")(p, x)  # new env knob
    assert len([q for q in os.listdir(aot_env)
                if q.endswith(".jaxexp")]) == 4


def test_corrupt_blob_reexports(aot_env):
    p = jnp.eye(8, dtype=jnp.float32)
    x = jnp.ones((1, 8), jnp.float32)
    f1 = aot.aot_jit("t3", _fn)
    want = np.asarray(f1(p, x))
    (blob,) = [q for q in os.listdir(aot_env) if q.endswith(".jaxexp")]
    path = os.path.join(aot_env, blob)
    with open(path, "wb") as fh:
        fh.write(b"garbage")
    f2 = aot.aot_jit("t3", _fn)
    np.testing.assert_array_equal(np.asarray(f2(p, x)), want)


def test_tracer_args_fall_back_to_jit(aot_env):
    """vmap of a stage program traces through the wrapper (the batched
    fine/codec programs do this) — must inline, not export."""
    p = jnp.eye(8, dtype=jnp.float32)
    xs = jnp.ones((3, 1, 8), jnp.float32)
    f = aot.aot_jit("t4", _fn)
    out = jax.vmap(f, in_axes=(None, 0))(p, xs)
    assert out.shape == (3, 1, 8)
    assert not [q for q in os.listdir(aot_env) if q.startswith("t4")]


def test_tiny_generate_with_aot(aot_env, tmp_path):
    """Full tiny-model generate with the AOT cache on: audio must be
    identical to the plain-jit pipeline, and the stage blobs must land."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import bark_tpu
    from bark_tpu.io import ggml
    from tiny_model import build_tiny_model, tiny_params

    wpath = str(tmp_path / "weights.bin")
    ggml.write_model_file(wpath, build_tiny_model())
    ctx = bark_tpu.bark_load_model(wpath, tiny_params(), seed=0)
    assert bark_tpu.bark_generate_audio(ctx, "hello world", 2)
    audio_aot = np.asarray(bark_tpu.bark_get_audio_data(ctx))

    os.environ["BARK_TPU_AOT"] = "0"
    try:
        ctx2 = bark_tpu.bark_load_model(wpath, tiny_params(), seed=0)
        assert bark_tpu.bark_generate_audio(ctx2, "hello world", 2)
        audio_jit = np.asarray(bark_tpu.bark_get_audio_data(ctx2))
    finally:
        os.environ["BARK_TPU_AOT"] = "1"
    np.testing.assert_array_equal(audio_aot, audio_jit)
    names = {q.split("-")[0] for q in os.listdir(aot_env)}
    assert {"sem_stage", "coarse_stage", "fine_stage", "codec"} <= names
