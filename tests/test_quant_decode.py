"""Packed-quantized decode (int8 + block scales in HBM, in-kernel dequant)
vs the dense XLA path on identically-dequantized weights.

With float32 compute the kernel's tile dequant (values*scales in f32) is
bit-identical to dequantize-at-load, so logits must agree to op-ordering
tolerance. Covers a symmetric format (q8_0) and an offset format (q5_1,
exercising the mins stream).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bark_tpu.io import ggml, loader
from bark_tpu.kernels import decode as kdec
from bark_tpu.models import gpt

D, L, S, V_IN, V_OUT = 128, 2, 64, 300, 200


def _section(qt: ggml.GGMLType, block_size: int = S, n_wtes: int = 1,
             n_lm_heads: int = 1) -> ggml.GPTSection:
    rng = np.random.default_rng(3)
    t = {}

    def add(name, arr, ttype):
        t[name] = ggml.TensorRecord.from_array(
            name, arr.astype(np.float32), ttype
        )

    def rnd(*shape):
        return rng.normal(0, 0.08, shape).astype(np.float32)

    for i in range(n_wtes):
        add(f"model/wte/{i}", rnd(V_IN, D), qt)
    add("model/wpe", rnd(block_size, D), ggml.GGMLType.F32)
    for i in range(n_lm_heads):
        add(f"model/lm_head/{i}", rnd(V_OUT, D), qt)
    add("model/ln_f/g", np.ones(D), ggml.GGMLType.F32)
    add("model/ln_f/b", rnd(D), ggml.GGMLType.F32)
    for i in range(L):
        add(f"model/h{i}/ln_1/g", np.ones(D), ggml.GGMLType.F32)
        add(f"model/h{i}/ln_1/b", rnd(D), ggml.GGMLType.F32)
        add(f"model/h{i}/ln_2/g", np.ones(D), ggml.GGMLType.F32)
        add(f"model/h{i}/ln_2/b", rnd(D), ggml.GGMLType.F32)
        add(f"model/h{i}/attn/c_attn/w", rnd(3 * D, D), qt)
        add(f"model/h{i}/attn/c_proj/w", rnd(D, D), qt)
        add(f"model/h{i}/mlp/c_fc/w", rnd(4 * D, D), qt)
        add(f"model/h{i}/mlp/c_proj/w", rnd(D, 4 * D), qt)
        add(f"model/h{i}/attn/c_attn/b", rnd(3 * D), ggml.GGMLType.F32)
        add(f"model/h{i}/attn/c_proj/b", rnd(D), ggml.GGMLType.F32)
        add(f"model/h{i}/mlp/c_fc/b", rnd(4 * D), ggml.GGMLType.F32)
        add(f"model/h{i}/mlp/c_proj/b", rnd(D), ggml.GGMLType.F32)
    hp = ggml.GPTHParams(
        n_layer=L, n_head=2, n_embd=D, block_size=block_size, bias=1,
        n_in_vocab=V_IN, n_out_vocab=V_OUT, n_lm_heads=n_lm_heads,
        n_wtes=n_wtes, ftype=int(qt),
    )
    return ggml.GPTSection(hparams=hp, tensors=t)


@pytest.mark.parametrize(
    "qt", [ggml.GGMLType.Q8_0, ggml.GGMLType.Q5_1, ggml.GGMLType.Q4_0]
)
def test_quant_kernel_matches_dense(qt):
    sec = _section(qt)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    cfg2, dense = loader.gpt_params_from_section(sec, jnp.float32)
    assert cfg == cfg2
    assert loader.section_is_quantized(sec)

    kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
    x_emb = jnp.take(dense["wte"][0], jnp.arange(5), axis=0)
    _, kc, vc = gpt.prefill(cfg, dense, x_emb, kc, vc, jnp.int32(5))

    tok, n_past = jnp.int32(17), jnp.int32(5)
    ref_l, ref_k, ref_v = gpt.decode_step(cfg, dense, tok, kc, vc, n_past)
    out_l, out_k, out_v = kdec.decode_step_fused(
        cfg, qpack, tok, kc, vc, n_past, quant=True, interpret=True
    )
    np.testing.assert_allclose(out_l, ref_l, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_k, ref_k, rtol=2e-4, atol=2e-4)
    assert int(jnp.argmax(out_l)) == int(jnp.argmax(ref_l))


def test_dense_from_qpack_matches_load_dequant():
    sec = _section(ggml.GGMLType.Q5_1)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    _, dense = loader.gpt_params_from_section(sec, jnp.float32)
    dense2 = loader.dense_from_qpack(cfg, qpack)
    flat1 = jax.tree_util.tree_leaves_with_path(dense)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(dense2)}
    for k, v in flat1:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat2[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k),
        )


@pytest.mark.parametrize(
    "qt", [ggml.GGMLType.Q8_0, ggml.GGMLType.Q4_1]
)
def test_fine_qpack_densifies_exactly(qt):
    """Multi-wte / multi-LM-head (fine-stage) qpack: on-device dequant must
    equal dequantize-at-load bit-for-bit, and fine_forward on the densified
    pack must match the dense path exactly."""
    sec = _section(qt, n_wtes=8, n_lm_heads=7)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    _, dense = loader.gpt_params_from_section(sec, jnp.float32)
    assert "lm_heads_q" in qpack and qpack["wte_q"].shape[0] == 8
    dense2 = loader.dense_from_qpack(cfg, qpack)
    flat1 = jax.tree_util.tree_leaves_with_path(dense)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(dense2)}
    for k, v in flat1:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat2[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k),
        )
    tokens = np.random.RandomState(0).randint(0, V_IN, (S, 8)).astype(np.int32)
    ref = gpt.fine_forward(cfg, dense, jnp.asarray(tokens), 3)
    out = gpt.fine_forward(cfg, dense2, jnp.asarray(tokens), 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fine_packed_e2e_parity(tmp_path):
    """File-level: loading a q8_0 model with dequantize_on_load=False packs
    the fine stage (int8 in HBM, per-call on-device dequant) and produces
    the SAME tokens/audio as the dense load for the same seed."""
    from bark_tpu.api.context import bark_load_model
    from tests.tiny_model import build_tiny_model, tiny_params

    src = tmp_path / "model.bin"
    dst = tmp_path / "model_q8.bin"
    ggml.write_model_file(str(src), build_tiny_model())
    from bark_tpu.io.quantize import model_quantize

    assert model_quantize(str(src), str(dst), int(ggml.GGMLFType.MOSTLY_Q8_0))

    a = bark_load_model(str(dst), tiny_params(), seed=11)
    b = bark_load_model(
        str(dst), tiny_params(dequantize_on_load=False), seed=11
    )
    # off-TPU the causal stages fall back to dense, but fine must pack
    assert b._packed["fine"] and "wte_q" in b.fine_params
    assert a.generate_audio("hello world")
    assert b.generate_audio("hello world")
    np.testing.assert_array_equal(a.fine_tokens, b.fine_tokens)
    np.testing.assert_array_equal(a.generated_audio, b.generated_audio)


def test_scale_stream_dtype_selection(monkeypatch):
    """Scales/mins ship as f16 BIT PATTERNS in int16 exactly when lossless
    (Mosaic cannot compile the f16 dtype itself): non-k formats always
    (their file scales ARE f16), k-quants only if every expanded d*sc
    product survives the f16 round-trip (generally not)."""
    for qt in (ggml.GGMLType.Q8_0, ggml.GGMLType.Q5_1):
        _, qpack = loader.gpt_qparams_from_section(_section(qt), jnp.float32)
        assert qpack["blocks"]["qkv_s"].dtype == jnp.int16
        assert qpack["wte_s"].dtype == jnp.int16
        # bit patterns decode back to the exact f32 scales
        s_i16 = np.asarray(qpack["blocks"]["qkv_s"])
        s_f32 = np.asarray(loader.scales_to_f32(qpack["blocks"]["qkv_s"]))
        np.testing.assert_array_equal(
            s_f32, s_i16.view(np.float16).astype(np.float32)
        )

    # the checker itself: an f16-inexact scale forces the f32 fallback
    ok = {"blocks": {"qkv_s": np.float32(np.float16([1.5, 2.0]))[None]}}
    assert loader._scales_f16_lossless(ok)
    bad = {"blocks": {"qkv_s": np.array([[1.0 + 2.0**-14]], np.float32)}}
    assert not loader._scales_f16_lossless(bad)
    # kill switch
    monkeypatch.setenv("BARK_TPU_SCALE_F16", "0")
    assert not loader._scales_f16_lossless(ok)


def test_kquant_scale_stream_stays_exact():
    """q4_k qpack: whatever scale dtype the loader picked, dense_from_qpack
    must still equal dequantize-at-load bit-for-bit (the f16 choice is only
    made when it is lossless)."""
    sec = _section(ggml.GGMLType.Q4_K)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    _, dense = loader.gpt_params_from_section(sec, jnp.float32)
    dense2 = loader.dense_from_qpack(cfg, qpack)
    np.testing.assert_array_equal(
        np.asarray(dense2["blocks"]["qkv_w"]),
        np.asarray(dense["blocks"]["qkv_w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(dense2["lm_head"]), np.asarray(dense["lm_head"])
    )
