"""Turn parsed ggml_weights.bin sections into JAX parameter pytrees.

Orientation note: ggml stores a matmul weight used as `ggml_mul_mat(W, x)`
with numpy-order shape (out_features, in_features). The TPU compute path
wants `x @ W`, so 2-D projection weights are transposed here, once, at load.
Embedding tables (wte, wpe) and LM heads keep their file orientation
(vocab/position-major) because they are used via gather / dot-transpose.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.io import quant
from bark_tpu.io.ggml import (
    QUANT_NAME,
    CodecSection,
    GGMLType as ggml_types,
    GPTSection,
)
from bark_tpu.models.gpt import GPTConfig, Params


def gpt_config_from_hparams(hp) -> GPTConfig:
    return GPTConfig(
        n_layer=hp.n_layer,
        n_head=hp.n_head,
        n_embd=hp.n_embd,
        block_size=hp.block_size,
        n_in_vocab=hp.n_in_vocab,
        n_out_vocab=hp.n_out_vocab,
        n_lm_heads=hp.n_lm_heads,
        n_wtes=hp.n_wtes,
        bias=bool(hp.bias),
        n_codes_given=hp.n_codes_given,
    )


def gpt_params_from_section(
    sec: GPTSection, dtype=jnp.float32, device=None
) -> Tuple[GPTConfig, Params]:
    hp = sec.hparams
    cfg = gpt_config_from_hparams(hp)
    L, D = cfg.n_layer, cfg.n_embd

    def get(name: str, shape, transpose=False) -> np.ndarray:
        """`shape` is the on-file (ggml) shape; transpose happens after the
        check, so a transposed weight comes back as shape[::-1].

        F16 tensors stay f16 on the host (zero-copy view of the mmap) — the
        upload then moves half the bytes and the cast to the compute dtype
        runs on-device, which for a multi-GB checkpoint is the difference
        between seconds and tens of seconds of load time."""
        rec = sec.tensors.get(name)
        if rec is None:
            return np.zeros(shape[::-1] if transpose else shape, np.float32)
        if rec.ttype in (ggml_types.F16, ggml_types.F32):
            dt = np.float16 if rec.ttype == ggml_types.F16 else np.float32
            arr = np.frombuffer(rec.data, dt).reshape(rec.shape)
        else:
            arr = rec.to_float32()
        if arr.shape != tuple(shape):
            raise ValueError(
                f"tensor {name}: shape {arr.shape} != expected {tuple(shape)}"
            )
        return arr.T if transpose else arr

    def stack(fmt: str, n: int, shape, transpose=False) -> np.ndarray:
        return np.stack(
            [get(fmt.format(i=i), shape, transpose) for i in range(n)]
        )

    blocks = {
        "ln1_g": stack("model/h{i}/ln_1/g", L, (D,)),
        "ln1_b": stack("model/h{i}/ln_1/b", L, (D,)),
        "ln2_g": stack("model/h{i}/ln_2/g", L, (D,)),
        "ln2_b": stack("model/h{i}/ln_2/b", L, (D,)),
        "qkv_w": stack("model/h{i}/attn/c_attn/w", L, (3 * D, D), True),
        "qkv_b": stack("model/h{i}/attn/c_attn/b", L, (3 * D,)),
        "proj_w": stack("model/h{i}/attn/c_proj/w", L, (D, D), True),
        "proj_b": stack("model/h{i}/attn/c_proj/b", L, (D,)),
        "fc_w": stack("model/h{i}/mlp/c_fc/w", L, (4 * D, D), True),
        "fc_b": stack("model/h{i}/mlp/c_fc/b", L, (4 * D,)),
        "out_w": stack("model/h{i}/mlp/c_proj/w", L, (D, 4 * D), True),
        "out_b": stack("model/h{i}/mlp/c_proj/b", L, (D,)),
    }
    # ln gains default to 1 when absent (they are always present in practice)
    params_np = {
        "wte": stack("model/wte/{i}", cfg.n_wtes, (cfg.n_in_vocab, D)),
        "wpe": get("model/wpe", (cfg.block_size, D)),
        "lm_head": stack(
            "model/lm_head/{i}", cfg.n_lm_heads, (cfg.n_out_vocab, D)
        ),
        "ln_f_g": get("model/ln_f/g", (D,)),
        "ln_f_b": get("model/ln_f/b", (D,)),
        "blocks": blocks,
    }

    def put(a: np.ndarray):
        # upload in the host dtype; the cast to the compute dtype happens
        # on-device in ONE jitted program below (per-leaf casts would each
        # compile a convert program — seconds apiece via a remote compiler)
        a = jnp.asarray(a)
        if device is not None:
            a = jax.device_put(a, device)
        return a

    params = jax.tree_util.tree_map(put, params_np)
    if any(
        leaf.dtype != dtype for leaf in jax.tree_util.tree_leaves(params)
    ):
        cast = jax.jit(
            lambda t: jax.tree.map(lambda x: x.astype(dtype), t),
            donate_argnums=0,
        )
        params = cast(params)
    return cfg, params


# ------------------------------------------------------ quantized serving


def section_is_quantized(sec: GPTSection) -> bool:
    """True when every 2-D projection weight the quantizer targets
    (SURVEY §2.7 regexes) is stored in a block type the packed-serving path
    can repack losslessly (per-32 scale granularity — ggml.PACKABLE_TYPES;
    q2_k/q3_k/q6_k have per-16 sub-scales and must dequantize at load)."""
    from bark_tpu.io.ggml import PACKABLE_TYPES

    names = [n for n in sec.tensors if n.endswith("/w") or "/wte/" in n
             or "/lm_head/" in n]
    return bool(names) and all(
        sec.tensors[n].ttype in PACKABLE_TYPES for n in names
    )


def gpt_qparams_from_section(sec: GPTSection, dtype=jnp.float32):
    """Build the packed-quantized param pytree for the Pallas decode kernel.

    Instead of dequantizing at load (the reference keeps weights quantized in
    RAM and dequantizes inside ggml matmul kernels), this keeps the big
    projection weights as (int8 values, f32 per-32-block scales[, mins]) in
    HBM; kernels/decode.py dequantizes tiles in VMEM. Norms, biases and wpe
    stay dense. Block axis conventions (blocks run along the file-contiguous
    input axis):

      blocks.*_q   (L, Din, Dout) i8     blocks.*_s (L, Din//32, Dout) f32
      wte_q        (n_wtes, V, D) i8     wte_s      (n_wtes, V, D//32) f32
      lm_q         (D, v_pad) i8         lm_s       (D//32, v_pad) f32
      [*_m mins, same shapes as *_s, when an offset format (q4_1/q5_1/
       q4_k/q5_k) is present]

    Single-head GPTs (semantic/coarse) store the LM head transposed+padded
    for the Pallas decode kernel. Multi-head GPTs (the fine stage: 8 wtes,
    7 LM heads) instead keep file orientation:

      lm_heads_q   (n_heads, V, D) i8    lm_heads_s (n_heads, V, D//32) f32

    and are served by dequantizing on-device per program invocation
    (dense_from_qpack) — the fine stage is whole-block forward passes, not
    kernel decode, so weights stay int8 in HBM between calls (4x smaller
    residency + upload than dense f32).

    Returns (cfg, qpack). Raises ValueError when a target tensor is not
    quantized (use gpt_params_from_section then).
    """
    hp = sec.hparams
    cfg = gpt_config_from_hparams(hp)
    L, D = cfg.n_layer, cfg.n_embd
    v_pad = -(-cfg.n_out_vocab // D) * D

    has_min = any(
        rec.ttype in QUANT_NAME
        and QUANT_NAME[rec.ttype] in ("q4_1", "q5_1", "q4_k", "q5_k")
        for rec in sec.tensors.values()
    )

    def unpack(name, file_shape):
        rec = sec.tensors.get(name)
        if rec is None or rec.ttype not in QUANT_NAME:
            raise ValueError(f"tensor {name} is not block-quantized")
        n = int(np.prod(file_shape))
        q, s, m = quant.repack_to_int8(
            np.frombuffer(bytes(rec.data), np.uint8),
            QUANT_NAME[rec.ttype],
            n,
        )
        rows, cols = file_shape
        return (
            q.reshape(rows, cols),
            s.reshape(rows, cols // 32),
            m.reshape(rows, cols // 32),
        )

    def dense(name, shape):
        rec = sec.tensors.get(name)
        if rec is None:
            return np.zeros(shape, np.float32)
        return rec.to_float32()

    def proj(name, file_shape):
        """Transposed (in, out) packed weight from the (out, in) file tensor."""
        q, s, m = unpack(name, file_shape)
        return q.T, s.T, m.T

    qkv = [proj(f"model/h{i}/attn/c_attn/w", (3 * D, D)) for i in range(L)]
    prj = [proj(f"model/h{i}/attn/c_proj/w", (D, D)) for i in range(L)]
    fc = [proj(f"model/h{i}/mlp/c_fc/w", (4 * D, D)) for i in range(L)]
    out = [proj(f"model/h{i}/mlp/c_proj/w", (D, 4 * D)) for i in range(L)]

    def stack3(triples):
        return (
            np.stack([t[0] for t in triples]),
            np.stack([t[1] for t in triples]),
            np.stack([t[2] for t in triples]),
        )

    blocks = {
        "ln1_g": np.stack([dense(f"model/h{i}/ln_1/g", (D,)) for i in range(L)]),
        "ln1_b": np.stack([dense(f"model/h{i}/ln_1/b", (D,)) for i in range(L)]),
        "ln2_g": np.stack([dense(f"model/h{i}/ln_2/g", (D,)) for i in range(L)]),
        "ln2_b": np.stack([dense(f"model/h{i}/ln_2/b", (D,)) for i in range(L)]),
        "qkv_b": np.stack([dense(f"model/h{i}/attn/c_attn/b", (3 * D,)) for i in range(L)]),
        "proj_b": np.stack([dense(f"model/h{i}/attn/c_proj/b", (D,)) for i in range(L)]),
        "fc_b": np.stack([dense(f"model/h{i}/mlp/c_fc/b", (4 * D,)) for i in range(L)]),
        "out_b": np.stack([dense(f"model/h{i}/mlp/c_proj/b", (D,)) for i in range(L)]),
    }
    for key, triples in (("qkv", qkv), ("proj", prj), ("fc", fc), ("out", out)):
        q, s, m = stack3(triples)
        blocks[f"{key}_q"], blocks[f"{key}_s"] = q, s
        if has_min:
            blocks[f"{key}_m"] = m

    wtes = [
        unpack(f"model/wte/{i}", (cfg.n_in_vocab, D))
        for i in range(cfg.n_wtes)
    ]
    heads = [
        unpack(f"model/lm_head/{i}", (cfg.n_out_vocab, D))
        for i in range(cfg.n_lm_heads)
    ]
    qpack = {
        "wte_q": np.stack([t[0] for t in wtes]),
        "wte_s": np.stack([t[1] for t in wtes]),
        "wpe": dense("model/wpe", (cfg.block_size, D)),
        "ln_f_g": dense("model/ln_f/g", (D,)),
        "ln_f_b": dense("model/ln_f/b", (D,)),
        "blocks": blocks,
    }
    if has_min:
        qpack["wte_m"] = np.stack([t[2] for t in wtes])
    if cfg.n_lm_heads == 1:
        lq, ls, lm_m = heads[0]
        # transpose + right-pad the LM head to (D, v_pad) for the kernel
        lm_q = np.zeros((D, v_pad), np.int8)
        lm_s = np.zeros((D // 32, v_pad), np.float32)
        lm_mm = np.zeros((D // 32, v_pad), np.float32)
        lm_q[:, : cfg.n_out_vocab] = lq.T
        lm_s[:, : cfg.n_out_vocab] = ls.T
        lm_mm[:, : cfg.n_out_vocab] = lm_m.T
        qpack["lm_q"], qpack["lm_s"] = lm_q, lm_s
        if has_min:
            qpack["lm_m"] = lm_mm
    else:
        qpack["lm_heads_q"] = np.stack([t[0] for t in heads])
        qpack["lm_heads_s"] = np.stack([t[1] for t in heads])
        if has_min:
            qpack["lm_heads_m"] = np.stack([t[2] for t in heads])

    # int8 values stay int8; dense small tensors go to the compute dtype.
    # Scales/mins ship as f16 when that is LOSSLESS (true for q4_0/q4_1/
    # q5_0/q5_1/q8_0, whose file scales are f16 to begin with) — this
    # halves the per-tile scale-stream bytes of the Pallas decode kernel,
    # which for the offset formats is the difference between matching q8_0
    # and trailing it by ~8% (ROADMAP r2). Mosaic cannot compile f16 in
    # kernels (measured r3: even a trivial f16 DMA+convert kernel fails),
    # so the f16 BIT PATTERNS ship as int16 and the kernel decodes them
    # with exact integer ops (kernels/decode._f16_bits_to_f32). k-quant
    # scales are d(f16)*sc (6-bit) products that generally don't fit f16,
    # so they keep f32; either way the kernel dequantizes in f32 and stays
    # bit-identical to dequantize-at-load.
    f16_ok = _scales_f16_lossless(qpack)

    def put2(path, a):
        if a.dtype == np.int8:
            return jnp.asarray(a)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.endswith("_s") or name.endswith("_m"):
            if f16_ok:
                return jnp.asarray(a.astype(np.float16).view(np.int16))
            return jnp.asarray(a, jnp.float32)
        return jnp.asarray(a, dtype)

    qpack = jax.tree_util.tree_map_with_path(put2, qpack)
    return cfg, qpack


def scales_to_f32(s):
    """Scale/min leaf -> f32: int16 leaves are f16 bit patterns (see
    gpt_qparams_from_section); bitcast+upcast is exact."""
    if s.dtype == jnp.int16:
        return jax.lax.bitcast_convert_type(s, jnp.float16).astype(
            jnp.float32
        )
    return s.astype(jnp.float32)


def _scales_f16_lossless(qpack_np) -> bool:
    """True iff every scale/min leaf of a host-side qpack round-trips
    through f16 exactly (then the f16 stream dequantizes bit-identically).
    Disable with BARK_TPU_SCALE_F16=0 (kill switch for debugging)."""
    import os

    if os.environ.get("BARK_TPU_SCALE_F16", "1") == "0":
        return False

    def leaves(d):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from leaves(v)
            elif k.endswith("_s") or k.endswith("_m"):
                yield v

    return all(
        np.array_equal(a, a.astype(np.float16).astype(np.float32))
        for a in leaves(qpack_np)
    )


def dense_from_qpack(cfg: GPTConfig, qp, dtype=None):
    """Dequantize a qpack to the dense Params pytree (inside jit; used for
    prefill). Bit-identical to dequantize-at-load: values*scales in f32 then
    a single cast to the compute dtype."""
    blocks = qp["blocks"]
    dtype = dtype or qp["wpe"].dtype
    has_min = "wte_m" in qp

    def dq(q, s, m, block_axis):
        # scales may ship as f16 bit patterns in int16 (lossless, see
        # gpt_qparams_from_section); decode before the f32 arithmetic
        s32 = jnp.repeat(scales_to_f32(s), 32, axis=block_axis)
        w = q.astype(jnp.float32) * s32
        if m is not None:
            w = w + jnp.repeat(scales_to_f32(m), 32, axis=block_axis)
        return w.astype(dtype)

    def b(key, axis):
        return dq(
            blocks[f"{key}_q"],
            blocks[f"{key}_s"],
            blocks.get(f"{key}_m"),
            axis,
        )

    wte = dq(qp["wte_q"], qp["wte_s"], qp.get("wte_m"), 2)
    if "lm_heads_q" in qp:  # multi-head (fine stage): file orientation
        lm_head = dq(qp["lm_heads_q"], qp["lm_heads_s"],
                     qp.get("lm_heads_m"), 2)  # (n_heads, V, D)
    else:
        lm_t = dq(qp["lm_q"], qp["lm_s"], qp.get("lm_m"), 0)  # (D, v_pad)
        lm_head = lm_t[:, : cfg.n_out_vocab].T[None]
    del has_min
    return {
        "wte": wte,
        "wpe": qp["wpe"],
        "lm_head": lm_head,
        "ln_f_g": qp["ln_f_g"],
        "ln_f_b": qp["ln_f_b"],
        "blocks": {
            "ln1_g": blocks["ln1_g"], "ln1_b": blocks["ln1_b"],
            "ln2_g": blocks["ln2_g"], "ln2_b": blocks["ln2_b"],
            "qkv_w": b("qkv", 1), "qkv_b": blocks["qkv_b"],
            "proj_w": b("proj", 1), "proj_b": blocks["proj_b"],
            "fc_w": b("fc", 1), "fc_b": blocks["fc_b"],
            "out_w": b("out", 1), "out_b": blocks["out_b"],
        },
    }
