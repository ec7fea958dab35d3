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

from bark_tpu.io.ggml import GPTSection, CodecSection
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
        check, so a transposed weight comes back as shape[::-1]."""
        rec = sec.tensors.get(name)
        if rec is None:
            return np.zeros(shape[::-1] if transpose else shape, np.float32)
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
        a = jnp.asarray(a, dtype)
        if device is not None:
            a = jax.device_put(a, device)
        return a

    return cfg, jax.tree_util.tree_map(put, params_np)
