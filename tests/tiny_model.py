"""A tiny random Bark model in the ggml_weights.bin layout for e2e tests.

Shrinks every dimension of the real bark-small (SURVEY.md §2.4) while keeping
all structural invariants: three GPT sections (semantic/coarse/fine), a codec
section with SEANet decoder+encoder/LSTM/RVQ tensors, the 513-token prompt
layout, the coarse token-space offsets, and the fine 8-channel layout. The
token space is scaled down via a custom BarkContextParams.
"""

from __future__ import annotations

import numpy as np

from bark_tpu.io import ggml
from bark_tpu.params import BarkContextParams

# tiny token space
SEMANTIC_VOCAB = 16
CODEBOOK = 8
TEXT_OFFSET = 100
TEXT_PAD = 180
SEMANTIC_PAD = 16
SEMANTIC_INFER = 181
COARSE_SEM_PAD = 32
COARSE_INFER = 33

VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    + ["hello", "world", "he", "##llo", "##rld", "wo", "a", "the"]
    + [f"tok{i}" for i in range(20)]
)


def tiny_params(**overrides) -> BarkContextParams:
    base = dict(
        temp=0.7,
        fine_temp=0.5,
        min_eos_p=2.0,  # disable the eos_p stop; tiny out-vocab has no EOS id
        sliding_window_size=60,
        max_coarse_history=60,
        n_steps_text_encoder=12,
        text_pad_token=TEXT_PAD,
        text_encoding_offset=TEXT_OFFSET,
        semantic_pad_token=SEMANTIC_PAD,
        semantic_vocab_size=SEMANTIC_VOCAB,
        semantic_infer_token=SEMANTIC_INFER,
        coarse_infer_token=COARSE_INFER,
        coarse_semantic_pad_token=COARSE_SEM_PAD,
        codebook_size=CODEBOOK,
        compute_dtype="float32",
    )
    base.update(overrides)
    return BarkContextParams(**base)


def _gpt_section(
    rng: np.random.Generator,
    *,
    n_layer: int,
    n_head: int,
    n_embd: int,
    block_size: int,
    n_in_vocab: int,
    n_out_vocab: int,
    n_lm_heads: int = 1,
    n_wtes: int = 1,
    bias: bool = True,
    scale: float = 0.08,
) -> ggml.GPTSection:
    D = n_embd
    t = {}

    def add(name, arr, ttype=ggml.GGMLType.F32):
        t[name] = ggml.TensorRecord.from_array(
            name, arr.astype(np.float32), ttype
        )

    def rnd(*shape):
        return rng.normal(0, scale, shape).astype(np.float32)

    for i in range(n_wtes):
        add(f"model/wte/{i}", rnd(n_in_vocab, D))
    add("model/wpe", rnd(block_size, D))
    for i in range(n_lm_heads):
        add(f"model/lm_head/{i}", rnd(n_out_vocab, D))
    add("model/ln_f/g", np.ones(D))
    add("model/ln_f/b", np.zeros(D))
    for i in range(n_layer):
        add(f"model/h{i}/ln_1/g", np.ones(D))
        add(f"model/h{i}/ln_1/b", np.zeros(D))
        add(f"model/h{i}/ln_2/g", np.ones(D))
        add(f"model/h{i}/ln_2/b", np.zeros(D))
        # ggml stores matmul weights (out_features, in_features)
        add(f"model/h{i}/attn/c_attn/w", rnd(3 * D, D))
        add(f"model/h{i}/attn/c_proj/w", rnd(D, D))
        add(f"model/h{i}/mlp/c_fc/w", rnd(4 * D, D))
        add(f"model/h{i}/mlp/c_proj/w", rnd(D, 4 * D))
        if bias:
            add(f"model/h{i}/attn/c_attn/b", rnd(3 * D))
            add(f"model/h{i}/attn/c_proj/b", rnd(D))
            add(f"model/h{i}/mlp/c_fc/b", rnd(4 * D))
            add(f"model/h{i}/mlp/c_proj/b", rnd(D))

    hp = ggml.GPTHParams(
        n_layer=n_layer,
        n_head=n_head,
        n_embd=n_embd,
        block_size=block_size,
        bias=int(bias),
        n_in_vocab=n_in_vocab,
        n_out_vocab=n_out_vocab,
        n_lm_heads=n_lm_heads,
        n_wtes=n_wtes,
        ftype=0,
    )
    return ggml.GPTSection(hparams=hp, tensors=t)


def _codec_section(
    rng: np.random.Generator,
    *,
    hidden_dim: int = 16,
    n_filters: int = 2,
    n_bins: int = CODEBOOK,
    n_q: int = 8,
    kernel_size: int = 7,
    residual_kernel_size: int = 3,
    scale: float = 0.15,
) -> ggml.CodecSection:
    t = {}

    def add(name, arr):
        t[name] = ggml.TensorRecord.from_array(
            name, arr.astype(np.float32), ggml.GGMLType.F32
        )

    def rnd(*shape):
        return rng.normal(0, scale, shape).astype(np.float32)

    ratios = (8, 5, 4, 2)
    mult = 2 ** len(ratios)  # decoder starting channel multiplier

    def conv(name, cout, cin, k):
        add(f"{name}.weight", rnd(cout, cin, k))
        add(f"{name}.bias", rnd(cout))

    def lstm(prefix, dim):
        for l in (0, 1):
            add(f"{prefix}.lstm.weight_ih_l{l}", rnd(4 * dim, dim))
            add(f"{prefix}.lstm.weight_hh_l{l}", rnd(4 * dim, dim))
            add(f"{prefix}.lstm.bias_ih_l{l}", rnd(4 * dim))
            add(f"{prefix}.lstm.bias_hh_l{l}", rnd(4 * dim))

    def res_unit(prefix, dim):
        conv(f"{prefix}.block.1.conv.conv", dim // 2, dim, residual_kernel_size)
        conv(f"{prefix}.block.3.conv.conv", dim, dim // 2, 1)
        conv(f"{prefix}.shortcut.conv.conv", dim, dim, 1)

    # ---- decoder: model.0 conv_in, model.1 lstm, stages at (3,4)(6,7)...
    C = n_filters * mult  # 32 with n_filters=2
    conv("decoder.model.0.conv.conv", C, hidden_dim, kernel_size)
    lstm("decoder.model.1", C)
    for i, r in enumerate(ratios):
        convtr_idx = 3 + 3 * i
        add(
            f"decoder.model.{convtr_idx}.convtr.convtr.weight",
            rnd(C, C // 2, 2 * r),  # torch ConvTranspose1d (Cin, Cout, K)
        )
        add(f"decoder.model.{convtr_idx}.convtr.convtr.bias", rnd(C // 2))
        res_unit(f"decoder.model.{convtr_idx + 1}", C // 2)
        C //= 2
    conv("decoder.model.15.conv.conv", 1, C, kernel_size)

    # ---- encoder: model.0 conv_in, stages, model.13 lstm, model.15 conv_out
    C = n_filters
    conv("encoder.model.0.conv.conv", C, 1, kernel_size)
    for i, r in enumerate(reversed(ratios)):
        res_idx = 1 + 3 * i
        res_unit(f"encoder.model.{res_idx}", C)
        conv(f"encoder.model.{res_idx + 2}.conv.conv", 2 * C, C, 2 * r)
        C *= 2
    lstm("encoder.model.13", C)
    conv("encoder.model.15.conv.conv", hidden_dim, C, kernel_size)

    # ---- RVQ codebooks
    for q in range(n_q):
        add(f"quantizer.vq.layers.{q}._codebook.embed", rnd(n_bins, hidden_dim))

    hp = ggml.CodecHParams(
        in_channels=1,
        hidden_dim=hidden_dim,
        n_filters=n_filters,
        kernel_size=kernel_size,
        residual_kernel_size=residual_kernel_size,
        n_bins=n_bins,
        bandwidth=6,
        sample_rate=24000,
        ftype=0,
    )
    return ggml.CodecSection(hparams=hp, tensors=t)


def build_tiny_model(seed: int = 1234, n_embd: int = 32) -> ggml.ModelFile:
    """n_embd=256 builds a (slower) variant whose weight rows are k-quant
    compatible (super-blocks of 256 must not straddle rows)."""
    rng = np.random.default_rng(seed)
    semantic = _gpt_section(
        rng,
        n_layer=2,
        n_head=2,
        n_embd=n_embd,
        block_size=320,
        n_in_vocab=SEMANTIC_INFER + 1,
        n_out_vocab=SEMANTIC_VOCAB,  # no EOS id reachable; see tiny_params
    )
    coarse = _gpt_section(
        rng,
        n_layer=2,
        n_head=2,
        n_embd=n_embd,
        block_size=384,
        n_in_vocab=COARSE_INFER + 1,
        n_out_vocab=SEMANTIC_VOCAB + 2 * CODEBOOK,
    )
    fine = _gpt_section(
        rng,
        n_layer=2,
        n_head=2,
        n_embd=n_embd,
        block_size=64,
        n_in_vocab=CODEBOOK + 1,
        n_out_vocab=CODEBOOK + 1,
        n_lm_heads=7,
        n_wtes=8,
    )
    codec = _codec_section(rng)
    return ggml.ModelFile(
        vocab=VOCAB, semantic=semantic, coarse=coarse, fine=fine, codec=codec
    )
