"""Model-size presets for Bark's three GPT stages and the EnCodec codec.

Real runs read hparams from ggml_weights.bin (SURVEY.md §2.4); these presets
exist for synthetic benchmarks, compile checks and capacity planning. Token
-space sizes are fixed by the Bark layout (bark.cpp:2202-2232): semantic
in-vocab 129600 (10048 text-offset ids + pads + infer token), semantic
out-vocab 10048, coarse vocab 12096 (10000 semantic + 2x1024 codebooks + pads
+ infer), fine vocab 1056. Depth/width follow the suno checkpoints: bark-small
is 12-layer/12-head/768-dim, bark (large) 24-layer/16-head/1024-dim, context
1024 everywhere.
"""

from __future__ import annotations

from bark_tpu.models.encodec import CodecConfig
from bark_tpu.models.gpt import GPTConfig

ENCODEC_24KHZ = CodecConfig(
    in_channels=1,
    hidden_dim=128,
    n_filters=32,
    kernel_size=7,
    residual_kernel_size=3,
    n_bins=1024,
    sample_rate=24000,
    n_q_total=32,
)


def _stages(n_layer: int, n_head: int, n_embd: int):
    common = dict(
        n_layer=n_layer, n_head=n_head, n_embd=n_embd, block_size=1024,
        bias=True,
    )
    return {
        "semantic": GPTConfig(
            n_in_vocab=129600, n_out_vocab=10048, **common
        ),
        "coarse": GPTConfig(n_in_vocab=12096, n_out_vocab=12096, **common),
        "fine": GPTConfig(
            n_in_vocab=1056,
            n_out_vocab=1056,
            n_lm_heads=7,
            n_wtes=8,
            **common,
        ),
    }


BARK_SMALL = _stages(n_layer=12, n_head=12, n_embd=768)
BARK_LARGE = _stages(n_layer=24, n_head=16, n_embd=1024)
