"""Generation parameters, verbosity levels and encoding steps.

Mirrors `bark_context_params` / `bark_verbosity_level` / `bark_encoding_step`
from the reference C API (/root/reference/bark.h:37-141) with the exact default
values of `bark_context_default_params` (/root/reference/bark.cpp:2202-2232).
These constants encode Bark's token-space layout and must not drift.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional


class Verbosity(enum.IntEnum):
    LOW = 0
    MEDIUM = 1
    HIGH = 2


class EncodingStep(enum.IntEnum):
    SEMANTIC = 0
    COARSE = 1
    FINE = 2


# progress_callback(context, step, progress_percent, user_data)
ProgressCallback = Callable[[object, EncodingStep, int, object], None]


@dataclasses.dataclass
class BarkContextParams:
    """Flat parameter struct, field-for-field with bark_context_params."""

    verbosity: Verbosity = Verbosity.LOW

    # sampling temperatures
    temp: float = 0.7
    fine_temp: float = 0.5

    # early-stop probability threshold for the semantic stage
    min_eos_p: float = 0.2

    # coarse sliding-window schedule
    sliding_window_size: int = 60
    max_coarse_history: int = 630

    # audio/codec
    sample_rate: int = 24000
    target_bandwidth: int = 6

    # tokenizer special ids (BERT vocab)
    cls_token_id: int = 101
    sep_token_id: int = 102

    # semantic stage
    n_steps_text_encoder: int = 768
    text_pad_token: int = 129595
    text_encoding_offset: int = 10048
    semantic_rate_hz: float = 49.9
    semantic_pad_token: int = 10000
    semantic_vocab_size: int = 10000
    semantic_infer_token: int = 129599

    # coarse stage
    coarse_rate_hz: float = 75.0
    coarse_infer_token: int = 12050
    coarse_semantic_pad_token: int = 12048
    n_coarse_codebooks: int = 2

    # fine stage
    n_fine_codebooks: int = 8
    codebook_size: int = 1024

    # progress reporting
    progress_callback: Optional[ProgressCallback] = None
    progress_callback_user_data: object = None

    # --- TPU-native extensions (not in the reference struct) ---
    # optional top-k / nucleus filtering for the semantic and coarse samplers
    # (suno's Python generate exposes these; the C++ reference does not —
    # 0 / 0.0 disables them, reproducing reference behavior)
    top_k: int = 0
    top_p: float = 0.0
    # dtype for GPT weights/compute: "float32" or "bfloat16"
    compute_dtype: str = "bfloat16"
    # dequantize quantized weights to compute_dtype at load (True) or keep
    # packed for the Pallas quantized-matmul path (False).
    dequantize_on_load: bool = True
    # None (auto): use the fused Pallas decode kernel (kernels/decode.py) on
    # TPU when the model shapes allow, XLA otherwise. True/False force it.
    use_pallas_decode: Optional[bool] = None
    # KV-cache storage: "params" (the compute dtype, default) or "int8"
    # (per-row-scaled low-bit cache, gpt.quantize_kv_rows) — halves (bf16)
    # or quarters (f32) the decode step's cache stream for a small, bounded
    # numeric perturbation of attention scores. The XLA and Pallas paths
    # quantize identically, so fused == stepped token equality still holds.
    # Ignored by the mesh-sharded serving programs (dense KV there).
    kv_cache_dtype: str = "params"
    # when set, each generate_audio call is wrapped in a jax.profiler trace
    # written under this directory (viewable in XProf/TensorBoard) — the
    # deep-dive counterpart of the reference's wall-clock statistics
    profile_dir: Optional[str] = None
    # True: run each coarse window / fine block as its own device program and
    # sync with the host in between, giving accurate per-stage wall times and
    # fine-grained progress callbacks (the reference's observability).
    # False (default): fuse each whole stage into one on-device program and
    # chain stages without host syncs — fastest path; per-stage timings then
    # report dispatch time only. Setting a progress_callback implies True.
    detailed_stats: bool = False
    # True: keep the fused whole-stage programs but force one host sync
    # after each stage, so t_semantic/t_coarse/t_fine are REAL device times
    # (stage sums ~= eval total) at the cost of ~3 extra syncs per call
    # (~27 ms each through the remote-TPU tunnel). The honest-timing mode
    # bench.py --stage-times uses; cheaper than detailed_stats (which syncs
    # per window/block).
    stage_sync: bool = False


def bark_context_default_params() -> BarkContextParams:
    """Equivalent of bark_context_default_params() (bark.cpp:2202-2232)."""
    return BarkContextParams()
