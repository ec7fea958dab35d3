"""bark_tpu — a TPU-native text-to-speech framework with the capabilities of bark.cpp.

Text is tokenized with a BERT WordPiece tokenizer and fed through Bark's three
GPT-2-style stages — the autoregressive *semantic* and *coarse* decoders (with
HBM-resident KV caches and fully on-device sampling loops) and the non-causal
*fine* stage — whose residual-vector-quantized codes are decoded to a 24 kHz
waveform by an EnCodec decoder (RVQ codebook-sum, SEANet causal conv stack,
LSTM, transposed convs). Everything in the compute path is JAX/XLA/Pallas;
the public API mirrors the 10-function C surface of bark.h
(/root/reference/bark.h:148-239).
"""

__version__ = "0.1.0"

from bark_tpu.params import (  # noqa: F401
    BarkContextParams,
    Verbosity,
    EncodingStep,
    bark_context_default_params,
)

def __getattr__(name):
    # Defer the API import: it pulls in jax, which is heavy, and tooling that
    # only needs the format/tokenizer layers shouldn't pay for it.
    _api_names = {
        "BarkContext",
        "bark_load_model",
        "bark_generate_audio",
        "bark_get_audio_data",
        "bark_get_audio_data_size",
        "bark_get_load_time",
        "bark_get_eval_time",
        "bark_reset_statistics",
        "bark_model_quantize",
        "bark_free",
        "bark_save_voice",
    }
    if name in _api_names:
        from bark_tpu.api import context as _ctx

        return getattr(_ctx, name)
    if name in ("VoicePreset", "load_voice_preset", "save_voice_preset"):
        from bark_tpu.pipeline import voice as _voice

        return getattr(_voice, name)
    raise AttributeError(f"module 'bark_tpu' has no attribute '{name}'")
