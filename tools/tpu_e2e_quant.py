"""TPU e2e smoke: quantized model file -> packed serving -> temp-0 parity.

Builds a small kernel-eligible (lane-aligned) model, quantizes it to q5_0
with the file->file quantizer, then generates twice on the real TPU:
once with dequantize-at-load (dense weights) and once packed
(dequantize_on_load=False, int8+scales streamed through the Pallas decode
kernel). At temp 0 both paths must produce bit-identical tokens and audio.

Run on a TPU host:  python tools/tpu_e2e_quant.py
(CPU tests cover the same components piecewise; this drives the full
quantized serving path on hardware.)
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import bark_tpu
from bark_tpu.io import ggml
from bark_tpu.params import BarkContextParams

# aligned tiny model: D=128 (kernel-eligible), block 320
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_quant_decode import _section, V_IN, V_OUT
from tests.tiny_model import _codec_section  # reuse codec fixture
import tests.tiny_model as tm

rng = np.random.default_rng(7)
sem = _section(ggml.GGMLType.F32, block_size=320)
coarse = _section(ggml.GGMLType.F32, block_size=320)
# fine: small dense (kernel not used there)
fine_t = {}
def addf(name, arr):
    fine_t[name] = ggml.TensorRecord.from_array(name, arr.astype(np.float32), ggml.GGMLType.F32)
D= 32
for i in range(8): addf(f"model/wte/{i}", rng.normal(0,.08,(9, D)))
addf("model/wpe", rng.normal(0,.08,(64, D)))
for i in range(7): addf(f"model/lm_head/{i}", rng.normal(0,.08,(9, D)))
addf("model/ln_f/g", np.ones(D)); addf("model/ln_f/b", np.zeros(D))
for i in range(2):
    addf(f"model/h{i}/ln_1/g", np.ones(D)); addf(f"model/h{i}/ln_1/b", np.zeros(D))
    addf(f"model/h{i}/ln_2/g", np.ones(D)); addf(f"model/h{i}/ln_2/b", np.zeros(D))
    addf(f"model/h{i}/attn/c_attn/w", rng.normal(0,.08,(3*D, D)))
    addf(f"model/h{i}/attn/c_proj/w", rng.normal(0,.08,(D, D)))
    addf(f"model/h{i}/mlp/c_fc/w", rng.normal(0,.08,(4*D, D)))
    addf(f"model/h{i}/mlp/c_proj/w", rng.normal(0,.08,(D, 4*D)))
    addf(f"model/h{i}/attn/c_attn/b", rng.normal(0,.08,(3*D,)))
    addf(f"model/h{i}/attn/c_proj/b", rng.normal(0,.08,(D,)))
    addf(f"model/h{i}/mlp/c_fc/b", rng.normal(0,.08,(4*D,)))
    addf(f"model/h{i}/mlp/c_proj/b", rng.normal(0,.08,(D,)))
fine = ggml.GPTSection(
    ggml.GPTHParams(n_layer=2, n_head=2, n_embd=D, block_size=64, bias=1,
                    n_in_vocab=9, n_out_vocab=9, n_lm_heads=7, n_wtes=8, ftype=0),
    fine_t)
codec = _codec_section(np.random.default_rng(1))
mf = ggml.ModelFile(vocab=tm.VOCAB, semantic=sem, coarse=coarse, fine=fine, codec=codec)
ggml.write_model_file("/tmp/aligned.bin", mf)
# quantize file->file q5_0
assert bark_tpu.bark_model_quantize("/tmp/aligned.bin", "/tmp/aligned_q5.bin",
                                    int(ggml.GGMLFType.MOSTLY_Q5_0))

def params(**kw):
    return BarkContextParams(
        temp=0.0, fine_temp=0.0, min_eos_p=2.0, n_steps_text_encoder=6,
        sliding_window_size=20, max_coarse_history=20,
        semantic_vocab_size=16, semantic_pad_token=16, semantic_infer_token=299,
        text_pad_token=290, text_encoding_offset=100,
        coarse_infer_token=50, coarse_semantic_pad_token=40, codebook_size=8,
        compute_dtype="float32", **kw)

t0=time.perf_counter()
dense = bark_tpu.bark_load_model("/tmp/aligned_q5.bin", params(dequantize_on_load=True), seed=0)
assert dense.generate_audio("hello world")
print(f"dense path done {time.perf_counter()-t0:.0f}s, frames={dense.fine_tokens.shape}")

t0=time.perf_counter()
packed = bark_tpu.bark_load_model("/tmp/aligned_q5.bin", params(dequantize_on_load=False), seed=0)
assert packed._packed == {"semantic": True, "coarse": True}, packed._packed
assert packed.generate_audio("hello world")
print(f"packed path done {time.perf_counter()-t0:.0f}s")
assert np.array_equal(dense.semantic_tokens, packed.semantic_tokens), "semantic diverged"
assert np.array_equal(dense.fine_tokens, packed.fine_tokens), "fine diverged"
print("PACKED == DENSE at temp 0:", dense.fine_tokens.shape, "audio",
      np.abs(dense.generated_audio - packed.generated_audio).max())
