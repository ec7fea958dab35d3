"""Triage probe for the q4_k on-TPU divergence found by tpu_check (r3).

Hypothesis: at D=128 the offset-format scale tile has Bs=D/32=4 rows, so
the kernel slices sub-8-sublane VMEM ranges (scales [:4], mins [4:8]) that
interpret mode handles but Mosaic may not. Real models (D>=256) have
8-aligned Bs. This probe runs the packed-vs-dense greedy chain for several
(format, D) points and prints OK/DIVERGED per point.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.io import ggml, loader
from bark_tpu.kernels import decode as kdec
from bark_tpu.models import gpt


def section(qt, D, L=2, S=64, v_in=300, v_out=200):
    rng = np.random.default_rng(3)
    t = {}

    def add(name, arr, ttype):
        t[name] = ggml.TensorRecord.from_array(name, arr.astype(np.float32),
                                               ttype)

    def rnd(*shape):
        return rng.normal(0, 0.08, shape).astype(np.float32)

    add("model/wte/0", rnd(v_in, D), qt)
    add("model/wpe", rnd(S, D), ggml.GGMLType.F32)
    add("model/lm_head/0", rnd(v_out, D), qt)
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
        n_layer=L, n_head=2, n_embd=D, block_size=S, bias=1,
        n_in_vocab=v_in, n_out_vocab=v_out, n_lm_heads=1, n_wtes=1,
        ftype=int(qt),
    )
    return ggml.GPTSection(hparams=hp, tensors=t)


def chain(cfg, step_fn, params, steps=12):
    def run(params, kc, vc):
        if hasattr(step_fn, "prepare"):
            params = step_fn.prepare(params)

        def body(carry, i):
            tok, kc, vc = carry
            logits, kc, vc = step_fn(params, tok, kc, vc, jnp.int32(5) + i)
            return (jnp.argmax(logits).astype(jnp.int32), kc, vc), \
                jnp.argmax(logits).astype(jnp.int32)

        (_, kc, vc), toks = jax.lax.scan(
            body, (jnp.int32(7), kc, vc), jnp.arange(steps, dtype=jnp.int32)
        )
        return toks

    kc, vc = gpt.init_kv_cache(cfg, dtype=jnp.float32)
    return np.asarray(jax.jit(run, donate_argnums=(1, 2))(params, kc, vc))


def probe(qt, D, label):
    import time

    t0 = time.perf_counter()
    sec = section(qt, D)
    cfg, qpack = loader.gpt_qparams_from_section(sec, jnp.float32)
    dense = loader.dense_from_qpack(cfg, qpack)
    ref = chain(cfg, kdec.select_decode_fn(cfg, use_pallas=False), dense)
    out = chain(cfg, kdec.select_decode_fn(cfg, use_pallas=True, quant=True),
                qpack)
    ok = np.array_equal(ref, out)
    sd = qpack["blocks"]["proj_s"].dtype
    print(f"{'OK      ' if ok else 'DIVERGED'} {label} D={D} "
          f"(Bs={D//32}, scale_dtype={sd}) [{time.perf_counter()-t0:.0f}s]"
          + ("" if ok else f"\n  ref={ref}\n  out={out}"), flush=True)
    return ok


def main():
    from bark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind} "
          f"backend={jax.default_backend()}", flush=True)
    probe(ggml.GGMLType.Q8_0, 128, "q8_0")   # control (+f16 scale stream)
    probe(ggml.GGMLType.Q5_1, 128, "q5_1")   # offset, Bs=4 unaligned
    probe(ggml.GGMLType.Q4_K, 128, "q4_k")   # offset, Bs=4 unaligned
    probe(ggml.GGMLType.Q5_1, 256, "q5_1")   # offset, Bs=8 aligned
    probe(ggml.GGMLType.Q4_K, 256, "q4_k")   # offset, Bs=8 aligned


if __name__ == "__main__":
    main()
