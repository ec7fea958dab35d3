"""Headline benchmark: bark-small text->wav real-time factor on one chip.

Mirrors the reference's published sample run (BASELINE.md: 138 semantic
tokens -> ~2.7 s of audio in 8806 ms of eval => RTF ~3.22, hardware
unstated). Real suno weights are not downloadable in this environment, so
the benchmark runs the exact production pipeline (same compiled programs,
same shapes, same dtypes) on randomly-initialized bark-small-sized weights —
identical FLOPs and memory traffic to a real checkpoint.

Prints ONE JSON line:
  {"metric": "bark_small_rtf", "value": <RTF>, "unit": "x_realtime",
   "vs_baseline": <baseline_rtf / our_rtf>}   (>1 means faster than ref)
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_RTF = 3.22  # reference README sample run (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_context(dtype_name: str, n_semantic_steps: int, seed: int,
                  quant: str = "", model: str = "small",
                  kv_dtype: str = "params"):
    from bark_tpu.api.context import BarkContext
    from bark_tpu.models import encodec, gpt
    from bark_tpu.models.presets import BARK_LARGE, BARK_SMALL, ENCODEC_24KHZ
    from bark_tpu.params import BarkContextParams

    preset = BARK_SMALL if model == "small" else BARK_LARGE
    dtype = jnp.dtype(dtype_name)
    stages = {}
    packed = {}
    for i, name in enumerate(("semantic", "coarse", "fine")):
        cfg = preset[name]
        if quant:
            # init + quantize-pack purely on the host, then upload ONLY the
            # int8 qpack — the dense f32 weights never cross the (slow)
            # remote-TPU tunnel
            host = gpt.init_params_numpy(cfg, seed + i)
            params_i = _pack_quantized(cfg, host, quant, dtype)
            packed[name] = True
        else:
            params_i = gpt.init_params_host(cfg, seed + i, dtype=dtype)
        stages[name] = (cfg, params_i)
        log(f"init {name}: L={cfg.n_layer} D={cfg.n_embd} "
            f"vocab={cfg.n_in_vocab}/{cfg.n_out_vocab}"
            + (f" [{quant} packed]" if packed.get(name) else ""))
    codec_params = encodec.init_params_host(ENCODEC_24KHZ, seed + 3, jnp.float32)

    params = BarkContextParams(
        compute_dtype=dtype_name,
        n_steps_text_encoder=n_semantic_steps,
        min_eos_p=2.0,  # disable the eos_p stop: fixed-length workload
        dequantize_on_load=not quant,
        kv_cache_dtype=kv_dtype,
    )
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world", "this",
             "is", "a", "benchmark", "of", "the", "bark", "pipeline"]
    ctx = BarkContext.from_parts(
        vocab_tokens=vocab,
        semantic=stages["semantic"],
        coarse=stages["coarse"],
        fine=stages["fine"],
        codec_cfg=ENCODEC_24KHZ,
        codec_params=codec_params,
        params=params,
        seed=seed,
    )
    if packed:
        ctx._packed = packed
    return ctx


def _pack_quantized(cfg, dense_params, qtype: str, dtype):
    """Round-trip HOST (numpy) params through the ggml block format into a
    qpack (uploaded by gpt_qparams_from_section's jnp.asarray calls)."""
    import numpy as np

    from bark_tpu.io import ggml, loader

    t = {}

    def add(name, arr, ttype):
        t[name] = ggml.TensorRecord.from_array(
            name, np.asarray(arr, np.float32), ttype
        )

    qt = {"q4_0": ggml.GGMLType.Q4_0, "q4_1": ggml.GGMLType.Q4_1,
          "q5_0": ggml.GGMLType.Q5_0, "q5_1": ggml.GGMLType.Q5_1,
          "q8_0": ggml.GGMLType.Q8_0, "q4_k": ggml.GGMLType.Q4_K,
          "q5_k": ggml.GGMLType.Q5_K}[qtype]
    b = jax.tree.map(lambda a: np.asarray(a, np.float32), dense_params)
    blocks = b["blocks"]
    for i in range(cfg.n_wtes):
        add(f"model/wte/{i}", b["wte"][i], qt)
    add("model/wpe", b["wpe"], ggml.GGMLType.F32)
    for i in range(cfg.n_lm_heads):
        add(f"model/lm_head/{i}", b["lm_head"][i], qt)
    add("model/ln_f/g", b["ln_f_g"], ggml.GGMLType.F32)
    add("model/ln_f/b", b["ln_f_b"], ggml.GGMLType.F32)
    for i in range(cfg.n_layer):
        for key, fname in (
            ("ln1_g", "ln_1/g"), ("ln1_b", "ln_1/b"),
            ("ln2_g", "ln_2/g"), ("ln2_b", "ln_2/b"),
            ("qkv_b", "attn/c_attn/b"), ("proj_b", "attn/c_proj/b"),
            ("fc_b", "mlp/c_fc/b"), ("out_b", "mlp/c_proj/b"),
        ):
            add(f"model/h{i}/{fname}", blocks[key][i], ggml.GGMLType.F32)
        for key, fname in (
            ("qkv_w", "attn/c_attn/w"), ("proj_w", "attn/c_proj/w"),
            ("fc_w", "mlp/c_fc/w"), ("out_w", "mlp/c_proj/w"),
        ):
            add(f"model/h{i}/{fname}", blocks[key][i].T, qt)
    hp = ggml.GPTHParams(
        n_layer=cfg.n_layer, n_head=cfg.n_head, n_embd=cfg.n_embd,
        block_size=cfg.block_size, bias=int(cfg.bias),
        n_in_vocab=cfg.n_in_vocab, n_out_vocab=cfg.n_out_vocab,
        n_lm_heads=cfg.n_lm_heads, n_wtes=cfg.n_wtes, ftype=int(qt),
    )
    _, qpack = loader.gpt_qparams_from_section(
        ggml.GPTSection(hparams=hp, tensors=t), dtype
    )
    return qpack


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=138,
                    help="semantic tokens, like the reference sample run")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prompt", default="hello world this is a benchmark")
    ap.add_argument("--quant", default="",
                    choices=["", "q4_0", "q4_1", "q5_0", "q5_1", "q8_0",
                             "q4_k", "q5_k"],
                    help="serve all three GPT stages packed-quantized "
                    "(semantic/coarse: in-kernel Pallas dequant; fine: one "
                    "on-device dequant per stage call)")
    ap.add_argument("--model", default="small", choices=["small", "large"],
                    help="bark-small (12L/768D) or bark large (24L/1024D)")
    ap.add_argument("--batch", type=int, default=0,
                    help="B>0: bench batched serving (generate_audio_batch);"
                    " reports per-request RTF")
    ap.add_argument("--kv", default="params", choices=["params", "int8"],
                    help="KV-cache storage dtype (int8 = per-row-scaled "
                    "low-bit cache; halves the bf16 decode cache stream)")
    ap.add_argument("--stage-times", action="store_true",
                    help="after the timed runs, run once more with a host "
                    "sync per stage and report REAL per-stage device times "
                    "(the fused pipeline otherwise only observes dispatch "
                    "cost per stage); single-request mode only")
    args = ap.parse_args()

    from bark_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"compilation cache: {cache_dir}")
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    t0 = time.perf_counter()
    ctx = build_context(args.dtype, args.steps, args.seed, quant=args.quant,
                        model=args.model, kv_dtype=args.kv)
    log(f"weights initialized in {time.perf_counter() - t0:.1f}s")

    # warm-up: compiles every program in the pipeline
    t0 = time.perf_counter()
    if args.batch:
        outs = ctx.generate_audio_batch([args.prompt] * args.batch)
        n_samples = min(o.size for o in outs)
        log(f"warm-up (incl. compile): {time.perf_counter() - t0:.1f}s, "
            f"B={args.batch}, {n_samples} samples/lane")
    else:
        assert ctx.generate_audio(args.prompt)
        log(f"warm-up (incl. compile): {time.perf_counter() - t0:.1f}s, "
            f"{len(ctx.semantic_tokens)} semantic tokens, "
            f"{ctx.get_audio_data_size()} samples")

    # timed runs: best of 3 (remote-TPU dispatch adds ±5-10% wall noise)
    best = None
    for i in range(3):
        if args.batch:
            ctx.reset_statistics()
            outs = ctx.generate_audio_batch([args.prompt] * args.batch)
            n_samples = min(o.size for o in outs)
            t = ctx.get_eval_time() / 1e6 / args.batch  # per-request
        else:
            assert ctx.generate_audio(args.prompt)
            n_samples = ctx.get_audio_data_size()
            t = ctx.get_eval_time() / 1e6
        log(f"run {i + 1}: eval {t * 1e3:.0f} ms"
            + (" / request" if args.batch else ""))
        if best is None or t < best:
            best = t
    eval_s = best
    audio_s = n_samples / ctx.codec_cfg.sample_rate
    rtf = eval_s / audio_s
    if args.stage_times and not args.batch:
        # one extra synced run: real per-stage device times (the fused
        # pipeline's own stats only see dispatch cost per stage)
        ctx.params.stage_sync = True
        ctx.reset_statistics()
        assert ctx.generate_audio(args.prompt)
        ctx.params.stage_sync = False
        s = ctx.stats
        for name, t_us, n in (
            ("semantic", s.t_semantic_us, s.n_sample_semantic),
            ("coarse", s.t_coarse_us, s.n_sample_coarse),
            ("fine", s.t_fine_us, s.n_sample_fine),
        ):
            log(f"{name:>8} {t_us/1e3:8.1f} ms / {n} tok "
                f"({t_us/1e3/max(n,1):.2f} ms/tok)")
        stage_sum = (s.t_semantic_us + s.t_coarse_us + s.t_fine_us) / 1e3
        log(f"stage sum {stage_sum:.0f} ms vs synced-run eval "
            f"{s.t_eval_us/1e3:.0f} ms (rest = codec + transfers)")
    elif not args.batch:
        log("per-stage device times: re-run with --stage-times (the fused "
            "pipeline's per-stage stats observe dispatch cost only)")
    log(f"eval {eval_s*1e3:.0f} ms for {audio_s:.2f} s audio -> RTF {rtf:.3f}")

    metric = "bark_small_rtf" if args.model == "small" else "bark_large_rtf"
    if args.quant:
        metric += f"_{args.quant}"
    if args.kv == "int8":
        metric += "_kv8"
    if args.batch:
        metric += f"_b{args.batch}"
    print(json.dumps({
        "metric": metric,
        "value": round(rtf, 4),
        "unit": "x_realtime",
        "vs_baseline": round(BASELINE_RTF / rtf, 2),
    }))


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
