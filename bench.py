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
                  kv_dtype: str = "params", init: str = "auto"):
    from bark_tpu.api.context import BarkContext
    from bark_tpu.models import encodec, gpt
    from bark_tpu.models.presets import BARK_LARGE, BARK_SMALL, ENCODEC_24KHZ
    from bark_tpu.params import BarkContextParams

    if init == "auto":
        # a remote-TPU tunnel can be as slow as 0.1 MB/s (measured r3);
        # generating the random bench weights on-device uploads nothing
        init = "device" if jax.default_backend() == "tpu" else "host"
    preset = BARK_SMALL if model == "small" else BARK_LARGE
    dtype = jnp.dtype(dtype_name)
    stages = {}
    packed = {}
    for i, name in enumerate(("semantic", "coarse", "fine")):
        cfg = preset[name]
        if quant:
            if init == "device":
                # synthetic on-device qpack: identical shapes/dtypes (and
                # decode traffic/FLOPs) to a ggml-round-tripped checkpoint
                params_i = _pack_quantized_device(cfg, quant, dtype, seed + i)
            else:
                # init + quantize-pack purely on the host, then upload ONLY
                # the int8 qpack — the dense f32 weights never cross the
                # remote-TPU tunnel
                host = gpt.init_params_numpy(cfg, seed + i)
                params_i = _pack_quantized(cfg, host, quant, dtype)
            packed[name] = True
        elif init == "device":
            params_i = gpt.init_params_device(cfg, seed + i, dtype=dtype)
        else:
            params_i = gpt.init_params_host(cfg, seed + i, dtype=dtype)
        stages[name] = (cfg, params_i)
        log(f"init {name}: L={cfg.n_layer} D={cfg.n_embd} "
            f"vocab={cfg.n_in_vocab}/{cfg.n_out_vocab}"
            + (f" [{quant} packed]" if packed.get(name) else ""))
    if init == "device":
        codec_params = encodec.init_params_device(
            ENCODEC_24KHZ, seed + 3, jnp.float32
        )
    else:
        codec_params = encodec.init_params_host(
            ENCODEC_24KHZ, seed + 3, jnp.float32
        )

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


def _pack_quantized_device(cfg, qtype: str, dtype, seed: int):
    """Synthetic qpack generated ON the device in one jitted program: the
    exact pytree layout/dtypes of loader.gpt_qparams_from_section for a
    real `qtype` checkpoint (so decode streams identical bytes), but with
    random contents — for benches over a degraded remote-TPU tunnel where
    even the int8 qpack upload (~25% of f32) would take an hour."""
    L, D = cfg.n_layer, cfg.n_embd
    v_pad = -(-cfg.n_out_vocab // D) * D
    Bs = D // 32
    has_min = qtype in ("q4_1", "q5_1", "q4_k", "q5_k")
    # mirrors loader._scales_f16_lossless: non-k scales are f16 in the
    # file (ship as f16 bit patterns in int16), k-quant scales stay f32
    f16_scales = not qtype.endswith("_k")

    def gen(key):
        ks = iter(jax.random.split(key, 64))

        def qi(*shape):
            return jax.random.randint(
                next(ks), shape, -127, 128, dtype=jnp.int8
            )

        def pack16(s):
            if not f16_scales:
                return s
            import jax.lax as lax

            return lax.bitcast_convert_type(
                s.astype(jnp.float16), jnp.int16
            )

        def sc(*shape):
            return pack16(jax.random.uniform(
                next(ks), shape, jnp.float32, minval=1e-4, maxval=3e-4
            ))

        def mn(*shape):
            return pack16(
                jax.random.normal(next(ks), shape, jnp.float32) * 1e-3
            )

        blocks = {
            "ln1_g": jnp.ones((L, D), dtype),
            "ln1_b": jnp.zeros((L, D), dtype),
            "ln2_g": jnp.ones((L, D), dtype),
            "ln2_b": jnp.zeros((L, D), dtype),
            "qkv_b": jnp.zeros((L, 3 * D), dtype),
            "proj_b": jnp.zeros((L, D), dtype),
            "fc_b": jnp.zeros((L, 4 * D), dtype),
            "out_b": jnp.zeros((L, D), dtype),
            "qkv_q": qi(L, D, 3 * D), "qkv_s": sc(L, Bs, 3 * D),
            "proj_q": qi(L, D, D), "proj_s": sc(L, Bs, D),
            "fc_q": qi(L, D, 4 * D), "fc_s": sc(L, Bs, 4 * D),
            "out_q": qi(L, 4 * D, D), "out_s": sc(L, 4 * D // 32, D),
        }
        if has_min:
            blocks["qkv_m"] = mn(L, Bs, 3 * D)
            blocks["proj_m"] = mn(L, Bs, D)
            blocks["fc_m"] = mn(L, Bs, 4 * D)
            blocks["out_m"] = mn(L, 4 * D // 32, D)
        qp = {
            "wte_q": qi(cfg.n_wtes, cfg.n_in_vocab, D),
            "wte_s": sc(cfg.n_wtes, cfg.n_in_vocab, Bs),
            "wpe": (jax.random.normal(
                next(ks), (cfg.block_size, D), jnp.float32
            ) * 0.02).astype(dtype),
            "ln_f_g": jnp.ones((D,), dtype),
            "ln_f_b": jnp.zeros((D,), dtype),
            "blocks": blocks,
        }
        if has_min:
            qp["wte_m"] = mn(cfg.n_wtes, cfg.n_in_vocab, Bs)
        if cfg.n_lm_heads == 1:
            qp["lm_q"] = qi(D, v_pad)
            qp["lm_s"] = sc(Bs, v_pad)
            if has_min:
                qp["lm_m"] = mn(Bs, v_pad)
        else:
            qp["lm_heads_q"] = qi(cfg.n_lm_heads, cfg.n_out_vocab, D)
            qp["lm_heads_s"] = sc(cfg.n_lm_heads, cfg.n_out_vocab, Bs)
            if has_min:
                qp["lm_heads_m"] = mn(cfg.n_lm_heads, cfg.n_out_vocab, Bs)
        return qp

    return jax.jit(gen)(jax.random.PRNGKey(seed))


def bench_batch_sweep(ctx, args):
    """Batched-serving scaling table on the single-lane workload: for each
    B, per-request RTF (whole-batch latency / B / audio-s-per-lane) and
    aggregate throughput (audio seconds produced per wall second). The
    reference has no batching at all (server.cpp serializes requests behind
    a mutex), so its throughput is 1/RTF_baseline."""
    sizes = [int(b) for b in args.batch_sweep.split(",") if b]
    rows = []
    for B in sizes:
        t0 = time.perf_counter()
        outs = ctx.generate_audio_batch([args.prompt] * B)
        log(f"B={B}: warm-up (incl. compile) {time.perf_counter() - t0:.1f}s")
        best = None
        for _ in range(3):
            ctx.reset_statistics()
            outs = ctx.generate_audio_batch([args.prompt] * B)
            t = ctx.get_eval_time() / 1e6
            if best is None or t < best:
                best = t
        sr = ctx.codec_cfg.sample_rate
        audio_total = sum(o.size for o in outs) / sr
        audio_lane = min(o.size for o in outs) / sr
        rtf_req = (best / B) / audio_lane
        tput = audio_total / best
        rows.append((B, best, rtf_req, tput))
        log(f"B={B:>3}: batch eval {best*1e3:7.0f} ms  "
            f"per-request RTF {rtf_req:.4f}  "
            f"throughput {tput:7.2f} audio-s/s")
    log(f"{'B':>4} {'eval_ms':>9} {'rtf/req':>9} {'audio-s/s':>10}")
    for B, t, r, tp in rows:
        log(f"{B:>4} {t*1e3:>9.0f} {r:>9.4f} {tp:>10.2f}")
    best_tput = max(tp for _, _, _, tp in rows)
    metric = f"bark_{args.model}_batch_throughput"
    if args.quant:
        metric += f"_{args.quant}"
    if args.kv == "int8":
        metric += "_kv8"
    print(json.dumps({
        "metric": metric,
        "value": round(best_tput, 3),
        "unit": "audio_s_per_s",
        # reference serves one request at a time at RTF 3.22
        "vs_baseline": round(best_tput * BASELINE_RTF, 2),
    }))


def bench_ttfa(ctx, args):
    """Time-to-first-audio through the streaming pipeline at B=1: latency
    until the first final PCM chunk (one coarse window + its fine + codec)
    is on the host. The reference has no streaming — its first audio
    arrives with the LAST sample (RTF_baseline x full audio length)."""
    # warm-up compiles the stepped/streaming program set
    t0 = time.perf_counter()
    chunks = list(ctx.generate_audio_stream(args.prompt))
    log(f"warm-up (incl. compile): {time.perf_counter() - t0:.1f}s, "
        f"{len(chunks)} chunks, {sum(c.size for c in chunks)} samples")
    best = None
    for i in range(3):
        stream = ctx.generate_audio_stream(args.prompt)
        t0 = time.perf_counter()
        first = next(stream)
        ttfa = time.perf_counter() - t0
        rest = sum(c.size for c in stream)
        log(f"run {i + 1}: TTFA {ttfa*1e3:.0f} ms "
            f"(first chunk {first.size} samples; {rest} follow)")
        if best is None or ttfa < best:
            best = ttfa
    sr = ctx.codec_cfg.sample_rate
    audio_s = (first.size + rest) / sr
    # the reference's first audio lands only when the whole utterance is
    # done: RTF 3.22 * audio seconds
    ref_first = BASELINE_RTF * audio_s
    metric = "bark_small_ttfa_ms" if args.model == "small" \
        else "bark_large_ttfa_ms"
    print(json.dumps({
        "metric": metric,
        "value": round(best * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(ref_first / best, 2),
    }))


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
    ap.add_argument("--init", default="auto",
                    choices=["auto", "host", "device"],
                    help="where the random bench weights materialize: "
                    "'device' generates them on-chip in one jitted program "
                    "(no upload — required on a degraded tunnel); auto = "
                    "device on TPU, host elsewhere")
    ap.add_argument("--batch-sweep", default="",
                    help="comma list of batch sizes (e.g. 1,8,16,32): bench "
                    "batched serving at each B on the single-lane workload "
                    "and print a per-request-RTF + aggregate-throughput "
                    "table; the JSON line reports the best throughput")
    ap.add_argument("--ttfa", action="store_true",
                    help="bench time-to-first-audio: latency until the "
                    "streaming pipeline yields its first final PCM chunk")
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
                        model=args.model, kv_dtype=args.kv, init=args.init)
    log(f"weights initialized in {time.perf_counter() - t0:.1f}s")

    if args.batch_sweep:
        return bench_batch_sweep(ctx, args)
    if args.ttfa:
        return bench_ttfa(ctx, args)

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
