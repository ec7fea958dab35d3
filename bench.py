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


def build_context(dtype_name: str, n_semantic_steps: int, seed: int):
    from bark_tpu.api.context import BarkContext
    from bark_tpu.models import encodec, gpt
    from bark_tpu.models.presets import BARK_SMALL, ENCODEC_24KHZ
    from bark_tpu.params import BarkContextParams

    dtype = jnp.dtype(dtype_name)
    stages = {}
    for i, name in enumerate(("semantic", "coarse", "fine")):
        cfg = BARK_SMALL[name]
        stages[name] = (cfg, gpt.init_params_host(cfg, seed + i, dtype=dtype))
        log(f"init {name}: L={cfg.n_layer} D={cfg.n_embd} "
            f"vocab={cfg.n_in_vocab}/{cfg.n_out_vocab}")
    codec_params = encodec.init_params_host(ENCODEC_24KHZ, seed + 3, jnp.float32)

    params = BarkContextParams(
        compute_dtype=dtype_name,
        n_steps_text_encoder=n_semantic_steps,
        min_eos_p=2.0,  # disable the eos_p stop: fixed-length workload
    )
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world", "this",
             "is", "a", "benchmark", "of", "the", "bark", "pipeline"]
    return BarkContext.from_parts(
        vocab_tokens=vocab,
        semantic=stages["semantic"],
        coarse=stages["coarse"],
        fine=stages["fine"],
        codec_cfg=ENCODEC_24KHZ,
        codec_params=codec_params,
        params=params,
        seed=seed,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=138,
                    help="semantic tokens, like the reference sample run")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prompt", default="hello world this is a benchmark")
    args = ap.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    t0 = time.perf_counter()
    ctx = build_context(args.dtype, args.steps, args.seed)
    log(f"weights initialized in {time.perf_counter() - t0:.1f}s")

    # warm-up: compiles every program in the pipeline
    t0 = time.perf_counter()
    assert ctx.generate_audio(args.prompt)
    log(f"warm-up (incl. compile): {time.perf_counter() - t0:.1f}s, "
        f"{len(ctx.semantic_tokens)} semantic tokens, "
        f"{ctx.get_audio_data_size()} samples")

    # timed run
    assert ctx.generate_audio(args.prompt)
    eval_s = ctx.get_eval_time() / 1e6
    n_samples = ctx.get_audio_data_size()
    audio_s = n_samples / ctx.codec_cfg.sample_rate
    rtf = eval_s / audio_s
    s = ctx.stats
    log(f"semantic {s.t_semantic_us/1e3:.1f} ms / {s.n_sample_semantic} tok "
        f"({s.t_semantic_us/1e3/max(s.n_sample_semantic,1):.2f} ms/tok)")
    log(f"coarse   {s.t_coarse_us/1e3:.1f} ms / {s.n_sample_coarse} tok "
        f"({s.t_coarse_us/1e3/max(s.n_sample_coarse,1):.2f} ms/tok)")
    log(f"fine     {s.t_fine_us/1e3:.1f} ms / {s.n_sample_fine} tok "
        f"({s.t_fine_us/1e3/max(s.n_sample_fine,1):.2f} ms/tok)")
    log(f"eval {eval_s*1e3:.0f} ms for {audio_s:.2f} s audio -> RTF {rtf:.3f}")

    print(json.dumps({
        "metric": "bark_small_rtf",
        "value": round(rtf, 4),
        "unit": "x_realtime",
        "vs_baseline": round(BASELINE_RTF / rtf, 2),
    }))


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
