"""Library quickstart: load a ggml_weights.bin model and synthesize speech.

    python examples/quickstart.py -m ./models/ggml_weights.bin \
        -p "hello from a TPU" -o out.wav
"""

import argparse

import os
import sys

# runnable straight from a checkout (no pip install needed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bark_tpu
from bark_tpu.utils.wav import write_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="hello from a TPU")
    ap.add_argument("-o", "--out", default="out.wav")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    params = bark_tpu.bark_context_default_params()
    ctx = bark_tpu.bark_load_model(args.model, params, seed=args.seed)
    print(f"loaded in {bark_tpu.bark_get_load_time(ctx) / 1e3:.0f} ms")

    assert bark_tpu.bark_generate_audio(ctx, args.prompt, 4)
    audio = bark_tpu.bark_get_audio_data(ctx)
    write_wav(args.out, audio, params.sample_rate)
    print(
        f"{bark_tpu.bark_get_audio_data_size(ctx)} samples "
        f"({audio.size / params.sample_rate:.2f} s) in "
        f"{bark_tpu.bark_get_eval_time(ctx) / 1e3:.0f} ms -> {args.out}"
    )


if __name__ == "__main__":
    main()
