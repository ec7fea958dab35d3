"""Long-form narration with a consistent voice.

Generates a whole multi-sentence script (past Bark's ~13 s utterance cap)
by sentence-chaining (each sentence conditioned on the previous one's
generation), optionally seeded by a speaker preset, then saves the final
voice for reuse:

    python examples/longform_voice.py -m ./models/ggml_weights.bin \
        -p "First sentence. Second sentence. And a third one." \
        -v voices/en_speaker_0.npz --save-voice narrator.npz -o story.wav
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
    ap.add_argument("-p", "--prompt", required=True,
                    help="multi-sentence script")
    ap.add_argument("-v", "--voice", default=None,
                    help="optional speaker preset .npz seeding sentence 1")
    ap.add_argument("--save-voice", default=None,
                    help="save the final sentence's voice for reuse")
    ap.add_argument("-o", "--out", default="story.wav")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ctx = bark_tpu.bark_load_model(args.model, seed=args.seed)
    assert ctx.generate_audio_long(args.prompt, voice=args.voice)
    audio = bark_tpu.bark_get_audio_data(ctx)
    write_wav(args.out, audio, ctx.params.sample_rate)
    print(f"{audio.size / ctx.params.sample_rate:.1f} s of audio "
          f"in {bark_tpu.bark_get_eval_time(ctx) / 1e6:.1f} s -> {args.out}")
    if args.save_voice:
        bark_tpu.bark_save_voice(ctx, args.save_voice)
        print(f"voice saved -> {args.save_voice}")


if __name__ == "__main__":
    main()
