"""Batched generation: many prompts through one device pipeline.

Weight streaming amortizes across the batch, so per-prompt cost drops
roughly linearly up to the HBM-bandwidth floor. Optionally shard across a
TPU mesh (tensor-parallel weights, data-parallel batch).

    python examples/batch_generate.py -m ./models/ggml_weights.bin \
        -p "first prompt" -p "second prompt" --mesh-dp 2
"""

import argparse
import time

import os
import sys

# runnable straight from a checkout (no pip install needed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bark_tpu
from bark_tpu.utils.wav import write_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", action="append", default=[])
    ap.add_argument("--mesh-dp", type=int, default=0,
                    help="shard over all devices with this dp size (0 = off)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    prompts = args.prompt or ["hello world", "this is bark on a TPU"]

    ctx = bark_tpu.bark_load_model(args.model, seed=args.seed)
    if args.mesh_dp:
        from bark_tpu.parallel import sharding

        mesh = sharding.make_mesh(dp=args.mesh_dp)
        sharding.shard_context(ctx, mesh)
        print(f"sharded over mesh {dict(mesh.shape)}")

    t0 = time.perf_counter()
    outs = ctx.generate_audio_batch(prompts)  # compiles on first call
    outs = ctx.generate_audio_batch(prompts)
    dt = time.perf_counter() - t0
    total_s = sum(o.size for o in outs) / ctx.params.sample_rate
    print(f"{len(outs)} utterances, {total_s:.2f} s audio in {dt:.2f} s "
          f"(RTF {dt / total_s:.3f})")
    for i, audio in enumerate(outs):
        write_wav(f"batch_{i}.wav", audio, ctx.params.sample_rate)


if __name__ == "__main__":
    main()
