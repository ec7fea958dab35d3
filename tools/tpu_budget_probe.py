"""One-process device-time budget of the bark-large dense pipeline (TPU).

Cross-process runs drift (tunnel/chip state varies by ~10%), so stage
probes from different sessions can't be compared. This probe times, in ONE
process with best-of-N sync-floor-subtracted wall times:

  k414   414-step coarse fixed-token kernel chain (kernel floor)
  sem    full semantic program, 138 steps
  coa    full coarse stage program, n_sem=138 (-> 414 steps, 7 windows)
  fine   full fine stage program, 207 frames
  codec  EnCodec decode of 207 frames

and prints the budget vs `bench.py --model large`'s eval time.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bark_tpu.kernels import decode as kdec
from bark_tpu.models import gpt
from bark_tpu.models.presets import BARK_LARGE, BARK_SMALL
from bark_tpu.params import BarkContextParams
from bark_tpu.pipeline import coarse as coarse_pipe
from bark_tpu.pipeline import fine as fine_pipe
from bark_tpu.pipeline import semantic as semantic_pipe


def _sync_floor():
    empty = jax.jit(lambda: jnp.int32(0))
    int(empty())
    t0 = time.perf_counter()
    for _ in range(5):
        int(empty())
    return (time.perf_counter() - t0) / 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large", choices=["small", "large"])
    ap.add_argument("--n-sem", type=int, default=138)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from bark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    preset = BARK_SMALL if args.model == "small" else BARK_LARGE
    p = BarkContextParams()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    progs = {}

    # ---- kernel floor: coarse cfg, fixed token, 414 steps
    ccfg = preset["coarse"]
    cparams = gpt.init_params_device(ccfg, 0, dtype=jnp.bfloat16)
    svs, cbs = p.semantic_vocab_size, p.codebook_size
    cfn = kdec.select_decode_fn(
        ccfg, use_pallas=True, lm_window=(svs, svs + 2 * cbs)
    )
    num, den = coarse_pipe.stc_fraction(p)
    n_steps = (args.n_sem * num) // (den * p.n_coarse_codebooks) \
        * p.n_coarse_codebooks

    def run_k(params, kc, vc):
        dparams = cfn.prepare(params)

        def step(carry, i):
            tok, kc, vc = carry
            logits, kc, vc = cfn(dparams, tok, kc, vc,
                                 jnp.int32(317) + i % 600)
            return (tok, kc, vc), ()

        (tok, kc, _), _ = jax.lax.scan(
            step, (jnp.int32(svs + 3), kc, vc),
            jnp.arange(n_steps, dtype=jnp.int32))
        return kc[0, 0, 0].astype(jnp.int32)

    kc0, vc0 = gpt.init_kv_cache(ccfg, dtype=jnp.bfloat16)
    progs[f"k{n_steps} kernel chain"] = (
        jax.jit(run_k), (cparams, kc0, vc0), n_steps)

    # ---- semantic
    scfg = preset["semantic"]
    sparams = gpt.init_params_device(scfg, 0, dtype=jnp.bfloat16)
    sfn = kdec.select_decode_fn(scfg, use_pallas=True)
    # cap the loop at n_sem so the reported ms/tok divides by the steps
    # actually run (min_eos_p=2.0 makes EOS unreachable; random weights
    # would otherwise run to the 768-step cap and inflate the row ~5.6x)
    sem_prog = semantic_pipe.make_semantic_program(
        scfg, temp=p.temp, max_steps=args.n_sem, semantic_vocab_size=svs,
        decode_fn=sfn,
    )
    toks513 = jnp.full((513,), 17, jnp.int32)
    progs[f"sem full stage ({args.n_sem} steps)"] = (
        sem_prog,
        (sparams, toks513, jax.random.PRNGKey(0), jnp.float32(2.0)),
        args.n_sem,
    )

    # ---- coarse stage
    coa_prog = coarse_pipe.make_coarse_stage_program(
        ccfg, p, ctx_size=ccfg.block_size, max_semantic=256, decode_fn=cfn,
    )
    sem_buf = (jnp.arange(256, dtype=jnp.int32) * 7) % svs
    max_sem_hist = max(1, p.max_coarse_history * den // num)
    progs["coa full stage"] = (
        coa_prog,
        (cparams, sem_buf, jnp.int32(args.n_sem), jax.random.PRNGKey(0),
         jnp.zeros((max_sem_hist,), jnp.int32), jnp.int32(0),
         jnp.zeros((p.max_coarse_history,), jnp.int32), jnp.int32(0)),
        n_steps,
    )

    # ---- fine stage
    fcfg = preset["fine"]
    fparams = gpt.init_params_device(fcfg, 0, dtype=jnp.bfloat16)
    n_frames = n_steps // p.n_coarse_codebooks
    fine_prog = fine_pipe.make_fine_stage_program(
        fcfg, p, max_frames=256 * 3 // 2,
    )
    from bark_tpu.pipeline.voice import FINE_HISTORY_MAX
    codes = jnp.zeros((256 * 3 // 2, p.n_coarse_codebooks), jnp.int32)
    progs["fine full stage"] = (
        fine_prog,
        (fparams, codes, jnp.int32(n_frames), jax.random.PRNGKey(1),
         jnp.zeros((FINE_HISTORY_MAX, p.n_fine_codebooks), jnp.int32),
         jnp.int32(0)),
        n_frames * p.n_fine_codebooks,
    )

    # ---- codec
    from bark_tpu.models import encodec as enc
    eparams = enc.init_params_device(enc.CodecConfig(), 0)
    fr = jnp.zeros((n_frames, p.n_fine_codebooks), jnp.int32)

    def run_codec(params, fr):
        wav = enc.decode_codes(params, fr)
        return wav.reshape(-1)[0].astype(jnp.int32)

    progs["codec decode"] = (jax.jit(run_codec), (eparams, fr), n_frames)

    # ---- measure interleaved
    for tag, (prog, a, steps) in progs.items():
        t0 = time.perf_counter()
        out = prog(*a)
        int(jax.tree.leaves(out)[0].reshape(-1)[0])
        print(f"{tag}: compile+first {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)

    import collections
    times = collections.defaultdict(list)
    for rep in range(args.reps):
        for tag, (prog, a, steps) in progs.items():
            t0 = time.perf_counter()
            out = prog(*a)
            int(jax.tree.leaves(out)[0].reshape(-1)[0])
            times[tag].append(time.perf_counter() - t0)
    floor = _sync_floor()
    print(f"sync floor {floor*1e3:.1f} ms", file=sys.stderr)
    total = 0.0
    for tag, (prog, a, steps) in progs.items():
        best = min(times[tag]) - floor
        total += best
        print(f"{tag}: {best*1e3:7.1f} ms  ({best*1e3/steps:.3f} ms/tok)",
              flush=True)
    print(f"stage total (excl k-chain): "
          f"{(total - (min(times[list(progs)[0]]) - floor))*1e3:.1f} ms")


if __name__ == "__main__":
    main()
