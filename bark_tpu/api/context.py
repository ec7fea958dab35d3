"""The bark.h-shaped public API: context, load, generate, getters, quantize.

Mirrors the 10-function C surface (/root/reference/bark.h:148-239, impl
bark.cpp:1165-1184, 2125-2232, 2379-2407) on top of the TPU-native pipeline:

- `bark_load_model(path, params, seed)` -> BarkContext
- `bark_generate_audio(ctx, text, n_threads)` -> bool
- `bark_get_audio_data(_size)`, `bark_get_load_time`, `bark_get_eval_time`,
  `bark_reset_statistics`, `bark_model_quantize`, `bark_free`

Divergences, by design (SURVEY.md §7):
- `n_threads` is accepted and ignored — XLA owns intra-op threading.
- each autoregressive stage runs as one on-device program (while_loop/scan)
  instead of one graph per token, so per-stage progress callbacks fire per
  window/block rather than per token.
- RNG is JAX's threaded PRNG; temp=0 paths are exactly deterministic.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bark_tpu.io import ggml, loader
from bark_tpu.io.quantize import model_quantize
from bark_tpu.models import encodec, gpt
from bark_tpu.params import BarkContextParams, EncodingStep, Verbosity
from bark_tpu.pipeline import coarse as coarse_pipe
from bark_tpu.pipeline import fine as fine_pipe
from bark_tpu.pipeline import semantic as semantic_pipe
from bark_tpu.pipeline import voice as voice_mod
from bark_tpu.text import longform, tokenizer

# Codec frame padding granularity: decode is compiled per padded length, so
# this bounds the number of compiled codec programs to O(max_len/CHUNK).
# Causal SEANet convs guarantee right-padding never changes earlier samples.
CODEC_FRAME_CHUNK = 128

# coarse context: 256 semantic slots + 1 infer token + max_coarse_history
COARSE_CTX_SIZE = 887


@dataclasses.dataclass
class BarkStatistics:
    """Field-for-field mirror of bark_statistics (bark.h:60-79), in µs."""

    t_load_us: int = 0
    t_eval_us: int = 0
    t_semantic_us: int = 0
    t_coarse_us: int = 0
    t_fine_us: int = 0
    n_sample_semantic: int = 0
    n_sample_coarse: int = 0
    n_sample_fine: int = 0


class BarkContext:
    """Owns the three GPT stages, the codec, the RNG and the output audio."""

    def __init__(
        self,
        model: ggml.ModelFile,
        params: Optional[BarkContextParams] = None,
        seed: int = 0,
    ):
        self.params = params or BarkContextParams()
        t0 = time.perf_counter()
        dtype = jnp.dtype(self.params.compute_dtype)

        self.vocab = tokenizer.Vocab.from_tokens(model.vocab)
        if self.params.verbosity >= Verbosity.MEDIUM:
            # per-model hparams report, like bark_model_load (bark.cpp:713-725)
            for name in ("semantic", "coarse", "fine"):
                hp = getattr(model, name).hparams
                print(
                    f"bark_model_load ({name}): n_in_vocab={hp.n_in_vocab}, "
                    f"n_out_vocab={hp.n_out_vocab}, block_size={hp.block_size}, "
                    f"n_embd={hp.n_embd}, n_head={hp.n_head}, "
                    f"n_layer={hp.n_layer}, n_lm_heads={hp.n_lm_heads}, "
                    f"n_wtes={hp.n_wtes}, ftype={hp.base_ftype}, "
                    f"qntvr={hp.qntvr}",
                    file=sys.stderr,
                )
        self.semantic_cfg, self.semantic_params, sem_packed = self._load_stage(
            model.semantic, dtype
        )
        self.coarse_cfg, self.coarse_params, coarse_packed = self._load_stage(
            model.coarse, dtype
        )
        self.fine_cfg, self.fine_params, fine_packed = self._load_stage(
            model.fine, dtype, stage="fine"
        )
        self._packed = {
            "semantic": sem_packed,
            "coarse": coarse_packed,
            "fine": fine_packed,
        }
        self.codec_cfg = encodec.CodecConfig(
            in_channels=model.codec.hparams.in_channels,
            hidden_dim=model.codec.hparams.hidden_dim,
            n_filters=model.codec.hparams.n_filters,
            kernel_size=model.codec.hparams.kernel_size,
            residual_kernel_size=model.codec.hparams.residual_kernel_size,
            n_bins=model.codec.hparams.n_bins,
            sample_rate=model.codec.hparams.sample_rate,
        )
        # codec stays float32 — the reference never quantizes it (README:128)
        self.codec_params = encodec.params_from_section(model.codec, jnp.float32)

        self._finish_init(seed)
        self.stats.t_load_us = int((time.perf_counter() - t0) * 1e6)

    @classmethod
    def from_parts(
        cls,
        *,
        vocab_tokens,
        semantic,  # (GPTConfig, params pytree)
        coarse,
        fine,
        codec_cfg: encodec.CodecConfig,
        codec_params,
        params: Optional[BarkContextParams] = None,
        seed: int = 0,
    ) -> "BarkContext":
        """Build a context from already-materialized configs + param pytrees
        (synthetic benchmarks, tests, or weights loaded elsewhere)."""
        ctx = cls.__new__(cls)
        ctx.params = params or BarkContextParams()
        ctx.vocab = tokenizer.Vocab.from_tokens(vocab_tokens)
        ctx.semantic_cfg, ctx.semantic_params = semantic
        ctx.coarse_cfg, ctx.coarse_params = coarse
        ctx.fine_cfg, ctx.fine_params = fine
        ctx.codec_cfg = codec_cfg
        ctx.codec_params = codec_params
        ctx._finish_init(seed)
        return ctx

    def _finish_init(self, seed: int) -> None:
        self._validate()
        self.seed = seed
        self.rng_key = jax.random.PRNGKey(seed)
        self.stats = BarkStatistics()

        # token buffers, mirroring bark_context (bark.cpp:150-156)
        self.tokens: np.ndarray = np.zeros((0,), np.int32)
        self.semantic_tokens: np.ndarray = np.zeros((0,), np.int32)
        self.coarse_tokens: np.ndarray = np.zeros((0, 0), np.int32)
        self.fine_tokens: np.ndarray = np.zeros((0, 0), np.int32)
        self.generated_audio: Optional[np.ndarray] = None

        self._programs: Dict[str, object] = {}
        self._dp_mesh = None  # set by parallel.sharding.shard_context_dp
        self._voice_runtime = self._voice_args(None)

    def _validate(self) -> None:
        """Fail fast with a clear message when the generation params don't
        fit the loaded model's token space (otherwise the mismatch surfaces
        as an opaque shape error deep inside a jitted program)."""
        p = self.params
        checks = [
            (
                p.semantic_infer_token < self.semantic_cfg.n_in_vocab,
                f"semantic_infer_token {p.semantic_infer_token} >= semantic "
                f"input vocab {self.semantic_cfg.n_in_vocab}",
            ),
            (
                p.semantic_vocab_size <= self.semantic_cfg.n_out_vocab,
                f"semantic_vocab_size {p.semantic_vocab_size} > semantic "
                f"output vocab {self.semantic_cfg.n_out_vocab}",
            ),
            (
                p.coarse_infer_token < self.coarse_cfg.n_in_vocab,
                f"coarse_infer_token {p.coarse_infer_token} >= coarse input "
                f"vocab {self.coarse_cfg.n_in_vocab}",
            ),
            (
                p.semantic_vocab_size
                + p.n_coarse_codebooks * p.codebook_size
                <= self.coarse_cfg.n_out_vocab,
                "coarse output vocab too small for semantic_vocab_size + "
                f"{p.n_coarse_codebooks} codebooks of {p.codebook_size}",
            ),
            (
                p.codebook_size < self.fine_cfg.n_in_vocab,
                f"codebook_size {p.codebook_size} (pad id) >= fine input "
                f"vocab {self.fine_cfg.n_in_vocab}",
            ),
            (
                self.fine_cfg.n_wtes >= p.n_fine_codebooks,
                f"fine model has {self.fine_cfg.n_wtes} wtes < "
                f"n_fine_codebooks {p.n_fine_codebooks}",
            ),
            (
                self.semantic_cfg.block_size >= 257,
                f"semantic block_size {self.semantic_cfg.block_size} < 257 "
                "(merged prompt length)",
            ),
        ]
        errors = [msg for ok, msg in checks if not ok]
        if errors:
            raise ValueError(
                "model/params mismatch: " + "; ".join(errors)
            )

    # ------------------------------------------------------------ programs

    def _load_stage(self, sec, dtype, stage: str = ""):
        """(cfg, params, packed): packed-quantized when dequantize_on_load is
        False and the file section is block-quantized; dense otherwise.

        The causal stages additionally require the Pallas decode kernel
        (TPU or forced) — their packed weights are dequantized tile-by-tile
        inside the kernel. The fine stage has no decode loop (whole-block
        forwards only), so its qpack is served by one on-device dequant per
        stage invocation instead and works on any backend: weights stay int8
        in HBM between calls (~4x smaller residency and upload than dense
        f32; VERDICT r1 weak #4)."""
        from bark_tpu.kernels.decode import supports_fused_decode

        if not self.params.dequantize_on_load and loader.section_is_quantized(
            sec
        ):
            cfg = loader.gpt_config_from_hparams(sec.hparams)
            if stage == "fine":
                cfg, qp = loader.gpt_qparams_from_section(sec, dtype)
                return cfg, qp, True
            use_pallas = self.params.use_pallas_decode
            kernel_ok = supports_fused_decode(cfg) and (
                use_pallas if use_pallas is not None
                else jax.default_backend() == "tpu"
            )
            if kernel_ok and cfg.n_wtes == 1 and cfg.n_lm_heads == 1:
                cfg, qp = loader.gpt_qparams_from_section(sec, dtype)
                return cfg, qp, True
            print(
                "bark_tpu: dequantize_on_load=False requested but the Pallas "
                "decode kernel cannot serve this stage; loading dense",
                file=sys.stderr,
            )
        return (*loader.gpt_params_from_section(sec, dtype), False)

    def _decode_fn(self, cfg, stage: str = ""):
        from bark_tpu.kernels.decode import select_decode_fn

        packed = getattr(self, "_packed", {}).get(stage, False)
        # the coarse sampler only reads the codebook logit windows
        # (bark.cpp:1829-1838) — skip streaming the rest of the LM head
        lm_window = None
        if stage == "coarse":
            p = self.params
            lm_window = (
                p.semantic_vocab_size,
                p.semantic_vocab_size + p.n_coarse_codebooks * p.codebook_size,
            )
        return select_decode_fn(
            cfg, self.params.use_pallas_decode, quant=packed,
            lm_window=lm_window,
        )

    def _densify(self, stage: str):
        if getattr(self, "_packed", {}).get(stage, False):
            cfg = getattr(self, f"{stage}_cfg")
            return lambda qp: loader.dense_from_qpack(cfg, qp)
        return None

    def _semantic_program(self):
        key = ("semantic", self.params.temp, self.params.top_k,
               self.params.top_p, self.params.n_steps_text_encoder)
        if key not in self._programs:
            self._programs[key] = semantic_pipe.make_semantic_program(
                self.semantic_cfg,
                temp=self.params.temp,
                max_steps=self.params.n_steps_text_encoder,
                semantic_vocab_size=self.params.semantic_vocab_size,
                top_k=self.params.top_k,
                top_p=self.params.top_p,
                decode_fn=self._decode_fn(self.semantic_cfg, "semantic"),
                densify=self._densify("semantic"),
                kv_quant=self.params.kv_cache_dtype == "int8",
            )
        return self._programs[key]

    def _coarse_program(self):
        key = ("coarse", self.params.temp, self.params.top_k,
               self.params.top_p, self.params.sliding_window_size)
        if key not in self._programs:
            self._programs[key] = coarse_pipe.make_coarse_window_program(
                self.coarse_cfg,
                temp=self.params.temp,
                sliding_window_size=self.params.sliding_window_size,
                semantic_vocab_size=self.params.semantic_vocab_size,
                codebook_size=self.params.codebook_size,
                top_k=self.params.top_k,
                top_p=self.params.top_p,
                ctx_size=min(COARSE_CTX_SIZE, self.coarse_cfg.block_size),
                decode_fn=self._decode_fn(self.coarse_cfg, "coarse"),
                kv_quant=self.params.kv_cache_dtype == "int8",
            )
        return self._programs[key]

    def _coarse_window_inputs(self):
        """(dparams, dense) for the per-window coarse program, prepared ONCE
        per generate call: packed-quantized densify and the decode-kernel
        tile prep are full weight passes that must not run per window (the
        window program is invoked n_steps/sliding_window times)."""
        key = ("coarse_window_prep",)
        if key not in self._programs:
            from bark_tpu.kernels.prefill import pick_prefill

            decode_fn = self._decode_fn(self.coarse_cfg, "coarse")
            densify = self._densify("coarse")
            prepare = getattr(decode_fn, "prepare", lambda p: p)
            ctx_size = min(COARSE_CTX_SIZE, self.coarse_cfg.block_size)
            kv_quant = self.params.kv_cache_dtype == "int8"
            pal = pick_prefill(self.coarse_cfg, decode_fn, kv_quant,
                               ctx_size)

            from bark_tpu.kernels import window as kwin

            use_window = (
                self.params.n_coarse_codebooks == 2
                and kwin.supports_window_kernel(
                    self.coarse_cfg, decode_fn,
                    top_k=self.params.top_k, top_p=self.params.top_p,
                    kv_quant=kv_quant,
                )
            )

            from bark_tpu.utils import aot
            from bark_tpu.utils.aot import aot_jit

            @aot_jit("coarse_prep", fingerprint=aot.describe(
                self.coarse_cfg, densify is not None, pal is not None,
                use_window, self.params.semantic_vocab_size,
                self.params.codebook_size,
                aot.describe_decode_fn(decode_fn),
            ))
            def prep(params):
                dense = densify(params) if densify else params
                if pal is not None:
                    # attach the Pallas prefill's tile relayout here, once
                    # per generate — the window program runs per window
                    from bark_tpu.kernels import prefill as kpre

                    dense = kpre.prepare_prefill_params(
                        self.coarse_cfg, dense,
                        lm_window=getattr(decode_fn, "lm_window", None),
                    )
                dparams = prepare(params)
                if use_window:
                    # whole-window kernel path: wte token-window tiles,
                    # relaid once per generate (kernels/window.py); packed
                    # params pass the densified wte for the side stream
                    dparams = kwin.prepare_window_params(
                        self.coarse_cfg, dparams,
                        svs=self.params.semantic_vocab_size,
                        cbs=self.params.codebook_size,
                        dense_wte=dense["wte"][0],
                    )
                return dparams, dense

            self._programs[key] = prep
        return self._programs[key](self.coarse_params)

    def _stage_dense_params(self, stage: str):
        """Dense params for per-block stepped programs: densified once per
        generate call when the stage is packed-quantized, raw otherwise."""
        densify = self._densify(stage)
        params = getattr(self, f"{stage}_params")
        if densify is None:
            return params
        key = ("dense_prep", stage)
        if key not in self._programs:
            self._programs[key] = jax.jit(densify)
        return self._programs[key](params)

    def _fine_program(self):
        key = ("fine", self.params.fine_temp)
        if key not in self._programs:
            self._programs[key] = fine_pipe.make_fine_block_program(
                self.fine_cfg,
                fine_temp=self.params.fine_temp,
                n_coarse=self.params.n_coarse_codebooks,
                n_fine=self.params.n_fine_codebooks,
                codebook_size=self.params.codebook_size,
            )
        return self._programs[key]

    def _codec_program(self):
        if "codec" not in self._programs:
            from bark_tpu.utils.aot import aot_jit

            self._programs["codec"] = aot_jit("codec", encodec.decode_codes)
        return self._programs["codec"]

    def _coarse_stage_program(self):
        """Fused whole-stage coarse program (no host syncs between windows)."""
        p = self.params
        key = ("coarse_stage", p.temp, p.top_k, p.top_p,
               p.sliding_window_size, p.n_steps_text_encoder)
        if key not in self._programs:
            self._programs[key] = coarse_pipe.make_coarse_stage_program(
                self.coarse_cfg,
                p,
                ctx_size=min(COARSE_CTX_SIZE, self.coarse_cfg.block_size),
                max_semantic=p.n_steps_text_encoder,
                decode_fn=self._decode_fn(self.coarse_cfg, "coarse"),
                densify=self._densify("coarse"),
                kv_quant=self.params.kv_cache_dtype == "int8",
            )
        return self._programs[key]

    def _fine_stage_program(self):
        """Fused whole-stage fine program (no host syncs between blocks)."""
        p = self.params
        key = ("fine_stage", p.fine_temp, p.n_steps_text_encoder)
        if key not in self._programs:
            max_frames = (
                coarse_pipe.max_coarse_steps(p.n_steps_text_encoder, p)
                // p.n_coarse_codebooks
            )
            self._programs[key] = fine_pipe.make_fine_stage_program(
                self.fine_cfg, p, max_frames=max_frames,
                densify=self._densify("fine"),
            )
        return self._programs[key]

    def _batched_programs(self, batch: int):
        """Natively-batched stage programs for batch-B generation: one
        while_loop/scan serves all lanes, and on TPU the batched Pallas
        decode kernel streams each weight tile ONCE per step for the whole
        batch (decode HBM traffic per request drops ~B x). Off-TPU the
        decode falls back to a vmapped XLA step inside the same batched
        programs."""
        p = self.params
        key = ("batched", batch, p.temp, p.top_k, p.top_p,
               p.fine_temp, p.n_steps_text_encoder)
        if key not in self._programs:
            from bark_tpu.kernels.decode import (
                select_decode_fn_batched, supports_fused_decode,
            )

            up = p.use_pallas_decode
            on_tpu = jax.default_backend() == "tpu"

            def decode_for(stage, cfg):
                """(decode_fn or None, decode_on_dense) for a stage."""
                use_kernel = supports_fused_decode(cfg) and (
                    up if up is not None else on_tpu
                )
                if not use_kernel:
                    # default vmapped XLA decode; packed stages densify
                    return None, True
                lm_window = None
                if stage == "coarse":
                    lm_window = (
                        p.semantic_vocab_size,
                        p.semantic_vocab_size
                        + p.n_coarse_codebooks * p.codebook_size,
                    )
                fn = select_decode_fn_batched(
                    cfg, up,
                    quant=getattr(self, "_packed", {}).get(stage, False),
                    lm_window=lm_window,
                )
                return fn, False

            sem_fn, sem_dod = decode_for("semantic", self.semantic_cfg)
            coarse_fn, coarse_dod = decode_for("coarse", self.coarse_cfg)
            sem = semantic_pipe.make_semantic_program_batched(
                self.semantic_cfg,
                batch=batch,
                temp=p.temp,
                max_steps=p.n_steps_text_encoder,
                semantic_vocab_size=p.semantic_vocab_size,
                top_k=p.top_k,
                top_p=p.top_p,
                decode_fn=sem_fn,
                densify=self._densify("semantic"),
                decode_on_dense=sem_dod,
                kv_quant=p.kv_cache_dtype == "int8",
            )
            coarse = coarse_pipe.make_coarse_stage_program_batched(
                self.coarse_cfg,
                p,
                batch=batch,
                ctx_size=min(COARSE_CTX_SIZE, self.coarse_cfg.block_size),
                max_semantic=p.n_steps_text_encoder,
                decode_fn=coarse_fn,
                densify=self._densify("coarse"),
                decode_on_dense=coarse_dod,
                kv_quant=p.kv_cache_dtype == "int8",
            )
            max_frames = (
                coarse_pipe.max_coarse_steps(p.n_steps_text_encoder, p)
                // p.n_coarse_codebooks
            )
            fine = fine_pipe.make_fine_stage_program(
                self.fine_cfg, p, max_frames=max_frames,
                densify=self._densify("fine"),
            )
            self._programs[key] = (
                sem,
                coarse,
                jax.jit(jax.vmap(fine, in_axes=(None, 0, 0, 0, 0, 0))),
                jax.jit(jax.vmap(encodec.decode_codes, in_axes=(None, 0))),
            )
        return self._programs[key]

    def _dp_batched_programs(self, batch: int):
        """Kernel-preserving data-parallel stage programs: the batched
        programs built for B_local = batch/dp, shard_mapped over the dp
        mesh so each device runs the fused single-chip pipeline on its
        slice (parallel.sharding.shard_context_dp)."""
        mesh = self._dp_mesh
        dp = mesh.shape["dp"]
        p = self.params
        key = ("dp_batched", batch, dp, p.temp, p.top_k, p.top_p,
               p.fine_temp, p.n_steps_text_encoder)
        if key not in self._programs:
            from bark_tpu.parallel.sharding import wrap_dp_programs

            self._programs[key] = wrap_dp_programs(
                mesh, self._batched_programs(batch // dp)
            )
        return self._programs[key]

    def generate_audio_batch(self, texts, voices=None) -> list:
        """Generate B utterances in one batched device pipeline.

        Beyond-reference (the C++ server serializes requests behind a mutex,
        SURVEY §2.10); this is the server's batching path. Returns a list of
        float32 PCM arrays, one per prompt, in order. Updates aggregate
        statistics; per-utterance token buffers are not retained.

        `voices` is an optional list (len == len(texts)) of per-request
        speaker presets (None | .npz path | VoicePreset).
        """
        p = self.params
        t_start = time.perf_counter()
        B = len(texts)
        if B == 0:
            return []
        if voices is None:
            voices = [None] * B
        presets = [self._resolve_voice(v) for v in voices]
        # bucket the compiled batch size: every distinct B would otherwise
        # compile four whole-stage vmapped programs (minutes on a remote TPU)
        if self._dp_mesh is not None:
            # kernel-preserving dp serving: per-device batch is the bucketed
            # unit, global batch is dp x that (shard_context_dp)
            dp = self._dp_mesh.shape["dp"]
            b_local = 1 << (max(1, -(-B // dp)) - 1).bit_length()
            Bp = dp * b_local
        else:
            Bp = 1 << (B - 1).bit_length()
        texts = list(texts) + [texts[0]] * (Bp - B)
        presets = presets + [presets[0]] * (Bp - B)
        prompts = np.stack([
            np.asarray(
                tokenizer.tokenize_input(
                    self.vocab, t, p,
                    block_size=self.semantic_cfg.block_size,
                    semantic_history=voice_mod.semantic_history_tokens(v, p),
                ),
                np.int32,
            )
            for t, v in zip(texts, presets)
        ])
        va = [self._voice_args(v) for v in presets]
        sem_hist = jnp.asarray(np.stack([a[0] for a in va]))
        n_sh = jnp.asarray([a[1] for a in va], jnp.int32)
        coarse_hist = jnp.asarray(np.stack([a[2] for a in va]))
        n_ch = jnp.asarray([a[3] for a in va], jnp.int32)
        fine_hist = jnp.asarray(np.stack([a[4] for a in va]))
        n_fh = jnp.asarray([a[5] for a in va], jnp.int32)
        sem_prog, coarse_prog, fine_prog, codec_prog = (
            self._dp_batched_programs(Bp)
            if self._dp_mesh is not None
            else self._batched_programs(Bp)
        )
        sem_keys = jnp.stack([self._next_key() for _ in range(Bp)])
        coarse_keys = jnp.stack([self._next_key() for _ in range(Bp)])
        fine_keys = jnp.stack([self._next_key() for _ in range(Bp)])

        sem_out, sem_count = sem_prog(
            self.semantic_params,
            jnp.asarray(prompts),
            sem_keys,
            jnp.float32(p.min_eos_p),
        )
        codes, n_steps = coarse_prog(
            self.coarse_params, sem_out, sem_count, coarse_keys,
            sem_hist, n_sh, coarse_hist, n_ch,
        )
        n_cc = p.n_coarse_codebooks
        fine_buf = fine_prog(
            self.fine_params, codes, n_steps // n_cc, fine_keys,
            fine_hist, n_fh,
        )
        n_q = self.codec_cfg.n_q_for_bandwidth(p.target_bandwidth)
        # sync the lengths first so the codec only decodes up to the longest
        # request (bucketed), not the static max buffer
        counts, steps = jax.device_get((sem_count, n_steps))
        max_frames = int(np.max(steps)) // n_cc if len(steps) else 0
        padded = max(
            CODEC_FRAME_CHUNK,
            -(-max_frames // CODEC_FRAME_CHUNK) * CODEC_FRAME_CHUNK,
        )
        padded = min(padded, fine_buf.shape[1])
        audio = codec_prog(self.codec_params, fine_buf[:, :padded, :n_q])
        audio_np = jax.device_get(audio)
        hop = self.codec_cfg.hop_length
        outs = []
        for i in range(B):
            n_frames = int(steps[i]) // n_cc
            if int(counts[i]) <= 0:
                outs.append(np.zeros((0,), np.float32))
            elif n_frames < self.codec_cfg.kernel_size:
                # pad rows would reflect into the first conv's left padding
                # (see _decode_codec) — decode this short lane exactly
                exact = self._codec_program()(
                    self.codec_params, fine_buf[i, :n_frames, :n_q]
                )
                outs.append(np.asarray(exact)[: n_frames * hop])
            else:
                outs.append(audio_np[i, : n_frames * hop])
        self.stats.n_sample_semantic += int(np.sum(counts[:B]))
        self.stats.n_sample_coarse += int(np.sum(steps[:B]))
        self.stats.n_sample_fine += int(
            np.sum(steps[:B] // n_cc) * p.n_fine_codebooks
        )
        self.stats.t_eval_us += int((time.perf_counter() - t_start) * 1e6)
        return outs

    def _next_key(self):
        self.rng_key, sub = jax.random.split(self.rng_key)
        return sub

    def _resolve_voice(self, voice):
        """None | path | VoicePreset -> validated VoicePreset | None."""
        if voice is None:
            return None
        if isinstance(voice, str):
            voice = voice_mod.load_voice_preset(voice)
        voice.validate(self.params)
        return voice

    def _voice_args(self, preset):
        """Fixed-size left-aligned history buffers + lengths for the fused
        stage programs (zeros reproduce the reference's empty history).

        Returns (sem_hist, n_sem_hist, coarse_hist, n_coarse_hist,
        fine_hist, n_fine_hist) as numpy arrays / ints.
        """
        p = self.params
        num, den = coarse_pipe.stc_fraction(p)
        max_sem_hist = max(1, p.max_coarse_history * den // num)
        sh, ch = voice_mod.coarse_history(preset, p)
        sem_hist = np.zeros((max_sem_hist,), np.int32)
        sem_hist[: len(sh)] = sh
        coarse_hist = np.zeros((p.max_coarse_history,), np.int32)
        coarse_hist[: len(ch)] = ch
        fh = voice_mod.fine_history(preset, p)
        fine_hist = np.full(
            (voice_mod.FINE_HISTORY_MAX, p.n_fine_codebooks),
            p.codebook_size, np.int32,
        )
        fine_hist[: len(fh)] = fh
        return sem_hist, len(sh), coarse_hist, len(ch), fine_hist, len(fh)

    def _progress(self, step: EncodingStep, percent: int):
        cb = self.params.progress_callback
        if cb is not None:
            cb(self, step, percent, self.params.progress_callback_user_data)

    # ------------------------------------------------------------ pipeline

    def generate_audio(self, text: str, voice=None) -> bool:
        """Full text -> 24 kHz waveform pipeline (bark_generate_audio,
        bark.cpp:2125-2172). Returns True on success; audio is available via
        `get_audio_data`.

        `voice` is an optional speaker preset — a suno-format .npz path or
        a pipeline.voice.VoicePreset — feeding the semantic/coarse/fine
        history prompts (the C++ reference hardcodes an empty history,
        bark.cpp:640-651; suno's history_prompt is the behavioral model).
        """
        p = self.params
        preset = self._resolve_voice(voice)
        self._voice_runtime = self._voice_args(preset)
        self.reset_statistics()  # per-call stats, like bark.cpp:2131
        t_start = time.perf_counter()

        # tokenize: fixed 513-token prompt (bark.cpp:622-662)
        prompt = tokenizer.tokenize_input(
            self.vocab, text, p, block_size=self.semantic_cfg.block_size,
            semantic_history=voice_mod.semantic_history_tokens(preset, p),
        )
        self.tokens = np.asarray(prompt, np.int32)
        if p.verbosity >= Verbosity.LOW:
            print(f"bark_tokenize_input: prompt: '{text}'", file=sys.stderr)
            head = " ".join(str(t) for t in self.tokens[:8])
            print(
                f"bark_tokenize_input: number of tokens in prompt = "
                f"{len(self.tokens)}, first 8 tokens: {head}",
                file=sys.stderr,
            )

        stepped = p.detailed_stats or p.progress_callback is not None
        if p.profile_dir:
            with jax.profiler.trace(p.profile_dir):
                ok = (
                    self._generate_stepped(p) if stepped
                    else self._generate_fused(p)
                )
        else:
            ok = (
                self._generate_stepped(p) if stepped
                else self._generate_fused(p)
            )
        if ok:
            self.stats.t_eval_us += int((time.perf_counter() - t_start) * 1e6)
        return ok

    def _generate_stepped(self, p: BarkContextParams) -> bool:
        """One device program per coarse window / fine block, host sync in
        between: accurate per-stage timings and per-window progress at the
        cost of one host round-trip per window/block."""
        # --- semantic stage
        t0 = time.perf_counter()
        self._progress(EncodingStep.SEMANTIC, 0)
        run = self._semantic_program()
        out, count = run(
            self.semantic_params,
            jnp.asarray(self.tokens),
            self._next_key(),
            jnp.float32(p.min_eos_p),
        )
        count = int(count)
        self.semantic_tokens = np.asarray(out)[:count]
        self._progress(EncodingStep.SEMANTIC, 100)
        self.stats.t_semantic_us += int((time.perf_counter() - t0) * 1e6)
        self.stats.n_sample_semantic += count
        if count == 0:
            print(
                "bark_generate_audio: no semantic tokens generated",
                file=sys.stderr,
            )
            return False

        # --- coarse stage
        sem_hist, n_sh, coarse_hist, n_ch, fine_hist, n_fh = (
            self._voice_runtime
        )
        t0 = time.perf_counter()
        self.coarse_tokens = coarse_pipe.generate_coarse(
            self._coarse_program(),
            self._coarse_window_inputs(),  # densify/tile-prep once, not /win
            self.semantic_tokens,
            p,
            self._next_key(),
            ctx_size=min(COARSE_CTX_SIZE, self.coarse_cfg.block_size),
            progress_cb=lambda pc: self._progress(EncodingStep.COARSE, pc),
            sem_hist=sem_hist[:n_sh],
            coarse_hist=coarse_hist[:n_ch],
        )
        self.stats.t_coarse_us += int((time.perf_counter() - t0) * 1e6)
        self.stats.n_sample_coarse += int(self.coarse_tokens.size)

        # --- fine stage
        t0 = time.perf_counter()
        self.fine_tokens = fine_pipe.generate_fine(
            self._fine_program(),
            self._stage_dense_params("fine"),
            self.coarse_tokens,
            p,
            self._next_key(),
            block_size=self.fine_cfg.block_size,
            progress_cb=lambda pc: self._progress(EncodingStep.FINE, pc),
            fine_hist=fine_hist[:n_fh],
        )
        self.stats.t_fine_us += int((time.perf_counter() - t0) * 1e6)
        self.stats.n_sample_fine += int(self.fine_tokens.size)

        self._decode_codec(self.fine_tokens, p)
        return True

    def _generate_fused(self, p: BarkContextParams) -> bool:
        """Whole-stage on-device programs chained without host syncs: the
        host dispatches semantic -> coarse -> fine asynchronously, reads two
        scalars once, then decodes audio. Token-identical to the stepped
        path for the same seed (tested); per-stage timings report dispatch
        cost only, unless params.stage_sync forces a host sync per stage
        (honest device times, bench.py --stage-times)."""
        sync = p.stage_sync
        count = None
        t0 = time.perf_counter()
        sem_out, sem_count = self._semantic_program()(
            self.semantic_params,
            jnp.asarray(self.tokens),
            self._next_key(),
            jnp.float32(p.min_eos_p),
        )
        if sync:  # device_get forces the transfer (block_until_ready does
            count = int(jax.device_get(sem_count))  # not block under axon)
        self.stats.t_semantic_us += int((time.perf_counter() - t0) * 1e6)

        n_cc = p.n_coarse_codebooks
        sem_hist, n_sh, coarse_hist, n_ch, fine_hist, n_fh = (
            self._voice_runtime
        )

        t0 = time.perf_counter()
        codes, n_steps = self._coarse_stage_program()(
            self.coarse_params, sem_out, sem_count, self._next_key(),
            jnp.asarray(sem_hist), jnp.int32(n_sh),
            jnp.asarray(coarse_hist), jnp.int32(n_ch),
        )
        if sync:
            int(jax.device_get(n_steps))
        self.stats.t_coarse_us += int((time.perf_counter() - t0) * 1e6)

        t0 = time.perf_counter()
        fine_buf = self._fine_stage_program()(
            self.fine_params, codes, n_steps // n_cc, self._next_key(),
            jnp.asarray(fine_hist), jnp.int32(n_fh),
        )
        if sync:
            # transfer the (small) buffer directly: slicing first would
            # dispatch a separate slice program whose load/dispatch through
            # the remote compile helper costs ~0.8 s and would be charged
            # to the fine stage
            jax.device_get(fine_buf)
        self.stats.t_fine_us += int((time.perf_counter() - t0) * 1e6)

        # this sync only waits for the semantic stage (sem_count is its
        # output), overlapping the still-running coarse/fine dispatches; the
        # schedule is then host arithmetic (integer-exact, coarse_schedule)
        if count is None:
            count = int(jax.device_get(sem_count))
        if count == 0:
            print(
                "bark_generate_audio: no semantic tokens generated",
                file=sys.stderr,
            )
            return False
        _, _, n_steps, _ = coarse_pipe.coarse_schedule(count, p)
        n_frames = n_steps // n_cc

        # codec decode directly from the on-device fine buffer, then one
        # batched transfer for audio + token buffers
        self._decode_codec(fine_buf, p, n_frames=n_frames)
        sem_np, codes_np, fine_np, audio_np = jax.device_get(
            (sem_out, codes, fine_buf, self._audio_dev)
        )
        self.semantic_tokens = sem_np[:count]
        self.coarse_tokens = codes_np[:n_frames]
        self.fine_tokens = fine_np[:n_frames]
        hop = self.codec_cfg.hop_length
        self.generated_audio = audio_np[: n_frames * hop]
        self.stats.n_sample_semantic += count
        self.stats.n_sample_coarse += n_steps
        self.stats.n_sample_fine += int(self.fine_tokens.size)
        return True

    def generate_audio_stream(self, text: str, voice=None):
        """Streaming generation: yields float32 PCM chunks as coarse windows
        complete, instead of one buffer at the end (beyond-reference — the
        C++ API is strictly batch, bark.h:171).

        Latency property: the first chunk arrives after the semantic stage +
        ONE coarse window + one fine block + a short codec decode, instead
        of after the whole utterance. Already-yielded samples are final:
        the SEANet decoder is causal, so the per-chunk prefix decode is
        byte-identical to decoding the final sequence in one shot
        (tested), and the streaming fine schedule never rewrites a row it
        has emitted.

        Divergence from the batch pipeline, by construction: the
        bidirectional fine stage refines each chunk's rows with up to
        block_size frames of LEFT context only (batch mode gives rows up to
        half a block of future context), and fine RNG keys are drawn per
        chunk. Utterances that fit one coarse window are bit-identical to
        the batch path's token stream.

        Yields np.float32 arrays; after exhaustion, `get_audio_data()`
        returns the concatenation and statistics are filled like
        generate_audio.
        """
        p = self.params
        preset = self._resolve_voice(voice)
        sem_hist, n_sh, coarse_hist, n_ch, fine_hist, n_fh = (
            self._voice_args(preset)
        )
        self.reset_statistics()
        t_start = time.perf_counter()

        prompt = tokenizer.tokenize_input(
            self.vocab, text, p, block_size=self.semantic_cfg.block_size,
            semantic_history=voice_mod.semantic_history_tokens(preset, p),
        )
        self.tokens = np.asarray(prompt, np.int32)

        # --- semantic stage (fused on-device loop, one sync)
        t0 = time.perf_counter()
        self._progress(EncodingStep.SEMANTIC, 0)
        out, count = self._semantic_program()(
            self.semantic_params,
            jnp.asarray(self.tokens),
            self._next_key(),
            jnp.float32(p.min_eos_p),
        )
        count = int(count)
        self.semantic_tokens = np.asarray(out)[:count]
        self._progress(EncodingStep.SEMANTIC, 100)
        self.stats.t_semantic_us += int((time.perf_counter() - t0) * 1e6)
        self.stats.n_sample_semantic += count
        if count == 0:
            self.generated_audio = np.zeros((0,), np.float32)
            return

        # --- coarse windows, each followed by fine refinement of the new
        # rows and a causal prefix codec decode
        num, den = coarse_pipe.stc_fraction(p)
        _, max_sem_hist, n_steps, n_windows = coarse_pipe.coarse_schedule(
            count, p
        )
        n_cc = p.n_coarse_codebooks
        sws = p.sliding_window_size
        ctx_size = min(COARSE_CTX_SIZE, self.coarse_cfg.block_size)
        sem = (
            self.semantic_tokens if n_sh == 0
            else np.concatenate([sem_hist[:n_sh], self.semantic_tokens])
        )
        coarse_out: list = coarse_hist[:n_ch].tolist()
        fine_block = self.fine_cfg.block_size
        n_fine = p.n_fine_codebooks
        # final fine rows: voice history rows first (context only, not
        # decoded), then refined generated rows
        fine_arr = np.asarray(fine_hist[:n_fh], np.int32).reshape(-1, n_fine)
        coarse_key = self._next_key()
        # same key-draw order as the stepped path (semantic, coarse, fine),
        # and the same per-block split discipline as generate_fine — a
        # one-window utterance streams bit-identically to the batch paths
        fine_key = self._next_key()
        win_prog = self._coarse_program()
        win_inputs = self._coarse_window_inputs()  # densify/prep once
        fine_prog = self._fine_program()
        fine_dense = self._stage_dense_params("fine")
        chunks = []
        emitted_frames = 0
        hop = self.codec_cfg.hop_length

        for w in range(n_windows):
            step_idx = w * sws
            t0 = time.perf_counter()
            semantic_idx = n_sh + (2 * step_idx * den + num) // (2 * num)
            lo = max(semantic_idx - max_sem_hist, 0)
            sem_part = sem[lo:][: coarse_pipe.CTX_SEMANTIC]
            ctx = np.full((ctx_size,), 0, np.int32)
            ctx[: coarse_pipe.CTX_SEMANTIC] = p.coarse_semantic_pad_token
            ctx[: len(sem_part)] = sem_part
            ctx[coarse_pipe.CTX_SEMANTIC] = p.coarse_infer_token
            hist = coarse_out[-p.max_coarse_history:]
            base = coarse_pipe.CTX_SEMANTIC + 1
            ctx[base : base + len(hist)] = hist
            coarse_key, sub = jax.random.split(coarse_key)
            toks = win_prog(
                *win_inputs, jnp.asarray(ctx),
                jnp.int32(base + len(hist)), jnp.int32(step_idx), sub,
            )
            n_valid = min(sws, n_steps - step_idx)
            coarse_out.extend(np.asarray(toks)[:n_valid].tolist())
            self.stats.t_coarse_us += int((time.perf_counter() - t0) * 1e6)
            self.stats.n_sample_coarse += n_valid
            self._progress(
                EncodingStep.COARSE,
                min(100, 100 * (step_idx + n_valid) // n_steps),
            )
            if n_valid % n_cc:
                continue  # only whole frames feed fine/codec

            # --- fine: refine ONLY the new rows, conditioned on up to
            # block_size final rows of left context (pads on the right)
            t0 = time.perf_counter()
            new = np.asarray(
                coarse_out[n_ch + emitted_frames * n_cc :], np.int32
            ).reshape(-1, n_cc)
            new = new - p.semantic_vocab_size
            new[:, 1:] -= (
                np.arange(1, n_cc, dtype=np.int32)[None, :] * p.codebook_size
            )
            new_rows = np.full((len(new), n_fine), p.codebook_size, np.int32)
            new_rows[:, :n_cc] = new
            work = np.concatenate([fine_arr, new_rows])  # history + final + new
            t_new = len(work)
            bstart = max(0, t_new - fine_block)
            block = np.full((fine_block, n_fine), p.codebook_size, np.int32)
            block[: t_new - bstart] = work[bstart:]
            rel = (t_new - len(new)) - bstart
            fine_key, fsub = jax.random.split(fine_key)
            refined = np.asarray(fine_prog(
                fine_dense, jnp.asarray(block), jnp.int32(rel), fsub,
            ))
            fine_arr = np.concatenate(
                [fine_arr, refined[rel : rel + len(new)]]
            )
            self.stats.t_fine_us += int((time.perf_counter() - t0) * 1e6)
            self.stats.n_sample_fine += len(new) * n_fine
            self._progress(
                EncodingStep.FINE,
                min(100, 100 * (step_idx + n_valid) // n_steps),
            )

            # --- causal prefix decode; emit only the new samples
            gen_fine = fine_arr[n_fh:]
            self._decode_codec(gen_fine, p)
            audio = self.generated_audio
            chunk = audio[emitted_frames * hop : len(gen_fine) * hop]
            emitted_frames = len(gen_fine)
            chunks.append(chunk)
            yield chunk

        self.coarse_tokens = np.asarray(
            coarse_out[n_ch:], np.int32
        ).reshape(-1, n_cc) - p.semantic_vocab_size
        self.coarse_tokens[:, 1:] -= (
            np.arange(1, n_cc, dtype=np.int32)[None, :] * p.codebook_size
        )
        self.fine_tokens = fine_arr[n_fh:]
        self.generated_audio = (
            np.concatenate(chunks) if chunks else np.zeros((0,), np.float32)
        )
        self.stats.t_eval_us += int((time.perf_counter() - t_start) * 1e6)

    def generate_audio_long(
        self, text: str, voice=None, silence_s: float = 0.25
    ) -> bool:
        """Long-form generation, suno's documented recipe: split the script
        into generation-sized sentences (text/longform.py), generate each
        one conditioned on the PREVIOUS sentence's generation as its history
        prompt (voice continuity — the save_as_prompt loop from suno's
        long-form notebook), and concatenate with `silence_s` of silence
        between sentences. The reference instead hard-truncates anything
        beyond its 256-token prompt / 768 semantic steps (bark.cpp:624-651).

        `voice` seeds the FIRST sentence (optional preset); later sentences
        always inherit the running generation. Statistics accumulate across
        sentences; `get_audio_data()` returns the full script's audio.
        """
        pieces = longform.split_sentences(text)
        if not pieces:
            return False
        current = self._resolve_voice(voice)
        silence = np.zeros(
            (int(silence_s * self.params.sample_rate),), np.float32
        )
        parts = []
        totals = BarkStatistics(t_load_us=self.stats.t_load_us)
        for i, piece in enumerate(pieces):
            if not self.generate_audio(piece, voice=current):
                return False
            parts.append(self.generated_audio)
            if i < len(pieces) - 1:
                parts.append(silence)
                current = voice_mod.preset_from_generation(
                    self.semantic_tokens, self.coarse_tokens,
                    self.fine_tokens, self.params,
                )
            for f in (
                "t_eval_us", "t_semantic_us", "t_coarse_us", "t_fine_us",
                "n_sample_semantic", "n_sample_coarse", "n_sample_fine",
            ):
                setattr(totals, f, getattr(totals, f) + getattr(self.stats, f))
        self.stats = totals
        self.generated_audio = np.concatenate(parts)
        return True

    def generate_audio_stream_long(
        self, text: str, voice=None, silence_s: float = 0.25
    ):
        """Streaming long-form generation: sentence-chained like
        generate_audio_long, chunk-yielding like generate_audio_stream —
        audio for a whole script flows from the first coarse window of the
        first sentence. Yields float32 PCM chunks; `get_audio_data()`
        afterwards returns the concatenation."""
        pieces = longform.split_sentences(text)
        current = self._resolve_voice(voice)
        silence = np.zeros(
            (int(silence_s * self.params.sample_rate),), np.float32
        )
        parts = []
        totals = BarkStatistics(t_load_us=self.stats.t_load_us)
        for i, piece in enumerate(pieces):
            for chunk in self.generate_audio_stream(piece, voice=current):
                parts.append(chunk)
                yield chunk
            if i < len(pieces) - 1:
                parts.append(silence)
                yield silence
                current = voice_mod.preset_from_generation(
                    self.semantic_tokens, self.coarse_tokens,
                    self.fine_tokens, self.params,
                )
            for f in (
                "t_eval_us", "t_semantic_us", "t_coarse_us", "t_fine_us",
                "n_sample_semantic", "n_sample_coarse", "n_sample_fine",
            ):
                setattr(totals, f, getattr(totals, f) + getattr(self.stats, f))
        self.stats = totals
        self.generated_audio = (
            np.concatenate(parts) if parts else np.zeros((0,), np.float32)
        )

    def warmup(self, parallel: bool = True) -> float:
        """Compile the fused single-request pipeline's stage executables
        into the (persistent) compilation cache without generating audio
        or consuming RNG state.

        Ahead-of-time lowering with ShapeDtypeStructs reproduces exactly
        the avals `generate_audio` passes, so the later real call hits
        the compile cache for every big program. With parallel=True the
        stage programs compile concurrently — the remote compile helper
        overlaps independent compiles ~1.3x (tools/tpu_compile_probe.py).
        Returns wall-clock seconds spent."""
        import concurrent.futures as cf
        import time as _time

        p = self.params
        t0 = _time.perf_counter()
        sds = jax.ShapeDtypeStruct
        key_aval = sds((2,), jnp.uint32)
        i32s = sds((), jnp.int32)
        sem_hist, _, coarse_hist, _, fine_hist, _ = self._voice_runtime
        max_steps = p.n_steps_text_encoder
        n_cc = p.n_coarse_codebooks
        max_frames = coarse_pipe.max_coarse_steps(max_steps, p) // n_cc
        n_q = self.codec_cfg.n_q_for_bandwidth(p.target_bandwidth)

        jobs = [
            ("semantic", self._semantic_program(), (
                self.semantic_params, sds((513,), jnp.int32), key_aval,
                sds((), jnp.float32),
            )),
            ("coarse", self._coarse_stage_program(), (
                self.coarse_params, sds((max_steps,), jnp.int32), i32s,
                key_aval,
                sds(sem_hist.shape, jnp.int32), i32s,
                sds(coarse_hist.shape, jnp.int32), i32s,
            )),
            ("fine", self._fine_stage_program(), (
                self.fine_params, sds((max_frames, n_cc), jnp.int32), i32s,
                key_aval,
                sds(fine_hist.shape, jnp.int32), i32s,
            )),
        ]
        # codec executables are keyed by the CODEC_FRAME_CHUNK-padded
        # frame count (one per bucket up to the pipeline's max)
        for padded in range(
            CODEC_FRAME_CHUNK,
            (-(-max_frames // CODEC_FRAME_CHUNK) + 1) * CODEC_FRAME_CHUNK,
            CODEC_FRAME_CHUNK,
        ):
            jobs.append((
                f"codec{padded}", self._codec_program(),
                (self.codec_params, sds((padded, n_q), jnp.int32)),
            ))

        def compile_one(job):
            name, fn, args = job
            fn.lower(*args).compile()
            return name

        if parallel:
            with cf.ThreadPoolExecutor(max_workers=4) as pool:
                list(pool.map(compile_one, jobs))
        else:
            for job in jobs:
                compile_one(job)
        return _time.perf_counter() - t0

    def _decode_codec(self, fine_tokens, p, n_frames: Optional[int] = None):
        """RVQ decode + SEANet synthesis (bark.cpp:2146-2167). Accepts a host
        array (stepped path; sets generated_audio) or a device array with
        explicit n_frames (fused path; leaves audio on device in
        self._audio_dev for a batched transfer)."""
        n_q = self.codec_cfg.n_q_for_bandwidth(p.target_bandwidth)
        on_device = n_frames is not None
        if not on_device:
            n_frames = fine_tokens.shape[0]
        # pad-then-trim is safe only when the pad rows stay out of the first
        # conv's REFLECT window (rows 1..kernel_size-1 mirror into the left
        # pad); shorter utterances decode at their exact length
        if n_frames >= self.codec_cfg.kernel_size:
            padded = max(CODEC_FRAME_CHUNK,
                         -(-n_frames // CODEC_FRAME_CHUNK) * CODEC_FRAME_CHUNK)
        else:
            padded = max(n_frames, 1)
        if on_device:
            # slice/pad on device; rows past n_frames hold the pad id but the
            # causal decoder output before n_frames*hop is unaffected
            codes_p = fine_tokens[:padded, :n_q]
            if codes_p.shape[0] < padded:
                codes_p = jnp.pad(
                    codes_p, ((0, padded - codes_p.shape[0]), (0, 0))
                )
        else:
            codes = fine_tokens[:, :n_q]
            codes_p = np.zeros((padded, n_q), np.int32)
            codes_p[:n_frames] = codes[:padded]
            codes_p = jnp.asarray(codes_p)
        audio = self._codec_program()(self.codec_params, codes_p)
        if on_device:
            self._audio_dev = audio
        else:
            hop = self.codec_cfg.hop_length
            self.generated_audio = np.asarray(audio)[: n_frames * hop]

    # ------------------------------------------------------------ getters

    def get_audio_data(self) -> Optional[np.ndarray]:
        return self.generated_audio

    def get_audio_data_size(self) -> int:
        return 0 if self.generated_audio is None else int(
            self.generated_audio.size
        )

    def save_voice(self, path: str) -> None:
        """Save the last generation's token buffers as a reusable suno-format
        voice preset (.npz) — suno's save_as_prompt (bark/api.py); generate
        once, then pass the file back as `voice=` to keep the speaker."""
        if self.semantic_tokens.size == 0 or self.fine_tokens.size == 0:
            raise ValueError(
                "save_voice: no finished generation in this context"
            )
        voice_mod.save_voice_preset(
            path,
            voice_mod.preset_from_generation(
                self.semantic_tokens, self.coarse_tokens, self.fine_tokens,
                self.params,
            ),
        )

    def get_load_time(self) -> int:
        return self.stats.t_load_us

    def get_eval_time(self) -> int:
        return self.stats.t_eval_us

    def reset_statistics(self) -> None:
        load = self.stats.t_load_us  # load time survives a reset
        self.stats = BarkStatistics(t_load_us=load)

    def print_statistics(self) -> None:
        """Per-stage report, like bark_print_statistics (bark.cpp:176-182)."""
        s = self.stats
        for name, t_us, n in (
            ("semantic", s.t_semantic_us, s.n_sample_semantic),
            ("coarse", s.t_coarse_us, s.n_sample_coarse),
            ("fine", s.t_fine_us, s.n_sample_fine),
        ):
            per = t_us / 1000.0 / max(n, 1)
            print(
                f"bark_tpu: {name:>9} time = {t_us / 1000.0:8.2f} ms "
                f"/ {n} tokens ({per:.2f} ms per token)",
                file=sys.stderr,
            )


# ---------------------------------------------------------------- functions


def bark_load_model(
    model_path: str,
    params: Optional[BarkContextParams] = None,
    seed: int = 0,
) -> BarkContext:
    """Load ggml_weights.bin and build a ready-to-generate context
    (bark_load_model, bark.cpp:1165-1184)."""
    t0 = time.perf_counter()
    model = ggml.read_model_file(model_path)
    ctx = BarkContext(model, params, seed)
    ctx.stats.t_load_us = int((time.perf_counter() - t0) * 1e6)
    return ctx


def bark_generate_audio(
    ctx: BarkContext, text: str, n_threads: int = 0, voice=None
) -> bool:
    del n_threads  # XLA owns threading on TPU/CPU
    return ctx.generate_audio(text, voice=voice)


def bark_save_voice(ctx: BarkContext, path: str) -> None:
    """Persist the context's last generation as a voice preset (.npz) —
    beyond the C API: suno's save_as_prompt equivalent."""
    ctx.save_voice(path)


def bark_get_audio_data(ctx: BarkContext) -> Optional[np.ndarray]:
    return ctx.get_audio_data()


def bark_get_audio_data_size(ctx: BarkContext) -> int:
    return ctx.get_audio_data_size()


def bark_get_load_time(ctx: BarkContext) -> int:
    return ctx.get_load_time()


def bark_get_eval_time(ctx: BarkContext) -> int:
    return ctx.get_eval_time()


def bark_reset_statistics(ctx: BarkContext) -> None:
    ctx.reset_statistics()


def bark_model_quantize(fname_inp: str, fname_out: str, ftype: int) -> bool:
    return model_quantize(fname_inp, fname_out, ftype)


def bark_free(ctx: Optional[BarkContext]) -> None:
    """Drop references; buffers are freed by the JAX runtime."""
    if ctx is not None:
        ctx._programs.clear()
