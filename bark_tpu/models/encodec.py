"""EnCodec 24 kHz neural codec: RVQ (de)quantizer + SEANet decoder/encoder.

The reference delegates this to the encodec.cpp submodule (SURVEY.md §2.8);
the architecture here is reconstructed from the tensor names convert.py
writes (/root/reference/convert.py:41-50, 113-199) and the upstream EnCodec
model family:

- SEANet decoder: Conv1d(128->512, k7) -> 2-layer LSTM(512) with skip ->
  4 x [ELU -> ConvTranspose1d(C->C/2, k=2r, stride=r) -> ResidualUnit(C/2)]
  for ratios (8, 5, 4, 2) -> ELU -> Conv1d(32->1, k7). All convolutions are
  causal (left-padded; transposed convs trim `k - stride` on the right);
  weight-norm is folded into plain weights at convert time
  (convert.py:138-148). Total upsampling 8*5*4*2 = 320 (24 kHz / 75 Hz).
- ResidualUnit(dim): ELU -> Conv1d(dim->dim/2, k=residual_kernel_size=3) ->
  ELU -> Conv1d(dim/2->dim, k=1), plus a Conv1d(dim->dim, k=1) shortcut.
- RVQ: 32 codebook layers of [1024, 128] embeddings
  (quantizer.vq.layers.N._codebook.embed); decode = sum of the selected
  codebook embeddings; bandwidth 6 kbps at 75 Hz / 10-bit books -> 8 books.
- SEANet encoder (the compression direction, used by encodec.cpp's
  compress path): the exact mirror with strided convs.

Everything is channels-last (T, C) jnp; convs via lax.conv_general_dilated,
the LSTM via lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

RATIOS = (8, 5, 4, 2)  # decoder order; encoder uses reversed
BITS_PER_CODEBOOK = 10  # log2(n_bins=1024)


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    in_channels: int = 1
    hidden_dim: int = 128
    n_filters: int = 32
    kernel_size: int = 7
    residual_kernel_size: int = 3
    n_bins: int = 1024
    sample_rate: int = 24000
    n_q_total: int = 32

    @property
    def hop_length(self) -> int:
        out = 1
        for r in RATIOS:
            out *= r
        return out

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop_length

    def n_q_for_bandwidth(self, bandwidth_kbps: float) -> int:
        per_book = self.frame_rate * BITS_PER_CODEBOOK  # bits/sec per book
        return max(1, int(np.floor(bandwidth_kbps * 1000 / per_book)))


# ------------------------------------------------------------------ conv ops


def _pad1d_reflect(x, pad_left: int, pad_right: int):
    """EnCodec's _pad1d with mode='reflect' over the time axis of (T, C).

    Mirrors transformers.models.encodec EncodecConv1d._pad1d: when the
    signal is shorter than the largest pad, it is zero-extended first so the
    reflection is defined, and the extension is trimmed afterwards.
    """
    T = x.shape[0]
    max_pad = max(pad_left, pad_right)
    extra = max_pad - T + 1 if T <= max_pad else 0
    if extra:
        x = jnp.pad(x, ((0, extra), (0, 0)))
    x = jnp.pad(x, ((pad_left, pad_right), (0, 0)), mode="reflect")
    return x[: x.shape[0] - extra] if extra else x


def causal_conv1d(x, w, b, stride: int = 1, dilation: int = 1):
    """x: (T, Cin); w: (Cout, Cin, K) torch layout.

    EnCodec causal conv: reflect-pad `k_eff - stride` on the left plus the
    right 'extra padding' that completes the last frame for strided convs
    (EncodecConv1d.forward / _get_extra_padding_for_conv1d)."""
    k = w.shape[2]
    k_eff = (k - 1) * dilation + 1
    pad_total = k_eff - stride
    T = x.shape[0]
    n_frames = -(-(T - k_eff + pad_total) // stride)  # ceil
    ideal = n_frames * stride + k_eff - pad_total
    x = _pad1d_reflect(x, pad_total, max(ideal - T, 0))
    out = jax.lax.conv_general_dilated(
        x[None],  # (1, T', Cin)
        jnp.transpose(w, (2, 1, 0)),  # (K, Cin, Cout)
        window_strides=(stride,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[0]
    return out + b[None, :]


def causal_conv_transpose1d(x, w, b, stride: int):
    """x: (T, Cin); w: (Cin, Cout, K) torch ConvTranspose layout.

    ConvTranspose == conv of the stride-dilated input with the flipped kernel
    and full padding; causal EnCodec then trims `k - stride` from the right,
    giving an exact T*stride output.
    """
    k = w.shape[2]
    # (K, Cin, Cout) flipped along K
    rhs = jnp.flip(jnp.transpose(w, (2, 0, 1)), axis=0)
    out = jax.lax.conv_general_dilated(
        x[None],
        rhs,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[0]
    out = out + b[None, :]
    trim = k - stride
    return out[: out.shape[0] - trim] if trim > 0 else out


def lstm_stack(x, layers: List[Dict[str, jnp.ndarray]]):
    """Multi-layer LSTM over (T, C) + EnCodec's skip connection."""
    y = x.astype(jnp.float32)
    for lp in layers:
        w_ih = lp["w_ih"].astype(jnp.float32)  # (4H, C)
        w_hh = lp["w_hh"].astype(jnp.float32)  # (4H, H)
        bias = (lp["b_ih"] + lp["b_hh"]).astype(jnp.float32)  # (4H,)
        H = w_hh.shape[1]
        x_proj = y @ w_ih.T + bias  # (T, 4H)

        def step(carry, xp):
            h, c = carry
            gates = xp + h @ w_hh.T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (_, _), hs = jax.lax.scan(
            step, (jnp.zeros((H,)), jnp.zeros((H,))), x_proj
        )
        y = hs
    return (y + x.astype(jnp.float32)).astype(x.dtype)


def _residual_unit(x, p):
    """EnCodec residual unit with 1x1-conv shortcut."""
    y = jax.nn.elu(x)
    y = causal_conv1d(y, p["block1_w"], p["block1_b"])
    y = jax.nn.elu(y)
    y = causal_conv1d(y, p["block3_w"], p["block3_b"])
    sc = causal_conv1d(x, p["shortcut_w"], p["shortcut_b"])
    return sc + y


# ------------------------------------------------------------------- model


def rvq_decode(codebooks, codes):
    """codebooks: (n_q_total, n_bins, dim); codes: (T, n_q) -> (T, dim)."""
    n_q = codes.shape[1]
    gathered = jnp.take_along_axis(
        codebooks[:n_q],  # (n_q, n_bins, dim)
        codes.T[:, :, None],  # (n_q, T, 1)
        axis=1,
    )  # (n_q, T, dim)
    return gathered.sum(axis=0)


def rvq_encode(codebooks, latent, n_q: int):
    """Greedy residual VQ: latent (T, dim) -> codes (T, n_q) int32."""

    def body(residual, embed):
        # embed: (n_bins, dim)
        d = (
            jnp.sum(residual**2, axis=1, keepdims=True)
            - 2.0 * residual @ embed.T
            + jnp.sum(embed**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        residual = residual - embed[idx]
        return residual, idx.astype(jnp.int32)

    _, codes = jax.lax.scan(body, latent, codebooks[:n_q])
    return codes.T  # (T, n_q)


def decoder_forward(params, latent):
    """latent (T, hidden_dim) -> mono PCM (T * 320,) float32."""
    dec = params["decoder"]
    x = causal_conv1d(latent, dec["conv_in_w"], dec["conv_in_b"])
    x = lstm_stack(x, dec["lstm"])
    for stage, r in zip(dec["stages"], RATIOS):
        x = jax.nn.elu(x)
        x = causal_conv_transpose1d(x, stage["convtr_w"], stage["convtr_b"], r)
        x = _residual_unit(x, stage)
    x = jax.nn.elu(x)
    x = causal_conv1d(x, dec["conv_out_w"], dec["conv_out_b"])
    return x[:, 0].astype(jnp.float32)


def encoder_forward(params, audio):
    """mono PCM (T,) -> latent (T // 320, hidden_dim)."""
    enc = params["encoder"]
    x = causal_conv1d(
        audio[:, None], enc["conv_in_w"], enc["conv_in_b"]
    )
    for stage, r in zip(enc["stages"], reversed(RATIOS)):
        x = _residual_unit(x, stage)
        x = jax.nn.elu(x)
        x = causal_conv1d(x, stage["down_w"], stage["down_b"], stride=r)
    x = lstm_stack(x, enc["lstm"])
    x = jax.nn.elu(x)
    x = causal_conv1d(x, enc["conv_out_w"], enc["conv_out_b"])
    return x


def decode_codes(params, codes):
    """codes (T, n_q) int32 -> PCM (T*320,) f32. The TTS path."""
    latent = rvq_decode(params["quantizer"], codes)
    return decoder_forward(params, latent)


def encode_audio(params, audio, n_q: int):
    """PCM (T,) f32 -> codes (T//320, n_q) int32. The compression path."""
    latent = encoder_forward(params, audio)
    return rvq_encode(params["quantizer"], latent, n_q)


# --------------------------------------------------------------- load/init


def init_params(
    cfg: CodecConfig,
    key,
    dtype=jnp.float32,
    scale: float = 0.05,
    with_encoder: bool = False,
):
    """Random codec params with the real tensor structure; used by benchmarks
    and tests (real weights come from params_from_section)."""
    ks = iter(jax.random.split(key, 256))

    def rnd(*shape):
        return (jax.random.normal(next(ks), shape, jnp.float32) * scale).astype(
            dtype
        )

    def res_unit(dim):
        return {
            "block1_w": rnd(dim // 2, dim, cfg.residual_kernel_size),
            "block1_b": rnd(dim // 2),
            "block3_w": rnd(dim, dim // 2, 1),
            "block3_b": rnd(dim),
            "shortcut_w": rnd(dim, dim, 1),
            "shortcut_b": rnd(dim),
        }

    def lstm(dim):
        return [
            {
                "w_ih": rnd(4 * dim, dim),
                "w_hh": rnd(4 * dim, dim),
                "b_ih": rnd(4 * dim),
                "b_hh": rnd(4 * dim),
            }
            for _ in range(2)
        ]

    C = cfg.n_filters * 2 ** len(RATIOS)
    dec_stages = []
    for r in RATIOS:
        stage = {
            "convtr_w": rnd(C, C // 2, 2 * r),
            "convtr_b": rnd(C // 2),
        }
        stage.update(res_unit(C // 2))
        dec_stages.append(stage)
        C //= 2
    C0 = cfg.n_filters * 2 ** len(RATIOS)
    decoder = {
        "conv_in_w": rnd(C0, cfg.hidden_dim, cfg.kernel_size),
        "conv_in_b": rnd(C0),
        "lstm": lstm(C0),
        "stages": dec_stages,
        "conv_out_w": rnd(1, C, cfg.kernel_size),
        "conv_out_b": rnd(1),
    }
    params = {
        "quantizer": (
            jax.random.normal(
                next(ks), (cfg.n_q_total, cfg.n_bins, cfg.hidden_dim)
            )
            * scale
        ).astype(jnp.float32),
        "decoder": decoder,
    }
    if with_encoder:
        C = cfg.n_filters
        enc_stages = []
        for r in reversed(RATIOS):
            stage = res_unit(C)
            stage.update({"down_w": rnd(2 * C, C, 2 * r), "down_b": rnd(2 * C)})
            enc_stages.append(stage)
            C *= 2
        params["encoder"] = {
            "conv_in_w": rnd(cfg.n_filters, cfg.in_channels, cfg.kernel_size),
            "conv_in_b": rnd(cfg.n_filters),
            "stages": enc_stages,
            "lstm": lstm(C),
            "conv_out_w": rnd(cfg.hidden_dim, C, cfg.kernel_size),
            "conv_out_b": rnd(cfg.hidden_dim),
        }
    return params


def init_params_host(
    cfg: CodecConfig,
    seed: int,
    dtype=jnp.float32,
    scale: float = 0.05,
    with_encoder: bool = False,
):
    """Numpy-side `init_params` (one upload instead of a compiled jax.random
    program per tensor — see gpt.init_params_host)."""
    rng = np.random.RandomState(seed)
    host = jax.eval_shape(
        lambda: init_params(
            cfg, jax.random.PRNGKey(0), jnp.float32, scale, with_encoder
        )
    )
    host = jax.tree.map(
        lambda s: (rng.randn(*s.shape) * scale).astype(np.float32), host
    )
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), host)


def init_params_device(
    cfg: CodecConfig,
    seed: int,
    dtype=jnp.float32,
    scale: float = 0.05,
    with_encoder: bool = False,
):
    """`init_params` generated ON the device in one jitted program — for
    benchmarks over a degraded remote-TPU tunnel (see gpt.init_params_device)."""
    gen = jax.jit(
        lambda key: init_params(cfg, key, jnp.float32, scale, with_encoder)
    )
    params = gen(jax.random.PRNGKey(seed))
    if dtype != jnp.float32:
        params = jax.jit(
            lambda t: jax.tree.map(lambda x: x.astype(dtype), t),
            donate_argnums=0,
        )(params)
    return params


def _lstm_params(tensors, prefix: str, dtype):
    layers = []
    for l in (0, 1):
        layers.append(
            {
                "w_ih": jnp.asarray(
                    tensors[f"{prefix}.lstm.weight_ih_l{l}"].to_float32(), dtype
                ),
                "w_hh": jnp.asarray(
                    tensors[f"{prefix}.lstm.weight_hh_l{l}"].to_float32(), dtype
                ),
                "b_ih": jnp.asarray(
                    tensors[f"{prefix}.lstm.bias_ih_l{l}"].to_float32(), dtype
                ),
                "b_hh": jnp.asarray(
                    tensors[f"{prefix}.lstm.bias_hh_l{l}"].to_float32(), dtype
                ),
            }
        )
    return layers


def _conv(tensors, name: str, dtype, cout: int, cin: int):
    """Fetch a conv weight+bias pair, restoring dims the reference converter
    squeezed away (convert.py:136 squeezes, so k=1 convs arrive 2-D and
    1-channel convs lose their channel dim)."""
    w = tensors[f"{name}.weight"].to_float32().reshape(cout, cin, -1)
    b = np.atleast_1d(tensors[f"{name}.bias"].to_float32())
    return jnp.asarray(w, dtype), jnp.asarray(b, dtype)


def params_from_section(sec, dtype=jnp.float32) -> Dict:
    """Build the codec param pytree from a parsed CodecSection."""
    t = sec.tensors
    hidden = sec.hparams.hidden_dim
    n_filters = sec.hparams.n_filters
    C0 = n_filters * 2 ** len(RATIOS)  # decoder entry width
    n_q_total = 0
    embeds = []
    while f"quantizer.vq.layers.{n_q_total}._codebook.embed" in t:
        embeds.append(
            t[f"quantizer.vq.layers.{n_q_total}._codebook.embed"].to_float32()
        )
        n_q_total += 1
    quantizer = jnp.asarray(np.stack(embeds), jnp.float32)  # kept f32

    def res_unit(prefix: str, dim: int) -> Dict:
        b1w, b1b = _conv(t, f"{prefix}.block.1.conv.conv", dtype, dim // 2, dim)
        b3w, b3b = _conv(t, f"{prefix}.block.3.conv.conv", dtype, dim, dim // 2)
        sw, sb = _conv(t, f"{prefix}.shortcut.conv.conv", dtype, dim, dim)
        return {
            "block1_w": b1w, "block1_b": b1b,
            "block3_w": b3w, "block3_b": b3b,
            "shortcut_w": sw, "shortcut_b": sb,
        }

    # decoder: conv@0, lstm@1, then (elu, convtr, res) at (2,3,4) (5,6,7)...
    dec_stages = []
    C = C0
    for i in range(4):
        convtr_idx = 3 + 3 * i
        res_idx = convtr_idx + 1
        # ConvTranspose1d weights are (Cin, Cout, K)
        cw = (
            t[f"decoder.model.{convtr_idx}.convtr.convtr.weight"]
            .to_float32()
            .reshape(C, C // 2, -1)
        )
        cb = np.atleast_1d(
            t[f"decoder.model.{convtr_idx}.convtr.convtr.bias"].to_float32()
        )
        stage = {
            "convtr_w": jnp.asarray(cw, dtype),
            "convtr_b": jnp.asarray(cb, dtype),
        }
        stage.update(res_unit(f"decoder.model.{res_idx}", C // 2))
        dec_stages.append(stage)
        C //= 2
    ci_w, ci_b = _conv(t, "decoder.model.0.conv.conv", dtype, C0, hidden)
    co_w, co_b = _conv(t, "decoder.model.15.conv.conv", dtype, 1, C)
    decoder = {
        "conv_in_w": ci_w, "conv_in_b": ci_b,
        "lstm": _lstm_params(t, "decoder.model.1", dtype),
        "stages": dec_stages,
        "conv_out_w": co_w, "conv_out_b": co_b,
    }

    params = {"quantizer": quantizer, "decoder": decoder}

    # encoder (present in bark files; optional for TTS)
    if "encoder.model.0.conv.conv.weight" in t:
        enc_stages = []
        C = n_filters
        for i in range(4):
            res_idx = 1 + 3 * i
            down_idx = res_idx + 2
            stage = res_unit(f"encoder.model.{res_idx}", C)
            dw, db = _conv(
                t, f"encoder.model.{down_idx}.conv.conv", dtype, 2 * C, C
            )
            stage.update({"down_w": dw, "down_b": db})
            enc_stages.append(stage)
            C *= 2
        ei_w, ei_b = _conv(
            t, "encoder.model.0.conv.conv", dtype, n_filters,
            sec.hparams.in_channels,
        )
        eo_w, eo_b = _conv(t, "encoder.model.15.conv.conv", dtype, hidden, C)
        params["encoder"] = {
            "conv_in_w": ei_w, "conv_in_b": ei_b,
            "stages": enc_stages,
            "lstm": _lstm_params(t, "encoder.model.13", dtype),
            "conv_out_w": eo_w, "conv_out_b": eo_b,
        }
    return params
