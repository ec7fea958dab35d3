"""EnCodec numerics vs torch oracles.

The codec ops are verified piecewise against torch.nn equivalents with
EnCodec's causal padding conventions (REFLECT left-pad k_eff - stride plus
the right extra-padding that completes a strided frame for convs, right-trim
k - stride for transposed convs), and the LSTM against torch.nn.LSTM. This
anchors the fidelity-critical path (SURVEY.md §7 hard part 3) without
needing real weights; tests/test_hf_parity.py additionally checks the whole
codec against transformers' EncodecModel.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from bark_tpu.models import encodec


def rnd(rng, *shape):
    return rng.normal(0, 0.5, shape).astype(np.float32)


@pytest.mark.parametrize("stride,dilation,k", [(1, 1, 7), (2, 1, 4), (4, 1, 8),
                                               (1, 2, 3), (5, 1, 10)])
def test_causal_conv1d_vs_torch(stride, dilation, k):
    rng = np.random.default_rng(0)
    T, cin, cout = 40, 3, 5
    x = rnd(rng, T, cin)
    w = rnd(rng, cout, cin, k)
    b = rnd(rng, cout)

    ours = np.asarray(
        encodec.causal_conv1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride, dilation
        )
    )

    # the EnCodec padding recipe (EncodecConv1d.forward): reflect left pad of
    # padding_total plus right 'extra padding' completing the last frame
    k_eff = (k - 1) * dilation + 1
    pad = k_eff - stride
    n_frames = -(-(T - k_eff + pad) // stride)
    extra = max(n_frames * stride + k_eff - pad - T, 0)
    xt = torch.from_numpy(x.T[None])  # (1, Cin, T)
    xt = torch.nn.functional.pad(xt, (pad, extra), mode="reflect")
    ref = torch.nn.functional.conv1d(
        xt, torch.from_numpy(w), torch.from_numpy(b), stride=stride,
        dilation=dilation,
    )[0].T.numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,k", [(2, 4), (4, 8), (5, 10), (8, 16)])
def test_causal_conv_transpose1d_vs_torch(stride, k):
    rng = np.random.default_rng(1)
    T, cin, cout = 13, 6, 4
    x = rnd(rng, T, cin)
    w = rnd(rng, cin, cout, k)  # torch ConvTranspose1d layout
    b = rnd(rng, cout)

    ours = np.asarray(
        encodec.causal_conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride
        )
    )

    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x.T[None]), torch.from_numpy(w),
        torch.from_numpy(b), stride=stride,
    )[0].T.numpy()
    ref = ref[: ref.shape[0] - (k - stride)]  # causal right trim

    assert ours.shape == (T * stride, cout)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_lstm_stack_vs_torch():
    rng = np.random.default_rng(2)
    T, C = 23, 8
    x = rnd(rng, T, C)
    layers = []
    tl = torch.nn.LSTM(C, C, num_layers=2)
    with torch.no_grad():
        for l in (0, 1):
            layers.append({
                "w_ih": jnp.asarray(
                    getattr(tl, f"weight_ih_l{l}").numpy()),
                "w_hh": jnp.asarray(
                    getattr(tl, f"weight_hh_l{l}").numpy()),
                "b_ih": jnp.asarray(getattr(tl, f"bias_ih_l{l}").numpy()),
                "b_hh": jnp.asarray(getattr(tl, f"bias_hh_l{l}").numpy()),
            })
        ref, _ = tl(torch.from_numpy(x))
    ref = ref.detach().numpy() + x  # EnCodec adds the skip connection

    ours = np.asarray(encodec.lstm_stack(jnp.asarray(x), layers))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_rvq_decode_is_codebook_sum():
    rng = np.random.default_rng(3)
    books = jnp.asarray(rnd(rng, 8, 16, 4))
    codes = jnp.asarray(rng.integers(0, 16, size=(11, 5)).astype(np.int32))
    out = np.asarray(encodec.rvq_decode(books, codes))
    ref = sum(
        np.asarray(books)[q][np.asarray(codes)[:, q]] for q in range(5)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_rvq_encode_matches_greedy_oracle():
    """rvq_encode must pick, per stage, the nearest codebook entry to the
    running residual (greedy residual VQ)."""
    rng = np.random.default_rng(4)
    books = rnd(rng, 4, 8, 6)
    latent = rnd(rng, 9, 6)

    residual = latent.copy()
    expected = []
    for q in range(4):
        d = ((residual[:, None, :] - books[q][None, :, :]) ** 2).sum(-1)
        idx = d.argmin(axis=1)
        expected.append(idx)
        residual = residual - books[q][idx]
    expected = np.stack(expected, axis=1)

    codes = np.asarray(
        encodec.rvq_encode(jnp.asarray(books), jnp.asarray(latent), 4)
    )
    np.testing.assert_array_equal(codes, expected)


def test_decoder_upsamples_320x():
    rng = np.random.default_rng(5)
    cfg = encodec.CodecConfig(hidden_dim=8, n_filters=2, n_bins=16, n_q_total=4)
    import jax

    params = encodec.init_params(cfg, jax.random.PRNGKey(0))
    codes = jnp.asarray(rng.integers(0, 16, size=(7, 4)).astype(np.int32))
    audio = encodec.decode_codes(params, codes)
    assert audio.shape == (7 * 320,)
    assert np.all(np.isfinite(np.asarray(audio)))


def test_encoder_decoder_shapes_invert():
    rng = np.random.default_rng(6)
    cfg = encodec.CodecConfig(hidden_dim=8, n_filters=2, n_bins=16, n_q_total=4)
    import jax

    params = encodec.init_params(
        cfg, jax.random.PRNGKey(1), with_encoder=True
    )
    audio = jnp.asarray(rnd(rng, 4 * 320))
    codes = encodec.encode_audio(params, audio, n_q=4)
    assert codes.shape == (4, 4)
    assert np.all((np.asarray(codes) >= 0) & (np.asarray(codes) < 16))
