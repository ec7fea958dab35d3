"""Spectral-MSE parity tool sanity (tools/compare_wav.py)."""

import json
import subprocess
import sys

import numpy as np

from bark_tpu.utils.wav import write_wav
from tools.compare_wav import spectral_mse


def test_identical_is_zero(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    assert spectral_mse(x, x) == (0.0, 0.0)


def test_noise_vs_tone_is_large():
    t = np.arange(24000, dtype=np.float32) / 24000
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    noise = np.random.default_rng(1).standard_normal(24000).astype(np.float32) * 0.3
    lin, mel = spectral_mse(tone, noise)
    lin2, mel2 = spectral_mse(tone, tone * 0.999)
    assert mel > 100 * max(mel2, 1e-9)


def test_cli(tmp_path):
    t = np.arange(24000, dtype=np.float32) / 24000
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    a, b = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(a, tone, 24000)
    write_wav(b, tone, 24000)
    out = subprocess.run(
        [sys.executable, "tools/compare_wav.py", a, b],
        capture_output=True, text=True, check=True,
    )
    res = json.loads(out.stdout)
    assert res["spectral_mse"] == 0.0 and res["n_samples"] == [24000, 24000]
