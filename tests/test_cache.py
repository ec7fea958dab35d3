"""Persistent-cache hygiene: Pallas kernel payloads must be
content-addressed.

Mosaic serializes the kernel's MLIR module into the tpu_custom_call
backend_config WITH source locations, so a shifted line number changes the
payload and invalidates the kernel's persistent-cache entry — measured r4
as "cold start per code version" (bark-small ~720 s, bark-large ~2200 s
unrolled). utils/cache.strip_mosaic_locations() runs MLIR's
strip-debuginfo pass before serialization; this test asserts the lowered
module text is then invariant under pure line-number shifts.
"""

import importlib.util

import jax
import jax.numpy as jnp

from bark_tpu.utils import cache

_KERNEL_SRC = """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

PAD = 0


def make():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def run(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x)

    return run
"""


def _lower_text(tmp_path, pad_lines):
    code = _KERNEL_SRC.replace("PAD = 0", "PAD = 0\n" + "# pad\n" * pad_lines)
    f = tmp_path / f"pk_{pad_lines}.py"
    f.write_text(code)
    spec = importlib.util.spec_from_file_location(f"pk_{pad_lines}", f)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    x = jnp.zeros((8, 128), jnp.float32)
    # lower FOR TPU regardless of the test backend (CPU can't lower
    # Mosaic) — the payload under test only exists on the tpu platform
    traced = jax.jit(m.make()).trace(x)
    return traced.lower(lowering_platforms=("tpu",)).as_text()


def test_kernel_payload_invariant_under_line_shifts(tmp_path, monkeypatch):
    monkeypatch.setenv("BARK_TPU_STRIP_LOCS", "1")
    assert cache.strip_mosaic_locations()
    a = _lower_text(tmp_path, 0)
    b = _lower_text(tmp_path, 7)
    assert a == b, "Mosaic payload still embeds source locations"
