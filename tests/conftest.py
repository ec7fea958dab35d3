"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The axon TPU plugin (sitecustomize) force-registers itself and pins
JAX_PLATFORMS=axon at interpreter start, so env vars alone are not enough —
the in-process `jax.config.update("jax_platforms", "cpu")` is what actually
wins. XLA_FLAGS must still be set before the CPU backend initializes.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Determinism and smaller test memory footprint.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
