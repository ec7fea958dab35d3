"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The axon TPU plugin (sitecustomize) force-registers itself and pins
JAX_PLATFORMS=axon at interpreter start, so env vars alone are not enough —
the in-process `jax.config.update("jax_platforms", "cpu")` is what actually
wins. XLA_FLAGS must still be set before the CPU backend initializes.
"""

import os
import sys

# BARK_TEST_PLATFORM=tpu runs the suite on the real chip instead (used by
# the -m realweights harness on a TPU host); default is the virtual CPU mesh.
_platform = os.environ.get("BARK_TEST_PLATFORM", "cpu")

_flags = os.environ.get("XLA_FLAGS", "")
if _platform == "cpu" and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism and smaller test memory footprint.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax

if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "realweights: needs BARK_WEIGHTS_DIR with a real converted "
        "checkpoint (tests/test_realweights.py)",
    )
