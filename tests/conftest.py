"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends; conftest is
imported before any test module, and nothing here imports jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Determinism and smaller test memory footprint.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
