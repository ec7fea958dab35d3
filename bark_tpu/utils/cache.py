"""Persistent XLA compilation cache.

The whole-stage programs (semantic while_loop, coarse window loop, fine block
loop, codec) take minutes to compile on a remote TPU; their HLO is identical
across processes for a given model size + params, so a disk cache makes every
run after the first start in seconds. Enabled by the CLIs and bench.py —
library users opt in explicitly (a global jax config is not something a
library should set on import).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "bark_tpu", "xla"
)


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get("BARK_TPU_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # write EVERY executable, including sub-second glue programs (convert,
    # broadcast, ...): a pipeline start dispatches dozens of them, and on a
    # remote-TPU backend each un-cached compile is a helper round trip —
    # measured r3, this threshold (not cache-key instability) was why warm
    # starts still recompiled for minutes (ROADMAP r2 open question)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if os.environ.get("BARK_TPU_CACHE_DEBUG"):
        import logging
        import sys

        jax.config.update("jax_explain_cache_misses", True)
        for name in ("jax._src.compilation_cache", "jax._src.compiler"):
            lg = logging.getLogger(name)
            lg.setLevel(logging.DEBUG)
            lg.addHandler(logging.StreamHandler(sys.stderr))
    return path
