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


_locs_stripped = False


def strip_mosaic_locations() -> bool:
    """Make Pallas kernel payloads content-addressed.

    Mosaic serializes the kernel's MLIR module WITH source locations into
    the tpu_custom_call backend_config, so ANY source edit — even a
    comment that shifts line numbers — changes every kernel's serialized
    payload and invalidates its persistent-cache entry (measured r4: each
    code version cold-starts from scratch; bark-small ~720 s, bark-large
    ~2200 s unrolled). Running MLIR's strip-debuginfo pass on the Mosaic
    module right before serialization removes the locations: the payload
    depends only on program CONTENT, and kernel caches survive refactors.

    Trade-off: Mosaic compile errors lose kernel source locations.
    BARK_TPU_STRIP_LOCS=0 restores stock behavior (use while debugging a
    kernel that fails to compile). Returns True if the patch is active."""
    global _locs_stripped
    if os.environ.get("BARK_TPU_STRIP_LOCS", "1") != "1":
        return False
    if _locs_stripped:
        return True
    try:
        from jax._src import tpu_custom_call as tcc

        orig = tcc._lower_mosaic_module_to_asm

        def lower_stripped(module, **kw):
            try:
                with module.context:
                    tcc.PassManager.parse(
                        "builtin.module(strip-debuginfo)"
                    ).run(module.operation)
            except Exception:
                pass  # serialization proceeds with locations intact
            return orig(module, **kw)

        tcc._lower_mosaic_module_to_asm = lower_stripped
    except Exception:
        return False
    _locs_stripped = True
    return True


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get("BARK_TPU_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    strip_mosaic_locations()
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
