"""AOT program cache: make fresh-process warm starts skip tracing/lowering.

Why: a fully-warm bark-small start measured **163 s**, of which the
persistent compilation cache accounted for 4.3 s (15 programs, ALL hits,
zero backend compiles) — the other ~97% is Python tracing plus
StableHLO/Mosaic lowering of the same stage programs every process
re-derives from scratch (perf/r5/seq11.log, tools/warmstart_profile.py).
The reference process restarts in ~324 ms (a weights mmap, BASELINE.md);
for a serving framework restart cost is a first-class metric, so the
*trace* has to be cacheable like the *executable* already is.

How: `aot_jit(name, fn, fingerprint=...)` wraps a to-be-jitted stage
function. On the first call with a given abstract signature it consults
`~/.cache/bark_tpu/aot/<name>-<key>.jaxexp`:

- hit: `jax.export.deserialize(blob)` rebuilds the LOWERED module —
  Mosaic kernel payloads included — without running any Python tracing;
  the call then compiles through the persistent compilation cache (a
  few seconds of reads on a warm machine).
- miss: trace + lower once via `jax.export.export`, write the blob,
  call.

The key covers everything that can change the traced program: a content
hash of every `bark_tpu/**/*.py` file, jax version, backend platform +
device kind, every `BARK_TPU_*` env knob, the jax matmul-precision
config, the caller's `fingerprint` (closure config the arrays don't
capture: cfg, temps, window sizes...), and the abstract signature
(treedef + shapes/dtypes) of the call arguments. Any mismatch is a
clean miss, never a wrong program.

Scope: enabled by default only on TPU (`BARK_TPU_AOT=1/0` forces) — CPU
interpret-mode tests re-trace in milliseconds and don't need blobs. Any
export/deserialize failure falls back to plain `jax.jit` with a one-line
note (`BARK_TPU_AOT_DEBUG=1` for details): the cache is an accelerator,
never a correctness dependency.
"""

from __future__ import annotations

import functools
import hashlib
import os
import sys

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/bark_tpu/aot")

_CODE_HASH = None


def _debug(*a):
    if os.environ.get("BARK_TPU_AOT_DEBUG"):
        print("[aot]", *a, file=sys.stderr, flush=True)


def _code_hash() -> str:
    """Content hash of the bark_tpu package sources (any edit = new key;
    unlike the Mosaic location-stripping story there is no line-number
    hazard here — the trace genuinely depends on the code)."""
    global _CODE_HASH
    if _CODE_HASH is None:
        import bark_tpu

        root = os.path.dirname(os.path.abspath(bark_tpu.__file__))
        h = hashlib.sha1()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _CODE_HASH = h.hexdigest()[:16]
    return _CODE_HASH


def aot_enabled() -> bool:
    env = os.environ.get("BARK_TPU_AOT", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def _env_knobs() -> str:
    return ";".join(
        f"{k}={v}" for k, v in sorted(os.environ.items())
        if k.startswith("BARK_TPU") and k not in ("BARK_TPU_AOT_DEBUG",)
    )


def _sig(args) -> str:
    treedef = jax.tree.structure(args)
    avals = jax.tree.leaves(
        jax.tree.map(lambda a: f"{getattr(a, 'shape', ())}"
                               f"{getattr(a, 'dtype', type(a).__name__)}",
                     args)
    )
    return f"{treedef}|{','.join(map(str, avals))}"


class _AotFn:
    """jit-like callable backed by the on-disk exported-program cache.

    One exported artifact per abstract call signature (stage programs are
    called with fixed shapes, so in practice one each)."""

    def __init__(self, name, fn, fingerprint, donate_argnums):
        self._name = name
        self._fingerprint = fingerprint
        self._donate = tuple(donate_argnums)
        self._jit = jax.jit(fn, donate_argnums=self._donate or None)
        self._calls = {}  # sig -> callable

    def _key(self, sig: str) -> str:
        dev = jax.devices()[0]
        parts = "\0".join((
            self._name, self._fingerprint, sig, _code_hash(),
            jax.__version__, dev.platform, dev.device_kind,
            str(jax.config.jax_default_matmul_precision),
            _env_knobs(), str(self._donate),
        ))
        return hashlib.sha1(parts.encode()).hexdigest()[:20]

    def lower(self, *args):
        """jit-compatible lowering hook (BarkContext.warmup passes
        ShapeDtypeStructs): builds/loads the exported artifact for this
        signature, then lowers its call so .compile() warms the
        compilation caches without running anything."""
        if not aot_enabled():
            return self._jit.lower(*args)
        sig = _sig(args)
        call = self._calls.get(sig)
        if call is None:
            call = self._build(sig, args)
            self._calls[sig] = call
        lower = getattr(call, "lower", None)
        if lower is None:  # export failed; call is the plain jit fallback
            lower = self._jit.lower
        return lower(*args)

    def __call__(self, *args):
        if not aot_enabled() or any(
            isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(args)
        ):
            # called under an outer trace (e.g. jax.vmap of a stage
            # program): inline the plain jit — the AOT artifact only
            # serves concrete top-level dispatches
            return self._jit(*args)
        sig = _sig(args)
        call = self._calls.get(sig)
        if call is None:
            call = self._build(sig, args)
            self._calls[sig] = call
        return call(*args)

    def _build(self, sig, args):
        from jax import export

        path = os.path.join(
            os.environ.get("BARK_TPU_AOT_DIR", DEFAULT_DIR),
            f"{self._name}-{self._key(sig)}.jaxexp",
        )
        exp = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exp = export.deserialize(f.read())
                _debug(f"hit {self._name}: {path}")
            except Exception as e:  # stale/corrupt blob: re-export
                _debug(f"deserialize failed for {self._name}: {e!r}")
                exp = None
        if exp is None:
            try:
                # the Mosaic/TPU custom calls are not on export's
                # cross-version stability allowlist; this cache is
                # same-machine + same-jax-version (both in the key), so
                # the compatibility guarantee the check protects is moot
                exp = export.export(
                    self._jit,
                    disabled_checks=[
                        export.DisabledSafetyCheck.custom_call(c)
                        for c in ("tpu_custom_call", "Sharding",
                                  "mosaic_tpu")
                    ],
                )(*args)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(exp.serialize())
                os.replace(tmp, path)
                _debug(f"exported {self._name}: {path}")
            except Exception as e:
                print(f"bark_tpu: AOT export of {self._name} unavailable "
                      f"({type(e).__name__}); falling back to jit",
                      file=sys.stderr)
                _debug(f"export failed: {e!r}")
                return self._jit
        # re-jit the exported call so repeat invocations skip the
        # call-convention rebuild and donation still applies
        return jax.jit(exp.call, donate_argnums=self._donate or None)


def describe(*vals) -> str:
    """Compact fingerprint for closure config: repr of everything the
    caller knows shapes its trace (dataclass reprs include every field)."""
    return repr(vals)


def describe_decode_fn(fn) -> str:
    """Stable identity of a decode-fn flavor (XLA vs fused kernel, packed
    quant, lm window, batch) — `select_decode_fn*` attaches these."""
    inner = fn
    while isinstance(inner, functools.partial):
        inner = inner.func
    return repr((
        getattr(fn, "is_fused", False),
        getattr(fn, "quant", None),
        getattr(fn, "lm_window", None),
        getattr(fn, "batch", None),
        getattr(inner, "__name__", type(inner).__name__),
    ))


def aot_jit(name: str, fn=None, *, fingerprint: str = "",
            donate_argnums=()):
    """Drop-in `jax.jit` replacement for the per-generate stage programs.

    `name` is a short stable label (filename prefix); `fingerprint` must
    capture every closure input that shapes the trace and is not visible
    in the call arguments (cfg, temperatures, window sizes, feature
    toggles) — anything covered by a BARK_TPU_* env knob or the package
    code hash is already in the key."""
    if fn is None:
        return functools.partial(
            aot_jit, name, fingerprint=fingerprint,
            donate_argnums=donate_argnums,
        )
    return _AotFn(name, fn, fingerprint, donate_argnums)
