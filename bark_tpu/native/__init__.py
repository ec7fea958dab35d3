"""ctypes bindings for the native C++ runtime library (native/).

The library covers the host-side hot paths the reference implements in C++
(SURVEY §2.3/§2.4/§2.7): quantized block codecs, the WordPiece tokenizer and
the model-file scanner. Everything here is optional — each entry point has a
bit-exact pure-Python fallback, and `lib()` returns None when no compiler is
available. The shared object is built on demand with `make` the first time
it is needed and cached under native/build/.

Set BARK_TPU_NO_NATIVE=1 to force the Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libbark_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-s"],
            cwd=_NATIVE_DIR,
            capture_output=True,
            text=True,
            timeout=300,
        )
        if r.returncode != 0:
            print(
                f"bark_tpu.native: build failed:\n{r.stderr}", file=sys.stderr
            )
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"bark_tpu.native: build unavailable: {e}", file=sys.stderr)
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c_i32, c_i64 = ctypes.c_int32, ctypes.c_int64
    c_p = ctypes.c_void_p
    lib.bark_quantize.argtypes = [c_i32, c_p, c_p, c_i64]
    lib.bark_quantize.restype = c_i32
    lib.bark_dequantize.argtypes = [c_i32, c_p, c_p, c_i64]
    lib.bark_dequantize.restype = c_i32
    lib.bark_f16_to_f32.argtypes = [c_p, c_p, c_i64]
    lib.bark_f16_to_f32.restype = None
    lib.bark_f32_to_f16.argtypes = [c_p, c_p, c_i64]
    lib.bark_f32_to_f16.restype = None
    lib.bark_f16_to_f32_soft.argtypes = [c_p, c_p, c_i64]
    lib.bark_f16_to_f32_soft.restype = None
    lib.bark_f32_to_f16_soft.argtypes = [c_p, c_p, c_i64]
    lib.bark_f32_to_f16_soft.restype = None
    lib.bark_tokenizer_new.argtypes = [c_p, c_i64, c_i32]
    lib.bark_tokenizer_new.restype = c_p
    lib.bark_tokenizer_free.argtypes = [c_p]
    lib.bark_tokenizer_free.restype = None
    lib.bark_tokenize.argtypes = [c_p, ctypes.c_char_p, c_p, c_i32]
    lib.bark_tokenize.restype = c_i32
    lib.bark_scan_model.argtypes = [ctypes.c_char_p, c_p, c_i64]
    lib.bark_scan_model.restype = c_i64
    return lib


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable (no compiler / build failure / opt-out env var)."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("BARK_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            _lib = _bind(ctypes.CDLL(_LIB_PATH))
        except OSError as e:
            print(f"bark_tpu.native: load failed: {e}", file=sys.stderr)
            _lib = None
        return _lib


def available() -> bool:
    return lib() is not None


# ------------------------------------------------------------------ wrappers


def dequantize(qtype_id: int, raw: np.ndarray, n_elements: int) -> Optional[np.ndarray]:
    """Native block dequantization -> float32[n_elements]; None if no lib."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(raw.view(np.uint8).reshape(-1))
    dst = np.empty(n_elements, np.float32)
    rc = L.bark_dequantize(
        qtype_id,
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        n_elements,
    )
    return dst if rc == 0 else None


def quantize(qtype_id: int, x: np.ndarray, out_bytes: int) -> Optional[np.ndarray]:
    """Native block quantization -> uint8[out_bytes]; None if no lib."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(x, np.float32).reshape(-1)
    dst = np.empty(out_bytes, np.uint8)
    rc = L.bark_quantize(
        qtype_id,
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        src.size,
    )
    return dst if rc == 0 else None


def f16_to_f32(raw: np.ndarray) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(raw.view(np.uint16).reshape(-1))
    dst = np.empty(src.size, np.float32)
    L.bark_f16_to_f32(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        src.size,
    )
    return dst


def f16_to_f32_soft(raw: np.ndarray) -> Optional[np.ndarray]:
    """The portable no-_Float16 path, exported for bit-exactness tests."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(raw.view(np.uint16).reshape(-1))
    dst = np.empty(src.size, np.float32)
    L.bark_f16_to_f32_soft(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        src.size,
    )
    return dst


def f32_to_f16_soft(x: np.ndarray) -> Optional[np.ndarray]:
    """The portable no-_Float16 path, exported for bit-exactness tests."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(x, np.float32).reshape(-1)
    dst = np.empty(src.size, np.uint16)
    L.bark_f32_to_f16_soft(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        src.size,
    )
    return dst


class NativeTokenizer:
    """Handle-owning wrapper over the C++ WordPiece tokenizer."""

    def __init__(self, tokens: List[str]):
        L = lib()
        if L is None:
            raise RuntimeError("native library unavailable")
        parts = []
        for t in tokens:
            b = t.encode("utf-8")
            parts.append(len(b).to_bytes(4, "little", signed=True))
            parts.append(b)
        blob = b"".join(parts)
        self._blob = np.frombuffer(blob, np.uint8).copy()
        self._lib = L
        self._h = L.bark_tokenizer_new(
            self._blob.ctypes.data_as(ctypes.c_void_p),
            self._blob.size,
            len(tokens),
        )
        if not self._h:
            raise RuntimeError("native tokenizer init failed")

    def tokenize(self, text: str, n_max: int = 256) -> List[int]:
        out = np.empty(max(n_max, 1), np.int32)
        n = self._lib.bark_tokenize(
            self._h,
            text.encode("utf-8"),
            out.ctypes.data_as(ctypes.c_void_p),
            n_max,
        )
        return out[:n].tolist()

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.bark_tokenizer_free(h)
            self._h = None


def scan_model(path: str) -> Optional[str]:
    """Native single-pass file scan -> text index (see native/src/scan.cpp);
    None if unavailable or the file is malformed."""
    L = lib()
    if L is None:
        return None
    cap = 1 << 22  # 4 MiB of index text covers ~30k tensors
    buf = ctypes.create_string_buffer(cap)
    n = L.bark_scan_model(path.encode(), buf, cap)
    if n < 0:
        return None
    return buf.raw[:n].decode("utf-8")
