"""ctypes bridge to the native batched image decoder (native/fastdecode.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes :func:`decode_batch`.  Callers fall back to cv2 when the native
path is unavailable; `is_available()` reports which path is active.

The cache name carries an ISA tag (machine + CPU-flags hash): the build
uses ``-march=native``, and on shared storage a library built by one host
must not be executed by a host with a different instruction set (SIGILL).
Builds land in a per-process temp file and are renamed atomically so
concurrent or interrupted builds can never hand a half-linked ELF to a
loader.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "fastdecode.cpp")


def _isa_tag() -> str:
    """machine + short hash of the CPU feature flags (SIGILL guard)."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    h = hashlib.sha1(flags.encode()).hexdigest()[:8]
    return f"{platform.machine()}-{h}"


_SO = os.path.join(_NATIVE_DIR, f"libfastdecode.{_isa_tag()}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    tmp = f"{_SO}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp,
           _SRC, "-lpng", "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)        # atomic: loaders never see a partial .so
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                       os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.decode_batch.restype = ctypes.c_int
            lib.decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int]
            if lib.fastdecode_abi_version() != 1:
                return None
            _lib = lib
        except OSError:
            return None
        return _lib


def is_available() -> bool:
    return _load() is not None


def decode_batch(paths, H: int, W: int, C: int = 3,
                 n_threads: int = 8,
                 out: np.ndarray | None = None) -> np.ndarray:
    """Decode a list of PNG/JPEG paths into a (B, H, W, C) uint8 array.

    C=3 gives RGB, C=1 grayscale.  Raises on decode failure or shape
    mismatch.  Pass ``out`` to reuse a preallocated buffer.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, H, W, C) if C > 1 else (n, H, W), np.uint8)
    # explicit checks (asserts vanish under python -O, and the C side
    # writes n*H*W*C bytes unconditionally)
    if out.dtype != np.uint8 or not out.flags["C_CONTIGUOUS"]:
        raise ValueError("out must be a C-contiguous uint8 array")
    if out.size != n * H * W * C:
        raise ValueError(
            f"out has {out.size} elements; need {n * H * W * C}")
    if not out.flags.writeable:
        raise ValueError("out must be writable (got a read-only view; "
                         "copy the memmap slice first)")
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.decode_batch(arr, n,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          H, W, C, n_threads)
    if rc < 0:
        raise RuntimeError("native decoder could not start worker threads")
    if rc != 0:
        raise IOError(f"native decode failed for {paths[rc - 1]!r}")
    return out
