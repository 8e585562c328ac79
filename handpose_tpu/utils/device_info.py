"""Accelerator introspection (reference utils/get_gpu_info.py analogue).

The reference polls nvidia GPUs via GPUtil; here the equivalent is JAX
device enumeration + per-device memory stats, plus a profiler-trace helper
(the observability the reference had only as commented-out code,
trainval.py:646-647, 254-266).
"""

from __future__ import annotations

import contextlib
from typing import List

import jax


def get_device_info() -> List[dict]:
    out = []
    for d in jax.devices():
        info = {"id": d.id, "platform": d.platform,
                "kind": getattr(d, "device_kind", "?"),
                "process": d.process_index}
        try:
            stats = d.memory_stats()
            if stats:
                info["bytes_in_use"] = stats.get("bytes_in_use")
                info["bytes_limit"] = stats.get("bytes_limit")
        except Exception:
            pass
        out.append(info)
    return out


def get_device_utilization_as_string() -> str:
    rows = []
    for info in get_device_info():
        mem = ""
        if info.get("bytes_limit"):
            used = info.get("bytes_in_use") or 0
            mem = (f" mem {used / 2**30:.2f}/"
                   f"{info['bytes_limit'] / 2**30:.2f} GiB")
        rows.append(f"dev{info['id']} {info['platform']}:"
                    f"{info['kind']}{mem}")
    return " | ".join(rows)


def enable_compilation_cache(cache_dir: str) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; safe to call before or after backend init.  Compiled
    programs (keyed by HLO + compile options + backend) are written to
    disk, so a warm restart of the same train/serving program skips the
    20-40 s first-compile cost (preemption resume, serving cold start).
    ``min_compile_time_secs=0`` caches everything -- the miniature test
    programs compile in milliseconds and would otherwise never persist.
    """
    if not cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context -- view with TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
