"""Host-memory hygiene for offload-scale proves.

The 2^20-row north star was OOM-killed by the HOST kernel at 130 GB
anon-RSS (round 5, dmesg) while its designed retained set is ~30 GB: the
offload path churns through hundreds of GB-sized short-lived buffers
(device->host LDE blocks, chunked opening matvec uploads, non-contiguous
numpy column slices forced contiguous), and glibc keeps freed arenas
resident instead of returning them. `trim()` is called at block/phase
boundaries in the streaming paths; it is a no-op outside glibc."""

from __future__ import annotations

import ctypes
import os

_libc = None
_failed = False


def trim() -> None:
    """Return freed glibc arenas to the OS (malloc_trim(0)); cheap (~ms)."""
    global _libc, _failed
    if _failed:
        return
    if _libc is None:
        try:
            _libc = ctypes.CDLL("libc.so.6", use_errno=True)
            _libc.malloc_trim.argtypes = [ctypes.c_size_t]
        except Exception:
            _failed = True
            return
    try:
        _libc.malloc_trim(0)
    except Exception:
        _failed = True


def rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            kb = int(f.read().split("VmRSS:")[1].split()[0])
        return kb / 1e6
    except Exception:  # pragma: no cover
        return 0.0
