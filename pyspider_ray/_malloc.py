"""Allocator tuning for batch-numeric workloads.

glibc malloc serves large (>=128 KiB) allocations with mmap and
returns them to the OS on free.  Vectorized batch processing allocates
and frees hundreds of MB of numpy/Arrow temporaries per batch, so
every batch repays first-touch page faults on freshly mapped pages —
on virtualized hosts (microVM/overcommitted memory) those faults are
the dominant cost: the same expand kernel measured 59.7 s on fresh
pages vs 0.9 s on reused ones.  Raising M_MMAP_THRESHOLD and
M_TRIM_THRESHOLD keeps big blocks on malloc's free list so pages are
touched once per worker, not once per batch.

Called at package import, which makes it take effect in every Ray
worker the moment it unpickles one of our stage functions.  Opt out
with PYSPIDER_RAY_NO_MALLOC_TUNE=1.
"""

from __future__ import annotations

import os

_done = False


def tune_malloc() -> bool:
    """Idempotent; returns True if tuning was applied."""
    global _done
    if _done or os.environ.get("PYSPIDER_RAY_NO_MALLOC_TUNE"):
        return _done
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        one_gib = 1 << 30
        libc.mallopt(M_MMAP_THRESHOLD, one_gib)
        libc.mallopt(M_TRIM_THRESHOLD, one_gib)
        _done = True
    except Exception:
        pass   # non-glibc platform: nothing to tune
    return _done


_prefaulted_mb = 0


def prefault_arena(mb: int | None = None) -> int:
    """Touch ``mb`` MB of fresh pages ONCE per process so the tuned
    malloc free list is pre-populated before the first timed kernel —
    the raw-task analogue of ``_WorkerActor(prefault_mb=)``: Ray reuses
    worker processes across tasks, so the first exchange task in each
    worker pays the fault cost here (outside any caller-visible hot
    loop longer than one task) and every later allocation reuses the
    arena.  Idempotent per process; size via PYSPIDER_RAY_PREFAULT_MB
    (default 256, 0 disables).  Returns the high-water prefault MB."""
    global _prefaulted_mb
    if mb is None:
        mb = int(os.environ.get("PYSPIDER_RAY_PREFAULT_MB", "256"))
    if mb <= 0 or _prefaulted_mb >= mb:
        return _prefaulted_mb
    tune_malloc()
    import numpy as np
    scratch = np.ones((mb - _prefaulted_mb) << 17)   # 1 MB = 2^17 f64
    scratch[::512] = 2.0   # touch every page (ones() already faults,
    del scratch            # this guards lazy-alloc implementations)
    _prefaulted_mb = mb
    return _prefaulted_mb
