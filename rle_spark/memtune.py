"""Allocator tuning for this host's pathological page-fault behavior.

The sandbox VM faults fresh anonymous pages at a wildly bimodal rate
(measured 10 MB/s .. 3 GB/s for first-touch). glibc's default
MMAP_THRESHOLD makes every large NumPy buffer a fresh mmap that is
returned to the OS on free — so every codec call re-pays the fault
cost. Raising the thresholds keeps big allocations inside the heap
arena where pages are reused; together with a one-time per-worker
heap warmup (engine.warm_python_workers) steady-state kernel
throughput is ~3 GB/s/core instead of ~10 MB/s worst case.

Must run BEFORE the JVM gateway starts: python workers inherit the
driver JVM's environment.
"""

from __future__ import annotations

import os

_VARS = {
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
    "MALLOC_TOP_PAD_": str(1 << 25),
    # Route Arrow allocations through glibc malloc so they share the
    # tuned heap arena above: Arrow's bundled jemalloc returns big
    # scan-batch buffers to the OS on free, re-paying this host's
    # pathological first-touch fault cost on every batch — measured
    # ~7% off the 4-worker encode leg (8.06 -> 7.48 s at 6.7 GB).
    "ARROW_DEFAULT_MEMORY_POOL": "system",
}


def apply() -> None:
    for k, v in _VARS.items():
        os.environ.setdefault(k, v)


def warm_heap(mb: int = 128) -> int:
    """Touch `mb` MiB once so later allocations reuse warm pages."""
    import numpy as np
    buf = np.ones(mb << 20, dtype=np.uint8)
    total = int(buf[:: 1 << 12].sum())  # force fault on every page
    del buf
    return total
