"""Per-worker allocator tuning for the Arrow kernels.

Round-10 finding (FASTPATH.md): on this box first-touch page faults
cost ~90 us per 4 KiB page (kernel zeroing / THP path — reproduced
with plain numpy, no Spark), so any kernel whose per-batch numpy
temporaries exceed glibc's mmap threshold pays seconds of re-faulting
PER BATCH: malloc serves >32 MiB blocks by mmap, free returns them by
munmap, and the next batch faults every page of the replacement in
again.  The cosine block-GEMM showed it as bench bimodality (fixed
with explicit scratch buffers); the multibyte char-gram MinHash kernel
showed it as a SUPER-LINEAR scale curve (160k CJK docs 2.4 s ->
640k 24.0 s, slope 1.66, where the ASCII path's slope is 0.50).

``ensure_malloc_tuning()`` raises M_MMAP_THRESHOLD (and the trim
threshold) so large numpy temporaries live on the reusable brk heap:
the first batch faults once, every later batch recycles the same
pages.  Cost: worker RSS holds at its per-batch peak instead of
dipping between batches — the same bound the explicit-scratch fix has,
applied allocator-wide.  Called once per process from each heavy
kernel; a no-op off glibc or when IMOPS_SPARK_NO_MALLOC_TUNING is set.
"""

from __future__ import annotations

import os

__all__ = ["ensure_malloc_tuning"]

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def ensure_malloc_tuning() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("IMOPS_SPARK_NO_MALLOC_TUNING"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 29)
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 29)
    except Exception:
        pass  # non-glibc platform: the kernels are correct, just slower
