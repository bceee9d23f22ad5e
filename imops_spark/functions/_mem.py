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
pages.

DEPLOYMENT IMPLICATIONS (process-wide and permanent per Python
worker — this also changes allocator behavior for user UDF code
sharing the worker):

- Worker RSS holds at its per-batch PEAK instead of dipping between
  batches (the same bound the explicit-scratch GEMM fix has, applied
  allocator-wide).  Size ``spark.executor.pyspark.memory`` with that
  headroom: peak-batch working set x concurrent Python workers per
  executor, NOT the between-batch trough.
- The brk heap only shrinks from the top, so workloads that mix large
  allocation SIZES can fragment and hold RSS somewhat above the
  stated peak.  The threshold is therefore sized to just cover the
  library's own scratch (~150 MB per-batch peaks): 256 MiB by
  default, NOT "as high as possible".  Truly huge one-off
  allocations (> threshold) still go to mmap and are returned to the
  OS as before.
- The default is calibrated on THIS box (~90 us/page fault).  On a
  real cluster re-derive it with ``tools/mem_probe.py`` (measures the
  box's fault cost and the RSS/throughput tradeoff per candidate
  threshold) before copying the setting blindly.

Escape hatches: ``IMOPS_SPARK_NO_MALLOC_TUNING=1`` disables entirely;
``IMOPS_SPARK_MALLOC_MMAP_MB=<n>`` overrides the threshold (both read
once per worker process).  No-op off glibc.
"""

from __future__ import annotations

import os

__all__ = ["ensure_malloc_tuning", "touch_pages"]

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_DEFAULT_MB = 256  # covers the library's ~150 MB per-batch scratch peaks


def ensure_malloc_tuning() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("IMOPS_SPARK_NO_MALLOC_TUNING"):
        return
    try:
        mb = int(os.environ.get("IMOPS_SPARK_MALLOC_MMAP_MB", _DEFAULT_MB))
    except ValueError:
        mb = _DEFAULT_MB
    if mb <= 0:
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_THRESHOLD, mb << 20)
        libc.mallopt(_M_TRIM_THRESHOLD, mb << 20)
    except Exception:
        pass  # non-glibc platform: the kernels are correct, just slower


def touch_pages(arr, threads: int = 8) -> None:
    """Fault a fresh numpy buffer's pages IN PARALLEL before first use.

    Round-11 finding: on memory-overcommitted hosts (free page
    reporting) a page's FIRST touch costs host-provisioning latency —
    measured ~1.05 ms/page single-threaded (~3.5 MB/s) but ~53 MB/s
    with many faulting threads, because the provisioning parallelizes
    even though each fault serializes its own thread.  A worker's first
    GEMM into a fresh ~36 MB scratch buffer therefore stalled ~5-10 s
    (event log: stage run time >> task CPU time); zero-filling the
    buffer from ``threads`` Python threads first (numpy's copy loops
    release the GIL) pays the same pages at the parallel rate.  No-op
    cost on already-provisioned memory: one memset of the buffer."""
    try:
        import threading

        import numpy as np

        flat = arr.reshape(-1).view(np.uint8)
        n = flat.size
        if n < (8 << 20) or threads <= 1:  # small buffers: plain memset
            flat[:] = 0
            return
        step = -(-n // threads)
        ts = [
            threading.Thread(target=flat[i : i + step].fill, args=(0,))
            for i in range(0, n, step)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    except Exception:
        pass  # touching is an optimization only — never fail the kernel
