"""Re-derive the worker allocator tuning for THIS box/cluster.

``imops_spark/functions/_mem.py`` raises glibc's M_MMAP_THRESHOLD so
large per-batch numpy temporaries recycle brk-heap pages instead of
re-faulting fresh mmap pages every batch.  The right threshold is a
box property (first-touch fault cost) times a workload property
(per-batch temporary sizes) traded against held worker RSS — so before
copying the default to a real cluster, run this on one executor node:

    python tools/mem_probe.py            # full probe (~1 min)
    python tools/mem_probe.py 0 64 256   # custom candidate MiB list
                                         # (0 = glibc default, untuned)

It prints (a) the box's first-touch page-fault cost, measured exactly
the way the round-10 investigation did (touch a fresh buffer vs refill
a warm one), and (b) for each candidate threshold, the wall time per
pass of a representative large-temporary kernel loop (several ~40 MB
arrays allocated, combined, and dropped per pass — the char-gram
MinHash shape) plus the process's peak and end RSS, each measured in a
fresh subprocess with ``IMOPS_SPARK_MALLOC_MMAP_MB`` set.  Pick the
smallest threshold whose per-pass time is flat (no re-fault tax) and
size ``spark.executor.pyspark.memory`` by the reported peak RSS times
concurrent workers per executor.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = "__mem_probe_child__"


def _rss_kb(field: str) -> int:
    with open("/proc/self/status") as fh:
        for ln in fh:
            if ln.startswith(field + ":"):
                return int(ln.split()[1])
    return -1


def fault_cost() -> dict:
    """First-touch fault cost: time to write every page of a FRESH
    256 MB numpy buffer vs refilling the SAME buffer warm."""
    import numpy as np

    n = 256 * (1 << 20) // 8
    t0 = time.perf_counter()
    a = np.empty(n)
    a[:] = 1.0
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    a[:] = 2.0
    warm = time.perf_counter() - t0
    pages = n * 8 / 4096
    return {
        "cold_s": round(cold, 4),
        "warm_s": round(warm, 4),
        "us_per_page": round((cold - warm) / pages * 1e6, 2),
    }


def _child(passes: int) -> None:
    """One candidate's measurement, inside the subprocess: tune, then
    run the large-temporary loop and report per-pass walls + RSS."""
    from imops_spark.functions._mem import ensure_malloc_tuning

    ensure_malloc_tuning()
    import numpy as np

    rng = np.random.default_rng(7)
    seed = rng.integers(0, 255, size=5_000_000, dtype=np.uint8)
    walls = []
    for _ in range(passes):
        t0 = time.perf_counter()
        # the char-gram shape: several tens-of-MB temporaries built,
        # combined, reduced, and dropped within one batch
        m = np.tile(seed, 8).reshape(8, -1).astype(np.uint64)  # ~320 MB total
        m *= np.uint64(0x9E3779B185EBCA87)
        m ^= m >> np.uint64(29)
        s = m.sum(axis=0)
        out = np.minimum.reduceat(s, np.arange(0, s.size, 1000))
        walls.append(time.perf_counter() - t0)
        del m, s, out
    print(
        json.dumps(
            {
                "walls": [round(w, 4) for w in walls],
                "peak_rss_mb": _rss_kb("VmHWM") // 1024,
                "end_rss_mb": _rss_kb("VmRSS") // 1024,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == _CHILD:
        _child(int(sys.argv[2]))
        return
    cands = [int(a) for a in sys.argv[1:]] or [0, 32, 64, 128, 256, 512]
    passes = 8
    print("first-touch fault cost:", json.dumps(fault_cost()))
    print(
        f"{'MiB':>5} {'min_s':>7} {'med_s':>7} {'max_s':>7} "
        f"{'peak_rss':>9} {'end_rss':>8}"
    )
    for mb in cands:
        env = dict(os.environ)
        if mb == 0:
            env["IMOPS_SPARK_NO_MALLOC_TUNING"] = "1"
        else:
            env.pop("IMOPS_SPARK_NO_MALLOC_TUNING", None)
            env["IMOPS_SPARK_MALLOC_MMAP_MB"] = str(mb)
        r = subprocess.run(
            [sys.executable, __file__, _CHILD, str(passes)],
            capture_output=True,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode != 0:
            print(f"{mb:>5} FAILED: {r.stderr.strip()[-200:]}")
            continue
        d = json.loads(r.stdout.strip().splitlines()[-1])
        ws = sorted(d["walls"][1:])  # drop the cold pass
        print(
            f"{mb:>5} {ws[0]:>7.3f} {ws[len(ws) // 2]:>7.3f} {ws[-1]:>7.3f} "
            f"{d['peak_rss_mb']:>8}M {d['end_rss_mb']:>7}M"
        )


if __name__ == "__main__":
    main()
