"""Custom PySpark worker daemon that PRELOADS the scientific stack.

Spark's ``PythonWorkerFactory`` culls idle Python workers after a
HARDCODED one minute (``IDLE_WORKER_TIMEOUT_NS`` — not configurable as
of Spark 4.1), so any query arriving after a >60 s Python-stage lull
finds an empty worker pool and pays, per respawned worker, a fresh
interpreter plus the numpy/pandas/pyarrow import chain plus first-touch
page faults for all of it.  On memory-overcommitted hosts (virtio-balloon
free page reporting; see ``functions/_mem.py``) the page-fault half is
the expensive part — ~1 ms per 4 KiB page was measured on the round-11
box — and showed up as a 2-4 s per-query penalty whenever the bench (or
any real workload) left the Python workers idle for a minute (PID probe:
the whole pool replaced between 60 and 80 s of idle).

Fix: import the heavy modules ONCE, here, in the daemon process, before
``pyspark.daemon.manager()`` starts forking workers.  Every worker forked
afterwards — including every respawn after an idle cull — shares those
modules' pages copy-on-write: already imported, already provisioned,
already warm.  Respawn cost drops to roughly a ``fork()``.

Wired up by ``session.get_spark`` via ``spark.python.daemon.module``
(plus the package root on ``spark.executorEnv.PYTHONPATH`` so a fresh
interpreter can import us); disable with
``IMOPS_SPARK_DAEMON_PRELOAD=0`` (the stock daemon behavior, minus
nothing else — this module is pass-through).  On a real cluster the same
two confs go in the executor Spark conf; preloading in the daemon is
strictly better there too (one import per executor instead of one per
worker respawn).
"""

from __future__ import annotations

import os

if os.environ.get("IMOPS_SPARK_DAEMON_PRELOAD", "1") != "0":
    try:
        import numpy

        # glibc tuning BEFORE any large allocations: mallopt state is
        # process-wide and survives fork, so every worker inherits it
        # without paying the (tiny) syscall dance itself.
        from imops_spark.functions._mem import ensure_malloc_tuning

        ensure_malloc_tuning()

        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyarrow.pandas_compat  # noqa: F401

        # The kernel modules workers actually unpickle UDFs from — having
        # them in the daemon makes the fork inherit the whole import
        # graph (pyspark.sql included) instead of re-reading it from disk
        # per respawned worker.
        import imops_spark.functions.curate  # noqa: F401
        import imops_spark.functions.dedup  # noqa: F401
        import imops_spark.functions.multimodal  # noqa: F401
        import imops_spark.functions.similarity  # noqa: F401
        import imops_spark.functions.text  # noqa: F401
        import imops_spark.functions.xxh  # noqa: F401

        # one tiny GEMM so BLAS dispatch tables/thread state initialize
        # pre-fork (numpy is fork-safe on Linux; this is the standard
        # "warm the library, not the data" trick)
        numpy.dot(numpy.ones((4, 4)), numpy.ones((4, 4)))
    except Exception:  # pragma: no cover - preload is an optimization only
        pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
