"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with a count()-style action (no driver-side collect of
large results).  A warmup pass on the smallest table amortizes JVM/codegen
startup so the numbers measure the plans, not session boot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "center_of_mass",
    "isin",
    "pointwise",
    "radon_raysum",
    "top1_nn",
    "interp1d",
    "dilation",
    "erosion",
    "sliding_window",
    "zoom_1d",
    "edt_1d",
    "graph_cc",
    "evt_window",
    "evt_sessions",
    "dd_exact",
    "dd_minhash",
    "dd_lsh_pairs",
    "dd_simhash",
    "txt_quality",
    "txt_fingerprint",
    "sim_topk",
    "emb_near_dup",
]


def main() -> None:
    import __spark_entry__ as entry
    from imops_spark.session import get_spark

    spark = get_spark(app_name="imops_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: touch the session + parquet reader once, and pay file listing +
    # footer schema inference for every table outside the timed region (the
    # cluster-analog is a catalog with schemas already registered).
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    # (events is excluded: its NANOS timestamps need the nanosAsLong conf
    # that load_events manages itself.)
    for tbl in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        entry._t(spark, SF_DIR, tbl)

    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # Force full evaluation of every row/column without materializing on
        # the driver: aggregate a cheap expression over all columns.
        df.foreach(lambda _: None) if False else df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
