"""Streaming sketch maintenance: keep mergeable summaries (HLL distinct,
Count-Min frequency) current as data streams in, with EXACTLY-ONCE derived
results from at-least-once plumbing.

The mechanism is idempotence-by-partition: each micro-batch aggregates its
rows into per-batch sketch PARTIALS (one small row per group — the
``functions.sketch`` two-phase shape) and writes them to a parquet log
partitioned by ``batch_id`` with per-write DYNAMIC partition overwrite.  A
replayed batch (crash between sink write and checkpoint commit) re-derives
the identical partials from the identical source offsets and OVERWRITES its
own partition — the log converges to exactly one partial set per batch no
matter how many delivery attempts happen.  Contrast with the Bloom index
(``streaming.curate.start_bloom_index_maintenance``), which gets the same
guarantee from OR-idempotence instead of partition ownership; sketch
partials aren't idempotent under re-append (HLL unions tolerate duplicates
but Count-Min ADDS tables, so a replayed append would double-count — the
partition overwrite is what makes the frequency path safe).

Readers merge the whole log (hundreds of small rows, not the raw stream):
``read_distinct_sketch_log`` re-aggregates the HLL partials per group;
``freq_log_estimates`` folds the Count-Min blobs driver-side.  Merging a
year of per-batch partials is a scan of the log, never of the corpus —
the pre-aggregation pattern that makes sketches the 100 TB answer.

Single-writer contract: one maintenance stream owns a log path AT A TIME
(the same readers-only concurrency rule as
``sources.parquet.compact_partitions``); sequential streams with their own
checkpoints compose — each checkpoint namespaces its partitions under a
derived ``writer_id``, so a backfill drain and a live stream never collide
with each other's batch ids.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketch import (
    cms_estimate,
    cms_merge,
    distinct_sketch_by,
    freq_sketch_by,
    merge_distinct_sketches,
)

__all__ = [
    "start_distinct_sketch_maintenance",
    "read_distinct_sketch_log",
    "start_freq_sketch_maintenance",
    "freq_log_estimates",
    "compact_sketch_log",
]


def _effective_log(log: DataFrame) -> DataFrame:
    """Apply compaction visibility to a raw sketch-log read.

    :func:`compact_sketch_log` stores each writer's merged history as ONE
    partition with a NEGATIVE batch id ``-(covered_through + 1)``; raw
    batch partitions it covered become garbage the moment the new row
    lands, and are deleted afterwards.  Readers therefore keep, per
    writer: the MOST NEGATIVE row (the latest compaction — a crash
    between writing a new compacted row and deleting the stale one can
    leave both) plus raw rows STRICTLY ABOVE its coverage.  With no
    compacted row the filter passes everything (coverage is -1).  This
    rule is what makes compaction crash-consistent: at every
    intermediate state the visible set covers each batch exactly once."""
    from pyspark.sql import Window

    w = Window.partitionBy("writer_id")
    m = log.withColumn("__minb", F.min("batch_id").over(w))
    covered = F.when(F.col("__minb") < 0, -F.col("__minb") - 1).otherwise(
        F.lit(-1)
    )
    return m.filter(
        ((F.col("batch_id") >= 0) & (F.col("batch_id") > covered))
        | ((F.col("batch_id") < 0) & (F.col("batch_id") == F.col("__minb")))
    ).drop("__minb")


def compact_sketch_log(spark: SparkSession, path: str, keys: Sequence[str] = ()) -> int:
    """Fold a sketch log's COMMITTED history so reader cost stays
    ``O(groups)``, not ``O(batches)``: per writer, every partial below the
    writer's newest batch merges into one row per group, written as the
    single negative-batch partition ``batch_id = -(covered_through + 1)``
    (see :func:`_effective_log` for the visibility rule), and the covered
    partitions are deleted.  Returns the number of partitions removed.

    The newest batch per writer stays RAW on purpose: it is the only
    batch a checkpoint restart can replay, and replay safety is partition
    ownership — the replayed write must find its own partition to
    overwrite.  Everything below it is checkpoint-committed and will
    never be written again, so merging it is safe even while the stream
    is live (same single-writer contract as every maintenance sink here:
    one compactor at a time, readers tolerate in-flight writes).

    Crash behavior: the merged row is written BEFORE any deletion, and
    readers resolve duplication by the most-negative-wins rule, so a
    crash at any point leaves a readable log; re-running the compaction
    finishes the garbage collection.  Works for both log kinds (HLL
    ``distinct_sketch`` merges relationally via ``hll_union_agg``;
    Count-Min ``freq_sketch`` blobs fold driver-side — the log is bounded
    by construction, which is the point of this function)."""
    keys = list(keys)
    log = spark.read.parquet(path)
    kind = "freq" if "freq_sketch" in log.columns else "distinct"
    from pyspark.sql import Window

    # Per-writer coverage from the RAW log, not the effective view: a crash
    # between the compacted-row write and the deletion leaves covered raw
    # partitions that _effective_log HIDES — a rerun sees an empty merge
    # plan, but the garbage is still on disk and must be swept or it
    # persists until a new batch arrives (indefinitely on an idle writer).
    cov_now = {
        r["writer_id"]: (-int(r["minb"]) - 1) if int(r["minb"]) < 0 else -1
        for r in log.groupBy("writer_id")
        .agg(F.min("batch_id").alias("minb"))
        .collect()
    }
    eff = _effective_log(log)
    w = Window.partitionBy("writer_id")
    mergeable = eff.withColumn("__maxb", F.max("batch_id").over(w)).filter(
        F.col("batch_id") < F.col("__maxb")
    )
    # per-writer plan: new coverage + whether any RAW rows actually merge
    # (a writer whose only mergeable row is its old compacted row is
    # already compact — skip it)
    plan = {
        r["writer_id"]: int(r["cov"])
        for r in mergeable.groupBy("writer_id")
        .agg(
            F.max(
                F.when(F.col("batch_id") >= 0, F.col("batch_id")).otherwise(
                    -F.col("batch_id") - 1
                )
            ).alias("cov"),
            F.sum((F.col("batch_id") >= 0).cast("int")).alias("n_raw"),
        )
        .filter(F.col("n_raw") > 0)
        .collect()
    }
    if not plan:
        # nothing to merge — but a prior crashed run may have left covered
        # partitions behind; finish ITS garbage collection
        return _gc_covered(spark, path, cov_now)
    todo = mergeable.filter(F.col("writer_id").isin(list(plan)))
    data_cols = [c for c in log.columns if c not in ("writer_id", "batch_id")]
    if kind == "distinct":
        merged = todo.groupBy("writer_id", *keys).agg(
            F.expr("hll_union_agg(distinct_sketch, false)").alias(
                "distinct_sketch"
            ),
            F.sum("n_rows").alias("n_rows"),
        )
    else:
        rows = todo.select("writer_id", *keys, "freq_sketch", "n_rows").collect()
        by_group: dict = {}
        for r in rows:
            gk = (r["writer_id"],) + tuple(r[k] for k in keys)
            blob, n = by_group.get(gk, (None, 0))
            fused = (
                bytes(r["freq_sketch"])
                if blob is None
                else cms_merge(spark, [blob, bytes(r["freq_sketch"])])
            )
            by_group[gk] = (fused, n + int(r["n_rows"]))
        out_schema = todo.select("writer_id", *keys, "freq_sketch", "n_rows").schema
        merged = spark.createDataFrame(
            [(*gk, blob, n) for gk, (blob, n) in sorted(
                by_group.items(), key=lambda kv: tuple(str(x) for x in kv[0])
            )],
            out_schema,
        )
    cov_df = spark.createDataFrame(
        [(wid, -(c + 1)) for wid, c in sorted(plan.items())],
        "writer_id string, batch_id int",
    )
    out = merged.join(cov_df, "writer_id").select(*data_cols, "writer_id", "batch_id")
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("writer_id", "batch_id")
        .parquet(path)
    )
    # GC: everything the new compacted rows cover — raw batches <= cov and
    # any STALE negative partition from an earlier compaction.  Writers
    # NOT in this run's plan still get their leftover crash garbage swept
    # (cov_now), so one successful rerun always finishes a prior run's GC.
    return _gc_covered(spark, path, {**cov_now, **plan})


def _gc_covered(spark: SparkSession, path: str, cov_by_writer: dict) -> int:
    """Delete every log partition a writer's current compaction coverage
    makes unreadable: raw batches ``0..cov`` and stale negative partitions
    other than ``-(cov + 1)``.  Writers with no compaction (``cov < 0``)
    are skipped.  Returns the number of partitions removed."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    removed = 0
    for wid, c in sorted(cov_by_writer.items()):
        if c < 0:
            continue
        wdir = jvm.org.apache.hadoop.fs.Path(root, f"writer_id={wid}")
        if not fs.exists(wdir):
            continue
        for st in fs.listStatus(wdir):
            name = st.getPath().getName()
            if not name.startswith("batch_id="):
                continue
            b = int(name.split("=", 1)[1])
            if (0 <= b <= c) or (b < 0 and b != -(c + 1)):
                if not fs.delete(st.getPath(), True):
                    raise IOError(f"failed to delete {st.getPath()}")
                removed += 1
    return removed


def _start(stream: DataFrame, partial_fn, path: str, checkpoint, available_now):
    # Partition ownership is (writer_id, batch_id), NOT batch_id alone:
    # batch ids restart at 0 for every new checkpoint, so a later backfill
    # stream would otherwise overwrite an earlier stream's partitions
    # (caught by the two-drain test).  Deriving writer_id from the
    # checkpoint keeps exactly the right equivalence: a RESTART from the
    # same checkpoint replays the same (writer_id, batch_id) and
    # idempotently overwrites its own partition; a NEW checkpoint is a new
    # namespace whose partials merge alongside the old ones.  Two
    # subtleties both bite in production: the checkpoint must be
    # NORMALIZED before hashing ('ckpt' vs './ckpt' vs the absolute path
    # must be the SAME writer — a restart that spells it differently would
    # fork the namespace and double-count its replayed batches), and a
    # checkpoint-LESS stream has no replay semantics at all, so it gets a
    # fresh RANDOM namespace per start (a shared constant would let two
    # ad-hoc drains overwrite each other's batch-0 partials).
    import hashlib
    import os
    import uuid

    if checkpoint:
        norm = os.path.abspath(checkpoint) if "://" not in checkpoint else checkpoint
        writer_id = hashlib.md5(norm.encode()).hexdigest()[:12]
    else:
        writer_id = f"anon-{uuid.uuid4().hex[:12]}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        partials = (
            partial_fn(batch_df)
            .withColumn("writer_id", F.lit(writer_id))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        # dynamic overwrite touches ONLY this (writer, batch) partition: a
        # replay rewrites it in place, other batches are never touched.  An
        # empty batch writes an empty frame — a no-op under dynamic
        # overwrite, so no debris partitions.
        (
            partials.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("writer_id", "batch_id")
            .parquet(path)
        )

    w = stream.writeStream.foreachBatch(write_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_distinct_sketch_maintenance(
    stream: DataFrame,
    keys: Sequence[str],
    col: str,
    path: str,
    lg_k: int = 12,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Maintain per-group HLL distinct sketches over a stream: per-batch
    partials land in the ``batch_id``-partitioned log at ``path`` (see
    module docstring for the exactly-once mechanism);
    :func:`read_distinct_sketch_log` answers for everything ingested so
    far.  Use case: "distinct users per event type, live, over a stream
    too big to re-scan" — HLL union is associative and lossless at equal
    ``lg_k``, so the streamed answer IS the batch answer (gate
    ``sk_distinct_stream`` pins it against exact COUNT(DISTINCT) in the
    sketch's exact sparse regime).

    Returns the started ``StreamingQuery`` (``available_now=True`` drains
    the backlog and stops — test/backfill mode)."""
    keys = list(keys)
    return _start(
        stream,
        lambda b: distinct_sketch_by(b, keys, col, lg_k=lg_k),
        path,
        checkpoint,
        available_now,
    )


def read_distinct_sketch_log(
    spark: SparkSession, path: str, keys: Sequence[str] = ()
) -> DataFrame:
    """Merge every batch's HLL partials in the log: ``(*keys,
    approx_distinct, n_rows)`` for the full ingested stream."""
    log = _effective_log(spark.read.parquet(path)).drop("writer_id", "batch_id")
    return merge_distinct_sketches(log, keys=list(keys))


def start_freq_sketch_maintenance(
    stream: DataFrame,
    keys: Sequence[str],
    col: str,
    path: str,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Maintain per-group Count-Min frequency sketches over a stream (same
    log mechanism as the distinct path).  The partition-overwrite
    idempotence is LOAD-BEARING here: Count-Min merge ADDS tables, so a
    replayed append would double every count in the replayed batch; a
    replayed overwrite changes nothing.  Merging requires identical
    ``eps``/``confidence``/``seed`` across batches — fixed by this writer
    for the log's lifetime."""
    keys = list(keys)
    return _start(
        stream,
        lambda b: freq_sketch_by(
            b, keys, col, eps=eps, confidence=confidence, seed=seed
        ),
        path,
        checkpoint,
        available_now,
    )


def freq_log_estimates(
    spark: SparkSession,
    path: str,
    items: Sequence,
    keys: Sequence[str] = (),
) -> list:
    """Fold the Count-Min log and estimate ``items``' frequencies: returns
    ``[(key_values..., item, est_count), ...]`` (or ``[(item, est), ...]``
    ungrouped).  Driver-side fold over one small blob per (batch, group) —
    bounded by the log, not the stream."""
    keys = list(keys)
    log = _effective_log(spark.read.parquet(path))
    rows = log.select(*keys, "freq_sketch").collect()
    if not keys:
        if not rows:  # never-fired stream: every count is provably zero
            return [(item, 0) for item in items]
        merged = cms_merge(spark, [r["freq_sketch"] for r in rows])
        return list(zip(items, cms_estimate(spark, merged, items)))
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(tuple(r[k] for k in keys), []).append(r["freq_sketch"])
    out = []
    # NULL group keys are data (freq_sketch_by groups them like any other
    # value); sort them deterministically FIRST — a plain sorted() raises
    # TypeError on None-vs-value comparisons
    def _null_safe(kv):
        return tuple((x is not None, x) for x in kv[0])

    for kv, blobs in sorted(by_key.items(), key=_null_safe):
        merged = cms_merge(spark, blobs)
        for item, est in zip(items, cms_estimate(spark, merged, items)):
            out.append((*kv, item, est))
    return out
