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
]


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
    log = spark.read.parquet(path).drop("writer_id", "batch_id")
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
    log = spark.read.parquet(path)
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
