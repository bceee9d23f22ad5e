"""Structured Streaming surface over the harness ``events`` table.

The reference has no streaming (SURVEY.md §2.2 "Streaming"); this module is
the engine's additive surface: the batch operators of
``imops_spark.functions.events`` re-expressed as ``readStream`` pipelines
with watermarks, so the same logical computation runs incrementally.

Patterns covered:
- file-source stream of the events parquet (nanosecond timestamps normalized
  exactly like the batch loader);
- tumbling/sliding windowed aggregates with ``withWatermark`` for late data;
- stateful exact dedup via ``dropDuplicates`` under a watermark.

At cluster scale the same code runs against Kafka by swapping the source —
all transformations are source-agnostic DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "stream_events",
    "windowed_counts_stream",
    "sliding_avg_stream",
    "session_agg_stream",
    "dedup_stream",
    "interval_join_stream",
    "sessionize_stateful_stream",
    "run_stream_to_memory",
    "start_time_partitioned_sink",
    "start_daily_rollup_maintenance",
]


def _rollup_write_batch(
    batch_df: DataFrame,
    batch_id: int,
    raw_path: str,
    rollup_path: str,
    ts_sec_col: str,
    group_col: str,
    value_col: str,
) -> None:
    """One micro-batch of rollup maintenance (module-level so tests can
    drive the crash-replay path directly).  See
    ``start_daily_rollup_maintenance`` for the idempotence argument."""
    from ..sources.parquet import _event_date_expr

    spark = batch_df.sparkSession
    dated = batch_df.withColumn(
        # NULL timestamps land in an explicit sentinel partition instead of
        # crashing the recompute (a NULL day would become the literal path
        # '.../event_date=None')
        "event_date",
        F.coalesce(_event_date_expr(ts_sec_col, "day"), F.lit("__unknown__")),
    ).withColumn("_batch_id", F.lit(int(batch_id))).persist()
    try:
        days = [r["event_date"] for r in dated.select("event_date").distinct().collect()]
        if not days:
            return  # empty batch: no append job, no recompute
        # OVERWRITE the batch's own (event_date, _batch_id) partitions:
        # a replayed batch rewrites its own directories with identical
        # content instead of appending duplicates — this is what makes
        # the raw table (and thus the rollup) replay-idempotent.  Dynamic
        # mode rides on the writer (genuinely scoped), not the session
        # conf — a conf flip would race with concurrently planned
        # overwrites on the same session.
        (
            dated.repartition("event_date")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_date", "_batch_id")
            .parquet(raw_path)
        )
        fresh = (
            spark.read.option("basePath", raw_path)
            .parquet(*[f"{raw_path}/event_date={d}" for d in days])
            .groupBy("event_date", group_col)
            .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("sum_value"))
        )
        (
            fresh.repartition("event_date")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_date")
            .parquet(rollup_path)
        )
    finally:
        dated.unpersist()


def start_daily_rollup_maintenance(
    events: DataFrame,
    raw_path: str,
    rollup_path: str,
    checkpoint: str,
    ts_sec_col: str = "ts_sec",
    group_col: str = "event_type",
    value_col: str = "value",
    available_now: bool = True,
):
    """Maintain a per-day rollup table alongside the raw event sink — the
    incrementally-maintained materialized view of a lakehouse: every
    micro-batch (1) lands its rows in the raw table under
    ``event_date=<day>/_batch_id=<n>`` partitions, then (2) RECOMPUTES the
    rollup for just the days the batch touched and replaces those rollup
    partitions via dynamic overwrite.

    Idempotence is end-to-end and holds across the crash-replay window:
    the raw write is a dynamic OVERWRITE of the batch's own
    (event_date, _batch_id) partitions — a batch replayed after a crash
    anywhere before the checkpoint commit rewrites exactly the
    directories it wrote before, never appends duplicates — and the
    rollup is recomputed from raw, so it is a pure function of a raw
    table that replay cannot corrupt.  (A merge-into-rollup delta design
    would need transactional read-modify-write to get the same
    guarantee.)  NULL timestamps land in an ``event_date=__unknown__``
    sentinel partition rather than killing the query.  Cost per trigger
    is re-aggregating whole day partitions (partition-pruned scans), the
    standard partition-recompute tradeoff; raw readers see the extra
    ``_batch_id`` ingestion column, the usual lakehouse idiom.

    Rollup schema: ``(event_date, <group_col>, n, sum_value)``.
    Returns the started ``StreamingQuery``.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _rollup_write_batch(
            batch_df, batch_id, raw_path, rollup_path, ts_sec_col, group_col, value_col
        )

    w = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_time_partitioned_sink(
    events: DataFrame,
    path: str,
    checkpoint: str,
    ts_sec_col: str = "ts_sec",
    granularity: str = "day",
    compact_every: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    available_now: bool = True,
):
    """Stream events into the hive time-partitioned layout
    (``sources.parquet.write_time_partitioned`` directories) and keep it
    scannable: every ``compact_every``-th micro-batch also runs
    ``compact_partitions`` over the table, folding the
    file-per-trigger-per-task debris back to ~target-size files — the sink
    plus its maintenance job in one pipeline.

    Spark's native streaming parquet sink cannot be used for this layout:
    it tracks output files in a ``_spark_metadata`` commit log, and any
    out-of-band rewrite (compaction) would orphan log entries and corrupt
    reads.  foreachBatch with a plain batch append keeps the directory
    log-free, so compaction and partition-level backfills
    (``upsert_time_partitioned``) stay legal.  Exactly-once: replays of a
    COMMITTED batch are skipped via the checkpoint's batch-id log before
    foreachBatch runs, and within a batch the Hadoop commit protocol keeps
    partial task output invisible; the residual window is a crash during
    job commit — the classic non-transactional-lake caveat (dedup on a
    unique event id downstream if that window matters).  This sink keeps a
    FLAT event_date layout so ``compact_partitions`` can fold its files;
    if hard replay-idempotence matters more than compactability, use
    ``start_daily_rollup_maintenance``'s raw table instead — its
    (event_date, _batch_id) overwrite closes the crash window but nests a
    partition level compaction does not manage.

    Returns the started ``StreamingQuery``.
    """
    from ..sources.parquet import _event_date_expr, compact_partitions

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("event_date", _event_date_expr(ts_sec_col, granularity))
            .repartition("event_date")
            .write.mode("append")
            .partitionBy("event_date")
            .parquet(path)
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_partitions(
                batch_df.sparkSession, path, target_file_bytes=target_file_bytes
            )

    w = events.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one-file directory glob).

    ``ts`` precision is testdata-dependent and must be dispatched on the
    *resolved* Spark type, exactly like the batch ``with_ts_sec``:

    - TIMESTAMP(NANOS) parquet has no Spark type; with
      ``spark.sql.legacy.parquet.nanosAsLong`` set during schema resolution
      it arrives as a long of epoch-nanoseconds -> integer-divide to seconds.
    - TIMESTAMP(MICROS/MILLIS) arrives as TIMESTAMP_NTZ (Spark 4 reads naive
      parquet timestamps as wall-clock) -> ``unix_timestamp``.

    Either way we materialize ``ts_sec`` (bigint epoch seconds) and ``ts_t``
    (second-precision timestamp for watermarks/windows) so every downstream
    streaming operator sees one schema, identical to the batch loader's.
    """
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        static = spark.read.parquet(f"{sf_dir}/events.parquet")
        schema = static.schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    if dict(stream.dtypes)["ts"].startswith("timestamp"):
        ts_sec = F.unix_timestamp("ts")
    else:  # long: epoch nanoseconds (nanosAsLong read path); exact int division
        ts_sec = F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    return stream.withColumn("ts_sec", ts_sec).withColumn(
        "ts_t", F.timestamp_seconds(ts_sec)
    )


def windowed_counts_stream(events: DataFrame, minutes: int = 5, watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event type with a late-data watermark."""
    return (
        events.withWatermark("ts_t", watermark)
        .groupBy(F.window("ts_t", f"{minutes} minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg_stream(events: DataFrame, length_min: int = 10, slide_min: int = 5) -> DataFrame:
    """Sliding-window mean value per user (overlapping windows)."""
    return (
        events.withWatermark("ts_t", "1 hour")
        .groupBy(F.window("ts_t", f"{length_min} minutes", f"{slide_min} minutes"), "user_id")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "user_id",
            "avg_value",
        )
    )


def session_agg_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Native ``session_window`` aggregation in APPEND mode — the shape a
    real ingestion pipeline runs (complete mode re-emits the whole result
    set every trigger and cannot scale past driver memory; the
    complete-mode twin is only a drain-and-compare harness).

    Append-mode semantics: a session row is emitted exactly once, when the
    event-time watermark passes its end (``last_ts + gap``) — i.e. once no
    in-horizon late event could extend or merge it — and its state is
    evicted.  Sessions still open at the watermark stay buffered across
    micro-batches; a late event BELOW the watermark is dropped, never
    resurrecting an emitted session (exactly-once emission is the point of
    the eviction).  State size is bounded by the number of OPEN sessions
    inside the watermark horizon, independent of stream length.

    Output schema matches the batch ``evt_session_native`` gate:
    ``(user_id, start_sec, end_sec, n_events, sum_value)`` with the same
    exclusive window end (``last_ts + gap``).
    """
    w = F.session_window("ts_t", f"{gap_minutes} minutes").alias("w")
    return (
        events.withWatermark("ts_t", watermark)
        .groupBy("user_id", w)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("start_sec"),
            F.unix_timestamp("w.end").alias("end_sec"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exact dedup on (user_id, event_type) within the watermark."""
    return events.withWatermark("ts_t", watermark).dropDuplicates(["user_id", "event_type"])


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    window_minutes: int = 30,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition: for
    each left event, the right events of the same user whose timestamp falls
    in ``[left.ts - window_minutes, left.ts]`` (attribution-style join, e.g.
    purchases to the clicks that preceded them).

    Both sides carry a watermark and the join condition bounds the two event
    times against each other — exactly what Structured Streaming needs to
    know when buffered state on either side can be evicted: a right row is
    droppable once the watermark passes ``its ts + window``, a left row once
    the watermark passes its own ts.  State is therefore bounded by
    (watermark + window) × arrival rate regardless of how long the streams
    run — the property that makes the operator safe on an unbounded 100 TB
    stream.  The shuffle is keyed by ``user_id`` on both sides, so the join
    scales horizontally with users and no executor ever sees more than one
    user's in-window buffer per task.

    Output: ``(user_id, l_event_id, r_event_id, lag_sec)`` with
    ``lag_sec = left.ts_sec - right.ts_sec ∈ [0, window]``.  Inner-join
    matches emit as soon as both rows have arrived (no watermark-expiry
    latency), so a single availableNow drain over a time-split file source
    yields the full batch-equivalent result — which is what the driver's SQL
    oracle cross-checks.

    ``how='left_outer'`` additionally emits unmatched LEFT rows (null
    ``r_event_id``/``lag_sec``) — but only once the watermark proves no
    in-window right row can still arrive, i.e. after it passes the left
    row's ``ts``.  Outer emission is therefore watermark-DRIVEN: a one-shot
    drain only flushes left rows old enough relative to the final watermark
    (the inherent streaming-vs-batch outer-join difference; the multi-batch
    test pins it).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"interval_join_stream supports inner/left_outer, got {how!r}")
    l = left.withWatermark("ts_t", watermark).select(
        F.col("user_id"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts_t").alias("l_ts"),
        F.col("ts_sec").alias("l_ts_sec"),
    )
    r = right.withWatermark("ts_t", watermark).select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts_t").alias("r_ts"),
        F.col("ts_sec").alias("r_ts_sec"),
    )
    return (
        l.join(
            r,
            (F.col("user_id") == F.col("r_user_id"))
            & (
                F.col("r_ts")
                >= F.col("l_ts") - F.expr(f"INTERVAL {int(window_minutes)} MINUTES")
            )
            & (F.col("r_ts") <= F.col("l_ts")),
            how,
        )
        .select(
            "user_id",
            "l_event_id",
            "r_event_id",
            (F.col("l_ts_sec") - F.col("r_ts_sec")).alias("lag_sec"),
        )
    )


def sessionize_stateful_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization via
    ``applyInPandasWithState`` — per-user open-session state carried across
    micro-batches, closed sessions emitted incrementally.

    Semantics match the batch ``functions.events.sessionize_df`` exactly
    (ordering key (ts_sec, event_id), gap > ``gap_minutes``): a session is
    emitted once a later event proves it closed, or when event time passes
    its gap deadline (EventTimeTimeout).  In a single availableNow batch the
    emitted rows are therefore every session except each user's last — which
    is what the SQL oracle cross-checks.

    State is one fixed-width row per open session (last_ts, seq, n, min
    event id); the shuffle is keyed by user_id — the same partitioning the
    batch twin uses, so the operator scales horizontally with users.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60
    out_schema = "user_id long, session_seq long, n_events long, first_event_id long"
    state_schema = "last long, seq long, n long, first_event long"

    def fn(key, pdfs, state: GroupState):
        uid = int(key[0])
        if state.hasTimedOut:
            last, seq, n, first = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_seq": [seq],
                    "n_events": [n],
                    "first_event_id": [first],
                }
            )
            return
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts_sec", "event_id"], kind="mergesort")
        ts = pdf["ts_sec"].to_numpy(np.int64)
        eid = pdf["event_id"].to_numpy(np.int64)

        carried = state.get if state.exists else None
        prev_last = carried[0] if carried else ts[0] - gap - 1
        prev = np.concatenate(([prev_last], ts[:-1]))
        # sid 0 = continuation of the carried open session; 1..K new sessions
        sid = np.cumsum((ts - prev) > gap)
        starts = np.unique(sid, return_index=True)[1]
        seg_n = np.diff(np.append(starts, len(sid)))
        seg_min = np.minimum.reduceat(eid, starts)
        seg_sid = sid[starts]

        base_seq = carried[1] if carried else 0
        sessions = []  # (seq, n, first_event_id)
        if carried:
            c_last, c_seq, c_n, c_first = carried
            if seg_sid[0] == 0:  # batch head continues the open session
                c_n += int(seg_n[0])
                c_first = min(c_first, int(seg_min[0]))
                seg_sid, seg_n, seg_min = seg_sid[1:], seg_n[1:], seg_min[1:]
            sessions.append((c_seq, c_n, c_first))
        sessions += [
            (base_seq + int(s), int(n), int(m)) for s, n, m in zip(seg_sid, seg_n, seg_min)
        ]

        *closed, last_open = sessions
        state.update((int(ts[-1]), last_open[0], last_open[1], last_open[2]))
        # event-time deadline: the open session closes when the watermark
        # passes last_ts + gap (clamped ahead of the current watermark —
        # setting a timeout at or behind it is an error).
        state.setTimeoutTimestamp(
            max((int(ts[-1]) + gap) * 1000, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_seq": [s[0] for s in closed],
                    "n_events": [s[1] for s in closed],
                    "first_event_id": [s[2] for s in closed],
                }
            )

    return (
        events.withWatermark("ts_t", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, spark: SparkSession, mode: str = "append"
) -> DataFrame:
    """Drain a stream with availableNow into an in-memory table; returns the
    resulting batch DataFrame (test/driver harness helper).  Use
    ``mode='complete'`` for aggregate streams, ``'append'`` for row streams."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)
