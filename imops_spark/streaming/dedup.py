"""Streaming near-duplicate detection over a document stream.

The ingestion-time twin of the batch MinHash+LSH pipeline
(``functions.dedup``): documents arrive in micro-batches, signatures and
band keys are computed with the SAME row-local column expressions (the
zero-shuffle formulation is what makes them streaming-legal — no
aggregation before the stateful step), and a per-bucket
``applyInPandasWithState`` operator emits every new document paired with
every earlier document in its bucket.  Draining a corpus through the stream
yields exactly the batch ``lsh_candidate_pairs_df`` pair set (up to the
cross-band duplicates noted below).

This is the shape a 100 TB training-data pipeline wants at ingestion: new
documents are checked against the already-ingested corpus incrementally,
keyed by band hash, with state sharded across executors by bucket —
no rescan of the corpus per batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from pyspark.sql import functions as F

from ..functions.dedup import band_entries_df, minhash_signatures_df, shingle_array_df

__all__ = [
    "lsh_pairs_stream",
    "lsh_pairs_selfjoin_stream",
    "unique_docs_selfjoin_stream",
    "verified_near_dup_stream",
    "start_lsh_index_maintenance",
    "start_unique_docs_update_sink",
]


def lsh_pairs_stream(
    docs: DataFrame,
    num_hashes: int = 8,
    k: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Incremental LSH candidate pairs from a streaming ``(doc_id, text)``
    frame: ``(doc_a, doc_b)`` with doc_a < doc_b.

    Per-bucket state is the list of doc ids seen in that (band, band_key)
    bucket; each micro-batch emits new-vs-seen and new-vs-new pairs, so
    across a drain every unordered pair within a bucket is emitted exactly
    once PER BUCKET.  Docs colliding in several bands therefore emit the
    same pair once per colliding band — the batch twin applies
    ``.distinct()``; a streaming consumer dedups downstream (stacking a
    second stateful dedup on this operator is restricted by Spark's
    multi-stateful-operator rules, and the verification join that follows
    is idempotent anyway).

    State grows with bucket occupancy — bounded in practice by LSH design
    (buckets are meant to be small; a hot bucket means the banding is too
    coarse).  No timeout is set: dedup state is corpus-lifetime by
    definition; production would snapshot/TTL via the checkpoint.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    sigs = minhash_signatures_df(docs, num_hashes=num_hashes, k=k)
    buckets = band_entries_df(sigs, bands=bands, rows_per_band=rows_per_band)

    out_schema = "doc_a long, doc_b long"
    state_schema = "seen array<long>"

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # NoTimeout: unreachable, defensive
            return
        seen = list(state.get[0]) if state.exists else []
        batch_ids = sorted(
            {int(d) for p in pdfs for d in p["doc_id"]} - set(seen)
        )
        if not batch_ids:
            return
        pa, pb = [], []
        for i, d in enumerate(batch_ids):
            for other in seen:
                lo, hi = (d, other) if d < other else (other, d)
                pa.append(lo)
                pb.append(hi)
            for other in batch_ids[:i]:  # new-vs-new, each pair once
                pa.append(other)
                pb.append(d)
        state.update((seen + batch_ids,))
        if pa:
            yield pd.DataFrame({"doc_a": pa, "doc_b": pb})

    return buckets.groupBy("band", "band_key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def lsh_pairs_selfjoin_stream(
    docs: DataFrame,
    ts_col: str = "ts_t",
    watermark: str = "10 seconds",
    horizon_minutes: int = 60,
    num_hashes: int = 8,
    k: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
    how: str = "inner",
) -> DataFrame:
    """LSH candidate pairs as a true stream-stream SELF-join: BOTH sides of
    every pair arrive on the stream and are buffered by Spark's symmetric
    join state — no custom state operator (contrast ``lsh_pairs_stream``,
    which hand-manages per-bucket state in ``applyInPandasWithState``).

    ``how='left_outer'`` additionally emits every left band entry with a
    NULL ``doc_b`` once the watermark proves no in-horizon mate can still
    arrive (watermark-driven, like every streaming outer join); the output
    then carries ``ts`` (the left event time) so downstream windowed
    aggregation — e.g. :func:`unique_docs_selfjoin_stream` — remains legal.
    In the outer shape the doc-order predicate is dropped (each side must
    independently prove it has no mate, smaller or larger).

    Band entries are row-local column expressions carrying the event-time
    column through (``carry=(ts_col,)``), then the entry stream is joined
    with itself on ``(band, band_key)`` with ``doc_a < doc_b`` ordering and
    a symmetric event-time bound ``|ts_a - ts_b| <= horizon_minutes``.  The
    watermark + time bound are what let Structured Streaming evict buffered
    entries: a row is droppable once the watermark passes
    ``its ts + horizon``, so state is bounded by (watermark + horizon) ×
    arrival rate on an unbounded stream — the semantic trade vs
    ``lsh_pairs_stream`` is explicit: pairs farther apart than the horizon
    are NOT emitted (corpus-lifetime dedup needs the stateful-operator or
    persisted-index formulation; bounded-window dedup gets join-state
    eviction for free).

    Inner-join matches emit as soon as both rows arrived, so a one-shot
    drain over a fixture whose timestamps all fit in the horizon equals the
    batch ``lsh_candidate_pairs_df`` up to the same cross-band duplicate
    caveat (consumer dedups downstream).  The shuffle keys both sides by
    the join keys — band buckets spread across executors, no broadcast of
    an unbounded side.
    """
    from ..functions.dedup import band_entries_df, minhash_signatures_df

    if how not in ("inner", "left_outer"):
        raise ValueError(f"lsh_pairs_selfjoin_stream supports inner/left_outer, got {how!r}")
    sigs = minhash_signatures_df(docs, num_hashes=num_hashes, k=k, carry=(ts_col,))
    buckets = band_entries_df(
        sigs, bands=bands, rows_per_band=rows_per_band, carry=(ts_col,)
    ).withWatermark(ts_col, watermark)
    a = buckets.alias("a")
    b = buckets.alias("b")
    horizon = F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col(f"b.{ts_col}") >= F.col(f"a.{ts_col}") - horizon)
        & (F.col(f"b.{ts_col}") <= F.col(f"a.{ts_col}") + horizon)
    )
    if how == "inner":
        cond = cond & (F.col("a.doc_id") < F.col("b.doc_id"))
        return a.join(b, cond).select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    # outer: keep self-matches out, keep ts for downstream windowed aggs
    cond = cond & (F.col("a.doc_id") != F.col("b.doc_id"))
    return a.join(b, cond, "left_outer").select(
        F.col("a.doc_id").alias("doc_a"),
        F.col(f"a.{ts_col}").alias(ts_col),
        F.col("b.doc_id").alias("doc_b"),
    )


def unique_docs_selfjoin_stream(
    docs: DataFrame,
    ts_col: str = "ts_t",
    watermark: str = "10 seconds",
    horizon_minutes: int = 60,
    window_minutes: int = 120,
    num_hashes: int = 8,
    k: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Streaming uniqueness filter: ``(window, doc_id)`` for documents with
    NO LSH bucket-mate within the horizon — the ingestion-time "keep only
    first-of-its-kind" complement of the near-dup pair stream.

    Shape: left_outer stream-stream self-join (per band entry, NULL
    ``doc_b`` flushes once the watermark proves no in-horizon mate exists)
    stacked with a windowed all-NULL aggregation — a doc is unique iff
    EVERY band entry flushed unmatched, i.e. ``max(doc_b) IS NULL`` over
    its window group.  Multi-stateful append-mode stacking (Spark >= 3.5
    watermark propagation) makes this a single continuous query; emission
    needs the watermark to pass join-horizon + window-close, so results
    trail ingestion by that delay — the inherent price of proving a
    negative on a stream.
    """
    pairs = lsh_pairs_selfjoin_stream(
        docs,
        ts_col=ts_col,
        watermark=watermark,
        horizon_minutes=horizon_minutes,
        num_hashes=num_hashes,
        k=k,
        bands=bands,
        rows_per_band=rows_per_band,
        how="left_outer",
    )
    return (
        pairs.groupBy(
            F.window(ts_col, f"{int(window_minutes)} minutes").alias("w"),
            F.col("doc_a").alias("doc_id"),
        )
        .agg(F.max("doc_b").alias("__mate"))
        .where(F.col("__mate").isNull())
        .select(F.col("w.start").alias("window_start"), "doc_id")
    )


def verified_near_dup_stream(
    docs: DataFrame,
    static_docs: DataFrame,
    threshold: float = 0.6,
    num_hashes: int = 8,
    k: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Streaming near-dup pairs WITH exact Jaccard verification:
    ``(doc_a, doc_b, jaccard)``, jaccard >= ``threshold``.

    The candidate stream (``lsh_pairs_stream``) is verified by a
    stream-STATIC join against the already-ingested corpus: both documents'
    shingle sets ride as row-local arrays, so the exact Jaccard is
    ``array_intersect`` arithmetic per pair — no aggregation, which is what
    keeps a second computation legal downstream of the stateful operator
    (Spark restricts stacking stateful ops; a groupBy-based verify would
    not run here).  Semantics match the batch ``ngram_jaccard_df`` exactly
    (distinct word-k-shingles, ROUND(6)).

    **Coverage requirement**: the static side must contain BOTH documents
    of a pair at the moment the pair's micro-batch verifies — pairs whose
    docs are missing from the snapshot are dropped by the inner join and,
    because the stateful operator emits each pair exactly once, NEVER
    re-verified.  With the re-read-per-micro-batch production setup (the
    stream appends to the same table) a new doc's own shingles can lag its
    pair emission by one commit; pipelines that cannot tolerate that
    window should verify against ``lsh_query_index``-style state updated
    in the same foreachBatch, or re-verify candidates offline.  Cluster
    formation (connected components) stays batch — it is iterative and
    has no incremental formulation here.
    """
    pairs = lsh_pairs_stream(
        docs, num_hashes=num_hashes, k=k, bands=bands, rows_per_band=rows_per_band
    )
    sh = shingle_array_df(static_docs, k=k, distinct=True)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def start_lsh_index_maintenance(
    docs: DataFrame,
    table: str,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    k: int = 3,
    num_buckets: int = 16,
    path: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Keep a persisted LSH band index (``functions.dedup.lsh_write_index``
    layout) current as documents stream in: every micro-batch's band entries
    are APPENDED to the bucketed index table via ``foreachBatch``, so
    ``lsh_query_index`` probes always see the corpus ingested so far —
    index build and index maintenance become the same code path.

    foreachBatch is the right sink here because the bucketed-table writer
    (``bucketBy``/``saveAsTable``) is a batch API: each micro-batch re-enters
    the batch writer with ``mode='append'``, which validates the bucket spec
    against the existing table — the index stays probe-compatible (same
    single-column bucket key, no exchange on the index side) forever.
    Each batch delegates to ``functions.dedup.lsh_write_index`` with
    ``mode='append'``, so the index layout contract (bucket key, property
    names) lives in exactly one place for build AND maintenance.

    **Delivery guarantee: at-least-once, not exactly-once.**  The
    checkpoint's batch-id log skips replays of batches it has COMMITTED,
    but a crash between the table append and the checkpoint commit replays
    that batch and appends its band entries a second time.  For LSH dedup
    this degrades gracefully — duplicate index entries only duplicate
    candidate pairs, which every downstream consumer (distinct, Jaccard
    verification) already dedups — but an application needing an exact
    index must dedup on (doc_id, bucket_key) at probe time or compact the
    table.

    Returns the started ``StreamingQuery`` (``available_now=True`` drains
    the current backlog and stops — the test/backfill mode; ``False`` runs
    continuously).
    """
    from ..functions.dedup import lsh_write_index

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        lsh_write_index(
            batch_df,
            table,
            num_hashes=num_hashes,
            bands=bands,
            rows_per_band=rows_per_band,
            k=k,
            num_buckets=num_buckets,
            path=path,
            mode="append",
        )

    w = docs.writeStream.foreachBatch(write_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_unique_docs_update_sink(
    docs: DataFrame,
    index_table: str,
    status_path: str,
    log_path: str,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    num_buckets: int = 16,
    n_status_buckets: int = 16,
    index_path: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """UPDATE-mode streaming uniqueness with RETRACTIONS — the complement of
    the append-only :func:`unique_docs_selfjoin_stream`, which can only
    assert uniqueness after the watermark closes and can never take it
    back.  Here a document is asserted unique IMMEDIATELY (no watermark
    delay) and, when a near-duplicate mate arrives in a later batch, the
    assertion is RETRACTED — a change-data stream, with corpus-LIFETIME
    mate detection (the self-join variant only sees mates inside its time
    horizon).

    Spark cannot run a stream-stream join under an update-mode aggregation
    (multi-stateful stacking is append-only), so this is an incremental
    view maintained in ``foreachBatch`` over the persisted LSH index:

    - probe the batch against ``index_table`` (``lsh_query_index``: no
      exchange on the index side) + in-batch pairs
      (``lsh_candidate_pairs_df``) -> every batch doc's mate verdict and
      every INDEX doc newly mated by this batch;
    - append the batch's band entries to the index
      (``lsh_write_index(mode='append')``);
    - upsert the STATUS table at ``status_path`` (parquet partitioned by
      ``bucket = pmod(xxhash64(doc_id), n_status_buckets)``, dynamic
      partition overwrite of only the touched buckets, merged with their
      untouched rows) — one row per doc: ``(doc_id, is_unique, bucket)``;
    - append CHANGE events to ``log_path``:
      ``(batch_id, doc_id, is_unique)`` — ``true`` asserts, ``false``
      retracts a previous assert (or lands a doc that arrived already
      mated).

    Per-batch cost is O(batch + touched status buckets): no corpus rescan,
    no whole-status fold.  **Delivery: at-least-once change events** — a
    crash between sink writes and checkpoint commit replays the batch;
    the status upsert is idempotent (same verdicts rewrite the same rows),
    the log may then carry duplicate events, and the index append
    duplicates band entries (gracefully degrading to duplicate candidates,
    as documented on :func:`start_lsh_index_maintenance`).  Consumers fold
    the log by (doc_id, max batch_id) or read the status table, which is
    always consistent.
    """
    from ..functions.dedup import (
        lsh_candidate_pairs_df,
        lsh_query_index,
        lsh_write_index,
    )

    def _bucket(col):
        return F.pmod(F.xxhash64(col), F.lit(int(n_status_buckets))).cast("int")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.select("doc_id", "text").persist()
        try:
            have_index = spark.catalog.tableExists(index_table)
            if have_index:
                cross = lsh_query_index(
                    spark, index_table, batch_df,
                    num_hashes=num_hashes, bands=bands,
                    rows_per_band=rows_per_band, k=k,
                ).persist()
            else:
                cross = None
            sigs = minhash_signatures_df(batch_df, num_hashes=num_hashes, k=k)
            inbatch = lsh_candidate_pairs_df(
                sigs, bands=bands, rows_per_band=rows_per_band
            )
            mated_in_batch = (
                inbatch.select(F.col("doc_a").alias("doc_id"))
                .unionByName(inbatch.select(F.col("doc_b").alias("doc_id")))
            )
            if cross is not None:
                mated_in_batch = mated_in_batch.unionByName(
                    cross.select(F.col("probe_doc_id").alias("doc_id"))
                )
            mated_in_batch = mated_in_batch.distinct()
            verdicts = batch_df.select("doc_id").join(
                mated_in_batch.withColumn("__m", F.lit(True)), "doc_id", "left"
            ).select(
                "doc_id", F.coalesce("__m", F.lit(False)).alias("mated")
            )
            changes = verdicts.select(
                F.lit(int(batch_id)).alias("batch_id"),
                "doc_id",
                (~F.col("mated")).alias("is_unique"),
            )

            # retractions: previously-unique INDEX docs newly mated now.
            # Only a MISSING status table means "first batch" — any other
            # read failure (transient IO, corrupt footer) must PROPAGATE so
            # the batch retries.  A swallowed error here would silently skip
            # retractions AND skip the keep-merge of untouched rows while
            # the dynamic partition overwrite below still runs, permanently
            # deleting prior status rows in the touched buckets (the
            # bloom_write_index guard, applied to this sink).
            jvm = spark._jvm
            jstatus = jvm.org.apache.hadoop.fs.Path(status_path)
            status_fs = jstatus.getFileSystem(spark._jsc.hadoopConfiguration())
            if status_fs.exists(jstatus):
                status = spark.read.parquet(status_path)
            else:
                status = None
            if cross is not None and status is not None:
                newly_mated = cross.select(
                    F.col("index_doc_id").alias("doc_id")
                ).distinct()
                retract = (
                    status.filter(F.col("is_unique"))
                    .join(newly_mated, "doc_id", "inner")
                    .select(
                        F.lit(int(batch_id)).alias("batch_id"),
                        "doc_id",
                        F.lit(False).alias("is_unique"),
                    )
                )
                changes = changes.unionByName(retract)

            # status upsert rows: overwrite only the touched buckets,
            # keeping their untouched rows
            new_rows = changes.select(
                "doc_id", "is_unique", _bucket(F.col("doc_id")).alias("bucket")
            )
            # one row per doc (a doc can be asserted and retracted within a
            # replayed/merged batch; non-unique wins)
            new_rows = new_rows.groupBy("doc_id", "bucket").agg(
                F.min("is_unique").alias("is_unique")
            ).select("doc_id", "is_unique", "bucket")
            if status is not None:
                touched = new_rows.select("bucket").distinct()
                keep = (
                    status.join(F.broadcast(touched), "bucket", "left_semi")
                    .join(new_rows.select("doc_id"), "doc_id", "left_anti")
                    .select("doc_id", "is_unique", "bucket")
                )
                new_rows = new_rows.unionByName(keep)

            # TRUNCATE LINEAGE on both outputs BEFORE any write: changes
            # and new_rows lazily read the status parquet, and the status
            # write below overwrites that same path.  persist()+count() is
            # NOT enough — a cache miss on the later log write re-plans the
            # query and re-reads the already-overwritten status, silently
            # dropping the retraction rows (observed intermittently).
            # localCheckpoint(eager=True) materializes to executor storage
            # and cuts the plan off from the status files entirely; if an
            # executor dies the batch fails and replays from the source
            # (consistent with the sink's at-least-once contract — unlike
            # the compaction case, nothing irreplaceable lives only here).
            changes = changes.localCheckpoint(eager=True)
            new_rows = new_rows.localCheckpoint(eager=True)

            # index maintenance next: a replayed batch re-probes an index
            # that already contains it, which only re-derives the same
            # verdicts (self-pairs are filtered).
            lsh_write_index(
                batch_df, index_table,
                num_hashes=num_hashes, bands=bands,
                rows_per_band=rows_per_band, k=k,
                num_buckets=num_buckets, path=index_path, mode="append",
            )
            (
                new_rows.repartition("bucket")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(status_path)
            )
            changes.write.mode("append").parquet(log_path)
            if cross is not None:
                cross.unpersist()
        finally:
            batch_df.unpersist()

    w = docs.writeStream.foreachBatch(write_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
