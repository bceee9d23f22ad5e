"""Streaming sketch maintenance (streaming/sketch.py): streamed-log merges
must equal batch sketches, and replayed batches must not change anything
(the partition-overwrite exactly-once mechanism)."""

from pyspark.sql import functions as F

from imops_spark.functions.sketch import (
    cms_estimate,
    cms_merge,
    distinct_sketch_by,
    freq_sketch_by,
    merge_distinct_sketches,
)
from imops_spark.streaming.sketch import (
    freq_log_estimates,
    read_distinct_sketch_log,
    start_distinct_sketch_maintenance,
    start_freq_sketch_maintenance,
)


def _src(spark, tmp_path, name, lo, hi):
    path = str(tmp_path / name)
    (
        spark.range(lo, hi)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") % 41).alias("v"),
        )
        .write.parquet(path)
    )
    return path


def test_streamed_distinct_log_equals_batch(spark, tmp_path):
    src1 = _src(spark, tmp_path, "in1", 0, 400)
    src2 = _src(spark, tmp_path, "in2", 400, 900)
    log = str(tmp_path / "log")
    schema = "g string, v long"
    for i, src in enumerate((src1, src2)):
        q = start_distinct_sketch_maintenance(
            spark.readStream.schema(schema).parquet(src),
            ["g"],
            "v",
            log,
            checkpoint=str(tmp_path / f"ck{i}"),
        )
        q.awaitTermination(120)
    got = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    }
    both = spark.read.parquet(src1).union(spark.read.parquet(src2))
    want = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in merge_distinct_sketches(
            distinct_sketch_by(both, ["g"], "v"), keys=["g"]
        ).collect()
    }
    assert got == want
    # 41 distinct values per group: HLL sparse regime -> exact
    exact = {
        r["g"]: r["d"]
        for r in both.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    }
    assert {g: d for g, (d, _) in got.items()} == exact


def test_replayed_batch_changes_nothing(spark, tmp_path):
    """Re-invoking the foreachBatch writer with the same (batch, id) must
    leave the log's merged answer identical — partition overwrite, not
    append.  For Count-Min this is the difference between correct counts
    and double counts."""
    src = _src(spark, tmp_path, "in", 0, 500)
    batch = spark.read.parquet(src)
    log = str(tmp_path / "freqlog")

    def write_once(bid):
        partials = (
            freq_sketch_by(batch, ["g"], "v", eps=0.001)
            .withColumn("writer_id", F.lit("w0"))
            .withColumn("batch_id", F.lit(bid))
        )
        (
            partials.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("writer_id", "batch_id")
            .parquet(log)
        )

    write_once(0)
    first = freq_log_estimates(spark, log, items=[0, 1, 7], keys=["g"])
    write_once(0)  # the replay
    assert freq_log_estimates(spark, log, items=[0, 1, 7], keys=["g"]) == first


def test_streamed_freq_log_equals_batch(spark, tmp_path):
    src1 = _src(spark, tmp_path, "in1", 0, 300)
    src2 = _src(spark, tmp_path, "in2", 300, 800)
    log = str(tmp_path / "log")
    schema = "g string, v long"
    for i, src in enumerate((src1, src2)):
        q = start_freq_sketch_maintenance(
            spark.readStream.schema(schema).parquet(src),
            [],
            "v",
            log,
            eps=0.001,
            checkpoint=str(tmp_path / f"ck{i}"),
        )
        q.awaitTermination(120)
    items = list(range(41))
    got = freq_log_estimates(spark, log, items=items)
    both = spark.read.parquet(src1).union(spark.read.parquet(src2))
    blob = freq_sketch_by(both, [], "v", eps=0.001).collect()[0]["freq_sketch"]
    want = list(zip(items, cms_estimate(spark, blob, items)))
    assert got == want
    # eps*n bound with few distinct values: estimates are the exact counts
    exact = {r["v"]: r["c"] for r in both.groupBy("v").agg(F.count("*").alias("c")).collect()}
    assert dict(got) == exact


def test_compaction_preserves_estimates_and_bounds_log(spark, tmp_path):
    """compact_sketch_log must fold every committed batch into one row per
    (writer, group), keep the newest batch raw (the only replayable one),
    leave all estimates identical, and be idempotent."""
    from imops_spark.streaming.sketch import compact_sketch_log

    schema = "g string, v long"
    log = str(tmp_path / "dlog")
    # one writer, several batches: append files into ONE source dir and
    # drain through ONE checkpoint so batch ids advance 0,1,2
    ck = str(tmp_path / "ck")
    indir = str(tmp_path / "in")
    for lo, hi in [(0, 300), (300, 600), (600, 900)]:
        (
            spark.range(lo, hi)
            .select(
                (F.col("id") % 3).cast("string").alias("g"),
                (F.col("id") % 41).alias("v"),
            )
            .write.mode("append")
            .parquet(indir)
        )
        q = start_distinct_sketch_maintenance(
            spark.readStream.schema(schema).parquet(indir),
            ["g"], "v", log, checkpoint=ck,
        )
        q.awaitTermination(120)
    before = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    }
    n_before = spark.read.parquet(log).count()
    removed = compact_sketch_log(spark, log, keys=["g"])
    assert removed >= 1
    after = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    }
    assert after == before
    raw = spark.read.parquet(log)
    n_after = raw.count()
    assert n_after < n_before
    # exactly one negative (compacted) partition; the newest batch raw
    bids = sorted({r["batch_id"] for r in raw.select("batch_id").collect()})
    assert sum(1 for b in bids if b < 0) == 1
    assert max(bids) >= 0
    # idempotent: nothing new to fold
    assert compact_sketch_log(spark, log, keys=["g"]) == 0
    assert {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    } == before


def test_compaction_freq_log_and_stale_negative_tolerated(spark, tmp_path):
    """Count-Min compaction: estimates identical after folding; a STALE
    negative partition (crash between write and GC of an earlier
    compaction) is ignored by readers and swept by the next run."""
    from imops_spark.streaming.sketch import compact_sketch_log

    src = _src(spark, tmp_path, "in", 0, 500)
    batch = spark.read.parquet(src)
    log = str(tmp_path / "flog")
    for bid in range(3):
        (
            freq_sketch_by(batch, ["g"], "v", eps=0.001)
            .withColumn("writer_id", F.lit("w1"))
            .withColumn("batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("writer_id", "batch_id")
            .parquet(log)
        )
    items = ["0", "1", "40", "missing"]
    before = freq_log_estimates(spark, log, items, keys=["g"])
    assert compact_sketch_log(spark, log, keys=["g"]) >= 1
    assert freq_log_estimates(spark, log, items, keys=["g"]) == before
    # plant a stale, SHALLOWER compaction row (covers through batch 0 only)
    # as if an old compaction's GC never ran: readers must ignore it
    (
        freq_sketch_by(batch, ["g"], "v", eps=0.001)
        .withColumn("writer_id", F.lit("w1"))
        .withColumn("batch_id", F.lit(-1))
        .write.mode("append")
        .partitionBy("writer_id", "batch_id")
        .parquet(log)
    )
    assert freq_log_estimates(spark, log, items, keys=["g"]) == before
    # a fresh batch arrives; the next compaction folds it and sweeps the
    # stale row
    (
        freq_sketch_by(batch, ["g"], "v", eps=0.001)
        .withColumn("writer_id", F.lit("w1"))
        .withColumn("batch_id", F.lit(3))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("writer_id", "batch_id")
        .parquet(log)
    )
    grown = freq_log_estimates(spark, log, items, keys=["g"])
    assert compact_sketch_log(spark, log, keys=["g"]) >= 1
    assert freq_log_estimates(spark, log, items, keys=["g"]) == grown
    bids = {r["batch_id"] for r in spark.read.parquet(log).select("batch_id").collect()}
    assert -1 not in bids and sum(1 for b in bids if b < 0) == 1


def test_compaction_multiple_writers_independent(spark, tmp_path):
    """Two writers in one log compact independently: each keeps its own
    newest batch raw, gets its own coverage row, and the merged estimates
    are unchanged."""
    from imops_spark.streaming.sketch import compact_sketch_log

    log = str(tmp_path / "mwlog")
    for wid, batches in (("w1", 3), ("w2", 2)):
        for bid in range(batches):
            (
                spark.range(bid * 100, bid * 100 + 100)
                .select((F.col("id") % 3).cast("string").alias("g"), (F.col("id") % 17).alias("v"))
                .transform(lambda df: distinct_sketch_by(df, ["g"], "v"))
                .withColumn("writer_id", F.lit(wid))
                .withColumn("batch_id", F.lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("writer_id", "batch_id")
                .parquet(log)
            )
    before = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    }
    removed = compact_sketch_log(spark, log, keys=["g"])
    assert removed >= 2  # w1 folds 2 batches, w2 folds 1
    after = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    }
    assert after == before
    raw = spark.read.parquet(log).select("writer_id", "batch_id").collect()
    per = {}
    for r in raw:
        per.setdefault(r["writer_id"], set()).add(r["batch_id"])
    assert per["w1"] == {-2, 2} and per["w2"] == {-1, 1}


def test_compaction_post_crash_rerun_finishes_gc(spark, tmp_path):
    """A crash between the compacted-row write and the deletion leaves
    covered raw partitions (and possibly a stale negative one) that the
    effective view hides — readers stay correct by most-negative-wins,
    but the disk garbage must not persist: a rerun whose merge plan is
    EMPTY must still sweep it."""
    import os

    from imops_spark.streaming.sketch import compact_sketch_log

    schema = "g string, v long"
    log = str(tmp_path / "dlog")
    ck = str(tmp_path / "ck")
    indir = str(tmp_path / "in")
    for lo, hi in [(0, 300), (300, 600), (600, 900)]:
        (
            spark.range(lo, hi)
            .select((F.col("id") % 3).cast("string").alias("g"), (F.col("id") % 41).alias("v"))
            .write.mode("append").parquet(indir)
        )
        q = start_distinct_sketch_maintenance(
            spark.readStream.schema(schema).parquet(indir), ["g"], "v", log,
            checkpoint=ck,
        )
        q.awaitTermination(120)
    before = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    }
    assert compact_sketch_log(spark, log, keys=["g"]) >= 1

    wdirs = [d for d in os.listdir(log) if d.startswith("writer_id=")]
    assert len(wdirs) == 1
    wid = wdirs[0].split("=", 1)[1]
    neg = [
        int(d.split("=", 1)[1])
        for d in os.listdir(os.path.join(log, wdirs[0]))
        if d.startswith("batch_id=") and int(d.split("=", 1)[1]) < 0
    ]
    assert len(neg) == 1
    cov = -neg[0] - 1

    # reconstruct the crash: covered raw partitions reappear (their
    # deletion "never happened"), plus a STALE negative partition from an
    # earlier compaction
    def plant(bid, lo, hi):
        (
            spark.range(lo, hi)
            .select((F.col("id") % 3).cast("string").alias("g"), (F.col("id") % 41).alias("v"))
            .transform(lambda df: distinct_sketch_by(df, ["g"], "v"))
            .withColumn("writer_id", F.lit(wid))
            .withColumn("batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("writer_id", "batch_id")
            .parquet(log)
        )

    plant(0, 0, 300)
    plant(1, 300, 600)
    if cov >= 1:
        plant(-(cov - 1) - 1, 0, 600)  # stale older compaction row
    # readers: most-negative-wins hides every planted partition
    assert {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    } == before
    # rerun: nothing to merge, but the sweep must remove the garbage
    removed = compact_sketch_log(spark, log, keys=["g"])
    assert removed == (2 + (1 if cov >= 1 else 0))
    bids = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(os.path.join(log, wdirs[0]))
        if d.startswith("batch_id=")
    )
    assert [b for b in bids if b < 0] == [-(cov + 1)]
    assert all(b > cov for b in bids if b >= 0)
    assert {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    } == before
    # and now truly idempotent
    assert compact_sketch_log(spark, log, keys=["g"]) == 0


def test_compaction_interleaved_with_live_drain(spark, tmp_path):
    """Compacting BETWEEN a writer's drains (the live-stream race, replayed
    deterministically): the stream keeps appending batches from the same
    checkpoint after a compaction; readers must equal the batch oracle at
    every step, and a second compaction folds the post-compaction batches
    into ONE refreshed negative row."""
    from imops_spark.streaming.sketch import compact_sketch_log

    schema = "g string, v long"
    log = str(tmp_path / "dlog2")
    ck = str(tmp_path / "ck2")
    indir = str(tmp_path / "in2")

    def drain(lo, hi):
        (
            spark.range(lo, hi)
            .select((F.col("id") % 3).cast("string").alias("g"), (F.col("id") % 41).alias("v"))
            .write.mode("append").parquet(indir)
        )
        q = start_distinct_sketch_maintenance(
            spark.readStream.schema(schema).parquet(indir), ["g"], "v", log,
            checkpoint=ck,
        )
        q.awaitTermination(120)

    def oracle(hi):
        return {
            r["g"]: r["approx_distinct"]
            for r in distinct_sketch_by(
                spark.range(0, hi).select(
                    (F.col("id") % 3).cast("string").alias("g"),
                    (F.col("id") % 41).alias("v"),
                ),
                ["g"], "v",
            ).selectExpr(
                "g", "hll_sketch_estimate(distinct_sketch) AS approx_distinct"
            ).collect()
        }

    drain(0, 300)
    drain(300, 600)
    compact_sketch_log(spark, log, keys=["g"])
    got1 = {
        r["g"]: r["approx_distinct"]
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    }
    assert got1 == oracle(600)
    # the stream continues from the SAME checkpoint past the compaction
    drain(600, 900)
    drain(900, 1200)
    got2 = {
        r["g"]: r["approx_distinct"]
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    }
    assert got2 == oracle(1200)
    assert compact_sketch_log(spark, log, keys=["g"]) >= 1
    import os

    wdir = [d for d in os.listdir(log) if d.startswith("writer_id=")][0]
    negs = [
        int(d.split("=", 1)[1])
        for d in os.listdir(os.path.join(log, wdir))
        if d.startswith("batch_id=") and int(d.split("=", 1)[1]) < 0
    ]
    assert len(negs) == 1  # refreshed coverage row, stale one swept
    assert {
        r["g"]: r["approx_distinct"]
        for r in read_distinct_sketch_log(spark, log, keys=["g"]).collect()
    } == oracle(1200)
