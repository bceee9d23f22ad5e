"""Tests for parquet voxel/blob sources and layout-driven pruning."""

import numpy as np
from numpy.testing import assert_array_equal
from pyspark.sql import functions as F

from imops_spark.sources.parquet import (
    read_blobs,
    read_voxels,
    write_blobs,
    write_voxels,
)
from imops_spark.tensor_io import decode_blobs, decode_volume, encode_blobs, encode_volume


def test_voxel_roundtrip(spark, tmp_path):
    a = np.random.randn(6, 7)
    tf = encode_volume(spark, a)
    path = str(tmp_path / "vox")
    write_voxels(tf, path)
    back = read_voxels(spark, path, shape=a.shape, dtype=a.dtype)
    assert_array_equal(decode_volume(back), a)


def test_voxel_pruned_scan(spark, tmp_path):
    from imops_spark.operators.crop import crop_to_box_df
    from imops_spark.box import make_box

    a = np.random.randn(32, 8)
    tf = encode_volume(spark, a)
    path = str(tmp_path / "vox2")
    write_voxels(tf, path)
    back = read_voxels(spark, path, shape=a.shape, dtype=a.dtype)
    cropped = crop_to_box_df(back, make_box([[4, 2], [10, 6]]))
    # the coordinate predicate must reach the parquet scan
    plan = cropped.df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(i0,4)" in plan or "PushedFilters" in plan
    assert_array_equal(decode_volume(cropped), a[4:10, 2:6])


def test_blob_roundtrip(spark, tmp_path):
    arrays = {i: np.random.randn(4, 5).astype(np.float32) for i in range(3)}
    path = str(tmp_path / "blobs")
    write_blobs(encode_blobs(spark, arrays), path, files=2)
    back = decode_blobs(read_blobs(spark, path))
    for i, a in arrays.items():
        assert_array_equal(back[i], a)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed by the same key join with NO Exchange: the shuffle
    was pre-paid at write time — the co-located-join strategy for repeated
    big joins at cluster scale."""
    from imops_spark.sources.parquet import write_bucketed

    left = spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS lv")
    right = spark.range(0, 2000).selectExpr("id AS k", "id * 3 AS rv")
    write_bucketed(left, "bk_left", ["k"], num_buckets=4, sort_cols=["k"],
                   path=str(tmp_path / "bk_left"))
    write_bucketed(right, "bk_right", ["k"], num_buckets=4, sort_cols=["k"],
                   path=str(tmp_path / "bk_right"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bk_left").join(spark.table("bk_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        got = j.selectExpr("sum(lv + rv) AS s").collect()[0]["s"]
        assert got == sum(2 * i + 3 * i for i in range(2000))
        # sanity: the same join on plain (non-bucketed) scans does shuffle
        plain = left.join(right, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_aqe_splits_skewed_join(spark):
    """One hot key holding 90% of the left side: AQE's skew-join rewrite must
    split the oversized partition (SortMergeJoin(skew=true) in the final
    adaptive plan) and still produce the exact join result — the engine's
    answer to skewed keys at 100 TB (salting not required)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32768",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") < 180_000, 0).otherwise(F.col("id") % 32 + 1).alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(330).select(
            (F.col("id") % 33).alias("k"), (F.col("id") * 7).alias("rv")
        )
        agg = left.join(right, "k").selectExpr("sum(lv + rv) AS s")
        got = agg.collect()[0]["s"]
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan
        # exact value oracle: every left row joins its 10 right rows
        import numpy as np

        lk = np.where(np.arange(200_000) < 180_000, 0, np.arange(200_000) % 32 + 1)
        lv = np.arange(200_000)
        rk = np.arange(330) % 33
        rv = np.arange(330) * 7
        exp = 0
        for key in range(33):
            nl, nr = (lk == key).sum(), (rk == key).sum()
            exp += int(lv[lk == key].sum()) * nr + int(rv[rk == key].sum()) * nl
        assert got == exp
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_bucketed_voxel_tables_pointwise_add_shuffle_free(spark, tmp_path):
    """The imaging-pipeline co-location story: two voxel tables written
    bucketed by the full coordinate key add elementwise with NO Exchange —
    the pre-paid write-time shuffle satisfies the coordinate equi-join's
    distribution at every later read.  (Bucket on the FULL join key:
    spark.sql.requireAllClusterKeysForCoPartition makes subset-key bucketing
    shuffle anyway.)  This is the plan shape a 100 TB voxel store relies
    on for repeated cross-volume arithmetic (registration deltas, masks)."""
    import numpy as np
    from numpy.testing import assert_array_equal

    from imops_spark.operators.numeric import pointwise_add_df
    from imops_spark.sources.parquet import write_bucketed
    from imops_spark.tensor_io import decode_volume, encode_volume, tensor_frame_from_df

    rng = np.random.default_rng(7)
    a = rng.standard_normal((8, 9, 10)).astype(np.float64)
    b = rng.standard_normal((8, 9, 10)).astype(np.float64)
    key = ["image_id", "i0", "i1", "i2"]
    write_bucketed(encode_volume(spark, a).df, "vox_a", key,
                   num_buckets=4, sort_cols=key, path=str(tmp_path / "vox_a"))
    write_bucketed(encode_volume(spark, b).df, "vox_b", key,
                   num_buckets=4, sort_cols=key, path=str(tmp_path / "vox_b"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the auto rule may turn bucketed scans off when it underestimates
        # their benefit; pin it for a deterministic plan assertion
        "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        ta = tensor_frame_from_df(spark.table("vox_a"))
        tb = tensor_frame_from_df(spark.table("vox_b"))
        assert ta.shape == (8, 9, 10) and ta.dtype == np.float64
        out = pointwise_add_df(ta, tb)
        assert_array_equal(decode_volume(out), a + b)
        # AQE finalizes the plan only after execution; inspect the final one
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS vox_a")
        spark.sql("DROP TABLE IF EXISTS vox_b")


def test_scan_pushdown_and_column_pruning(spark):
    """Pin the scan-efficiency invariants the 100 TB design depends on:
    filters reach the parquet scan (PushedFilters) and the ReadSchema is
    pruned to the referenced columns — a scan reading all 16 lineitem
    columns for a 2-column aggregate would be wrong at any scale."""
    import __spark_entry__ as entry

    q6 = entry.queries()["tpch_q6"](spark, "/root/testdata/sf0.001")
    plan = q6._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :].split("ReadSchema:")[0]
    # real predicates (not just IsNotNull) reached the parquet reader
    assert "PushedFilters: [IsNotNull" in scan, scan
    assert "GreaterThanOrEqual(l_shipda" in scan or "GreaterThanOrEqual(l_disc" in scan, scan
    read_schema = plan[plan.index("ReadSchema:") :].splitlines()[0]
    # only the four referenced columns are read
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read_schema, read_schema
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema, read_schema

    # crop (#19): coordinate range predicates push down on the voxel path too
    crop = entry.queries()["crop"](spark, "/root/testdata/sf0.001")
    cplan = crop._jdf.queryExecution().executedPlan().toString()
    cscan = cplan[cplan.index("FileScan") :].split("ReadSchema:")[0]
    assert "GreaterThan" in cscan or "LessThan" in cscan, cscan


def test_salted_join_matches_plain_join(spark):
    """plans.skew.salted_join: hybrid hot-key salting must reproduce the
    plain join exactly (inner and left), and the salted plan must spread a
    hot key across multiple shuffle partitions."""
    import pandas as pd
    from pyspark.sql import functions as F

    from imops_spark.plans import hot_keys_df, salted_join

    # 10k fact rows, 90% on key 7 (pathological skew), dim misses key 3
    fact = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [7 if i % 10 else (i // 10) % 5 for i in range(10000)],
                "x": list(range(10000)),
            }
        )
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [0, 1, 2, 4, 7], "name": ["a", "b", "c", "e", "hot"]})
    )
    hot = hot_keys_df(fact, ["k"], min_rows=1000)
    assert [r["k"] for r in hot.collect()] == [7]

    for how in ("inner", "left"):
        exp = sorted(
            (r["k"], r["x"], r["name"]) for r in fact.join(dim, "k", how).collect()
        )
        got_hybrid = sorted(
            (r["k"], r["x"], r["name"])
            for r in salted_join(fact, dim, ["k"], num_salts=8, how=how, hot=hot).collect()
        )
        got_full = sorted(
            (r["k"], r["x"], r["name"])
            for r in salted_join(fact, dim, ["k"], num_salts=8, how=how).collect()
        )
        assert got_hybrid == exp and got_full == exp

    # the salt really fans the hot key out: >1 distinct salt on key 7
    salted = fact.withColumn(
        "s", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8))
    )
    n_salts = salted.filter("k = 7").select("s").distinct().count()
    assert n_salts > 1


def test_zorder_layout_prunes_compact_box(spark, tmp_path):
    """write_voxels(layout='zorder'): a compact multi-axis box predicate must
    intersect a much smaller fraction of parquet row groups than under the
    row-major layout (where the box's rows scatter across every group of the
    leading-coordinate slices), while decoding identical data."""
    import glob

    import numpy as np
    import pyarrow.parquet as papq

    from imops_spark.sources.parquet import write_voxels
    from imops_spark.tensor_io import decode_volume, encode_volume, tensor_frame_from_df

    rng = np.random.default_rng(11)
    arr = rng.normal(size=(32, 32, 32))
    tf = encode_volume(spark, arr)
    paths = {}
    for layout in ("rowmajor", "zorder"):
        p = str(tmp_path / layout)
        write_voxels(tf, p, layout=layout, **{"parquet.block.size": 16384})
        paths[layout] = p

    def groups_intersecting(path, box):
        n_hit = n_tot = 0
        for f in glob.glob(f"{path}/*.parquet"):
            pf = papq.ParquetFile(f)
            idx = {c: pf.schema_arrow.names.index(c) for c in box}
            for g in range(pf.num_row_groups):
                md = pf.metadata.row_group(g)
                n_tot += 1
                if all(
                    md.column(idx[c]).statistics.min <= hi
                    and md.column(idx[c]).statistics.max >= lo
                    for c, (lo, hi) in box.items()
                ):
                    n_hit += 1
        return n_hit, n_tot

    # compact 8^3 corner box: in z-order its 512 rows are CONTIGUOUS in the
    # morton key, so they land in O(1) row groups; row-major spreads them
    # across every group of the first 8 i0-slices
    box = {"i0": (0, 7), "i1": (0, 7), "i2": (0, 7)}
    rm_hit, rm_tot = groups_intersecting(paths["rowmajor"], box)
    zo_hit, zo_tot = groups_intersecting(paths["zorder"], box)
    assert rm_tot > 4 and zo_tot > 4  # the block-size option really split groups
    assert zo_hit < zo_tot
    assert zo_hit / zo_tot < 0.5 * (rm_hit / rm_tot)

    # identical logical content in both layouts
    for layout in ("rowmajor", "zorder"):
        back = tensor_frame_from_df(spark.read.parquet(paths[layout]))
        np.testing.assert_array_equal(decode_volume(back), arr)


def test_time_partitioned_events_prune_directories(spark, tmp_path):
    """write_time_partitioned: a date-range filter must read ONLY the
    matching partition directories (file-level pruning, visible in
    inputFiles), the partition value must be session-timezone-independent,
    and the read-back rows must round-trip exactly."""
    from pyspark.sql import functions as F

    from imops_spark.functions.events import load_events
    from imops_spark.sources.parquet import write_time_partitioned

    ev = load_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "ts_sec", "user_id", "event_type", "value"
    )
    p = str(tmp_path / "ev_by_day")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")  # UTC+14
        write_time_partitioned(ev, p)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    back = spark.read.parquet(p)
    n_days = back.select("event_date").distinct().count()
    assert n_days > 5

    one_day = [r["event_date"] for r in back.select("event_date").distinct().limit(1).collect()][0]
    # tz-independent partition value: must equal pure UTC epoch-day arithmetic
    import datetime

    sample = back.filter(F.col("event_date") == one_day).select("ts_sec").first()
    assert (
        datetime.datetime(1970, 1, 1)
        + datetime.timedelta(days=sample["ts_sec"] // 86400)
    ).strftime("%Y-%m-%d") == str(one_day)

    filtered = back.filter(F.col("event_date") == one_day)
    # the filter must become a PARTITION filter (directory pruning before
    # any footer read), not a pushed data filter
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    exp_day = ev.filter((F.col("ts_sec") / 86400).cast("int") == sample["ts_sec"] // 86400).count()
    assert filtered.count() == exp_day > 0

    # round trip: the partition column re-derives ts content exactly
    exp = {tuple(r) for r in ev.collect()}
    got = {
        tuple(r)
        for r in back.select("event_id", "ts_sec", "user_id", "event_type", "value").collect()
    }
    assert got == exp


def test_upsert_time_partitioned_replaces_only_touched_partitions(spark, tmp_path):
    """upsert_time_partitioned: re-writing one day must leave every other
    partition's FILES untouched (same names, same bytes — the atomicity
    contract concurrent readers depend on), replace the touched day's
    content, and restore the session's partitionOverwriteMode."""
    import os

    from pyspark.sql import functions as F

    from imops_spark.sources.parquet import (
        upsert_time_partitioned,
        write_time_partitioned,
    )

    ev = spark.range(300).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3 * 86400 + F.col("id")).alias("ts_sec"),
        (F.col("id").cast("double") * 0.5).alias("value"),
    )
    p = str(tmp_path / "upsert_days")
    write_time_partitioned(ev, p)

    def day_files(day):
        d = os.path.join(p, f"event_date={day}")
        # file NAMES carry the writer's task UUIDs, so an untouched
        # partition keeps the exact same name->size map
        return {
            f: os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        }

    day0_before = day_files("1970-01-01")
    day2_before = day_files("1970-01-03")

    # backfill day 1 (1970-01-02) with corrected values
    fix = spark.range(100).select(
        (F.col("id") + 1000).alias("event_id"),
        (F.lit(86400) + F.col("id")).alias("ts_sec"),
        F.lit(9.75).alias("value"),
    )
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC"
    )
    upsert_time_partitioned(fix, p)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        == prev_mode
    )

    assert day_files("1970-01-01") == day0_before
    assert day_files("1970-01-03") == day2_before
    back = spark.read.parquet(p)
    day1 = back.filter(F.col("event_date") == "1970-01-02")
    assert day1.count() == 100
    assert {r["value"] for r in day1.collect()} == {9.75}
    assert back.count() == 200 + 100  # days 0 and 2 intact, day 1 replaced


def test_compact_partitions_merges_small_files(spark, tmp_path):
    """compact_partitions: four append batches leave >= 4 files per day;
    compaction with a large file target must rewrite each day to ONE file,
    preserve the rows exactly, report before/after counts, and be an
    idempotent no-op when re-run."""
    import os

    from pyspark.sql import functions as F

    from imops_spark.sources.parquet import compact_partitions, write_time_partitioned

    p = str(tmp_path / "compact_days")
    for batch in range(4):
        ev = spark.range(50).select(
            (F.col("id") + batch * 1000).alias("event_id"),
            (F.col("id") % 2 * 86400 + F.col("id")).alias("ts_sec"),
            F.col("id").cast("double").alias("value"),
        )
        write_time_partitioned(ev, p, mode="append")

    def n_files(day):
        d = os.path.join(p, f"event_date={day}")
        return len([f for f in os.listdir(d) if not f.startswith((".", "_"))])

    assert n_files("1970-01-01") >= 4 and n_files("1970-01-02") >= 4
    before = sorted(
        tuple(r) for r in spark.read.parquet(p).select("event_id", "ts_sec", "value").collect()
    )

    report = compact_partitions(spark, p, target_file_bytes=1 << 30)
    assert set(report) == {"1970-01-01", "1970-01-02"}
    for day, stats in report.items():
        assert stats["files_before"] >= 4 and stats["files_after"] == 1, (day, stats)
        assert n_files(day) == 1

    after = sorted(
        tuple(r) for r in spark.read.parquet(p).select("event_id", "ts_sec", "value").collect()
    )
    assert after == before

    # already compact -> nothing rewritten
    assert compact_partitions(spark, p, target_file_bytes=1 << 30) == {}

    # scoped run: only the named partition is considered
    for batch in range(2):
        ev = spark.range(20).select(
            (F.col("id") + 5000 + batch * 100).alias("event_id"),
            F.col("id").alias("ts_sec"),
            F.lit(1.0).alias("value"),
        )
        write_time_partitioned(ev, p, mode="append")
    report = compact_partitions(
        spark, p, target_file_bytes=1 << 30, partitions=["1970-01-02"]
    )
    assert report == {}  # the new small files are all in 1970-01-01
    report = compact_partitions(
        spark, p, target_file_bytes=1 << 30, partitions=["1970-01-01"]
    )
    assert set(report) == {"1970-01-01"} and n_files("1970-01-01") == 1


def test_compact_partitions_deletes_zero_row_debris(spark, tmp_path):
    """A partition holding only footer-only (0-row) parquet files cannot be
    fixed by a dynamic overwrite (an empty frame touches nothing) — the
    files are deleted outright, and the run converges instead of
    'compacting' the same debris forever."""
    import os

    from pyspark.sql import functions as F

    from imops_spark.sources.parquet import compact_partitions, write_time_partitioned

    p = str(tmp_path / "debris")
    ev = spark.range(10).select(
        F.col("id").alias("event_id"), F.col("id").alias("ts_sec"), F.lit(1.0).alias("value")
    )
    write_time_partitioned(ev, p)
    # append two 0-row batches -> footer-only files in the same partition
    empty = ev.filter("event_id < 0")
    for _ in range(2):
        write_time_partitioned(empty.union(empty), p, mode="append")

    d = os.path.join(p, "event_date=1970-01-01")

    def n_files():
        return len([f for f in os.listdir(d) if not f.startswith((".", "_"))])

    # the day partition has the real file + debris (0-row writes may or may
    # not emit files depending on partitioning; force debris explicitly)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(3):
        pq.write_table(
            pa.table({"event_id": pa.array([], pa.int64()),
                      "ts_sec": pa.array([], pa.int64()),
                      "value": pa.array([], pa.float64())}),
            os.path.join(d, f"debris-{i}.parquet"),
        )
    assert n_files() >= 4
    report = compact_partitions(spark, p, target_file_bytes=1 << 30)
    assert report["1970-01-01"]["files_after"] == 1
    assert n_files() == 1
    back = spark.read.parquet(p)
    assert back.count() == 10  # every real row survived
    assert compact_partitions(spark, p, target_file_bytes=1 << 30) == {}  # converged


def test_compact_partitions_crash_recovery(spark, tmp_path):
    """Staged-swap durability: a driver crash at ANY point of the swap must
    never lose rows.  Simulates the three crash windows by reconstructing
    their on-disk states and re-running compact_partitions (whose recovery
    preamble rolls back before the manifest commit point and forward after
    it)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from imops_spark.sources.parquet import compact_partitions, write_time_partitioned

    def mk_table(p):
        for batch in range(3):
            ev = spark.range(40).select(
                (F.col("id") + batch * 1000).alias("event_id"),
                F.col("id").alias("ts_sec"),
                F.col("id").cast("double").alias("value"),
            )
            write_time_partitioned(ev, p, mode="append")
        return sorted(
            tuple(r)
            for r in spark.read.parquet(p).select("event_id", "ts_sec", "value").collect()
        )

    def rows(p):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(p).select("event_id", "ts_sec", "value").collect()
        )

    part = "event_date=1970-01-01"

    # -- window A: crash before the commit point (staged write died: staged
    #    data present, no _MANIFEST) -> roll back, then compact normally
    p = str(tmp_path / "crash_precommit")
    before = mk_table(p)
    stage = os.path.join(p, ".compact_staging", part)
    os.makedirs(stage)
    with open(os.path.join(stage, "part-halfwritten.parquet"), "wb") as f:
        f.write(b"garbage")  # incomplete staged output, no manifest
    report = compact_partitions(spark, p, target_file_bytes=1 << 30)
    assert rows(p) == before
    assert report[part.split("=")[1]]["files_after"] == 1
    assert not os.path.exists(os.path.join(p, ".compact_staging"))

    # -- window B: crash right after the commit point (staged copy complete
    #    + _MANIFEST written, swap not started) -> roll FORWARD
    p = str(tmp_path / "crash_committed")
    before = mk_table(p)
    pdir = os.path.join(p, part)
    stage = os.path.join(p, ".compact_staging", part)
    # build a committed staging dir: a real compacted copy of the partition
    spark.read.parquet(pdir).repartition(1).write.mode("overwrite").parquet(stage)
    staged = [f for f in os.listdir(stage) if not f.startswith((".", "_"))]
    with open(os.path.join(stage, "_MANIFEST"), "w") as f:
        f.write("\n".join(staged))
    # partitions=[] plans no new work — isolates the recovery preamble
    assert compact_partitions(spark, p, target_file_bytes=1 << 30, partitions=[]) == {}
    assert rows(p) == before
    live = [f for f in os.listdir(pdir) if not f.startswith((".", "_"))]
    assert live == staged  # the staged generation replaced the originals
    assert not os.path.exists(os.path.join(p, ".compact_staging"))

    # -- window C: crash mid-swap (originals hidden, one staged file moved
    #    in, manifest still present) -> roll forward finishes the swap
    p = str(tmp_path / "crash_midswap")
    before = mk_table(p)
    pdir = os.path.join(p, part)
    stage = os.path.join(p, ".compact_staging", part)
    spark.read.parquet(pdir).repartition(2).write.mode("overwrite").parquet(stage)
    staged = sorted(f for f in os.listdir(stage) if not f.startswith((".", "_")))
    assert len(staged) == 2
    with open(os.path.join(stage, "_MANIFEST"), "w") as f:
        f.write("\n".join(staged))
    # hide the originals, move ONE staged file in, "crash"
    for f in list(os.listdir(pdir)):
        if not f.startswith((".", "_")):
            os.rename(os.path.join(pdir, f), os.path.join(pdir, ".orig-" + f))
    os.rename(os.path.join(stage, staged[0]), os.path.join(pdir, staged[0]))
    assert compact_partitions(spark, p, target_file_bytes=1 << 30, partitions=[]) == {}
    assert rows(p) == before
    live = sorted(
        f for f in os.listdir(pdir) if not f.startswith((".", "_"))
    )
    assert live == staged  # both staged files live, originals gone
    assert not any(f.startswith(".orig-") for f in os.listdir(pdir))
    assert not os.path.exists(os.path.join(p, ".compact_staging"))
    # a full run then compacts the recovered partition down to one file
    report = compact_partitions(spark, p, target_file_bytes=1 << 30)
    assert rows(p) == before
    assert report["1970-01-01"]["files_after"] == 1


def test_compact_partitions_crash_exhaustive(spark, tmp_path):
    """Durability sweep: crash after EVERY k-th filesystem mutation of the
    swap+cleanup sequence (rename/delete/create), then run recovery.  For
    all k, the table's rows must be exactly preserved — the staged-swap
    protocol's core claim is that no single crash point can lose data."""
    import os

    from pyspark.sql import functions as F

    from imops_spark.sources.parquet import (
        _cleanup_stage,
        _swap_in_staged,
        _write_manifest,
        compact_partitions,
        write_time_partitioned,
    )

    class CrashError(Exception):
        pass

    class CrashingFS:
        """Delegating proxy around the Hadoop FS that raises after a budget
        of MUTATING calls (listStatus/exists are free: crashes happen on
        state changes, reads just advance the schedule)."""

        def __init__(self, fs, budget):
            self._fs = fs
            self._budget = budget

        def __getattr__(self, name):
            real = getattr(self._fs, name)
            if name not in ("rename", "delete", "create"):
                return real

            def guarded(*a, **kw):
                if self._budget <= 0:
                    raise CrashError(name)
                self._budget -= 1
                return real(*a, **kw)

            return guarded

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    part = "event_date=1970-01-01"

    def jvm_fs(p):
        return Path(p).getFileSystem(hconf)

    def build(p):
        for batch in range(3):
            ev = spark.range(30).select(
                (F.col("id") + batch * 1000).alias("event_id"),
                F.col("id").alias("ts_sec"),
                F.col("id").cast("double").alias("value"),
            )
            write_time_partitioned(ev, p, mode="append")
        return sorted(
            tuple(r)
            for r in spark.read.parquet(p).select("event_id", "ts_sec", "value").collect()
        )

    def stage_copy(p):
        # staged parquet only — the manifest write itself is part of the
        # crash sweep below (its non-atomic first implementation had a
        # visible-empty-manifest loss window a review caught)
        stage = os.path.join(p, ".compact_staging", part)
        spark.read.parquet(os.path.join(p, part)).repartition(2).write.mode(
            "overwrite"
        ).parquet(stage)
        return stage

    k = 0
    while True:
        p = str(tmp_path / f"crash_k{k}")
        before = build(p)
        stage = stage_copy(p)
        fs = jvm_fs(p)
        crasher = CrashingFS(fs, k)
        jdir, jstage = Path(p, part), Path(stage)
        crashed = False
        try:
            _write_manifest(crasher, Path, jstage)
            _swap_in_staged(jvm, crasher, Path, jdir, jstage)
            _cleanup_stage(crasher, Path, jstage)
        except CrashError:
            crashed = True
        # recovery: a fresh compact_partitions run resolves the debris
        compact_partitions(spark, p, target_file_bytes=1 << 30, partitions=[])
        after = sorted(
            tuple(r)
            for r in spark.read.parquet(p).select("event_id", "ts_sec", "value").collect()
        )
        assert after == before, f"row loss after crash at mutation {k}"
        assert not os.path.exists(os.path.join(p, ".compact_staging")), k
        d = os.path.join(p, part)
        assert not any(f.startswith(".orig-") for f in os.listdir(d)), k
        if not crashed:
            break  # k exceeded the total mutation count: full sweep done
        k += 1
    assert k >= 5, f"sweep only covered {k} mutations — protocol changed?"


def test_event_date_pre1970_floor_semantics(spark):
    """Pre-1970 timestamps must land in their own day/hour partition:
    cast-truncation + sign-following % put ts_sec=-3600 in
    '1970-01-01' hour '-1'; floor + pmod give 1969-12-31 hour 23 —
    the documented UTC integer arithmetic that keeps two writers from
    shredding the layout on historical data."""
    from pyspark.sql import functions as F

    from imops_spark.sources.parquet import _event_date_expr

    df = spark.createDataFrame(
        [(-3600,), (-86400,), (-1,), (0,), (3600,)], "ts_sec long"
    )
    got = {
        r["ts_sec"]: (r["d"], r["h"])
        for r in df.select(
            "ts_sec",
            _event_date_expr("ts_sec", "day").alias("d"),
            _event_date_expr("ts_sec", "hour").alias("h"),
        ).collect()
    }
    assert got[-3600] == ("1969-12-31", "1969-12-31-23")
    assert got[-86400] == ("1969-12-31", "1969-12-31-00")
    assert got[-1] == ("1969-12-31", "1969-12-31-23")
    assert got[0] == ("1970-01-01", "1970-01-01-00")
    assert got[3600] == ("1970-01-01", "1970-01-01-01")


# ---------------------------------------------------------------------------
# sources.jsonl
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    """write_jsonl -> read_jsonl is lossless for the hard string content
    JSONL exists to carry: embedded newlines/tabs (escaped inside one
    line, so the format stays line-delimited), multi-byte unicode, null
    fields, and bigint-range integers."""
    from imops_spark.sources.jsonl import read_jsonl, write_jsonl

    rows = [
        (1, "line1\nline2\ttab \"quoted\" \\backslash", "en", None, 2**62),
        (2, None, "fr", "crawl", None),
        (3, "héllo ≈ wörld — 多字节", None, "api", -5),
    ]
    ddl = "doc_id long, text string, lang string, source string, n_chars long"
    df = spark.createDataFrame(rows, ddl)
    p = str(tmp_path / "out")
    write_jsonl(df, p, mode="overwrite")
    back = read_jsonl(spark, p, ddl)
    assert sorted(map(tuple, back.collect())) == sorted(rows)

    # gzip + fixed file count roundtrip (non-splittable but smaller)
    pz = str(tmp_path / "outgz")
    write_jsonl(df, pz, mode="overwrite", compression="gzip", files=1)
    import glob

    assert len(glob.glob(pz + "/part-*.json.gz")) == 1
    assert sorted(map(tuple, read_jsonl(spark, pz, ddl).collect())) == sorted(rows)


def test_jsonl_corrupt_modes(spark, tmp_path):
    """on_corrupt='fail' raises on the first malformed line; 'drop'
    discards it; 'keep' parses good rows and carries a _corrupt_record
    column; corrupt_lines_df quarantines exactly the malformed raw lines
    (a VALID all-null JSON object is not malformed)."""
    import pytest as _pytest

    from imops_spark.sources.jsonl import corrupt_lines_df, read_jsonl

    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write(
            '{"doc_id": 1, "text": "ok"}\n'
            "NOT JSON AT ALL\n"
            '{"doc_id": 3, "text": "fine"}\n'
            '{"doc_id": null, "text": null}\n'
        )
    ddl = "doc_id long, text string"

    with _pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_jsonl(spark, p, ddl, on_corrupt="fail").collect()

    assert read_jsonl(spark, p, ddl, on_corrupt="drop").count() == 3

    keep = read_jsonl(spark, p, ddl, on_corrupt="keep")
    assert "_corrupt_record" in keep.columns
    good = sorted(
        r["doc_id"] for r in keep.collect() if r["doc_id"] is not None
    )
    assert good == [1, 3]

    quarantined = [r["raw"] for r in corrupt_lines_df(spark, p, ddl).collect()]
    assert quarantined == ["NOT JSON AT ALL"]


def test_jsonl_guards(spark, tmp_path):
    import pytest as _pytest

    from imops_spark.sources.jsonl import corrupt_lines_df, read_jsonl

    p = str(tmp_path / "x.jsonl")
    open(p, "w").write('{"a": 1}\n')
    with _pytest.raises(ValueError, match="on_corrupt"):
        read_jsonl(spark, p, "a long", on_corrupt="ignore")
    with _pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, p, "a long, _corrupt_record string", on_corrupt="keep")
    with _pytest.raises(ValueError, match="_corrupt_record"):
        corrupt_lines_df(spark, p, "a long, _corrupt_record string")


def test_jsonl_stream_matches_batch(spark, tmp_path):
    """stream_jsonl over a directory of jsonl files drains (availableNow,
    one file per micro-batch) to exactly the batch reader's rows; keep
    mode carries the corrupt column in streaming too."""
    from imops_spark.sources.jsonl import read_jsonl, stream_jsonl
    from imops_spark.streaming.events import run_stream_to_memory

    d = tmp_path / "land"
    d.mkdir()
    (d / "a.jsonl").write_text('{"doc_id": 1, "text": "x"}\n{"doc_id": 2, "text": "y"}\n')
    (d / "b.jsonl").write_text('{"doc_id": 3, "text": "z"}\n')
    ddl = "doc_id long, text string"
    drained = run_stream_to_memory(
        stream_jsonl(spark, str(d), ddl, max_files_per_trigger=1),
        "jsonl_stream_test",
        spark,
        mode="append",
    )
    assert sorted(map(tuple, drained.collect())) == sorted(
        map(tuple, read_jsonl(spark, str(d), ddl).collect())
    )

    (d / "c.jsonl").write_text("BROKEN\n")
    keep = run_stream_to_memory(
        stream_jsonl(spark, str(d), ddl, on_corrupt="keep"),
        "jsonl_stream_keep_test",
        spark,
        mode="append",
    )
    assert "_corrupt_record" in keep.columns
    assert sorted(r["doc_id"] for r in keep.collect() if r["doc_id"] is not None) == [1, 2, 3]


def test_jsonl_does_not_mutate_caller_schema(spark, tmp_path):
    """StructType.add mutates in place; the readers must copy — a second
    keep-mode read with the SAME schema object used to raise 'already
    contains _corrupt_record' (round-8c review catch)."""
    from pyspark.sql import types as T

    from imops_spark.sources.jsonl import read_jsonl, stream_jsonl

    p = str(tmp_path / "x.jsonl")
    open(p, "w").write('{"a": 1}\n')
    s = T.StructType([T.StructField("a", T.LongType())])
    for _ in range(2):  # second use is the regression
        assert read_jsonl(spark, p, s, on_corrupt="keep").count() == 1
        stream_jsonl(spark, p, s, on_corrupt="keep")  # builds without raise
    assert s.fieldNames() == ["a"]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_files_per_trigger"):
        stream_jsonl(spark, p, s, max_files_per_trigger=0)
    from imops_spark.sources.jsonl import write_jsonl
    with _pytest.raises(ValueError, match="files"):
        write_jsonl(spark.range(1), str(tmp_path / "y"), files=0)


def test_warc_roundtrip(spark, tmp_path):
    """write_warc -> read_warc is lossless for UTF-8 text payloads: uri,
    payload bytes, octet-exact Content-Length, deterministic record ids
    (re-export byte-identical), multi-byte framing correct."""
    from imops_spark.sources.warc import read_warc, write_warc

    rows = [
        (1, "http://ex.org/a", "hello world"),
        (2, "http://ex.org/b", "naïve café 東京 — multi-byte framing"),
        (3, "http://ex.org/c", "two\nlines and a \r carriage"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, target_uri string, payload string"
    )
    p = str(tmp_path / "w")
    write_warc(docs, p, files=2)
    back = read_warc(spark, p)
    got = {
        r["target_uri"]: (
            bytes(r["payload"]).decode(),
            r["content_length"],
            r["record_id"],
            r["record_type"],
        )
        for r in back.collect()
    }
    assert set(got) == {u for _, u, _t in rows}
    for _, u, t in rows:
        text, cl, rid, rt = got[u]
        assert text == t
        assert cl == len(t.encode())
        assert rid.startswith("<urn:uuid:") and rid.endswith(">")
        assert rt == "response"
    # deterministic re-export
    p2 = str(tmp_path / "w2")
    write_warc(docs, p2, files=2)
    back2 = read_warc(spark, p2)
    assert sorted(map(tuple, back.drop("warc_file").collect())) == sorted(
        map(tuple, back2.drop("warc_file").collect())
    )


def test_warc_record_type_filter(spark, tmp_path):
    """record_types filters case-insensitively inside the parser; None
    keeps everything."""
    from imops_spark.sources.warc import read_warc, write_warc

    docs = spark.createDataFrame(
        [("http://ex.org/a", "x")], "target_uri string, payload string"
    )
    p1, p2 = str(tmp_path / "resp"), str(tmp_path / "meta")
    write_warc(docs, p1, files=1)
    write_warc(docs, p2, record_type="metadata", files=1)
    assert read_warc(spark, p1).count() == 1
    assert read_warc(spark, p2).count() == 0  # default keeps response only
    assert read_warc(spark, p2, record_types=("METADATA",)).count() == 1
    assert read_warc(spark, p2, record_types=None).count() == 1


def test_warc_corrupt_modes(spark, tmp_path):
    """A garbage prefix before a valid record: 'fail' raises with file +
    offset; 'drop' resyncs on the next record head and parses it."""
    import pytest as _pytest

    from imops_spark.sources.warc import read_warc

    payload = b"ok payload"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Target-URI: http://ex.org/v\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    d = tmp_path / "c"
    d.mkdir()
    (d / "bad.warc").write_bytes(b"garbage bytes here\r\n" + rec)
    with _pytest.raises(Exception, match="malformed WARC"):
        read_warc(spark, str(d)).collect()
    got = read_warc(spark, str(d), on_corrupt="drop").collect()
    assert len(got) == 1 and bytes(got[0]["payload"]) == payload
    # truncated Content-Length (block runs past EOF): fail raises, drop
    # yields nothing
    (d / "bad.warc").write_bytes(
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort"
    )
    with _pytest.raises(Exception, match="Content-Length"):
        read_warc(spark, str(d)).collect()
    assert read_warc(spark, str(d), on_corrupt="drop").count() == 0


def test_warc_guards(spark, tmp_path):
    import pytest as _pytest

    from imops_spark.sources.warc import read_warc, write_warc

    with _pytest.raises(ValueError, match="on_corrupt"):
        read_warc(spark, str(tmp_path), on_corrupt="keep")
    docs = spark.createDataFrame(
        [("u", "p")], "target_uri string, payload string"
    )
    with _pytest.raises(ValueError, match="files"):
        write_warc(docs, str(tmp_path / "x"), files=0)


def _mk_warc_record(uri, body: bytes) -> bytes:
    h = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:x>\r\n"
        f"WARC-Target-URI: {uri}\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode()
    return h + body + b"\r\n\r\n"


def test_warc_gz_member_layouts():
    """The gzip member loop parses all three real-world layouts: one
    member per record (CommonCrawl), whole-file single member (stock
    gzip), and records split ACROSS member boundaries (carry buffer)."""
    import gzip

    from imops_spark.sources.warc import _parse_warc_bytes

    r = [
        _mk_warc_record("http://a", b"hello world"),
        _mk_warc_record("http://b", b"second \xff\x00 binary body"),
        _mk_warc_record("http://c", b"third"),
    ]
    want = [b"hello world", b"second \xff\x00 binary body", b"third"]

    per_member = b"".join(gzip.compress(x) for x in r)
    assert [p for _, p in _parse_warc_bytes(per_member, "f.gz", "fail")] == want

    whole = gzip.compress(b"".join(r))
    assert [p for _, p in _parse_warc_bytes(whole, "f.gz", "fail")] == want

    blob = b"".join(r)
    split = (
        gzip.compress(blob[:20]) + gzip.compress(blob[20:95]) + gzip.compress(blob[95:])
    )
    assert [p for _, p in _parse_warc_bytes(split, "f.gz", "fail")] == want


def test_warc_gz_corrupt_member_policy():
    """A corrupt gzip member raises with the compressed offset under
    'fail' and resyncs to the next gzip magic under 'drop' — a gzipped
    file can never silently yield zero rows (round-9 advice)."""
    import gzip

    import pytest as _pytest

    from imops_spark.sources.warc import _parse_warc_bytes

    r1 = _mk_warc_record("http://a", b"hello world")
    r2 = _mk_warc_record("http://b", b"second body")
    r3 = _mk_warc_record("http://c", b"third")
    m2 = bytearray(gzip.compress(r2))
    m2[12] ^= 0xFF  # corrupt the deflate stream -> zlib error mid-member
    bad = gzip.compress(r1) + bytes(m2) + gzip.compress(r3)
    with _pytest.raises(ValueError, match="corrupt gzip member"):
        list(_parse_warc_bytes(bad, "f.gz", "fail"))
    got = [p for _, p in _parse_warc_bytes(bad, "f.gz", "drop")]
    assert got == [b"hello world", b"third"]

    # truncated final member: fail raises, drop keeps the complete prefix
    trunc = gzip.compress(r1) + gzip.compress(r2)[:-5]
    with _pytest.raises(ValueError, match="corrupt gzip member"):
        list(_parse_warc_bytes(trunc, "f.gz", "fail"))
    assert [p for _, p in _parse_warc_bytes(trunc, "f.gz", "drop")] == [b"hello world"]

    # garbage that STARTS with gzip magic (the round-9 zero-rows trap):
    # drop resyncs to the first real member instead of returning nothing
    junk = b"\x1f\x8b\x00junk" + gzip.compress(r1)
    assert [p for _, p in _parse_warc_bytes(junk, "f.gz", "drop")] == [b"hello world"]
    with _pytest.raises(ValueError, match="corrupt gzip member"):
        list(_parse_warc_bytes(junk, "f.gz", "fail"))


def test_warc_gz_roundtrip_and_repack(spark, tmp_path):
    """write_warc(compression='gzip') and repack_warc_gz both read back
    identical to the bare export; the repacked files are genuinely one
    gzip member per record (CommonCrawl layout)."""
    import glob
    import gzip

    from imops_spark.sources.warc import read_warc, repack_warc_gz, write_warc

    docs = spark.createDataFrame(
        [(f"http://ex.org/{i}", f"body {i} text " * 3) for i in range(20)],
        "target_uri string, payload string",
    )
    bare, gz, mem = (
        str(tmp_path / "bare"),
        str(tmp_path / "gz"),
        str(tmp_path / "member"),
    )
    write_warc(docs, bare, files=2)
    write_warc(docs, gz, files=2, compression="gzip")
    mani = repack_warc_gz(spark, bare, mem)
    assert sum(m[1] for m in mani) == 20

    base = sorted(map(tuple, read_warc(spark, bare).drop("warc_file").collect()))
    assert len(base) == 20
    for p in (gz, mem):
        got = sorted(map(tuple, read_warc(spark, p).drop("warc_file").collect()))
        assert got == base, p

    # member-per-record: magic count in each repacked file == its records
    by_file = {m[0]: m[1] for m in mani}
    for f in glob.glob(mem + "/*.gz"):
        assert open(f, "rb").read().count(b"\x1f\x8b\x08") == by_file[f]
    # codec layout: exactly one member per part file
    for f in glob.glob(gz + "/*.gz"):
        assert open(f, "rb").read().count(b"\x1f\x8b\x08") == 1

    # mixed directory (bare + gz side by side) auto-detects per file
    import shutil

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    bare_part = glob.glob(bare + "/part-*")[0]
    gz_part = glob.glob(mem + "/*.gz")[0]
    shutil.copy(bare_part, mixed / "a.warc")
    shutil.copy(gz_part, mixed / "b.warc.gz")
    exp = gzip.decompress(open(gz_part, "rb").read()).count(
        b"WARC/1.0"
    ) + open(bare_part, "rb").read().count(b"WARC/1.0")
    assert read_warc(spark, str(mixed)).count() == exp > 0


def test_warc_write_compression_guard(spark, tmp_path):
    import pytest as _pytest

    from imops_spark.sources.warc import write_warc

    docs = spark.createDataFrame(
        [("u", "p")], "target_uri string, payload string"
    )
    with _pytest.raises(ValueError, match="compression"):
        write_warc(docs, str(tmp_path / "x"), compression="zstd")


# ---------------------------------------------------------------------------
# HTTP payload extraction (sources.warc.parse_http_payload / parse_http_df /
# read_warc(http=True)) — the layer between "reads CommonCrawl bytes" and
# "usable on CommonCrawl": real response records carry HTTP framing, coded
# bodies, and non-UTF-8 charsets.
# ---------------------------------------------------------------------------


def _http_msg(body: bytes, hdrs, status=b"HTTP/1.1 200 OK") -> bytes:
    head = status + b"\r\n"
    for k, v in hdrs:
        head += k.encode() + b": " + (v.encode() if isinstance(v, str) else v)
        head += b"\r\n"
    return head + b"\r\n" + body


def _chunked(body: bytes, size=7) -> bytes:
    out = b""
    for i in range(0, len(body), size):
        c = body[i : i + size]
        out += format(len(c), "x").encode() + b"\r\n" + c + b"\r\n"
    return out + b"0\r\n\r\n"


def test_http_kernel_framing_and_codings():
    import gzip
    import zlib

    from imops_spark.sources.warc import parse_http_payload

    body = "héllo wörld".encode()
    # plain + duplicate headers comma-join (RFC 7230 3.2.2) + obs-fold
    r = parse_http_payload(
        _http_msg(
            body,
            [
                ("Content-Type", "text/html; charset=UTF-8"),
                ("X-A", "1"),
                ("X-A", "2"),
                ("X-Fold", "a\r\n  b"),
            ],
        )
    )
    assert (r["status"], r["content_type"], r["charset"]) == (
        200,
        "text/html",
        "utf-8",
    )
    assert r["text"] == "héllo wörld" and r["error"] is None
    assert r["headers"]["x-a"] == "1, 2" and r["headers"]["x-fold"] == "a b"

    # gzip, deflate (zlib-wrapped AND raw — the IE-bug pair), chunked,
    # chunked+gzip all reverse losslessly
    gz = gzip.compress(body)
    for payload, hdrs in [
        (gz, [("Content-Encoding", "gzip"), ("Content-Type", "text/html; charset=utf-8")]),
        (zlib.compress(body), [("Content-Encoding", "deflate"), ("Content-Type", "text/html; charset=utf-8")]),
        (
            (lambda c: c.compress(body) + c.flush())(
                zlib.compressobj(wbits=-15)
            ),
            [("Content-Encoding", "deflate"), ("Content-Type", "text/html; charset=utf-8")],
        ),
        (_chunked(body), [("Transfer-Encoding", "chunked"), ("Content-Type", "text/html; charset=utf-8")]),
        (
            _chunked(gz),
            [
                ("Transfer-Encoding", "chunked"),
                ("Content-Encoding", "gzip"),
                ("Content-Type", "text/html; charset=utf-8"),
            ],
        ),
    ]:
        r = parse_http_payload(_http_msg(payload, hdrs))
        assert (r["text"], r["error"]) == ("héllo wörld", None), hdrs

    # bare-LF framing (old crawls)
    r = parse_http_payload(b"HTTP/1.0 404 Not Found\nContent-Type: text/plain\n\nnope")
    assert (r["status"], r["text"], r["error"]) == (404, "nope", None)


def test_http_kernel_charsets():
    from imops_spark.sources.warc import parse_http_payload

    # declared charset in Content-Type
    r = parse_http_payload(
        _http_msg(
            "Привет мир".encode("cp1251"),
            [("Content-Type", "text/html; charset=windows-1251")],
        )
    )
    assert (r["charset"], r["text"]) == ("cp1251", "Привет мир")

    # meta prescan when the header has no charset (both meta forms)
    sj = '<meta charset="shift_jis"><p>こんにちは</p>'.encode("shift_jis")
    r = parse_http_payload(_http_msg(sj, [("Content-Type", "text/html")]))
    assert r["charset"] == "shift_jis" and "こんにちは" in r["text"]
    l1 = (
        '<meta http-equiv="Content-Type" content="text/html; '
        'charset=iso-8859-1"><p>café £5</p>'
    ).encode("latin-1")
    r = parse_http_payload(_http_msg(l1, [("Content-Type", "text/html")]))
    assert r["charset"] == "iso8859-1" and "café £5" in r["text"]

    # header charset BEATS meta; BOM beats both
    both = '<meta charset="shift_jis">abc'.encode("latin-1")
    r = parse_http_payload(
        _http_msg(both, [("Content-Type", "text/html; charset=latin-1")])
    )
    assert r["charset"] == "iso8859-1"
    r = parse_http_payload(
        _http_msg(b"\xef\xbb\xbfabc", [("Content-Type", "text/html; charset=latin-1")])
    )
    assert r["charset"] == "utf-8-sig" and r["text"] == "abc"

    # unknown declared charset: tagged, falls through to default+replace
    r = parse_http_payload(
        _http_msg(b"hello \xff", [("Content-Type", "text/plain; charset=bogus-x")])
    )
    assert r["charset"] == "utf-8" and r["text"] == "hello �"
    assert "unknown-charset:bogus-x" in r["error"]


def test_http_kernel_damage_policy():
    import gzip

    from imops_spark.sources.warc import parse_http_payload

    # truncated gzip (the WARC-Truncated case): partial text + tag
    full = gzip.compress(bytes(range(256)) * 20 + b"tail marker")
    r = parse_http_payload(
        _http_msg(
            full[: len(full) // 2],
            [("Content-Encoding", "gzip"), ("Content-Type", "text/plain; charset=latin-1")],
        )
    )
    assert r["text"] and "tail marker" not in r["text"]
    assert "truncated-gzip" in r["error"]

    # truncated chunked: keeps assembled bytes + tag
    r = parse_http_payload(
        _http_msg(
            b"5\r\nhello\r\n9\r\nwor",
            [("Transfer-Encoding", "chunked"), ("Content-Type", "text/plain; charset=utf-8")],
        )
    )
    assert r["text"].startswith("hello") and "truncated-chunked" in r["error"]

    # unknown content coding (br/zstd — no codec here): NULL text, never
    # mojibake from decoding compressed bytes as prose
    r = parse_http_payload(
        _http_msg(b"\x8b\x01\x80compressed", [("Content-Encoding", "br")])
    )
    assert r["text"] is None and "unknown-content-encoding:br" in r["error"]

    # undecodable gzip (magic but garbage): NULL text + tag
    r = parse_http_payload(
        _http_msg(b"\x1f\x8b\x08 garbage", [("Content-Encoding", "gzip")])
    )
    assert r["text"] is None and "undecodable-gzip" in r["error"]

    # bad status line; not-http bytes
    r = parse_http_payload(b"HTTP/9\r\n\r\nx")
    assert r["status"] is None and "bad-status-line" in r["error"]
    r = parse_http_payload(b"plain bytes", is_http=True)
    assert r["status"] is None and r["error"] == "not-http"
    r = parse_http_payload("bare ünicode".encode(), is_http=False)
    assert r["text"] == "bare ünicode" and r["error"] is None


def test_read_warc_http_and_parse_http_df(spark, tmp_path):
    """read_warc(http=True) splits HTTP framing inside the parser task
    (payload dropped by default, kept on request); parse_http_df applies
    the identical kernel to payloads already in a DataFrame — the two
    routes agree row for row, and non-HTTP records (WET text) decode as
    bare bodies."""
    import gzip

    from imops_spark.sources.warc import parse_http_df, read_warc

    d = tmp_path / "crawl"
    d.mkdir()
    msgs = [
        (
            "http://a",
            _http_msg("héllo Ā".encode(), [("Content-Type", "text/html; charset=utf-8")]),
            "application/http; msgtype=response",
        ),
        (
            "http://b",
            _http_msg(
                gzip.compress("привет".encode("cp1251")),
                [
                    ("Content-Type", "text/html; charset=windows-1251"),
                    ("Content-Encoding", "gzip"),
                ],
            ),
            "application/http; msgtype=response",
        ),
        ("http://c", "WET text é".encode(), "text/plain"),
    ]
    with open(d / "f.warc.gz", "wb") as fh:
        for uri, payload, ctype in msgs:
            fh.write(gzip.compress(_mk_warc_record_ct(uri, payload, ctype)))

    got = {
        r["target_uri"]: r
        for r in read_warc(spark, str(d), http=True).collect()
    }
    assert "payload" not in read_warc(spark, str(d), http=True).columns
    assert got["http://a"]["text"] == "héllo Ā"
    assert got["http://a"]["http_status"] == 200
    assert got["http://b"]["text"] == "привет"
    assert got["http://b"]["charset"] == "cp1251"
    assert got["http://b"]["http_headers"]["content-encoding"] == "gzip"
    assert got["http://c"]["text"] == "WET text é"
    assert got["http://c"]["http_status"] is None

    withp = read_warc(spark, str(d), http=True, keep_payload=True)
    assert "payload" in withp.columns and withp.count() == 3

    two = parse_http_df(read_warc(spark, str(d))).select(
        "target_uri",
        F.col("http.status").alias("http_status"),
        F.col("http.charset").alias("charset"),
        F.col("http.text").alias("text"),
        F.col("http.error").alias("http_error"),
    )
    a = sorted(map(tuple, two.collect()))
    b = sorted(
        map(
            tuple,
            read_warc(spark, str(d), http=True)
            .select("target_uri", "http_status", "charset", "text", "http_error")
            .collect(),
        )
    )
    assert a == b


def _mk_warc_record_ct(uri, body: bytes, ctype: str) -> bytes:
    h = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:x>\r\n"
        f"WARC-Target-URI: {uri}\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return h + body + b"\r\n\r\n"


def test_warc_gz_drop_keeps_split_head_after_corruption():
    """ADVICE r10: in gzip drop mode, a corrupt region used to swallow a
    valid record whose '\\r\\nWARC/' resync marker spans the next member
    boundary — the scan now carries a bounded marker-length tail."""
    import gzip

    from imops_spark.sources.warc import _parse_warc_bytes

    rec = _mk_warc_record("http://ok", b"survivor body")
    # member 1: garbage that ends with the FIRST half of the marker
    # ('\r\n' + the record's first two bytes); member 2: the rest of the
    # record from 'RC/...'.  Only the carried drop-mode tail can save it.
    m1 = b"corrupt garbage with no marker" + b"\r\n" + rec[:2]
    m2 = rec[2:]
    assert rec[:4] == b"WARC" and m2[:3] == b"RC/"
    buf = gzip.compress(m1) + gzip.compress(m2)
    got = [p for _, p in _parse_warc_bytes(buf, "f.gz", "drop")]
    assert got == [b"survivor body"]


def test_stream_warc_matches_batch(spark, tmp_path):
    """stream_warc drains a .warc.gz landing zone (availableNow, one file
    per micro-batch) to exactly the batch read_warc rows — records, and
    with http=True the full framing/coding/charset columns, crossing
    micro-batch boundaries."""
    import gzip

    from imops_spark.sources.warc import read_warc, stream_warc
    from imops_spark.streaming.events import run_stream_to_memory

    d = tmp_path / "landing"
    d.mkdir()
    # two files so the 1-file trigger makes the drain span micro-batches
    for fi in range(2):
        with open(d / f"crawl-{fi}.warc.gz", "wb") as fh:
            for i in range(3):
                body = _http_msg(
                    f"page {fi}-{i} é".encode(),
                    [("Content-Type", "text/html; charset=utf-8")],
                )
                fh.write(
                    gzip.compress(
                        _mk_warc_record_ct(
                            f"http://ex.org/{fi}/{i}",
                            body,
                            "application/http; msgtype=response",
                        )
                    )
                )

    s = stream_warc(spark, str(d), http=True, max_files_per_trigger=1)
    assert s.isStreaming
    got = run_stream_to_memory(s, "warc_stream_t", spark, mode="append")
    cols = ["target_uri", "http_status", "charset", "text", "http_error"]
    a = sorted(map(tuple, got.select(*cols).collect()))
    b = sorted(
        map(tuple, read_warc(spark, str(d), http=True).select(*cols).collect())
    )
    assert a == b and len(a) == 6
    assert {r[1] for r in a} == {200}

    # raw-record streaming (no http split) matches the batch reader too
    s2 = stream_warc(spark, str(d), max_files_per_trigger=1)
    got2 = run_stream_to_memory(s2, "warc_stream_t2", spark, mode="append")
    a2 = sorted(map(tuple, got2.drop("warc_file").collect()))
    b2 = sorted(
        map(tuple, read_warc(spark, str(d)).drop("warc_file").collect())
    )
    assert a2 == b2 and len(a2) == 6

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_files_per_trigger"):
        stream_warc(spark, str(d), max_files_per_trigger=0)
