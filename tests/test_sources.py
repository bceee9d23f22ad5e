"""Tests for parquet voxel/blob sources and layout-driven pruning."""

import numpy as np
from numpy.testing import assert_array_equal

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
