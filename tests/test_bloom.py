"""Bloom filter primitives (functions/bloom.py) and the bloom-prefiltered
decontamination path (curate.contamination_pairs_bloom_df): the membership
prefilter must be a guaranteed superset, and the prefiltered exact join
must be bit-identical to the exact plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from imops_spark.functions.bloom import (
    bloom_build,
    bloom_filter_df,
    bloom_fpr,
    bloom_from_df,
    bloom_size,
    with_bloom_contains,
)

SF_DIR = "/root/testdata/sf0.001"


def _keys(spark, n=2000, stride=7, offset=3):
    return spark.range(0, n).select((F.col("id") * stride + offset).alias("k"))


def test_no_false_negatives(spark):
    keys = _keys(spark)
    bloom = bloom_build(keys, "k", num_bits=1 << 15, num_hashes=5)
    probed = with_bloom_contains(keys, "k", bloom)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_fpr_envelope(spark):
    """Observed false-positive rate on a disjoint key set stays within 3x
    of the analytic expectation (a loose envelope — the estimate itself is
    the mean of a concentrated distribution)."""
    n, m, k = 1000, 1 << 14, 5
    keys = _keys(spark, n=n)
    bloom = bloom_build(keys, "k", num_bits=m, num_hashes=k)
    # stride-7 keys with offset 3 never hit stride-1 keys >= 100000
    other = spark.range(100_000, 140_000).select(F.col("id").alias("k"))
    observed = bloom_filter_df(other, "k", bloom).count() / 40_000
    expected = bloom_fpr(m, k, n)
    assert observed <= max(3 * expected, 0.01)
    assert observed > 0  # a zero-FP filter of this density means a broken probe


def test_build_matches_numpy_rederivation(spark):
    """The distributed bit_or build equals a driver-side numpy re-derivation
    from the same per-key xxhash64 positions (independent accumulation
    path: explode+groupBy vs np.bitwise_or.reduceat-free loop)."""
    m, k = 1 << 12, 4
    keys = _keys(spark, n=500)
    bloom = bloom_build(keys, "k", num_bits=m, num_hashes=k)
    got = np.array(bloom.df.collect()[0]["bits"], dtype=np.int64)

    pos_cols = [
        F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(m).cast("long")).alias(f"p{i}")
        for i in range(k)
    ]
    rows = keys.select(*pos_cols).collect()
    want = np.zeros(m // 64, dtype=np.uint64)
    for r in rows:
        for i in range(k):
            p = r[i]
            want[p // 64] |= np.uint64(1) << np.uint64(p % 64)
    assert np.array_equal(got.view(np.uint64), want)


def test_null_keys_skipped_and_probe_false(spark):
    keys = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    bloom = bloom_build(keys, "k", num_bits=1 << 10, num_hashes=3)
    probed = with_bloom_contains(keys, "k", bloom)
    rows = {r["k"]: r["might_contain"] for r in probed.collect()}
    assert rows[1] and rows[2]
    assert rows[None] is False


def test_roundtrip_through_parquet(spark, tmp_path):
    keys = _keys(spark, n=300)
    bloom = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=4)
    path = str(tmp_path / "bloom")
    bloom.df.write.parquet(path)
    rehydrated = bloom_from_df(spark.read.parquet(path))
    assert rehydrated.num_bits == 1 << 12 and rehydrated.num_hashes == 4
    probed = with_bloom_contains(keys, "k", rehydrated)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_param_validation(spark):
    keys = _keys(spark, n=10)
    with pytest.raises(ValueError):
        bloom_build(keys, "k", num_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(keys, "k", num_bits=1 << 10, num_hashes=0)
    with pytest.raises(ValueError):
        bloom_size(0)
    with pytest.raises(ValueError):
        bloom_size(10, fpp=1.5)


def test_bloom_size_hits_target_fpr():
    for n, p in [(1000, 1e-2), (60_000, 1e-3), (10**6, 1e-4)]:
        m, k = bloom_size(n, p)
        assert m % 64 == 0
        # the optimum rounds; realized fpr must stay within 2x of target
        assert bloom_fpr(m, k, n) <= 2 * p
        # and the sizing is the textbook optimum within rounding
        assert abs(m - (-n * math.log(p) / math.log(2) ** 2)) <= 64


def test_contamination_bloom_identical_to_exact(spark):
    """The bloom-prefiltered contamination scan returns bit-identical pairs
    to the exact scan — the no-false-negative guarantee composed with the
    exact verify join."""
    from imops_spark.functions.curate import (
        contamination_pairs_bloom_df,
        contamination_pairs_df,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    holdout = docs.filter(F.col("doc_id") % 5 == 0)
    exact = sorted(map(tuple, contamination_pairs_df(train, holdout, min_shared=5).collect()))
    # deliberately undersized filter (high fpr) to stress the verify join
    bloom = sorted(
        map(
            tuple,
            contamination_pairs_bloom_df(
                train, holdout, min_shared=5, num_bits=1 << 12, num_hashes=3
            ).collect(),
        )
    )
    assert exact == bloom and len(exact) > 0


def test_decontaminate_bloom_identical_to_exact(spark):
    from imops_spark.functions.curate import decontaminate_bloom_df, decontaminate_df

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    holdout = docs.filter(F.col("doc_id") % 5 == 0)
    exact = sorted(r["doc_id"] for r in decontaminate_df(train, holdout, min_shared=5).collect())
    blm = sorted(
        r["doc_id"]
        for r in decontaminate_bloom_df(
            train, holdout, min_shared=5, num_bits=1 << 14
        ).collect()
    )
    assert exact == blm
    assert len(exact) < train.count()  # something was actually dropped


def test_probe_plan_has_no_shuffle(spark):
    """The probe side must stay shuffle-free: broadcast of the 1-row bits
    frame, row-local bit tests — no Exchange above the probe scan."""
    keys = _keys(spark, n=100)
    bloom = bloom_build(keys, "k", num_bits=1 << 10, num_hashes=3)
    bits_df = bloom.df.cache()
    bits_df.count()  # materialize so the probe plan below is just the probe
    from imops_spark.functions.bloom import BloomFilter

    cached = BloomFilter(df=bits_df, num_bits=bloom.num_bits, num_hashes=bloom.num_hashes)
    plan = with_bloom_contains(keys, "k", cached)._jdf.queryExecution().executedPlan().toString()
    probe_side = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange" not in probe_side
    bits_df.unpersist()


def _bits(bloom):
    return list(bloom.df.collect()[0]["bits"])


def test_index_roundtrip_equals_build(spark, tmp_path):
    from imops_spark.functions.bloom import bloom_read_index, bloom_write_index

    keys = _keys(spark, n=400)
    path = str(tmp_path / "idx")
    bloom_write_index(keys, "k", path, num_bits=1 << 12, num_hashes=4)
    idx = bloom_read_index(spark, path)
    built = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=4)
    assert _bits(idx) == _bits(built)
    assert (idx.num_bits, idx.num_hashes) == (1 << 12, 4)


def test_index_append_merges_and_guards(spark, tmp_path):
    """Appended generations must merge to the union build; appending with
    different parameters must refuse (the self-describing-storage guard)."""
    import pytest as _pytest

    from imops_spark.functions.bloom import bloom_read_index, bloom_write_index

    a = _keys(spark, n=200, offset=3)
    b = _keys(spark, n=200, offset=100_001)
    path = str(tmp_path / "idx")
    bloom_write_index(a, "k", path, num_bits=1 << 12, num_hashes=4)
    bloom_write_index(b, "k", path, num_bits=1 << 12, num_hashes=4, mode="append")
    merged = bloom_read_index(spark, path)
    union_built = bloom_build(a.union(b), "k", num_bits=1 << 12, num_hashes=4)
    assert _bits(merged) == _bits(union_built)

    with _pytest.raises(ValueError, match="refusing to append"):
        bloom_write_index(b, "k", path, num_bits=1 << 13, num_hashes=4, mode="append")
    with _pytest.raises(ValueError, match="refusing to append"):
        bloom_write_index(b, "k", path, num_bits=1 << 12, num_hashes=3, mode="append")


def test_index_replay_is_idempotent(spark, tmp_path):
    """Appending the SAME input twice must leave the merged bits unchanged —
    the OR-idempotence that gives the streaming maintenance sink
    exactly-once semantics under at-least-once delivery."""
    from imops_spark.functions.bloom import bloom_read_index, bloom_write_index

    keys = _keys(spark, n=300)
    path = str(tmp_path / "idx")
    bloom_write_index(keys, "k", path, num_bits=1 << 12, num_hashes=4)
    once = _bits(bloom_read_index(spark, path))
    bloom_write_index(keys, "k", path, num_bits=1 << 12, num_hashes=4, mode="append")
    twice = _bits(bloom_read_index(spark, path))
    assert once == twice


def test_streaming_maintenance_equals_batch_build(spark, tmp_path):
    """Drain a key stream through the maintenance sink; the persisted index
    must answer exactly like a batch build over the same keys, and a second
    drain of NEW keys must extend it (incremental maintenance)."""
    from pyspark.sql import functions as F

    from imops_spark.functions.bloom import bloom_read_index
    from imops_spark.streaming.curate import start_bloom_index_maintenance

    src1 = str(tmp_path / "in1")
    src2 = str(tmp_path / "in2")
    _keys(spark, n=250).write.parquet(src1)
    _keys(spark, n=250, offset=200_001).write.parquet(src2)
    idx_path = str(tmp_path / "idx")

    schema = "k long"
    q = start_bloom_index_maintenance(
        spark.readStream.schema(schema).parquet(src1),
        "k",
        idx_path,
        num_bits=1 << 12,
        num_hashes=4,
        checkpoint=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    first = bloom_read_index(spark, idx_path)
    want_first = bloom_build(
        spark.read.parquet(src1), "k", num_bits=1 << 12, num_hashes=4
    )
    assert _bits(first) == _bits(want_first)

    q2 = start_bloom_index_maintenance(
        spark.readStream.schema(schema).parquet(src2),
        "k",
        idx_path,
        num_bits=1 << 12,
        num_hashes=4,
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    both = bloom_read_index(spark, idx_path)
    want_both = bloom_build(
        spark.read.parquet(src1).union(spark.read.parquet(src2)),
        "k",
        num_bits=1 << 12,
        num_hashes=4,
    )
    assert _bits(both) == _bits(want_both)
    # the maintained index must also answer membership with no false negatives
    probed = with_bloom_contains(spark.read.parquet(src2), "k", both)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_read_empty_log_says_empty_not_corrupt(spark, tmp_path):
    from imops_spark.functions.bloom import bloom_read_index, bloom_write_index

    path = str(tmp_path / "idx")
    empty = spark.createDataFrame([], "k long")
    bloom_write_index(empty, "k", path, num_bits=1 << 12, num_hashes=4)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="is empty"):
        bloom_read_index(spark, path)


def test_append_guard_does_not_swallow_real_errors(spark, tmp_path):
    """A dataset at the path that is not a bloom log must propagate its
    error, not be treated as 'first write' (which would then corrupt the
    path with mixed schemas)."""
    from pyspark.sql.utils import AnalysisException

    from imops_spark.functions.bloom import bloom_write_index

    path = str(tmp_path / "notbloom")
    spark.range(5).write.parquet(path)  # unrelated schema at the path
    keys = _keys(spark, n=10)
    import pytest as _pytest

    with _pytest.raises(AnalysisException):
        bloom_write_index(keys, "k", path, num_bits=1 << 12, mode="append")


def test_key_type_stamp_rejects_cross_type_probe(spark):
    """xxhash64 is typed: probing a BIGINT-built filter with STRING keys
    silently returns all-false (FALSE NEGATIVES).  The key_type stamp must
    turn that silent corruption into a raise — including after a
    parquet roundtrip and through the persisted index path."""
    from imops_spark.functions.bloom import bloom_read_index, bloom_write_index

    keys = _keys(spark, n=200)
    bloom = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=4)
    assert bloom.key_type == "bigint"
    as_str = keys.select(F.col("k").cast("string").alias("k"))
    with pytest.raises(TypeError, match="built over bigint"):
        with_bloom_contains(as_str, "k", bloom)
    # INT does not share BIGINT's xxhash64 layout (4- vs 8-byte hash):
    # the probe that silently returned all-false before must raise too
    as_int = keys.select(F.col("k").cast("int").alias("k"))
    with pytest.raises(TypeError, match="built over bigint"):
        with_bloom_contains(as_int, "k", bloom)
    # but the measured-identical widths DO collapse: an int-built filter
    # probes fine with smallint keys
    small = spark.range(0, 100).select(F.col("id").cast("int").alias("k"))
    bloom_i = bloom_build(small, "k", num_bits=1 << 12, num_hashes=4)
    assert bloom_i.key_type == "int"
    as_small = small.select(F.col("k").cast("smallint").alias("k"))
    probed = with_bloom_contains(as_small, "k", bloom_i)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_key_type_survives_roundtrip_and_index(spark, tmp_path):
    from imops_spark.functions.bloom import bloom_read_index, bloom_write_index

    keys = _keys(spark, n=200)
    bloom = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=4)
    path = str(tmp_path / "bloom_frame")
    bloom.df.write.parquet(path)
    rehydrated = bloom_from_df(spark.read.parquet(path))
    assert rehydrated.key_type == "bigint"

    idx = str(tmp_path / "bloom_index")
    bloom_write_index(keys, "k", idx, num_bits=1 << 12, num_hashes=4)
    loaded = bloom_read_index(spark, idx)
    assert loaded.key_type == "bigint"
    # appending a different key TYPE must raise like a param mismatch does
    strs = keys.select(F.col("k").cast("string").alias("k"))
    with pytest.raises(ValueError, match="key_type"):
        bloom_write_index(
            strs, "k", idx, num_bits=1 << 12, num_hashes=4, mode="append"
        )


def test_pre_stamp_frames_rehydrate_unenforced(spark, tmp_path):
    """Frames persisted before the key_type stamp existed (no key_type
    column) must still load, with key_type=None and no probe enforcement."""
    keys = _keys(spark, n=100)
    bloom = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=4)
    path = str(tmp_path / "legacy")
    bloom.df.drop("key_type").write.parquet(path)
    legacy = bloom_from_df(spark.read.parquet(path))
    assert legacy.key_type is None
    probed = with_bloom_contains(keys, "k", legacy)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_probe_frame_with_bits_column_raises(spark):
    keys = _keys(spark, n=50).withColumn("bits", F.lit(1))
    bloom = bloom_build(_keys(spark, n=50), "k", num_bits=1 << 12, num_hashes=4)
    with pytest.raises(ValueError, match="'bits' column"):
        with_bloom_contains(keys, "k", bloom)


def test_pre_stamp_log_append_warns_and_migration_enforces(spark, tmp_path):
    """Appending to a pre-stamp LOG must WARN (the append is unenforceable);
    bloom_stamp_index migrates the log once with a declared key type, after
    which cross-type appends RAISE and probes enforce; re-stamping and
    mixed-parameter logs are refused."""
    import warnings

    from imops_spark.functions.bloom import (
        bloom_read_index,
        bloom_stamp_index,
        bloom_write_index,
        bloom_words,
    )

    keys = _keys(spark, n=150)
    path = str(tmp_path / "legacy_log")
    # simulate a pre-stamp log: words + params, no key_type column
    bloom_words(keys, "k", 1 << 12, 4).select(
        "word_idx", "word", F.lit(1 << 12).alias("num_bits"), F.lit(4).alias("num_hashes")
    ).write.parquet(path)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bloom_write_index(
            keys, "k", path, num_bits=1 << 12, num_hashes=4, mode="append"
        )
    assert any("predates the key_type stamp" in str(x.message) for x in w)
    # the unchecked append keeps the legacy shape (no key_type column)
    assert "key_type" not in spark.read.parquet(path).columns

    bloom_stamp_index(spark, path, key_type="bigint")
    stamped = spark.read.parquet(path)
    assert set(stamped.select("key_type").distinct().toPandas()["key_type"]) == {
        "bigint"
    }
    # post-migration: enforcement is live again
    strs = keys.select(F.col("k").cast("string").alias("k"))
    with pytest.raises(ValueError, match="key_type"):
        bloom_write_index(
            strs, "k", path, num_bits=1 << 12, num_hashes=4, mode="append"
        )
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        bloom_write_index(
            keys, "k", path, num_bits=1 << 12, num_hashes=4, mode="append"
        )
    # matching append: no stamp warning (unrelated ResourceWarnings pass)
    assert not any("key_type" in str(x.message) for x in w2)
    loaded = bloom_read_index(spark, path)
    assert loaded.key_type == "bigint"
    probed = with_bloom_contains(keys, "k", loaded)
    assert probed.filter(~F.col("might_contain")).count() == 0
    with pytest.raises(ValueError, match="already key_type-stamped"):
        bloom_stamp_index(spark, path, key_type="bigint")
