"""Tests for pointwise numeric ops, isin, box algebra."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from imops_spark import (
    add_margin,
    box_to_shape,
    copy,
    fill_,
    full,
    isin,
    make_box,
    mask_to_box,
    pointwise_add,
    shape_to_box,
)


@pytest.mark.parametrize("dtype", [np.int16, np.int32, np.int64, np.float32, np.float64])
def test_pointwise_add_scalar(spark, dtype):
    a = (np.random.randn(4, 5) * 10).astype(dtype)
    got = pointwise_add(a, dtype(3))
    assert_allclose(got, a + dtype(3), rtol=1e-6)
    assert got.dtype == a.dtype


def test_pointwise_add_array(spark):
    a = np.random.randn(3, 4, 5)
    b = np.random.randn(3, 4, 5)
    assert_allclose(pointwise_add(a, b), a + b, rtol=1e-6)


def test_pointwise_add_shape_mismatch(spark):
    with pytest.raises(ValueError):
        pointwise_add(np.zeros((3, 3)), np.zeros((3, 4)))


def test_pointwise_add_bad_dtype(spark):
    with pytest.raises(ValueError):
        pointwise_add(np.zeros((3, 3), dtype=np.uint8), 1)


def test_pointwise_add_inplace_unsupported(spark):
    with pytest.raises(ValueError):
        pointwise_add(np.zeros((3, 3)), 1, output=np.zeros((3, 3)))


def test_fp16_voxel_roundtrip_and_metadata(spark, tmp_path):
    """fp16 logical dtype (SURVEY §1.4): float32 physical + logical dtype in
    the val column metadata, surviving a parquet round-trip."""
    from imops_spark.tensor_io import decode_volume, encode_volume, tensor_frame_from_df

    a = (np.random.randn(5, 6) * 4).astype(np.float16)
    tf = encode_volume(spark, a)
    assert dict(tf.df.dtypes)["val"] == "float"  # f32 physical, not double
    assert_array_equal(decode_volume(tf), a)
    assert decode_volume(tf).dtype == np.float16

    p = str(tmp_path / "vox.parquet")
    tf.df.write.mode("overwrite").parquet(p)
    tf2 = tensor_frame_from_df(spark.read.parquet(p))
    assert tf2.shape == a.shape and tf2.dtype == np.float16
    assert_array_equal(decode_volume(tf2), a)


def test_tensor_frame_from_df_requires_metadata(spark):
    from imops_spark.tensor_io import tensor_frame_from_df

    bare = spark.createDataFrame([(0, 0, 1.0)], "image_id long, i0 int, val double")
    with pytest.raises(ValueError, match="no tensor metadata"):
        tensor_frame_from_df(bare)


def test_fp16_pointwise_add_matches_half_arithmetic(spark):
    """Parity with the reference's fp16 kernel (numeric.py:182-185 uint16
    bit-view): results must equal numpy's native half arithmetic bit-for-bit
    (a double-precision sum of two fp16 values rounds to the same half)."""
    a = (np.random.randn(4, 5)).astype(np.float16)
    b = (np.random.randn(4, 5)).astype(np.float16)
    got = pointwise_add(a, b)
    assert got.dtype == np.float16
    assert_array_equal(got.view(np.uint16), (a + b).view(np.uint16))


def test_fp16_blob_roundtrip(spark):
    from imops_spark.tensor_io import decode_blobs, encode_blobs

    a = (np.random.randn(3, 4) * 2).astype(np.float16)
    out = decode_blobs(encode_blobs(spark, {5: a}))
    assert out[5].dtype == np.float16
    assert_array_equal(out[5], a)


def test_full(spark):
    got = full((3, 4), 2.5)
    assert_array_equal(got, np.full((3, 4), 2.5))
    got = full(5, 7, dtype=np.int64)
    assert_array_equal(got, np.full(5, 7))
    assert got.dtype == np.int64


def test_fill_and_copy(spark):
    a = np.random.randn(3, 3)
    assert_array_equal(fill_(a.copy(), 1.5), np.full((3, 3), 1.5))
    c = copy(a)
    assert_array_equal(c, a)
    assert c is not a


@pytest.mark.parametrize("dtype", [np.int16, np.int32, np.int64])
def test_isin(spark, dtype):
    a = (2 * np.arange(20)).astype(dtype).reshape(4, 5)
    test = [1, 2, 4, 8]
    assert_array_equal(isin(a, test), np.isin(a, test))


def test_isin_bad_dtype(spark):
    with pytest.raises(ValueError):
        isin(np.zeros((3, 3), dtype=np.float64), [1])


def test_box_algebra():
    box = make_box([[0, 1], [4, 5]])
    assert box_to_shape(box) == (4, 4)
    assert_array_equal(shape_to_box((3, 4)), [[0, 0], [3, 4]])
    assert_array_equal(add_margin(box, 1), [[-1, 0], [5, 6]])
    assert_array_equal(add_margin(box, [1, 2]), [[-1, -1], [5, 7]])
    with pytest.raises(ValueError):
        make_box([[2, 2], [1, 3]])
    # immutability
    with pytest.raises(ValueError):
        box[0][0] = 5


def test_mask_to_box(spark):
    m = np.zeros((8, 9), dtype=bool)
    m[2:5, 3:7] = True
    assert_array_equal(mask_to_box(m), [[2, 3], [5, 7]])
    with pytest.raises(ValueError):
        mask_to_box(np.zeros((3, 3), dtype=bool))
