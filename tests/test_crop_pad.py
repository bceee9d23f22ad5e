"""Differential tests for crop/pad family vs numpy (exact match, reference
tolerances per FIXTURES.md: assert_array_equal)."""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from imops_spark import (
    crop_to_box,
    crop_to_shape,
    make_box,
    pad,
    pad_to_divisible,
    pad_to_shape,
    restore_crop,
)


@pytest.mark.parametrize("shape,new", [((10,), (6,)), ((8, 9), (5, 4)), ((6, 7, 8), (3, 3, 3))])
def test_crop_to_shape_center(spark, shape, new):
    a = np.random.randn(*shape)
    got = crop_to_shape(a, new)
    start = [int((s - n) * 0.5) for s, n in zip(shape, new)]
    exp = a[tuple(slice(st, st + n) for st, n in zip(start, new))]
    assert_array_equal(got, exp)


def test_crop_to_shape_ratio(spark):
    a = np.random.randn(10, 10)
    got = crop_to_shape(a, (6, 6), ratio=0)
    assert_array_equal(got, a[:6, :6])
    got = crop_to_shape(a, (6, 6), ratio=1)
    assert_array_equal(got, a[4:, 4:])


def test_crop_to_shape_axis(spark):
    a = np.random.randn(10, 12)
    got = crop_to_shape(a, 6, axis=1)
    assert_array_equal(got, a[:, 3:9])


def test_crop_to_shape_too_large(spark):
    with pytest.raises(ValueError):
        crop_to_shape(np.zeros((4, 4)), (5, 4))


def test_crop_to_box(spark):
    a = np.random.randn(10, 11)
    box = make_box([[2, 3], [7, 9]])
    assert_array_equal(crop_to_box(a, box), a[2:7, 3:9])


def test_crop_to_box_out_of_bounds_pad(spark):
    a = np.random.randn(5, 5)
    box = make_box([[-1, 0], [6, 5]])
    got = crop_to_box(a, box, padding_values=0)
    exp = np.pad(a, ((1, 1), (0, 0)))
    assert_array_equal(got, exp)


def test_crop_to_box_out_of_bounds_raises(spark):
    with pytest.raises(ValueError):
        crop_to_box(np.zeros((4, 4)), make_box([[0, 0], [5, 4]]))


@pytest.mark.parametrize(
    "shape,padding",
    [((5,), 2), ((4, 5), [1, 2]), ((3, 4), [[1, 2], [0, 3]]), ((3, 4, 5), 1)],
)
def test_pad_matches_numpy(spark, shape, padding):
    a = np.random.randn(*shape)
    got = pad(a, padding)
    p = np.asarray(padding)
    if p.ndim == 0:
        widths = [(int(p), int(p))] * len(shape)
    elif p.ndim == 1:
        widths = [(int(v), int(v)) for v in p]
    else:
        widths = [tuple(map(int, row)) for row in p]
    assert_array_equal(got, np.pad(a, widths))


def test_pad_axis_and_values(spark):
    a = np.random.randn(4, 5)
    got = pad(a, [[1, 1]], axis=-1, padding_values=7.5)
    exp = np.pad(a, ((0, 0), (1, 1)), constant_values=7.5)
    assert_array_equal(got, exp)


def test_pad_callable_values(spark):
    a = np.random.randn(4, 4)
    got = pad(a, 1, padding_values=np.min)
    exp = np.pad(a, 1, constant_values=a.min())
    assert_array_equal(got, exp)


def test_pad_int_dtype(spark):
    a = np.random.randint(-5, 5, size=(4, 5)).astype(np.int64)
    got = pad(a, 2, padding_values=-9)
    exp = np.pad(a, 2, constant_values=-9)
    assert_array_equal(got, exp)
    assert got.dtype == a.dtype


def test_pad_negative_raises(spark):
    with pytest.raises(ValueError):
        pad(np.zeros(3), -1)


def test_pad_to_shape(spark):
    a = np.random.randn(3, 4)
    got = pad_to_shape(a, (7, 8))
    delta = np.array([4, 4])
    start = (delta * 0.5).astype(int)
    exp = np.pad(a, [(start[0], 4 - start[0]), (start[1], 4 - start[1])])
    assert_array_equal(got, exp)
    with pytest.raises(ValueError):
        pad_to_shape(a, (2, 8))


def test_pad_to_divisible(spark):
    a = np.random.randn(2, 3, 4)
    got = pad_to_divisible(a, 6)
    assert got.shape == (6, 6, 6)
    got = pad_to_divisible(a, 3, remainder=1)
    assert got.shape == (4, 4, 4)


def test_restore_crop(spark):
    a = np.random.randn(8, 9)
    box = make_box([[2, 3], [6, 7]])
    crop = a[2:6, 3:7]
    got = restore_crop(crop, box, a.shape)
    exp = np.zeros_like(a)
    exp[2:6, 3:7] = crop
    assert_array_equal(got, exp)
    with pytest.raises(ValueError):
        restore_crop(crop, make_box([[0, 0], [1, 1]]), a.shape)


def test_pad_restore_crop_roundtrip_many_margins(spark):
    """restore_crop inverts pad for arbitrary per-axis margins, and the
    padded border holds exactly the fill value — checked through the real
    engine operators (encode -> plan -> decode), several margin shapes."""
    import numpy as np
    from numpy.testing import assert_array_equal

    from imops_spark import pad, restore_crop
    from imops_spark.utils import build_slices

    rng = np.random.default_rng(3)
    vol = rng.normal(size=(4, 5, 3))
    for lo, hi in [((0, 0, 0), (0, 0, 0)), ((1, 0, 2), (0, 3, 1)), ((2, 2, 2), (2, 2, 2))]:
        padded = pad(vol, np.array(list(zip(lo, hi))), padding_values=7.5)
        assert padded.shape == tuple(s + a + b for s, a, b in zip(vol.shape, lo, hi))
        box = build_slices(list(lo), [l + s for l, s in zip(lo, vol.shape)])
        assert_array_equal(padded[box], vol)
        border = padded.copy()
        border[box] = 7.5
        assert bool(np.all(border == 7.5))
        assert_array_equal(restore_crop(vol, np.array([list(lo), [l + s for l, s in zip(lo, vol.shape)]]), padded.shape, 7.5), padded)
