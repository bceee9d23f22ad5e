"""Differential tests for center_of_mass / label vs pure-numpy oracles.

The reference tests against scipy/skimage (tests/test_measure.py of the
reference); scipy is unavailable in this container, so the oracles are small
exact numpy re-derivations of the same definitions.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from imops_spark import center_of_mass, label


def np_center_of_mass(a):
    idx = np.indices(a.shape)
    m = a.sum()
    return tuple(float((a * idx[k]).sum() / m) for k in range(a.ndim))


def np_label(a, background=0, connectivity=None):
    """Flood-fill CC oracle with skimage numbering (raster first-encounter)."""
    connectivity = connectivity or a.ndim
    offsets = []
    for raw in np.ndindex(*([3] * a.ndim)):
        off = tuple(v - 1 for v in raw)
        nz = sum(1 for v in off if v != 0)
        if 1 <= nz <= connectivity:
            offsets.append(off)
    out = np.zeros(a.shape, dtype=np.int64)
    nxt = 1
    for start in np.ndindex(*a.shape):
        if a[start] == background or out[start]:
            continue
        stack = [start]
        out[start] = nxt
        v = a[start]
        while stack:
            p = stack.pop()
            for off in offsets:
                q = tuple(p[k] + off[k] for k in range(a.ndim))
                if all(0 <= q[k] < a.shape[k] for k in range(a.ndim)):
                    if a[q] == v and not out[q]:
                        out[q] = nxt
                        stack.append(q)
        nxt += 1
    return out, nxt - 1


@pytest.mark.parametrize("shape", [(7,), (5, 6), (4, 5, 6)])
def test_center_of_mass_global(spark, shape):
    a = np.abs(np.random.randn(*shape)) + 0.01
    assert_allclose(center_of_mass(a), np_center_of_mass(a), rtol=1e-6)


def test_center_of_mass_bool(spark):
    a = np.random.binomial(1, 0.5, (6, 7)).astype(bool)
    a[0, 0] = True
    assert_allclose(center_of_mass(a), np_center_of_mass(a.astype(float)), rtol=1e-6)


def test_center_of_mass_labeled(spark):
    a = np.abs(np.random.randn(8, 9)) + 0.01
    labels = np.random.randint(0, 4, size=a.shape)
    index = [1, 2, 3]
    got = center_of_mass(a, labels, index)
    for i, lbl in enumerate(index):
        mask = labels == lbl
        m = a[mask].sum()
        idx = np.nonzero(mask)
        exp = tuple(float((a[mask] * idx[k]).sum() / m) for k in range(a.ndim))
        assert_allclose(got[i], exp, rtol=1e-6)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_label_2d_bool(spark, connectivity):
    a = np.random.binomial(1, 0.4, (12, 13)).astype(bool)
    got = label(a, connectivity=connectivity)
    exp, n = np_label(a.astype(int), connectivity=connectivity)
    assert_array_equal(got.astype(np.int64), exp)


def test_label_multivalue(spark):
    a = np.random.randint(0, 3, size=(10, 11))
    got, num = label(a, return_num=True)
    exp, n = np_label(a)
    assert num == n
    assert_array_equal(got.astype(np.int64), exp)


def test_label_sizes_and_labels(spark):
    a = np.random.binomial(1, 0.4, (9, 9)).astype(bool)
    got, num, labels_arr, sizes = label(a, return_num=True, return_labels=True, return_sizes=True)
    exp, n = np_label(a.astype(int))
    assert num == n
    assert_array_equal(labels_arr, np.arange(1, n + 1))
    exp_sizes = np.array([(exp == i).sum() for i in range(1, n + 1)])
    assert_array_equal(sizes, exp_sizes)


def test_label_background(spark):
    a = np.random.randint(0, 3, size=(8, 8))
    got = label(a, background=2)
    exp, _ = np_label(a, background=2)
    assert_array_equal(got.astype(np.int64), exp)


def test_label_1d(spark):
    a = np.array([1, 1, 0, 1, 0, 0, 1, 1, 1])
    got, num = label(a, return_num=True)
    exp = np.array([1, 1, 0, 2, 0, 0, 3, 3, 3])
    assert num == 3
    assert_array_equal(got.astype(np.int64), exp)


def test_label_connectivity_validation(spark):
    a = np.zeros((4, 4), dtype=bool)
    with pytest.raises(ValueError):
        label(a, connectivity=3)
    with pytest.raises(ValueError):  # 0 must not be coerced to full connectivity
        label(a, connectivity=0)
