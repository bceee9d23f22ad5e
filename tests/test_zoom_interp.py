"""Differential tests for zoom / zoom_to_shape / interp1d vs numpy oracles
that re-derive the reference kernel semantics exactly."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from imops_spark.operators.interp1d import interp1d
from imops_spark.operators.zoom import zoom, zoom_to_shape


def np_zoom(x, scale, order=1, fill_value=0.0):
    """Oracle: direct re-derivation of src/_zoom.pyx semantics."""
    scale = np.broadcast_to(np.asarray(scale, float), (x.ndim,))
    new_shape = tuple(int(round(s * z)) for s, z in zip(x.shape, scale))
    coefs = [
        (x.shape[k] if new_shape[k] == 1 else (x.shape[k] - 1) / (new_shape[k] - 1))
        for k in range(x.ndim)
    ]
    out = np.empty(new_shape, dtype=float if order == 1 else x.dtype)
    for j in np.ndindex(*new_shape):
        c = [j[k] * coefs[k] for k in range(x.ndim)]
        f = [int(np.floor(v)) for v in c]
        if order == 0:
            idx = []
            for k in range(x.ndim):
                frac = c[k] - f[k]
                use_max = frac >= 0.5 and f[k] + 1 < x.shape[k]
                idx.append(f[k] + 1 if use_max else f[k])
            out[j] = x[tuple(idx)]
        else:
            acc = 0.0
            for corner in np.ndindex(*([2] * x.ndim)):
                w = 1.0
                idx = []
                for k in range(x.ndim):
                    frac = c[k] - f[k]
                    w *= frac if corner[k] else 1 - frac
                    idx.append(f[k] + corner[k])
                inb = all(0 <= idx[k] < x.shape[k] for k in range(x.ndim))
                acc += w * (x[tuple(idx)] if inb else fill_value)
            out[j] = acc
    return out


@pytest.mark.parametrize("scale", [2.0, 0.5, 1.7, [1.5, 0.75]])
def test_zoom_linear_2d(spark, scale):
    x = np.random.randn(9, 11)
    assert_allclose(zoom(x, scale), np_zoom(x, scale), rtol=1e-6, atol=1e-12)


def test_zoom_linear_3d(spark):
    x = np.random.randn(5, 6, 7)
    assert_allclose(zoom(x, 1.4), np_zoom(x, 1.4), rtol=1e-6, atol=1e-12)


def test_zoom_nearest(spark):
    x = np.random.randint(0, 100, size=(8, 9)).astype(np.int64)
    got = zoom(x, 1.6, order=0)
    assert got.dtype == x.dtype
    assert_array_equal(got, np_zoom(x, 1.6, order=0))


def test_zoom_nearest_bool(spark):
    x = np.random.binomial(1, 0.5, (7, 7)).astype(bool)
    got = zoom(x, 0.6, order=0)
    assert got.dtype == np.bool_
    assert_array_equal(got, np_zoom(x, 0.6, order=0))


def test_zoom_axis_param(spark):
    x = np.random.randn(6, 8)
    got = zoom(x, 2.0, axis=1)
    assert_allclose(got, np_zoom(x, [1.0, 2.0]), rtol=1e-6, atol=1e-12)


def test_zoom_identity(spark):
    x = np.random.randn(6, 7)
    assert_allclose(zoom(x, 1.0), x, rtol=1e-6)


def test_zoom_bad_order(spark):
    with pytest.raises(ValueError):
        zoom(np.zeros((3, 3)), 2.0, order=7)


# --- spline-order fallback (reference zoom.py:229-251 scipy delegation) ---


def np_spline_coef_dense(x, order):
    """Dense-solve oracle for the recursive prefilter: solve the mirror
    (whole-sample symmetric) B-spline collocation system directly."""
    from imops_spark.kernels import _bspline_kernel

    n = len(x)
    period = 2 * n - 2 if n > 1 else 1
    m = np.zeros((n, n))
    reach = order + 2
    for k in range(n):
        for i in range(k - reach, k + reach + 1):
            w = float(_bspline_kernel(order, np.array([float(k - i)]))[0])
            if w == 0.0:
                continue
            idx = abs(i) % period
            if idx >= n:
                idx = period - idx
            m[k, idx] += w
    return np.linalg.solve(m, x)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_spline_prefilter_matches_dense_solve(order):
    from imops_spark.kernels import _spline_filter1d

    rng = np.random.default_rng(5 + order)
    x = rng.standard_normal(23)
    got = _spline_filter1d(x.copy().reshape(-1, 1), order, 0).ravel()
    exp = np_spline_coef_dense(x, order)
    assert_allclose(got, exp, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_spline_zoom_identity(order):
    """scale=1 must return the input exactly: prefilter + knot evaluation is
    the identity (the interpolation property)."""
    from imops_spark.kernels import spline_zoom_numpy

    rng = np.random.default_rng(order)
    x = rng.standard_normal((9, 11))
    assert_allclose(spline_zoom_numpy(x, 1.0, order=order), x, rtol=1e-9, atol=1e-11)


def test_spline_zoom_linear_data_interior():
    """Cubic spline interpolation reproduces degree<=3 polynomials away from
    the boundary.  The mirror extension puts a slope kink at each edge whose
    ringing decays by |z1|~=0.27 per sample, so exactness holds in the deep
    interior (here >25 samples in: ringing < 1e-14)."""
    from imops_spark.kernels import spline_zoom_numpy

    n = 64
    x = np.arange(n, dtype=np.float64)
    out = spline_zoom_numpy(x, 2.0, order=3)
    exp = np.arange(2 * n) * ((n - 1.0) / (2 * n - 1.0))
    interior = slice(52, 76)
    assert_allclose(out[interior], exp[interior], rtol=1e-12, atol=1e-12)


def test_spline_zoom_order1_matches_fast_kernel():
    from imops_spark.kernels import spline_zoom_numpy, zoom_numpy

    rng = np.random.default_rng(11)
    x = rng.standard_normal((7, 8))
    assert_allclose(
        spline_zoom_numpy(x, 1.7, order=1), zoom_numpy(x, 1.7, order=1), rtol=1e-12
    )


def test_zoom_order3_warns_and_returns(spark):
    """Reference parity: order>=2 warns with the scipy-fallback text and
    returns (the reference degrades gracefully; we used to raise)."""
    x = np.random.default_rng(3).standard_normal((10, 12))
    with pytest.warns(UserWarning, match="Falling back to scipy"):
        got = zoom(x, 2.0, order=3)
    assert got.shape == (20, 24)
    assert got.dtype == x.dtype
    # int input comes back int (scipy writes into an input-dtype output)
    xi = (x * 50).astype(np.int16)
    with pytest.warns(UserWarning, match="Falling back to scipy"):
        gi = zoom(xi, 1.5, order=2)
    assert gi.dtype == np.int16


def test_zoom_5d_falls_back(spark):
    from imops_spark.kernels import spline_zoom_numpy

    x = np.random.default_rng(4).standard_normal((2, 3, 4, 3, 2))
    with pytest.warns(UserWarning, match="Falling back to scipy"):
        got = zoom(x, [1, 1, 1, 1, 2.0], order=1)
    assert got.shape == (2, 3, 4, 3, 4)
    assert_allclose(got, spline_zoom_numpy(x, [1, 1, 1, 1, 2.0], order=1), rtol=1e-12)


def test_zoom_linear_int_warns_and_preserves_dtype(spark):
    """Reference parity: order=1 on int warns (scipy fallback) and the result
    comes back in the INPUT dtype (float computed, C-cast truncated)."""
    x = np.random.randint(0, 100, size=(8, 9)).astype(np.int32)
    with pytest.warns(UserWarning, match="Falling back to scipy"):
        got = zoom(x, 1.5)
    assert got.dtype == np.int32
    exp = np_zoom(x.astype(np.float64), 1.5).astype(np.int32)
    assert_array_equal(got, exp)


def test_zoom_degenerate_axis_empty(spark):
    """round(old*scale)==0 must yield an empty axis, not bogus coords 0/-1."""
    from imops_spark.operators.zoom import zoom_df
    from imops_spark.tensor_io import encode_volume

    x = np.random.randn(6, 4)
    tf = encode_volume(spark, x)
    out = zoom_df(tf, [1.0, 0.1], order=1)  # round(4*0.1) == 0
    assert out.shape == (6, 0)
    assert out.df.count() == 0


def test_zoom_to_shape(spark):
    x = np.random.randn(6, 7)
    got = zoom_to_shape(x, (9, 5))
    assert got.shape == (9, 5)
    exp = np_zoom(x, (9 / 6, 5 / 7))
    assert_allclose(got, exp, rtol=1e-6, atol=1e-12)


# ---------------------------------------------------------------------------
# interp1d
# ---------------------------------------------------------------------------

def np_interp_ref(x, y, x_new, fill_value=np.nan, extrapolate=False, axis=-1):
    """Oracle replicating the reference kernel exactly (sorted x)."""
    y = np.moveaxis(y, axis, -1)
    n = len(x)
    idx = np.searchsorted(x, x_new)
    out = np.empty((*y.shape[:-1], len(x_new)))
    for k, (i, v) in enumerate(zip(idx, x_new)):
        extr = 0
        if i == 0:
            if v < x[0]:
                extr = -1
            else:
                i = 1
        if i >= n:
            extr = 1
        if extr == 0:
            dd = (v - x[i - 1]) / (x[i] - x[i - 1])
            out[..., k] = y[..., i - 1] * (1 - dd) + y[..., i] * dd
        elif extrapolate:
            lo, hi = (0, 1) if extr == -1 else (n - 2, n - 1)
            t = (v - x[lo]) / (x[hi] - x[lo])
            out[..., k] = y[..., lo] * (1 - t) + y[..., hi] * t
        else:
            out[..., k] = fill_value
    return np.moveaxis(out, -1, axis)


def test_interp1d_1d(spark):
    x = np.sort(np.random.rand(12)) * 10
    y = np.random.randn(12)
    x_new = np.random.rand(20) * 9 + 0.5
    f = interp1d(x, y, assume_sorted=True, bounds_error=False, fill_value=0.0)
    assert_allclose(f(x_new), np_interp_ref(x, y, x_new, fill_value=0.0), rtol=1e-6)


def test_interp1d_matches_numpy_interp(spark):
    x = np.sort(np.random.rand(10)) * 5
    y = np.random.randn(10)
    x_new = np.linspace(x[0], x[-1], 17)
    f = interp1d(x, y, assume_sorted=True)
    assert_allclose(f(x_new), np.interp(x_new, x, y), rtol=1e-6)


def test_interp1d_3d_axis(spark):
    x = np.sort(np.random.rand(8)) * 4
    y = np.random.randn(5, 8, 6)
    x_new = np.linspace(x[0], x[-1], 11)
    f = interp1d(x, y, axis=1, assume_sorted=True)
    assert_allclose(f(x_new), np_interp_ref(x, y, x_new, axis=1), rtol=1e-6)


def test_interp1d_extrapolate(spark):
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 2.0, 4.0, 6.0])
    f = interp1d(x, y, fill_value="extrapolate", assume_sorted=True)
    got = f(np.array([-1.0, 4.0, 1.5]))
    assert_allclose(got, [-2.0, 8.0, 3.0], rtol=1e-6)


def test_interp1d_fill_value(spark):
    x = np.array([0.0, 1.0, 2.0])
    y = np.array([1.0, 3.0, 5.0])
    f = interp1d(x, y, bounds_error=False, fill_value=-7.0, assume_sorted=True)
    assert_allclose(f(np.array([-1.0, 0.5, 9.0])), [-7.0, 2.0, -7.0], rtol=1e-6)


def test_interp1d_bounds_error(spark):
    x = np.array([0.0, 1.0])
    y = np.array([0.0, 1.0])
    f = interp1d(x, y, bounds_error=True, assume_sorted=True, fill_value=0.0)
    with pytest.raises(ValueError):
        f(np.array([2.0]))


def test_interp1d_unsorted_x(spark):
    x = np.array([3.0, 0.0, 2.0, 1.0])
    y = np.array([6.0, 0.0, 4.0, 2.0])
    f = interp1d(x, y, assume_sorted=False)
    assert_allclose(f(np.array([0.5, 2.5])), [1.0, 5.0], rtol=1e-6)


def test_interp1d_len_mismatch(spark):
    with pytest.raises(ValueError):
        interp1d(np.arange(3.0), np.random.randn(4))


def test_interp1d_extrapolate_and_raise(spark):
    with pytest.raises(ValueError):
        interp1d(np.arange(3.0), np.arange(3.0), bounds_error=True, fill_value="extrapolate")


# --- spline orders on the distributed (TensorFrame) path ---


@pytest.mark.parametrize("order", [2, 3, 5])
def test_zoom_tensorframe_spline_matches_ndarray(spark, order):
    """TensorFrame spline zoom (map_blobs route) ≡ the ndarray spline path,
    and it returns instead of raising (reference zoom.py:230-250 degrades
    gracefully for every input)."""
    from imops_spark.tensor_io import decode_volume, encode_volume

    x = np.random.default_rng(11 + order).standard_normal((7, 9))
    tf = encode_volume(spark, x)
    with pytest.warns(UserWarning, match="Falling back to scipy"):
        out_tf = zoom(tf, 1.5, order=order)
    with pytest.warns(UserWarning, match="Falling back to scipy"):
        exp = zoom(x, 1.5, order=order)
    assert out_tf.shape == exp.shape
    assert out_tf.dtype == x.dtype
    got = decode_volume(out_tf)
    assert_allclose(got, exp, rtol=1e-9, atol=1e-12)


def test_zoom_tensorframe_spline_int_dtype(spark):
    """Spline zoom on an int TensorFrame comes back int (scipy writes into
    an input-dtype output) and multi-image tables stay per-image."""
    from imops_spark.tensor_io import decode_volume, encode_volumes

    rng = np.random.default_rng(7)
    arrs = {0: rng.integers(0, 80, (6, 8)).astype(np.int32),
            1: rng.integers(0, 80, (6, 8)).astype(np.int32)}
    tf = encode_volumes(spark, arrs)
    with pytest.warns(UserWarning, match="Falling back to scipy"):
        out_tf = zoom(tf, [2.0, 0.75], order=3)
    assert out_tf.dtype == np.int32
    from imops_spark.kernels import spline_zoom_numpy

    for iid, a in arrs.items():
        exp = spline_zoom_numpy(a, [2.0, 0.75], order=3).astype(np.int32)
        assert_array_equal(decode_volume(out_tf, image_id=iid), exp)


def test_voxels_blobs_roundtrip(spark):
    """voxels_to_blobs ∘ blobs_to_voxels is the identity on a voxel table."""
    from imops_spark.tensor_io import (
        blobs_to_voxels, decode_volume, encode_volumes, voxels_to_blobs,
    )

    rng = np.random.default_rng(5)
    arrs = {3: rng.standard_normal((4, 5, 3)), 9: rng.standard_normal((4, 5, 3))}
    tf = encode_volumes(spark, arrs)
    back = blobs_to_voxels(voxels_to_blobs(tf), tf.shape, tf.dtype)
    assert back.shape == tf.shape and back.dtype == tf.dtype
    for iid, a in arrs.items():
        assert_array_equal(decode_volume(back, image_id=iid), a)
