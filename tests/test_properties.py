"""Hypothesis property tests over the numpy kernels (the udf-path hot code).

The reference's test strategy is seeded-random differential testing
(SURVEY.md §5); these properties go one step further — shrinkable random
shapes/contents checking algebraic invariants the operators must satisfy at
any size, without paying a Spark job per example.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from imops_spark.kernels import (
    center_of_mass_numpy,
    dilation_numpy,
    erosion_numpy,
    interp1d_numpy,
    zoom_numpy,
)
from imops_spark.operators.morphology import footprint_offsets, generate_binary_structure

OFFS3 = footprint_offsets(generate_binary_structure(3, 1))

masks = arrays(
    dtype=np.bool_,
    shape=st.tuples(*(st.integers(1, 7) for _ in range(3))),
    elements=st.booleans(),
)


@settings(max_examples=60, deadline=None)
@given(masks)
def test_morphology_duality(mask):
    """dilation(m) == ~erosion(~m) for a symmetric footprint — the identity
    the reference exploits to run both ops through one kernel
    (/root/reference/imops/src/_morphology.pyx:322-329).  Border semantics
    (erosion OOB=True, dilation OOB=False) are duals too."""
    np.testing.assert_array_equal(
        dilation_numpy(mask, OFFS3), ~erosion_numpy(~mask, OFFS3)
    )


@settings(max_examples=60, deadline=None)
@given(masks)
def test_morphology_extensive_antiextensive(mask):
    """Dilation only adds voxels; erosion only removes them."""
    assert bool(np.all(dilation_numpy(mask, OFFS3) >= mask))
    assert bool(np.all(erosion_numpy(mask, OFFS3) <= mask))


@settings(max_examples=30, deadline=None)
@given(
    arrays(
        dtype=np.float64,
        shape=st.tuples(*(st.integers(1, 6) for _ in range(3))),
        elements=st.floats(-100, 100, allow_nan=False),
    )
)
def test_zoom_identity_and_com_invariance(vol):
    """zoom by 1.0 (either order) is the identity; center of mass of a
    constant-shifted positive array stays inside the index hull."""
    np.testing.assert_array_equal(zoom_numpy(vol, 1.0, order=0), vol)
    np.testing.assert_allclose(zoom_numpy(vol, 1.0, order=1), vol, rtol=1e-12)
    pos = np.abs(vol) + 1.0
    com = center_of_mass_numpy(pos)
    for c, n in zip(com, vol.shape):
        assert -1e-9 <= c <= n - 1 + 1e-9


@settings(max_examples=40, deadline=None)
@given(
    st.integers(2, 40).flatmap(
        lambda n: st.tuples(
            st.just(n),
            arrays(np.float64, (n,), elements=st.floats(-50, 50, allow_nan=False)),
            st.integers(0, 1000),
        )
    )
)
def test_interp1d_reproduces_knots_and_is_monotone_bounded(args):
    """Evaluating interp1d at the knots returns the knot values exactly;
    evaluating inside an interval stays within the interval's value range."""
    n, y, seed = args
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-100, 100, n))
    # distinct knots required (degenerate dx would divide by zero)
    x = x + np.arange(n) * 1e-6
    got = interp1d_numpy(y, x, x, assume_sorted=True)
    np.testing.assert_allclose(got, y, rtol=1e-9, atol=1e-9)
    mid = (x[:-1] + x[1:]) / 2
    gmid = interp1d_numpy(y, x, mid, assume_sorted=True)
    lo = np.minimum(y[:-1], y[1:]) - 1e-9
    hi = np.maximum(y[:-1], y[1:]) + 1e-9
    assert bool(np.all(gmid >= lo) and np.all(gmid <= hi))


@settings(max_examples=60, deadline=None)
@given(masks)
def test_morphology_closing_opening_idempotent(mask):
    """Closing and opening are idempotent filters (applying twice == once),
    and opening(m) <= m <= closing(m) — the lattice-theoretic contract every
    morphology implementation must satisfy."""

    def closing(m):
        return erosion_numpy(dilation_numpy(m, OFFS3), OFFS3)

    def opening(m):
        return dilation_numpy(erosion_numpy(m, OFFS3), OFFS3)

    c, o = closing(mask), opening(mask)
    np.testing.assert_array_equal(closing(c), c)
    np.testing.assert_array_equal(opening(o), o)
    assert bool(np.all(o <= mask)) and bool(np.all(mask <= c))


def test_interp1d_threaded_path_is_bit_exact():
    """num_threads > 1 splits the gather+lerp across a thread pool; every
    chunk runs the identical fused sequence, so the result must equal the
    serial path BIT-exactly (same index math, same multiply order) across
    extrapolate / fill / unsorted-knot configs and the small-input gate."""
    rng = np.random.default_rng(7)
    for shape in [(64, 64, 300), (7, 2048, 64), (2048, 513)]:
        y = rng.standard_normal(shape)
        x = np.sort(rng.random(shape[-1])) * 50
        xn = rng.random(400) * 60 - 5
        for kw in (
            dict(extrapolate=True),
            dict(extrapolate=False, fill_value=3.5),
            dict(bounds_error=False),
        ):
            a = interp1d_numpy(y, x, xn, assume_sorted=True, num_threads=1, **kw)
            b = interp1d_numpy(y, x, xn, assume_sorted=True, num_threads=16, **kw)
            assert np.array_equal(a, b), (shape, kw)
    # unsorted knots: the perm gather must land inside each chunk too
    y = rng.standard_normal((128, 128, 100))
    x = rng.permutation(np.sort(rng.random(100)))
    xn = rng.random(64)
    assert np.array_equal(
        interp1d_numpy(y, x, xn, num_threads=1, extrapolate=True),
        interp1d_numpy(y, x, xn, num_threads=16, extrapolate=True),
    )
    # below the size gate the threaded arg must be a no-op (serial path)
    y1 = rng.standard_normal((4, 80))
    x1 = np.sort(rng.random(80))
    assert np.array_equal(
        interp1d_numpy(y1, x1, xn, num_threads=8, extrapolate=True),
        interp1d_numpy(y1, x1, xn, num_threads=1, extrapolate=True),
    )


@settings(max_examples=8, deadline=None)
@given(
    st.sampled_from([np.bool_, np.int32, np.int64, np.float16, np.float32, np.float64]),
    st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=3),
    st.integers(min_value=0, max_value=2**31),
)
def test_voxels_blobs_roundtrip_property(spark, dtype, shape, seed):
    """voxels_to_blobs ∘ blobs_to_voxels is the identity for every logical
    dtype (incl. bool and the fp16 f32-physical encoding) and 1-3D shape."""
    from numpy.testing import assert_array_equal

    from imops_spark.tensor_io import (
        blobs_to_voxels,
        decode_volume,
        encode_volume,
        voxels_to_blobs,
    )

    rng = np.random.default_rng(seed)
    if dtype == np.bool_:
        a = rng.random(shape) < 0.5
    elif np.dtype(dtype).kind == "i":
        a = rng.integers(-50, 50, shape).astype(dtype)
    else:
        a = (rng.standard_normal(shape) * 4).astype(dtype)
    tf = encode_volume(spark, a)
    back = blobs_to_voxels(voxels_to_blobs(tf), tf.shape, tf.dtype)
    assert back.shape == tuple(shape) and back.dtype == np.dtype(dtype)
    assert_array_equal(decode_volume(back), a)
