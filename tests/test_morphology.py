"""Differential tests for binary morphology + EDT vs pure-numpy oracles
(exact match, like the reference's skimage comparisons)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from imops_spark.operators.morphology import (
    binary_closing,
    binary_dilation,
    binary_erosion,
    binary_opening,
    distance_transform_edt,
    edt_numpy,
    footprint_offsets,
    generate_binary_structure,
)


def np_dilation(x, fp):
    """X ⊕ B: union of translates of X by B's offsets (OOB drops)."""
    out = np.zeros_like(x, dtype=bool)
    for o in footprint_offsets(fp):
        src = [slice(max(0, -d), x.shape[k] - max(0, d)) for k, d in enumerate(o)]
        dst = [slice(max(0, d), x.shape[k] - max(0, -d)) for k, d in enumerate(o)]
        out[tuple(dst)] |= x[tuple(src)]
    return out


def np_erosion(x, fp):
    """X ⊖ B: AND over offsets, out-of-bounds counts True."""
    out = np.ones_like(x, dtype=bool)
    for o in footprint_offsets(fp):
        probe = np.ones_like(x, dtype=bool)
        src = [slice(max(0, d), x.shape[k] - max(0, -d)) for k, d in enumerate(o)]
        dst = [slice(max(0, -d), x.shape[k] - max(0, d)) for k, d in enumerate(o)]
        probe[tuple(dst)] = x[tuple(src)]
        out &= probe
    return out


@pytest.mark.parametrize("shape", [(12,), (9, 10), (6, 7, 8)])
def test_dilation_default_footprint(spark, shape):
    x = np.random.binomial(1, 0.3, shape).astype(bool)
    x.flat[0] = True  # avoid all-false short-circuit
    fp = generate_binary_structure(len(shape), 1)
    assert_array_equal(binary_dilation(x), np_dilation(x, fp))


@pytest.mark.parametrize("shape", [(10, 11)])
def test_erosion_default_footprint(spark, shape):
    x = np.random.binomial(1, 0.7, shape).astype(bool)
    x.flat[0] = True
    x.flat[-1] = False
    fp = generate_binary_structure(len(shape), 1)
    assert_array_equal(binary_erosion(x), np_erosion(x, fp))


def test_asymmetric_footprint(spark):
    x = np.random.binomial(1, 0.4, (9, 9)).astype(bool)
    x[0, 0], x[-1, -1] = True, False
    fp = np.array([[1, 1, 0], [0, 1, 0], [0, 0, 0]], dtype=bool)
    assert_array_equal(binary_dilation(x, fp), np_dilation(x, fp))
    assert_array_equal(binary_erosion(x, fp), np_erosion(x, fp))


def test_even_footprint(spark):
    x = np.random.binomial(1, 0.5, (8, 8)).astype(bool)
    x[0, 0], x[-1, -1] = True, False
    fp = np.ones((2, 2), dtype=bool)
    assert_array_equal(binary_dilation(x, fp), np_dilation(x, fp))
    assert_array_equal(binary_erosion(x, fp), np_erosion(x, fp))


def test_closing_opening(spark):
    x = np.random.binomial(1, 0.5, (10, 10)).astype(bool)
    x[0, 0], x[-1, -1] = True, False
    fp = generate_binary_structure(2, 1)
    assert_array_equal(binary_closing(x), np_erosion(np_dilation(x, fp), fp))
    assert_array_equal(binary_opening(x), np_dilation(np_erosion(x, fp), fp))


def test_trivial_short_circuits(spark):
    with pytest.warns(UserWarning, match="fully False"):
        out = binary_dilation(np.zeros((4, 4), dtype=bool))
    assert not out.any()
    with pytest.warns(UserWarning, match="fully True"):
        out = binary_erosion(np.ones((4, 4), dtype=bool))
    assert out.all()


def test_footprint_rank_mismatch(spark):
    with pytest.raises(ValueError):
        binary_dilation(np.zeros((4, 4), dtype=bool) | True, np.ones(3, dtype=bool))


def test_empty_footprint(spark):
    with pytest.raises(RuntimeError):
        binary_dilation(np.eye(3, dtype=bool), np.zeros((0, 0), dtype=bool))


# ---------------------------------------------------------------------------
# EDT
# ---------------------------------------------------------------------------

def brute_edt(x, sampling=None):
    x = x.astype(bool)
    nd = x.ndim
    w = np.ones(nd) if sampling is None else np.broadcast_to(np.asarray(sampling, float), (nd,))
    bg = np.argwhere(~x)
    out = np.zeros(x.shape)
    for p in np.argwhere(x):
        d = np.sqrt((((bg - p) * w) ** 2).sum(axis=1)).min() if len(bg) else np.inf
        out[tuple(p)] = d
    return out


@pytest.mark.parametrize("shape", [(16,), (9, 11), (5, 6, 7)])
def test_edt_matches_bruteforce(shape):
    x = np.random.binomial(1, 0.7, shape).astype(bool)
    x.flat[-1] = False
    assert_allclose(edt_numpy(x), brute_edt(x), rtol=1e-6)


def test_edt_anisotropic():
    x = np.random.binomial(1, 0.6, (8, 9)).astype(bool)
    x[0, 0] = False
    assert_allclose(edt_numpy(x, sampling=(2.0, 0.5)), brute_edt(x, (2.0, 0.5)), rtol=1e-6)


def test_edt_indices_consistent():
    x = np.random.binomial(1, 0.6, (7, 8)).astype(bool)
    x[3, 3] = False
    d, idx = distance_transform_edt(x, return_indices=True)
    # the feature position must be background and at exactly distance d
    for p in np.argwhere(x):
        q = idx[:, p[0], p[1]]
        assert not x[q[0], q[1]]
        assert_allclose(np.sqrt(((p - q) ** 2).sum()), d[tuple(p)], rtol=1e-9)


def test_edt_blob_path(spark):
    from imops_spark.tensor_io import decode_blobs, encode_blobs

    arrays = {i: np.random.binomial(1, 0.6, (6, 7)).astype(bool) for i in range(3)}
    for a in arrays.values():
        a[0, 0] = False
    blobs = encode_blobs(spark, arrays)
    out = decode_blobs(distance_transform_edt(blobs))
    for i, a in arrays.items():
        assert_allclose(out[i], brute_edt(a).astype(np.float32), rtol=1e-5)


def test_edt_blob_path_return_indices(spark):
    """DataFrame path with return_indices (reference morphology.py:499-507
    returns both): per image, indices must point at background voxels whose
    distance reproduces the distance map exactly — an internal-consistency
    oracle independent of the kernel."""
    from imops_spark.operators.morphology import decode_edt_blobs
    from imops_spark.tensor_io import encode_blobs

    rng = np.random.default_rng(31)
    arrays = {i: rng.binomial(1, 0.6, (6, 7)).astype(bool) for i in range(3)}
    for a in arrays.values():
        a[0, 0] = False
    blobs = encode_blobs(spark, arrays)
    out = decode_edt_blobs(distance_transform_edt(blobs, return_indices=True))
    for i, a in arrays.items():
        dist, idx = out[i]
        assert dist.shape == a.shape and idx.shape == (2,) + a.shape
        assert_allclose(dist, brute_edt(a).astype(np.float32), rtol=1e-5)
        for p in np.argwhere(a):
            q = idx[:, p[0], p[1]]
            assert not a[q[0], q[1]]
            assert_allclose(np.sqrt(((p - q) ** 2).sum()), dist[tuple(p)], rtol=1e-5)


def test_edt_blob_path_indices_only(spark):
    from imops_spark.operators.morphology import decode_edt_blobs
    from imops_spark.tensor_io import encode_blobs

    a = np.random.binomial(1, 0.5, (5, 5)).astype(bool)
    a[2, 2] = False
    out = decode_edt_blobs(
        distance_transform_edt(
            encode_blobs(spark, {7: a}), return_distances=False, return_indices=True
        )
    )
    dist, idx = out[7]
    assert dist is None and idx is not None


@pytest.mark.parametrize("op", [binary_dilation, binary_erosion, binary_closing, binary_opening])
def test_boxed_matches_unboxed_interior(spark, op):
    """boxed=True is pure work-skipping: identical output for a mask whose
    support box (tight bbox + 2*footprint//2) stays inside the image."""
    rng = np.random.default_rng(21)
    x = np.zeros((24, 26), dtype=bool)
    x[8:14, 9:16] = rng.random((6, 7)) > 0.4
    x[10, 11] = True  # non-empty
    assert_array_equal(op(x, boxed=True), op(x, boxed=False))


@pytest.mark.parametrize("op", [binary_dilation, binary_erosion])
def test_boxed_matches_unboxed_border(spark, op):
    """A mask touching the border must fall back to the full op — still the
    same answer as unboxed."""
    x = np.zeros((12, 12), dtype=bool)
    x[0:4, 3:8] = True
    assert_array_equal(op(x, boxed=True), op(x, boxed=False))


def test_boxed_3d(spark):
    rng = np.random.default_rng(22)
    x = np.zeros((14, 15, 16), dtype=bool)
    x[5:9, 6:10, 4:9] = rng.random((4, 4, 5)) > 0.5
    x[6, 7, 5] = True
    assert_array_equal(binary_dilation(x, boxed=True), binary_dilation(x, boxed=False))
    assert_array_equal(binary_erosion(x, boxed=True), binary_erosion(x, boxed=False))


def test_boxed_tensorframe_parity_and_pruning(spark):
    """boxed=True on the TensorFrame (distributed) path: identical output to
    unboxed for dilation/erosion/closing/opening — sparse, border-touching,
    empty, and off-center-footprint masks — and the plan actually prunes
    (the bbox attaches via a broadcast join; the outside rows bypass the
    shuffled hit/kill join as a literal-False union branch)."""
    import numpy as np
    from pyspark.sql import functions as F

    from imops_spark.operators.morphology import (
        _opening_df,
        _closing_df,
        binary_dilation_df,
        binary_erosion_df,
    )
    from imops_spark.tensor_io import decode_volume, encode_volume

    rng = np.random.default_rng(7)
    masks = []
    sparse = np.zeros((20, 18), bool)
    sparse[8:11, 7:10] = rng.random((3, 3)) > 0.3
    sparse[9, 8] = True
    masks.append(sparse)
    border = np.zeros((10, 9), bool)
    border[0, 0] = True
    masks.append(border)
    masks.append(np.zeros((7, 7), bool))  # empty -> all-outside branch
    for img in masks:
        tf = encode_volume(spark, img)
        for op in (binary_dilation_df, binary_erosion_df, _closing_df, _opening_df):
            a = decode_volume(op(tf, None, boxed=False), default=False)
            b = decode_volume(op(tf, None, boxed=True), default=False)
            assert (a == b).all(), (op.__name__, img.shape)

    # off-center footprint: erosion's boxed pruning is only exact with a
    # centered footprint, so it must silently fall back to unboxed
    fp = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], bool)
    tf = encode_volume(spark, sparse)
    a = decode_volume(binary_erosion_df(tf, fp, boxed=False), default=False)
    b = decode_volume(binary_erosion_df(tf, fp, boxed=True), default=False)
    assert (a == b).all()

    # pruning evidence: the boxed plan carries the broadcast bbox join and a
    # bbox range filter; the join input is the box subset, not the grid
    plan = (
        binary_erosion_df(tf, None, boxed=True)
        .df._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "lo0" in plan and "hi0" in plan
    unboxed_plan = (
        binary_erosion_df(tf, None, boxed=False)
        .df._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lo0" not in unboxed_plan
